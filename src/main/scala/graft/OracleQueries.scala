package graft

/** DuckDB oracle SQL for SparkEntry.queries.
  *
  * Engine-parity rules applied throughout (SURVEY.md §7 risk 4):
  * - per-row double arithmetic is left unrounded (identical IEEE ops on
  *   identical inputs are bit-reproducible across engines);
  * - aggregated doubles (sum/avg — summation order varies, and rounding
  *   a noisy sum is unstable at the .xx5 boundaries that k-decimal
  *   inputs hit systematically) are computed as exact DECIMAL sums cast
  *   back to double, mirroring graft.functions.ExactAgg;
  * - DuckDB `year()`/`row_number()`/`count()` return BIGINT where Spark
  *   returns INT — cast on the DuckDB side;
  * - DuckDB `dayofweek` is Sunday=0, Spark Sunday=1 — `+1` on the
  *   DuckDB side;
  * - DuckDB `sum(INT)` returns HUGEINT — cast to BIGINT;
  * - ORDER BY on nullable keys states nulls placement explicitly
  *   (DuckDB ASC defaults NULLS LAST; Spark asc() defaults nulls
  *   first).
  * - FLOAT columns must NOT go through the decimal-accumulation rule
  *   directly: engines disagree in the last digit of their
  *   float->decimal casts (shortest-repr vs exact-binary rounding;
  *   measured as 1e-10-level q68 mismatches). Quantize to an integer
  *   grid instead — CAST the float to DOUBLE (exact), multiply by the
  *   grid (both engines produce the identical IEEE product), round
  *   (ties away from zero in both), sum the resulting longs exactly.
  */
object OracleQueries {

  /** Cleaned lineitem (mirrors pipeline.Ingestion.cleanLineitem). */
  val cleanLineitemSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CAST(l_shipdate AS DATE) AS ship_date,
      |  CAST(year(l_shipdate) AS INT) AS ship_year,
      |  CAST(month(l_shipdate) AS INT) AS ship_month,
      |  l_quantity, l_extendedprice, l_discount,
      |  l_extendedprice * (1 - l_discount) AS revenue,
      |  l_extendedprice / l_quantity AS unit_price,
      |  CASE WHEN l_extendedprice < 20000 THEN 'low'
      |       WHEN l_extendedprice < 45000 THEN 'mid'
      |       ELSE 'high' END AS price_band,
      |  l_returnflag, l_linestatus
      |FROM lineitem
      |WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |  AND l_discount IS NOT NULL AND l_shipdate IS NOT NULL
      |  AND l_quantity > 0 AND l_extendedprice > 0
      |  AND l_discount >= 0 AND l_discount < 1""".stripMargin

  /** Fact table (mirrors pipeline.Fact.build over cleaned lineitem). */
  val factSql: String =
    s"""SELECT CAST(l.l_shipdate AS DATE) AS ship_date_key,
       |  l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
       |  l.l_quantity, l.l_extendedprice, l.l_discount,
       |  l.l_extendedprice * (1 - l.l_discount) AS revenue,
       |  l.l_returnflag, l.l_linestatus,
       |  CAST(o.o_orderdate AS DATE) AS order_date,
       |  o.o_orderpriority, o.o_totalprice,
       |  cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       |  cn.n_regionkey AS cust_regionkey, sn.n_regionkey AS supp_regionkey,
       |  CAST(year(o.o_orderdate) AS INT) AS order_year,
       |  CAST(quarter(o.o_orderdate) AS INT) AS order_quarter
       |FROM lineitem l
       |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
       |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
       |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |LEFT JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |WHERE l.l_quantity IS NOT NULL AND l.l_extendedprice IS NOT NULL
       |  AND l.l_discount IS NOT NULL AND l.l_shipdate IS NOT NULL
       |  AND l.l_quantity > 0 AND l.l_extendedprice > 0
       |  AND l.l_discount >= 0 AND l.l_discount < 1
       |  AND l.l_quantity < 1000
       |  AND l.l_extendedprice * (1 - l.l_discount) > 0""".stripMargin

  val all: Map[String, String] = Map(
    "q01_clean_project" -> cleanLineitemSql,

    "q02_location_dim" ->
      """SELECT location_id,
        |  'LOC_' || CAST(location_id AS VARCHAR) AS location_name,
        |  CASE WHEN location_id BETWEEN 0 AND 4 THEN 'AMERICA'
        |       WHEN location_id BETWEEN 5 AND 9 THEN 'ASIA'
        |       WHEN location_id BETWEEN 10 AND 14 THEN 'EUROPE'
        |       WHEN location_id BETWEEN 15 AND 19 THEN 'MIDEAST'
        |       ELSE 'AFRICA' END AS region_bucket,
        |  'Zone_' || CAST(location_id AS VARCHAR) AS zone,
        |  location_id IN (1, 7, 13) AS is_hub
        |FROM (
        |  SELECT DISTINCT location_id FROM (
        |    SELECT c_nationkey AS location_id FROM customer
        |    UNION ALL
        |    SELECT s_nationkey FROM supplier))
        |WHERE location_id IS NOT NULL AND location_id <> -1""".stripMargin,

    "q03_date_dim" ->
      """SELECT CAST(d AS DATE) AS full_date,
        |  CAST(d AS DATE) AS date_key,
        |  CAST(year(d) AS INT) AS year,
        |  CAST(quarter(d) AS INT) AS quarter,
        |  CAST(month(d) AS INT) AS month,
        |  CAST(day(d) AS INT) AS day_of_month,
        |  CAST(dayofweek(d) + 1 AS INT) AS day_of_week,
        |  dayofweek(d) IN (0, 6) AS is_weekend
        |FROM (
        |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS d
        |  FROM (SELECT CAST(min(o_orderdate) AS DATE) AS mn,
        |               CAST(max(o_orderdate) AS DATE) AS mx
        |        FROM orders))""".stripMargin,

    "q04_fact_join" -> factSql,

    "q05_pair_daily_summary" ->
      s"""WITH fact AS ($factSql)
         |SELECT ship_date_key, cust_nation, supp_nation,
         |  CAST(count(*) AS BIGINT) AS total_trips,
         |  CAST(sum(CAST(revenue AS DECIMAL(30,4))) AS DOUBLE) AS total_revenue,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_quantity,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_price,
         |  CAST(floor(CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)) AS BIGINT) AS total_quantity
         |FROM fact
         |GROUP BY 1, 2, 3""".stripMargin,

    "q06_time_summary" ->
      s"""WITH fact AS ($factSql)
         |SELECT order_year, order_quarter,
         |  CAST(month(order_date) AS INT) AS order_month,
         |  CAST(dayofweek(order_date) + 1 AS INT) AS day_of_week,
         |  dayofweek(order_date) IN (0, 6) AS is_weekend,
         |  CAST(count(*) AS BIGINT) AS trip_count,
         |  CAST(sum(CAST(revenue AS DECIMAL(30,4))) AS DOUBLE) AS total_revenue,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_fare
         |FROM fact
         |GROUP BY 1, 2, 3, 4, 5""".stripMargin,

    "q07_top_pairs" ->
      s"""WITH fact AS ($factSql)
         |SELECT cust_nation, supp_nation,
         |  CAST(count(*) AS BIGINT) AS trip_count,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_distance,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_fare,
         |  CAST(sum(CAST(revenue AS DECIMAL(30,4))) AS DOUBLE) AS total_revenue
         |FROM fact
         |GROUP BY 1, 2
         |ORDER BY trip_count DESC, cust_nation ASC NULLS LAST,
         |  supp_nation ASC NULLS LAST
         |LIMIT 50""".stripMargin,

    "q08_quality_checks" ->
      s"""WITH fact AS ($factSql)
         |SELECT
         |  CAST(sum(CASE WHEN cust_nation IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cust_nation,
         |  CAST(sum(CASE WHEN supp_nation IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_supp_nation,
         |  CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity >= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS invalid_quantity,
         |  CAST(sum(CASE WHEN revenue < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_revenue,
         |  CAST(count(*) AS BIGINT) AS total_rows
         |FROM fact""".stripMargin,

    "q09_global_stats" ->
      """SELECT
        |  CAST(min(o_orderdate) AS DATE) AS min_order_date,
        |  CAST(max(o_orderdate) AS DATE) AS max_order_date,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |  CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_order_dates,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_totalprice
        |FROM orders""".stripMargin,

    "q10_window_topk" ->
      s"""WITH clean AS ($cleanLineitemSql)
         |SELECT l_returnflag, l_orderkey, l_linenumber, revenue, rn
         |FROM (
         |  SELECT l_returnflag, l_orderkey, l_linenumber, revenue,
         |    CAST(row_number() OVER (
         |      PARTITION BY l_returnflag
         |      ORDER BY revenue DESC, l_orderkey ASC, l_linenumber ASC) AS INT) AS rn
         |  FROM clean)
         |WHERE rn <= 3""".stripMargin,

    // ---- training-data pipeline extensions ----

    // approximate-ANN oracles: the LSH planes (q20) and IVF training
    // (q28) are built from portable md5 hashes and exact-integer
    // means, so the full candidate generation replays in SQL and the
    // ranking hash-matches (the recall specs in EventsSimilaritySpec
    // stay as the quality gate).
    "q20_ann_lsh" -> q20AnnLshSql,
    "q28_ann_ivf" -> q28AnnIvfSql,

    // IVF-PQ replay: full training + nibble-packed encoding + ADC
    // scoring rebuilt in SQL (see q161AnnIvfPqSql)
    "q161_ann_ivfpq" -> q161AnnIvfPqSql,
    "q149_distributed_centroids" -> q149DistributedCentroidsSql,

    // portable minhash: first-60-bits-of-md5 shingle hash ('0x'-cast
    // here, conv(,16,10) on the Spark side), double-hashed mod 2^31-1
    "q12_dedup_minhash" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    list_transform($duckShingles,
         |      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS hs
         |  FROM documents),
         |sig AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(0, 15), i ->
         |      list_min(list_transform(hs,
         |        h -> ((h % 2147483647) + i * (1 + (h // 2147483647) % 2147483647)) % 2147483647))) AS sig
         |  FROM g)
         |SELECT doc_id, CAST(b AS INT) AS band,
         |  sig[2*b + 1] AS sig_a, sig[2*b + 2] AS sig_b,
         |  sig[2*b + 1] * 2147483647 + sig[2*b + 2] AS band_key
         |FROM sig, unnest(generate_series(0, 7)) AS t(b)""".stripMargin,

    "q11_dedup_exact" ->
      """SELECT md5(text) AS fingerprint,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin,

    "q13_dedup_neardup" ->
      s"""WITH g AS (
         |  SELECT doc_id, $duckShingles AS sh
         |  FROM documents)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |FROM g a JOIN g b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7""".stripMargin,

    // connected components via recursive transitive closure over the
    // exact near-dup pair graph (tiny at oracle scale); cluster_id =
    // min reachable doc_id, singletons map to themselves
    "q40_dedup_clusters" ->
      s"""WITH RECURSIVE g AS (
         |  SELECT doc_id, $duckShingles AS sh FROM documents),
         |p AS (
         |  SELECT a.doc_id AS s, b.doc_id AS d
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7),
         |e AS (SELECT s, d FROM p UNION ALL SELECT d, s FROM p),
         |r(s, d) AS (
         |  SELECT s, d FROM e
         |  UNION
         |  SELECT r.s, e.d FROM r JOIN e ON r.d = e.s)
         |SELECT doc.doc_id,
         |  CAST(least(doc.doc_id, coalesce(min(r.d), doc.doc_id)) AS BIGINT) AS cluster_id
         |FROM documents doc LEFT JOIN r ON r.s = doc.doc_id
         |GROUP BY doc.doc_id""".stripMargin,

    // benchmark decontamination: corpus docs (bucket >= 50) sharing no
    // word 5-gram with the benchmark bucket (bucket < 50); tokenizer
    // identical to q30's (parity proven there)
    "q41_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS bucket,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> length(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
        |    i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM t),
        |bench AS (SELECT DISTINCT gram FROM g WHERE bucket < 50),
        |dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram) WHERE g.bucket >= 50)
        |SELECT doc_id, lang, source FROM t
        |WHERE bucket >= 50 AND doc_id NOT IN (SELECT doc_id FROM dirty)""".stripMargin,

    // repetition signals: same tokenizer as q30; trigram grams as in
    // q41 but n=3; ratios are exact small-int divisions so they
    // hash-match bit-for-bit
    "q42_repetition_stats" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> length(x) > 0) AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS type_token_ratio,
        |  CASE WHEN len(toks) >= 3 THEN
        |    1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
        |            i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE) / (len(toks) - 2)
        |  ELSE 0.0 END AS dup_trigram_ratio,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(list_max(list_transform(list_distinct(toks),
        |           t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / len(toks)
        |  ELSE 0.0 END AS top_token_ratio
        |FROM t""".stripMargin,

    // sharded sequence packing: per-shard running token total, integer
    // div/mod into 2048-token sequences (same md5 bucket as q39/q41)
    "q43_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard,
        |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      x -> length(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS seq_offset
        |FROM c""".stripMargin,

    // overlapping char chunks: 200-char windows every 150, tail kept
    "q44_chunking" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    unnest(list_transform(
        |      range(0, CAST(1 + ceil(greatest(n - 200, 0) / 150.0) AS BIGINT)),
        |      i -> {'cid': i, 'chunk': substr(text, CAST(i*150 + 1 AS BIGINT), 200)})) AS u
        |  FROM t)
        |SELECT doc_id, CAST(u.cid AS BIGINT) AS chunk_id, u.chunk AS chunk,
        |  CAST(length(u.chunk) AS BIGINT) AS chunk_len
        |FROM e WHERE length(u.chunk) > 0""".stripMargin,

    // portable simhash: per-bit sign of +/-1 weight sums over the same
    // md5-60-bit shingle hashes as q12, packed little-endian
    "q14_dedup_simhash" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    list_transform($duckShingles,
         |      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS hs
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(list_sum(list_transform(generate_series(0, 59), b ->
         |    CASE WHEN list_sum(list_transform(hs,
         |           h -> CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
         |         THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
         |    AS BIGINT) AS simhash
         |FROM g""".stripMargin,

    "q15_text_stats" ->
      s"""SELECT doc_id,
         |  $duckTok AS n_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens_re,
         |  length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
         |  CAST($duckStop AS DOUBLE) / $duckTok AS stopword_ratio,
         |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / $duckTok AS avg_token_len,
         |  $duckQuality AS quality,
         |  $duckLang AS lang_pred,
         |  md5(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS fingerprint
         |FROM documents""".stripMargin,

    "q16_text_lang_summary" ->
      s"""WITH t AS (
         |  SELECT $duckLang AS lang_pred, $duckTok AS n_tokens, $duckQuality AS quality
         |  FROM documents)
         |SELECT lang_pred,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
         |  min(quality) AS min_quality,
         |  max(quality) AS max_quality
         |FROM t GROUP BY 1""".stripMargin,

    "q17_events_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_high_k
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q18_events_sessions" ->
      """WITH s AS (
        |  SELECT user_id, value, ts, event_id,
        |    CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
        |           OR epoch_us(CAST(ts AS TIMESTAMP))
        |              - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |t AS (
        |  SELECT user_id, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM s),
        |g AS (
        |  SELECT user_id, session_id, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sv
        |  FROM t GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(max(n) AS BIGINT) AS max_session_events,
        |  CAST(sum(CAST(sv AS DECIMAL(30,2))) AS DOUBLE) AS total_value
        |FROM g GROUP BY 1""".stripMargin,

    "q21_multimodal_meta" ->
      s"""SELECT doc_id, $duckFormat AS format,
         |  $duckWidth AS width, $duckHeight AS height,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST($duckWidth * $duckHeight * 3 AS BIGINT) AS n_pixels
         |FROM documents""".stripMargin,

    "q22_multimodal_format_summary" ->
      s"""SELECT $duckFormat AS format,
         |  CAST(count(*) AS BIGINT) AS n_blobs,
         |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         |  min($duckWidth) AS min_width,
         |  max($duckWidth) AS max_width,
         |  avg($duckWidth * $duckHeight) AS avg_pixels
         |FROM documents GROUP BY 1""".stripMargin,

    // decode stub is deterministic byte stats over the (ASCII) payload,
    // so the oracle recomputes it from code points
    "q23_multimodal_decode" ->
      """SELECT doc_id, format, n_bytes,
        |  CAST(bsum AS DOUBLE) / n_bytes AS mean_byte,
        |  CAST(least((n_bytes + 63) // 64, 16) AS INT) AS frames_sampled
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN ascii(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    list_sum(list_transform(range(1, length(text) + 1),
        |                            i -> ascii(substring(text, i, 1)))) AS bsum
        |  FROM documents)""".stripMargin,

    "q24_csv_lookup_join" ->
      """SELECT CAST(l.LocationID AS INT) AS location_id,
        |  l.Borough AS borough, l.Zone AS zone,
        |  c.n_customers
        |FROM read_csv('/root/repo/data/zone-lookup.csv', header=true) l
        |JOIN (SELECT CAST(c_nationkey AS INT) AS location_id,
        |             CAST(count(*) AS BIGINT) AS n_customers
        |      FROM customer GROUP BY 1) c
        |  ON CAST(l.LocationID AS INT) = c.location_id""".stripMargin,

    "q31_part_region_summary" ->
      s"""WITH clean AS ($cleanLineitemSql)
         |SELECT r.r_name AS region, p.p_brand AS brand,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CAST(revenue AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
         |  CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
         |FROM clean l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY 1, 2""".stripMargin,

    "q29_dedup_corpus" ->
      """SELECT d.* FROM documents d
        |JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)) k
        |  ON d.doc_id = k.doc_id""".stripMargin,

    "q30_vocab_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tok
        |  WHERE length(token) > 0 GROUP BY 1, 2)
        |SELECT token,
        |  CAST(sum(tf) AS BIGINT) AS total_freq,
        |  CAST(count(*) AS BIGINT) AS doc_freq
        |FROM tf GROUP BY 1
        |ORDER BY total_freq DESC, token
        |LIMIT 100""".stripMargin,

    "q25_sql_front_end" ->
      """SELECT o.o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate > o.o_orderdate
        |GROUP BY o.o_orderpriority""".stripMargin,

    "q26_multimodal_resize" ->
      s"""SELECT doc_id, format, CAST(48 AS INT) AS width, CAST(48 AS INT) AS height,
         |  rb AS resized_bytes, least(rb, n_bytes) AS payload_bytes
         |FROM (
         |  SELECT doc_id, $duckFormat AS format,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |    greatest(1, (CAST(octet_length(encode(text)) AS BIGINT) * 48 * 48)
         |      // (CAST($duckWidth AS BIGINT) * $duckHeight)) AS rb
         |  FROM documents)""".stripMargin,

    "q27_embedding_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4""".stripMargin,

    // session_window boundary: a gap of EXACTLY the duration starts a
    // new session (window end is exclusive), hence >= in new_session
    "q32_events_session_window" ->
      """WITH s AS (
        |  SELECT user_id, value, ts,
        |    CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
        |           OR epoch_us(CAST(ts AS TIMESTAMP))
        |              - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |t AS (
        |  SELECT user_id, value, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s)
        |SELECT user_id,
        |  CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS session_value
        |FROM t GROUP BY user_id, sid""".stripMargin,

    "q33_rollup_summary" ->
      s"""WITH clean AS ($cleanLineitemSql)
         |SELECT ship_year, ship_month,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CAST(revenue AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
         |  CAST(grouping(ship_month) AS INT) AS is_year_total,
         |  CAST(grouping(ship_year) AS INT) AS is_grand_total
         |FROM clean
         |GROUP BY ROLLUP(ship_year, ship_month)""".stripMargin,

    "q34_pivot_returnflag" ->
      s"""WITH clean AS ($cleanLineitemSql)
         |SELECT ship_year,
         |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(revenue AS DECIMAL(30,4)) END) AS DOUBLE) AS rev_a,
         |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(revenue AS DECIMAL(30,4)) END) AS DOUBLE) AS rev_n,
         |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(revenue AS DECIMAL(30,4)) END) AS DOUBLE) AS rev_r
         |FROM clean GROUP BY 1""".stripMargin,

    // melt replay: the UNION ALL formulation of Spark's Expand-based
    // unpivot — metric names are the source column names, in the
    // declared order (row order is irrelevant to the sorted compare)
    "q117_unpivot_metrics" ->
      s"""WITH clean AS ($cleanLineitemSql),
         |a AS (
         |  SELECT l_returnflag,
         |    CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
         |    CAST(sum(CAST(revenue AS DECIMAL(30,4))) AS DOUBLE) AS sum_revenue,
         |    CAST(count(*) AS DOUBLE) AS n_rows
         |  FROM clean GROUP BY 1)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
         |UNION ALL SELECT l_returnflag, 'sum_revenue', sum_revenue FROM a
         |UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM a""".stripMargin,

    // WAP branch DML replay: q46's merge (full-join formulation) with
    // the on-branch DELETE applied before publish
    "q118_wap_branch_dml" ->
      """WITH t AS (SELECT s_suppkey, s_name, s_acctbal AS balance
        |           FROM supplier WHERE s_suppkey <= 80),
        |s AS (SELECT s_suppkey, s_name, s_acctbal * CAST(0.5 AS DOUBLE) AS delta
        |      FROM supplier WHERE s_suppkey > 40),
        |merged AS (
        |  SELECT COALESCE(t.s_suppkey, s.s_suppkey) AS s_suppkey,
        |    COALESCE(t.s_name, s.s_name) AS s_name,
        |    CASE WHEN t.s_suppkey IS NOT NULL AND s.s_suppkey IS NOT NULL
        |           THEN t.balance + s.delta
        |         WHEN t.s_suppkey IS NOT NULL THEN t.balance
        |         ELSE s.delta END AS balance
        |  FROM t FULL JOIN s ON t.s_suppkey = s.s_suppkey)
        |SELECT s_suppkey, s_name, balance FROM merged
        |WHERE s_suppkey NOT BETWEEN 50 AND 60""".stripMargin,

    // MOR position-delete replay: the kept set is identical in both
    // read states (pending = merge-on-read anti-join, applied =
    // post-rewrite scan) — the query emits it twice under a state
    // marker. NOT coalesce(pred, false) mirrors SQL DELETE's
    // null-keeps-the-row rule.
    "q119_mor_delete" ->
      """WITH src AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS okey,
        |         CAST(l_linenumber AS BIGINT) AS lnum,
        |         CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem WHERE CAST(l_orderkey AS BIGINT) <= 2000),
        |kept AS (SELECT * FROM src WHERE NOT coalesce(qty <= 10, false))
        |SELECT 'pending' AS state, okey, lnum, qty FROM kept
        |UNION ALL
        |SELECT 'applied' AS state, okey, lnum, qty FROM kept""".stripMargin,

    // MOR UPDATE replay: both read states equal the CASE-applied frame
    "q120_mor_update" ->
      """WITH src AS (
        |  SELECT CAST(l_orderkey AS BIGINT) AS okey,
        |         CAST(l_linenumber AS BIGINT) AS lnum,
        |         CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem WHERE CAST(l_orderkey AS BIGINT) <= 1500),
        |upd AS (SELECT okey, lnum,
        |          CASE WHEN coalesce(qty >= 40, FALSE) THEN qty + 100 ELSE qty END AS qty
        |        FROM src)
        |SELECT 'pending' AS state, okey, lnum, qty FROM upd
        |UNION ALL
        |SELECT 'applied' AS state, okey, lnum, qty FROM upd""".stripMargin,

    // equality-delete upsert replay: batch rows win, non-batch keys
    // pass through (last-write-wins) — identical in both read states
    "q121_mor_upsert" ->
      """WITH t AS (SELECT s_suppkey, s_name, s_acctbal AS bal
        |           FROM supplier WHERE s_suppkey <= 6),
        |b AS (SELECT s_suppkey, s_name, s_acctbal * CAST(0.5 AS DOUBLE) AS bal
        |      FROM supplier WHERE s_suppkey BETWEEN 4 AND 8),
        |merged AS (
        |  SELECT * FROM b
        |  UNION ALL
        |  SELECT t.* FROM t ANTI JOIN b USING (s_suppkey))
        |SELECT 'pending' AS state, s_suppkey, s_name, bal FROM merged
        |UNION ALL
        |SELECT 'applied' AS state, s_suppkey, s_name, bal FROM merged""".stripMargin,

    // .deletes metadata: fully scripted (one-file table, a 5-row
    // position delete, a 3-key equality upsert) — literal oracle
    "q122_deletes_meta" ->
      """SELECT 'position' AS kind, CAST(5 AS BIGINT) AS delete_rows,
        |       1 AS n_dirty_files, CAST(NULL AS VARCHAR) AS key_cols
        |UNION ALL
        |SELECT 'equality', CAST(3 AS BIGINT), 1, 's_suppkey'""".stripMargin,

    // CDC-with-deletes replay: the two ordered batches compose to the
    // global per-user argmax, with purchase-latest users deleted
    "q124_cdc_mor_apply" ->
      """WITH r AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_id, ts, user_id, event_type, value
        |FROM r WHERE rn = 1 AND event_type <> 'purchase'""".stripMargin,

    // streaming MOR upsert: same latest-state-per-key answer as q91
    "q123_stream_mor_upsert" ->
      """WITH r AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_id, ts, user_id, event_type, value, props
        |FROM r WHERE rn = 1""".stripMargin,

    // dirty-DML replay: pending = base minus the first MOR delete;
    // final = UPDATE (+100 where skey%5=0) then second MOR delete then
    // MERGE (matched rows take src values; unmatched src keys insert —
    // including keys the MOR deletes killed, which re-enter as inserts
    // because the merged target no longer holds them)
    // SPJ aggregation replay: semantics are a plain rollup; the
    // zero-exchange shape is asserted in-query and spec-pinned
    "q129_spj_agg" ->
      """SELECT CAST(l_suppkey AS BIGINT) AS skey,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY 1""".stripMargin,

    // table-stream-source replay: the drained rows are exactly the
    // two appended event batches = the events table
    "q131_table_stream_source" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |FROM events""".stripMargin,

    // write-sort-order replay: content preservation — the layout is
    // physical only (the sorted-file tiling is asserted in-query)
    "q147_write_sort_order" ->
      "SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem",

    // scoped-compaction replay: content preservation — the orders
    // slice unchanged through the predicate-scoped rewrite
    "q145_scoped_compaction" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",

    // column-defaults replay: the base slice (written WITHOUT the
    // column) serves the default via existence fill; the three
    // inserts pin explicit-value, omitted-column, and DEFAULT-keyword
    // resolution
    "q152_column_defaults" ->
      """SELECT c_custkey, c_name, 'std' AS tier FROM customer WHERE c_custkey <= 100
        |UNION ALL SELECT CAST(-1 AS BIGINT), 'manual', 'gold'
        |UNION ALL SELECT CAST(-2 AS BIGINT), 'auto', 'std'
        |UNION ALL SELECT CAST(-3 AS BIGINT), 'kw', 'std'""".stripMargin,

    // check-constraint replay: the valid rows only — the violating
    // insert refused without committing (asserted in-query)
    "q155_check_constraints" ->
      """SELECT c_custkey AS ckey, c_acctbal AS bal FROM customer WHERE c_custkey <= 100
        |UNION ALL SELECT CAST(1000000 AS BIGINT), CAST(1.5 AS DOUBLE)""".stripMargin,

    // write-distribution replay: content is layout-only — the slice
    // unchanged (the Spark side asserts one file per day in-query)
    "q154_write_distribution" ->
      """SELECT o_orderkey AS okey, CAST(o_orderdate AS DATE) AS od,
        |  o_totalprice AS price
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-02-01'""".stripMargin,

    // type-widening replay: the narrow-typed base slice read back
    // under the widened schema (float->double is value-exact), plus
    // the post-ALTER row that only fits the wide type
    "q153_type_widening" ->
      """SELECT CAST(c_custkey AS BIGINT) AS ckey,
        |  CAST(CAST(c_acctbal AS FLOAT) AS DOUBLE) AS bal
        |FROM customer WHERE c_custkey <= 100
        |UNION ALL SELECT CAST(9999999999 AS BIGINT), CAST(0.5 AS DOUBLE)""".stripMargin,

    // not-null-constraint replay: the valid rows plus the one
    // re-admitted null row — both violating writes refused without
    // committing (asserted in-query)
    "q157_notnull_constraints" ->
      """SELECT c_custkey AS ckey, c_mktsegment AS seg FROM customer WHERE c_custkey <= 100
        |UNION ALL SELECT CAST(1000000 AS BIGINT), 'MACHINERY'
        |UNION ALL SELECT CAST(1000002 AS BIGINT), CAST(NULL AS VARCHAR)""".stripMargin,

    // BPE tokenizer replay: the identical greedy merge loop as a
    // recursive CTE over the identical merge table (interpolated from
    // graft.functions.Bpe — one source of truth); counts hash-match
    // bit for bit
    "q158_bpe_token_count" ->
      s"""WITH RECURSIVE $bpeCtes
         |SELECT c.doc_id, c.n_tokens AS n_tokens_bpe,
         |  CAST(len($duckWordToks) AS BIGINT) AS n_tokens_ws
         |FROM bpe_counts c JOIN documents USING (doc_id)""".stripMargin,

    // BPE-denominated sequence packing (the q43 variant the verdict
    // asked for): identical shard/cumsum/div-mod machinery, token
    // counts from the BPE replay instead of whitespace words
    "q159_bpe_sequence_pack" ->
      s"""WITH RECURSIVE $bpeCtes,
         |t AS (
         |  SELECT d.doc_id,
         |    CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard,
         |    c.n_tokens
         |  FROM documents d JOIN bpe_counts c USING (doc_id)),
         |cc AS (
         |  SELECT doc_id, shard, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
         |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id,
         |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS seq_offset
         |FROM cc""".stripMargin,

    // BPE-denominated token-budget mix (the q103 variant): same
    // per-source hash-ordered admission, budget priced in BPE tokens
    "q160_bpe_budget_mix" ->
      s"""WITH RECURSIVE $bpeCtes,
         |t AS (
         |  SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
         |    c.n_tokens,
         |    CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM documents d JOIN bpe_counts c USING (doc_id)),
         |cc AS (
         |  SELECT doc_id, text, lang, source, n_chars, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM t)
         |SELECT doc_id, text, lang, source, n_chars, n_tokens, cum_tokens
         |FROM cc WHERE cum_tokens - n_tokens < 20000""".stripMargin,

    // partitioned-DML replay: UPDATE (1996 doubled) then MERGE
    // (matched %7 keys +1000, one synthetic insert into a fresh
    // partition) as plain per-row arithmetic over the slice — the
    // Spark side additionally asserts the layout-scoped rewrite and
    // the minted partition dir in-query
    "q162_partitioned_dml" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS oyr
        |  FROM orders WHERE o_custkey <= 300),
        |u AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN oyr = 1996 THEN o_totalprice * 2 ELSE o_totalprice END AS p, oyr
        |  FROM base)
        |SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN p + 1000.0 ELSE p END AS o_totalprice, oyr
        |FROM u
        |UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
        |  CAST(42.0 AS DOUBLE), 2099""".stripMargin,

    // materialized-view replay: final base state (append widened the
    // custkey slice to 1200, the MOR delete struck totalprice >=
    // 250000) aggregated with the exact-decimal sum — the Spark side
    // served this from the incrementally-maintained backing table and
    // asserted maintained == recompute in-query
    "q163_materialized_view" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_custkey <= 1200 AND o_totalprice < 250000
        |GROUP BY 1""".stripMargin,

    // vacuum retention replay: the reclaimed-inventory counts are
    // LITERAL (scripted history: v1's two superseded files + one
    // planted crashed orphan reclaim; v2 survives via its tag; the
    // branch fork record expires under keep_last=2) and the surviving
    // surfaces replay as slice counts over orders
    "q165_vacuum_retention" ->
      """SELECT 'expired_snapshots' AS metric, CAST(1 AS BIGINT) AS value
        |UNION ALL SELECT 'expired_branch_snapshots', CAST(1 AS BIGINT)
        |UNION ALL SELECT 'orphan_files', CAST(3 AS BIGINT)
        |UNION ALL SELECT 'rows_current',
        |  (SELECT count(*) FROM orders WHERE o_custkey <= 500)
        |UNION ALL SELECT 'rows_tag_gold',
        |  (SELECT count(*) FROM orders WHERE o_custkey <= 300)
        |UNION ALL SELECT 'rows_branch',
        |  (SELECT count(*) FROM orders WHERE o_custkey <= 450)""".stripMargin,

    // MV-rewrite replay: the user's aggregate over the final base
    // state (custkey <= 800, the MV's own WHERE) — the Spark side
    // served it from the refreshed backing table with the
    // rewrite/stale/refresh cycle plan-asserted in-query
    "q167_mv_query_rewrite" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_custkey <= 800 AND o_totalprice < 150000
        |GROUP BY 1""".stripMargin,

    // streaming-MV replay: final base state (custkey widened to 900,
    // COW delete struck totalprice >= 200000) aggregated with the
    // exact-decimal sum — the Spark side served this from the
    // stream-maintained backing table and asserted marker-caught-up
    // in-query
    "q166_mv_stream_maintain" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_custkey <= 900 AND o_totalprice < 200000
        |GROUP BY 1""".stripMargin,

    // schema-evolution MERGE replay: custkey<=400 base, matched
    // ck<=200 repriced +100 with the audit tag, 400<ck<=500 inserted
    // with their source tag, everything else NULL for the evolved
    // column — per-row closed form over the raw slice
    "q164_merge_schema_evolution" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_custkey <= 200 THEN o_totalprice + 100.0
        |       ELSE o_totalprice END AS o_totalprice,
        |  CASE WHEN o_custkey <= 200 THEN 'repriced'
        |       WHEN o_custkey > 400 THEN 'src_' || o_orderpriority END AS audit_tag
        |FROM orders WHERE o_custkey <= 500""".stripMargin,

    // persisted-view replay: the view body over the raw slice — the
    // Spark side resolved it through a persisted catalog view read
    // back by a fresh catalog instance (rename + SHOW VIEWS asserted
    // in-query)
    "q156_persisted_view" ->
      """SELECT o_orderpriority AS prio, count(*) AS n,
        |  sum(o_totalprice) AS total
        |FROM orders WHERE o_custkey <= 500
        |GROUP BY o_orderpriority""".stripMargin,

    // metadata-delete replay: the surviving customers — the Spark side
    // dropped the middle file without reading it (asserted in-query)
    "q143_metadata_delete" ->
      """WITH m AS (SELECT max(c_custkey) // 3 AS a, 2 * max(c_custkey) // 3 AS b
        |           FROM customer)
        |SELECT c_custkey, c_name, c_mktsegment FROM customer, m
        |WHERE NOT (c_custkey > m.a AND c_custkey <= m.b)""".stripMargin,

    // runtime-filter replay: the star join statically — the Spark side
    // pruned fact files at execution time via the dim's surviving keys
    // (asserted in-query through the skip probe)
    "q144_runtime_filter_join" ->
      """SELECT o_orderkey AS okey, CAST(o_orderdate AS DATE) AS od,
        |  o_totalprice AS price
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-02-01'
        |  AND day(CAST(o_orderdate AS DATE)) <= 5""".stripMargin,

    // filtered metadata-aggregate replay: the same aggregates under
    // the same day-aligned WHERE over the raw parquet — the Spark side
    // answered them from manifest stats of the surviving files only,
    // with zero data tasks (asserted in-query)
    "q148_filtered_metadata_agg" ->
      """SELECT count(*) AS n, count(o_totalprice) AS np,
        |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok,
        |  min(CAST(o_orderdate AS DATE)) AS min_od,
        |  max(CAST(o_orderdate AS DATE)) AS max_od,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-02-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-03-01'""".stripMargin,

    // metadata-aggregate replay: the same unfiltered aggregates over
    // the raw parquet — the Spark side answered them from manifest
    // stats without scanning a data file (asserted in-query)
    "q142_metadata_agg" ->
      """SELECT count(*) AS n, count(l_quantity) AS nq,
        |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,

    // rate-limited catch-up: four capped micro-batches (asserted
    // in-query) drain exactly the four appended quarters = the events
    // table, each row exactly once
    "q141_rate_limited_catchup" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |FROM events""".stripMargin,

    // maintenance-tolerant stream: compaction/sort rewrites serve
    // nothing, appends serve once — the drain is the full replay
    "q132_stream_skip_rewrites" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |FROM events""".stripMargin,

    // streaming CDF replay of the scripted history: appends INSERT at
    // their versions, the COW delete nets pure DELETEs (carried rows
    // cancel), the COW update nets DELETE(old)+INSERT(new) over the
    // v3-live rows, the compaction nets zero
    "q133_stream_changelog" ->
      """WITH base AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS skey, s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal FROM supplier),
        |app AS (
        |  SELECT CAST(s_suppkey AS BIGINT) + 1000 AS skey, 'n_' || s_name AS s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal
        |  FROM supplier WHERE s_suppkey BETWEEN 3 AND 7),
        |v2state AS (SELECT * FROM base UNION ALL SELECT * FROM app),
        |live3 AS (SELECT * FROM v2state WHERE skey % 3 <> 0),
        |out AS (
        |  SELECT skey, s_name, bal, 'INSERT' AS _change_type, 1 AS _change_version FROM base
        |  UNION ALL SELECT skey, s_name, bal, 'INSERT', 2 FROM app
        |  UNION ALL SELECT skey, s_name, bal, 'DELETE', 3 FROM v2state WHERE skey % 3 = 0
        |  UNION ALL SELECT skey, s_name, bal, 'DELETE', 4 FROM live3 WHERE skey % 4 = 1
        |  UNION ALL SELECT skey, s_name, CAST(bal + 50 AS DECIMAL(12,2)), 'INSERT', 4
        |    FROM live3 WHERE skey % 4 = 1)
        |SELECT skey, s_name, CAST(bal AS DOUBLE) AS bal, _change_type, _change_version
        |FROM out""".stripMargin,

    // branch changelog replay: appended rows INSERT at branch v2;
    // every row matching the delete predicate (base AND just-appended)
    // DELETEs at v3 — carried rewrite rows cancel in the file diff
    "q130_branch_changelog" ->
      """WITH base AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS skey, s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal FROM supplier),
        |app AS (
        |  SELECT CAST(s_suppkey AS BIGINT) + 1000 AS skey, 'x_' || s_name AS s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal
        |  FROM supplier WHERE s_suppkey BETWEEN 3 AND 7),
        |allrows AS (SELECT * FROM base UNION ALL SELECT * FROM app)
        |SELECT 'INSERT' AS _change_type, CAST(2 AS INT) AS _change_version,
        |       skey, s_name, CAST(bal AS DOUBLE) AS bal FROM app
        |UNION ALL
        |SELECT 'DELETE', CAST(3 AS INT), skey, s_name, CAST(bal AS DOUBLE)
        |FROM allrows WHERE skey % 4 = 1""".stripMargin,

    // streamed branch changelog replay: the appended rows INSERT at
    // branch v2, the branch MOR delete's kills (base AND appended
    // rows) DELETE at v3 — same net contract as the batch q130, the
    // stream just serves it per micro-batch with fork-id offsets
    "q138_branch_stream_cdc" ->
      """WITH base AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS skey, s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal FROM supplier),
        |app AS (
        |  SELECT CAST(s_suppkey AS BIGINT) + 1000 AS skey, 'x_' || s_name AS s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal
        |  FROM supplier WHERE s_suppkey BETWEEN 3 AND 7),
        |allrows AS (SELECT * FROM base UNION ALL SELECT * FROM app)
        |SELECT 'INSERT' AS _change_type, CAST(2 AS INT) AS _change_version,
        |       skey, s_name, CAST(bal AS DOUBLE) AS bal FROM app
        |UNION ALL
        |SELECT 'DELETE', CAST(3 AS INT), skey, s_name, CAST(bal AS DOUBLE)
        |FROM allrows WHERE skey % 4 = 1""".stripMargin,

    // branch-MOR CDC replay: base minus the branch position delete,
    // then the CDC batch applied (every batch key leaves, non-D rows
    // re-enter) — identical in the branch read and the published read
    "q127_branch_mor_cdc" ->
      """WITH base AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS skey, s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal
        |  FROM supplier WHERE s_suppkey <= 6),
        |live1 AS (SELECT * FROM base WHERE skey NOT IN (1, 2)),
        |batch AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS skey, 'b_' || s_name AS s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal,
        |         CASE WHEN s_suppkey % 2 = 0 THEN 'U' ELSE 'D' END AS op
        |  FROM supplier WHERE s_suppkey BETWEEN 4 AND 8
        |  UNION ALL
        |  SELECT CAST(s_suppkey AS BIGINT) + 100, 'n_' || s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)), 'U'
        |  FROM supplier WHERE s_suppkey <= 2),
        |st AS (
        |  SELECT l.skey, l.s_name, l.bal FROM live1 l
        |  WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.skey = l.skey)
        |  UNION ALL
        |  SELECT skey, s_name, bal FROM batch WHERE op <> 'D')
        |SELECT 'branch' AS state, skey, s_name, CAST(bal AS DOUBLE) AS bal FROM st
        |UNION ALL
        |SELECT 'published' AS state, skey, s_name, CAST(bal AS DOUBLE) FROM st""".stripMargin,

    // SPJ replay: the zero-exchange plan shape is asserted in-query
    // and spec-pinned; the oracle checks the join SEMANTICS
    "q126_spj_join" ->
      """WITH o AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS cust,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1)
        |SELECT CAST(c_custkey AS BIGINT) AS cust, CAST(c_nationkey AS INT) AS nk,
        |       c_mktsegment AS segment, o.n_orders, o.total
        |FROM customer c JOIN o ON CAST(c_custkey AS BIGINT) = o.cust""".stripMargin,

    "q125_dirty_dml" ->
      """WITH base AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS skey, s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal FROM supplier),
        |live1 AS (SELECT * FROM base WHERE skey % 3 <> 1),
        |upd AS (SELECT skey, s_name,
        |          CASE WHEN skey % 5 = 0 THEN CAST(bal + 100 AS DECIMAL(12,2))
        |               ELSE bal END AS bal
        |        FROM live1),
        |live2 AS (SELECT * FROM upd WHERE skey % 4 <> 2),
        |src AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS skey, 'm_' || s_name AS s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal
        |  FROM supplier WHERE s_suppkey % 2 = 0
        |  UNION ALL
        |  SELECT CAST(s_suppkey AS BIGINT) + 1000, 'm_' || s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2))
        |  FROM supplier WHERE s_suppkey % 2 = 0),
        |merged AS (
        |  SELECT l.skey, coalesce(s.s_name, l.s_name) AS s_name,
        |         coalesce(s.bal, l.bal) AS bal
        |  FROM live2 l LEFT JOIN src s ON l.skey = s.skey
        |  UNION ALL
        |  SELECT s.skey, s.s_name, s.bal FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM live2 l WHERE l.skey = s.skey))
        |SELECT state, skey, s_name, CAST(bal AS DOUBLE) AS bal FROM (
        |  SELECT 'pending' AS state, * FROM live1
        |  UNION ALL
        |  SELECT 'final' AS state, * FROM merged)""".stripMargin,

    "q35_window_analytics" ->
      s"""WITH clean AS ($cleanLineitemSql)
         |SELECT l_suppkey, ship_date, l_orderkey, l_linenumber, revenue,
         |  lag(l_orderkey, 1) OVER w AS prev_orderkey,
         |  CAST(sum(CAST(revenue AS DECIMAL(30,4))) OVER (
         |    PARTITION BY l_suppkey ORDER BY ship_date, l_orderkey, l_linenumber
         |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_revenue
         |FROM clean
         |WHERE l_suppkey < 20
         |WINDOW w AS (PARTITION BY l_suppkey ORDER BY ship_date, l_orderkey, l_linenumber)""".stripMargin,

    "q36_set_ops" ->
      """SELECT CAST(nk AS INT) AS nk, 'both' AS src FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT
        |  SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT CAST(nk AS INT) AS nk, 'cust_only' AS src FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  EXCEPT
        |  SELECT s_nationkey FROM supplier)""".stripMargin,

    "q37_semi_anti_join" ->
      s"""WITH clean AS ($cleanLineitemSql),
         |hot AS (SELECT DISTINCT l_suppkey FROM clean WHERE revenue > 80000)
         |SELECT s_suppkey, s_nationkey, TRUE AS has_hot_line
         |FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM hot)
         |UNION ALL
         |SELECT s_suppkey, s_nationkey, FALSE AS has_hot_line
         |FROM supplier WHERE s_suppkey NOT IN (SELECT l_suppkey FROM hot)""".stripMargin,

    // DuckDB's native ASOF JOIN is the oracle for the union+window
    // formulation; right side pre-deduped per (custkey, orderdate)
    // with the same max-orderkey tie-break. ts is TIMESTAMP_NS in
    // DuckDB -> CAST to micros to match the Spark read.
    "q38_asof_join" ->
      """WITH rd AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderdate,
        |      o_orderkey AS last_orderkey, o_totalprice AS last_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                         ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  rd.last_orderkey, rd.last_totalprice
        |FROM events e
        |ASOF LEFT JOIN rd
        |  ON e.user_id = rd.o_custkey AND CAST(e.ts AS TIMESTAMP) >= rd.o_orderdate""".stripMargin,

    // same md5 bucket as the Spark side (60-bit md5 prefix mod 10000);
    // cuts are integer literals so no float compare is involved
    "q39_stratified_sample" ->
      """SELECT doc_id, lang, source,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS bucket
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
        |  < (CASE WHEN lang = 'zh' THEN 5000 WHEN lang = 'en' THEN 1000 ELSE 2500 END)""".stripMargin,

    "q19_ann_bruteforce" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 16),
        |s AS (
        |  SELECT q.q_id, e.vec_id,
        |    list_dot_product(qv, v)
        |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cos
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id)
        |SELECT q_id, vec_id AS neighbor_id,
        |  CAST(row_number() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rn
        |FROM s
        |QUALIFY rn <= 5""".stripMargin,

    // v1 = the full nation table; v2 = after DELETE WHERE n_regionkey = 2
    "q45_time_travel" ->
      """SELECT n_nationkey, n_name, n_regionkey, 'v1' AS snap FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 'v2' AS snap FROM nation
        |WHERE n_regionkey <> 2""".stripMargin,

    // post-MERGE state reconstructed with a full outer join: matched ->
    // balance + delta (per-row IEEE adds, deterministic), target-only ->
    // balance, source-only -> delta inserted as balance
    "q46_merge_dml" ->
      """WITH t AS (SELECT s_suppkey, s_name, s_acctbal AS balance
        |           FROM supplier WHERE s_suppkey <= 80),
        |s AS (SELECT s_suppkey, s_name, s_acctbal * CAST(0.5 AS DOUBLE) AS delta
        |      FROM supplier WHERE s_suppkey > 40)
        |SELECT COALESCE(t.s_suppkey, s.s_suppkey) AS s_suppkey,
        |  COALESCE(t.s_name, s.s_name) AS s_name,
        |  CASE WHEN t.s_suppkey IS NOT NULL AND s.s_suppkey IS NOT NULL
        |         THEN t.balance + s.delta
        |       WHEN t.s_suppkey IS NOT NULL THEN t.balance
        |       ELSE s.delta END AS balance
        |FROM t FULL JOIN s ON t.s_suppkey = s.s_suppkey""".stripMargin,

    // the incremental read returns exactly the second append's rows
    "q47_incremental_read" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_custkey <= 500 AND o_orderpriority = '2-HIGH'""".stripMargin,

    // rollback restores the good (first-append) snapshot's rows as
    // the new current version; the bad append is gone from reads
    "q62_rollback" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_custkey <= 500 AND o_orderpriority = '1-URGENT'""".stripMargin,

    // compaction preserves content exactly: rows equal the two commits'
    // union regardless of file layout
    "q63_compact" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier""".stripMargin,

    // full-clause MERGE: matched+negative-delta deleted, matched
    // updated, unmatched source inserted, not-matched-by-source zeroed
    "q64_merge_full" ->
      """WITH t AS (
        |  SELECT s_suppkey, s_name, s_acctbal AS balance
        |  FROM supplier WHERE s_suppkey <= 60),
        |s AS (
        |  SELECT s_suppkey, s_name, s_acctbal * 0.5 AS delta
        |  FROM supplier WHERE s_suppkey > 30 AND s_suppkey <= 90)
        |SELECT t.s_suppkey, t.s_name,
        |  CASE WHEN s.s_suppkey IS NULL THEN 0.0
        |       ELSE t.balance + s.delta END AS balance
        |FROM t LEFT JOIN s ON t.s_suppkey = s.s_suppkey
        |WHERE s.s_suppkey IS NULL OR s.delta >= 0
        |UNION ALL
        |SELECT s.s_suppkey, s.s_name, s.delta AS balance
        |FROM s LEFT JOIN t ON s.s_suppkey = t.s_suppkey
        |WHERE t.s_suppkey IS NULL""".stripMargin,

    // WAP lifecycle result: the published table is base ∪ staged batch
    "q65_wap" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_custkey <= 500
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin,

    // TIMESTAMP AS OF: the v1 instant reads pre-append state; head
    // reads everything
    "q66_time_travel_ts" ->
      """SELECT n_nationkey, n_name, 'asof' AS snap
        |FROM nation WHERE n_nationkey < 13
        |UNION ALL
        |SELECT n_nationkey, n_name, 'head' AS snap FROM nation""".stripMargin,

    // mixture balancing: per-language integer threshold over the
    // portable bucket space, derived from the rarest language's count
    "q67_mixture_balance" ->
      """WITH c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY lang),
        |m AS (SELECT min(c) AS mc FROM c)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN m
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
        |  < (m.mc * 1000000) // c.c""".stripMargin,

    // per-label centroids: element values quantized to a 1e-8 long
    // grid before the (exact integer) sum — identical double-promoted
    // multiply + ties-away rounding in both engines; flattened to
    // (label, pos, mean) rows (pos aligned to Spark's 0-base)
    "q68_embedding_centroids" ->
      """WITH u AS (
        |  SELECT label,
        |    unnest(generate_series(1, len(embedding))) AS pos,
        |    unnest(embedding) AS val
        |  FROM embeddings)
        |SELECT label,
        |  CAST(max(count(*)) OVER (PARTITION BY label) AS BIGINT) AS n_vectors,
        |  CAST(pos - 1 AS INT) AS pos,
        |  (CAST(sum(CAST(round(CAST(val AS DOUBLE) * 100000000.0) AS BIGINT)) AS DOUBLE)
        |     / 100000000.0) / count(*) AS mean
        |FROM u GROUP BY label, pos""".stripMargin,

    // the curation composition: q29's dedup, q15's quality/langid
    // scoring (identical IEEE term order, so the 0.5 threshold cuts the
    // same rows), q41's 5-gram decontamination over the kept set
    "q51_corpus_curation" ->
      s"""WITH dedup AS (
         |  SELECT d.doc_id, d.text FROM documents d
         |  JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)) k
         |    ON d.doc_id = k.doc_id),
         |kept AS (
         |  SELECT doc_id, text, $duckLang AS lang_pred, $duckQuality AS quality,
         |    $duckTok AS n_tokens
         |  FROM dedup
         |  WHERE $duckQuality >= 0.5),
         |t AS (
         |  SELECT doc_id, lang_pred, quality, n_tokens,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS bucket,
         |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> length(x) > 0) AS toks
         |  FROM kept),
         |g AS (
         |  SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
         |    i -> array_to_string(toks[i:i+4], ' ')))) AS gram
         |  FROM t),
         |bench AS (SELECT DISTINCT gram FROM g WHERE bucket < 50),
         |dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram) WHERE g.bucket >= 50)
         |SELECT doc_id, lang_pred, quality, n_tokens FROM t
         |WHERE bucket >= 50 AND doc_id NOT IN (SELECT doc_id FROM dirty)""".stripMargin,

    // frames at a 64-byte stride; the corpus is pure ASCII (verified at
    // every SF), so VARCHAR substring == byte slice and md5(VARCHAR) ==
    // Spark's md5 over the UTF-8 binary slice
    "q49_multimodal_frames" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |    CAST(least(greatest(1, (octet_length(encode(text)) + 63) // 64), 16) AS INT) AS n_frames
        |  FROM documents),
        |f AS (SELECT doc_id, text, unnest(range(0, n_frames)) AS fi FROM b)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |  CAST(fi * 64 AS BIGINT) AS frame_offset,
        |  CAST(length(substring(text, CAST(fi * 64 + 1 AS BIGINT), 16)) AS INT) AS frame_len,
        |  md5(substring(text, CAST(fi * 64 + 1 AS BIGINT), 16)) AS frame_sig
        |FROM f""".stripMargin,

    "q50_salted_join" ->
      s"""WITH clean AS ($cleanLineitemSql)
         |SELECT c.l_orderkey, c.l_linenumber, c.l_suppkey, c.revenue,
         |  s.s_name, s.s_nationkey
         |FROM clean c JOIN supplier s ON c.l_suppkey = s.s_suppkey""".stripMargin,

    // the partition-pruned read returns exactly the 1997 slice of the
    // cleaned projection (write path is ours; rows must round-trip)
    "q52_partition_pruned" ->
      s"""WITH clean AS ($cleanLineitemSql)
         |SELECT * FROM clean WHERE ship_year = 1997""".stripMargin,

    // net row-level history: v1 inserted every urgent row, v2's
    // copy-on-write delete removed the >= 150000 slice; carried-over
    // rows cancel in the file diff and never appear
    "q53_changelog" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
        |  WHERE o_custkey <= 500 AND o_orderpriority = '1-URGENT')
        |SELECT *, 'INSERT' AS _change_type, CAST(1 AS INT) AS _change_version FROM base
        |UNION ALL
        |SELECT *, 'DELETE' AS _change_type, CAST(2 AS INT) AS _change_version FROM base
        |WHERE o_totalprice >= 150000""".stripMargin,

    // the stream ingested every event exactly once (ids are unique, so
    // the watermark-bounded dedup is a pass-through) -> the rollup over
    // the sink table equals the rollup over the raw events
    "q48_stream_ingest" ->
      """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // the bloom pre-filter is exact by composition (no false negatives;
    // false positives die in the exact semi-join), so q54's oracle IS
    // q41's decontamination
    "q54_decontaminate_bloom" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS bucket,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> length(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, bucket, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
        |    i -> array_to_string(toks[i:i+4], ' ')))) AS gram
        |  FROM t),
        |bench AS (SELECT DISTINCT gram FROM g WHERE bucket < 50),
        |dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram) WHERE g.bucket >= 50)
        |SELECT doc_id, lang, source FROM t
        |WHERE bucket >= 50 AND doc_id NOT IN (SELECT doc_id FROM dirty)""".stripMargin,

    // incremental dedup: batch (bucket >= 8 of 10) vs corpus — exact
    // cross-pair char-5-gram Jaccard (oracle scale; the LSH index path
    // has recall 1 here, per q13's parity)
    "q55_incremental_dedup" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS bucket,
         |    $duckShingles AS sh
         |  FROM documents)
         |SELECT a.doc_id, b.doc_id AS dup_of,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |FROM g a JOIN g b ON a.bucket >= 8 AND b.bucket < 8
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7""".stripMargin,

    // incremental embedding dedup: the IVF-index path is exact (angular
    // triangle inequality never prunes a true pair; final filter is the
    // exact cosine), so the oracle is the plain cross-pair cosine join
    // over the same md5-bucket split
    "q56_incremental_embedding_dedup" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS bucket,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT a.vec_id, b.vec_id AS dup_of,
        |  list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        |FROM e a JOIN e b ON a.bucket >= 8 AND b.bucket < 8
        |WHERE list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4""".stripMargin,

    // incremental curation: q51's stages applied to one batch-vs-corpus
    // increment — exact dedup (within batch + vs corpus hashes),
    // quality gate, benchmark decontamination, exact near-dup rejection
    // vs the corpus (the index path has recall 1 here, per q13)
    "q57_incremental_curation" ->
      s"""WITH b AS (
         |  SELECT * FROM documents
         |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 >= 8),
         |c AS (
         |  SELECT * FROM documents
         |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8),
         |bd AS (
         |  SELECT d.* FROM b d
         |  JOIN (SELECT min(doc_id) AS doc_id FROM b GROUP BY md5(text)) k ON d.doc_id = k.doc_id
         |  WHERE md5(d.text) NOT IN (SELECT md5(text) FROM c)),
         |kept AS (
         |  SELECT doc_id, text, $duckLang AS lang_pred, $duckQuality AS quality,
         |    $duckTok AS n_tokens
         |  FROM bd WHERE $duckQuality >= 0.5),
         |t AS (
         |  SELECT doc_id, text, lang_pred, quality, n_tokens,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS bucket
         |  FROM kept),
         |allg AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS bucket,
         |    unnest(list_distinct(list_transform(range(1, len(toks) - 3),
         |      i -> array_to_string(toks[i:i+4], ' ')))) AS gram
         |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
         |          x -> length(x) > 0) AS toks FROM documents)),
         |bench AS (SELECT DISTINCT gram FROM allg WHERE bucket < 50),
         |tg AS (
         |  SELECT doc_id,
         |    unnest(list_distinct(list_transform(range(1, len(toks) - 3),
         |      i -> array_to_string(toks[i:i+4], ' ')))) AS gram
         |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
         |          x -> length(x) > 0) AS toks FROM t)),
         |dirty AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bench USING (gram)),
         |gsh AS (SELECT doc_id, $duckShingles AS sh FROM t),
         |csh AS (SELECT doc_id, $duckShingles AS sh FROM c),
         |nd AS (
         |  SELECT DISTINCT a.doc_id FROM gsh a JOIN csh b2
         |  ON CAST(len(list_intersect(a.sh, b2.sh)) AS DOUBLE)
         |       / len(list_distinct(list_concat(a.sh, b2.sh))) >= 0.7)
         |SELECT doc_id, lang_pred, quality, n_tokens FROM t
         |WHERE bucket >= 50 AND doc_id NOT IN (SELECT doc_id FROM dirty)
         |  AND doc_id NOT IN (SELECT doc_id FROM nd)""".stripMargin,

    // fuzzy-dedup corpus: q40's connected components reduced to the
    // min-id representative per cluster (doc_id == cluster_id)
    "q58_fuzzy_dedup_corpus" ->
      s"""WITH RECURSIVE g AS (
         |  SELECT doc_id, $duckShingles AS sh FROM documents),
         |p AS (
         |  SELECT a.doc_id AS s, b.doc_id AS d
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7),
         |e AS (SELECT s, d FROM p UNION ALL SELECT d, s FROM p),
         |r(s, d) AS (
         |  SELECT s, d FROM e
         |  UNION
         |  SELECT r.s, e.d FROM r JOIN e ON r.d = e.s),
         |c AS (
         |  SELECT doc.doc_id,
         |    CAST(least(doc.doc_id, coalesce(min(r.d), doc.doc_id)) AS BIGINT) AS cluster_id
         |  FROM documents doc LEFT JOIN r ON r.s = doc.doc_id
         |  GROUP BY doc.doc_id)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d JOIN c ON d.doc_id = c.doc_id
         |WHERE d.doc_id = c.cluster_id""".stripMargin,

    // PII redaction: identical derived PII-bearing prefix, identical
    // pattern set (graft.text.Redaction constants are RE2-compatible
    // by construction), redact order email -> ip -> phone
    "q59_pii_redact" ->
      s"""SELECT doc_id, source,
         |  CAST(len(regexp_extract_all(raw, '${graft.text.Redaction.EmailRe}')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(raw, '${graft.text.Redaction.Ipv4Re}')) AS INT) AS n_ips,
         |  CAST(len(regexp_extract_all(raw, '${graft.text.Redaction.PhoneRe}')) AS INT) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(raw,
         |    '${graft.text.Redaction.EmailRe}', '<EMAIL>', 'g'),
         |    '${graft.text.Redaction.Ipv4Re}', '<IP>', 'g'),
         |    '${graft.text.Redaction.PhoneRe}', '<PHONE>', 'g') AS redacted
         |FROM (
         |  SELECT doc_id, source,
         |    'user' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.com ' ||
         |    CASE WHEN doc_id % 3 > 0
         |      THEN 'call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' '
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 2 = 0
         |      THEN 'from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
         |           || CAST((doc_id * 7) % 256 AS VARCHAR) || ' '
         |      ELSE '' END ||
         |    text AS raw
         |  FROM documents) t""".stripMargin,

    // streaming windowed aggregation (complete mode): the finite
    // stream's final state equals the batch hourly rollup
    "q61_stream_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // bucketed co-located join: bucketing changes layout, never rows —
    // the oracle is the plain join+aggregate on the raw tables
    "q69_bucketed_join" ->
      """SELECT o.o_orderpriority, l.l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2""".stripMargin,

    // doc keywords: integer-only ranking keys (tf DESC, df ASC, token)
    // make the top-3 reproducible bit-for-bit across engines
    "q70_doc_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks WHERE length(token) >= 3
        |  GROUP BY doc_id, token),
        |wd AS (
        |  SELECT doc_id, token, tf,
        |    CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df
        |  FROM tf)
        |SELECT doc_id, token, tf, df, CAST(rank AS INT) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tf DESC, df ASC, token ASC) AS rank FROM wd) x
        |WHERE rank <= 3""".stripMargin,

    // quantized ANN: floor(x*256) is exact (power-of-two grid), the
    // dot is pure integer arithmetic — no cross-engine float noise
    "q71_ann_quantized" ->
      """WITH q8 AS (
        |  SELECT vec_id, list_transform(embedding, x ->
        |    GREATEST(-128, LEAST(127, CAST(FLOOR(CAST(x AS DOUBLE) * 256.0) AS BIGINT)))) AS v8
        |  FROM embeddings),
        |qs AS (SELECT vec_id AS q_id, v8 AS q8v FROM q8 WHERE vec_id < 10),
        |scored AS (
        |  SELECT qs.q_id, e.vec_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(e.v8)),
        |      i -> qs.q8v[i] * e.v8[i])) AS BIGINT) AS int_dot
        |  FROM q8 e CROSS JOIN qs WHERE e.vec_id <> qs.q_id)
        |SELECT q_id, vec_id AS neighbor_id, int_dot, CAST(rn AS INT) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY int_dot DESC, vec_id ASC) AS rn FROM scored) x
        |WHERE rn <= 10""".stripMargin,

    // stream-stream join: finite-drain inner join equals the batch
    // join; timestamps compared at Spark's microsecond precision
    "q72_stream_stream_join" ->
      """SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
        |  CAST(v.ts AS TIMESTAMP) AS view_ts, CAST(c.ts AS TIMESTAMP) AS click_ts
        |FROM events v JOIN events c
        |ON v.user_id = c.user_id
        |  AND v.event_type = 'view' AND c.event_type = 'click'
        |  AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
        |  AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 6 HOUR""".stripMargin,

    // schema evolution: rows written before ADD COLUMN read back
    // null-filled; RENAME COLUMN is metadata-only aliasing
    "q60_schema_evolution" ->
      """SELECT n_nationkey, n_name AS nation_name, CAST(NULL AS VARCHAR) AS region_name
        |FROM nation WHERE n_nationkey < 13
        |UNION ALL
        |SELECT n.n_nationkey, n.n_name AS nation_name, r.r_name AS region_name
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE n.n_nationkey >= 13""".stripMargin,

    // winnowing (SWA rolling-hash) fingerprint selection: word
    // trigrams hashed with the portable 60-bit md5 prefix, window w=4
    // minima, sorted distinct per doc, exploded. Mirrors
    // TextAnalysis.winnowSelectSql stage for stage; DuckDB
    // generate_series(1, n<1) is empty so the gram CASE is only needed
    // for the empty-hash window stage (list_min of an empty slice
    // would inject NULL).
    "q73_winnow_fingerprint" ->
      s"""WITH t AS (
         |  SELECT doc_id, $duckWordToks AS ts FROM documents),
         |g AS (
         |  SELECT doc_id, list_transform(generate_series(1, len(ts) - 2),
         |    i -> array_to_string(ts[i:i+2], ' ')) AS grams
         |  FROM t),
         |h AS (
         |  SELECT doc_id, list_transform(grams,
         |    x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS hs
         |  FROM g),
         |sel AS (
         |  SELECT doc_id, CASE WHEN len(hs) = 0 THEN hs
         |    ELSE list_sort(list_distinct(list_transform(
         |      generate_series(1, greatest(len(hs) - 3, 1)),
         |      i -> list_min(hs[i:i+3])))) END AS fp
         |  FROM h)
         |SELECT doc_id, unnest(fp) AS fp_hash FROM sel""".stripMargin,

    // shared-winnow-hash candidate pairs with the deterministic
    // df <= 50 boilerplate mask
    "q74_winnow_pairs" ->
      s"""WITH t AS (
         |  SELECT doc_id, $duckWordToks AS ts FROM documents),
         |g AS (
         |  SELECT doc_id, list_transform(generate_series(1, len(ts) - 2),
         |    i -> array_to_string(ts[i:i+2], ' ')) AS grams
         |  FROM t),
         |h AS (
         |  SELECT doc_id, list_transform(grams,
         |    x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS hs
         |  FROM g),
         |fp AS (
         |  SELECT doc_id, unnest(CASE WHEN len(hs) = 0 THEN hs
         |    ELSE list_sort(list_distinct(list_transform(
         |      generate_series(1, greatest(len(hs) - 3, 1)),
         |      i -> list_min(hs[i:i+3])))) END) AS fp_hash
         |  FROM h),
         |rare AS (
         |  SELECT fp_hash FROM fp GROUP BY 1 HAVING count(*) <= 50)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM fp a
         |JOIN rare r ON a.fp_hash = r.fp_hash
         |JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
         |GROUP BY 1, 2""".stripMargin,

    // winnow clone clusters: q74's pairs at n_shared >= 2, transitive
    // closure via recursive CTE, component label = min reachable id
    // (the q40 CC oracle pattern over a different pair generator)
    "q75_winnow_clusters" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, $duckWordToks AS ts FROM documents),
         |g AS (
         |  SELECT doc_id, list_transform(generate_series(1, len(ts) - 2),
         |    i -> array_to_string(ts[i:i+2], ' ')) AS grams
         |  FROM t),
         |h AS (
         |  SELECT doc_id, list_transform(grams,
         |    x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS hs
         |  FROM g),
         |fp AS (
         |  SELECT doc_id, unnest(CASE WHEN len(hs) = 0 THEN hs
         |    ELSE list_sort(list_distinct(list_transform(
         |      generate_series(1, greatest(len(hs) - 3, 1)),
         |      i -> list_min(hs[i:i+3])))) END) AS fp_hash
         |  FROM h),
         |rare AS (
         |  SELECT fp_hash FROM fp GROUP BY 1 HAVING count(*) <= 50),
         |p AS (
         |  SELECT a.doc_id AS s, b.doc_id AS d
         |  FROM fp a
         |  JOIN rare rr ON a.fp_hash = rr.fp_hash
         |  JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS (SELECT s, d FROM p UNION ALL SELECT d, s FROM p),
         |r(s, d) AS (
         |  SELECT s, d FROM e
         |  UNION
         |  SELECT r.s, e.d FROM r JOIN e ON r.d = e.s)
         |SELECT doc.doc_id,
         |  CAST(least(doc.doc_id, coalesce(min(r.d), doc.doc_id)) AS BIGINT) AS cluster_id
         |FROM documents doc LEFT JOIN r ON r.s = doc.doc_id
         |GROUP BY doc.doc_id""".stripMargin,

    // winnow-dedup corpus: q75's clusters reduced to the min-id
    // representative (a doc survives iff its component min is itself)
    "q76_winnow_dedup_corpus" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, $duckWordToks AS ts FROM documents),
         |g AS (
         |  SELECT doc_id, list_transform(generate_series(1, len(ts) - 2),
         |    i -> array_to_string(ts[i:i+2], ' ')) AS grams
         |  FROM t),
         |h AS (
         |  SELECT doc_id, list_transform(grams,
         |    x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS hs
         |  FROM g),
         |fp AS (
         |  SELECT doc_id, unnest(CASE WHEN len(hs) = 0 THEN hs
         |    ELSE list_sort(list_distinct(list_transform(
         |      generate_series(1, greatest(len(hs) - 3, 1)),
         |      i -> list_min(hs[i:i+3])))) END) AS fp_hash
         |  FROM h),
         |rare AS (
         |  SELECT fp_hash FROM fp GROUP BY 1 HAVING count(*) <= 50),
         |p AS (
         |  SELECT a.doc_id AS s, b.doc_id AS d
         |  FROM fp a
         |  JOIN rare rr ON a.fp_hash = rr.fp_hash
         |  JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS (SELECT s, d FROM p UNION ALL SELECT d, s FROM p),
         |r(s, d) AS (
         |  SELECT s, d FROM e
         |  UNION
         |  SELECT r.s, e.d FROM r JOIN e ON r.d = e.s),
         |lab AS (
         |  SELECT doc.doc_id,
         |    least(doc.doc_id, coalesce(min(r.d), doc.doc_id)) AS cluster_id
         |  FROM documents doc LEFT JOIN r ON r.s = doc.doc_id
         |  GROUP BY doc.doc_id)
         |SELECT d.doc_id, d.lang, d.source
         |FROM documents d JOIN lab ON d.doc_id = lab.doc_id
         |WHERE lab.doc_id = lab.cluster_id""".stripMargin,

    // catalog introspection reduced to deterministic values: a fresh
    // drop+overwrite leaves exactly one snapshot, files exist, row and
    // declared-column counts match the source projections
    "q77_catalog_introspection" ->
      """SELECT 'nation' AS table_name, CAST(1 AS BIGINT) AS n_snapshots,
        |  TRUE AS has_files, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(3 AS BIGINT) AS n_cols
        |FROM nation
        |UNION ALL
        |SELECT 'region', CAST(1 AS BIGINT), TRUE, CAST(count(*) AS BIGINT),
        |  CAST(2 AS BIGINT)
        |FROM region""".stripMargin,

    // existence guard before/after a create + count() actions
    "q78_existence_counts" ->
      """SELECT FALSE AS before_exists, TRUE AS after_exists,
        |  (SELECT CAST(count(*) AS BIGINT) FROM nation) AS nation_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM region) AS region_rows""".stripMargin,

    // exact word-trigram Jaccard pairs, brute force (the Spark side's
    // prefix filtering is a provably lossless candidate generator, so
    // the answers coincide exactly); trigram construction as in q42,
    // tokenizer parity proven at q30
    "q79_jaccard_join" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> length(x) > 0) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> array_to_string(toks[i:i+2], ' '))) AS grams
        |  FROM t),
        |ne AS (SELECT doc_id, grams FROM g WHERE len(grams) > 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
        |FROM ne a JOIN ne b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.6""".stripMargin,

    // Z-order compaction is exactly row-preserving: the clustered
    // table's 2-D range slice equals the same filter on raw lineitem
    "q80_zorder_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 30""".stripMargin,

    // exact corr/covar/stddev: component sums are exact decimal sums
    // (2-decimal inputs, decimal products), combined once per group in
    // double with the identical expression tree as the Spark side —
    // bit-reproducible, unlike double-accumulating builtins
    "q81_exact_corr" ->
      """WITH s AS (
        |  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n_rows,
        |  (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_xy,
        |  (sxy - sx * sy / n) / (n - 1) AS covar_xy,
        |  sqrt((syy - sy * sy / n) / (n - 1)) AS stddev_y
        |FROM s""".stripMargin,

    // conversion funnel: stage mins + horizon-bounded joins; delay
    // averages are exact microsecond sums over one IEEE division
    "q82_event_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts, min(v.view_ts) AS view_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.view_ts
        |    AND e.ts <= v.view_ts + INTERVAL 24 HOUR
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts, min(c.click_ts) AS click_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
        |    AND e.ts <= c.click_ts + INTERVAL 24 HOUR
        |  GROUP BY 1)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewers,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clickers,
        |  (SELECT CAST(sum(epoch_us(click_ts) - epoch_us(view_ts)) AS DOUBLE)
        |     / count(*) / 1000000.0 FROM c) AS avg_view_to_click_sec,
        |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchasers,
        |  (SELECT CAST(sum(epoch_us(purchase_ts) - epoch_us(click_ts)) AS DOUBLE)
        |     / count(*) / 1000000.0 FROM p) AS avg_click_to_purchase_sec""".stripMargin,

    // weekly cohort retention; both week columns are Monday-truncated
    // dates so the day diff is an exact multiple of 7
    "q83_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
        |  FROM events)
        |SELECT f.cohort_week,
        |  CAST(datediff('day', f.cohort_week, a.act_week) // 7 AS INT) AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // exact interpolated percentiles (index p*(n-1), linear
    // interpolation — Spark percentile() and DuckDB quantile_cont
    // share the definition; inputs are ints so the arithmetic is the
    // same two IEEE ops on both engines)
    "q84_length_percentiles" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  quantile_cont(n_chars, 0.5) AS p50_chars,
        |  quantile_cont(n_chars, 0.9) AS p90_chars,
        |  quantile_cont(n_chars, 0.99) AS p99_chars
        |FROM documents GROUP BY 1""".stripMargin,

    // the maintained rollup must equal the direct aggregate over the
    // table's FINAL state (base minus the delete predicate): the IVM
    // merge is exact decimal arithmetic, so the hash check proves
    // incremental == recomputed
    "q85_ivm_rollup" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_custkey <= 1000 AND o_totalprice < 200000
        |GROUP BY 1""".stripMargin,

    // all six constraints hold on the fixture, so every violation
    // count is 0 — the oracle still pins the check NAMES and the
    // zero-not-null/zero-not-missing shape ("check" quoted: reserved)
    "q86_integrity_audit" ->
      """SELECT 'lineitem_orphan_orderkey' AS "check", CAST(count(*) AS BIGINT) AS violations
        |FROM lineitem WHERE l_orderkey IS NULL
        |  OR NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT)
        |FROM orders WHERE o_custkey IS NULL
        |  OR NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |UNION ALL
        |SELECT 'customer_orphan_nationkey', CAST(count(*) AS BIGINT)
        |FROM customer WHERE c_nationkey IS NULL
        |  OR NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
        |UNION ALL
        |SELECT 'supplier_orphan_nationkey', CAST(count(*) AS BIGINT)
        |FROM supplier WHERE s_nationkey IS NULL
        |  OR NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = s_nationkey)
        |UNION ALL
        |SELECT 'orders_dup_orderkey', CAST(coalesce(sum(n - 1), 0) AS BIGINT)
        |FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey) WHERE n > 1
        |UNION ALL
        |SELECT 'customer_dup_custkey', CAST(coalesce(sum(n - 1), 0) AS BIGINT)
        |FROM (SELECT count(*) AS n FROM customer GROUP BY c_custkey) WHERE n > 1""".stripMargin,

    // NTILE is SQL-standard in both engines (first n%10 buckets get the
    // extra row); the window order tie-breaks on c_custkey and revenue
    // is an exact decimal sum cast to double, so bucket assignment is
    // deterministic and identical
    "q87_segment_deciles" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1),
        |pc AS (
        |  SELECT c_custkey, c_mktsegment, coalesce(rev.revenue, 0.0) AS revenue
        |  FROM customer LEFT JOIN rev ON o_custkey = c_custkey),
        |t AS (
        |  SELECT c_mktsegment, revenue,
        |    ntile(10) OVER (PARTITION BY c_mktsegment
        |                    ORDER BY revenue DESC, c_custkey ASC) AS decile
        |  FROM pc)
        |SELECT c_mktsegment, CAST(decile AS INT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(revenue AS DECIMAL(30,2))) AS DOUBLE) AS total_revenue,
        |  min(revenue) AS min_revenue, max(revenue) AS max_revenue
        |FROM t GROUP BY 1, 2""".stripMargin,

    // the oracle is the NAIVE inequality join (exactly what
    // intervalJoin refuses to plan); sessionization replays q18's
    // lag/cumsum construction over the power-user slice
    "q88_interval_join" ->
      """WITH pu AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
        |  FROM events WHERE user_id % 20 = 0),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM pu
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |t AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM s),
        |iv AS (
        |  SELECT user_id AS s_user, session_id,
        |    min(ts) AS s_start, max(ts) AS s_end
        |  FROM t GROUP BY 1, 2)
        |SELECT iv.s_user, CAST(iv.session_id AS BIGINT) AS session_id,
        |  epoch_us(iv.s_start) AS s_start_us,
        |  CAST(count(*) AS BIGINT) AS n_overlap,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM iv JOIN events e
        |  ON CAST(e.ts AS TIMESTAMP) >= iv.s_start AND CAST(e.ts AS TIMESTAMP) <= iv.s_end
        |GROUP BY 1, 2, 3""".stripMargin,

    // GROUPING() bit convention matches (first listed column = MSB in
    // Spark's grouping_id; per-column grouping() used here so the
    // convention question never arises); rolled-up keys surface as
    // NULL in both engines
    // SCD2 replay: untouched keys keep their open row; bucket-3 keys
    // get a closed original + an opened adjusted version (double add
    // of 100.0 is a single IEEE op — same in both engines)
    "q97_scd2_dimension" ->
      """WITH upd AS (
        |  SELECT c_custkey FROM customer
        |  WHERE CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 3)
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  DATE '1990-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
        |  TRUE AS is_current
        |FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |  DATE '1990-01-01', DATE '1995-06-01', FALSE
        |FROM customer WHERE c_custkey IN (SELECT c_custkey FROM upd)
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0, c_mktsegment,
        |  DATE '1995-06-01', CAST(NULL AS DATE), TRUE
        |FROM customer WHERE c_custkey IN (SELECT c_custkey FROM upd)""".stripMargin,

    // .column_stats answers from manifest metadata; the oracle
    // recomputes the identical profile from the data (string columns
    // carry NULL min/max — the metadata table only numerics them)
    "q96_column_stats_meta" ->
      """SELECT 'l_extendedprice' AS col_name,
        |  CAST(min(l_extendedprice) AS DOUBLE) AS value_min,
        |  CAST(max(l_extendedprice) AS DOUBLE) AS value_max,
        |  CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
        |  CAST(count(*) AS BIGINT) AS row_count
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_orderkey', CAST(min(l_orderkey) AS DOUBLE), CAST(max(l_orderkey) AS DOUBLE),
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE),
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(count(*) AS BIGINT)
        |FROM lineitem""".stripMargin,

    // RANGE frame over integer epoch-micros: identical inclusion
    // semantics in both engines (peers at equal micros are in-frame)
    "q95_rolling_rate" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(30,2))) OVER w AS DOUBLE) AS value_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // corpus (bucket < 8) minus every vector with cosine >= 0.4 to ANY
    // benchmark vector (bucket >= 8); same portable md5 bucket and
    // duckCos parity as q39/q27
    "q94_embedding_decontaminate" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         |    CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS bucket
         |  FROM embeddings),
         |c AS (SELECT vec_id, v FROM e WHERE bucket < 8),
         |b AS (SELECT vec_id, v FROM e WHERE bucket >= 8)
         |SELECT c.vec_id FROM c
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM b WHERE ${duckCos("c.v", "b.v")} >= 0.4)""".stripMargin,

    // DuckDB's native ASOF JOIN replays the union+window as-of (q38's
    // proven pairing); delays sum as exact BIGINT micros
    "q93_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |c0 AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, event_id AS click_id FROM c0 WHERE rn = 1),
        |j AS (
        |  SELECT p.p_ts, p.value, c.click_id, c.ts AS click_ts
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND p.p_ts >= c.ts)
        |SELECT CAST(p_ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(CASE WHEN click_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
        |  CAST(sum(CASE WHEN click_id IS NOT NULL
        |           THEN epoch_us(p_ts) - epoch_us(click_ts) END) AS BIGINT) AS total_delay_us,
        |  CAST(sum(CASE WHEN click_id IS NOT NULL
        |           THEN CAST(value AS DECIMAL(30,2)) END) AS DOUBLE) AS attributed_value
        |FROM j GROUP BY 1""".stripMargin,

    // the .partitions metadata table answers from manifest stats; the
    // oracle recomputes the same per-partition row counts from data
    "q92_partitions_meta" ->
      s"""WITH clean AS ($cleanLineitemSql)
         |SELECT 'ship_year=' || CAST(ship_year AS VARCHAR) AS "partition",
         |  CAST(count(*) AS BIGINT) AS row_count
         |FROM clean GROUP BY 1""".stripMargin,

    // single availableNow batch (one source file) -> the upserted
    // state table is the per-user argmax over the whole stream under
    // the (ts, event_id) total order
    "q91_stream_upsert" ->
      """WITH r AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_id, ts, user_id, event_type, value, props
        |FROM r WHERE rn = 1""".stripMargin,

    // the bloom index changes WHICH FILES are scanned, never the rows:
    // the oracle is the plain point lookup
    "q90_bloom_pointlookup" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey IN (7, 33, 129, 1024, 5000, 10000000)""".stripMargin,

    "q89_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,

    // span dedup: same tokenizer as q41, same 60-bit md5 gram hash as
    // q12/q73 (identical hash input -> identical duplicated-set
    // decision by construction); the t/g/d/p/b/isl pipeline is the
    // SHARED spanIslandCtes builder (n encoded once for q98 AND q99).
    "q98_dup_spans" ->
      s"""WITH ${spanIslandCtes(SpanN)}
         |SELECT doc_id,
         |  CAST(min(pos) AS INTEGER) AS span_start,
         |  CAST(max(pos) + ${SpanN - 1} AS INTEGER) AS span_end,
         |  CAST(max(pos) + ${SpanN - 1} - min(pos) + 1 AS INTEGER) AS span_tokens
         |FROM isl GROUP BY doc_id, island""".stripMargin,

    // the span-CUT corpus: q98's spans applied back to the token
    // stream — token kept iff no span covers its position; emptied
    // documents dropped
    "q99_span_dedup_corpus" ->
      s"""WITH ${spanIslandCtes(SpanN)},
         |sp AS (
         |  SELECT doc_id, min(pos) AS s0, max(pos) + ${SpanN - 1} AS s1
         |  FROM isl GROUP BY doc_id, island),
         |tok AS (
         |  SELECT doc_id, len(toks) AS n_tokens,
         |    unnest(list_transform(range(1, len(toks) + 1),
         |      i -> {'pos': CAST(i - 1 AS INTEGER), 'tok': toks[i]}), recursive := true)
         |  FROM t),
         |keptTok AS (
         |  SELECT tk.doc_id, tk.pos, tk.tok, tk.n_tokens
         |  FROM tok tk
         |  WHERE NOT EXISTS (SELECT 1 FROM sp
         |    WHERE sp.doc_id = tk.doc_id AND tk.pos >= sp.s0 AND tk.pos <= sp.s1))
         |SELECT doc_id,
         |  string_agg(tok, ' ' ORDER BY pos) AS kept_text,
         |  CAST(count(*) AS INTEGER) AS kept_tokens,
         |  CAST(any_value(n_tokens) - count(*) AS INTEGER) AS cut_tokens
         |FROM keptTok GROUP BY doc_id""".stripMargin,

    // branch lifecycle replay: main_before = the base append only
    // (branch commits invisible); branch_head and main_after = base +
    // both branch appends (fast-forward integrates exactly the branch
    // head's files)
    "q101_branch_lifecycle" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_custkey <= 500),
        |full_set AS (
        |  SELECT * FROM o
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM'))
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
        |  'main_before' AS stage
        |FROM o WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
        |  'branch_head' AS stage FROM full_set
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
        |  'main_after' AS stage FROM full_set""".stripMargin,

    // .refs is fully scripted: one tag at v1, branch 'exp' head at its
    // v2 (create + one append), branch 'idle' head at its v1
    "q109_refs_meta" ->
      """SELECT 'audited' AS ref_name, 'tag' AS ref_type, 1 AS version
        |UNION ALL SELECT 'exp', 'branch', 2
        |UNION ALL SELECT 'idle', 'branch', 1""".stripMargin,

    // the hidden-days layout must lose no rows to pruning: the oracle
    // is the same range aggregate over the RAW events table (no
    // layout, no pruning) — boundary timestamps included
    "q111_hidden_days_prune" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-13 00:00:00'
        |GROUP BY 1""".stripMargin,

    // bucket pruning is exactness-neutral by the oracle's definition:
    // the IN lookup over the raw table
    "q112_hidden_bucket_prune" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_custkey IN (7, 33, 129, 466)""".stripMargin,

    // SemDeDup keep-set replay: a vector is dropped iff some
    // smaller-id vector sits at cosine >= 0.4 (the naive all-pairs
    // EXISTS the cell-bucketed plan refuses to run)
    "q113_semdedup_corpus" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |d AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4)
        |SELECT vec_id, label FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM d)""".stripMargin,

    // Gopher-rule replay: every counter is the same regexp over the
    // same text (RE2 and Java agree on these anchor-free patterns;
    // regexp_replace needs the 'g' flag here, Spark replaces all by
    // default), every ratio an integer cross-multiplication. keep
    // includes the two line rules even though their columns are not
    // projected (single-line fixture docs satisfy them trivially).
    "q116_gopher_rules" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_words,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS INT) AS word_chars,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS INT) AS n_sym,
        |    CAST(len(regexp_extract_all(text, '\n')) + 1 AS INT) AS n_lines,
        |    CAST(len(regexp_extract_all(chr(10) || text, '\n[ \t]*[-*•]')) AS INT) AS n_bullet,
        |    CAST(len(regexp_extract_all(text || chr(10), '(\.\.\.|…)[ \t]*\n')) AS INT) AS n_ellipsis,
        |    CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS INT) AS n_alpha_words,
        |    CAST((CASE WHEN instr(' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') || ' ', ' the ') > 0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN instr(' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') || ' ', ' be ') > 0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN instr(' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') || ' ', ' to ') > 0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN instr(' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') || ' ', ' of ') > 0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN instr(' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') || ' ', ' and ') > 0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN instr(' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') || ' ', ' that ') > 0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN instr(' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') || ' ', ' have ') > 0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN instr(' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') || ' ', ' with ') > 0 THEN 1 ELSE 0 END)
        |      AS INT) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_words, word_chars, n_stop,
        |  (n_words BETWEEN 50 AND 100000) AS r_word_count,
        |  (3 * n_words <= word_chars AND word_chars <= 10 * n_words) AS r_mean_word_len,
        |  (10 * n_sym <= n_words) AS r_symbol_ratio,
        |  (5 * n_alpha_words >= 4 * n_words) AS r_alpha_words,
        |  (n_stop >= 2) AS r_stopwords,
        |  ((n_words BETWEEN 50 AND 100000)
        |    AND (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
        |    AND (10 * n_sym <= n_words)
        |    AND (10 * n_bullet <= n_lines)
        |    AND (10 * n_ellipsis <= 3 * n_lines)
        |    AND (5 * n_alpha_words >= 4 * n_words)
        |    AND (n_stop >= 2)) AS keep
        |FROM c""".stripMargin,

    // DSIR replay: same tokenizer, same hashed unigram+bigram buckets
    // (portable md5 % 10000), same add-one bucket models and the same
    // portable-ln nano-nat log-ratios — the per-doc weight is an exact
    // BIGINT dot product, hash-identical across engines. sum(BIGINT)
    // is HUGEINT in DuckDB -> cast back.
    "q146_dsir_selection" ->
      s"""WITH $q146WeightsCtes,
         |k AS (SELECT count(*) // 4 AS k FROM w),
         |r AS (
         |  SELECT doc_id, weight_nano,
         |    CAST(row_number() OVER (ORDER BY weight_nano DESC, doc_id) AS INT) AS rk
         |  FROM w)
         |SELECT doc_id, weight_nano, rk FROM r, k WHERE rk <= k.k""".stripMargin,

    // DSIR threshold selection (the crawl-scale form): the SAME
    // weights, but the keep cut is the top-quartile value of a
    // deterministic md5-admitted 1/4 sample, selection a plain >= —
    // replayed here exactly (same sample, same cut, ties kept)
    "q151_dsir_threshold" ->
      s"""WITH $q146WeightsCtes,
         |sw AS (SELECT * FROM w
         |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 4 = 0),
         |rw AS (
         |  SELECT weight_nano,
         |    row_number() OVER (ORDER BY weight_nano DESC, doc_id) AS srn,
         |    count(*) OVER () AS ns
         |  FROM sw),
         |thr AS (
         |  SELECT coalesce(max(CASE WHEN srn = greatest(1, (ns + 3) // 4)
         |    THEN weight_nano END), -9223372036854775808) AS t
         |  FROM rw)
         |SELECT doc_id, weight_nano FROM w, thr WHERE weight_nano >= thr.t""".stripMargin,

    // LM perplexity replay: same tokenizer, same trigram counts over
    // the doc_id%10<3 train slice, same add-one model — and the SAME
    // portable-ln shape (IEEE-exact ops only, generated by the one
    // lpNanoSql builder both engines share), quantized to nano-nat
    // longs per trigram so the per-doc sum is order-free. sum(BIGINT)
    // is HUGEINT in DuckDB -> cast back before the one division.
    "q140_lm_perplexity" ->
      s"""WITH $q140ScoresCtes
         |SELECT doc_id, lang, n_trigrams, logprob_nano, avg_nll,
         |  CAST(ntile(3) OVER (PARTITION BY lang ORDER BY avg_nll, doc_id) AS INT) AS ppl_bucket
         |FROM s""".stripMargin,

    // perplexity buckets from SAMPLE cut points (the crawl-scale
    // form): same scores, but per-language tercile cuts read off a
    // deterministic md5-admitted 1/4 sample and assigned by
    // comparison — no corpus-wide NTILE sort; replayed here exactly
    "q150_ppl_sample_buckets" ->
      s"""WITH $q140ScoresCtes,
         |samp AS (SELECT * FROM s
         |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 4 = 0),
         |rs AS (
         |  SELECT lang, avg_nll,
         |    row_number() OVER (PARTITION BY lang ORDER BY avg_nll, doc_id) AS srn,
         |    count(*) OVER (PARTITION BY lang) AS ns
         |  FROM samp),
         |cuts AS (
         |  SELECT lang,
         |    max(CASE WHEN srn = (ns + 2) // 3 THEN avg_nll END) AS cut1,
         |    max(CASE WHEN srn = (2 * ns + 2) // 3 THEN avg_nll END) AS cut2
         |  FROM rs GROUP BY lang)
         |SELECT s.doc_id, s.lang, s.avg_nll,
         |  CAST(CASE WHEN cuts.cut1 IS NULL THEN 1
         |    WHEN s.avg_nll <= cuts.cut1 THEN 1
         |    WHEN s.avg_nll <= cuts.cut2 THEN 2
         |    ELSE 3 END AS INT) AS ppl_bucket
         |FROM s LEFT JOIN cuts ON s.lang = cuts.lang""".stripMargin,

    // analytic pixel-sum replay of the REAL PNG round trip: dims
    // 16 + id%33 x 16 + (id*7)%33, channel value
    // (id*31 + c*97 + x*7 + y*13) % 256 summed over all (x, y, c) —
    // PNG is lossless, so the decoded sums must match bit for bit.
    // unnest(range(w)) per row (generate_series rejects lateral
    // column-dependent bounds in DuckDB)
    // WAV decode replay: sample i of doc d is
    // ((d*131 + i*7919) % 65536) - 32768 over 200 + d%300 samples;
    // the decoded header's rate is the encoder's literal 8000
    "q128_audio_decode" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(200 + doc_id % 300 AS BIGINT) AS n FROM documents),
        |di AS (SELECT doc_id, n, unnest(range(n)) AS i FROM d),
        |sv AS (SELECT doc_id, n,
        |         (doc_id * 131 + i * 7919) % 65536 - 32768 AS v FROM di)
        |SELECT doc_id, 8000 AS sample_rate, n AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sample_sum,
        |  CAST(sum(abs(v)) AS BIGINT) AS abs_sum
        |FROM sv GROUP BY 1, 2, 3""".stripMargin,

    "q114_image_decode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(16 + doc_id % 33 AS INT) AS width,
        |    CAST(16 + (doc_id * 7) % 33 AS INT) AS height
        |  FROM documents),
        |xs AS (SELECT doc_id, width, height, unnest(range(width)) AS x FROM d),
        |xy AS (SELECT doc_id, width, height, x, unnest(range(height)) AS y FROM xs)
        |SELECT doc_id, width, height,
        |  CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256
        |         + (doc_id * 31 + 97 + x * 7 + y * 13) % 256
        |         + (doc_id * 31 + 194 + x * 7 + y * 13) % 256) AS BIGINT) AS pixel_sum
        |FROM xy GROUP BY 1, 2, 3""".stripMargin,

    // nearest-neighbor resample replay: target pixel (i, j) reads
    // source (i*w // 16, j*h // 16); the sum runs over the TARGET grid
    "q115_image_resize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(16 + doc_id % 33 AS BIGINT) AS w,
        |    CAST(16 + (doc_id * 7) % 33 AS BIGINT) AS h
        |  FROM documents),
        |is_ AS (SELECT doc_id, w, h, unnest(range(16)) AS i FROM d),
        |ij AS (SELECT doc_id, w, h, i, unnest(range(16)) AS j FROM is_),
        |m AS (
        |  SELECT doc_id, (i * w) // 16 AS x, (j * h) // 16 AS y FROM ij)
        |SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
        |  CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256
        |         + (doc_id * 31 + 97 + x * 7 + y * 13) % 256
        |         + (doc_id * 31 + 194 + x * 7 + y * 13) % 256) AS BIGINT) AS pixel_sum
        |FROM m GROUP BY 1, 2, 3""".stripMargin,

    // REAL video decode replay: the analytic raster sum over every
    // frame of every doc's synthetic AVI — raw DIB frames are
    // lossless, so the decoded sums equal the formula exactly
    "q134_video_decode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS INT) AS width,
        |    CAST(8 + (doc_id * 3) % 9 AS INT) AS height,
        |    CAST(2 + doc_id % 5 AS INT) AS n_frames
        |  FROM documents),
        |fs AS (SELECT doc_id, width, height, n_frames,
        |         unnest(range(n_frames)) AS f FROM d),
        |xs AS (SELECT doc_id, width, height, n_frames, f,
        |         unnest(range(width)) AS x FROM fs),
        |xy AS (SELECT doc_id, width, height, n_frames, f, x,
        |         unnest(range(height)) AS y FROM xs)
        |SELECT doc_id, width, height, n_frames,
        |  CAST(sum((doc_id * 31 + f * 59 + x * 7 + y * 13) % 256
        |         + (doc_id * 31 + f * 59 + 97 + x * 7 + y * 13) % 256
        |         + (doc_id * 31 + f * 59 + 194 + x * 7 + y * 13) % 256) AS BIGINT)
        |    AS pixel_sum
        |FROM xy GROUP BY 1, 2, 3, 4""".stripMargin,

    // frame-sampling replay: only every 2nd frame's raster sum
    "q135_video_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(8 + doc_id % 9 AS INT) AS width,
        |    CAST(8 + (doc_id * 3) % 9 AS INT) AS height,
        |    CAST(2 + doc_id % 5 AS INT) AS n_frames
        |  FROM documents),
        |fs AS (SELECT doc_id, width, height,
        |         unnest(range(n_frames)) AS f FROM d),
        |sampled AS (SELECT * FROM fs WHERE f % 2 = 0),
        |xs AS (SELECT doc_id, width, height, f,
        |         unnest(range(width)) AS x FROM sampled),
        |xy AS (SELECT doc_id, width, height, f, x,
        |         unnest(range(height)) AS y FROM xs)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(sum((doc_id * 31 + f * 59 + x * 7 + y * 13) % 256
        |         + (doc_id * 31 + f * 59 + 97 + x * 7 + y * 13) % 256
        |         + (doc_id * 31 + f * 59 + 194 + x * 7 + y * 13) % 256) AS BIGINT)
        |    AS frame_sum
        |FROM xy GROUP BY 1, 2""".stripMargin,

    // MJPEG decode: dims and frame counts are exact container facts
    // (analytic from doc_id); the lossy-codec fidelity claim rides the
    // decode_ok bound, which the Spark side must prove TRUE per doc —
    // a broken JPEG decode flips rows to false and fails the hash
    "q139_mjpeg_decode" ->
      """SELECT doc_id,
        |  CAST(8 + doc_id % 9 AS INT) AS width,
        |  CAST(8 + (doc_id * 3) % 9 AS INT) AS height,
        |  CAST(2 + doc_id % 5 AS INT) AS n_frames,
        |  TRUE AS decode_ok
        |FROM documents""".stripMargin,

    // changelog over MOR: the position delete's kills report at v2,
    // the equality upsert reports DELETE(old live image) + INSERT(new)
    // at v3 — old images exist only for keys live after v2 — and the
    // applyDeletes materialization nets zero
    "q137_mor_changelog" ->
      """WITH base AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS skey, s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal FROM supplier),
        |batch AS (
        |  SELECT skey, s_name, CAST(bal + 10 AS DECIMAL(12,2)) AS bal
        |  FROM base WHERE skey BETWEEN 2 AND 6
        |  UNION ALL
        |  SELECT skey + 2000, 'n_' || s_name, bal FROM base WHERE skey = 1),
        |out AS (
        |  SELECT skey, s_name, bal, 'INSERT' AS _change_type, 1 AS _change_version FROM base
        |  UNION ALL SELECT skey, s_name, bal, 'DELETE', 2 FROM base WHERE skey % 3 = 1
        |  UNION ALL SELECT skey, s_name, bal, 'DELETE', 3 FROM base
        |    WHERE skey BETWEEN 2 AND 6 AND skey % 3 <> 1
        |  UNION ALL SELECT skey, s_name, bal, 'INSERT', 3 FROM batch)
        |SELECT skey, s_name, CAST(bal AS DOUBLE) AS bal, _change_type, _change_version
        |FROM out""".stripMargin,

    // CDC replication: the replica's final content is the source's
    // final state — live rows after the delete, with the update applied
    "q136_cdc_replication" ->
      """WITH base AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS skey, s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal FROM supplier),
        |app AS (
        |  SELECT CAST(s_suppkey AS BIGINT) + 1000 AS skey, 'n_' || s_name AS s_name,
        |         CAST(s_acctbal AS DECIMAL(12,2)) AS bal
        |  FROM supplier WHERE s_suppkey BETWEEN 3 AND 7),
        |live3 AS (
        |  SELECT * FROM (SELECT * FROM base UNION ALL SELECT * FROM app)
        |  WHERE skey % 3 <> 0)
        |SELECT skey, s_name,
        |  CAST(CASE WHEN skey % 4 = 1 THEN CAST(bal + 50 AS DECIMAL(12,2)) ELSE bal END
        |       AS DOUBLE) AS bal
        |FROM live3""".stripMargin,

    // bottom-k-by-hash replays exactly: rank by the same 52-bit md5
    // prefix (13 hex chars — exact in Spark's Double score), id ASC
    // tiebreak, keep rank <= k per stratum; NULL ids are excluded by
    // contract (exactKPerStratum filters them on the Spark side)
    "q110_exact_k_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang, source,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) AS h52
        |  FROM documents WHERE doc_id IS NOT NULL
        |), r AS (
        |  SELECT doc_id, lang, source,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h52 ASC, doc_id ASC) AS INT)
        |      AS sample_rank
        |  FROM h
        |)
        |SELECT doc_id, lang, source, sample_rank FROM r WHERE sample_rank <= 20""".stripMargin,

    // branch compaction is exactly row-preserving across two
    // integration cycles: the final table holds seed + both branch
    // batches, nothing else, each once
    "q108_branch_compact" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_custkey <= 300
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')""".stripMargin,

    // WAP-branch streaming replay: main_before = even-id events only
    // (the branch is invisible); main_after = every event exactly once
    // (fast-forward integrates the branch head). Decimal-exact value
    // sums per the ExactAgg parity rule.
    "q107_stream_branch_ingest" ->
      """WITH r AS (
        |  SELECT event_type, event_id, user_id, value FROM events),
        |roll AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value,
        |    'main_after' AS stage
        |  FROM r GROUP BY 1),
        |seed AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total_value,
        |    'main_before' AS stage
        |  FROM r WHERE event_id % 2 = 0 GROUP BY 1)
        |SELECT * FROM seed UNION ALL SELECT * FROM roll""".stripMargin,

    // streaming-CMS replay: the maintained cell table must equal the
    // one-pass sketch over all events (sum associativity + the batch
    // mark); LEFT join + coalesce(0) mirrors CountMin.estimate
    "q106_stream_cms" ->
      """WITH e AS (
        |  SELECT CAST(user_id AS VARCHAR) AS user_id FROM events
        |  WHERE user_id IS NOT NULL),
        |top AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM e GROUP BY 1
        |  ORDER BY exact_cnt DESC, user_id LIMIT 20),
        |cells AS (
        |  SELECT r.d,
        |    CAST(('0x' || substr(md5(CAST(r.d AS VARCHAR) || ':' || user_id), 1, 15)) AS BIGINT) % 1024 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM e, range(4) AS r(d) GROUP BY 1, 2),
        |probe AS (
        |  SELECT t.user_id, r.d,
        |    CAST(('0x' || substr(md5(CAST(r.d AS VARCHAR) || ':' || t.user_id), 1, 15)) AS BIGINT) % 1024 AS bucket
        |  FROM top t, range(4) AS r(d)),
        |est AS (
        |  SELECT p.user_id, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_estimate
        |  FROM probe p LEFT JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
        |  GROUP BY 1)
        |SELECT t.user_id, t.exact_cnt, e2.cms_estimate
        |FROM top t JOIN est e2 USING (user_id)""".stripMargin,

    // streaming-HLL replay: the maintained register table must equal
    // the one-pass sketch over all events (max-merge associativity);
    // same parameterized CTE pipeline as q100/q102
    "q105_stream_hll" -> {
      s"""WITH ${hllRegisterCtes("events", "event_type", "user_id")}
         |SELECT event_type, used_registers,
         |  ${graft.functions.HyperLogLog.estimateSql("s_hit", "used_registers")} AS hll_estimate
         |FROM s""".stripMargin
    },

    // Count-Min replay: row-d bucket = md5('d:' || token) % 1024 —
    // string concat + md5 + integer mod, engine-identical; cell counts
    // and the min-over-rows estimate are pure integers. range(4) with
    // a CONSTANT bound is a legal DuckDB table function (the lateral
    // restriction only bites column-dependent bounds)
    "q104_cms_heavyhitters" ->
      s"""WITH tok AS (
         |  SELECT unnest($duckWordToks) AS token
         |  FROM documents),
        |top AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
        |  FROM tok GROUP BY 1
        |  ORDER BY exact_cnt DESC, token LIMIT 20),
        |cells AS (
        |  SELECT r.d,
        |    CAST(('0x' || substr(md5(CAST(r.d AS VARCHAR) || ':' || token), 1, 15)) AS BIGINT) % 1024 AS bucket,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok, range(4) AS r(d) GROUP BY 1, 2),
        |probe AS (
        |  SELECT t.token, r.d,
        |    CAST(('0x' || substr(md5(CAST(r.d AS VARCHAR) || ':' || t.token), 1, 15)) AS BIGINT) % 1024 AS bucket
        |  FROM top t, range(4) AS r(d)),
        |est AS (
        |  -- LEFT join + coalesce(0), NOT inner: an absent cell means
        |  -- "never incremented" and must win the min as 0 — the same
        |  -- absent-cell semantics as CountMin.estimate and the q106
        |  -- oracle (top-20 probe keys happen to occupy all cells, but
        |  -- the oracle must encode the engine's rule, not the data's)
        |  SELECT p.token, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_estimate
        |  FROM probe p LEFT JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
        |  GROUP BY 1)
        |SELECT t.token, t.exact_cnt, e.cms_estimate
        |FROM top t JOIN est e USING (token)""".stripMargin,

    // token-budget mix replay: same tokenizer, same (md5, id) total
    // order, same admitted-iff-budget-not-yet-exhausted rule; window
    // sums are exact BIGINTs so the cut is engine-identical
    "q103_token_budget_mix" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, lang, source, n_chars,
         |    CAST(len($duckWordToks) AS BIGINT) AS n_tokens,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, text, lang, source, n_chars, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM t)
         |SELECT doc_id, text, lang, source, n_chars, n_tokens, cum_tokens
         |FROM c WHERE cum_tokens - n_tokens < 20000""".stripMargin,

    // incremental-HLL replay: the oracle recomputes the sketch over
    // ALL of lineitem in one pass — the split-persist-merge pipeline
    // must land on the identical registers (max is associative/
    // commutative/idempotent), hence the identical estimate
    "q102_hll_incremental" ->
      s"""WITH ${hllRegisterCtes()}
         |SELECT l_returnflag, used_registers,
         |  ${graft.functions.HyperLogLog.estimateSql("s_hit", "used_registers")} AS hll_estimate
         |FROM s""".stripMargin,

    // portable HLL replay: same 60-bit md5 hash, same generated
    // integer-comparison rho CASE (shared generator — the SQL text is
    // engine-identical), exact long harmonic sum, one fixed-shape
    // double expression at the end. sum(BIGINT) is HUGEINT in DuckDB
    // -> cast back before the estimate arithmetic.
    "q100_hll_distinct" ->
      s"""WITH ${hllRegisterCtes()},
         |e AS (
         |  SELECT l_returnflag, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
         |  FROM lineitem GROUP BY 1)
         |SELECT s.l_returnflag, s.used_registers,
         |  ${graft.functions.HyperLogLog.estimateSql("s_hit", "used_registers")} AS hll_estimate,
         |  e.exact_distinct
         |FROM s JOIN e USING (l_returnflag)""".stripMargin
  )

  /** DuckDB cosine that bit-matches graft_cosine: sequential-order dot
    * products, sqrt-product denominator (q19/q27-proven parity).
    */
  private def duckCos(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** Full SQL replay of Similarity.lshTopK at the q20 call site
    * (nQueries=16, k=5, nPlanes=8, probeRadius=2, nTables=4, dim=64,
    * seed=42). The plane coefficients are the portable md5
    * construction of Similarity.planes (bit-identical doubles), the
    * buckets the same sign-bit longs, the probes the same XOR masks;
    * candidates dedupe then rank by exact cosine with the
    * (cos DESC, vec_id ASC) tie-break.
    */
  private def q20AnnLshSql: String = {
    val masks = (0L until 256L).filter(m => java.lang.Long.bitCount(m) <= 2)
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |pl AS (
       |  SELECT t, i, list(c ORDER BY d) AS p FROM (
       |    SELECT t.t, i.i, d.d,
       |      CAST(CAST(('0x' || substr(md5('plane:' || CAST(42 + t.t AS VARCHAR) || ':'
       |          || CAST(i.i AS VARCHAR) || ':' || CAST(d.d AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE)
       |        / 1152921504606846976.0 - 0.5 AS c
       |    FROM range(4) t(t), range(8) i(i), range(64) d(d))
       |  GROUP BY t, i),
       |b AS (
       |  SELECT e.vec_id, pl.t,
       |    CAST(sum(CASE WHEN list_dot_product(pl.p, e.v) > 0
       |      THEN (CAST(1 AS BIGINT) << pl.i) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
       |  FROM e CROSS JOIN pl GROUP BY e.vec_id, pl.t),
       |pr AS (
       |  SELECT b.vec_id AS q_id, b.t, xor(b.bucket, m.m) AS bucket
       |  FROM b CROSS JOIN (SELECT CAST(unnest([${masks.mkString(", ")}]) AS BIGINT) AS m) m
       |  WHERE b.vec_id < 16),
       |cand AS (
       |  SELECT DISTINCT pr.q_id, c.vec_id
       |  FROM pr JOIN b c ON c.t = pr.t AND c.bucket = pr.bucket
       |  WHERE c.vec_id <> pr.q_id),
       |scored AS (
       |  SELECT cand.q_id, cand.vec_id, ${duckCos("q.v", "c.v")} AS cos
       |  FROM cand JOIN e q ON q.vec_id = cand.q_id JOIN e c ON c.vec_id = cand.vec_id)
       |SELECT q_id, vec_id AS neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rn
       |FROM scored
       |QUALIFY rn <= 5""".stripMargin
  }

  /** Full SQL replay of Similarity.ivfTopK at the q28 call site
    * (nQueries=16, k=5, nlist=16, nprobe=6, iters=2, sample cap 4096
    * which exceeds the sf corpora, 1e-8 mean grid). Bootstrap = the 16
    * lowest vec_ids; two unrolled Lloyd rounds with exact integer-grid
    * means (the q68 parity rule); assignment/probing by exact cosine
    * with (cos DESC, cell ASC) tie-breaks, matching withCell's
    * array_position-of-max and ivfTopK's probe comparator.
    */
  private def q28AnnIvfSql: String = {
    def assign(src: String, cents: String, rnCond: String): String =
      s"""SELECT vec_id, v, cell FROM (
         |    SELECT s.vec_id, s.v, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${duckCos("c.cv", "s.v")} DESC, c.cell ASC) AS rn
         |    FROM $src s CROSS JOIN $cents c) WHERE $rnCond""".stripMargin
    s"""WITH $q28TrainingCtes,
       |corpus AS (${assign("e", "c2", "rn = 1")}),
       |probes AS (
       |  SELECT vec_id AS q_id, v AS qv, cell FROM (
       |    SELECT s.vec_id, s.v, c.cell,
       |      row_number() OVER (PARTITION BY s.vec_id
       |        ORDER BY ${duckCos("c.cv", "s.v")} DESC, c.cell ASC) AS rn
       |    FROM (SELECT * FROM e WHERE vec_id < 16) s CROSS JOIN c2 c) WHERE rn <= 6),
       |scored AS (
       |  SELECT p.q_id, c.vec_id, ${duckCos("p.qv", "c.v")} AS cos
       |  FROM probes p JOIN corpus c ON c.cell = p.cell
       |  WHERE c.vec_id <> p.q_id)
       |SELECT q_id, vec_id AS neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rn
       |FROM scored
       |QUALIFY rn <= 5""".stripMargin
  }

  /** Full SQL replay of Similarity.ivfPqTopK at the q161 call site
    * (nQueries=16, k=5, nlist=16, nprobe=6, iters=2, m=8, ksub=16,
    * dim=64): coarse training rides the shared q28 CTEs; each
    * subspace's codebook replays the identical bootstrap + two Lloyd
    * rounds over the SAME md5-TakeOrdered sample, sliced; encoding is
    * the same argmax-cosine (ties to the lowest codeword) nibble-
    * packed; ADC scores are the same left-associated dot-product sums
    * over decoded codewords. Deterministic end to end — the hash
    * compare is exact.
    */
  private def q161AnnIvfPqSql: String = {
    val m = 8; val sub = 8; val ksub = 16
    def lo(s: Int) = s * sub + 1
    def hi(s: Int) = s * sub + sub
    def assign(src: String, cents: String): String =
      s"""SELECT vec_id, v, cell FROM (
         |    SELECT s.vec_id, s.v, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${duckCos("c.cv", "s.v")} DESC, c.cell ASC) AS rn
         |    FROM $src s CROSS JOIN $cents c) WHERE rn = 1""".stripMargin
    def lloyd(assigned: String, prev: String): String =
      s"""SELECT p.cell, COALESCE(mm.cv, p.cv) AS cv FROM $prev p LEFT JOIN (
         |    SELECT cell, list(m ORDER BY pos) AS cv FROM (
         |      SELECT a.cell, r.pos,
         |        (CAST(sum(CAST(round(a.v[r.pos + 1] * 100000000.0) AS BIGINT)) AS DOUBLE)
         |          / 100000000.0) / count(*) AS m
         |      FROM $assigned a CROSS JOIN range($sub) r(pos)
         |      GROUP BY a.cell, r.pos) GROUP BY cell) mm ON p.cell = mm.cell""".stripMargin
    val subCtes = (0 until m).map { s =>
      s"""es$s AS (SELECT vec_id, v[${lo(s)}:${hi(s)}] AS v FROM e),
         |k0_$s AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell, v AS cv
         |  FROM (SELECT vec_id, v FROM es$s ORDER BY vec_id LIMIT $ksub)),
         |ks$s AS (SELECT vec_id, v[${lo(s)}:${hi(s)}] AS v FROM samp),
         |ka1_$s AS (${assign(s"ks$s", s"k0_$s")}),
         |kc1_$s AS (${lloyd(s"ka1_$s", s"k0_$s")}),
         |ka2_$s AS (${assign(s"ks$s", s"kc1_$s")}),
         |kc2_$s AS (${lloyd(s"ka2_$s", s"kc1_$s")}),
         |code$s AS (
         |  SELECT vec_id, cell AS c FROM (
         |    SELECT t.vec_id, cb.cell,
         |      row_number() OVER (PARTITION BY t.vec_id
         |        ORDER BY ${duckCos("cb.cv", "t.v")} DESC, cb.cell ASC) AS rn
         |    FROM es$s t CROSS JOIN kc2_$s cb) WHERE rn = 1),
         |cbl$s AS (SELECT list(cv ORDER BY cell) AS cb FROM kc2_$s)""".stripMargin
    }.mkString(",\n")
    val code64 = (0 until m).map(s => s"c$s.c * ${1L << (s * 4)}").mkString(" + ")
    val codeJoins = (1 until m).map(s => s"JOIN code$s c$s USING (vec_id)").mkString(" ")
    def cw(s: Int) = s"b$s.cb[CAST((c.code64 >> ${s * 4}) & 15 AS INT) + 1]"
    val adc = (0 until m)
      .map(s => s"list_dot_product(p.qv[${lo(s)}:${hi(s)}], ${cw(s)})").mkString(" + ")
    val n2 = (0 until m).map(s => s"list_dot_product(${cw(s)}, ${cw(s)})").mkString(" + ")
    val cblJoins = (0 until m).map(s => s"CROSS JOIN cbl$s b$s").mkString(" ")
    s"""WITH $q28TrainingCtes,
       |$subCtes,
       |codes AS (
       |  SELECT c0.vec_id, $code64 AS code64
       |  FROM code0 c0 $codeJoins),
       |coarse AS (${assign("e", "c2")}),
       |corpus AS (
       |  SELECT coarse.vec_id, coarse.cell, codes.code64
       |  FROM coarse JOIN codes USING (vec_id)),
       |probes AS (
       |  SELECT vec_id AS q_id, v AS qv, cell FROM (
       |    SELECT s.vec_id, s.v, c.cell,
       |      row_number() OVER (PARTITION BY s.vec_id
       |        ORDER BY ${duckCos("c.cv", "s.v")} DESC, c.cell ASC) AS rn
       |    FROM (SELECT * FROM e WHERE vec_id < 16) s CROSS JOIN c2 c) WHERE rn <= 6),
       |adc_scored AS (
       |  SELECT p.q_id, c.vec_id,
       |    ($adc) / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt($n2)) AS adc
       |  FROM probes p JOIN corpus c ON c.cell = p.cell $cblJoins
       |  WHERE c.vec_id <> p.q_id),
       |shortlist AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id ASC) AS rn
       |    FROM adc_scored) WHERE rn <= 64),
       |reranked AS (
       |  SELECT s.q_id, s.vec_id, ${duckCos("q.v", "x.v")} AS cos
       |  FROM shortlist s
       |  JOIN e x ON x.vec_id = s.vec_id
       |  JOIN e q ON q.vec_id = s.q_id)
       |SELECT q_id, vec_id AS neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rn
       |FROM reranked
       |QUALIFY rn <= 5""".stripMargin
  }

  /** Shared q146/q151 CTE chain: documents -> hashed unigram+bigram
    * buckets -> target/source add-one bucket models -> per-doc exact
    * BIGINT importance weight `w(doc_id, weight_nano)`.
    */
  private def q146WeightsCtes: String =
    s"""t AS (
       |  SELECT doc_id, $duckWordToks AS toks, doc_id % 10 < 3 AS is_target
       |  FROM documents WHERE len($duckWordToks) >= 1),
       |f AS (
       |  SELECT doc_id, is_target, unnest(list_concat(toks,
       |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS f
       |  FROM t),
       |bk AS (
       |  SELECT doc_id, is_target,
       |    CAST(('0x' || substr(md5(f), 1, 15)) AS BIGINT) % 10000 AS b
       |  FROM f),
       |ct AS (SELECT b, count(*) AS ct FROM bk WHERE is_target GROUP BY 1),
       |cs AS (SELECT b, count(*) AS cs FROM bk WHERE NOT is_target GROUP BY 1),
       |nt AS (SELECT count(*) AS nt FROM bk WHERE is_target),
       |ns AS (SELECT count(*) AS ns FROM bk WHERE NOT is_target),
       |m AS (
       |  SELECT cs.b,
       |    ${graft.text.LanguageModel.lpNanoSql("(coalesce(ct.ct, 0) + 1)", "(nt.nt + 10000)", duck = true)}
       |    - ${graft.text.LanguageModel.lpNanoSql("(cs.cs + 1)", "(ns.ns + 10000)", duck = true)} AS wb
       |  FROM cs LEFT JOIN ct ON cs.b = ct.b, nt, ns),
       |d AS (SELECT doc_id, b, count(*) AS c FROM bk WHERE NOT is_target GROUP BY 1, 2),
       |w AS (
       |  SELECT d.doc_id, CAST(sum(d.c * m.wb) AS BIGINT) AS weight_nano
       |  FROM d JOIN m ON d.b = m.b GROUP BY 1)""".stripMargin

  /** Shared q140/q150 CTE chain: documents -> per-language add-one
    * trigram model over the train slice -> per-doc score frame
    * `s(doc_id, lang, n_trigrams, logprob_nano, avg_nll)`.
    */
  private def q140ScoresCtes: String =
    s"""t AS (
       |  SELECT doc_id, lang, $duckWordToks AS toks, doc_id % 10 < 3 AS is_train
       |  FROM documents WHERE len($duckWordToks) >= 3),
       |g AS (
       |  SELECT doc_id, lang, is_train,
       |    unnest(list_transform(range(1, len(toks) - 1), i ->
       |      {'ctx': toks[i] || ' ' || toks[i+1],
       |       'gram': toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]}),
       |      recursive := true)
       |  FROM t),
       |c3 AS (SELECT lang, gram, count(*) AS c3 FROM g WHERE is_train GROUP BY 1, 2),
       |c2 AS (SELECT lang, ctx, count(*) AS c2 FROM g WHERE is_train GROUP BY 1, 2),
       |v AS (SELECT lang, count(DISTINCT tok) AS v
       |      FROM (SELECT lang, unnest(toks) AS tok FROM t WHERE is_train)
       |      GROUP BY 1),
       |args AS (
       |  SELECT g.doc_id, g.lang,
       |    coalesce(c3.c3, 0) + 1 AS num_arg,
       |    coalesce(c2.c2, 0) + v.v AS den_arg
       |  FROM g
       |  LEFT JOIN c3 ON g.lang = c3.lang AND g.gram = c3.gram
       |  LEFT JOIN c2 ON g.lang = c2.lang AND g.ctx = c2.ctx
       |  JOIN v ON g.lang = v.lang
       |  WHERE NOT g.is_train),
       |lp AS (
       |  SELECT doc_id, lang,
       |    ${graft.text.LanguageModel.lpNanoSql("num_arg", "den_arg", duck = true)} AS lp_nano
       |  FROM args),
       |d AS (
       |  SELECT doc_id, lang, count(*) AS n_trigrams,
       |    CAST(sum(lp_nano) AS BIGINT) AS logprob_nano
       |  FROM lp GROUP BY 1, 2),
       |s AS (
       |  SELECT doc_id, lang, n_trigrams, logprob_nano,
       |    -CAST(logprob_nano AS DOUBLE) / CAST(n_trigrams * 1000000000 AS DOUBLE) AS avg_nll
       |  FROM d)""".stripMargin

  /** The shared IVF training replay (bootstrap + two Lloyd rounds over
    * the md5-TakeOrdered sample) — q28's assignment/probing and q149's
    * distributed-training output both read the trained `c2` CTE.
    */
  private def q28TrainingCtes: String = {
    def assign(src: String, cents: String): String =
      s"""SELECT vec_id, v, cell FROM (
         |    SELECT s.vec_id, s.v, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${duckCos("c.cv", "s.v")} DESC, c.cell ASC) AS rn
         |    FROM $src s CROSS JOIN $cents c) WHERE rn = 1""".stripMargin
    def lloyd(assigned: String, prev: String): String =
      s"""SELECT p.cell, COALESCE(m.cv, p.cv) AS cv FROM $prev p LEFT JOIN (
         |    SELECT cell, list(m ORDER BY pos) AS cv FROM (
         |      SELECT a.cell, r.pos,
         |        (CAST(sum(CAST(round(a.v[r.pos + 1] * 100000000.0) AS BIGINT)) AS DOUBLE)
         |          / 100000000.0) / count(*) AS m
         |      FROM $assigned a CROSS JOIN range(64) r(pos)
         |      GROUP BY a.cell, r.pos) GROUP BY cell) m ON p.cell = m.cell""".stripMargin
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell, v AS cv
       |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
       |samp AS (
       |  SELECT vec_id, v FROM e
       |  ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT), vec_id
       |  LIMIT 4096),
       |a1 AS (${assign("samp", "c0")}),
       |c1 AS (${lloyd("a1", "c0")}),
       |a2 AS (${assign("samp", "c1")}),
       |c2 AS (${lloyd("a2", "c1")})""".stripMargin
  }

  /** q149: the distributed-training path must land on the SAME c2 the
    * driver-loop replay computes — unnested to scalar cells so the
    * hash compare is positional.
    */
  private def q149DistributedCentroidsSql: String =
    s"""WITH $q28TrainingCtes
       |SELECT cell, CAST(r.pos AS INT) AS pos, c2.cv[r.pos + 1] AS x
       |FROM c2 CROSS JOIN range(64) r(pos)""".stripMargin

  /** DuckDB fragments shared by the document-corpus oracles. */

  private def duckFormat: String =
    "(CASE WHEN ascii(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END)"

  private def duckWidth: String =
    "CAST(32 + ascii(text) % 64 AS INT)"

  private def duckHeight: String =
    "CAST(32 + length(text) % 64 AS INT)"

  private def duckShingles: String =
    "list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1)), i -> substring(text, i, 5)))"

  /** The shared word tokenizer (TextAnalysis.wordTokensSql parity). */
  private def duckWordToks: String =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> length(x) > 0)"

  /** Recursive-CTE replay of `graft_bpe_count` (graft.functions.Bpe):
    * the SAME merge table (interpolated from the Scala object — one
    * source of truth, never a copy), the same `[^a-z0-9]+`
    * pre-tokenization, and the same greedy loop — each step fuses
    * every occurrence of the lowest-ranked adjacent pair, disjointness
    * guaranteed by the table's l != r invariant, until no pair is in
    * the table. Terminal states are the rows with no applicable pair;
    * their symbol counts sum per document into
    * `bpe_counts(doc_id, n_tokens)`. Embedding queries must open with
    * WITH RECURSIVE.
    */
  private def bpeCtes: String =
    s"""bpe_m(rank, ml, mr) AS (
       |  SELECT * FROM (VALUES ${graft.functions.Bpe.mergesSqlValues}) v(rank, ml, mr)),
       |bpe_w AS (
       |  SELECT doc_id, unnest(ws) AS word, unnest(range(1, len(ws)+1)) AS wid
       |  FROM (SELECT doc_id, $duckWordToks AS ws FROM documents)),
       |bpe_r AS (
       |  SELECT doc_id, wid, list_transform(range(1, length(word)+1),
       |    i -> word[CAST(i AS INT)]) AS s
       |  FROM bpe_w
       |  UNION ALL
       |  SELECT doc_id, wid,
       |    list_filter(list_transform(range(1, len(s)+1), i ->
       |      CASE WHEN i < len(s) AND s[CAST(i AS INT)] = ml AND s[CAST(i+1 AS INT)] = mr
       |             THEN ml || mr
       |           WHEN i > 1 AND s[CAST(i-1 AS INT)] = ml AND s[CAST(i AS INT)] = mr
       |             THEN NULL
       |           ELSE s[CAST(i AS INT)] END), x -> x IS NOT NULL) AS s
       |  FROM (
       |    SELECT doc_id, wid, s,
       |      (SELECT min(m.rank) FROM bpe_m m
       |        WHERE list_contains(list_transform(range(1, len(s)),
       |          i -> s[CAST(i AS INT)] || chr(1) || s[CAST(i+1 AS INT)]),
       |          m.ml || chr(1) || m.mr)) AS br
       |    FROM bpe_r) t
       |  JOIN bpe_m mm ON mm.rank = t.br),
       |bpe_done AS (
       |  SELECT doc_id, wid, len(s) AS n FROM bpe_r
       |  WHERE (SELECT min(m.rank) FROM bpe_m m
       |          WHERE list_contains(list_transform(range(1, len(s)),
       |            i -> s[CAST(i AS INT)] || chr(1) || s[CAST(i+1 AS INT)]),
       |            m.ml || chr(1) || m.mr)) IS NULL),
       |bpe_counts AS (
       |  SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_tokens
       |  FROM documents d LEFT JOIN (
       |    SELECT doc_id, sum(n) AS n FROM bpe_done GROUP BY doc_id) c USING (doc_id))""".stripMargin

  private def duckTok: String =
    """len(regexp_extract_all(text, '\S+'))"""

  private def duckStop: String =
    """len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|for|on|with)\b'))"""

  /** Mirrors TextAnalysis.qualityScore term-for-term (same IEEE op order). */
  private def duckQuality: String =
    s"""CAST(0.4 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), CAST($duckTok AS DOUBLE) / CAST(50.0 AS DOUBLE))
       | + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
       |     - CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))
       | + CAST(0.3 AS DOUBLE) * least(CAST(1.0 AS DOUBLE),
       |     CAST(4.0 AS DOUBLE) * (CAST($duckStop AS DOUBLE) / $duckTok))""".stripMargin.replace("\n", " ")

  /** q98/q99's gram width — one constant so the Spark side's n = 5
    * default and every oracle literal derive from a single place.
    * MUST stay `final` with no type ascription: that makes it a
    * compile-time constant, immune to the object-initialization-order
    * trap (the oracle map val above runs first and would read a
    * plain val as 0).
    */
  private final val SpanN = 5

  /** Shared q98/q99 CTE pipeline: tokenize -> positional word n-gram
    * 60-bit md5 hashes -> duplicated positions (corpus occurrence
    * >= 2) -> gaps-and-islands (break when the previous duplicated
    * position is more than n back). DuckDB `range(1, len - (n-2))` is
    * empty when len < n, matching the Spark CASE short-circuit; nested
    * window functions are disallowed, hence the brk/island two-step;
    * NULL lag -> CASE falls to ELSE 0, same as Spark's otherwise(0).
    */
  private def spanIslandCtes(n: Int): String =
    s"""t AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> length(x) > 0) AS toks
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - ${n - 2}),
       |    i -> {'pos': CAST(i - 1 AS INTEGER),
       |          'h': CAST(('0x' || substr(md5(array_to_string(toks[i:i+${n - 1}], ' ')), 1, 15)) AS BIGINT)}),
       |    recursive := true)
       |  FROM t),
       |d AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
       |p AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (h)),
       |b AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $n
       |      THEN 1 ELSE 0 END AS brk
       |  FROM p),
       |isl AS (
       |  SELECT doc_id, pos,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
       |  FROM b)""".stripMargin

  /** Shared q100/q102/q105 register-pipeline CTEs: 60-bit md5 value
    * hash -> (register, rho) -> per-register max -> per-group exact
    * harmonic sum, parameterized by (table, group, value). NULL values
    * are filtered (count(DISTINCT) semantics, matching the Spark
    * registers() filter). `sum(BIGINT)` is HUGEINT in DuckDB -> cast
    * back before the estimate arithmetic.
    */
  private def hllRegisterCtes(table: String = "lineitem",
                              group: String = "l_returnflag",
                              value: String = "l_orderkey"): String = {
    import graft.functions.HyperLogLog.{rhoCaseSql, WindowBits, WindowMask}
    s"""h AS (
       |  SELECT $group,
       |    CAST(('0x' || substr(md5(CAST($value AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM $table WHERE $value IS NOT NULL),
       |r AS (
       |  SELECT $group, h >> $WindowBits AS reg,
       |    ${rhoCaseSql(s"(h & $WindowMask)")} AS rho
       |  FROM h),
       |m AS (SELECT $group, reg, max(rho) AS mx FROM r GROUP BY 1, 2),
       |s AS (
       |  SELECT $group, CAST(count(*) AS BIGINT) AS used_registers,
       |    CAST(sum(CAST(1 AS BIGINT) << (${WindowBits + 1} - mx)) AS BIGINT) AS s_hit
       |  FROM m GROUP BY 1)""".stripMargin
  }

  /** Mirrors TextAnalysis.langId: first language whose marker count >= all later ones. */
  private def duckLang: String = {
    val markers = Seq(
      "en" -> """\b(the|and|of|to)\b""",
      "es" -> """\b(el|la|de|que)\b""",
      "de" -> """\b(der|die|und|das)\b""",
      "fr" -> """\b(le|les|et|une)\b""",
      "zh" -> "(的|是|了)"
    )
    def cnt(p: String) = s"len(regexp_extract_all(text, '$p'))"
    val conds = markers.zipWithIndex.dropRight(1).map { case ((lang, p), i) =>
      val rest = markers.drop(i + 1).map(m => s"${cnt(p)} >= ${cnt(m._2)}")
      s"WHEN ${rest.mkString(" AND ")} THEN '$lang'"
    }
    s"(CASE ${conds.mkString(" ")} ELSE '${markers.last._1}' END)"
  }
}
