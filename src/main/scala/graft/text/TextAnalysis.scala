package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale document corpora:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Zero UDFs anywhere. The composed forms here use built-in
  * `functions._`; the HOT paths run on native one-pass kernels —
  * [[graft.functions.TextCounts]] (`graft_textcounts`: all counters
  * in one code-point scan, vs nine regex passes) and
  * [[graft.functions.RepetitionStats]] (`graft_repstats`) — with the
  * composed forms kept as spec-pinned parity references. Either way
  * the whole stage stays codegen'd and columnar: on a 100 TB corpus
  * these run as a single projection over the scan with no shuffle and
  * no JVM<->interpreter boundary.
  */
object TextAnalysis {

  /** Stopword marker pattern for quality scoring. */
  val StopwordPattern = "\\b(the|a|of|and|to|in|is|for|on|with)\\b"

  /** Whitespace-token count (BPE-ish regex tokenization variant below).
    * Counted as `\S+` runs rather than `split` so leading/trailing
    * whitespace can't produce phantom empty tokens.
    */
  def tokenCount(t: Column): Column =
    size(regexp_extract_all(t, lit("\\S+"), lit(0)))

  /** Word-piece-ish token count: runs of letters, digits, or single
    * punctuation — a cheap proxy for subword tokenizer output size.
    */
  def regexTokenCount(t: Column): Column =
    size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def punctCount(t: Column): Column =
    length(regexp_replace(t, "[^.!?,;:]", ""))

  def stopwordCount(t: Column): Column =
    size(regexp_extract_all(t, lit(StopwordPattern), lit(0)))

  def stopwordRatio(t: Column): Column =
    stopwordCount(t).cast("double") / tokenCount(t)

  def avgTokenLen(t: Column): Column =
    length(regexp_replace(t, "\\s+", "")).cast("double") / tokenCount(t)

  /** Heuristic quality score in [0,1]: length signal + punctuation
    * sanity + stopword presence (natural text has function words).
    */
  def qualityScore(t: Column): Column =
    qualityFromCounts(tokenCount(t), punctCount(t), stopwordCount(t), length(t))

  /** Quality score over pre-materialized counts — same IEEE op order
    * as `qualityScore`, so hoisting the counts into an earlier
    * projection (one regex pass per row instead of one per use) does
    * not change a single bit of the result.
    */
  def qualityFromCounts(nTokens: Column, nPunct: Column, nStop: Column, len: Column): Column =
    lit(0.4) * least(lit(1.0), nTokens.cast("double") / lit(50.0)) +
      lit(0.3) * (lit(1.0) - nPunct.cast("double") / greatest(len, lit(1))) +
      lit(0.3) * least(lit(1.0), lit(4.0) * (nStop.cast("double") / nTokens))

  /** Marker-word language ID: per-language function-word hit counts,
    * argmax with a fixed preference order for ties. The marker lists
    * are pluggable; a production profile would use char-n-gram
    * frequency profiles — the plan shape (one projection, no shuffle)
    * is the same.
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to)\\b",
    "es" -> "\\b(el|la|de|que)\\b",
    "de" -> "\\b(der|die|und|das)\\b",
    "fr" -> "\\b(le|les|et|une)\\b",
    "zh" -> "(的|是|了)"
  )

  def markerCount(t: Column, pattern: String): Column =
    size(regexp_extract_all(t, lit(pattern), lit(0)))

  def langId(t: Column): Column =
    langIdFromCounts(LangMarkers.map { case (lang, p) => lang -> markerCount(t, p) })

  /** Argmax over per-language marker counts, first-listed language
    * winning ties. Takes the counts as columns so callers can
    * materialize them once in a projection: inlined, each count
    * expression appears in up to four comparisons of the when-chain
    * and gets re-evaluated per use (regex scans are not
    * common-subexpression-eliminated across CASE branches).
    */
  def langIdFromCounts(counts: Seq[(String, Column)]): Column =
    counts.zipWithIndex.foldRight(lit(counts.last._1)) { case (((lang, c), i), elseCol) =>
      val rest = counts.drop(i + 1).map(_._2)
      if (rest.isEmpty) elseCol
      else when(rest.foldLeft(lit(true))((acc, r) => acc && c >= r), lang).otherwise(elseCol)
    }

  /** Normalized content fingerprint (case/punctuation-insensitive). */
  def fingerprint(t: Column): Column =
    md5(lower(regexp_replace(t, "[^a-zA-Z0-9 ]", "")))

  /** Adds `quality`, `lang_pred`, `n_tokens` to a document frame from
    * ONE `graft_textcounts` scan — the shared scoring stage of the
    * curation compositions (q51/q57). Bit-identical to the composed
    * regex formulation ([[qualityScore]]/[[langId]]/[[tokenCount]],
    * kept above as the parity reference): the counters are spec-pinned
    * equal and the ratio/argmax formulas are the same Column
    * expressions over them. CollapseProject keeps the struct hoisted
    * (non-cheap, multiply referenced), so the kernel runs once per row.
    */
  def scoreDocuments(docs: org.apache.spark.sql.DataFrame,
                     textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val langs = LangMarkers.map(_._1)
    docs
      .withColumn("__tc", expr(s"graft_textcounts($textCol)"))
      .withColumn("quality", qualityFromCounts(
        col("__tc.n_tok"), col("__tc.n_punct"), col("__tc.n_stop"), length(col(textCol))))
      .withColumn("lang_pred", langIdFromCounts(langs.map(l => l -> col(s"__tc.c_$l"))))
      .withColumn("n_tokens", col("__tc.n_tok"))
      .drop("__tc")
  }

  /** Gopher quality-rule battery (Rae et al. 2021 §A1.1, the ruleset
    * most LLM data pipelines filter web text with) — hard per-document
    * PASS/FAIL rules, complementing the continuous [[qualityScore]]:
    *
    *   1. word count within [minWords, maxWords]
    *   2. mean word length within [3, 10] characters
    *   3. symbol-to-word ratio (#, ellipsis) <= 0.1
    *   4. <= 10% of lines start with a bullet
    *   5. <= 30% of lines end with an ellipsis
    *   6. >= 80% of words contain an alphabetic character
    *   7. >= 2 distinct required stopwords present
    *
    * Engineering shape: every counter is a native regexp expression
    * (regexp_count / regexp_replace / instr — whole-stage codegen, no
    * HOFs), and every RATIO rule is an integer cross-multiplication
    * (`10*n_sym <= n_words`, never a Double division), so the output
    * is bit-portable to any engine — the DuckDB oracle replays it
    * exactly. Line rules avoid `^`/`$` anchors (Java and RE2 disagree
    * about a final newline): the text is padded with an explicit
    * newline instead.
    */
  def gopherRules(docs: org.apache.spark.sql.DataFrame,
                  textCol: String = "text", idCol: String = "doc_id",
                  minWords: Long = 50, maxWords: Long = 100000): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val padded = concat(lit(" "), regexp_replace(lower(t), lit("[^a-z0-9]+"), lit(" ")), lit(" "))
    docs.select(
        col(idCol),
        regexp_count(t, lit("""\S+""")).as("n_words"),
        length(regexp_replace(t, lit("""\s+"""), lit(""))).as("word_chars"),
        regexp_count(t, lit("""#|\.\.\.|…""")).as("n_sym"),
        (regexp_count(t, lit("\n")) + 1).as("n_lines"),
        regexp_count(concat(lit("\n"), t), lit("\n[ \t]*[-*•]")).as("n_bullet"),
        regexp_count(concat(t, lit("\n")), lit("""(\.\.\.|…)[ \t]*""" + "\n")).as("n_ellipsis"),
        regexp_count(t, lit("""\S*[A-Za-z]\S*""")).as("n_alpha_words"),
        stops.map(w => when(instr(padded, s" $w ") > 0, 1).otherwise(0))
          .reduce(_ + _).as("n_stop"))
      .withColumn("r_word_count", col("n_words").between(minWords, maxWords))
      .withColumn("r_mean_word_len",
        lit(3) * col("n_words") <= col("word_chars") &&
          col("word_chars") <= lit(10) * col("n_words"))
      .withColumn("r_symbol_ratio", lit(10) * col("n_sym") <= col("n_words"))
      .withColumn("r_bullet_lines", lit(10) * col("n_bullet") <= col("n_lines"))
      .withColumn("r_ellipsis_lines", lit(10) * col("n_ellipsis") <= lit(3) * col("n_lines"))
      .withColumn("r_alpha_words", lit(5) * col("n_alpha_words") >= lit(4) * col("n_words"))
      .withColumn("r_stopwords", col("n_stop") >= 2)
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") && col("r_symbol_ratio") &&
          col("r_bullet_lines") && col("r_ellipsis_lines") && col("r_alpha_words") &&
          col("r_stopwords"))
  }

  /** Winnowing fingerprint (the Schleimer–Wilkerson–Aiken rolling-hash
    * scheme, the MOSS document-fingerprinting algorithm): hash every
    * word `k`-gram, slide a window of `w` consecutive gram hashes, and
    * select each window's minimum — the sorted distinct selected
    * hashes are the document's fingerprint. The winnowing guarantee:
    * two documents sharing any token run of length >= w + k - 1 share
    * at least one selected hash, so fingerprint overlap is a
    * DETERMINISTIC substring-match detector (vs MinHash/LSH's
    * probabilistic whole-document similarity) — the standard tool for
    * clone/boilerplate detection in a training corpus.
    *
    * Portability: the gram hash is the first 60 bits of md5, the same
    * engine-portable construction as PortableMinHash, so a DuckDB
    * oracle reproduces the selection bit for bit. Density: ~2/(w+1)
    * of grams are selected, so the fingerprint is ~3x smaller than
    * the gram set at the defaults.
    *
    * Plan shape: one shuffle-free projection. The selection kernel is
    * the NATIVE `graft_winnow` expression (primitive loop inside
    * whole-stage codegen — higher-order functions are CodegenFallback
    * and interpret per row with boxed intermediates; measured ~3x on
    * the fingerprint pass). [[winnowSelectPortableSql]] keeps the
    * pure-SQL formulation: it documents the algorithm in the exact
    * shape the DuckDB oracle runs, and the two are spec-pinned equal
    * bit for bit on the real corpus.
    */
  def winnowSelectSql(textCol: String, k: Int = 3, w: Int = 4): String =
    // raw split(), NOT wordTokensSql: the filter() HOF there is
    // CodegenFallback and would eject the whole projection from
    // whole-stage codegen — graft_winnow drops empty tokens in-kernel
    // instead (identical token sequence, spec-pinned)
    s"graft_winnow(split(lower($textCol), '[^a-z0-9]+'), $k, $w)"

  /** The pure-SQL (built-ins only) winnowing formulation — oracle
    * shape and the parity reference for `graft_winnow`. Nested
    * `transform(array(x), v -> ...)` let-bindings (the repetitionStats
    * idiom) so each stage is computed once per row. Note Spark's
    * `sequence(1, n)` DESCENDS when n < 1, so both short-circuit CASEs
    * are required, not defensive.
    */
  def winnowSelectPortableSql(textCol: String, k: Int = 3, w: Int = 4): String =
    s"""transform(array(${wordTokensSql(textCol)}), ts ->
       |  transform(array(CASE WHEN size(ts) >= $k
       |      THEN transform(sequence(1, size(ts) - ${k - 1}),
       |             i -> concat_ws(' ', slice(ts, i, $k)))
       |      ELSE slice(ts, 1, 0) END), g ->
       |    transform(array(transform(g, x ->
       |        CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT))), hs ->
       |      CASE WHEN size(hs) = 0 THEN hs
       |      ELSE array_sort(array_distinct(transform(
       |        sequence(1, greatest(size(hs) - ${w - 1}, 1)),
       |        i -> array_min(slice(hs, i, $w))))) END)[0])[0])[0]""".stripMargin

  /** Per-document winnowing fingerprints, exploded to (id, fp_hash)
    * rows — the join-ready shape (documents with fewer than `k` tokens
    * have no grams, hence no rows, matching the oracle's unnest).
    */
  def winnowFingerprints(docs: org.apache.spark.sql.DataFrame,
                         k: Int = 3, w: Int = 4,
                         textCol: String = "text",
                         idCol: String = "doc_id"): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol), explode(expr(winnowSelectSql(textCol, k, w))).as("fp_hash"))

  /** Candidate near-dup/clone pairs by shared winnowing fingerprints:
    * pairs of documents sharing >= 1 selected hash, with the shared
    * count as the match-strength signal. Hashes whose document
    * frequency exceeds `maxDf` are dropped first — corpus-wide
    * boilerplate (license headers, navigation chrome) would otherwise
    * pair every document carrying it, the classic O(bucket^2) blow-up.
    * The cap is a DETERMINISTIC df threshold (not a sampling cap), so
    * an exact SQL oracle reproduces it; it is also the principled
    * choice — a gram shared by hundreds of documents identifies
    * boilerplate, not provenance.
    *
    * Scale shape: fingerprints are ~2/(w+1) of grams per doc; the df
    * aggregate map-side combines on fp_hash; the self-join shuffles
    * both sides on fp_hash with every bucket bounded by maxDf, so
    * worst-case pair fan-out per hash is maxDf^2/2 — linear overall,
    * no all-pairs anywhere.
    */
  def winnowCandidatePairs(docs: org.apache.spark.sql.DataFrame,
                           k: Int = 3, w: Int = 4, maxDf: Int = 50,
                           textCol: String = "text",
                           idCol: String = "doc_id",
                           releaseOnMaterialize: Boolean = false): org.apache.spark.sql.DataFrame = {
    val storage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // The fingerprint projection has FOUR consumers here: the df
    // aggregate, the mask semi-join, and both self-join sides —
    // persist it once so the corpus is scanned and fingerprinted a
    // single time (still material after the native graft_winnow kernel
    // moved the projection into whole-stage codegen). The cached rows
    // are (id, hash): ~2/(w+1) of the gram count, a tiny fraction of
    // the corpus text — cacheable at 100 TB where the text is not.
    // scatter BEFORE the winnow kernel (guide §2.5): on a single-file
    // corpus the selection would run — and the persisted copy every
    // consumer reads would live — in one partition. Deliberately NOT
    // inside winnowFingerprints: the fingerprint-only path (q73) is a
    // plan-pinned shuffle-free projection.
    val fp = winnowFingerprints(graft.operators.Scatter.cpu(docs), k, w, textCol, idCol)
      .persist(storage)
    val rare = fp.groupBy(col("fp_hash"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp_hash")
    val kept = fp.join(rare, Seq("fp_hash"), "left_semi")
    val out = kept.as("a")
      .join(kept.as("b"),
        col("a.fp_hash") === col("b.fp_hash") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    // nearDuplicates' cache discipline (Dedup.scala): by default the
    // signature cache stays registered for the session (clearCache or
    // unpersist between calls in a long-lived driver); with
    // releaseOnMaterialize the pair set is computed eagerly, the
    // signature cache released, and the MATERIALIZED pairs returned —
    // unpersist() on them leaves the session cache-clean.
    if (!releaseOnMaterialize) out
    else {
      val mat = out.persist(storage)
      mat.count()
      fp.unpersist()
      mat
    }
  }

  /** Corpus vocabulary: top-k lowercased word tokens by total
    * frequency, with document frequency.
    *
    * Plan shape: ONE aggregate keyed on `token` alone. Each document
    * row explodes to (token, tf=1, df=0) per occurrence plus
    * (token, tf=0, df=1) per distinct-in-doc token, so both counters
    * are plain sums and the map-side partial aggregation compresses
    * the shuffle to ~one row per (input partition, token) — shuffle
    * volume is bounded by vocabulary size, not corpus token count.
    * (A key that includes doc_id would defeat map-side combine and
    * shuffle the whole token stream.) Final top-k is
    * TakeOrderedAndProject with the token as a deterministic
    * tiebreak.
    */
  def topTokens(docs: org.apache.spark.sql.DataFrame, k: Int, textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    // The regex split + filter pass is hoisted into its own projection
    // beneath the Generate: generators get no common-subexpression
    // elimination across lambda arguments, so referencing the split
    // twice inside explode() would tokenize every document twice —
    // the regex pass dominates this query's cost. CollapseProject
    // keeps the hoist (the alias is non-cheap and consumed twice, so
    // the optimizer won't inline it back).
    docs
      .select(expr(
        s"filter(split(lower($textCol), '[^a-z0-9]+'), t -> t != '')").as("tokens"))
      .select(expr(
        """explode(concat(
          |  transform(tokens, t -> struct(t AS token, 1L AS tf, 0L AS df)),
          |  transform(array_distinct(tokens), t -> struct(t AS token, 0L AS tf, 1L AS df))
          |)) AS e""".stripMargin).as("e"))
      .select(col("e.token").as("token"), col("e.tf").as("tf"), col("e.df").as("df"))
      .groupBy(col("token"))
      .agg(fsum(col("tf")).as("total_freq"), fsum(col("df")).as("doc_freq"))
      .orderBy(org.apache.spark.sql.functions.desc("total_freq"), col("token"))
      .limit(k)
  }

  /** Lowercased word tokens as an array (empty tokens filtered), the
    * shared tokenizer of topTokens / repetitionStats / Contamination —
    * the DuckDB-parity form (`regexp_split_to_array` + filter).
    */
  def wordTokensSql(textCol: String): String =
    s"filter(split(lower($textCol), '[^a-z0-9]+'), x -> length(x) > 0)"

  /** Per-document repetition signals (the Gopher-style quality
    * filters): type/token ratio, duplicate word-trigram ratio, and
    * top-single-token mass. High duplicate-n-gram or top-token ratios
    * mark boilerplate and degenerate generations for removal before
    * training.
    *
    * Plan shape: ONE projection over the scan, no shuffle. The
    * signals come from the NATIVE `graft_repstats` kernel
    * ([[graft.functions.RepetitionStats]]): one interning pass per
    * document inside whole-stage codegen, trigram dedup over packed
    * int-id triples with no per-trigram strings. The pure-HOF
    * formulation it replaced ([[repetitionStatsPortableSql]]) is
    * CodegenFallback — interpreted per row with every intermediate
    * boxed — and is kept as the documentation/parity form,
    * spec-pinned bit-identical on the real corpus. The kernel takes
    * the raw `split()` output (codegen'd) and drops empty tokens
    * itself, the same fusion trick as `graft_winnow`.
    */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame,
                      textCol: String = "text",
                      idCol: String = "doc_id"): org.apache.spark.sql.DataFrame =
    docs
      .select(
        col(idCol),
        expr(s"graft_repstats(split(lower($textCol), '[^a-z0-9]+'))").as("s"))
      .select(col(idCol), col("s.n_tokens").as("n_tokens"), col("s.n_types").as("n_types"),
        col("s.type_token_ratio").as("type_token_ratio"),
        col("s.dup_trigram_ratio").as("dup_trigram_ratio"),
        col("s.top_token_ratio").as("top_token_ratio"))

  /** The pure-SQL (built-ins only) repetition-signal formulation —
    * parity reference for `graft_repstats`, in the exact shape the
    * DuckDB oracle mirrors. The `transform(array(tokens), ts ->
    * ...)[0]` wrapper is a let-binding: it stops the optimizer from
    * inlining the tokenizer into each consuming lambda, where
    * interpreted higher-order functions would re-split the text once
    * per signal. Top-token counting sorts the token vector once and
    * takes the longest equal-adjacent run — O(n log n) per document
    * (a count-each-distinct-type formulation is O(types x tokens),
    * quadratic on repetitive documents, the exact corpus shape this
    * filter exists to catch). The max run count equals the native
    * kernel's max interned frequency, so the ratio is bit-identical.
    */
  def repetitionStatsPortableSql(textCol: String): String =
    s"""transform(array(${wordTokensSql(textCol)}), ts -> named_struct(
       |  'n_tokens', CAST(size(ts) AS BIGINT),
       |  'n_types', CAST(size(array_distinct(ts)) AS BIGINT),
       |  'type_token_ratio',
       |    CAST(size(array_distinct(ts)) AS DOUBLE) / greatest(size(ts), 1),
       |  'dup_trigram_ratio', CASE WHEN size(ts) >= 3 THEN
       |      1.0D - CAST(size(array_distinct(transform(sequence(1, size(ts) - 2),
       |               i -> concat_ws(' ', slice(ts, i, 3))))) AS DOUBLE)
       |           / (size(ts) - 2)
       |    ELSE 0.0D END,
       |  'top_token_ratio', CASE WHEN size(ts) > 0 THEN
       |      CAST(aggregate(array_sort(ts),
       |             named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
       |             (a, t) -> named_struct(
       |               'prev', t,
       |               'run',  IF(a.prev IS NOT NULL AND t = a.prev, a.run + 1L, 1L),
       |               'best', greatest(a.best,
       |                 IF(a.prev IS NOT NULL AND t = a.prev, a.run + 1L, 1L))),
       |             a -> a.best) AS DOUBLE) / size(ts)
       |    ELSE 0.0D END
       |))[0]""".stripMargin

  /** Per-document keyword extraction: the TF-IDF shape with a
    * DETERMINISTIC integer ordering — rank tokens by term frequency
    * descending, then document frequency ascending (rarer-in-corpus
    * wins the tie — exactly what idf weighting expresses), then token
    * — and keep the top `k` per document. Pure-integer ranking keys
    * make the result reproducible bit-for-bit across engines, where a
    * float `tf*log(N/df)` score can swap ranks in the last ulp.
    *
    * Plan shape at scale: one explode + two hash aggregations. The
    * (doc, token) tf aggregate partials map-side (the explode output
    * never shuttles raw — only distinct (doc, token) pairs shuffle),
    * df comes from a window over the SAME (token)-clustered shuffle
    * the second agg would need anyway, and the final per-doc top-k is
    * a rank-filter window partitioned by doc — O(corpus tokens) total,
    * no cross-doc data movement beyond the two key-hash exchanges.
    * Tokens shorter than `minLen` are dropped before the first
    * aggregation (volume cut at the source).
    */
  def docKeywords(docs: org.apache.spark.sql.DataFrame,
                  k: Int = 3,
                  minLen: Int = 3,
                  textCol: String = "text",
                  idCol: String = "doc_id"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("token"))
      .filter(length(col("token")) >= minLen)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
    withDf
      .withColumn("rank",
        row_number().over(Window.partitionBy(idCol)
          .orderBy(col("tf").desc, col("df").asc, col("token").asc)))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("rank").cast("int").as("rank"))
  }
}
