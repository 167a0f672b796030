package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora: exact (hash-group),
  * MinHash+LSH (near-dup candidate generation), SimHash, and exact
  * n-gram Jaccard verification.
  *
  * Scale design: signatures are computed in a single codegen'd
  * projection per document (higher-order array expressions over
  * shingles — no explode, no shuffle). Only the LSH bucket join
  * shuffles, and it shuffles band-bucket keys, not documents: the
  * payload per row is (doc_id, bucket). Identical-document floods
  * (a bucket with m docs yields m^2/2 pairs) are the classic skew
  * risk — `candidatePairs` caps bucket width so a pathological bucket
  * degrades to sampling instead of an O(m^2) explosion.
  */
object Dedup {

  /** Exact dedup: content-hash groups with representative = min id.
    * One hash-partitioned aggregate; the md5 is computed map-side.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** The deduplicated corpus: keep one representative (min id) per
    * exact-content group. One aggregate + one semi-join-shaped join on
    * the representative ids — the standard "drop exact dups before
    * training" pass.
    */
  def dropExactDuplicates(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val keep = exact(docs, textCol, idCol).select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** The FUZZY-deduplicated corpus: near-dup clusters (connected
    * components over the LSH-verified pair graph, [[nearDupClusters]])
    * reduced to one representative per cluster — the min-id member,
    * which IS the cluster_id by construction of the min-label
    * propagation. The fuzzy twin of [[dropExactDuplicates]] and the
    * standard "MinHash dedup" output shape (keep one doc per near-dup
    * cluster, drop the rest).
    *
    * Scale shape: the keep set is O(distinct clusters) ≈ O(docs), so
    * it is NOT broadcast — the final semi-join shuffles on the id,
    * one exchange. The cluster frame nearDupClusters persists is
    * released here after the keep set is materialized (eager
    * localCheckpoint truncates the dependency, so the unpersist
    * cannot force a recompute downstream).
    */
  def fuzzyDedupCorpus(
      docs: DataFrame,
      threshold: Double,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val clusters = nearDupClusters(docs, threshold, textCol, idCol)
    val keep = clusters.filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id").as(idCol))
      .localCheckpoint(true)
    clusters.unpersist()
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Distinct character n-gram shingles as an array column (no explode). */
  def shingleSql(textCol: String, n: Int): String =
    s"array_distinct(transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), i -> substring($textCol, i, $n)))"

  /** MinHash signature via the native one-pass expression
    * (graft.functions.MinHashSignature): each shingle hashed once, k
    * minima tracked in a primitive loop inside codegen.
    */
  def withMinhash(docs: DataFrame, textCol: String = "text", k: Int = 16, shingleN: Int = 5): DataFrame =
    docs.withColumn("minhash", expr(s"graft_minhash(${shingleSql(textCol, shingleN)}, $k)"))

  /** LSH band keys: hash of each `rowsPerBand`-wide signature slice.
    * Docs sharing any band key are candidate pairs; with b bands of r
    * rows the match probability is 1-(1-j^r)^b (threshold ~0.5 for
    * b=4, r=4).
    *
    * The native kernel derives its band count from the signature
    * length (len/r), so a signature longer than bands*rowsPerBand
    * would silently produce MORE bands than requested (the replaced
    * HOF emitted exactly `bands`, ignoring the tail) — and a
    * signature index persisted under one derivation stops matching a
    * batch banded under another. Slice the signature to exactly
    * bands*rowsPerBand values first, restoring the requested banding
    * for every (k, bands, r).
    */
  def withLshBands(sigs: DataFrame, bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    require(bands > 0 && rowsPerBand > 0, "bands and rowsPerBand must be positive")
    sigs.withColumn("bands",
      expr(s"graft_lsh_bands(slice(minhash, 1, ${bands * rowsPerBand}), $rowsPerBand)"))
  }

  /** Candidate pairs from shared LSH buckets, with the MinHash-estimated
    * Jaccard. `maxBucket` bounds the per-bucket pair blowup (skew guard):
    * buckets wider than it are truncated to their lowest ids — at 100 TB
    * a boilerplate page repeated 10M times must not produce 10^13 pairs.
    */
  def candidatePairs(withBands: DataFrame, idCol: String = "doc_id", maxBucket: Int = 1000): DataFrame = {
    val k = "size(sig_a)"
    val buckets = withBands
      .select(col(idCol), posexplode(col("bands")).as(Seq("band", "bucket")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket").orderBy(col(idCol))))
      .filter(col("rn") <= maxBucket)
      .drop("rn")
    val pairs = buckets.as("a")
      .join(
        buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol")
      )
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val sigs = withBands.select(col(idCol), col("minhash"))
    pairs
      .join(sigs.select(col(idCol).as("id_a"), col("minhash").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("minhash").as("sig_b")), "id_b")
      .withColumn(
        "est_jaccard",
        expr(s"aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v) / CAST($k AS DOUBLE)")
      )
      .drop("sig_a", "sig_b")
  }

  /** Portable MinHash + LSH band keys, one scalar row per (doc, band):
    * `(doc_id, band, sig_a, sig_b, band_key)`.
    *
    * "Portable" = the hash is md5-based and every step is expressible
    * identically in ANSI-ish SQL, so an independent engine (the DuckDB
    * oracle) can recompute the signature bit-for-bit — unlike the
    * production path (`withMinhash`/`nearDuplicates`), whose xxhash64
    * kernel exists only here and is therefore verified end-to-end
    * through the exact-Jaccard output of q13 rather than value-by-value.
    * Shingle hash = first 60 bits of md5 (fits a signed long in both
    * engines); k hash functions by Kirsch–Mitzenmacher double hashing
    * mod the Mersenne prime 2^31-1; band key packs the r=2 signature
    * slice injectively into one long.
    *
    * Executes via the native codegen'd kernel
    * (graft.functions.PortableMinHashBands); one projection + one
    * generator per document, no shuffle, no join.
    */
  def portableMinhashBands(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 16,
      bands: Int = 8,
      shingleN: Int = 5
  ): DataFrame =
    // scatter BEFORE the kernel (guide §2.5): the md5 double-hash
    // family costs k hashes per shingle per doc, and a single-file
    // corpus scan would run all of it on one task. Per-row projection:
    // partitioning cannot change a single output value. 16 KB/partition
    // hint: this kernel burns ~4x the CPU per input byte of the
    // xxhash shingle family (interleaved A/B in Scatter's scaladoc).
    graft.operators.Scatter.cpu(docs, bytesPerPartitionHint = 16384L).select(
      col(idCol),
      explode(expr(s"graft_minhash_md5_bands(${shingleSql(textCol, shingleN)}, $k, $bands)")).as("e")
    ).select(col(idCol), col("e.band").as("band"), col("e.sig_a").as("sig_a"),
      col("e.sig_b").as("sig_b"), col("e.band_key").as("band_key"))

  /** The declarative formulation of `portableMinhashBands`, entirely in
    * built-in higher-order functions — kept as the executable
    * specification of the native kernel (a spec asserts row-for-row
    * equality), not for production use (interpreted HOFs are ~7x
    * slower here).
    *
    * Plan-shape note: the `transform(array(x), v -> ...)` wrappers are
    * let-bindings — they stop the optimizer from inlining the
    * shingle-hash array into the consuming lambdas, where interpreted
    * higher-order functions would re-evaluate the md5 pass once per
    * signature position.
    */
  def portableMinhashBandsReference(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 16,
      bands: Int = 8,
      shingleN: Int = 5
  ): DataFrame = {
    require(k % bands == 0 && k / bands == 2, "portable variant is fixed at r = 2 rows per band")
    val P = 2147483647L // Mersenne prime 2^31-1
    docs.select(
      col(idCol),
      expr(
        s"""explode(
           |  transform(
           |    array(transform(${shingleSql(textCol, shingleN)},
           |                    s -> CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT))),
           |    hs -> transform(
           |      array(transform(sequence(0, ${k - 1}),
           |              i -> array_min(transform(hs,
           |                     h -> ((h % $P) + i * (1 + (h div $P) % $P)) % $P)))),
           |      sig -> transform(sequence(0, ${bands - 1}), b -> named_struct(
           |        'band', CAST(b AS INT),
           |        'sig_a', element_at(sig, 2 * b + 1),
           |        'sig_b', element_at(sig, 2 * b + 2),
           |        'band_key', element_at(sig, 2 * b + 1) * ${P}L + element_at(sig, 2 * b + 2))))
           |    [0])
           |  [0]
           |) AS e""".stripMargin).as("e")
    ).select(col(idCol), col("e.band").as("band"), col("e.sig_a").as("sig_a"),
      col("e.sig_b").as("sig_b"), col("e.band_key").as("band_key"))
  }

  /** 64-bit SimHash over whitespace tokens: per-bit weight sums then
    * sign-pack, via the native `graft_simhash` kernel
    * ([[graft.functions.SimHash]]) — one codegen'd projection, no
    * shuffle. Near-dups are pairs with small hamming distance:
    * `bit_count(a ^ b)`. The pure-HOF formulation it replaced is
    * [[simhashPortableSql]] with xxhash64 features; parity is
    * spec-pinned.
    */
  def withSimhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("simhash",
      expr(s"graft_simhash(split($textCol, '\\\\s+'), 64, false)"))

  /** The pure-HOF (built-ins only) SimHash formulation — parity
    * reference for `graft_simhash` and the shape the DuckDB oracle
    * mirrors for the md5 variant. Adds `simhash` from a
    * `hashesCol`-named array of PRE-HASHED feature longs: `aggregate`
    * folding a `zip_with` of per-bit contributions, then a sign-pack
    * — per feature the interpreted form allocates two `bits`-element
    * boxed arrays and evaluates 3x`bits` lambdas; the native kernel
    * is why it's no longer the production path.
    */
  def simhashHofReference(df: DataFrame, hashesCol: String, bits: Int): DataFrame =
    df
      .withColumn(
        "bitsums_",
        expr(s"""aggregate($hashesCol, array_repeat(0L, $bits),
                |  (acc, h) -> zip_with(acc,
                |    transform(sequence(0, ${bits - 1}),
                |      b -> CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1L ELSE -1L END),
                |    (x, y) -> x + y))""".stripMargin)
      )
      .withColumn(
        "simhash",
        expr(s"""aggregate(transform(sequence(0, ${bits - 1}),
                |  b -> CASE WHEN element_at(bitsums_, b + 1) > 0 THEN shiftleft(1L, b) ELSE 0L END),
                |  0L, (acc, v) -> acc + v)""".stripMargin)
      )
      .drop("bitsums_")

  /** Oracle-portable 60-bit SimHash over the same 5-gram shingle
    * features as the portable MinHash path: feature hash = first 60
    * bits of md5 (`conv(substr(md5(s),1,15),16,10)` — the identical
    * value DuckDB computes as `CAST('0x'||substr(md5(s),1,15) AS
    * BIGINT)`, parity proven by q12), per-bit weight sums, sign-pack
    * — all in the native `graft_simhash` kernel (md5 mode). Same
    * single-projection / no-shuffle shape as `withSimhash` (the
    * xxhash64 token variant — one fewer md5 per feature); both modes
    * are spec-pinned against [[simhashHofReference]].
    */
  def portableSimhash(docs: DataFrame, textCol: String = "text", shingleN: Int = 5): DataFrame =
    // shingled-text kernel, NOT graft_simhash(shingleSql(...), ...):
    // the shingle expression is itself a CodegenFallback HOF and would
    // leave the projection interpreted (the graft_winnow raw-split
    // lesson, one level deeper)
    docs.withColumn("simhash",
      expr(s"graft_simhash_shingled($textCol, $shingleN, 60)"))

  /** Exact character-n-gram Jaccard between two text columns (the
    * verification step after candidate generation).
    */
  def ngramJaccardSql(aCol: String, bCol: String, n: Int): String = {
    val ga = shingleSql(aCol, n)
    val gb = shingleSql(bCol, n)
    s"CAST(size(array_intersect($ga, $gb)) AS DOUBLE) / size(array_union($ga, $gb))"
  }

  /** End-to-end near-duplicate detection: MinHash -> LSH candidate
    * pairs -> exact n-gram-Jaccard verification at `threshold`.
    *
    * Band parameters are selective (b bands of r=k/b rows): a pair at
    * Jaccard j collides with probability 1-(1-j^r)^b. Defaults k=32,
    * b=8, r=4 put the S-curve knee near j~0.55: background pairs of a
    * shared-vocabulary corpus (j ~ 0.2) collide at ~0.1% — without the
    * r=4 sharpening a 5000-doc corpus already yields millions of false
    * candidates, and at 100 TB the candidate join IS the cost. Recall
    * at these defaults: a pair at j=0.8 collides w.p. 1-(1-0.8^4)^8 ~
    * 0.985, and at exactly j=0.7 only ~0.89 — so parity with an exact
    * all-pairs-Jaccard oracle is guaranteed only when true pairs sit
    * well above the threshold (testdata's do); raise `bands` to push
    * recall at the threshold toward 1 at linear candidate cost.
    *
    * The signature cache (`base` below) stays registered for the
    * session once the result is materialized — repeated invocations in
    * a long-lived driver should either unpersist between calls
    * (spark.catalog.clearCache()) or pass `releaseOnMaterialize =
    * true`, which computes the pair set eagerly, releases the internal
    * cache, and returns the MATERIALIZED (persisted) pairs — then the
    * only registered entry is the returned frame, and `unpersist()` on
    * it leaves the session cache-clean. Blocks are MEMORY_AND_DISK so
    * eviction pressure degrades to recompute, never OOM.
    *
    * Verification cost controls, both exact (no recall loss):
    * - shingle sets are computed ONCE per doc and joined to the pairs,
    *   not recomputed from text per candidate;
    * - size-ratio prune before the set ops: j <= min(|A|,|B|)/max, so
    *   pairs whose shingle counts differ by more than the threshold
    *   ratio cannot pass and are dropped on two int columns.
    */
  def nearDuplicates(
      docs: DataFrame,
      threshold: Double,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 5,
      k: Int = 32,
      bands: Int = 8,
      maxBucket: Int = 1000,
      parallelism: Option[Int] = None,
      releaseOnMaterialize: Boolean = false
  ): DataFrame = {
    require(k % bands == 0,
      s"k must be divisible by bands (k=$k, bands=$bands): the native band kernel derives its band count as k/r")
    val r = k / bands
    // Signature computation is the CPU-heavy stage (k hashes per
    // shingle per doc) and its expressions are interpreted, not
    // codegen'd — two plan-shape decisions keep it scale-safe:
    // 1. scatter first (a single small parquet file would otherwise
    //    serialize the whole corpus onto one task). `parallelism` =
    //    Some(n) ALWAYS repartitions to n (the caller asked for that
    //    fan-out — e.g. to bound per-task memory); Some(0) keeps the
    //    input layout unconditionally; None (default) scatters to
    //    every core UNLESS the scan already has at least that many
    //    FILES — a heuristic from driver-side FileIndex metadata (no
    //    physical planning): many files usually means enough splits,
    //    and a full shuffle that SHRINKS a well-split 100 TB corpus
    //    costs more than it saves. The heuristic can under-scatter
    //    when many small files bin-pack into few partitions — pass
    //    Some(n) to force the fan-out in that case.
    // 2. cache the signature table so every consumer (bucket explode +
    //    both sides of the self-join + the two verification joins)
    //    reads one materialized copy. Without the cache, per-consumer
    //    column pruning rewrites the projection differently each time
    //    (defeating exchange reuse) and inlines the shingle expression
    //    into the per-band lambda, where interpreted higher-order
    //    functions re-evaluate it once per band per row — a 32x
    //    recompute measured as the dominant cost of the whole job.
    val sc = docs.sparkSession.sparkContext
    val scattered = Dedup.scatterForCpuStage(docs, parallelism, sc.defaultParallelism)
    // sh = sorted distinct n-gram hashes (primitive longs) — the native
    // trio shingle/minhash/jaccard keeps the whole verify path codegen'd
    val base = scattered
      .withColumn("sh", expr(s"graft_shingle_hashes($textCol, $shingleN)"))
      .withColumn("mh", expr(s"graft_minhash_hashed(sh, $k)"))
      // native band kernel (bit-identical keys to the xxhash64 HOF
      // form): transform() is CodegenFallback and would eject this
      // whole CPU-heavy projection from whole-stage codegen
      .withColumn("bands", expr(s"graft_lsh_bands(mh, $r)"))
      .select(col(idCol), col("sh"), size(col("sh")).as("n_sh"), col("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = base
      .select(col(idCol), posexplode(col("bands")).as(Seq("band", "bucket")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket").orderBy(col(idCol))))
      .filter(col("rn") <= maxBucket)
      .drop("rn")
    val pairs = buckets.as("a")
      .join(
        buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol")
      )
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val sides = base.select(col(idCol), col("sh"), col("n_sh"))
    val out = pairs
      .join(sides.select(col(idCol).as("id_a"), col("sh").as("sh_a"), col("n_sh").as("n_a")), "id_a")
      .join(sides.select(col(idCol).as("id_b"), col("sh").as("sh_b"), col("n_sh").as("n_b")), "id_b")
      .filter(least(col("n_a"), col("n_b")).cast("double") / greatest(col("n_a"), col("n_b")) >= threshold)
      .withColumn("jaccard", expr("graft_jaccard_sorted(sh_a, sh_b)"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    if (!releaseOnMaterialize) out
    else {
      // eager variant: materialize the pair set NOW, release the
      // internal signature cache, and hand back the one cache entry
      // the caller knows about (and is documented to unpersist) — an
      // embedding application can't accumulate hidden caches this way
      val mat = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      mat.count()
      base.unpersist()
      mat
    }
  }

  /** Near-duplicate CLUSTERS: connected components over the near-dup
    * pair graph — the dedup endgame (pairs alone don't dedupe; A~B and
    * B~C must collapse to one kept document even when A~C was never
    * emitted). Returns (doc_id, cluster_id) for EVERY document,
    * cluster_id = min doc_id reachable through pairs; singletons map
    * to themselves, so `groupBy(cluster_id).min(doc_id)` is the
    * keep-list.
    *
    * Iterative min-label propagation (the standard distributed CC
    * loop, cf. GraphX's connectedComponents): each round joins labels
    * across edges and takes the per-vertex min. Rounds needed = graph
    * diameter — for near-dup graphs that's the longest duplicate
    * chain, small in practice; `maxIters` bounds the worst case (the
    * loop logs a warning if it exits non-converged, so truncated
    * propagation is detectable). Per round: one join + one aggregate
    * over the EDGE set (pairs, not corpus); the corpus-sized frame is
    * touched once at the start and once at the end.
    *
    * Job-count control (at test scale the per-job fixed overhead, not
    * the plan, dominates this operator): labels are SEEDED with one
    * neighbor-min aggregate — no join — which fully converges any
    * component whose members all touch its min vertex (stars and
    * cliques, the overwhelming near-dup shape); the loop then checks
    * convergence after ONE verification round, and every TWO rounds
    * thereafter (labels decrease monotonically, so any round equal to
    * its predecessor is a fixpoint), halving the driver-visible jobs
    * on long chains without a wasted round on the common path.
    *
    * The returned frame is fully materialized and cached; the pair set
    * is unpersisted before return, and the per-round label checkpoints
    * (small: one row per clustered doc) are reclaimed by the
    * ContextCleaner once the call returns. Callers should
    * `unpersist()` the result when done.
    */
  def nearDupClusters(
      docs: DataFrame,
      threshold: Double,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxIters: Int = 20
  ): DataFrame = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val tStart = System.nanoTime()
    // the eager pair set (the expensive LSH+verify job): materialized
    // once — edges and every propagation round re-read that one copy
    // (the union's two branches would otherwise each recompute it) —
    // and the signature cache inside nearDuplicates is already
    // released by the time it returns
    val matPairs = nearDuplicates(docs, threshold, textCol, idCol,
      releaseOnMaterialize = true)
    val nPairs = matPairs.count() // already materialized — cache read
    log.info(s"nearDupClusters: pairs=$nPairs pairGenMs=${(System.nanoTime() - tStart) / 1000000L}")
    val out = clusterFromPairs(docs, matPairs.select(col("id_a"), col("id_b")),
      idCol, maxIters, "nearDupClusters")
    matPairs.unpersist()
    out
  }

  /** Min-label-propagation connected components over an explicit
    * (id_a, id_b) pair frame — the CC engine behind [[nearDupClusters]]
    * (MinHash pairs) and [[winnowClusters]] (rolling-hash fingerprint
    * pairs). `pairs` should be cheap to re-read (materialized or a
    * cache-backed frame): the edge set is consumed by the seed
    * aggregate and every propagation round. All the loop mechanics
    * documented on [[nearDupClusters]] — seed convergence, 2-rounds-
    * per-check, eager localCheckpoint lineage truncation — live here.
    */
  /** Pair-count ceiling for the driver union-find fast path — the same
    * bounded-driver-round-trip class as trainCentroids' nlist x dim
    * collect. Honest footprint at the cap: edges ship as primitive
    * long arrays (2M pairs = 32 MB on the wire and on the driver — NOT
    * boxed Rows), the label map is a java HashMap of <= 2 x 2M
    * entries (~100-200 MB transient with Long boxing), and the label
    * relation is only broadcast when small enough to be safe (below).
    * Above the cap, the distributed loop runs.
    */
  private[graft] val MaxDriverPairs = 2000000L

  /** Label-count ceiling for broadcasting the driver-computed label
    * relation: 1.5M (id, label) rows ~= 24 MB as a local relation —
    * an explicit broadcast() bypasses autoBroadcastJoinThreshold, so
    * bound it here; larger label sets take whatever join strategy
    * Catalyst picks (one shuffle of the slim id column).
    */
  private[graft] val MaxBroadcastLabels = 1500000

  private[graft] def clusterFromPairs(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      maxIters: Int,
      logLabel: String,
      driverPairLimit: Long = MaxDriverPairs // tests pass 0 to force the distributed loop
  ): DataFrame = {
    val storage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val tPairs = System.nanoTime()
    // SCALE-ADAPTIVE STRATEGY (the AQE idea applied to CC): the pair
    // set is already materialized in both callers, so its count is a
    // cache read — when it is driver-bounded AND the id is integral,
    // a union-find with path compression labels the whole graph in
    // O(pairs a(pairs)) on the driver, replacing an O(diameter)-round
    // distributed loop whose per-round cost is 3 shuffles + an eager
    // checkpoint (measured: q75's 11-round chain graph spent 10 s in
    // the loop at sf0.1 for 8k pairs). The distributed loop remains
    // the 100 TB path: a pair graph can exceed any driver bound
    // (union-by-min keeps root = component min, so both paths produce
    // IDENTICAL labels — oracle-pinned either way).
    val longId = docs.schema(idCol).dataType == org.apache.spark.sql.types.LongType
    if (longId && pairs.count() <= driverPairLimit) {
      // Ship edges as PRIMITIVE long arrays (one flat [a0,b0,a1,b1,..]
      // per partition): 2M pairs = 32 MB, vs collect()'s boxed
      // GenericRows at ~10x that (r12 advice).
      val edgeChunks: Array[Array[Long]] = pairs
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .rdd.mapPartitions { it =>
          val buf = new scala.collection.mutable.ArrayBuilder.ofLong
          it.foreach { r => buf += r.getLong(0); buf += r.getLong(1) }
          Iterator.single(buf.result())
        }.collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrDefault(x, x) != x) {
          val p = parent.getOrDefault(x, x)
          parent.put(x, parent.getOrDefault(p, p)) // path halving
          x = parent.getOrDefault(x, x)
        }
        x
      }
      var nEdges = 0L
      edgeChunks.foreach { chunk =>
        var i = 0
        while (i < chunk.length) {
          val ra = find(chunk(i)); val rb = find(chunk(i + 1))
          if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
          i += 2; nEdges += 1
        }
      }
      // One label per DISTINCT endpoint, deduped in the map itself —
      // no boxed tuple buffer + .distinct copy (r12 advice).
      val label = new java.util.HashMap[Long, Long]()
      edgeChunks.foreach { chunk =>
        var i = 0
        while (i < chunk.length) {
          val x = chunk(i)
          if (!label.containsKey(x)) label.put(x, find(x))
          i += 1
        }
      }
      val spark = docs.sparkSession
      import spark.implicits._
      val labelsLocal = new scala.collection.mutable.ArrayBuffer[(Long, Long)](label.size)
      label.forEach((k, v) => labelsLocal += ((k, v)))
      val labelsDf = labelsLocal.toSeq.toDF("doc_id", "label")
      // Explicit broadcast() bypasses autoBroadcastJoinThreshold, so
      // only force it under the documented bound; otherwise let
      // Catalyst pick the strategy for the slim (id, label) relation.
      val labels =
        if (label.size <= MaxBroadcastLabels) broadcast(labelsDf) else labelsDf
      val result = docs.select(col(idCol).as("doc_id"))
        .join(labels, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
        .persist(storage)
      result.count()
      log.info(s"$logLabel: driver union-find pairs=$nEdges " +
        s"labeled=${label.size} ms=${(System.nanoTime() - tPairs) / 1000000L}")
      return result
    }
    val edges = pairs
      .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    // seed: label = min(id, min neighbor id) — one aggregate over the
    // edge set, and the distinct-vertex pass rolled in for free.
    //
    // LINEAGE TRUNCATION (localCheckpoint below, here and per round):
    // propagate() embeds `cur` twice — via the neighbor-min join and
    // the outer join folding it back — so under plain persist() the
    // LOGICAL plan doubles every round, O(2^rounds) nodes. Execution
    // still reads the caches, but analysis + canonicalization + AQE
    // re-planning walk the full tree on the driver: measured as 20 s+
    // driver stalls between sub-second jobs once a graph needs 5+
    // rounds (SCALE.md). localCheckpoint materializes the round AND
    // replaces its plan with the materialized leaf — the canonical
    // Spark treatment for iterative algorithms (cf. GraphX Pregel's
    // periodic checkpointing). Local (not reliable) checkpoints are
    // executor-resident; on a cluster where executor loss must be
    // survivable, swap for setCheckpointDir + checkpoint() at the
    // same call sites. Blocks are freed by the ContextCleaner once
    // the round's Dataset goes out of scope (Dataset.unpersist does
    // not cover checkpoint blocks).
    var labels = edges
      .groupBy(col("id_a").as("id")).agg(min("id_b").as("__nbr"))
      .select(col("id"), least(col("id"), col("__nbr")).as("label"))
      .localCheckpoint(true)
    // one propagation round: per-vertex min of neighbor labels folded
    // into the current label, then POINTER-HALVING — fold in the
    // label's own label (label(v) is in v's component, so
    // label(label(v)) is too: still a reachable min, monotone
    // decreasing, correctness unchanged). Plain neighbor-min needs
    // O(diameter) rounds, which truncates at maxIters on long
    // duplicate CHAINS (the winnowing pair graph's natural shape —
    // q75 measured 11 rounds on the sf0.1 fixture); halving doubles
    // the hop distance folded per round, O(log diameter) — the
    // classic shortcutting step of distributed CC (cf. the
    // large-star/small-star algorithm). Cost: one extra equi-join of
    // the label frame against itself (one row per vertex — small next
    // to the edge join). The changed flag rides in the final select.
    def propagate(cur: DataFrame, withChanged: Boolean): DataFrame = {
      val nbrMin = edges
        .join(cur, edges("id_a") === cur("id"))
        .groupBy(col("id_b").as("id")).agg(min("label").as("nbr"))
      val folded = cur.withColumnRenamed("label", "old")
        .join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nbr"), col("old"))).as("mid"))
      val lut = folded.select(col("id").as("mid"), col("mid").as("__mid2"))
      val halved = folded.join(lut, Seq("mid"), "left_outer")
        .select(col("id"), col("old"),
          least(col("mid"), coalesce(col("__mid2"), col("mid"))).as("label"))
      val sel =
        Seq(col("id"), col("label")) ++
          (if (withChanged) Seq((col("label") < col("old")).as("__changed")) else Nil)
      halved.select(sel: _*)
    }
    var converged = false
    var it = 0
    val tSeed = System.nanoTime()
    // first convergence check after ONE round (the seed alone converges
    // stars and cliques — the overwhelming case — so the common path is
    // a single verification round); afterwards TWO rounds per count():
    // the intermediate round is persisted but not acted on — its cache
    // fills while the second round's checkpoint evaluates. Each kept
    // round is an EAGER localCheckpoint (materialize + truncate the
    // plan — see the seed comment), so the convergence count is a
    // cache read and the next round's plan starts from a leaf.
    var roundsPerCheck = 1
    while (!converged && it < maxIters) {
      val mid =
        if (roundsPerCheck == 2) propagate(labels, withChanged = false).persist(storage)
        else labels
      val next = propagate(mid, withChanged = true).localCheckpoint(true)
      converged = next.filter(col("__changed")).count() == 0
      if (!(mid eq labels)) mid.unpersist()
      labels = next.drop("__changed")
      it += roundsPerCheck
      roundsPerCheck = 2
    }
    val tLoop = System.nanoTime()
    if (!converged)
      log.warn(
        s"$logLabel exited after $it rounds WITHOUT converging " +
          s"(a duplicate chain longer than maxIters=$maxIters); cluster ids are partial")
    // every document: clustered ones get their component min, the rest
    // themselves — materialized so every intermediate can be released
    val result = docs.select(col(idCol).as("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .persist(storage)
    result.count()
    val tCount = System.nanoTime()
    // phase timings at INFO: at scale the split between pair
    // generation, label propagation, and the finalize join is the
    // first thing a regression hunt needs (cf. SCALE.md)
    def ms(a: Long, b: Long): Long = (b - a) / 1000000L
    log.info(s"$logLabel: rounds=$it " +
      s"seedMs=${ms(tPairs, tSeed)} loopMs=${ms(tSeed, tLoop)} " +
      s"resultMs=${ms(tLoop, tCount)} tailMs=${ms(tCount, System.nanoTime())}")
    result
  }

  /** Deterministic clone clusters over the winnowing-fingerprint pair
    * graph: [[graft.text.TextAnalysis.winnowCandidatePairs]] at
    * `minShared` match strength, collapsed by the same min-label CC
    * engine as the MinHash path. Where q40's clusters are
    * "probably-similar whole documents", these are "provably share a
    * token run of >= w+k-1 words, >= minShared times" — the shape that
    * catches templated/boilerplate families and partial clones.
    * Returns (doc_id, cluster_id) for EVERY document.
    */
  def winnowClusters(
      docs: DataFrame,
      minShared: Int = 2,
      k: Int = 3,
      w: Int = 4,
      maxDf: Int = 50,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxIters: Int = 20
  ): DataFrame = {
    val matPairs = graft.text.TextAnalysis
      .winnowCandidatePairs(docs, k, w, maxDf, textCol, idCol, releaseOnMaterialize = true)
    val pairs = matPairs
      .filter(col("n_shared") >= minShared)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
    val out = clusterFromPairs(docs, pairs, idCol, maxIters, "winnowClusters")
    matPairs.unpersist()
    out
  }

  /** The winnow-deduplicated corpus: one representative (the min-id
    * member == cluster_id by construction) per clone cluster — the
    * rolling-hash twin of [[fuzzyDedupCorpus]], same keep-set
    * semi-join shape.
    */
  def winnowDedupCorpus(
      docs: DataFrame,
      minShared: Int = 2,
      k: Int = 3,
      w: Int = 4,
      maxDf: Int = 50,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val clusters = winnowClusters(docs, minShared, k, w, maxDf, textCol, idCol)
    val keep = clusters.filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id").as(idCol))
      .localCheckpoint(true)
    clusters.unpersist()
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Pre-scatter for CPU-bound per-row stages (signatures, decode).
    * Semantics: `Some(n)` ALWAYS repartitions to n (explicit caller
    * intent — force a fan-out or bound per-task memory); `Some(0)`
    * keeps the input layout unconditionally; `None` scatters to
    * `default` cores unless the scan already has >= that many FILES —
    * a driver-metadata heuristic (inputFiles forces no physical
    * planning) that avoids shuffling an already well-split corpus but
    * can under-scatter when many small files bin-pack into few
    * partitions (pass Some(n) then). Non-file inputs report zero
    * files and scatter conservatively.
    */
  private[graft] def scatterForCpuStage(df: DataFrame, parallelism: Option[Int],
                                        default: Int): DataFrame = parallelism match {
    case Some(0) => df
    case Some(n) => df.repartition(n)
    // the shared gate (graft.operators.Scatter): file-count check,
    // already-scattered top-chain check, and the size-bound width —
    // ceil(scanBytes / targetPartitionBytes) capped at `default` —
    // all audited in one place
    case None => graft.operators.Scatter.cpuTo(df, default)
  }

  /** Persistable LSH signature index of a corpus: `(idCol, n_sh,
    * bands)` — the rows an incremental dedup pipeline stores in a
    * table (band hashes: 8 longs/doc; shingle COUNT for the size-ratio
    * prune) so that each incoming batch joins against the index
    * instead of re-reading, re-shingling, and re-hashing the corpus.
    * Same expression chain as [[nearDuplicates]]' in-query signatures,
    * so an index built at (shingleN, k, bands) reproduces its candidate
    * structure exactly.
    */
  def signatureIndex(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 5,
      k: Int = 32,
      bands: Int = 8,
      parallelism: Option[Int] = None
  ): DataFrame = {
    require(k % bands == 0,
      s"k must be divisible by bands (k=$k, bands=$bands): the native band kernel derives its band count as k/r")
    val r = k / bands
    val sc = docs.sparkSession.sparkContext
    scatterForCpuStage(docs, parallelism, sc.defaultParallelism)
      .withColumn("sh", expr(s"graft_shingle_hashes($textCol, $shingleN)"))
      .withColumn("mh", expr(s"graft_minhash_hashed(sh, $k)"))
      .select(
        col(idCol), size(col("sh")).as("n_sh"),
        expr(s"graft_lsh_bands(mh, $r)").as("bands"))
  }

  /** Near-duplicates of an incoming batch AGAINST an existing corpus,
    * via a pre-built [[signatureIndex]] — incremental dedup, the shape
    * a 100 TB ingest actually runs: the corpus is never re-shingled.
    * Per batch the work is (1) signatures for the BATCH only, (2) a
    * band-bucket equi-join batch-sigs x index (maxBucket caps hot
    * boilerplate buckets on the corpus side, as in [[nearDuplicates]]),
    * (3) size-ratio prune on the two stored counts — BEFORE any text is
    * fetched, (4) exact Jaccard verification that re-shingles ONLY the
    * corpus docs that survived as candidates (a semi-join fetch, cost
    * proportional to candidates, not corpus). Returns
    * `(idCol, dup_of, jaccard)`: batch docs with a corpus near-dup at
    * `threshold`, one row per matching corpus doc.
    *
    * `batch` and the index must use the same (shingleN, k, bands);
    * recall characteristics are exactly [[nearDuplicates]]'.
    */
  def incrementalNearDups(
      batch: DataFrame,
      corpus: DataFrame,
      index: DataFrame,
      threshold: Double,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 5,
      k: Int = 32,
      bands: Int = 8,
      maxBucket: Int = 1000,
      parallelism: Option[Int] = None
  ): DataFrame = {
    require(k % bands == 0,
      s"k must be divisible by bands (k=$k, bands=$bands): the native band kernel derives its band count as k/r")
    val r = k / bands
    val sc = batch.sparkSession.sparkContext
    // batch signatures keep the shingle sets: the batch side of the
    // verify join is this same frame, so shingle ONCE (cached, released
    // on return via releaseOnMaterialize-style eager count)
    val batchBase = scatterForCpuStage(batch, parallelism, sc.defaultParallelism)
      .withColumn("sh", expr(s"graft_shingle_hashes($textCol, $shingleN)"))
      .withColumn("mh", expr(s"graft_minhash_hashed(sh, $k)"))
      .select(
        col(idCol), col("sh"), size(col("sh")).as("n_sh"),
        expr(s"graft_lsh_bands(mh, $r)").as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batchBase.count()
    val newBuckets = batchBase
      .select(col(idCol).as("new_id"), col("n_sh").as("n_new"),
        posexplode(col("bands")).as(Seq("band", "bucket")))
    val oldBuckets = index
      .select(col(idCol).as("old_id"), col("n_sh").as("n_old"),
        posexplode(col("bands")).as(Seq("band", "bucket")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket").orderBy(col("old_id"))))
      .filter(col("rn") <= maxBucket)
      .drop("rn")
    val cand = newBuckets.join(oldBuckets, Seq("band", "bucket"))
      .filter(least(col("n_new"), col("n_old")).cast("double")
        / greatest(col("n_new"), col("n_old")) >= threshold)
      .select(col("new_id"), col("old_id")).distinct()
    // fetch + re-shingle ONLY candidate corpus docs
    val candOld = cand.select(col("old_id").as(idCol)).distinct()
    // scatter the candidate fetch BEFORE re-shingling: the semi-join
    // keeps the corpus scan's layout (broadcast, no exchange), so on a
    // single-file corpus the shingle kernel would run one-task
    val oldSh = scatterForCpuStage(
        corpus.join(candOld, Seq(idCol), "left_semi"), parallelism,
        sc.defaultParallelism)
      .select(col(idCol).as("old_id"),
        expr(s"graft_shingle_hashes($textCol, $shingleN)").as("sh_b"))
    // eager localCheckpoint, not persist: the result is often reduced
    // and dropped by the caller (q57 keeps only the id set), and a
    // persist they never saw would pin a CacheManager entry for the
    // session's life — checkpoint blocks die with the returned frame.
    // (Local checkpoints are executor-resident: on a cluster where
    // executor loss must be survivable — dynamic allocation, spot
    // nodes — set a checkpoint dir and swap for reliable checkpoint()
    // at this call site, as with the CC loop's round checkpoints.)
    val out = cand
      .join(batchBase.select(col(idCol).as("new_id"), col("sh").as("sh_a")), "new_id")
      .join(oldSh, "old_id")
      .withColumn("jaccard", expr("graft_jaccard_sorted(sh_a, sh_b)"))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id").as(idCol), col("old_id").as("dup_of"), col("jaccard"))
      .localCheckpoint(true)
    batchBase.unpersist()
    out
  }
}
