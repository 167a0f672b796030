package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sampling.Sampling

/** Benchmark decontamination: remove corpus documents that share any
  * word n-gram with a held-out benchmark set — the standard guard
  * against evaluation contamination in training-data pipelines (a
  * training document containing a benchmark question's 5-gram leaks
  * the answer).
  *
  * Scale shape: the benchmark side is distinct-deduped and BROADCAST —
  * evaluation suites are megabytes against a 100 TB corpus, so the
  * semi-join runs map-side and the corpus never shuffles; only the
  * (small) contaminated-id set moves, and the final anti-join
  * broadcasts it back. N-grams join as exact strings (not hashes) so
  * a hash collision can never silently drop a clean document, and the
  * whole decision is oracle-checkable cross-engine.
  */
object Contamination {

  /** Distinct word `n`-grams of `textCol` as an array column; the
    * `transform(array(toks), ts -> ...)[0]` wrapper is the let-binding
    * that keeps the tokenizer from being inlined (and re-evaluated)
    * into the gram lambda.
    */
  def wordGramsSql(textCol: String, n: Int): String =
    s"""transform(array(${TextAnalysis.wordTokensSql(textCol)}), ts ->
       |  CASE WHEN size(ts) >= $n
       |  THEN array_distinct(transform(sequence(1, size(ts) - ${n - 1}),
       |         i -> concat_ws(' ', slice(ts, i, $n))))
       |  ELSE slice(ts, 1, 0) END)[0]""".stripMargin

  /** The decontaminated corpus: every document outside the benchmark
    * bucket range that shares NO word `n`-gram with any benchmark
    * document. The benchmark set is defined deterministically by the
    * portable id-hash bucket (`Sampling.portableBucket`), standing in
    * for an external eval-suite table — swap `bench` for a real
    * benchmark DataFrame in production use.
    */
  def decontaminate(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 5,
      benchBuckets: Int = 50,
      buckets: Int = 1000
  ): DataFrame = {
    val bucket = Sampling.portableBucket(idCol, buckets)
    val bench = benchGrams(docs, textCol, idCol, n, benchBuckets, buckets)
    // scatter the corpus side BEFORE the gram explode (guide §2.5): on
    // a single-file corpus the tokenizer + explode + broadcast semi-
    // join would run in the scan's one task. Done here, not in
    // dropContaminated — q57 feeds that an already-parallel
    // checkpointed frame whose layout the scan-file gate cannot see.
    dropContaminated(graft.operators.Scatter.cpu(docs.filter(bucket >= benchBuckets)),
      bench, textCol, idCol, n)
  }

  /** The benchmark gram set: distinct word `n`-grams of the docs whose
    * id-hash bucket falls in the benchmark range — shared by both
    * decontamination variants and the incremental-curation pipeline so
    * the (n, bucket-split) constants live in ONE place.
    */
  def benchGrams(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 5,
      benchBuckets: Int = 50,
      buckets: Int = 1000
  ): DataFrame =
    // scatter before the gram explode (guide §2.5): the interpreted
    // transform/concat_ws gram kernel over a single-file bench bucket
    // otherwise runs one-task; distinct is partition-order-free
    graft.operators.Scatter.cpu(
        docs.filter(Sampling.portableBucket(idCol, buckets) < benchBuckets))
      .select(explode(expr(wordGramsSql(textCol, n))).as("gram")).distinct()

  /** The decontamination join itself: drop every `frame` row sharing a
    * word `n`-gram with the (single-column `gram`) benchmark set — the
    * primitive [[decontaminate]] and the incremental-curation pipeline
    * (q57) share, so the join strategy lives in ONE place.
    */
  def dropContaminated(
      frame: DataFrame,
      bench: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 5
  ): DataFrame = {
    val grams = expr(wordGramsSql(textCol, n))
    val dirty = frame.select(col(idCol), explode(grams).as("gram"))
      .join(broadcast(bench), Seq("gram"), "left_semi")
      .select(col(idCol)).distinct()
    frame.join(broadcast(dirty), Seq(idCol), "left_anti")
  }

  /** [[decontaminate]] with a bloom-filter pre-filter — the 100 TB
    * variant. The exact path broadcasts every benchmark gram as a
    * string (~40 B/gram: a multi-GB broadcast for a full eval-suite
    * union); here the benchmark grams are reduced to a mergeable bloom
    * sketch (`graft_bloom_agg`, ~1.2 B/gram at fpp=0.01 — a ~30x
    * smaller ship), the corpus probes it map-side in codegen
    * (`graft_bloom_contains`), and only the surviving grams — true
    * matches plus the fpp sliver — proceed to the exact semi-join.
    * That exact join now SHUFFLES the benchmark grams instead of
    * broadcasting them, but its probe side is no longer the corpus's
    * whole gram explosion, just the survivors. Bloom false positives
    * are eliminated by the exact join; false negatives don't exist —
    * so the result EQUALS [[decontaminate]] bit for bit (spec-pinned,
    * and q54's oracle is the same SQL as q41's).
    */
  def decontaminateBloom(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 5,
      benchBuckets: Int = 50,
      buckets: Int = 1000,
      fpp: Double = 0.01
  ): DataFrame = {
    val grams = expr(wordGramsSql(textCol, n))
    val bucket = Sampling.portableBucket(idCol, buckets)
    // cached: the benchmark gram set is consumed three times (sizing
    // count, sketch build, exact verify join) and the tokenize+shingle
    // pass over the benchmark slice must not run per consumer
    val bench = benchGrams(docs, textCol, idCol, n, benchBuckets, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = docs.filter(bucket >= benchBuckets)
    // one pass builds the sketch; sizing from a cheap count of the
    // (distinct) benchmark grams — driver round-trip is one long
    val nGrams = math.max(bench.count(), 1L)
    val bloomBytes = bench
      .select(expr(s"graft_bloom_agg(gram, ${nGrams}L, $fpp)"))
      .head().getAs[Array[Byte]](0)
    val candidates = corpus.select(col(idCol), explode(grams).as("gram"))
      .filter(call_function("graft_bloom_contains", lit(bloomBytes), col("gram")))
    // dirty is materialized eagerly (localCheckpoint) so the bench
    // cache can be released before return. A persist() here would leak:
    // the frame is internal, so the caller could never unpersist it and
    // one cached entry would pin per call for the session's life. The
    // checkpoint's blocks instead die with the RETURNED frame — once
    // the caller drops it, the ContextCleaner reclaims them.
    val dirty = candidates
      .join(bench, Seq("gram"), "left_semi") // exact: kills the fpp sliver
      .select(col(idCol)).distinct()
      .localCheckpoint(true)
    bench.unpersist()
    corpus.join(broadcast(dirty), Seq(idCol), "left_anti")
  }
}
