package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for corpus subsetting.
  *
  * Training-data pipelines need samples that are (a) reproducible
  * across re-runs and engines (no RNG state, no partition-order
  * dependence — `df.sample` gives neither), (b) stable under appends
  * (a document's membership never changes as the corpus grows), and
  * (c) pushdown-friendly (a scalar predicate on the scan, no shuffle,
  * no extra pass). Hashing a stable id into a fixed bucket space and
  * keeping buckets below a cut gives all three: the filter evaluates
  * inside the scan stage and composes with column pruning.
  *
  * The portable flavor uses the first 60 bits of md5 over the id
  * rendered as a string — bit-identical in DuckDB
  * (`CAST('0x'||substr(md5(CAST(id AS VARCHAR)),1,15) AS BIGINT)`,
  * same trick as the q12/q14 signatures), so sampling decisions are
  * oracle-checkable row-for-row. Production pipelines that don't need
  * cross-engine parity can swap `xxhash64` in for ~10x cheaper hashing
  * with the same properties.
  */
object Sampling {

  val DefaultBuckets = 10000

  /** Portable deterministic bucket in [0, buckets). */
  /** Raw 60-bit portable id hash — the ONE construction every sampler
    * (and the DuckDB oracles) derive from; change it here or nowhere.
    */
  def portableHash(idCol: String): Column =
    expr(s"CAST(conv(substr(md5(CAST($idCol AS STRING)), 1, 15), 16, 10) AS BIGINT)")

  def portableBucket(idCol: String, buckets: Int = DefaultBuckets): Column =
    pmod(portableHash(idCol), lit(buckets.toLong))

  /** Uniform sample: keep ids whose bucket falls below
    * round(fraction * buckets). The realized rate is exact over the
    * bucket space (quantized to 1/buckets), not a per-row coin flip.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 buckets: Int = DefaultBuckets): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1], got $fraction")
    df.filter(portableBucket(idCol, buckets) < lit(math.round(fraction * buckets)))
  }

  /** Balance the corpus to equal per-stratum volume: every stratum is
    * deterministically downsampled to (approximately — quantized by
    * the bucket space) the RAREST stratum's count. This is the
    * mixture-proportioning pass of a training-data pipeline ("don't
    * let the dominant source drown the rare ones"); for explicit
    * target weights use [[stratifiedSample]] with per-stratum
    * fractions.
    *
    * Scale shape: per-stratum counts are one partial-aggregated
    * shuffle over O(strata) keys; the min is an O(strata) driver
    * round-trip (same precedent as the date-dim bounds); thresholds
    * join back as a BROADCAST, and membership stays a scalar
    * predicate over the portable bucket — no second pass over the
    * corpus, no RNG, bit-reproducible cross-engine. The threshold is
    * computed in integer arithmetic ((min * buckets) div count) so
    * both engines derive the identical cut.
    */
  def mixtureBalance(df: DataFrame, strataCol: String, idCol: String = "doc_id",
                     buckets: Int = 1000000): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__c"))
    val minRow = counts.agg(min(col("__c"))).head()
    // empty input: min over zero strata is null — the balanced corpus
    // is the (empty) input, not a driver NPE
    if (minRow.isNullAt(0)) return df
    val minC = minRow.getLong(0)
    val thr = counts.select(col(strataCol),
      expr(s"(${minC}L * $buckets) div __c").as("__thr"))
    df.join(broadcast(thr), Seq(strataCol))
      .filter(portableBucket(idCol, buckets) < col("__thr"))
      .drop("__thr")
  }

  /** Stratified sample: per-stratum keep rates (fraction by value of
    * `strataCol`, `defaultFraction` otherwise) — the "downsample the
    * dominant language / upweight the rare one" rebalancing pass.
    * Still one scalar predicate on the scan: the per-stratum cut is a
    * CASE over `strataCol`, so no join, no shuffle, no second pass.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       fractions: Map[String, Double], defaultFraction: Double = 0.0,
                       buckets: Int = DefaultBuckets): DataFrame = {
    require((fractions.values.toSeq :+ defaultFraction).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0,1]")
    val cut = fractions.toSeq.sortBy(_._1).foldLeft(lit(math.round(defaultFraction * buckets))) {
      case (acc, (value, fraction)) =>
        when(col(strataCol) === lit(value), lit(math.round(fraction * buckets))).otherwise(acc)
    }
    df.filter(portableBucket(idCol, buckets) < cut)
  }

  /** Token-budget mixture sampling: admit documents per stratum, in
    * deterministic portable-hash order, until each stratum's TOKEN
    * budget fills — the production data-mixing contract ("this run
    * gets 20k tokens of each source"), where [[mixtureBalance]] and
    * [[stratifiedSample]] speak document fractions. A document is
    * admitted iff the budget was not yet exhausted BEFORE it (the
    * boundary document overshoots rather than truncates — sampling
    * keeps whole documents; trimming is `Packing.chunk`'s job).
    *
    * Determinism: admission order is (60-bit md5 of id, id) — a total
    * order both engines compute identically, making the selected SET
    * exactly reproducible (and oracle-checkable) with no RNG.
    *
    * Scale shape: ONE projection computes the token count (shared
    * tokenizer) and the hash; one shuffle partitions by stratum for
    * the running-sum window; the admission test is a scalar predicate
    * on the window output. Skew note: a single giant stratum
    * serializes its window on one task — at 100 TB pre-filter with
    * [[hashSample]] to a generous superset first (the admission
    * prefix only needs the documents whose hash rank can possibly fit
    * the budget).
    */
  /** 52-bit portable id hash: the first 13 hex chars of md5. Two
    * properties make this the ranking key for [[exactKPerStratum]]:
    * it is bit-identical cross-engine (same md5-prefix trick as
    * [[portableHash]]), and — unlike the 60-bit flavor — every value
    * is below 2^53, so `CAST(... AS DOUBLE)` is EXACT and a
    * Double-scored aggregate ranks by the identical total order a
    * BIGINT-ordered SQL oracle computes. Collisions in a 2^52 space
    * are vanishingly rare and harmless regardless: ties break by id,
    * deterministically, in both engines.
    */
  def portableHash52Sql(idCol: String): String =
    s"CAST(conv(substr(md5(CAST($idCol AS STRING)), 1, 13), 16, 10) AS BIGINT)"

  /** Exactly-k-per-stratum sample: the k documents with the SMALLEST
    * portable hash in each stratum (classic bottom-k), with their
    * 1-based `sample_rank` appended — "cut me exactly 1000 eval docs
    * per language, reproducibly". Complements the fraction samplers:
    * [[hashSample]]/[[stratifiedSample]] fix the RATE (membership is
    * append-stable, size drifts with the corpus); bottom-k fixes the
    * SIZE (k exactly, but appends may evict the largest-hash member —
    * that instability is inherent to any fixed-size sample).
    *
    * Scale shape — this is deliberately NOT
    * `row_number().over(partitionBy(stratum))`: with a handful of
    * strata the window shuffles the ENTIRE corpus into |strata| tasks
    * and sorts it there, no matter how big the cluster. The bounded
    * graft_topk aggregate (q10's kernel, score = -hash so "top"
    * means smallest) reduces every input partition to <= k rows per
    * stratum map-side, the exchange carries <= strata x partitions x k
    * heap entries, and the final merge is O(k) per stratum. The keep
    * set (strata x k ids) is tiny by construction, so membership
    * rejoins the corpus as a BROADCAST hash join — the corpus itself
    * never shuffles at all.
    */
  def exactKPerStratum(df: DataFrame, strataCol: String, k: Int,
                       idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // graft_topk carries the id as a BIGINT: a non-integral id would
    // CAST to null and be SILENTLY skipped by the aggregate — refuse
    // loudly instead (hash/assign numeric ids upstream). Ids must also
    // be unique: a duplicated kept id would fan out in the membership
    // join (the sampling family's standing doc_id assumption).
    require({
      import org.apache.spark.sql.types._
      Set[DataType](LongType, IntegerType, ShortType, ByteType)
        .contains(df.schema(idCol).dataType)
    }, s"exactKPerStratum needs an integral id column, got " +
        s"${df.schema(idCol).dataType.simpleString} for '$idCol'")
    // NULL ids are EXCLUDED, explicitly: a null id hashes to null
    // (skipped by graft_topk) and can never match the membership
    // equi-join anyway — the filter makes that semantics declared
    // rather than incidental, so the SQL-oracle form is simply
    // `WHERE id IS NOT NULL` instead of engine-specific null-rank
    // conventions. (A validating `require` here would cost a full
    // corpus action per call; the sampling family's doc_id contract
    // already promises unique non-null ids.)
    val nn = df.filter(col(idCol).isNotNull)
    val keep = nn
      .groupBy(col(strataCol))
      .agg(expr(s"graft_topk(-CAST(${portableHash52Sql(idCol)} AS DOUBLE), " +
          s"CAST($idCol AS BIGINT), 0, $k)").as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("__e.id1").as("__kid"),
        (col("__pos") + 1).cast("int").as("sample_rank"))
    nn.join(broadcast(keep), col(idCol).cast("long") === col("__kid"))
      .drop("__kid")
  }

  def tokenBudgetSample(df: DataFrame, strataCol: String, budget: Long,
                        textCol: String = "text",
                        idCol: String = "doc_id",
                        // None = whitespace word tokens; Some(c) =
                        // caller-supplied count (e.g. graft_bpe_count —
                        // crawl budgets are BPE-denominated)
                        tokenCount: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(portableHash(idCol).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // every input column survives (the family contract — hashSample/
    // mixtureBalance/stratifiedSample all return filtered input rows);
    // n_tokens and cum_tokens append so the consumer sees what each
    // admitted document cost against the budget
    df.withColumn("n_tokens",
        tokenCount.getOrElse(
          expr(s"CAST(size(${graft.text.TextAnalysis.wordTokensSql(textCol)}) AS BIGINT)")))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < lit(budget))
  }
}
