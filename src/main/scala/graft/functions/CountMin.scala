package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Portable Count-Min sketch (Cormode & Muthukrishnan 2005): the
  * frequency-estimation sibling of [[HyperLogLog]] — "how often does
  * this token/key occur" over a stream too large to count exactly,
  * with a one-sided error bound (estimates only ever OVERCOUNT, by at
  * most εN with probability 1-δ; depth 4 × width 1024 gives
  * ε = e/1024 ≈ 0.27%, δ = e^-4 ≈ 1.8%).
  *
  * Portability: row d's hash of key k is the 60-bit md5 of "d:k" —
  * string concat + md5, identical in DuckDB, so sketch counts AND
  * estimates replay hash-exact cross-engine. Everything is integer
  * arithmetic (bucket sums, min over rows) — no parity caveats at all,
  * unlike HLL's one fixed-shape double division.
  *
  * Mergeability: the sketch is a (row, bucket) -> count relation and
  * merges by ADDING counts on the key — partial aggregation IS the
  * merge, and persisted sketches from separate batches combine the
  * same way (the q102 pattern applies verbatim).
  *
  * Scale shape (100 TB): the token explosion map-side combines into at
  * most depth × width = 4096 cells per partition, so the shuffle
  * carries O(4096) rows per partition regardless of corpus size; the
  * estimate probe joins queries against the 4096-row sketch —
  * broadcast, no shuffle of the corpus.
  *
  * Reference scope: the reference has exact counts only
  * (AggregationJob.scala); sketches are extension surface.
  */
object CountMin {

  val Depth: Int = 4
  val Width: Int = 1024

  /** Row-`d` bucket of the key column — `md5("d:" || key) % width`,
    * engine-identical by construction.
    */
  def bucketSql(keySql: String, d: Int): String =
    s"pmod(CAST(conv(substr(md5(concat('$d:', $keySql)), 1, 15), 16, 10) AS BIGINT), $Width)"

  /** The sketch relation `(row, bucket, cnt)` over one occurrence per
    * input row of `keySql` (pre-aggregate upstream to weight). At most
    * Depth x Width rows come out regardless of input size.
    */
  def sketch(df: DataFrame, keySql: String): DataFrame =
    // NULL keys contribute nothing (a null would otherwise produce
    // four null-bucket cells — not a countable key in any engine)
    df.filter(expr(s"($keySql) IS NOT NULL"))
      .select(posexplode(array((0 until Depth).map(d =>
        expr(bucketSql(keySql, d))): _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate each distinct key in `queries(keyCol)` against the
    * sketch: min over the Depth row counts — the classic CM estimate,
    * >= the true count always. `queries` should be small (the probe
    * set); the join broadcasts the 4096-row sketch side.
    *
    * LEFT join + coalesce(0), not inner: the sketch relation only
    * materializes cells with cnt > 0, so a probe key absent from the
    * sketched corpus has empty cells — the empty cell must WIN the min
    * (estimate 0), not be dropped (which would inflate the min over
    * the occupied cells, or silently omit the key when all four cells
    * are empty). Every probe key gets exactly one output row.
    */
  def estimate(sk: DataFrame, queries: DataFrame, keyCol: String): DataFrame = {
    val probes = queries.select(col(keyCol))
      .distinct()
      .select(col(keyCol), posexplode(array((0 until Depth).map(d =>
        expr(bucketSql(keyCol, d))): _*)).as(Seq("row", "bucket")))
    probes.join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }
}
