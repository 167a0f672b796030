package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed-at-scale workloads.
  *
  * AQE's skew-join split (on by default in SessionFactory) handles
  * most skew by splitting oversized sort-merge partitions, but it only
  * fires on shuffle joins and only per-partition. `saltedJoin` is the
  * explicit alternative for catastrophic single-key skew (the "null
  * key" / "default id" hot row problem): it fans the small side out
  * `salt` ways so the hot key's rows spread over `salt` reducers
  * instead of one.
  */
object Joins {

  /** Equi-join `big ⋈ small` on `key`, salted `salt` ways.
    *
    * The big side gets a uniform pseudo-salt derived from the full row
    * hash (deterministic given the row, uniform across duplicates of
    * the hot key); the small side is exploded `salt` times so every
    * (key, salt) bucket finds its match. Result equals the unsalted
    * join exactly — the salt column never escapes.
    *
    * Cost model: small side is replicated `salt` x (fine for dimension
    * tables), big side shuffles once on (key, salt) with the hot key
    * now spread over `salt` partitions.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val bigCols = big.columns
    val saltedBig = big.withColumn(
      "__graft_salt",
      pmod(hash(bigCols.map(col): _*), lit(salt))
    )
    val saltedSmall = small
      .withColumn("__graft_salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedBig
      .join(saltedSmall, Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }

  /** As-of join (left): for every left row, attach `rightPayload` from
    * the LATEST right row with the same key whose time is <= the left
    * row's time; nulls when no such row exists.
    *
    * Spark has no native as-of join, and the naive formulation
    * (inequality join + per-left-row max) is a range join that
    * degenerates to O(|L|x|R|) per key. This is the union+window
    * formulation instead — the composition of existing operators the
    * engine already optimizes (brief's preference order (a)):
    * tag both sides, union, and take a running `last(ignoreNulls)`
    * of the right payload over (key, time) order. ONE shuffle on the
    * key, no join node at all, cost O((|L|+|R|) log) per key
    * partition; payload rides in a single struct so the matched right
    * row stays atomic (no column-wise mixing when payload fields are
    * null). At equal timestamps the right row sorts first (inclusive
    * <=). Right rows should be unique per (key, time) — pre-dedupe
    * with a deterministic tie-break, as `SparkEntry` q38 does —
    * otherwise which duplicate wins follows the union's internal
    * order.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]
  ): DataFrame = {
    require(rightPayload.nonEmpty, "asOfJoin needs at least one right payload column")
    val lCols = left.columns.toSeq
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = {
      import org.apache.spark.sql.types.{StructField, StructType}
      StructType(rightPayload.map(p => StructField(p, right.schema(p).dataType, nullable = true)))
    }
    val l = left.select(
      col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(payloadType).as("__r") +: lCols.map(col): _*)
    // null-keyed / null-timed right rows can never match under join
    // semantics, but a window PARTITION BY groups nulls together —
    // drop them so a null-keyed left row doesn't pick up their payload.
    // The time filter applies to the CASTED value: a right time that
    // casts to null (e.g. an unparsable string -> timestamp) would
    // survive a pre-cast filter, sort first (nulls-first asc), and
    // attach its payload to every left row of the key as if it
    // occurred at time -infinity.
    val castRightTime = col(rightTime).cast(left.schema(leftTime).dataType)
    val r = right.filter(col(rightKey).isNotNull && castRightTime.isNotNull).select(
      col(rightKey).as("__k") +: castRightTime.as("__t") +:
        lit(0).as("__side") +: payloadStruct.as("__r") +:
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__k").orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++ rightPayload.map(p => col(s"__r.$p").as(p)): _*)
  }

  /** Interval-containment join at scale: every `points` row whose
    * `tsCol` falls inside a `intervals` row's CLOSED
    * [`startCol`, `endCol`] window, as an inner join — WITHOUT the
    * nested-loop plan Catalyst picks for a bare inequality join
    * (BroadcastNestedLoop / cartesian: O(|P|x|I|), a scale-killer).
    *
    * The bucketization trick: intervals explode over the time buckets
    * they cover (`sequence(date_trunc(g, start), date_trunc(g, end))`),
    * points map to their single containing bucket, and the join
    * becomes an EQUI-join on the bucket with the true containment
    * predicate as a pushed join residual. Each point's bucket is
    * unique, so a (point, interval) match appears exactly once — no
    * post-join dedup.
    *
    * Cost model: interval replication = duration/granularity + 1, so
    * pick `granularity` near the TYPICAL interval length; parallelism
    * is the distinct-bucket count, so a corpus spanning years at
    * 'hour' granularity shuffles into tens of thousands of buckets.
    * Within one bucket the work is events-in-bucket x
    * intervals-touching-bucket — inherent to the join's selectivity;
    * an hour with pathological traffic is exactly what AQE's skew
    * split (on in SessionFactory) subdivides, since this IS a plain
    * shuffle equi-join.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      granularity: String = "hour"
  ): DataFrame = {
    require(Set("minute", "hour", "day").contains(granularity),
      s"granularity must be minute|hour|day, got $granularity")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty, s"point/interval column names must be disjoint, both have: ${clash.mkString(",")}")
    val b = "__graft_bucket"
    val ip = intervals.withColumn(b, explode(expr(
      s"sequence(date_trunc('$granularity', $startCol), date_trunc('$granularity', $endCol), interval 1 $granularity)")))
    val pp = points.withColumn(b, date_trunc(granularity, col(tsCol)))
    pp.join(ip, pp(b) === ip(b) && col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop(b)
  }
}
