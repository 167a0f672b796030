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
}
