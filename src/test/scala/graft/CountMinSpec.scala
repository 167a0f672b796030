package graft

import graft.functions.CountMin
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1 to 300).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i")).toDF("k")

  test("estimates never undercount (one-sided CM error)") {
    val rows = corpus
    val sk = CountMin.sketch(rows, "k")
    val exact = rows.groupBy(col("k")).agg(count(lit(1)).as("exact_cnt"))
    val joined = CountMin.estimate(sk, exact, "k")
      .join(exact, Seq("k")).collect()
    assert(joined.length === 300)
    joined.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_cnt"),
        s"undercount for ${r.getString(0)}")
    }
    // at 300 keys over 4x1024 cells, most estimates should be EXACT
    val exactHits = joined.count(r => r.getAs[Long]("cms_estimate") === r.getAs[Long]("exact_cnt"))
    assert(exactHits > 250, s"only $exactHits/300 exact at this load factor")
  }

  test("absent probe keys estimate 0 and are never dropped") {
    val sk = CountMin.sketch(corpus, "k")
    val probes = Seq("k1", "never-seen-a", "never-seen-b").toDF("k")
    val est = CountMin.estimate(sk, probes, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every probe key yields exactly one row
    assert(est.keySet === Set("k1", "never-seen-a", "never-seen-b"))
    // an empty cell wins the min: absent keys estimate 0 (unless all 4
    // of their cells collide with occupied ones — impossible here at
    // 300 keys over 4096 cells for BOTH planted strangers to lose all
    // four, so assert at least the exact-0 behavior holds for them)
    assert(est("never-seen-a") === 0L)
    assert(est("never-seen-b") === 0L)
    assert(est("k1") >= 1L)
  }

  test("sketches merge by adding cell counts") {
    val rows = corpus.withColumn("half", (substring(col("k"), 2, 10).cast("int") % 2))
    def cells(df: org.apache.spark.sql.DataFrame) =
      CountMin.sketch(df, "k")
    val whole = cells(rows).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val merged = cells(rows.filter(col("half") === 0))
      .unionByName(cells(rows.filter(col("half") === 1)))
      .groupBy(col("row"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === whole)
  }

  test("the sketch relation is bounded by depth x width whatever the input") {
    val big = spark.range(0, 50000).selectExpr("CAST(id % 9000 AS STRING) AS k")
    val n = CountMin.sketch(big, "k").count()
    assert(n <= CountMin.Depth.toLong * CountMin.Width)
  }
}
