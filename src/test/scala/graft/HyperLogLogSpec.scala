package graft

import graft.functions.HyperLogLog
import org.apache.spark.sql.functions._

class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  test("rho CASE chain equals the leading-zeros reference on edges and random windows") {
    val edge = Seq(0L, 1L, 2L, 3L, (1L << 49) - 1, 1L << 49, (1L << 50) - 1)
    val rnd = new scala.util.Random(7)
    val ws = edge ++ Seq.fill(200)(rnd.nextLong() & HyperLogLog.WindowMask)
    def ref(w: Long): Int = if (w == 0L) 51 else 51 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    val got = ws.toDF("w")
      .select(col("w"), expr(HyperLogLog.rhoCaseSql("w")).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ws.foreach(w => assert(got(w) === ref(w), s"w=$w"))
  }

  test("register frames merge: halves max-merged equal the whole-corpus sketch") {
    val df = (1 to 5000).map(i => ("g", s"v$i")).toDF("grp", "v").repartition(7)
    def regs(d: org.apache.spark.sql.DataFrame) =
      HyperLogLog.registers(d, "v", Seq("grp"))
    val whole = regs(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val merged = regs(df.filter(substring(col("v"), 2, 10).cast("int") <= 2500))
      .union(regs(df.filter(substring(col("v"), 2, 10).cast("int") > 2500)))
      .groupBy(col("grp"), col("reg")).agg(max(col("m")).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(merged === whole)
  }

  test("estimate lands within the m=1024 error envelope on 5000 distinct values") {
    val df = (1 to 5000).map(i => ("g", s"v$i")).toDF("grp", "v")
    val est = HyperLogLog.estimate(df, "v", Seq("grp")).collect().head
      .getAs[Double]("hll_estimate")
    // stderr at m=1024 is 1.04/sqrt(1024) ~ 3.25%; the fixture is
    // deterministic, so this pins the actual error, generously at ~2.5x
    assert(math.abs(est - 5000.0) / 5000.0 < 0.08, s"estimate $est too far from 5000")
  }

  test("duplicate values do not move the sketch (distinct semantics)") {
    val once = (1 to 800).map(i => ("g", s"v$i")).toDF("grp", "v")
    val tripled = (once.unionAll(once).unionAll(once))
    val a = HyperLogLog.estimate(once, "v", Seq("grp")).collect().head.getAs[Double]("hll_estimate")
    val b = HyperLogLog.estimate(tripled, "v", Seq("grp")).collect().head.getAs[Double]("hll_estimate")
    assert(a === b)
  }
}
