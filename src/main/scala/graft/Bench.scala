package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Median-of-N benchmark. Single-run timings at sf0.1/local[32] swing
    * ±50% per query (GC, codegen compilation, page cache), which made
    * round-2's q13 "regression" unactionable; running each query
    * `SPARK_GRAFT_RUNS` times (default 3) and reporting the median kills
    * that ambiguity. The headline "queries" map is the per-query median;
    * "queries_min" (best case, closest to a warmed steady state) is
    * emitted alongside for plan-cost comparisons.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/scheduler so the first timed query doesn't absorb
    // first-job overhead (codegen compiler init, scheduler spin-up)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val timings = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) => name -> Seq.fill(runs)(timeOnce(fn)) }
    val med = timings.map { case (k, v) => k -> median(v) }
    val mins = timings.map { case (k, v) => k -> v.min }
    def fmt(m: Iterable[(String, Double)]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (med.nonEmpty) med.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${fmt(med)},"queries_min":${fmt(mins)},"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
