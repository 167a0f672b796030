package graft

/** Smoke runner mirroring the driver's t1 gate: SparkEntry.entry on
  * sf0.001 must return > 0 rows.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SessionFactory.build("graft-smoke")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = ${df.count()}")
    spark.stop()
  }
}
