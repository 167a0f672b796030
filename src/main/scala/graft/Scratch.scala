package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for optimization experiments (guide
  * §1: isolate the computation with the noop sink). Not part of any
  * query path.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String, reps: Int = 5)(f: Int => Unit): Unit = {
      f(-1) // warm
      val t0 = System.nanoTime()
      (0 until reps).foreach(f)
      println(f"[scratch] $label%-46s ${(System.nanoTime() - t0) / 1e9 / reps}%6.3f s/op")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    val tiny1 = spark.range(1000).selectExpr("id", "id * 3 as v").coalesce(1)
      .persist(); tiny1.count()
    val tiny32 = spark.range(1000).selectExpr("id", "id * 3 as v").repartition(32)
      .persist(); tiny32.count()

    time("write tiny df 1 cached partition") { i =>
      tiny1.write.mode("overwrite").parquet(s"$dir/w1_$i") }
    time("write tiny df 32 cached partitions") { i =>
      tiny32.write.mode("overwrite").parquet(s"$dir/w32_$i") }

    val io = graft.io.TableIO(spark, java.nio.file.Files.createTempDirectory("graft-scw").toString)
    graft.io.Timers.reset()
    time("io.append tiny 1-part", reps = 10) { i => io.append(tiny1, "default.t1") }
    time("io.append tiny 32-part", reps = 10) { i => io.append(tiny32, "default.t32") }
    graft.io.Timers.snapshot().foreach { case (l, s, n) => println(f"[scratch] timer $l%-24s $s%7.3f s n=$n") }
  }
}
