package graft

import org.apache.spark.sql.SparkSession

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

    def time(label: String, reps: Int = 10)(f: Int => Unit): Unit = {
      f(-1); f(-2) // warm
      val t0 = System.nanoTime()
      (0 until reps).foreach(f)
      println(f"[scratch] $label%-52s ${(System.nanoTime() - t0) / 1e9 / reps}%6.3f s/op")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    val tiny1 = spark.range(1000).selectExpr("id", "id * 3 as v").coalesce(1)
      .persist(); tiny1.count()

    time("count cached")(_ => tiny1.count())
    time("noop write")(_ => tiny1.write.format("noop").mode("overwrite").save())
    time("parquet write")(i => tiny1.write.mode("overwrite").parquet(s"$dir/p_$i"))
    time("csv write")(i => tiny1.write.mode("overwrite").csv(s"$dir/c_$i"))
    spark.sessionState.conf.setConfString("mapreduce.fileoutputcommitter.algorithm.version", "2")
    time("parquet write v2 committer")(i => tiny1.write.mode("overwrite").parquet(s"$dir/v2_$i"))
    spark.sessionState.conf.setConfString("spark.sql.parquet.compression.codec", "uncompressed")
    time("parquet write uncompressed")(i => tiny1.write.mode("overwrite").parquet(s"$dir/u_$i"))
    spark.sessionState.conf.setConfString("spark.sql.parquet.compression.codec", "zstd")
    time("parquet write zstd")(i => tiny1.write.mode("overwrite").parquet(s"$dir/z_$i"))
    spark.sessionState.conf.setConfString("spark.sql.parquet.compression.codec", "lz4")
    time("parquet write lz4")(i => tiny1.write.mode("overwrite").parquet(s"$dir/l_$i"))
    spark.sessionState.conf.setConfString("spark.sql.parquet.compression.codec", "snappy")
    // larger frame: does the codec-init delta persist at real sizes?
    val big = spark.range(2000000).selectExpr("id", "id * 3 as v", "cast(id % 1000 as string) as s")
      .coalesce(4).persist(); big.count()
    time("parquet write 2M rows snappy", reps = 5)(i => big.write.mode("overwrite").parquet(s"$dir/bs_$i"))
    spark.sessionState.conf.setConfString("spark.sql.parquet.compression.codec", "zstd")
    time("parquet write 2M rows zstd", reps = 5)(i => big.write.mode("overwrite").parquet(s"$dir/bz_$i"))
  }
}
