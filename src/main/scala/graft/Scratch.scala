package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for optimization experiments (guide
  * §1: isolate the computation with the noop sink). Not part of any
  * query path.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Unit): Unit = {
      // two runs: cold (codegen compile) + warm
      val t0 = System.nanoTime(); f; val t1 = System.nanoTime(); f; val t2 = System.nanoTime()
      println(f"[scratch] $label%-50s cold=${(t1 - t0) / 1e9}%6.2f warm=${(t2 - t1) / 1e9}%6.2f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.tables.Tables
    val docs = Tables.documents(spark, sfDir)
    val bucket = graft.sampling.Sampling.portableBucket("doc_id", 10)
    val corpus = docs.filter(bucket < 8)

    time("scan docs count")(docs.count())
    time("scan docs noop")(noop(docs))
    time("corpus filter noop")(noop(corpus))
    time("corpus repartition(32) noop")(noop(corpus.repartition(32)))
    time("shingle only, no scatter")(noop(
      docs.filter(bucket < 8).withColumn("sh", expr("graft_shingle_hashes(text, 5)")).select(col("doc_id"), size(col("sh")))))
    time("signatureIndex default")(noop(graft.dedup.Dedup.signatureIndex(corpus)))
    time("signatureIndex par=0 (no scatter)")(noop(graft.dedup.Dedup.signatureIndex(corpus, parallelism = Some(0))))
    time("signatureIndex.repartition(4) [q55 shape]")(noop(graft.dedup.Dedup.signatureIndex(corpus).repartition(4)))
  }
}
