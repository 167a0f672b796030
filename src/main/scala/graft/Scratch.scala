package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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

    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => f)
      println(f"[scratch] $label%-52s ${(System.nanoTime() - t0) / 1e9 / reps}%6.3f s/op")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.tables.Tables
    import graft.dedup.Dedup
    import graft.text.TextAnalysis
    val docs = Tables.documents(spark, sfDir)
    val b10 = graft.sampling.Sampling.portableBucket("doc_id", 10)
    val corpus = docs.filter(b10 < 8)
    val batch = docs.filter(b10 >= 8)

    time("1 sigIndex(corpus).repartition(4) noop")(noop(Dedup.signatureIndex(corpus).repartition(4)))
    val dedupB = Dedup.dropExactDuplicates(batch)
      .join(corpus.select(expr("md5(text)").as("__ch")).distinct(),
        expr("md5(text)") === col("__ch"), "left_anti")
    time("2 dedupB noop")(noop(dedupB))
    val scored = TextAnalysis.scoreDocuments(dedupB).filter(col("quality") >= 0.5)
    time("3 scored noop")(noop(scored))
    val bench = graft.text.Contamination.benchGrams(docs)
    time("4 benchGrams noop")(noop(bench))
    val b1000 = graft.sampling.Sampling.portableBucket("doc_id", 1000)
    time("5 cand localCheckpoint") {
      val c = scored.filter(b1000 >= 50).localCheckpoint(true); c.unpersist(); ()
    }
    val cand = scored.filter(b1000 >= 50).localCheckpoint(true)
    val clean = graft.text.Contamination.dropContaminated(cand, bench)
    time("6 dropContaminated noop")(noop(clean))
    val sig = Dedup.signatureIndex(corpus).repartition(4).localCheckpoint(true)
    // bisect incrementalNearDups internals (mirrors Dedup.scala)
    locally {
      import org.apache.spark.sql.expressions.Window
      val clean2 = clean.select(col("doc_id"), col("text"))
      time("7a batch signatures persist+count") {
        val bb = graft.dedup.Dedup.scatterForCpuStage(clean2, None, 32)
          .withColumn("sh", expr("graft_shingle_hashes(text, 5)"))
          .withColumn("mh", expr("graft_minhash_hashed(sh, 32)"))
          .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"),
            expr("graft_lsh_bands(mh, 4)").as("bands"))
          .persist()
        bb.count(); bb.unpersist(); ()
      }
      val bb = graft.dedup.Dedup.scatterForCpuStage(clean2, None, 32)
        .withColumn("sh", expr("graft_shingle_hashes(text, 5)"))
        .withColumn("mh", expr("graft_minhash_hashed(sh, 32)"))
        .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"),
          expr("graft_lsh_bands(mh, 4)").as("bands"))
        .persist()
      bb.count()
      val newB = bb.select(col("doc_id").as("new_id"), col("n_sh").as("n_new"),
        posexplode(col("bands")).as(Seq("band", "bucket")))
      val oldB = sig.select(col("doc_id").as("old_id"), col("n_sh").as("n_old"),
          posexplode(col("bands")).as(Seq("band", "bucket")))
        .withColumn("rn", row_number().over(Window.partitionBy("band", "bucket").orderBy(col("old_id"))))
        .filter(col("rn") <= 1000).drop("rn")
      val cand2 = newB.join(oldB, Seq("band", "bucket"))
        .filter(least(col("n_new"), col("n_old")).cast("double") / greatest(col("n_new"), col("n_old")) >= 0.7)
        .select(col("new_id"), col("old_id")).distinct()
      time("7b cand noop")(noop(cand2))
      val candOld = cand2.select(col("old_id").as("doc_id")).distinct()
      val oldSh = graft.dedup.Dedup.scatterForCpuStage(
          corpus.join(candOld, Seq("doc_id"), "left_semi"), None, 32)
        .select(col("doc_id").as("old_id"), expr("graft_shingle_hashes(text, 5)").as("sh_b"))
      time("7c oldSh noop")(noop(oldSh))
      time("7d verify join noop")(noop(
        cand2.join(bb.select(col("doc_id").as("new_id"), col("sh").as("sh_a")), "new_id")
          .join(oldSh, "old_id")
          .withColumn("jaccard", expr("graft_jaccard_sorted(sh_a, sh_b)"))
          .filter(col("jaccard") >= 0.7)))
      bb.unpersist(); ()
    }
    time("7 incrementalNearDups") {
      val nd = Dedup.incrementalNearDups(clean.select("doc_id", "text"), corpus, sig, threshold = 0.7)
        .select("doc_id").distinct()
      noop(clean.join(broadcast(nd), Seq("doc_id"), "left_anti"))
    }
  }
}
