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
    import graft.similarity.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    println(s"[scratch] embeddings rows = ${emb.count()}, dim = " +
      emb.selectExpr("size(embedding)").head().getInt(0))

    val e = emb.select(col("vec_id"), expr(Similarity.doubleVec("embedding")).as("v"))
    time("bf scoring (crossJoin 16q + cosine + topk)")(
      noop(Similarity.bruteForceTopK(emb, 16, 5)))

    // the PQ encode expression in isolation (same shape as ivfPqTopK)
    val m = 8; val ksub = 16; val sub = 8
    val cbLit = typedlit(Seq.fill(m)(Seq.fill(ksub)(Seq.fill(sub)(0.123))))
    val enc = graft.operators.Scatter.cpu(e)
      .withColumn("__cb", cbLit)
      .withColumn("code64", expr(
        s"""aggregate(sequence(0, ${m - 1}), 0L, (acc, s) -> acc + shiftleft(
           |  CAST(array_position(
           |    transform(sequence(0, ${ksub - 1}),
           |      c -> graft_cosine(__cb[s][c], slice(v, s * $sub + 1, $sub))),
           |    array_max(transform(sequence(0, ${ksub - 1}),
           |      c -> graft_cosine(__cb[s][c], slice(v, s * $sub + 1, $sub))))) - 1 AS BIGINT),
           |  CAST(s * 4 AS INT)))""".stripMargin))
      .select(col("vec_id"), col("code64"))
    time("pq encode HOF expression")(noop(enc))
    val encN = graft.operators.Scatter.cpu(e)
      .withColumn("__cb", cbLit)
      .withColumn("code64", expr(
        s"""aggregate(sequence(0, ${m - 1}), 0L, (acc, s) -> acc + shiftleft(
           |  CAST(array_position(
           |    graft_cosine_many(__cb[s], slice(v, s * $sub + 1, $sub)),
           |    array_max(
           |      graft_cosine_many(__cb[s], slice(v, s * $sub + 1, $sub)))) - 1 AS BIGINT),
           |  CAST(s * 4 AS INT)))""".stripMargin))
      .select(col("vec_id"), col("code64"))
    time("pq encode native cosine_many")(noop(encN))

    // withCell alone (16-centroid transform + argmax)
    val cents = Seq.fill(16)(Seq.fill(64)(0.456))
    val wc = graft.operators.Scatter.cpu(e)
      .withColumn("__cent", typedlit(cents))
      .withColumn("__scores", expr(s"transform(sequence(0, 15), i -> graft_cosine(__cent[i], v))"))
      .withColumn("cell", expr("array_position(__scores, array_max(__scores)) - 1"))
      .select(col("vec_id"), col("cell"))
    time("withCell (16-cent transform+argmax)")(noop(wc))
    val wcN = graft.operators.Scatter.cpu(e)
      .withColumn("__cent", typedlit(cents))
      .withColumn("__scores", expr("graft_cosine_many(__cent, v)"))
      .withColumn("cell", expr("array_position(__scores, array_max(__scores)) - 1"))
      .select(col("vec_id"), col("cell"))
    time("withCell native cosine_many")(noop(wcN))

    time("ivfPqTopK end-to-end")(noop(Similarity.ivfPqTopK(emb, 16, 5)))

    // committed write path vs single-file fast path, tiny frame
    val tiny = spark.range(2000).selectExpr("id", "id * 3 as v").coalesce(1)
    val base = java.nio.file.Files.createTempDirectory("graft-w").toString
    var n = 0
    time("df.write.parquet (commit protocol), 1 task", reps = 10) {
      n += 1
      tiny.write.mode("overwrite").option("compression", "zstd").parquet(s"$base/a$n")
    }
    time("GraftSingleFileWrite.writeOneFile, 1 task", reps = 10) {
      n += 1
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/b$n"))
      org.apache.spark.sql.GraftSingleFileWrite.writeOneFile(tiny, s"$base/b$n", Some("zstd"))
    }
  }
}
