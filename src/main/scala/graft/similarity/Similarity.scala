package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the standard scale trade-off:
  * - brute-force cosine top-k: exact, O(|queries| * |corpus|); the
  *   query side is broadcast so the corpus never shuffles — each
  *   executor streams its corpus partition once per batch of queries.
  * - LSH (random hyperplane) buckets: approximate; corpus and queries
  *   shuffle only on bucket keys, turning the cross product into a
  *   per-bucket join — the 100 TB path (an IVF variant would swap the
  *   hyperplane bucketer for k-means centroids, same plan shape).
  *
  * Dot products use sequential left-fold `aggregate` over zipped
  * arrays: deterministic summation order, so scores are reproducible
  * run-to-run (floating-point sums are order-sensitive).
  */
object Similarity {

  /** Cast float embedding to double for stable arithmetic. */
  def doubleVec(c: String): String = s"transform($c, x -> CAST(x AS DOUBLE))"

  /** Cosine via the native codegen'd expression (graft.functions
    * .CosineSimilarity, injected by graft.extensions.GraftExtensions):
    * a primitive loop inside whole-stage codegen instead of an
    * interpreted per-element aggregate/zip_with — the scorer runs
    * |corpus| x |queries| times, so the hot path must not box.
    * Summation order (ascending index) matches the previous HOF
    * formulation, so scores are unchanged bit-for-bit.
    */
  def cosineSql(a: String, b: String): String = s"graft_cosine($a, $b)"

  /** Exact top-k neighbors for each query vector (query set broadcast). */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), expr(doubleVec("embedding")).as("v"))
    val q = broadcast(
      e.filter(col("vec_id") < nQueries).select(col("vec_id").as("q_id"), col("v").as("qv"))
    )
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))
    e.crossJoin(q)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr(cosineSql("qv", "v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rn"))
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket of a vector against the hyperplanes, packed to a long. */
  def withLshBucket(df: DataFrame, vecCol: String, nPlanes: Int = 12, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val p = typedlit(planes(nPlanes, dim, seed))
    df.withColumn("__planes", p)
      .withColumn(
        "bucket",
        expr(s"""aggregate(transform(sequence(0, ${nPlanes - 1}),
                |  i -> CASE WHEN graft_dot(__planes[i], $vecCol) > 0
                |       THEN shiftleft(1L, i) ELSE 0L END),
                |  0L, (acc, v) -> acc + v)""".stripMargin)
      )
      .drop("__planes")
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b) with
    * cosine >= threshold, exact upper-triangle formulation (one side
    * broadcast, native codegen'd cosine — |corpus|^2/2 scorer evals).
    * This is the exactness baseline; at corpus scale the same
    * threshold-join runs through the LSH bucket path (`lshTopK`'s plan
    * shape) so only same-bucket pairs are scored.
    */
  def embeddingNearDuplicates(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = embeddings.select(col("vec_id"), expr(doubleVec("embedding")).as("v"))
    val right = broadcast(e.select(col("vec_id").as("id_b"), col("v").as("vb")))
    e.select(col("vec_id").as("id_a"), col("v").as("va"))
      .join(right, col("id_a") < col("id_b"))
      .withColumn("cos", expr(cosineSql("va", "vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** IVF (inverted-file) ANN: k-means-style centroids partition the
    * corpus into `nlist` cells; each query probes its `nprobe` nearest
    * cells, so the scorer touches ~nprobe/nlist of the corpus instead
    * of all of it. The alternative scale path to the LSH buckets (same
    * plan shape: cell-key equi-join instead of a cross product).
    *
    * Centroid bootstrap is deterministic (the `nlist` lowest vec_ids)
    * refined by `iters` Lloyd rounds; per-round centroid recompute is a
    * driver round-trip of nlist x dim doubles — the same tiny
    * collect-and-reenter idiom as the date dimension's min/max
    * (`Dimensions.dateDim`), so it scales independently of corpus size.
    * With nprobe == nlist, results equal brute force exactly (pinned by
    * spec).
    */
  def ivfTopK(
      embeddings: DataFrame,
      nQueries: Int,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 2
  ): DataFrame = {
    val e = embeddings.select(col("vec_id"), expr(doubleVec("embedding")).as("v"))
    e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic bootstrap: lowest-id vectors as initial centroids
    var centroids: Seq[Seq[Double]] = e.orderBy("vec_id").limit(nlist)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq

    def withCell(df: DataFrame): DataFrame = df
      .withColumn("__cent", typedlit(centroids))
      .withColumn("__scores", expr(s"transform(sequence(0, ${centroids.size - 1}), i -> graft_cosine(__cent[i], v))"))
      .withColumn("cell", expr("array_position(__scores, array_max(__scores)) - 1"))

    // Lloyd refinement: assign -> element-wise mean per cell (via
    // posexplode so the mean is a plain hash aggregate) -> re-enter
    (1 to iters).foreach { _ =>
      val dims = withCell(e)
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .collect()
      val byCell = dims.groupBy(_.getAs[Long]("cell"))
      centroids = centroids.indices.map { c =>
        byCell.get(c.toLong) match {
          case Some(rows) => rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("m")).toSeq
          case None => centroids(c) // empty cell keeps its centroid
        }
      }
    }

    val corpus = withCell(e).select(col("vec_id"), col("v"), col("cell"))
    val probes = withCell(e.filter(col("vec_id") < nQueries))
      .withColumn(
        "__probes",
        expr(s"""transform(slice(array_sort(
                |    zip_with(__scores, sequence(0, ${centroids.size - 1}),
                |             (s, i) -> named_struct('s', s, 'i', i)),
                |    (l, r) -> CASE WHEN l.s > r.s THEN -1 WHEN l.s < r.s THEN 1
                |              WHEN l.i < r.i THEN -1 ELSE 1 END),
                |  1, $nprobe), x -> x.i)""".stripMargin)
      )
      .select(col("vec_id").as("q_id"), col("v").as("qv"), explode(col("__probes")).as("cell"))

    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))
    corpus.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr(cosineSql("qv", "v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rn"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Recall improves with fewer planes (wider buckets) or multi-probe;
    * the join is on bucket keys so the corpus shuffles once by bucket.
    */
  def lshTopK(embeddings: DataFrame, nQueries: Int, k: Int, nPlanes: Int = 8): DataFrame = {
    val e = withLshBucket(
      embeddings.select(col("vec_id"), expr(doubleVec("embedding")).as("v")), "v", nPlanes
    )
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))
    e.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr(cosineSql("qv", "v")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rn"))
  }
}
