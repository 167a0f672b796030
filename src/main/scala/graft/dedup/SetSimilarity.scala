package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.Contamination

/** Exact set-similarity self-join (AllPairs/PPJoin family): every
  * document pair whose word n-gram Jaccard meets a threshold — no
  * probabilistic recall, unlike the MinHash/LSH path in [[Dedup]].
  * This is the "n-gram Jaccard" dedup variant as a first-class exact
  * operator: LSH answers "find most near-dups cheaply", this answers
  * "find ALL pairs above t, provably".
  *
  * Candidate generation is prefix filtering under a global
  * rarest-first token order (Chaudhuri et al. SSJoin, Bayardo et al.
  * AllPairs, Xiao et al. PPJoin — all published): sort each document's
  * grams by corpus-wide document frequency (ties broken by the gram
  * string, so the order is total and engine-independent), keep only
  * the first |g| - ceil(t*|g|) + 1 grams, and join documents sharing a
  * PREFIX gram. Any pair with Jaccard >= t must share its first
  * common gram inside both prefixes (the standard argument: a pair
  * with overlap o has at most |g| - o non-shared grams ahead of the
  * first common one, and J >= t forces o >= ceil(t*|g|)), so the
  * candidate set provably contains every qualifying pair; an exact
  * string-set verify then removes false positives.
  *
  * Scale shape, and why this survives boilerplate where raw bucketing
  * would not: the join key is a PREFIX gram, and prefixes hold each
  * document's RAREST grams — a license-header gram shared by 10M
  * documents has maximal df, sorts last, and never enters a prefix
  * unless a document consists of almost nothing else. Bucket width
  * for gram g is bounded by the number of documents where g is
  * rare-enough to be prefixed, not by df(g). Three further exact
  * prunes run inside the join condition on int columns, before any
  * array moves: the length filter (min size >= t * max size), the
  * PPJoin positional filter (remaining-suffix overlap bound
  * 1 + min(|a|-pos_a, |b|-pos_b) >= ceil(t/(1+t) * (|a|+|b|))), and
  * id ordering. The verify joins ship each gram array once per
  * surviving candidate.
  *
  * Thresholds are integer percent so prefix lengths and overlap
  * bounds are computed in exact integer arithmetic (`DIV`) — a
  * floating ceil(0.6 * n) that rounds up under IEEE would silently
  * SHORTEN a prefix and break the exactness guarantee.
  *
  * Reference scope: the reference engine's dedup surface stops at
  * hash-equality grouping (dedup_exact in
  * /root/reference/src/jobs/ingestion_job.* — dropDuplicates-style);
  * this operator extends it for training-data curation per the brief.
  */
object SetSimilarity {

  /** All pairs `(id_a, id_b, jaccard)` with word-`gramN`-gram Jaccard
    * >= thresholdPct/100, id_a < id_b. Exact — recall 1 by
    * construction, verified per pair on the gram string sets (no
    * hashing anywhere, so a collision can never manufacture or drop a
    * pair, and the DuckDB oracle recomputes the identical answer
    * brute-force).
    */
  def jaccardJoin(
      docs: DataFrame,
      thresholdPct: Int = 60,
      textCol: String = "text",
      idCol: String = "doc_id",
      gramN: Int = 3
  ): DataFrame = {
    require(thresholdPct > 0 && thresholdPct <= 100, s"thresholdPct in (0,100]: $thresholdPct")
    // Gram sets once per doc (distinct word n-grams, same tokenizer as
    // q30/q41 — parity with the oracle proven there). Persisted: three
    // consumers (the explode pipeline and both verify sides).
    val grams = docs
      .select(col(idCol), expr(Contamination.wordGramsSql(textCol, gramN)).as("grams"))
      .filter(size(col("grams")) > 0)
      .withColumn("n", size(col("grams")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val g = grams.select(col(idCol), col("n"), explode(col("grams")).as("gram"))
    // Corpus-wide document frequency per gram — map-side combinable.
    val dfTab = g.groupBy("gram").agg(count(lit(1)).as("df"))
    // Rarest-first total order; prefix length n - ceil(t*n) + 1 in
    // integer arithmetic: ceil(pct*n/100) = (pct*n + 99) DIV 100.
    val prefix = g.join(dfTab, "gram")
      .withColumn("pos", row_number().over(Window.partitionBy(col(idCol)).orderBy(col("df"), col("gram"))))
      .filter(col("pos") <= expr(s"n - ($thresholdPct * n + 99) DIV 100 + 1"))
      .select(col(idCol), col("gram"), col("n"), col("pos"))

    val a = prefix.select(col(idCol).as("id_a"), col("gram"), col("n").as("n_a"), col("pos").as("pos_a"))
    val b = prefix.select(col(idCol).as("id_b"), col("gram").as("gram_b"), col("n").as("n_b"), col("pos").as("pos_b"))
    val candidates = a
      .join(
        b,
        col("gram") === col("gram_b") && col("id_a") < col("id_b") &&
          // length filter: J >= t forces min(n_a,n_b) >= t * max(n_a,n_b)
          col("n_a") * 100 >= col("n_b") * thresholdPct &&
          col("n_b") * 100 >= col("n_a") * thresholdPct &&
          // positional filter: overlap achievable from these positions on
          // must reach ceil(t/(1+t) * (n_a+n_b))
          expr(s"1 + least(n_a - pos_a, n_b - pos_b) >= ($thresholdPct * (n_a + n_b) + ${100 + thresholdPct} - 1) DIV ${100 + thresholdPct}")
      )
      .select(col("id_a"), col("id_b"))
      .distinct()

    val sides = grams.select(col(idCol), col("grams"))
    candidates
      .join(sides.select(col(idCol).as("id_a"), col("grams").as("g_a")), "id_a")
      .join(sides.select(col(idCol).as("id_b"), col("grams").as("g_b")), "id_b")
      .withColumn(
        "jaccard",
        expr("CAST(size(array_intersect(g_a, g_b)) AS DOUBLE) / size(array_union(g_a, g_b))"))
      .filter(col("jaccard") >= lit(thresholdPct / 100.0))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
