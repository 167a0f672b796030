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
    * construction (candidate generation is a provably lossless
    * superset even under hash collisions; see the body comment), and
    * every surviving pair is verified on the gram STRING sets, so a
    * collision can never manufacture or drop an output pair — the
    * DuckDB oracle recomputes the identical answer brute-force.
    */
  def jaccardJoin(
      docs: DataFrame,
      thresholdPct: Int = 60,
      textCol: String = "text",
      idCol: String = "doc_id",
      gramN: Int = 3
  ): DataFrame = {
    val (pairs, grams) = preVerifiedPairs(docs, thresholdPct, textCol, idCol, gramN)
    // Materialized eagerly: the survivor pair set has THREE consumers
    // (both `needed` branches and the final verify join) and sits on
    // top of the whole candidate pipeline — without the checkpoint
    // that pipeline would re-execute per consumer. Every consumer of
    // the cached gram frame is upstream of this point, so it is
    // released immediately (a long-lived session must not accumulate
    // one corpus-sized cache per call).
    val preVerified = pairs.localCheckpoint(true)
    grams.unpersist()
    // String grams are built ONLY for the survivors: semi-join the doc
    // table down to the (few) ids still in play, THEN project the gram
    // arrays — the interpreted HOF gram builder runs on thousands of
    // rows, not the corpus.
    val needed = preVerified.select(col("id_a").as(idCol))
      .union(preVerified.select(col("id_b").as(idCol)))
      .distinct()
    val sides = docs.join(needed, Seq(idCol), "left_semi")
      .select(col(idCol), expr(Contamination.wordGramsSql(textCol, gramN)).as("grams"))
      .localCheckpoint(true) // tiny; consumed by both join sides below
    preVerified
      .join(sides.select(col(idCol).as("id_a"), col("grams").as("g_a")), "id_a")
      .join(sides.select(col(idCol).as("id_b"), col("grams").as("g_b")), "id_b")
      .withColumn(
        "jaccard",
        expr("CAST(size(array_intersect(g_a, g_b)) AS DOUBLE) / size(array_union(g_a, g_b))"))
      .filter(col("jaccard") >= lit(thresholdPct / 100.0))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** The candidate + pre-verify pipeline BEFORE any checkpoint, plus
    * the cached gram frame backing it. Package-private so the plan
    * suite can pin the actual prefix-join plan — `jaccardJoin`'s
    * returned frame sits on checkpointed RDDs and would show none of
    * it. Callers own the returned gram frame's `unpersist()`.
    */
  private[graft] def preVerifiedPairs(
      docs: DataFrame,
      thresholdPct: Int,
      textCol: String,
      idCol: String,
      gramN: Int
  ): (DataFrame, DataFrame) = {
    require(thresholdPct > 0 && thresholdPct <= 100, s"thresholdPct in (0,100]: $thresholdPct")
    // Sorted distinct hashed gram ids per doc, in ONE codegen'd byte
    // pass (graft_wordgram_hashes over lower(text) — bit-equal to
    // hashing the string grams of the q30/q41 tokenizer, spec-pinned).
    // The corpus-wide path never builds a gram STRING at all; the
    // persisted frame holds only primitive long arrays.
    val grams = docs
      .select(col(idCol), expr(s"graft_wordgram_hashes(lower($textCol), $gramN)").as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("n_h", size(col("hs")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Candidate generation and pre-verification run in HASHED-ID
    // space: every shuffle in the df aggregate, the rank window, the
    // prefix self-join, and the first verify pass carries 8-byte longs
    // instead of gram strings. This stays provably lossless: a
    // collision can only MERGE set elements, which never shrinks an
    // intersection and never grows a union, so id-level Jaccard >=
    // gram-level Jaccard — every pair qualifying on gram strings also
    // qualifies in id space, where the prefix construction below is
    // the standard exact one. False positives (from merged ids) fall
    // to the string-set verify at the end.
    val g = grams.select(col(idCol), col("n_h").as("n"), explode(col("hs")).as("h"))
    // Corpus-wide document frequency per gram id — map-side combinable.
    val dfTab = g.groupBy("h").agg(count(lit(1)).as("df"))
    // Rarest-first total order; prefix length n - ceil(t*n) + 1 in
    // integer arithmetic: ceil(pct*n/100) = (pct*n + 99) DIV 100.
    // All size arithmetic runs in BIGINT: n is an Int column, and an
    // Int*Int product wraps silently under the non-ANSI default — a
    // >21M-gram document (~130 MB of text, real at 100 TB) would
    // otherwise flip a filter and silently DROP qualifying pairs.
    val prefix = g.join(dfTab, "h")
      .withColumn("pos", row_number().over(Window.partitionBy(col(idCol)).orderBy(col("df"), col("h"))))
      .filter(col("pos") <= expr(s"n - (CAST(n AS BIGINT) * $thresholdPct + 99) DIV 100 + 1"))
      .select(col(idCol), col("h"), col("n"), col("pos"))

    val a = prefix.select(col(idCol).as("id_a"), col("h"), col("n").as("n_a"), col("pos").as("pos_a"))
    val b = prefix.select(col(idCol).as("id_b"), col("h").as("h_b"), col("n").as("n_b"), col("pos").as("pos_b"))
    val candidates = a
      .join(
        b,
        col("h") === col("h_b") && col("id_a") < col("id_b") &&
          // length filter: J >= t forces min(n_a,n_b) >= t * max(n_a,n_b)
          col("n_a").cast("long") * 100 >= col("n_b").cast("long") * thresholdPct &&
          col("n_b").cast("long") * 100 >= col("n_a").cast("long") * thresholdPct &&
          // positional filter: overlap achievable from these positions on
          // must reach ceil(t/(1+t) * (n_a+n_b))
          expr(s"1 + least(n_a - pos_a, n_b - pos_b) >= ((CAST(n_a AS BIGINT) + n_b) * $thresholdPct + ${100 + thresholdPct} - 1) DIV ${100 + thresholdPct}")
      )
      .select(col("id_a"), col("id_b"))
      .distinct()

    // Two-pass verify. Pass 1 kills ~all false positives in id space
    // with the codegen'd sorted-merge kernel on the long arrays (the
    // candidate:true-pair ratio is routinely 100:1+, and the string-set
    // intersect is the expensive interpreted op). Lossless for the
    // same merge argument as above, plus monotonicity of IEEE division:
    // id-Jaccard >= gram-Jaccard as rationals, and fl() preserves >=,
    // so any pair passing the final gram-level threshold also passes
    // the id-level one. Pass 2 computes the REPORTED jaccard on the
    // gram strings for the few survivors — the output value is defined
    // by gram sets alone, bit-identical to the brute-force oracle.
    val hashSides = grams.select(col(idCol), col("hs"))
    val pairs = candidates
      .join(hashSides.select(col(idCol).as("id_a"), col("hs").as("h_a")), "id_a")
      .join(hashSides.select(col(idCol).as("id_b"), col("hs").as("h_b")), "id_b")
      .filter(expr("graft_jaccard_sorted(h_a, h_b)") >= lit(thresholdPct / 100.0))
      .select(col("id_a"), col("id_b"))
    (pairs, grams)
  }
}
