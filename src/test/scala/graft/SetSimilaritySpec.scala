package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.SetSimilarity
import graft.text.Contamination

class SetSimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force exact word-trigram Jaccard pairs — the executable
    * specification jaccardJoin must match EXACTLY (the prefix filter
    * claims recall 1, so equality, not containment).
    */
  private def bruteForce(docs: DataFrame, thresholdPct: Int, gramN: Int = 3): Set[(Long, Long, Double)] = {
    val g = docs
      .select(col("doc_id"), expr(Contamination.wordGramsSql("text", gramN)).as("grams"))
      .filter(size(col("grams")) > 0)
    g.as("a").join(g.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("CAST(size(array_intersect(a.grams, b.grams)) AS DOUBLE) / size(array_union(a.grams, b.grams))").as("jaccard"))
      .filter(col("jaccard") >= lit(thresholdPct / 100.0))
      .as[(Long, Long, Double)].collect().toSet
  }

  private def run(docs: DataFrame, thresholdPct: Int): Set[(Long, Long, Double)] =
    SetSimilarity.jaccardJoin(docs, thresholdPct).as[(Long, Long, Double)].collect().toSet

  test("finds the near-dup pair and nothing else on a known corpus") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "completely unrelated text about database systems and query optimization"),
      (4L, "short text") // < 3 words => no trigrams => excluded
    ).toDF("doc_id", "text")
    val out = run(docs, 60)
    assert(out.map(p => (p._1, p._2)) == Set((1L, 2L)))
    // 12 trigrams each, 11 shared (only the last differs): 11/13
    val j = out.head._3
    assert(math.abs(j - 11.0 / 13.0) < 1e-12)
    assert(bruteForce(docs, 60) == out)
  }

  test("threshold boundary is inclusive (jaccard == t passes)") {
    // 2 shared trigrams of 3 each => J = 2/4 = 0.5 exactly
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta")
    ).toDF("doc_id", "text")
    assert(run(docs, 50).map(p => (p._1, p._2)) == Set((1L, 2L)))
    assert(run(docs, 51).isEmpty)
  }

  test("prefix filtering is lossless: equals brute force on a randomized corpus") {
    // Clustered corpus: base sentences with word-level mutations at
    // several rates, so pairs land on both sides of every threshold.
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("data", "spark", "query", "join", "scan", "shuffle", "plan",
      "codegen", "filter", "agg", "window", "stream", "batch", "table", "row",
      "col", "hash", "sort", "merge", "cache")
    val bases = Vector.fill(12)(Vector.fill(14 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))))
    val docs = (0 until 120).map { i =>
      val base = bases(rnd.nextInt(bases.size))
      val rate = rnd.nextInt(4) * 0.12
      val toks = base.map(t => if (rnd.nextDouble() < rate) vocab(rnd.nextInt(vocab.size)) else t)
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    for (pct <- Seq(40, 60, 80)) {
      val got = run(docs, pct)
      val want = bruteForce(docs, pct)
      assert(got == want, s"threshold $pct%: got ${got.size} pairs, want ${want.size}")
      assert(want.nonEmpty, s"degenerate fixture at $pct% — no qualifying pairs")
    }
  }

  test("unicode corpus: kernel candidates and HOF string verify agree (equals brute force)") {
    // The candidate stage runs on graft_wordgram_hashes over
    // lower(text) while the verify runs on the HOF string grams — any
    // tokenizer disagreement between the two (Unicode lowercasing,
    // multi-byte boundaries) would silently break recall. Exercise the
    // hostile cases inside real near-dup structure.
    val decor = Vector("Kelvin", "İstanbul", "straße", "naïve",
      "日本語", "😀", "café", "...", "x_9")
    val rnd = new scala.util.Random(99)
    val base = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val docs = (0 until 60).map { i =>
      val words = Vector.fill(10)(base(rnd.nextInt(base.size))) ++
        Vector.fill(3)(decor(rnd.nextInt(decor.size)))
      (i.toLong, rnd.shuffle(words).mkString(" "))
    }.toDF("doc_id", "text")
    for (pct <- Seq(50, 70)) {
      val got = run(docs, pct)
      val want = bruteForce(docs, pct)
      assert(got == want, s"unicode corpus, threshold $pct%: got ${got.size}, want ${want.size}")
    }
  }

  test("boilerplate-heavy corpus: shared suffix grams stay out of prefixes") {
    // Every doc shares the same long boilerplate tail (max df), with a
    // tiny distinct head. The df-ordered prefix must consist of the
    // rare head grams, so candidate buckets stay per-cluster instead
    // of corpus-wide — and the answer is still exact.
    val boiler = "this content is provided as is without warranty of any kind express or implied"
    val docs = (0 until 40).map { i =>
      (i.toLong, s"unique head ${i / 2} marker $boiler")
    }.toDF("doc_id", "text")
    val got = run(docs, 90)
    val want = bruteForce(docs, 90)
    assert(got == want)
    // exactly the 20 same-head pairs qualify at 90%
    assert(got.map(p => (p._1, p._2)) == (0 until 40 by 2).map(i => (i.toLong, i + 1L)).toSet)
  }
}
