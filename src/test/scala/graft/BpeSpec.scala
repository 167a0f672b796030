package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Bpe

/** Portable BPE tokenizer (graft_bpe_count): hand-checked merges,
  * fuzz parity against an independent pure-JVM reference
  * implementation, whitespace-tokenizer relationship, and the codegen
  * plan shape.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.from(0)
      .map(i => g.apply(params, Seed(seed).reseed(i.toLong)))
      .flatten.take(n).toSeq
  }

  /** Independent reference: immutable lists + a rank map, the classic
    * GPT-2-style formulation (find lowest-rank pair, left-greedy
    * rebuild) — deliberately a different code path from the kernel's
    * array loop.
    */
  private val refRank: Map[(String, String), Int] =
    Bpe.Merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  private def refWordTokens(word: String): Int = {
    var syms: List[String] = word.map(_.toString).toList
    var done = false
    while (!done && syms.length > 1) {
      val ranked = syms.zip(syms.tail).flatMap(p => refRank.get(p).map(_ -> p))
      if (ranked.isEmpty) done = true
      else {
        val (a, b) = ranked.minBy(_._1)._2
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
          case x :: tail => out += x; rest = tail
          case Nil => ()
        }
        syms = out.toList
      }
    }
    syms.length
  }

  private def refCount(text: String): Long =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .map(refWordTokens(_).toLong).sum

  test("hand-checked merges: function words fuse to single tokens, opaque strings don't") {
    assert(Bpe.wordTokens("the") == 1)
    assert(Bpe.wordTokens("and") == 1)
    // (h,i) outranks (w,h), so "which" resolves w|hi|ch — rank order
    // is part of the versioned table, pinned here
    assert(Bpe.wordTokens("which") == 3)
    assert(Bpe.wordTokens("with") == 1)
    assert(Bpe.wordTokens("a") == 1)
    assert(Bpe.wordTokens("aaa") == 3, "no (a,a) merge exists — l != r invariant")
    assert(Bpe.wordTokens("xqzkj") == 5, "no merges apply to an opaque consonant string")
    assert(Bpe.wordTokens("abc123") == 6, "digits never merge")
    assert(Bpe.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("The THE the!")) == 3)
    assert(Bpe.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("  ,;!  ")) == 0)
  }

  test("fuzz parity: kernel == independent reference on random strings") {
    val wordGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (8, Gen.alphaLowerChar), (1, Gen.numChar), (1, Gen.oneOf('t', 'h', 'e', 'i', 'n'))))
        .map(_.mkString))
    val textGen = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (6, wordGen), (1, Gen.const("the")), (1, Gen.const("interesting")),
        (1, Gen.oneOf(",", "!", "  ", "\n", "Ü", "中文"))))
        .map(_.mkString(" ")))
    samples(textGen, 400, seed = 19L).foreach { text =>
      val got = Bpe.countTokens(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      assert(got == refCount(text), s"mismatch on '$text'")
    }
  }

  test("fuzz parity on the real corpus + BPE never exceeds character count, never undercuts word count") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = graft.tables.Tables.documents(spark, dir).limit(200)
      .select(col("doc_id"), col("text"),
        expr("graft_bpe_count(text)").as("bpe"),
        expr(s"CAST(size(${graft.text.TextAnalysis.wordTokensSql("text")}) AS BIGINT)").as("ws"))
      .collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val text = r.getString(1)
      assert(r.getLong(2) == refCount(text), s"corpus mismatch on doc ${r.get(0)}")
      assert(r.getLong(2) >= r.getLong(3),
        "a word is at least one BPE token — BPE count can never undercut the word count")
    }
  }

  test("plan shape: graft_bpe_count is one fused shuffle-free projection") {
    // file-backed input — a local Seq folds into LocalTableScan and
    // proves nothing about the executor-side plan
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_plan_").toString
    Seq.tabulate(64)(i => (i.toLong, s"the quick brown fox $i jumps"))
      .toDF("doc_id", "text").write.parquet(s"$dir/docs")
    val df = spark.read.parquet(s"$dir/docs")
      .select(col("doc_id"), expr("graft_bpe_count(text)").as("n"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"bpe count must stay a shuffle-free projection:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("Project") && l.contains("graft_bpe_count") && l.contains("*(")),
      s"graft_bpe_count projection must be whole-stage-codegen fused:\n$p")
  }
}
