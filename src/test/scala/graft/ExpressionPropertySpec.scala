package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based pins for the native expression kernels. Each property
  * draws a few hundred scalacheck cases under a FIXED seed (a flaky
  * property test is worse than none), evaluates them through the real
  * codegen path in ONE Spark job per property, and checks the
  * invariant in plain Scala on the collected rows.
  */
class ExpressionPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.from(0)
      .map(i => g.apply(params, Seed(seed).reseed(i.toLong)))
      .flatten.take(n).toSeq
  }

  private val sortedSet: Gen[Seq[Long]] =
    Gen.chooseNum(0, 40).flatMap(k => Gen.listOfN(k, Gen.chooseNum(-200L, 200L)))
      .map(_.distinct.sorted)

  test("property: graft_jaccard_sorted equals set-algebra Jaccard (incl. empties)") {
    val pairs = samples(Gen.zip(sortedSet, sortedSet), 300, seed = 7L)
    val got = pairs.toDF("a", "b")
      .select(expr("graft_jaccard_sorted(a, b)")).as[Double].collect()
    pairs.zip(got).foreach { case ((a, b), j) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val expect =
        if (sa.isEmpty && sb.isEmpty) 1.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j == expect, s"jaccard($a, $b) = $j, want $expect")
    }
  }

  test("property: minhash signature of a union is the elementwise min of the signatures") {
    // THE defining mergeability of MinHash: sig(A ∪ B) = min(sig A, sig B)
    // — what lets map-side partials combine without recall loss
    val k = 16
    val pairs = samples(Gen.zip(sortedSet, sortedSet), 200, seed = 11L)
      .filter { case (a, b) => a.nonEmpty && b.nonEmpty }
    val rows = pairs.map { case (a, b) => (a, b, (a ++ b).distinct.sorted) }
    val got = rows.toDF("a", "b", "u")
      .select(
        expr(s"graft_minhash_hashed(a, $k)").as("sa"),
        expr(s"graft_minhash_hashed(b, $k)").as("sb"),
        expr(s"graft_minhash_hashed(u, $k)").as("su"))
      .as[(Seq[Long], Seq[Long], Seq[Long])].collect()
    got.foreach { case (sa, sb, su) =>
      val merged = sa.zip(sb).map { case (x, y) => math.min(x, y) }
      assert(su == merged, s"sig(union) != elementwise min: $su vs $merged")
    }
  }

  test("property: character-bijection invariance — a substitution cipher preserves pairwise Jaccard") {
    // the property SCALE.md's 10x fixture rests on: shingles are
    // character n-grams, so any per-character bijection maps shingle
    // sets bijectively and pairwise Jaccard is unchanged
    val alpha = ('a' to 'z').mkString
    val rot = alpha.drop(13) + alpha.take(13)
    val text: Gen[String] = Gen.chooseNum(0, 60)
      .flatMap(k => Gen.listOfN(k, Gen.frequency(9 -> Gen.alphaLowerChar, 1 -> Gen.const(' '))))
      .map(_.mkString)
    val pairs = samples(Gen.zip(text, text), 200, seed = 13L)
    val got = pairs.toDF("a", "b")
      .select(
        expr("graft_jaccard_sorted(graft_shingle_hashes(a, 5), graft_shingle_hashes(b, 5))"),
        expr(s"graft_jaccard_sorted(graft_shingle_hashes(translate(a, '$alpha', '$rot'), 5), " +
          s"graft_shingle_hashes(translate(b, '$alpha', '$rot'), 5))"))
      .as[(Double, Double)].collect()
    got.zip(pairs).foreach { case ((plain, ciphered), (a, b)) =>
      assert(plain == ciphered, s"cipher changed jaccard for ($a, $b): $plain -> $ciphered")
    }
  }

  test("property: bloom aggregate is partition-layout independent (merge is a commutative OR)") {
    val words = samples(Gen.identifier, 400, seed = 17L).distinct
    def bloomOf(parts: Int): Array[Byte] =
      words.toDF("s").repartition(parts)
        .select(expr(s"graft_bloom_agg(s, ${words.size}L, 0.01)"))
        .head().getAs[Array[Byte]](0)
    val one = bloomOf(1)
    assert(java.util.Arrays.equals(one, bloomOf(7)),
      "bloom bitset differs across partition layouts — merge is not order-independent")
    assert(java.util.Arrays.equals(one, bloomOf(32)))
  }

  test("property: graft_topk equals sort-and-take on random scored rows") {
    val k = 5
    val row = Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 30L), Gen.chooseNum(0, 8))
    val rows = samples(row, 300, seed = 23L)
    val got = rows.toDF("score", "id1", "id2")
      .select(expr(s"graft_topk(score, id1, id2, $k)").as("top"))
      .selectExpr("inline(top)")
      .as[(Double, Long, Int)].collect().toSeq
    val expect = rows
      .sortBy { case (s, a, b) => (-s, a, b) }.take(k)
      .map { case (s, a, b) => (s, a, b) }
    assert(got == expect, s"topk mismatch:\n got    $got\n expect $expect")
  }

  test("property: graft_lsh_bands equals the xxhash64 HOF formulation on random signatures") {
    // band keys must be BIT-identical to transform(sequence(0, b-1),
    // b -> xxhash64(b, slice(sig, b*r+1, r))) — the signature index
    // persists bucket values, so a changed hash would orphan an
    // existing index
    val r = 4
    val sig: Gen[Seq[Long]] =
      Gen.oneOf(8, 16, 32).flatMap(k => Gen.listOfN(k, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    val sigs = samples(sig, 200, seed = 13L).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "sig")
    val native = sigs.selectExpr("id", s"graft_lsh_bands(sig, $r) AS b")
    val hof = sigs.selectExpr("id",
      s"transform(sequence(0, CAST(size(sig) / $r AS INT) - 1), b -> xxhash64(b, slice(sig, b * $r + 1, $r))) AS b")
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "native band keys must equal the xxhash64 HOF form")
  }

  test("property: graft_wordgram_hashes equals hashing the HOF word grams, unicode-spiked") {
    // parity claim: graft_wordgram_hashes(lower(text), n) ==
    // sort_array(array_distinct(transform(wordGramsSql, xxhash64))).
    // Hostile alphabet: words glued to punct, every whitespace class,
    // multi-byte letters that LOWERCASE INTO the token class (Kelvin
    // sign -> k, fullwidth forms do not), combining-dot lowercasing
    // (Turkish I-dot), supplementary-plane chars, digits.
    val frag: Gen[String] = Gen.oneOf(
      Gen.oneOf("the", "quick", "brown", "fox", "data", "spark", "a1b2", "0", "42"),
      Gen.oneOf(" ", "\t", "\n", "", "  ", ".", ",", "?!", "_", "-"),
      Gen.oneOf("The", "QUICK", "BrOwN", "\u212aelvin", "\u0130stanbul"),
      Gen.oneOf("\u00e9", "stra\u00dfe", "\u65e5\u672c", "na\u00efve"),
      Gen.oneOf("\ud83d\ude00", "\ud835\udd4f", "a\ud83d\ude00b"))
    val text: Gen[String] =
      Gen.chooseNum(0, 25).flatMap(k => Gen.listOfN(k, frag)).map(_.mkString(" "))
    val docs = samples(text, 400, seed = 47L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val native = docs.select(col("doc_id"),
        expr(s"graft_wordgram_hashes(lower(text), $n)").as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val hof = docs.select(col("doc_id"),
        expr(s"sort_array(array_distinct(transform(${graft.text.Contamination.wordGramsSql("text", n)}, g -> xxhash64(g))))").as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native == hof, s"n=$n mismatch")
    }
  }

  test("property: graft_textcounts equals java.util.regex on random unicode-spiked text") {
    // the kernel's parity claim is "bit-exact with the regex
    // formulation BY CONSTRUCTION" — fuzz it with text drawn from the
    // hostile alphabet: marker words, near-marker words, word chars
    // glued to markers, every \s class member, ASCII punct, CJK
    // markers, other multi-byte letters (é/ß/日), and digits
    val frag: Gen[String] = Gen.oneOf(
      Gen.oneOf("the", "a", "of", "and", "to", "in", "is", "for", "on", "with",
        "el", "la", "de", "que", "der", "die", "und", "das", "le", "les", "et", "une"),
      Gen.oneOf("The", "THE", "thee", "anden", "off", "t0", "the1", "the_", "_the"),
      Gen.oneOf(" ", "\t", "\n", "", "\f", "\r", "  "),
      Gen.oneOf(".", "!", "?", ",", ";", ":", "...", "?!"),
      Gen.oneOf("的", "是", "了", "的是了", "的the", "是a了"),
      Gen.oneOf("é", "ß", "日本", "naïve", "straße"),
      // supplementary plane (4-byte UTF-8, surrogate pairs in UTF-16):
      // an emoji (non-letter -> word-run breaker, counts 1 in n_retok)
      // and a math-alphanumeric letter (isLetterOrDigit -> word char)
      Gen.oneOf("😀", "𝕏", "a😀b", "the𝕏"),
      Gen.oneOf("42", "3x", "x_9", "0", "a1b2c3"))
    val text: Gen[String] =
      Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, frag)).map(_.mkString)
    val docs = samples(text, 400, seed = 31L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val t = col("text")
    val native = docs.select(col("doc_id"), expr("graft_textcounts(text)").as("tc"))
      .select(col("doc_id"), col("tc.n_tok"), col("tc.n_retok"), col("tc.n_punct"),
        col("tc.n_stop"), col("tc.n_nonws"), col("tc.c_en"), col("tc.c_es"),
        col("tc.c_de"), col("tc.c_fr"), col("tc.c_zh"))
    val regex = docs.select(
      col("doc_id"),
      graft.text.TextAnalysis.tokenCount(t).as("n_tok"),
      graft.text.TextAnalysis.regexTokenCount(t).as("n_retok"),
      graft.text.TextAnalysis.punctCount(t).as("n_punct"),
      graft.text.TextAnalysis.stopwordCount(t).as("n_stop"),
      length(regexp_replace(t, "\\s+", "")).as("n_nonws"),
      graft.text.TextAnalysis.markerCount(t, graft.text.TextAnalysis.LangMarkers(0)._2).as("c_en"),
      graft.text.TextAnalysis.markerCount(t, graft.text.TextAnalysis.LangMarkers(1)._2).as("c_es"),
      graft.text.TextAnalysis.markerCount(t, graft.text.TextAnalysis.LangMarkers(2)._2).as("c_de"),
      graft.text.TextAnalysis.markerCount(t, graft.text.TextAnalysis.LangMarkers(3)._2).as("c_fr"),
      graft.text.TextAnalysis.markerCount(t, graft.text.TextAnalysis.LangMarkers(4)._2).as("c_zh"))
    val n = native.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val r = regex.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val diffs = n.keys.filter(k => n(k) != r(k)).toSeq.sorted
    assert(diffs.isEmpty, diffs.take(3).map(k =>
      s"doc $k: native=${n(k)} regex=${r(k)} text=${docs.filter(col("doc_id") === k).collect()(0).getString(1)}").mkString("\n"))
  }

  test("property: graft_repstats equals the HOF formulation on random token vectors") {
    // degenerate shapes on purpose: empty docs, all-one-token docs
    // (max repetition), high-dup vocabularies (small alphabet => many
    // duplicate trigrams), singleton tokens
    val token: Gen[String] = Gen.oneOf("a", "b", "c", "ab", "ba", "x1", "zz", "q")
    val doc: Gen[String] = Gen.frequency(
      1 -> Gen.const(""),
      1 -> Gen.chooseNum(1, 40).map(n => Seq.fill(n)("rep").mkString(" ")),
      8 -> Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" ")))
    val docs = samples(doc, 300, seed = 97L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = graft.text.TextAnalysis.repetitionStats(docs)
    val hof = docs
      .selectExpr("doc_id", s"${graft.text.TextAnalysis.repetitionStatsPortableSql("text")} AS s")
      .selectExpr("doc_id", "s.n_tokens AS n_tokens", "s.n_types AS n_types",
        "s.type_token_ratio AS type_token_ratio",
        "s.dup_trigram_ratio AS dup_trigram_ratio",
        "s.top_token_ratio AS top_token_ratio")
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "native and HOF repetition signals must agree on every random document")
  }
}
