package graft

import graft.text.SpanDedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // 7 tokens — covers three 5-gram windows when embedded
  private val shared = "one two three four five six seven"

  test("duplicatedSpans finds cross-doc shared passages as merged maximal spans") {
    val docs = Seq(
      ("a", s"a1 a2 $shared a3 a4"), // shared passage at token positions 2..8
      ("b", s"$shared b1 b2 b3"),    // shared passage at token positions 0..6
      ("c", "c1 c2 c3 c4 c5 c6 c7 c8") // unique text -> no rows
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, n = 5, cache = false)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(spans.toSeq === Seq(("a", 2, 8, 7), ("b", 0, 6, 7)))
  }

  test("within-doc repeats count as duplication; far-apart occurrences stay separate spans") {
    val docs = Seq(
      ("d", "p q r s t u0 u1 u2 u3 u4 u5 p q r s t")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, n = 5, cache = false)
      .orderBy("span_start")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    // "p q r s t" occurs at positions 0 and 11; gap 11 > n=5 -> two spans
    assert(spans.toSeq === Seq((0, 4, 5), (11, 15, 5)))
  }

  test("adjacent duplicated windows merge into one span") {
    // in g, grams at positions 0 ("m0..m4") and 5 ("z1..z5") are each
    // duplicated (both appear in h); their token ranges [0,4] and [5,9]
    // touch, so g gets ONE 10-token span. In h the same grams sit 11
    // apart -> two spans.
    val docs = Seq(
      ("g", "m0 m1 m2 m3 m4 z1 z2 z3 z4 z5"),
      ("h", "m0 m1 m2 m3 m4 h1 h2 h3 h4 h5 h6 z1 z2 z3 z4 z5")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(docs, n = 5, cache = false)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(spans.toSeq === Seq(("g", 0, 9, 10), ("h", 0, 4, 5), ("h", 11, 15, 5)))
  }

  test("spanDedupCorpus cuts spans, keeps untouched docs whole, drops emptied docs") {
    val docs = Seq(
      ("a", s"a1 a2 $shared a3 a4"),
      ("b", s"$shared b1 b2 b3"),
      ("c", "c1 c2 c3 c4 c5 c6 c7 c8"),
      ("e1", "w1 w2 w3 w4 w5"), // exact 5-token duplicate pair ->
      ("e2", "w1 w2 w3 w4 w5")  // fully covered -> both dropped
    ).toDF("doc_id", "text")
    val out = SpanDedup.spanDedupCorpus(docs, n = 5, cache = false)
      .orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq === Seq(
      ("a", "a1 a2 a3 a4", 4, 7),
      ("b", "b1 b2 b3", 3, 7),
      ("c", "c1 c2 c3 c4 c5 c6 c7 c8", 8, 0)))
  }

  test("short documents (< n tokens) produce no grams and survive the corpus pass intact") {
    val docs = Seq(
      ("s1", "tiny doc"),
      ("s2", "")
    ).toDF("doc_id", "text")
    assert(SpanDedup.duplicatedSpans(docs, n = 5, cache = false).count() === 0)
    val out = SpanDedup.spanDedupCorpus(docs, n = 5, cache = false)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
    // s2 tokenizes to zero tokens -> dropped by the emptied-doc rule
    assert(out.toSeq === Seq(("s1", "tiny doc", 2, 0)))
  }
}
