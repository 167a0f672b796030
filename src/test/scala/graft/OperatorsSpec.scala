package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the unsalted join on a skewed key") {
    // 90% of big rows share key 1 (the hot-key shape salting exists for)
    val big = (1 to 1000).map(i => (if (i <= 900) 1 else i % 7, i)).toDF("k", "payload")
    val small = Seq((1, "hot"), (2, "a"), (3, "b"), (0, "z")).toDF("k", "name")

    val plain = big.join(small, Seq("k"), "inner")
    val salted = Joins.saltedJoin(big, small, "k", salt = 8)

    assert(salted.count() == plain.count())
    val a = plain.select("k", "payload", "name").collect().map(_.toSeq).toSet
    val b = salted.select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("saltedJoin left_outer keeps unmatched big rows exactly once") {
    val big = Seq((1, "x"), (42, "nomatch")).toDF("k", "v")
    val small = Seq((1, "one")).toDF("k", "name")
    val out = Joins.saltedJoin(big, small, "k", salt = 4, joinType = "left_outer")
    assert(out.count() == 2)
    assert(out.filter($"k" === 42 && $"name".isNull).count() == 1)
  }
}

class MultimodalResizeSpec extends SparkSpec {
  import spark.implicits._

  test("resizeStub scales the byte budget by integer area ratio") {
    val docs = Seq((1L, "a" * 100)).toDF("doc_id", "text")
    // 'a'=97: width = 32+97%64 = 65, height = 32+100%64 = 68, n_bytes = 100
    val out = Multimodal.resizeStub(Multimodal.withBlob(docs), 48, 48)
    val m = out.select($"doc_id", $"meta.width", $"meta.height", $"meta.n_bytes",
      octet_length($"blob").as("payload")).head()
    assert(m.getInt(1) == 48 && m.getInt(2) == 48)
    val expected = math.max(1L, 100L * 48 * 48 / (65L * 68))
    assert(m.getLong(3) == expected)
    assert(m.getInt(4).toLong == math.min(expected, 100L))
  }
}
