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

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("graft_topk returns k best by (score desc, id1 asc, id2 asc) per group") {
    val df = Seq(
      ("a", 5.0, 10L, 1), ("a", 5.0, 9L, 2), ("a", 7.0, 3L, 1), ("a", 1.0, 1L, 1),
      ("b", 2.0, 4L, 9), ("b", 2.0, 4L, 3)
    ).toDF("g", "score", "id1", "id2")
    val out = df.groupBy($"g")
      .agg(expr("graft_topk(score, id1, id2, 3)").as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "e")))
      .select($"g", $"pos", $"e.score", $"e.id1", $"e.id2")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      ("a", 0, 7.0, 3L, 1), ("a", 1, 5.0, 9L, 2), ("a", 2, 5.0, 10L, 1),
      ("b", 0, 2.0, 4L, 3), ("b", 1, 2.0, 4L, 9)
    ))
  }

  test("graft_topk merge across many partitions equals global ordering") {
    val n = 5000
    val df = spark.range(n).repartition(13)
      .selectExpr("CAST(id % 7 AS STRING) AS g",
        "CAST((id * 2654435761) % 100003 AS DOUBLE) AS score", "id AS id1", "CAST(id % 97 AS INT) AS id2")
    val got = df.groupBy($"g").agg(expr("graft_topk(score, id1, id2, 5)").as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "e")))
      .select($"g", $"pos", $"e.score", $"e.id1")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    val expect = df.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.toSeq.sortBy(t => (-t._2, t._3, t._4)).take(5).zipWithIndex
          .map { case (t, i) => (g, i, t._2, t._3) }
      }.toSet
    assert(got == expect)
  }

  test("graft_topk ignores null scores and handles groups smaller than k") {
    val df = Seq((Some(1.0), 1L), (None, 2L)).toDF("score", "id1")
      .selectExpr("'g' AS g", "score", "id1", "CAST(0 AS INT) AS id2")
    val out = df.groupBy($"g").agg(expr("graft_topk(score, id1, id2, 10)").as("top"))
      .selectExpr("size(top) AS n").head().getInt(0)
    assert(out == 1)
  }

  test("graft_topk ignores NaN scores (NaN compares false both ways)") {
    val df = Seq((Double.NaN, 1L), (2.0, 2L), (Double.NaN, 3L), (1.0, 4L))
      .toDF("score", "id1")
      .selectExpr("'g' AS g", "score", "id1", "CAST(0 AS INT) AS id2")
    val ids = df.groupBy($"g").agg(expr("graft_topk(score, id1, id2, 3)").as("top"))
      .selectExpr("transform(top, x -> x.id1) AS ids").head().getSeq[Long](0)
    assert(ids == Seq(2L, 4L))
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
