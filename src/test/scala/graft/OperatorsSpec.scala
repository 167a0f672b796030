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

  test("intervalJoin equals the naive inequality join, incl. bucket-spanning and boundary cases") {
    val points = Seq(
      (1L, "2024-01-01 09:59:59"), // just before any interval
      (2L, "2024-01-01 10:00:00"), // == start of A (closed)
      (3L, "2024-01-01 11:30:00"), // inside A, second covered hour
      (4L, "2024-01-01 12:15:00"), // == end of A (closed), inside B
      (5L, "2024-01-01 23:30:00"), // inside C, before midnight
      (6L, "2024-01-02 00:10:00")  // inside C, after midnight (bucket-spanning)
    ).toDF("p_id", "p_ts").select($"p_id", $"p_ts".cast("timestamp").as("p_ts"))
    val intervals = Seq(
      ("A", "2024-01-01 10:00:00", "2024-01-01 12:15:00"),
      ("B", "2024-01-01 12:00:00", "2024-01-01 12:59:00"),
      ("C", "2024-01-01 22:00:00", "2024-01-02 01:00:00") // spans midnight
    ).toDF("iv", "s", "e")
      .select($"iv", $"s".cast("timestamp").as("s"), $"e".cast("timestamp").as("e"))

    val bucketed = Joins.intervalJoin(points, intervals, "p_ts", "s", "e")
      .select("p_id", "iv").as[(Long, String)].collect().toSet
    val naive = points.join(intervals, $"p_ts" >= $"s" && $"p_ts" <= $"e")
      .select("p_id", "iv").as[(Long, String)].collect().toSet
    assert(bucketed === naive)
    assert(bucketed === Set((2L, "A"), (3L, "A"), (4L, "A"), (4L, "B"), (5L, "C"), (6L, "C")))
  }

  test("intervalJoin plans an equi-join: no nested-loop, no cartesian") {
    val points = Seq((1L, "2024-01-01 10:30:00")).toDF("p_id", "p_ts")
      .select($"p_id", $"p_ts".cast("timestamp").as("p_ts"))
    val intervals = Seq(("A", "2024-01-01 10:00:00", "2024-01-01 11:00:00"))
      .toDF("iv", "s", "e")
      .select($"iv", $"s".cast("timestamp").as("s"), $"e".cast("timestamp").as("e"))
    val p = Joins.intervalJoin(points, intervals, "p_ts", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"intervalJoin must stay an equi-join:\n$p")
  }

  test("intervalJoin rejects clashing column names and bad granularity") {
    val df = Seq((1L, "2024-01-01 10:00:00")).toDF("id", "ts")
      .select($"id", $"ts".cast("timestamp").as("ts"))
    intercept[IllegalArgumentException] {
      Joins.intervalJoin(df, df, "ts", "ts", "ts")
    }
    val iv = df.select($"id".as("iid"), $"ts".as("s"), $"ts".as("e"))
    intercept[IllegalArgumentException] {
      Joins.intervalJoin(df, iv, "ts", "s", "e", granularity = "fortnight")
    }
  }
}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin attaches the latest right row at or before each left time") {
    val left = Seq(
      (1L, 10L, "e1"), // before any right row for key 1
      (1L, 20L, "e2"), // exactly at right t=20 -> inclusive match
      (1L, 35L, "e3"), // between 30 and 40 -> matches t=30
      (2L, 50L, "e4"), // key with no right rows at all
      (3L, 5L, "e5")   // key 3 right row is later -> no match
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 20L, "r20"), (1L, 30L, "r30"), (1L, 40L, "r40"),
      (3L, 9L, "r9")
    ).toDF("k", "t", "payload")
    val out = graft.operators.Joins.asOfJoin(
      left, right, leftKey = "k", rightKey = "k",
      leftTime = "t", rightTime = "t", rightPayload = Seq("payload"))
      .collect().map(r => r.getAs[String]("tag") -> Option(r.getAs[String]("payload"))).toMap
    assert(out == Map(
      "e1" -> None, "e2" -> Some("r20"), "e3" -> Some("r30"),
      "e4" -> None, "e5" -> None))
  }

  test("asOfJoin: null-keyed right rows never leak into null-keyed left rows") {
    val left = Seq((Option.empty[Long], 10L, "ln")).toDF("k", "t", "tag")
    val right = Seq((Option.empty[Long], 5L, "rn")).toDF("k", "t", "payload")
    val out = graft.operators.Joins.asOfJoin(
      left, right, "k", "k", "t", "t", Seq("payload")).collect()
    assert(out.length == 1 && out.head.getAs[String]("payload") == null)
  }

  test("asOfJoin drops right rows whose time casts to null (no -infinity match)") {
    // "xyz" casts to null long under non-ANSI semantics (ANSI mode
    // throws instead — loud either way): pre-fix the null-cast row
    // survived the pre-cast null filter, sorted first (nulls-first
    // asc), and attached its payload to every left row of the key
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val left = Seq((1L, 3L, "ln")).toDF("k", "t", "tag")
      val right = Seq((1L, "xyz", "bad"), (1L, "5", "late")).toDF("k", "t", "payload")
      val out = graft.operators.Joins.asOfJoin(
        left, right, "k", "k", "t", "t", Seq("payload")).collect()
      assert(out.length == 1 && out.head.getAs[String]("payload") == null,
        s"no castable right time <= 3 exists, got ${out.head}")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi)
  }

  test("asOfJoin plan is a single shuffle (one window, no join node)") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "p")).toDF("k", "t", "payload")
    val plan = graft.operators.Joins.asOfJoin(
      left, right, "k", "k", "t", "t", Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not produce a join node:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"as-of must shuffle exactly once:\n$plan")
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample is deterministic, append-stable, and close to the target rate") {
    val docs = spark.range(0, 5000).toDF("doc_id")
    val a = graft.sampling.Sampling.hashSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = graft.sampling.Sampling.hashSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "same corpus, same sample")
    // membership never changes when the corpus grows
    val grown = graft.sampling.Sampling.hashSample(
      spark.range(0, 10000).toDF("doc_id"), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(grown.filter(_ < 5000) == a, "append-stable membership")
    val rate = a.size.toDouble / 5000
    assert(rate > 0.17 && rate < 0.23, s"rate $rate far from 0.2")
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val docs = spark.range(0, 6000)
      .selectExpr("id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'zh' ELSE 'de' END AS lang")
    val out = graft.sampling.Sampling.stratifiedSample(
      docs, "lang", "doc_id", Map("en" -> 0.1, "zh" -> 0.5), defaultFraction = 0.25)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(l: String) = out.getOrElse(l, 0L).toDouble / 2000
    assert(rate("en") > 0.06 && rate("en") < 0.14, s"en ${rate("en")}")
    assert(rate("zh") > 0.44 && rate("zh") < 0.56, s"zh ${rate("zh")}")
    assert(rate("de") > 0.20 && rate("de") < 0.30, s"de ${rate("de")}")
    // the sampling predicate must ride the scan, not a shuffle
    val plan = graft.sampling.Sampling.hashSample(docs, "doc_id", 0.2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "hash sample must not shuffle")
  }

  test("tokenBudgetSample admits whole docs per stratum until the budget fills") {
    // every doc is exactly 3 tokens; budget 7 admits exactly the first
    // 3 docs of each stratum in hash order (cum 3, 6, 9: 9-3=6 < 7;
    // the 4th has 12-3=9 >= 7), independent of which ids hash first
    val docs = (0 until 20).map(i =>
      (i.toLong, if (i % 2 == 0) "web" else "book", "tok aaa bbb"))
      .toDF("doc_id", "source", "text")
    val out = graft.sampling.Sampling.tokenBudgetSample(docs, "source", budget = 7L)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[String]("text"), r.getAs[Long]("cum_tokens")))
    assert(out.count(_._1 == "web") === 3)
    assert(out.count(_._1 == "book") === 3)
    // input columns survive (family contract): text rides through
    assert(out.forall(_._3 == "tok aaa bbb"))
    // boundary doc overshoots: max cum per stratum is 9 (> budget)
    assert(out.filter(_._1 == "web").map(_._4).max === 9L)
    // zero-token docs cost nothing and are admitted while the budget
    // is open; a stratum below budget keeps everything
    val mixed = Seq((1L, "s", "one two"), (2L, "s", ""), (3L, "s", "three"))
      .toDF("doc_id", "source", "text")
    val kept = graft.sampling.Sampling.tokenBudgetSample(mixed, "source", budget = 100L)
    assert(kept.count() === 3)
    // deterministic: repeated run selects the identical set
    val big = spark.range(0, 2000).selectExpr("id AS doc_id", "'w' AS source",
      "repeat('tok ', CAST(id % 7 + 1 AS INT)) AS text")
    def sel() = graft.sampling.Sampling.tokenBudgetSample(big, "source", budget = 500L)
      .select("doc_id").as[Long].collect().toSet
    val first = sel()
    assert(first === sel() && first.nonEmpty)
  }

  test("exactKPerStratum keeps exactly min(k, |stratum|) rows with dense 1..k ranks") {
    val docs = spark.range(0, 900)
      .selectExpr("id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'zh' ELSE 'de' END AS lang",
        "'w' AS source")
    val out = graft.sampling.Sampling.exactKPerStratum(docs, "lang", 25)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 25L, "zh" -> 25L, "de" -> 25L), counts.toString)
    // ranks dense 1..k per stratum; input columns survive (family contract)
    val ranks = out.groupBy("lang")
      .agg(org.apache.spark.sql.functions.collect_set(col("sample_rank")).as("rs"))
      .collect().map(_.getAs[scala.collection.Seq[Int]]("rs").toSet)
    assert(ranks.forall(_ == (1 to 25).toSet))
    assert(out.columns.toSet == Set("doc_id", "lang", "source", "sample_rank"))
    // cross-check the bounded-aggregate path against the independent
    // row_number-window formulation of the same total order
    val h52 = graft.sampling.Sampling.portableHash52Sql("doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(expr(h52).asc, col("doc_id").asc)
    val ref = docs.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 25)
      .select(col("doc_id"), col("rn").cast("int"))
      .as[(Long, Int)].collect().toSet
    val got = out.select(col("doc_id"), col("sample_rank")).as[(Long, Int)].collect().toSet
    assert(got === ref, "aggregate path must equal the window formulation")
    // k above the stratum size keeps the whole stratum
    assert(graft.sampling.Sampling.exactKPerStratum(docs, "lang", 1000).count() === 900)
    // partition-order independence: same members from a reshuffled input
    val again = graft.sampling.Sampling.exactKPerStratum(docs.repartition(7), "lang", 25)
      .select("doc_id").as[Long].collect().toSet
    assert(again === got.map(_._1))
    // a non-integral id would null out inside the aggregate and rows
    // would silently vanish — the operator must refuse it up front
    val strDocs = docs.selectExpr("CAST(doc_id AS STRING) AS doc_id", "lang", "source")
    val e = intercept[IllegalArgumentException] {
      graft.sampling.Sampling.exactKPerStratum(strDocs, "lang", 5)
    }
    assert(e.getMessage.contains("integral id column"), e.getMessage)
  }

  test("exactKPerStratum excludes NULL-id rows by declared contract") {
    // 4 non-null + 3 null ids in one stratum, k = 6: the sample is the
    // 4 non-null rows (never a null-id filler), ranks dense 1..4 — the
    // same rows the oracle's `WHERE id IS NOT NULL` form selects
    val docs = spark.range(0, 7)
      .selectExpr("CASE WHEN id < 4 THEN id END AS doc_id", "'en' AS lang")
    val out = graft.sampling.Sampling.exactKPerStratum(docs, "lang", 6)
      .select(col("doc_id"), col("sample_rank")).as[(Long, Int)].collect()
    assert(out.length === 4, out.mkString(","))
    assert(out.map(_._1).toSet === Set(0L, 1L, 2L, 3L))
    assert(out.map(_._2).sorted === Array(1, 2, 3, 4))
  }

  test("mixtureBalance downsamples every stratum toward the rarest one's count") {
    // skewed mixture: 4000 'web', 1000 'book', 200 'wiki'
    val docs = spark.range(0, 5200)
      .selectExpr("id AS doc_id",
        "CASE WHEN id < 4000 THEN 'web' WHEN id < 5000 THEN 'book' ELSE 'wiki' END AS source")
    val out = graft.sampling.Sampling.mixtureBalance(docs, "source")
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the rarest stratum survives whole; the rest land near 200,
    // within hash-quantization noise of the 200/c_s rate
    assert(counts("wiki") == 200L, s"rarest stratum must keep everything, got $counts")
    assert(counts("web") > 150 && counts("web") < 250, s"web ${counts("web")}")
    assert(counts("book") > 150 && counts("book") < 250, s"book ${counts("book")}")
    // deterministic: same corpus, same members
    val again = graft.sampling.Sampling.mixtureBalance(docs, "source")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // the threshold side is broadcast — the corpus itself must not
    // hash-exchange for the join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "threshold join must broadcast")
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

  test("real WAV round trip: decoded header + sample sums equal the analytic waveform; corrupt blob refuses") {
    val docs = (0L until 30L).toDF("doc_id")
    val stats = Multimodal.decodeAudioStats(Multimodal.withAudioBlob(docs))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(stats.size === 30)
    for (id <- 0L until 30L) {
      val n = Multimodal.synthAudioLen(id)
      var sum = 0L
      var abs = 0L
      for (i <- 0 until n) {
        val v = Multimodal.synthSample(id, i)
        sum += v; abs += math.abs(v)
      }
      // 8000 comes from the DECODED RIFF header, not the synth
      assert(stats(id) === ((8000, n.toLong, sum, abs)), s"doc $id")
    }
    // an undecodable blob refuses loudly, never fake-stats
    val junk = Seq((99L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "blob")
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.decodeAudioStats(junk).collect())
    assert(Option(e.getCause).nonEmpty)
  }

  test("real PNG round trip: decoded dims and pixel sums equal the analytic raster") {
    val docs = (0L until 40L).toDF("doc_id")
    val stats = Multimodal.decodeImageStats(Multimodal.withImageBlob(docs))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(stats.size === 40)
    for (id <- 0L until 40L) {
      val (w, h) = Multimodal.synthDims(id)
      var want = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        want += Multimodal.synthChannel(id, c, x, y)
      assert(stats(id) === ((w, h, want)), s"doc $id")
    }
  }

  test("nearest-neighbor resize maps target (i,j) to source (i*w/tw, j*h/th) exactly") {
    val docs = Seq(5L, 17L).toDF("doc_id")
    val resized = Multimodal.decodeImageStats(
      Multimodal.resizeImagesNN(Multimodal.withImageBlob(docs), 16, 16))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    for (id <- Seq(5L, 17L)) {
      val (w, h) = Multimodal.synthDims(id)
      var want = 0L
      for (j <- 0 until 16; i <- 0 until 16; c <- 0 until 3)
        want += Multimodal.synthChannel(id, c, (i * w) / 16, (j * h) / 16)
      assert(resized(id) === ((16, 16, want)), s"doc $id")
    }
  }

  test("decodeImageStats refuses an undecodable blob loudly") {
    val junk = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "blob")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImageStats(junk).collect()
    }
    assert(e.getMessage.contains("not a decodable image") ||
      Option(e.getCause).exists(_.getMessage.contains("not a decodable image")),
      s"got: ${e.getMessage}")
  }
}
