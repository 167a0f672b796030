package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Joins
import graft.pipeline.{Aggregations, Dimensions}

/** Property-based invariants (SURVEY.md §5): randomized inputs, exact
  * structural guarantees. Few high-value properties over many cheap
  * Spark jobs — each forAll round-trips the cluster, so minSuccessful
  * is kept small.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic ScalaCheck sampling (no scalatestplus bridge in the
    * offline cache): fixed seeds, `rounds` samples per property.
    */
  private def forAllSampled[T](g: Gen[T], rounds: Int = 5)(body: T => Unit): Unit =
    (0 until rounds).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val keyRows = Gen.listOfN(60, Gen.zip(Gen.choose(0, 5), Gen.choose(-100, 100)))

  test("saltedJoin ≡ plain join for arbitrary key skew, all join types") {
    forAllSampled(Gen.zip(keyRows, Gen.oneOf("inner", "left_outer"))) { case (rows, joinType) =>
      {
        val big = rows.toDF("k", "v")
        val small = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
        val plain = big.join(small, Seq("k"), joinType)
          .select("k", "v", "name").collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
        val salted = Joins.saltedJoin(big, small, "k", salt = 5, joinType = joinType)
          .select("k", "v", "name").collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
        assert(plain == salted) // multiset equality
      }
    }
  }

  test("dateDim covers [min,max] with no gaps for arbitrary date ranges") {
    val dateGen = Gen.zip(Gen.choose(0L, 3000L), Gen.choose(0L, 200L))
    forAllSampled(dateGen) { case (startOffset, span) =>
      val d0 = java.time.LocalDate.of(2015, 1, 1).plusDays(startOffset)
      val d1 = d0.plusDays(span)
      val src = Seq(d0.toString, d1.toString).toDF("d").withColumn("d", to_date($"d"))
      val dim = Dimensions.dateDim(spark, src, "d")
      assert(dim.count() == span + 1)
      assert(dim.select(countDistinct($"full_date")).head().getLong(0) == span + 1)
    }
  }

  test("topPairs output is <= k, sorted by count desc, and a subset of the full aggregate") {
    forAllSampled(keyRows) { rows =>
      {
        val fact = rows.toDF("kk", "vv").select(
          concat(lit("N"), $"kk").as("cust_nation"),
          concat(lit("M"), ($"vv" % 3)).as("supp_nation"),
          abs($"vv").cast("double").as("l_quantity"),
          lit(10.0).as("l_extendedprice"),
          lit(1.0).as("revenue"))
        val k = 3
        val top = Aggregations.topPairs(fact, k).collect()
        assert(top.length <= k)
        val counts = top.map(_.getAs[Long]("trip_count")).toSeq
        assert(counts == counts.sorted.reverse)
        val full = fact.groupBy("cust_nation", "supp_nation").count()
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        top.foreach { r =>
          assert(full((r.getString(0), r.getString(1))) == r.getAs[Long]("trip_count"))
        }
      }
    }
  }

  test("readIncremental(from) ∪ readVersion(from) ≡ current read on append-only histories") {
    val appendBatches = Gen.listOfN(4, Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 99L), Gen.alphaStr)))
    forAllSampled(appendBatches, rounds = 3) { batches =>
      val io = graft.io.TableIO(spark,
        java.nio.file.Files.createTempDirectory("graft_prop_inc_").toString)
      val t = "default.p"
      batches.foreach(b => io.append(b.toDF("id", "s"), t))
      def multiset(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      (1 to batches.size).foreach { from =>
        val recombined = multiset(io.readVersion(t, from).unionAll(io.readIncremental(t, from)))
        assert(recombined == multiset(io.read(t)), s"split at version $from diverged")
      }
    }
  }

  test("Morton zvalue is monotone along each axis (the locality that makes tiles prune)") {
    forAllSampled(Gen.listOfN(40, Gen.zip(Gen.choose(0L, 1L << 30), Gen.choose(0L, 1L << 30))), rounds = 3) { pts =>
      val z = pts.toDF("a", "b")
        .select($"a", $"b",
          graft.functions.ZOrder.zvalue($"a", $"b").as("z"),
          graft.functions.ZOrder.zvalue($"a" + 1, $"b").as("za"),
          graft.functions.ZOrder.zvalue($"a", $"b" + 1).as("zb"))
        .as[(Long, Long, Long, Long, Long)].collect()
      z.foreach { case (a, b, zv, za, zb) =>
        assert(za > zv, s"not monotone in a at ($a, $b)")
        assert(zb > zv, s"not monotone in b at ($a, $b)")
      }
    }
  }

  test("minhash estimated jaccard is within tolerance of exact jaccard") {
    // deterministic sampled check (not forAll — one spark job suffices):
    // identical sets → est 1.0; disjoint sets → est ~0
    val docs = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff"),
      (2L, "aaaa bbbb cccc dddd eeee ffff"),
      (3L, "zzzz yyyy xxxx wwww vvvv uuuu")
    ).toDF("doc_id", "text")
    val sigs = graft.dedup.Dedup.withMinhash(docs, k = 64)
      .select($"doc_id", $"minhash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    def est(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(est(sigs(1L), sigs(2L)) == 1.0)
    assert(est(sigs(1L), sigs(3L)) < 0.2)
  }

  test("winnow selection ⊆ gram hashes, and shared w+k-1 runs collide, for random docs") {
    // driver-side reference of the portable gram hash (first 60 bits
    // of md5 — the exact construction winnowSelectSql evaluates)
    def gramHashes(ts: Seq[String]): Set[Long] =
      if (ts.size < 3) Set.empty
      else ts.sliding(3).map(_.mkString(" ")).map { g =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16)
      }.toSet
    val word = Gen.oneOf("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st", "uv", "wx")
    val docGen = Gen.listOfN(30, word)
    forAllSampled(Gen.zip(docGen, docGen, Gen.listOfN(6, word))) { case (da, db, run) =>
      // a shared run of exactly w + k - 1 = 6 tokens, spliced into
      // different positions of two otherwise-random docs
      val ta = da.take(12) ++ run ++ da.drop(12)
      val tb = db.take(7) ++ run ++ db.drop(7)
      val docs = Seq((1L, ta.mkString(" ")), (2L, tb.mkString(" "))).toDF("doc_id", "text")
      val fp = graft.text.TextAnalysis.winnowFingerprints(docs)
        .as[(Long, Long)].collect()
      val fa = fp.collect { case (1L, h) => h }.toSet
      val fb = fp.collect { case (2L, h) => h }.toSet
      // soundness: every selected hash IS a gram hash of its document
      assert(fa.subsetOf(gramHashes(ta)), "selection must be a subset of doc 1's gram hashes")
      assert(fb.subsetOf(gramHashes(tb)), "selection must be a subset of doc 2's gram hashes")
      // the winnowing guarantee: the shared run spans one full window
      // (4 consecutive grams) in BOTH docs, whose min is selected in both
      assert(fa.intersect(fb).nonEmpty, s"shared 6-token run must collide: run=$run")
    }
  }
}
