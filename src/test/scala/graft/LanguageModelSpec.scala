package graft

import org.apache.spark.sql.functions._

import graft.text.LanguageModel

/** CCNet-style trigram-LM perplexity filtering, and the portable-ln
  * kernel it rides on (IEEE-exact ops only, so Spark / DuckDB / plain
  * Java evaluate bit-identical doubles).
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("portable ln: Spark-evaluated SQL is bit-identical to the Java reference shape") {
    val ns = (1L to 4096L) ++ Seq(999983L, 1000003L, 1L << 40, (1L << 52) + 12345L)
    val got = ns.toDF("n")
      .withColumn("pln", expr(LanguageModel.portableLnSql("n", duck = false)))
      .select("n", "pln").as[(Long, Double)].collect().toMap
    ns.foreach { n =>
      val ref = LanguageModel.portableLnRef(n)
      assert(java.lang.Double.doubleToLongBits(got(n)) ===
        java.lang.Double.doubleToLongBits(ref), s"n=$n got=${got(n)} ref=$ref")
    }
  }

  test("portable ln kernel: graft_pln / graft_lp_nano are bit-identical to the SQL macro") {
    // the codegen kernel (r19 verdict item 1) replaced the ~128x
    // macro expansion in the LM hot path — the oracle still replays
    // the duck-side macro, so the two spellings must never diverge
    val pairs = for {
      num <- Seq(1L, 2L, 3L, 7L, 100L, 999983L, 1L << 40, (1L << 52) + 12345L)
      den <- Seq(1L, 5L, 10007L, 1L << 33)
    } yield (num, den)
    val got = pairs.toDF("num", "den")
      .withColumn("pln_macro", expr(LanguageModel.portableLnSql("num", duck = false)))
      .withColumn("pln_kernel", expr("graft_pln(num)"))
      .withColumn("lp_macro", expr(LanguageModel.lpNanoSql("num", "den", duck = false)))
      .withColumn("lp_kernel", expr("graft_lp_nano(num, den)"))
      .select("num", "den", "pln_macro", "pln_kernel", "lp_macro", "lp_kernel")
      .as[(Long, Long, Double, Double, Long, Long)].collect()
    got.foreach { case (num, den, pm, pk, lm, lk) =>
      assert(java.lang.Double.doubleToLongBits(pm) ===
        java.lang.Double.doubleToLongBits(pk), s"graft_pln($num): macro=$pm kernel=$pk")
      assert(lm === lk, s"graft_lp_nano($num, $den): macro=$lm kernel=$lk")
    }
  }

  test("portable ln: within 4 ulps of Math.log across the count range") {
    var n = 1L
    while (n < (1L << 50)) {
      val ref = math.log(n.toDouble)
      val got = LanguageModel.portableLnRef(n)
      val tol = 4 * math.max(math.ulp(ref), java.lang.Double.MIN_VALUE)
      assert(math.abs(got - ref) <= tol, s"n=$n got=$got ref=$ref")
      n = n * 3 + 1
    }
  }

  test("perplexity: in-domain docs score lower avg_nll than shuffled-vocab docs") {
    // train slice (doc_id % 10 < 3) speaks a tiny regular language;
    // scored docs either reuse its phrases (in-domain) or use unseen
    // vocabulary (out-of-domain) — the model must rank them apart
    val phrase = "the quick brown fox jumps over the lazy dog again and again"
    val inDomain = (0L until 30L).map(i => (i, s"$phrase number $i", "en"))
    val outDomain = Seq((94L, "zxq wvut kjh gfd zxq plmo qazx wsed rfgt yhuj", "en"))
    val docs = (inDomain ++ outDomain).toDF("doc_id", "text", "lang")
    val out = LanguageModel.perplexityScores(docs)
      .select("doc_id", "avg_nll", "ppl_bucket").as[(Long, Double, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!out.contains(0L), "train docs are not scored")
    assert(out.contains(94L))
    val inScores = out.filterNot(_._1 == 94L).values.map(_._1)
    assert(inScores.nonEmpty)
    assert(out(94L)._1 > inScores.max,
      s"gibberish ${out(94L)._1} should exceed in-domain max ${inScores.max}")
    assert(out(94L)._2 === 3, "gibberish lands in the tail tercile")
    assert(out.values.map(_._2).toSet.subsetOf(Set(1, 2, 3)))
  }

  test("perplexity plan: model joins broadcast, no cartesian anywhere") {
    val docs = (0L until 40L).map(i => (i, s"alpha beta gamma delta $i", "en"))
      .toDF("doc_id", "text", "lang")
    val plan = LanguageModel.perplexityScores(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "scoring must never form a cross product")
  }

  test("cutpoint buckets agree with exact terciles up to quantile boundaries") {
    val docs = (0L until 200L).map { i =>
      // near-continuous scores (a tie-heavy fixture would measure
      // NTILE's tie-splitting, not the cutpoint path): each doc mixes
      // the shared phrase with a doc-unique token block whose length
      // varies, so avg_nll is distinct per doc almost everywhere
      val known = "alpha beta gamma delta epsilon zeta " * (1 + (i % 3).toInt)
      val unique = s"tok$i " * (1 + (i % 7).toInt)
      (i, known + unique, if (i % 2 == 0) "en" else "fr")
    }.toDF("doc_id", "text", "lang")
    val exact = LanguageModel.perplexityScores(docs)
    val approx = LanguageModel.bucketsByCutpoints(exact)
      .select("doc_id", "lang", "avg_nll", "ppl_bucket").as[(Long, String, Double, Int)].collect()
    val exactMap = exact.select("doc_id", "ppl_bucket").as[(Long, Int)].collect().toMap
    // within a language, bucket order respects score order by construction
    approx.groupBy(_._2).values.foreach { grp =>
      grp.sortBy(_._3).foldLeft(0) { case (prev, (_, _, _, b)) =>
        assert(b >= prev); b
      }
    }
    val agree = approx.count { case (id, _, _, b) => exactMap(id) == b }
    assert(agree.toDouble / approx.length >= 0.9,
      s"only $agree/${approx.length} agree with exact terciles")
  }

  test("DSIR: source docs resembling the target corpus outrank alien-vocabulary docs") {
    // target slice (doc_id % 10 < 3) speaks "wiki" vocabulary; source
    // docs either share it or use crawl-junk tokens — importance
    // weights must rank the look-alikes into the kept quarter
    val target = (0L until 30L).filter(_ % 10 < 3).map(i =>
      (i, s"science history culture method theory result number $i", "en"))
    // source ids must dodge the doc_id % 10 < 3 target split
    val lookalike = (104L until 110L).map(i =>
      (i, "science method theory result history of culture", "en"))
    val junk = (0 until 18).map { j =>
      val i = 300L + (j / 7) * 10 + 3 + (j % 7)
      (i, s"zzz$i qqq${i * 7} click here buy now spam${i % 5} xx yy", "en")
    }
    val docs = (target ++ lookalike ++ junk).toDF("doc_id", "text", "lang")
    val out = LanguageModel.dsirSelect(docs)
      .select("doc_id", "rk").as[(Long, Int)].collect().toMap
    // 24 source docs -> top 6 kept; exactly the 6 look-alikes
    assert(out.keySet === (104L until 110L).toSet,
      s"kept ${out.keySet.toSeq.sorted} instead of the look-alikes")
    assert(out.values.toSeq.sorted === (1 to 6))
  }

  test("DSIR: weights are exact and partition-count invariant; the model broadcasts") {
    val docs = (0L until 80L).map(i =>
      (i, s"alpha beta ${i % 9} gamma delta tok${i % 17}", "xx")).toDF("doc_id", "text", "lang")
    val a = LanguageModel.dsirSelect(docs.repartition(1))
      .select("doc_id", "weight_nano").as[(Long, Long)].collect().toMap
    val b = LanguageModel.dsirSelect(docs.repartition(13))
      .select("doc_id", "weight_nano").as[(Long, Long)].collect().toMap
    assert(a === b)
    val plan = LanguageModel.dsirSelect(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("scores are partition-count invariant (order-free BIGINT sums)") {
    val docs = (0L until 60L).map(i =>
      (i, s"one two three four five six seven ${i % 7} ${i % 3}", "xx"))
      .toDF("doc_id", "text", "lang")
    val a = LanguageModel.perplexityScores(docs.repartition(1))
      .select("doc_id", "logprob_nano").as[(Long, Long)].collect().toMap
    val b = LanguageModel.perplexityScores(docs.repartition(13))
      .select("doc_id", "logprob_nano").as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
