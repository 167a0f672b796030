package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Winnowing fingerprints (q73/q74): the SWA selection guarantee, edge
  * cases, and the scale-critical plan shapes.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val w = 4

  private def fingerprints(docs: org.apache.spark.sql.DataFrame) =
    TextAnalysis.winnowFingerprints(docs, k, w)

  test("winnowing guarantee: docs sharing a token run of length >= w+k-1 share a hash") {
    // shared run of exactly w+k-1 = 6 words, embedded in different contexts
    val shared = "quick brown foxes jump over rivers"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"one two three four five $shared six seven")
    ).toDF("doc_id", "text")
    val fp = fingerprints(docs)
    val common = fp.filter($"doc_id" === 1L).select("fp_hash")
      .intersect(fp.filter($"doc_id" === 2L).select("fp_hash"))
    assert(common.count() >= 1, "w+k-1 shared tokens must yield a shared selected hash")
  }

  test("identical docs produce identical fingerprint sets; disjoint docs share nothing") {
    val docs = Seq(
      (1L, "the cat sat on the mat near the door today"),
      (2L, "the cat sat on the mat near the door today"),
      (3L, "completely different words everywhere nothing matches here at all")
    ).toDF("doc_id", "text")
    val fp = fingerprints(docs)
    val s1 = fp.filter($"doc_id" === 1L).select("fp_hash").as[Long].collect().sorted.toSeq
    val s2 = fp.filter($"doc_id" === 2L).select("fp_hash").as[Long].collect().sorted.toSeq
    assert(s1 == s2 && s1.nonEmpty)
    val s3 = fp.filter($"doc_id" === 3L).select("fp_hash").as[Long].collect().toSet
    assert(s1.toSet.intersect(s3).isEmpty)
  }

  test("docs with fewer than k tokens produce no fingerprint rows") {
    val docs = Seq((1L, "only two"), (2L, ""), (3L, "   "), (4L, "one two three")).toDF("doc_id", "text")
    val got = fingerprints(docs).select("doc_id").distinct().as[Long].collect().toSet
    assert(got == Set(4L), s"only the k-token doc fingerprints: $got")
  }

  test("density: selection keeps a strict subset of gram hashes for long docs") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val nSel = fingerprints(docs).count()
    val nGrams = 200 - k + 1
    assert(nSel < nGrams, s"winnowing must thin the gram set ($nSel vs $nGrams)")
    // expected density ~ 2/(w+1); allow generous slack for distinct-collapse
    assert(nSel <= nGrams * 2 / (w + 1) + w, s"density way off: $nSel of $nGrams")
  }

  test("candidate pairs: shared-run docs pair up; the df mask prunes boilerplate pairing") {
    val boiler = "copyright license terms apply to this whole document entirely always"
    // 8 docs all carrying the same boilerplate, otherwise disjoint
    val boilerDocs = (1L to 8L).map(i => (i, s"unique$i words$i here$i $boiler"))
    val twins = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
                    (101L, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"))
    val docs = (boilerDocs ++ twins).toDF("doc_id", "text")
    def pairsAt(maxDf: Int): Set[(Long, Long)] =
      TextAnalysis.winnowCandidatePairs(docs, k, w, maxDf)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val unmasked = pairsAt(1000)
    val masked = pairsAt(4)
    assert(masked.contains((100L, 101L)), s"twins must pair: $masked")
    // unmasked: every boilerplate doc pairs with every other (28 pairs)
    assert(unmasked.count { case (a, b) => a <= 8L && b <= 8L } == 28, s"$unmasked")
    // the df<=4 mask kills every hash selected in all 8 docs; only
    // boundary-context selections (a boilerplate gram selected in <=4
    // docs because each doc's unique prefix shifts its window minima)
    // can still pair — correct SWA behavior, and necessarily far
    // sparser than all-pairs
    val residue = masked.count { case (a, b) => a <= 8L && b <= 8L }
    assert(residue < 28 / 2, s"df mask must prune most boilerplate pairs, got $residue: $masked")
    assert(masked.subsetOf(unmasked), "mask must only remove pairs")
  }

  test("winnowClusters: transitive closure over the pair graph; singletons self-label") {
    // A and C share nothing directly, but both share a long run with B
    val runAB = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val runBC = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, s"start $runAB finish unrelated words here"),
      (2L, s"$runAB middle $runBC"),
      (3L, s"other prefix $runBC trailing bits"),
      (9L, "completely standalone document with unique content only")
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.winnowClusters(docs)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L,
      s"A~B~C must collapse to the component min: $got")
    assert(got(9L) == 9L, s"singleton labels itself: $got")
  }

  test("native graft_winnow equals the pure-SQL portable formulation bit for bit (real corpus)") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.selectExpr("doc_id", s"${TextAnalysis.winnowSelectSql("text", k, w)} AS fp")
    val portable = docs.selectExpr("doc_id", s"${TextAnalysis.winnowSelectPortableSql("text", k, w)} AS fp")
    assert(native.exceptAll(portable).isEmpty && portable.exceptAll(native).isEmpty,
      "native and portable winnow selections must agree on every document")
    // and the native form stays INSIDE whole-stage codegen (the point:
    // the HOF form is CodegenFallback; feeding graft_winnow the raw
    // split() keeps the projection fused)
    native.collect()
    val p = native.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"native winnow must stay a shuffle-free projection:\n$p")
    assert(p.linesIterator.exists(l => l.contains("Project") && l.contains("graft_winnow") && l.trim.startsWith("*")),
      s"graft_winnow projection must be whole-stage-codegen fused:\n$p")
  }

  test("winnowDedupCorpus keeps exactly the min-id member of each clone cluster") {
    val runAB = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (5L, s"first variant $runAB with trailing content"),
      (2L, s"second variant $runAB and different trailing words"),
      (9L, "completely standalone document with unique content only today")
    ).toDF("doc_id", "text")
    val kept = graft.dedup.Dedup.winnowDedupCorpus(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 9L), s"min-id per cluster plus singletons: $kept")
  }

  test("CC driver union-find and distributed loop label identically (chains + clique + singleton)") {
    // a 6-chain (diameter stresses the loop), a 3-clique, and isolates
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L),
      (20L, 21L), (20L, 22L), (21L, 22L)
    ).toDF("id_a", "id_b")
    val docs = ((10L to 15L) ++ (20L to 22L) ++ Seq(99L)).toDF("doc_id")
    def run(limit: Long) = graft.dedup.Dedup
      .clusterFromPairs(docs, pairs, "doc_id", maxIters = 20, "spec", driverPairLimit = limit)
      .as[(Long, Long)].collect().toMap
    val driver = run(Long.MaxValue)
    val distributed = run(0L)
    assert(driver == distributed, s"paths disagree:\n$driver\nvs\n$distributed")
    assert((10L to 15L).forall(driver(_) == 10L), s"chain collapses to min: $driver")
    assert((20L to 22L).forall(driver(_) == 20L), s"clique collapses to min: $driver")
    assert(driver(99L) == 99L)
  }

  test("q73 plan: one shuffle-free codegen projection") {
    val df = SparkEntry.queries("q73_winnow_fingerprint")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"fingerprinting must not shuffle:\n$p")
  }

  test("q74 plan: no cartesian/all-pairs node; join stays equi-join on fp_hash") {
    val df = SparkEntry.queries("q74_winnow_pairs")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"pair generation must not go all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"pair join must stay equi-join:\n$p")
  }
}
