package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ViewMaintenance
import graft.operators.ViewMaintenance.Measure
import graft.pipeline.{Aggregations, Quality}

/** Incremental view maintenance, the referential audit, and the
  * segment-decile profile (q85–q87).
  */
class MaintenanceAuditSpec extends SparkSpec {
  import spark.implicits._

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val keys = Seq("grp")
  private val measures = Seq(Measure("amount", "total", 2))

  test("applyDelta == full recompute across inserts and deletes") {
    val base = Seq(("a", 10.25), ("a", 1.50), ("b", 3.00), ("c", 7.75))
      .toDF("grp", "amount")
    val v1 = ViewMaintenance.summarize(base, keys, "n", measures)
    // v2 inserts into a + a NEW group d; v3 deletes one a row and all of c
    val changelog = Seq(
      ("a", 2.25, "INSERT", 2), ("d", 9.00, "INSERT", 2),
      ("a", 1.50, "DELETE", 3), ("c", 7.75, "DELETE", 3)
    ).toDF("grp", "amount", "_change_type", "_change_version")
    val maintained = ViewMaintenance.applyDelta(v1, changelog, keys, "n", measures)
    val finalState = Seq(("a", 10.25), ("a", 2.25), ("b", 3.00), ("d", 9.00))
      .toDF("grp", "amount")
    val recomputed = ViewMaintenance.summarize(finalState, keys, "n", measures)
    assert(sorted(maintained) === sorted(recomputed))
    // the zeroed group is GONE, not present with n=0
    assert(maintained.filter($"grp" === "c").isEmpty)
    // the delta-born group is present with base-side nulls coalesced
    assert(maintained.filter($"grp" === "d").select("n").as[Long].head() === 1L)
  }

  test("applyDelta with an empty changelog is the identity") {
    val base = Seq(("a", 1.00), ("b", 2.00)).toDF("grp", "amount")
    val v1 = ViewMaintenance.summarize(base, keys, "n", measures)
    val empty = Seq.empty[(String, Double, String, Int)]
      .toDF("grp", "amount", "_change_type", "_change_version")
    assert(sorted(ViewMaintenance.applyDelta(v1, empty, keys, "n", measures)) === sorted(v1))
  }

  test("applyDelta merges NULL group keys null-safely and equals a recompute") {
    val base = Seq((Some("a"), 1.00), (None, 2.00), (None, 3.00)).toDF("grp", "amount")
    val v1 = ViewMaintenance.summarize(base, keys, "n", measures)
    val changelog = Seq(
      (None: Option[String], 4.00, "INSERT", 2),
      (None: Option[String], 2.00, "DELETE", 2)
    ).toDF("grp", "amount", "_change_type", "_change_version")
    val maintained = ViewMaintenance.applyDelta(v1, changelog, keys, "n", measures)
    val finalState = Seq((Some("a"), 1.00), (None, 3.00), (None, 4.00)).toDF("grp", "amount")
    val recomputed = ViewMaintenance.summarize(finalState, keys, "n", measures)
    assert(sorted(maintained) === sorted(recomputed))
    // exactly ONE null-key row (the naive equi-join would split it in two)
    assert(maintained.filter($"grp".isNull).count() === 1L)
  }

  test("applyDelta rejects unknown change types loudly") {
    val base = Seq(("a", 1.00)).toDF("grp", "amount")
    val v1 = ViewMaintenance.summarize(base, keys, "n", measures)
    val weird = Seq(("a", 1.00, "UPDATE_AFTER", 2)).toDF("grp", "amount", "_change_type", "_change_version")
    val e = intercept[Exception] {
      ViewMaintenance.applyDelta(v1, weird, keys, "n", measures).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("unknown _change_type")), msgs(e).mkString(" | "))
  }

  test("applyDelta fails loudly when the changelog underflows a group") {
    val base = Seq(("a", 1.00)).toDF("grp", "amount")
    val v1 = ViewMaintenance.summarize(base, keys, "n", measures)
    val bad = Seq(("a", 1.00, "DELETE", 2), ("a", 2.00, "DELETE", 2))
      .toDF("grp", "amount", "_change_type", "_change_version")
    val e = intercept[Exception] {
      ViewMaintenance.applyDelta(v1, bad, keys, "n", measures).collect()
    }
    assert(e.getMessage.contains("IVM underflow") ||
      Option(e.getCause).exists(_.getMessage.contains("IVM underflow")))
  }

  test("IVM fuzz: 30 random changelog steps always equal a full recompute") {
    val rnd = new scala.util.Random(1234)
    val groups = Vector("a", "b", "c", "d", "e")
    // model state: multiset of (grp, amount)
    var state = Vector.tabulate(40)(i => (groups(rnd.nextInt(groups.size)),
      (rnd.nextInt(100000) + 1) / 100.0))
    var summary = ViewMaintenance.summarize(state.toDF("grp", "amount"), keys, "n", measures)
    for (step <- 1 to 30) {
      // random inserts, and deletes of rows that EXIST in the state
      val inserts = Vector.fill(rnd.nextInt(4))((groups(rnd.nextInt(groups.size)),
        (rnd.nextInt(100000) + 1) / 100.0))
      val nDel = rnd.nextInt(math.min(4, state.size) + 1)
      val delIdx = rnd.shuffle(state.indices.toVector).take(nDel)
      val deletes = delIdx.map(state)
      state = state.indices.filterNot(delIdx.contains).map(state).toVector ++ inserts
      val changelog =
        (inserts.map { case (g, a) => (g, a, "INSERT", step) } ++
          deletes.map { case (g, a) => (g, a, "DELETE", step) })
          .toDF("grp", "amount", "_change_type", "_change_version")
      summary = ViewMaintenance.applyDelta(summary, changelog, keys, "n", measures)
      // materialize so decimal accumulation chains don't build a giant lazy plan
      summary = summary.localCheckpoint(true)
      val expect = ViewMaintenance.summarize(state.toDF("grp", "amount"), keys, "n", measures)
      assert(sorted(summary) === sorted(expect), s"diverged at step $step")
    }
  }

  test("referentialAudit is all-zero on a consistent star and counts planted corruption") {
    val nation = Seq((0L, "A", 0L), (1L, "B", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
    val customer = Seq((1L, "c1", 0L), (2L, "c2", 1L), (3L, "c3", 1L))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val supplier = Seq((1L, "s1", 0L)).toDF("s_suppkey", "s_name", "s_nationkey")
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1), (10L, 2), (11L, 1)).toDF("l_orderkey", "l_linenumber")

    val clean = Quality.referentialAudit(lineitem, orders, customer, supplier, nation)
    assert(clean.agg(sum("violations")).as[Long].head() === 0L)
    assert(clean.count() === 6L)

    // plant: 2 orphan lineitems (one null FK), 1 orphan order,
    // 1 orphan supplier nation, a duplicated order PK (2 extra rows)
    val badLineitem = lineitem.unionByName(
      Seq[(java.lang.Long, Int)]((java.lang.Long.valueOf(99L), 1), (null, 2))
        .toDF("l_orderkey", "l_linenumber"))
    val badOrders = orders.unionByName(
      Seq((13L, 77L), (10L, 1L), (10L, 1L)).toDF("o_orderkey", "o_custkey"))
    val badSupplier = supplier.unionByName(Seq((2L, "s2", 9L)).toDF("s_suppkey", "s_name", "s_nationkey"))

    val audit = Quality.referentialAudit(badLineitem, badOrders, customer, badSupplier, nation)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audit("lineitem_orphan_orderkey") === 2L)
    assert(audit("orders_orphan_custkey") === 1L)
    assert(audit("customer_orphan_nationkey") === 0L)
    assert(audit("supplier_orphan_nationkey") === 1L)
    assert(audit("orders_dup_orderkey") === 2L)
    assert(audit("customer_dup_custkey") === 0L)
  }

  test("segmentDeciles: ntile buckets and revenue stats on a known answer") {
    // 12 customers in one segment (first 2 deciles get 2 customers),
    // 3 in another; two order-less customers rank at revenue 0
    val customer = ((1L to 12L).map(i => (i, "BIG")) ++ Seq((21L, "SMALL"), (22L, "SMALL"), (23L, "SMALL")))
      .toDF("c_custkey", "c_mktsegment")
    val orders = ((1L to 10L).flatMap(i => Seq((i * 100, i, i * 10.0), (i * 100 + 1, i, 0.50))) ++
      Seq((2100L, 21L, 5.00))).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = Aggregations.segmentDeciles(customer, orders)
    val big = out.filter($"c_mktsegment" === "BIG").orderBy("decile")
      .select("decile", "n_customers", "total_revenue", "min_revenue", "max_revenue")
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(big.length === 10)
    assert(big.map(_._2).toSeq === Seq(2L, 2L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L))
    // decile 1 = customers 10 (100.5) and 9 (90.5); last = order-less customer 12 (0)
    assert(big(0)._3 === 191.0 && big(0)._4 === 90.5 && big(0)._5 === 100.5)
    assert(big(9)._3 === 0.0)
    val small = out.filter($"c_mktsegment" === "SMALL")
    // 3 customers -> deciles 1..3, one each; customer 21 (5.0) leads
    assert(small.count() === 3)
    assert(small.filter($"decile" === 1).select("total_revenue").as[Double].head() === 5.0)
  }
}
