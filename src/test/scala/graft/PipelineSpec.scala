package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.pipeline.{Aggregations, Dimensions, Fact, Ingestion, Quality}

class IngestionSpec extends SparkSpec {
  import spark.implicits._

  private def raw = Seq(
    // (orderkey, linenumber, qty, price, disc, shipdate)
    (1L, 1, Some(10.0), Some(1000.0), Some(0.1), Some("1995-03-15")),
    (1L, 2, None, Some(1000.0), Some(0.1), Some("1995-03-15")),      // null qty → dropped
    (2L, 1, Some(5.0), Some(-3.0), Some(0.0), Some("1995-03-16")),   // negative price → dropped
    (3L, 1, Some(2.0), Some(50000.0), Some(0.5), Some("1996-01-01")),
    (4L, 1, Some(1.0), Some(30000.0), Some(1.5), Some("1996-01-01")) // disc >= 1 → dropped
  ).toDF("L_ORDERKEY", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
    .withColumn("l_shipdate", to_date($"l_shipdate"))

  test("normalizeColumns lowercases every name") {
    assert(Ingestion.normalizeColumns(raw).columns.contains("l_orderkey"))
  }

  test("cleanLineitem drops nulls and out-of-range rows") {
    val out = Ingestion.cleanLineitem(raw)
    assert(out.count() == 2)
    assert(out.select("l_orderkey").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("cleanLineitem derives revenue, date parts, and price_band") {
    val r = Ingestion.cleanLineitem(raw).filter($"l_orderkey" === 1L).head()
    assert(math.abs(r.getAs[Double]("revenue") - 900.0) < 1e-9)
    assert(r.getAs[Int]("ship_year") == 1995)
    assert(r.getAs[Int]("ship_month") == 3)
    assert(r.getAs[String]("price_band") == "low")
    assert(math.abs(r.getAs[Double]("unit_price") - 100.0) < 1e-9)
    val hi = Ingestion.cleanLineitem(raw).filter($"l_orderkey" === 3L).head()
    assert(hi.getAs[String]("price_band") == "high")
  }
}

class DimensionsSpec extends SparkSpec {
  import spark.implicits._

  test("locationDim is the distinct union of role keys with derived attrs") {
    val cust = Seq(1, 1, 5, -1).toDF("c_nationkey")
    val supp = Seq(5, 13, 22).toDF("s_nationkey")
    val dim = Dimensions.locationDim(cust, supp).collect().map(r =>
      (r.getAs[Int]("location_id"), r.getAs[String]("region_bucket"), r.getAs[Boolean]("is_hub"))
    ).sortBy(_._1)
    assert(dim.map(_._1).toSeq == Seq(1, 5, 13, 22)) // -1 filtered, dups collapsed
    assert(dim.find(_._1 == 1).get._2 == "AMERICA")
    assert(dim.find(_._1 == 5).get._2 == "ASIA")
    assert(dim.find(_._1 == 13).get._2 == "EUROPE")
    assert(dim.find(_._1 == 22).get._2 == "AFRICA")
    assert(dim.find(_._1 == 13).get._3) // hub
    assert(!dim.find(_._1 == 22).get._3)
  }

  test("dateDim covers [min,max] inclusive with no gaps; dayofweek pins Sunday=1") {
    val src = Seq("2024-02-27", "2024-03-02").toDF("d").withColumn("d", to_date($"d"))
    val dim = Dimensions.dateDim(spark, src, "d")
    assert(dim.count() == 5) // feb 27,28,29 (leap), mar 1, 2
    val rows = dim.orderBy("full_date").collect()
    assert(rows.head.getAs[java.sql.Date]("full_date").toString == "2024-02-27")
    assert(rows.last.getAs[java.sql.Date]("full_date").toString == "2024-03-02")
    // 2024-03-03 is a Sunday → dayofweek=1; 2024-03-02 Saturday → 7, weekend
    val sat = rows.last
    assert(sat.getAs[Int]("day_of_week") == 7)
    assert(sat.getAs[Boolean]("is_weekend"))
    val thu = rows(2) // 2024-02-29 Thursday
    assert(thu.getAs[Int]("day_of_week") == 5)
    assert(!thu.getAs[Boolean]("is_weekend"))
  }
}

class FactSpec extends SparkSpec {
  import spark.implicits._

  private def mini = {
    val li = Seq(
      (1L, 1, 10.0, 1000.0, 0.0, "1995-01-01"),
      (2L, 1, 5.0, 500.0, 0.1, "1995-06-01"), // order 2 has no match → null order cols
      (3L, 1, 2000.0, 10.0, 0.0, "1995-07-01") // qty >= 1000 → filtered at fact build
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
      .withColumn("l_shipdate", to_date($"l_shipdate"))
      .withColumn("l_partkey", lit(1L)).withColumn("l_suppkey", lit(100L))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
    val orders = Seq((1L, 10L, "1994-12-20", "1-URGENT", 12345.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
      .withColumn("o_orderdate", to_date($"o_orderdate"))
    val cust = Seq((10L, 3L)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((100L, 7L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((3L, "CANADA", 1L), (7L, "CHINA", 2L)).toDF("n_nationkey", "n_name", "n_regionkey")
    (Ingestion.cleanLineitem(li), orders, cust, supp, nation)
  }

  test("left joins preserve fact cardinality; role-played nation resolves both roles") {
    val (li, o, c, s, n) = mini
    val fact = Fact.build(li, o, c, s, n)
    val rows = fact.orderBy("l_orderkey").collect()
    assert(rows.length == 2) // row 3 filtered by qty<1000, row 2 kept despite no order
    val matched = rows(0)
    assert(matched.getAs[String]("cust_nation") == "CANADA")
    assert(matched.getAs[String]("supp_nation") == "CHINA")
    assert(matched.getAs[Int]("order_year") == 1994)
    assert(matched.getAs[Int]("order_quarter") == 4)
    val unmatched = rows(1)
    assert(unmatched.isNullAt(unmatched.fieldIndex("cust_nation"))) // left-outer kept
    assert(unmatched.getAs[String]("supp_nation") == "CHINA")       // supplier path independent
  }
}

class AggregationsSpec extends SparkSpec {
  import spark.implicits._

  private def fact = Seq(
    ("2024-01-01", "A", "B", 2.0, 100.0, 10.0),
    ("2024-01-01", "A", "B", 4.0, 300.0, 30.0),
    ("2024-01-02", "A", "C", 1.0, 50.0, 5.0)
  ).toDF("ship_date_key", "cust_nation", "supp_nation", "l_quantity", "l_extendedprice", "revenue")
    .withColumn("ship_date_key", to_date($"ship_date_key"))
    .withColumn("order_date", $"ship_date_key")
    .withColumn("order_year", year($"order_date"))
    .withColumn("order_quarter", quarter($"order_date"))

  test("pairDailySummary computes exact sums and averages per key") {
    val out = Aggregations.pairDailySummary(fact)
      .filter($"cust_nation" === "A" && $"supp_nation" === "B").head()
    assert(out.getAs[Long]("total_trips") == 2L)
    assert(math.abs(out.getAs[Double]("total_revenue") - 40.0) < 1e-12)
    assert(math.abs(out.getAs[Double]("avg_quantity") - 3.0) < 1e-12)
    assert(math.abs(out.getAs[Double]("avg_price") - 200.0) < 1e-12)
    assert(out.getAs[Long]("total_quantity") == 6L)
  }

  test("topPairs returns at most k rows sorted by count desc with stable ties") {
    val out = Aggregations.topPairs(fact, k = 1).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("cust_nation") == "A")
    assert(out.head.getAs[String]("supp_nation") == "B")
    assert(out.head.getAs[Long]("trip_count") == 2L)
  }

  test("exactCorrelation matches the builtin statistics and is partition-invariant") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      val x = (rnd.nextInt(5000) + 1) / 100.0           // 2-decimal
      (if (i % 2 == 0) "a" else "b", x, math.rint((x * 3 + rnd.nextGaussian() * 5) * 100) / 100.0)
    }
    val df = rows.toDF("k", "x", "y")
    val got = Aggregations.exactCorrelation(df, "k", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val ref = df.groupBy($"k").agg(
      corr($"x", $"y").as("c"), covar_samp($"x", $"y").as("cv"), stddev_samp($"y").as("sd"))
      .collect().map(r => r.getString(0) -> r).toMap
    for (k <- Seq("a", "b")) {
      assert(math.abs(got(k).getAs[Double]("corr_xy") - ref(k).getAs[Double]("c")) < 1e-9)
      assert(math.abs(got(k).getAs[Double]("covar_xy") - ref(k).getAs[Double]("cv")) < 1e-9)
      assert(math.abs(got(k).getAs[Double]("stddev_y") - ref(k).getAs[Double]("sd")) < 1e-9)
    }
    // exact sums => BIT-identical results at any partition count (the
    // builtins only promise the 1e-9 neighborhood above)
    val one = Aggregations.exactCorrelation(df.repartition(1), "k", "x", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("corr_xy")).toMap
    val many = Aggregations.exactCorrelation(df.repartition(29), "k", "x", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("corr_xy")).toMap
    for (k <- Seq("a", "b"))
      assert(java.lang.Double.doubleToLongBits(one(k)) == java.lang.Double.doubleToLongBits(many(k)))
  }

  test("approx sketches land within documented error of exact answers") {
    val orders = graft.tables.Tables.orders(spark, "/root/testdata/sf0.001")
    val r = Aggregations.approxStats(orders, "o_custkey", "o_totalprice").head()
    val exactDistinct = orders.select(countDistinct($"o_custkey")).head().getLong(0)
    val approxDistinct = r.getAs[Long]("approx_distinct")
    assert(math.abs(approxDistinct - exactDistinct).toDouble / exactDistinct < 0.05,
      s"HLL distinct $approxDistinct vs exact $exactDistinct")
    val exactMedian = orders.stat.approxQuantile("o_totalprice", Array(0.5), 0.001).head
    val approxMedian = r.getAs[Double]("approx_median")
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.05)
    assert(r.getAs[Double]("approx_p99") > approxMedian)
  }

  test("quality checks fold into one row with per-check counts") {
    val df = Seq((null.asInstanceOf[String], "x", 5.0, 1.0), ("y", "x", -1.0, -2.0))
      .toDF("cust_nation", "supp_nation", "l_quantity", "revenue")
    val r = Quality.run(df, Quality.factChecks).head()
    assert(r.getAs[Long]("null_cust_nation") == 1L)
    assert(r.getAs[Long]("null_supp_nation") == 0L)
    assert(r.getAs[Long]("invalid_quantity") == 1L)
    assert(r.getAs[Long]("negative_revenue") == 1L)
    assert(r.getAs[Long]("total_rows") == 2L)
  }
}
