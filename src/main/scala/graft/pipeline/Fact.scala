package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fact-table build: the reference's 3-way left-outer dimensional join
  * with a role-played dimension (the same location dim joined twice
  * under aliases "pu"/"do", FactJob.scala:55-57) and a wide aliased
  * projection (FactJob.scala:58-74).
  *
  * Star-schema analog: lineitem (fact grain) joins orders (header),
  * then the nation dimension twice — once via the order's customer
  * ("cust" role) and once via the lineitem's supplier ("supp" role).
  *
  * Scale notes: nation/customer/supplier are dimensions — orders of
  * magnitude smaller than lineitem — so all four joins must be
  * broadcast, never shuffle the fact side. nation (25 rows) and
  * supplier are broadcast-hinted explicitly; customer and orders are
  * left to AQE (at 100 TB orders is fact-sized, so lineitem-orders is
  * a shuffle join on the join key both sides — co-partitionable via
  * bucketing on orderkey if materialized).
  */
object Fact {

  def build(
      lineitemClean: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      supplier: DataFrame,
      nation: DataFrame
  ): DataFrame = {
    // P5: role-played aliases for self-join disambiguation
    // (reference: FactJob.scala:55-56 locDim.as("pu") / .as("do"))
    val custNation = nation.as("cn")
    val suppNation = nation.as("sn")

    lineitemClean
      // F3-shape sanity filter re-applied at fact build
      // (reference: FactJob.scala:49-54)
      .filter(col("l_quantity") > 0 && col("l_quantity") < 1000 && col("revenue") > 0)
      .join(orders, col("l_orderkey") === col("o_orderkey"), "left_outer")
      .join(broadcast(customer.as("c")), col("o_custkey") === col("c.c_custkey"), "left_outer")
      .join(broadcast(supplier.as("s")), col("l_suppkey") === col("s.s_suppkey"), "left_outer")
      // J1: the same dimension role-played twice on different keys
      .join(broadcast(custNation), col("c.c_nationkey") === col("cn.n_nationkey"), "left_outer")
      .join(broadcast(suppNation), col("s.s_nationkey") === col("sn.n_nationkey"), "left_outer")
      // P4: wide projection with cross-alias disambiguation
      // (reference: FactJob.scala:58-74 $"pu.borough".as("pickup_borough"))
      .select(
        col("ship_date").as("ship_date_key"),
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_partkey"),
        col("l_suppkey"),
        col("l_quantity"),
        col("l_extendedprice"),
        col("l_discount"),
        col("revenue"),
        col("l_returnflag"),
        col("l_linestatus"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_orderpriority"),
        col("o_totalprice"),
        col("cn.n_name").as("cust_nation"),
        col("sn.n_name").as("supp_nation"),
        col("cn.n_regionkey").as("cust_regionkey"),
        col("sn.n_regionkey").as("supp_regionkey"),
        year(col("o_orderdate")).as("order_year"),
        quarter(col("o_orderdate")).as("order_quarter")
      )
  }
}
