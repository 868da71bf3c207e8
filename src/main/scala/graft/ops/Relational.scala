package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.ExactSums._

/** Relational operator suite over the TPC-H-ish testdata tables.
  *
  * These are the scan/filter/join/aggregate/window primitives the engine
  * is built on (SURVEY.md §2.E/§2.F analogues at warehouse scale). Scale
  * notes per operator:
  *  - dimension joins (nation/region) are broadcast — no shuffle of the
  *    fact side beyond the final aggregation;
  *  - fact-fact joins (orders x lineitem) shuffle on the join key and rely
  *    on AQE for skew handling;
  *  - top-k per group uses a window (maps to a single shuffle on the
  *    partition key with in-partition TopK under AQE).
  */
object Relational {

  /** TPC-H Q1-style pricing summary: full-scan hash aggregate with
    * map-side partial aggregation. Exact integer sums (see ExactSums). */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q6-style selective scan: filters push down to the parquet
    * scan (verify `PushedFilters` in explain), aggregate is a single
    * exact sum. */
  def revenueFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    l.filter(
        col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount") >= lit(0.02) && col("l_discount") <= lit(0.06) &&
        col("l_quantity") < lit(24.0))
      .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  /** Customer -> nation -> region dimension join chain. Both dims are tiny:
    * broadcast them explicitly so the plan never shuffles `customer` for
    * the join itself (only for the final group-by). */
  def custNationRegion(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = broadcast(Tables.nation(spark, sfDir))
    val r = broadcast(Tables.region(spark, sfDir))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), moneySum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Fact-fact shuffle join: orders x lineitem on orderkey, revenue per
    * order priority. At 100 TB this is the canonical sort-merge/shuffled
    * hash join on a co-partitionable key; AQE coalesces post-shuffle
    * partitions. */
  def orderRevenueByPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** q4's oracle, shared with the bucketed variant (Scale). */
  val orderRevenueByPriorityOracle: String =
    """SELECT o_orderpriority,
      |  sum(cast(floor(l_extendedprice*(1.0-l_discount)*100) as bigint))/100.0 AS revenue,
      |  count(DISTINCT o_orderkey) AS n_orders
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Left-semi join: customers that have at least one order. */
  def semiJoinSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-anti join: customers with no orders (the reference's exclude
    * anti-filter F4 shape — SURVEY.md §2.F, src/hyde.rs:929-964 — as a
    * proper anti-join). */
  def antiJoinSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("c_mktsegment"))
  }

  /** Top-3 orders per customer by total price — the per-group top-k shape
    * (reference's per-query kNN rank, SURVEY.md I11). Window + filter
    * compiles to a single shuffle on the partition key. */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= lit(3))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** DISTINCT projection (reference A5 — the only DISTINCT in cargo-chat,
    * src/repo.rs:161-163). */
  def distinctLangSource(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("source"))
      .distinct()
      .orderBy(col("lang"), col("source"))
}
