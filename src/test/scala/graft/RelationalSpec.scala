package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("pricingSummary groups by returnflag/linestatus and sums exactly") {
    val df = Relational.pricingSummary(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq(
      "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "sum_charge", "count_order"))
    // exact-integer sums must equal a recomputation at row granularity
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val expectedCount = l.count()
    assert(rows.map(_.getAs[Long]("count_order")).sum == expectedCount)
  }

  test("revenueFilter pushes predicates and returns one row") {
    val df = Relational.revenueFilter(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_rows") > 0)
    // the shipdate/discount/quantity predicates must reach the parquet scan
    assert(plan.contains("PushedFilters") &&
      plan.contains("l_shipdate") && plan.contains("l_discount"))
  }

  test("custNationRegion broadcasts both dimension joins") {
    val df = Relational.custNationRegion(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_cust")).sum
    assert(total == spark.read.parquet(s"$sf0001/customer.parquet").count())
  }

  test("semi + anti join partition the customer table") {
    val semi = Relational.semiJoinSegments(spark, sf0001)
      .agg(sum("n_cust")).collect()(0).getLong(0)
    val anti = Relational.antiJoinSegments(spark, sf0001)
      .collect().map(_.getAs[Long]("n_cust")).sum
    val all = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(semi + anti == all)
  }

  test("topOrdersPerCustomer returns at most 3 per customer, rank-ordered") {
    val df = Relational.topOrdersPerCustomer(spark, sf0001)
    val bad = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(bad == 0)
    // within a customer, price must be non-increasing with rank
    val viol = df
      .groupBy("o_custkey")
      .agg(
        expr("max_by(o_totalprice, rn)").as("last"),
        expr("min_by(o_totalprice, rn)").as("first"))
      .filter(col("last") > col("first"))
      .count()
    assert(viol == 0)
  }

  test("distinctLangSource has no duplicate pairs") {
    val df = Relational.distinctLangSource(spark, sf0001)
    assert(df.count() == df.dropDuplicates("lang", "source").count())
  }
}
