package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.ExactSums._

/** Wider analytic operator coverage: grouping sets (rollup), ranking and
  * running windows, set operations, and exact quantiles — the warehouse
  * operators a training-data pipeline leans on beyond plain group-bys.
  *
  * Portability notes: Spark sorts nulls FIRST by default, DuckDB LAST —
  * every ORDER BY over rollup output pins null ordering explicitly.
  * Medians are computed by rank arithmetic (avg of the two middle
  * values as exact ints descaled once), not engine quantile functions,
  * whose interpolation isn't guaranteed identical across engines.
  */
object Analytics {

  // -------------------------------------------------------------------
  // ROLLUP over region/nation customer counts.
  // -------------------------------------------------------------------

  def rollupCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = broadcast(Tables.nation(spark, sfDir))
    val r = broadcast(Tables.region(spark, sfDir))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), moneySum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  def rollupCountsSql: String =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  sum(cast(floor(c_acctbal*100) as bigint))/100.0 AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // Ranking + running windows over orders per customer.
  // -------------------------------------------------------------------

  def runningOrderStats(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val running = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.filter(col("o_custkey") < 100) // bounded output for the oracle
      .select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(byCust).cast("long").as("rnk"),
        dense_rank().over(byCust).cast("long").as("drnk"),
        lag(col("o_orderkey"), 1, -1L).over(byCust).as("prev_order"),
        lead(col("o_orderkey"), 1, -1L).over(byCust).as("next_order"),
        (sum(floor(col("o_totalprice") * 100).cast("long")).over(running) /
          lit(100.0)).as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  def runningOrderStatsSql: String =
    """SELECT o_custkey, o_orderkey,
      |  cast(rank() OVER w as bigint) AS rnk,
      |  cast(dense_rank() OVER w as bigint) AS drnk,
      |  lag(o_orderkey, 1, -1) OVER w AS prev_order,
      |  lead(o_orderkey, 1, -1) OVER w AS next_order,
      |  sum(cast(floor(o_totalprice*100) as bigint))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_total
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // Set operations: customers in both/only-one of two behavior cohorts.
  // -------------------------------------------------------------------

  def cohortSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val bigSpenders = o.filter(col("o_totalprice") > 100000).select("o_custkey")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val both = bigSpenders.intersect(urgent)
      .withColumn("cohort", lit("both"))
    val onlyBig = bigSpenders.except(urgent)
      .withColumn("cohort", lit("only_big"))
    val onlyUrgent = urgent.except(bigSpenders)
      .withColumn("cohort", lit("only_urgent"))
    both.unionAll(onlyBig).unionAll(onlyUrgent)
      .groupBy("cohort").agg(count(lit(1)).as("n_cust"))
      .orderBy("cohort")
  }

  def cohortSetOpsSql: String =
    """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000),
      |urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT cohort, count(*) AS n_cust FROM (
      |  SELECT 'both' AS cohort, * FROM (SELECT * FROM big INTERSECT SELECT * FROM urgent)
      |  UNION ALL
      |  SELECT 'only_big', * FROM (SELECT * FROM big EXCEPT SELECT * FROM urgent)
      |  UNION ALL
      |  SELECT 'only_urgent', * FROM (SELECT * FROM urgent EXCEPT SELECT * FROM big))
      |GROUP BY cohort
      |ORDER BY cohort""".stripMargin

  // -------------------------------------------------------------------
  // Exact median by rank arithmetic (engine-portable).
  // -------------------------------------------------------------------

  def medianPriceBySegment(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    val o = Tables.orders(spark, sfDir).select("o_custkey", "o_totalprice")
    val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val w = Window.partitionBy("segment").orderBy(col("cents").asc)
    val ranked = joined
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("segment")))
    // Spark's `/` on integers is fractional — wrap in floor so the rank
    // selection matches DuckDB's integer `//`
    ranked
      .filter(col("rn") === floor((col("cnt") + 1) / 2) ||
        col("rn") === floor(col("cnt") / 2) + 1)
      .groupBy("segment")
      .agg((sum(col("cents")) / (count(lit(1)) * lit(100.0))).as("median_price"),
        max(col("cnt")).as("n_orders"))
      .orderBy("segment")
  }

  def medianPriceBySegmentSql: String =
    """WITH ranked AS (
      |  SELECT c_mktsegment AS segment,
      |    cast(floor(o_totalprice*100) as bigint) AS cents,
      |    cast(row_number() OVER (PARTITION BY c_mktsegment ORDER BY cast(floor(o_totalprice*100) as bigint) ASC) as bigint) AS rn,
      |    count(*) OVER (PARTITION BY c_mktsegment) AS cnt
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT segment,
      |  cast(sum(cents) as bigint) / (count(*) * 100.0) AS median_price,
      |  max(cnt) AS n_orders
      |FROM ranked
      |WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
      |GROUP BY segment
      |ORDER BY segment""".stripMargin
}
