package graft.ops

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.ExactSums._

/** Scale-technique operators: results are identical to their naive
  * formulations (and share their oracles) — what changes is the
  * physical plan, which is what these exist to demonstrate and test.
  */
object Scale {

  val SaltBuckets = 16

  /** Two-stage salted aggregation: stage 1 aggregates on
    * (key, salt) — spreading a hot key over SaltBuckets reducers —
    * stage 2 combines the partials per key. Byte-identical output to a
    * plain groupBy(key) (integer partial sums commute), so it shares
    * the plain GROUP BY oracle. At 100 TB this is the standard answer
    * to a skewed key that one reducer can't hold; here `event_type`
    * has only 5 values, making every key "hot" by construction. */
  def saltedTypeCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(SaltBuckets.toLong)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(floor(col("value") * 100).cast("long")).as("pcents"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
        (sum(col("pcents")) / lit(100.0)).as("sum_value"))
      .orderBy("event_type")

  def saltedTypeCountsSql: String =
    """SELECT event_type, count(*) AS n,
      |  sum(cast(floor(value*100) as bigint))/100.0 AS sum_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  private val bucketEpoch = new AtomicInteger(0)
  private val bucketTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def writeBucketTables(spark: SparkSession, sfDir: String): (String, String) = {
    val epoch = bucketEpoch.incrementAndGet()
    val base = s"/tmp/graft_buckets_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}_$epoch"
    val oT = s"graft_orders_b$epoch"; val lT = s"graft_lineitem_b$epoch"
    Tables.orders(spark, sfDir).write
      .mode("overwrite").option("path", s"$base/orders")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(oT)
    Tables.lineitem(spark, sfDir).write
      .mode("overwrite").option("path", s"$base/lineitem")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lT)
    (oT, lT)
  }

  /** Ensure the bucketed twins of orders/lineitem exist for `sfDir`
    * (written once per SESSION, then reused — saveAsTable registers in
    * the creating session's catalog, so a cache shared across sessions
    * would hand a later session table names its catalog has never
    * seen). Bucketing amortizes the join shuffle to WRITE time by
    * design — this is the write half, analogous to an index build, and
    * belongs in a prepare phase, not inside every query evaluation. */
  def prepareBuckets(spark: SparkSession, sfDir: String): (String, String) =
    bucketTables.computeIfAbsent(
      s"${System.identityHashCode(spark)}:$sfDir",
      _ => writeBucketTables(spark, sfDir))

  /** Co-located (bucketed) fact-fact join: both sides are written
    * bucketed by the join key, so the join itself needs NO exchange —
    * only the final aggregation shuffles. Same result (and oracle) as
    * the shuffle-join orderRevenueByPriority; the plan difference is
    * asserted in the spec. At scale, bucketing is how repeated joins on
    * the same key amortize their shuffle to write time. */
  def bucketedOrderRevenue(spark: SparkSession, sfDir: String): DataFrame =
    bucketedJoin(spark, prepareBuckets(spark, sfDir))

  /** Spec variant: always re-writes the bucketed tables (fresh plan,
    * no cross-test interference). */
  def bucketedOrderRevenueFresh(spark: SparkSession, sfDir: String): DataFrame =
    bucketedJoin(spark, writeBucketTables(spark, sfDir))

  private def bucketedJoin(spark: SparkSession, tables: (String, String)): DataFrame = {
    val o = spark.table(tables._1); val l = spark.table(tables._2)
    // force a sort-merge join: at test SFs the dimension side is small
    // enough that Spark would broadcast, hiding the bucketing effect
    o.hint("merge").join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  // shares q4's semantics
  def bucketedOrderRevenueSql: String = Relational.orderRevenueByPriorityOracle

  /** Plan predicate used by the spec: the join subtree must contain no
    * shuffle below the join (bucketed scans align partitioning). */
  def joinHasNoExchangeBelow(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    df.collect() // materialize so AQE settles on its final plan
    // TreeNode.collect does NOT descend into AQE stage wrappers (they
    // are leaf-like); flatten through them explicitly
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val next = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: next.flatMap(flatten)
    }
    val all = flatten(df.queryExecution.executedPlan)
    val joins = all.collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }
    joins.nonEmpty && joins.forall(j =>
      j.children.forall(c =>
        flatten(c).forall(!_.isInstanceOf[ShuffleExchangeLike])))
  }
}
