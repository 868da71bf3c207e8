package graft

import graft.ops.Statistics
import org.apache.spark.sql.functions._

class StatisticsSpec extends SparkSpec {

  test("exact-moment correlation stays in [-1, 1] and tracks built-in corr") {
    val df = Statistics.quantityPriceCorr(spark, sf0001).cache()
    assert(df.filter(col("corr_qty_price") < -1 || col("corr_qty_price") > 1).count() == 0)
    // built-in corr on the same floored values should agree closely
    // (not exactly — its accumulation is order-dependent, which is why
    // the operator uses integer moments)
    val builtin = graft.core.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("double").as("x"),
        floor(col("l_extendedprice")).cast("double").as("y"))
      .groupBy("l_returnflag").agg(corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    df.collect().foreach { r =>
      val mine = r.getAs[Double]("corr_qty_price")
      val ref = builtin(r.getString(0))
      assert(math.abs(mine - ref) < 1e-9, s"${r.getString(0)}: $mine vs $ref")
    }
    df.unpersist()
  }

  test("edit-distance blocking reports only pairs within the threshold") {
    val df = Statistics.partNameNearDup(spark, sf0001)
    assert(df.filter(col("min_dist") > Statistics.EditDistanceMax).count() == 0)
    assert(df.filter(col("n_near_dup_pairs") <= 0).count() == 0)
  }
}
