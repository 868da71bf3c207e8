package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporary round-10 dev profiling main — not part of the library. */
object DevProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cellUsers = graft.core.Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hour_id"), col("user_id"))
      .distinct()
    time("cellUsers")(cellUsers.count())
    val capped = cellUsers
      .withColumn("csz", count(lit(1)).over(Window.partitionBy("event_type", "hour_id")))
      .filter(col("csz") <= 64)
      .select("event_type", "hour_id", "user_id")
    time("capped")(capped.count())
    val x = capped.alias("x"); val y = capped.alias("y")
    val pairs = x.join(y,
        col("x.event_type") === col("y.event_type") &&
        col("x.hour_id") === col("y.hour_id") &&
        col("x.user_id") < col("y.user_id"))
      .groupBy(col("x.user_id").as("a"), col("y.user_id").as("b"))
      .agg(count(lit(1)).as("ncells"))
    time("pairs")(pairs.count())
    val sym = pairs.select(col("a").as("u"), col("b").as("v"), col("ncells"))
      .union(pairs.select(col("b").as("u"), col("a").as("v"), col("ncells")))
    val topk = sym
      .withColumn("rk", row_number().over(Window.partitionBy("u")
        .orderBy(col("ncells").desc, col("v").asc)))
      .filter(col("rk") <= 8)
      .select("u", "v")
    time("topk")(topk.count())
    val tx = topk.alias("tx"); val ty = topk.alias("ty")
    val edges = tx.join(ty,
        col("tx.u") === col("ty.v") && col("tx.v") === col("ty.u") &&
        col("tx.u") < col("tx.v"))
      .select(col("tx.u").as("a"), col("tx.v").as("b"))
    time("edges")(edges.count())
    time("full q170")(graft.ops.Events.coVisitTriangles(spark, sfDir).collect())
    time("full q170 again")(graft.ops.Events.coVisitTriangles(spark, sfDir).collect())

    time("q85 bm25")(graft.ops.TextAnalytics.bm25Search(spark, sfDir).collect())
    time("full q172")(graft.ops.TextAnalytics.rm3Expansion(spark, sfDir).collect())
    graft.ops.Materialize.release(spark)
    time("full q172 again")(graft.ops.TextAnalytics.rm3Expansion(spark, sfDir).collect())
    spark.stop()
  }
}
