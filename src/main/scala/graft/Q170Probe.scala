package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch diagnostic for the q170 scaling regression: times the
  * mutual-edge (pre-checkpoint) half and the two post-checkpoint arm
  * variants (round-14 window form vs round-15 degree-join form) at an
  * amplified decade, so the 15 s → 35 s f=64 delta can be attributed. */
object Q170Probe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.streaming.StreamScratch.dir("graft_q170probe")
    Scaling.amplifiedEvents(spark, srcDir, factor).repartition(math.max(1, factor / 8))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.read.parquet(s"$dir/events.parquet").count()

    def timed(name: String)(body: => Long): Unit = {
      val r1 = { val t0 = System.nanoTime(); val n = body; ((System.nanoTime()-t0)/1e9, n) }
      graft.ops.Materialize.release(spark)
      val r2 = { val t0 = System.nanoTime(); val n = body; ((System.nanoTime()-t0)/1e9, n) }
      graft.ops.Materialize.release(spark)
      println(f"$name%-34s min=${math.min(r1._1, r2._1)}%8.3f s  (p1=${r1._1}%.3f p2=${r2._1}%.3f) rows=${r2._2}")
    }

    // full current form
    timed("full coVisitTriangles (HEAD)")(graft.ops.Events.coVisitTriangles(spark, dir).count())
    // pre-checkpoint half alone
    timed("coVisitMutualEdges only")(graft.ops.Events.coVisitMutualEdges(spark, dir).count())
    // round-16 candidate: the pair emission as pure-codegen generators
    // (sort_array + posexplode + explode(slice)) instead of the typed
    // flatMap — removes the SerializeFromObject boundary and the
    // per-pair Tuple2 allocation; partial aggregation identical
    timed("mutualEdges CODEGEN emission") {
      val cappedUsers = org.apache.spark.sql.graft.Bridge.column(
        graft.functions.CappedLongSet(
          org.apache.spark.sql.graft.Bridge.expression(col("user_id")),
          graft.ops.Events.CoVisitCellCap.toInt).toAggregateExpression())
      val byCell = graft.core.Tables.events(spark, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hour_id"), col("user_id"))
        .groupBy("event_type", "hour_id")
        .agg(cappedUsers.as("users"))
        .filter(col("users").isNotNull)
      val pairRows = byCell
        .select(sort_array(col("users")).as("s"))
        .select(col("s"), posexplode(col("s")))
        .select(col("col").as("a"),
          explode(slice(col("s"), col("pos") + lit(2), size(col("s")))).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("ncells"))
      val topPartners = org.apache.spark.sql.graft.Bridge.column(
        graft.functions.TopKByScore(
          org.apache.spark.sql.graft.Bridge.expression(col("v")),
          org.apache.spark.sql.graft.Bridge.expression(col("ncells")),
          graft.ops.Events.CoVisitTopK.toInt).toAggregateExpression())
      val topk = pairRows
        .select(explode(array(
          struct(col("a").as("u"), col("b").as("v"), col("ncells")),
          struct(col("b").as("u"), col("a").as("v"), col("ncells")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"), col("e.ncells").as("ncells"))
        .groupBy("u").agg(topPartners.as("vs"))
        .select(col("u"), explode(col("vs")).as("v"))
      topk
        .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
        .filter(col("c") === 2)
        .select("a", "b")
        .count()
    }
    // checkpoint of the half
    timed("mutualEdges + localCheckpoint") {
      val d = graft.ops.Events.coVisitMutualEdges(spark, dir).localCheckpoint(true)
      val n = d.count()
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(d)
      n
    }
    // round-14 post arm over a checkpointed und (window + re-groupBy)
    timed("post arm r14-window over ckpt") {
      val und = graft.ops.Events.coVisitMutualEdges(spark, dir).localCheckpoint(true)
      val bi = und.select(col("a").as("n"), col("b").as("m"))
        .union(und.select(col("b").as("n"), col("a").as("m")))
        .withColumn("dn", count(lit(1)).over(Window.partitionBy("n")))
      val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
      val oriented = bi
        .groupBy(least(col("n"), col("m")).as("a"), greatest(col("n"), col("m")).as("b"))
        .agg(max(when(col("n") < col("m"), col("dn"))).as("da"),
          max(when(col("n") > col("m"), col("dn"))).as("db"))
        .select(
          when(aFirst, col("a")).otherwise(col("b")).as("src"),
          when(aFirst, col("b")).otherwise(col("a")).as("dst"),
          when(aFirst, col("db")).otherwise(col("da")).as("ddeg"))
      val e1 = oriented.alias("e1"); val e2 = oriented.alias("e2"); val e3 = oriented.alias("e3")
      val wedgeBefore = col("e1.ddeg") < col("e2.ddeg") ||
        (col("e1.ddeg") === col("e2.ddeg") && col("e1.dst") < col("e2.dst"))
      val triangles = e1.join(e2, col("e1.src") === col("e2.src") && wedgeBefore)
        .join(e3, col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
        .agg(count(lit(1)).as("n_triangles"))
      val deg = bi.select(col("n"), col("dn")).groupBy("n").agg(max(col("dn")).as("deg"))
      val stats = deg.agg(count(lit(1)).as("n_nodes"),
        expr("sum(deg) div 2").as("n_edges"),
        expr("sum(deg * (deg - 1) div 2)").as("n_wedges"))
      val out = stats.crossJoin(broadcast(triangles))
        .withColumn("gcc_permille",
          expr("CASE WHEN n_wedges = 0 THEN 0 ELSE n_triangles * 3 * 1000 div n_wedges END"))
        .count()
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(und)
      out
    }
    spark.stop()
  }
}
