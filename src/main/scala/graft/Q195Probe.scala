package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Scratch diagnostic for q195's compute attribution (not part of the
  * driver contract). Times each sub-frame of queryLikelihood separately
  * so the 35 task-seconds measured by Profile can be pinned to a
  * specific operator. */
object Q195Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskMs = new AtomicLong(0L)
    val cpuNs = new AtomicLong(0L)
    val deserMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          taskMs.addAndGet(te.taskMetrics.executorRunTime)
          cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
          deserMs.addAndGet(te.taskMetrics.executorDeserializeTime)
        }
    })
    import graft.core.Tables
    import graft.ops.TextAnalytics.{tokens => tk}
    val terms = graft.ops.TextAnalytics.Bm25Terms
    def timed(name: String)(body: => Long): Unit = {
      // warm once
      body
      taskMs.set(0); cpuNs.set(0); deserMs.set(0)
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-30s wall=$sec%7.3f taskSec=${taskMs.get() / 1000.0}%7.2f cpuSec=${cpuNs.get() / 1e9}%7.2f deserSec=${deserMs.get() / 1000.0}%6.2f rows=$n")
    }
    val toks = tk(col("text"))
    val isQ = (t: org.apache.spark.sql.Column) =>
      terms.map(q => t === lit(q)).reduce(_ || _)
    val perPlan = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(toks).cast("long").as("dl"),
        explode_outer(filter(toks, isQ)).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

    timed("scan only")(Tables.documents(spark, sfDir).count())
    timed("tokenize size only")(
      Tables.documents(spark, sfDir).select(size(toks).as("n")).agg(sum("n")).count())
    timed("filter+explode")(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), explode_outer(filter(toks, isQ)).as("term")).count())
    timed("size+filter+explode")(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), size(toks).cast("long").as("dl"),
          explode_outer(filter(toks, isQ)).as("term")).count())
    timed("per (groupBy)")(perPlan.count())
    val per = perPlan.persist()
    per.count()
    timed("docsD from cache")(per.select("doc_id", "dl").distinct().count())
    timed("cf from cache")(per.filter(col("term").isNotNull)
      .groupBy("term").agg(sum("tf").as("cf")).count())
    timed("full q195")(graft.ops.TextAnalytics.queryLikelihood(spark, sfDir).count())
    graft.ops.Materialize.release(spark)
    timed("full q195 again")(graft.ops.TextAnalytics.queryLikelihood(spark, sfDir).count())
    spark.stop()
  }
}
