package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for q72 at the f=64 amplified decade: A/Bs
  * spark.sql.optimizer.canChangeCachedPlanOutputPartitioning (a dynamic
  * SQL conf) around the same query in one session, so the 7.9 s → 17.5 s
  * regression can be attributed to the cached-plan partitioning switch
  * vs the operator code. */
object Q72Probe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.streaming.StreamScratch.dir("graft_q72probe")
    Scaling.amplified(spark, srcDir, factor).repartition(math.max(1, factor / 8))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$dir/documents.parquet").count()
    System.gc()

    def timed(name: String): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.ops.Dedup.sourceOverlap(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.ops.Materialize.release(spark)
        (sec, n)
      }
      println(f"$name%-44s min=${runs.map(_._1).min}%8.3f s  rows=${runs.head._2}")
    }
    val key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    spark.conf.set(key, "false")
    timed("q72 cachedPlanPartitioning=false")
    spark.conf.set(key, "true")
    timed("q72 cachedPlanPartitioning=true")
    spark.conf.set(key, "false")
    timed("q72 cachedPlanPartitioning=false (again)")
    spark.stop()
  }
}
