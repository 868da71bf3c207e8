package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of selected
  * queries (all by default) so pushdown, join strategy, and codegen
  * spans can be reviewed. Usage: runMain graft.Explain [sfDir] [q...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wanted = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq
      .sortBy(_._1.stripPrefix("q").takeWhile(_.isDigit).toInt)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }
      .foreach { case (name, fn) =>
        println(s"===== $name =====")
        // withoutEagerness: plan inspection must not trigger the full
        // compute job that Materialize.shared's eager count would run
        try println(graft.ops.Materialize.withoutEagerness {
          fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        })
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
