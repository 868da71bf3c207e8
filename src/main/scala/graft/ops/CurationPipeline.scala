package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** The operators composed as one curation run — the end-to-end shape a
  * user of this library actually executes over a raw corpus:
  *
  *   quality gates (q79's five funnel stages, row-level)
  *     → dedup survivorship (q74's exact+near component roots)
  *       → per-source quota (q53's deterministic hash-order cap)
  *         → curated write (Sink's pruned/clustered layout)
  *
  * Each stage is the SAME implementation its oracle-checked query
  * aggregates, so the pipeline inherits their verified semantics; what
  * this adds is the composition and the write. Stages stay row-level
  * DataFrames end to end — one job graph, no driver round-trips except
  * the CC loop already inside survivorship.
  */
object CurationPipeline {

  /** Run the full curation over `sfDir`'s documents, write survivors
    * to `outPath` (Sink layout), and return the per-source report:
    * docs at entry, after quality gates, after dedup, and written. */
  def run(spark: SparkSession, sfDir: String, outPath: String,
          capPerSource: Long = Sampling.SourceCap): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val quality = TextAnalytics.funnelFlags(spark, sfDir)
      .select(col("doc_id"), col("s5").as("pass_quality"))
    val survivors = Dedup.survivorFlags(spark, sfDir)
      .select(col("doc_id"), col("kept"))
    val judged = docs.join(quality, "doc_id").join(survivors, "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("cap_h"), col("doc_id"))
    val capped = judged
      .filter(col("pass_quality") && col("kept"))
      .withColumn("cap_h", Sampling.docIdHash)
      .withColumn("cap_rn", row_number().over(w))
      .filter(col("cap_rn") <= capPerSource)
    val written = capped.drop("pass_quality", "kept", "cap_h", "cap_rn")
    Sink.writeCurated(written, outPath)
    judged
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pass_quality"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("pass_quality") && col("kept"), 1L).otherwise(0L)).as("n_deduped"))
      .join(
        spark.read.parquet(outPath).groupBy("source")
          .agg(count(lit(1)).as("n_written")),
        Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_quality"),
        col("n_deduped"), coalesce(col("n_written"), lit(0L)).as("n_written"))
      .orderBy("source")
  }
}
