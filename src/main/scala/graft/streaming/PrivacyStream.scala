package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Streaming twin of the privacy family's admission guard.
  *
  * q193: STREAMING k-anonymity gate — q192's metadata-class verdicts
  * at the firehose. Each micro-batch of incoming (src0) documents
  * appends only its rows' quasi-identifier projection
  * (doc_id, lang, band) to a batchId-named OVERWRITE subdir of the
  * sink (the q179/q181 discipline: a foreachBatch replay rewrites its
  * own subdir with identical deterministic rows — exactly-once in
  * effect, no read-modify-write state, no cross-batch coordination).
  * Class counts are order-independent SUMS, so the final serving read
  * runs the SAME `Privacy.kAnonVerdictsOf` core over the unioned
  * sink and is row-identical to batch q192 by construction — q192's
  * oracle serves both. Multi-batch waves exercise the honest
  * semantics: a class whose members arrive across different batches
  * reaches k only in the union view, exactly as the batch release
  * decision would see it (the q181 retro-amendment property — an
  * early arrival's verdict reflects the whole admitted wave, not its
  * own batch).
  *
  * Scale shape: per batch ONE narrow projection write (3 columns, no
  * shuffle at all); the sink holds the wave's QI projection; the
  * serving read pays the wave-sized window + broadcast frozen counts
  * — nothing corpus-sized streams anywhere.
  */
object PrivacyStream {

  /** `streamSrc`/`filesPerTrigger` let a spec replay the wave as
    * SEVERAL micro-batches (a dir of per-batch wave files, 1 file per
    * trigger); the registry form streams `documents.parquet` as one
    * AvailableNow batch and filters to the src0 wave. The stream
    * mechanics live in the shared `StreamScratch.waveSink` harness;
    * the QI projection and frozen class counts are `Privacy`'s own
    * (`docQiProjection`/`frozenQiCounts`), so NEITHER half of the
    * computation can drift from batch q192. */
  def kAnonGateStream(spark: SparkSession, sfDir: String,
                      streamSrc: Option[String] = None,
                      filesPerTrigger: Option[Int] = None): DataFrame = {
    val read = StreamScratch.waveSink(spark, "kanon", sfDir, streamSrc,
      filesPerTrigger, "documents.parquet",
      batch => graft.ops.Privacy.docQiProjection(
        batch.filter(col("source") === graft.ops.Dedup.IncrementalSource)))
    val wave = read.getOrElse(
      spark.range(0).select(col("id").as("doc_id"),
        col("id").cast("string").as("lang"), col("id").as("band")))
    graft.ops.Privacy.kAnonVerdictsOf(wave,
      graft.ops.Privacy.frozenQiCounts(spark, sfDir))
  }

}
