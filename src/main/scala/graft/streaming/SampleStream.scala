package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming twin of the sampling family's reservoir draw.
  *
  * q179: STREAMING weighted reservoir — Efraimidis–Spirakis A-Res
  * (q174) in its native habitat: the algorithm was DEFINED as a
  * one-pass reservoir over a stream (key u^(1/w) computable per item
  * in isolation), so the firehose form is the semantics, not an
  * approximation of it. Each micro-batch computes its rows' keys with
  * the SAME shared core as batch q174 (`Sampling.aresKeyed`) and
  * writes only its own top-k key rows to a batchId-named OVERWRITE
  * subdir of the sink — top-k is a monoid (global top-k == top-k of
  * the union of per-batch top-ks), so batches never coordinate, and
  * the batchId keying makes foreachBatch's at-least-once replay
  * EXACTLY-ONCE in effect (the q181 discipline: a replayed batch
  * rewrites its own subdir with identical deterministic rows instead
  * of appending a duplicate copy, which would rank the same doc
  * twice). The final reservoir read is `Sampling.aresTop` over the
  * answer-sized sink: row-identical to batch q174 by construction, so
  * q174's oracle serves both.
  *
  * Scale shape: per batch ONE key-computing projection +
  * TakeOrderedAndProject (k rows out, whatever the batch size); stream
  * state is zero — the sink holds ≤ k·batches rows. At the firehose
  * this is the curriculum/mixture lottery running at ingest with no
  * corpus pass at all.
  */
object SampleStream {

  /** `streamSrc`/`filesPerTrigger` let a spec replay the corpus as
    * SEVERAL micro-batches (a dir of per-batch doc files, 1 file per
    * trigger); the registry form streams `documents.parquet` as one
    * AvailableNow batch. The stream mechanics (run cache, schema/glob
    * resolution, batchId-overwrite sink, Hadoop-FS listing) live in the
    * shared `StreamScratch.waveSink` harness — one definition for all
    * append-only twins. */
  def reservoirStream(spark: SparkSession, sfDir: String,
                      streamSrc: Option[String] = None,
                      filesPerTrigger: Option[Int] = None): DataFrame = {
    val read = StreamScratch.waveSink(spark, "reservoir", sfDir, streamSrc,
      filesPerTrigger, "documents.parquet",
      batch => graft.ops.Sampling.aresKeyed(batch.select("doc_id", "n_chars"))
        .orderBy(org.apache.spark.sql.functions.col("es_key").asc,
          org.apache.spark.sql.functions.col("doc_id").asc)
        .limit(graft.ops.Sampling.ReservoirK))
    val keyed = read.getOrElse {
      import org.apache.spark.sql.functions.col
      spark.range(0).select(col("id").as("doc_id"), col("id").as("w"),
        col("id").as("es_key"))
    }
    graft.ops.Sampling.aresTop(keyed)
  }
}
