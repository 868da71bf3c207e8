package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

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

  private val runs = new ConcurrentHashMap[(SparkSession, String), String]()
  private val counter = new AtomicInteger(0)

  /** `streamSrc`/`filesPerTrigger` let a spec replay the corpus as
    * SEVERAL micro-batches (a dir of per-batch doc files, 1 file per
    * trigger); the registry form streams `documents.parquet` as one
    * AvailableNow batch. */
  def reservoirStream(spark: SparkSession, sfDir: String,
                      streamSrc: Option[String] = None,
                      filesPerTrigger: Option[Int] = None): DataFrame = {
    val key = (spark, sfDir + streamSrc.map("|" + _).getOrElse(""))
    val out = runs.computeIfAbsent(key, _ => {
      val run = counter.incrementAndGet()
      val sink = StreamScratch.dir(s"graft_reservoir_$run")
      val ckDir = StreamScratch.dir(s"graft_reservoir_ck_$run")
      val (src, glob) = streamSrc match {
        case Some(d) => (d, "*.parquet")
        case None    => (sfDir, "documents.parquet")
      }
      val schema = streamSrc match {
        case Some(d) => StreamScratch.schemaOf(spark, d)
        case None    => StreamScratch.schemaOf(spark, s"$sfDir/documents.parquet")
      }
      val reader = spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
      filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      val stream = reader.parquet(src).select("doc_id", "n_chars")
      val q = stream.writeStream
        .queryName(s"graft_reservoir_$run")
        .option("checkpointLocation", ckDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.ops.Sampling.aresKeyed(batch)
            .orderBy(org.apache.spark.sql.functions.col("es_key").asc,
              org.apache.spark.sql.functions.col("doc_id").asc)
            .limit(graft.ops.Sampling.ReservoirK)
            .coalesce(1).write.mode("overwrite").parquet(s"$sink/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      sink
    })
    // Hadoop FileSystem listing, not java.io.File (VERDICT r11 "what's
    // wrong" 2): StreamScratch is tmpfs today, but this is the one seam
    // that would silently break on a remote FS — the same discipline
    // the frozen-corpus sizing already uses
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs.listStatus(outPath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("b_"))
      .map(_.getPath.toString)
    val keyed =
      if (batchDirs.isEmpty) {
        import org.apache.spark.sql.functions.col
        spark.range(0).select(col("id").as("doc_id"), col("id").as("w"),
          col("id").as("es_key"))
      } else spark.read.parquet(batchDirs.toSeq: _*)
    graft.ops.Sampling.aresTop(keyed)
  }
}
