package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

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

  private val runs = new ConcurrentHashMap[(SparkSession, String), String]()
  private val counter = new AtomicInteger(0)

  /** `streamSrc`/`filesPerTrigger` let a spec replay the wave as
    * SEVERAL micro-batches (a dir of per-batch wave files, 1 file per
    * trigger); the registry form streams `documents.parquet` as one
    * AvailableNow batch and filters to the src0 wave. */
  def kAnonGateStream(spark: SparkSession, sfDir: String,
                      streamSrc: Option[String] = None,
                      filesPerTrigger: Option[Int] = None): DataFrame = {
    val key = (spark, sfDir + streamSrc.map("|" + _).getOrElse(""))
    val out = runs.computeIfAbsent(key, _ => {
      val run = counter.incrementAndGet()
      val sink = StreamScratch.dir(s"graft_kanon_$run")
      val ckDir = StreamScratch.dir(s"graft_kanon_ck_$run")
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
      val stream = reader.parquet(src)
        .filter(col("source") === graft.ops.Dedup.IncrementalSource)
        .select(col("doc_id"), col("lang"),
          expr(s"n_chars div ${graft.ops.Privacy.DocBand}").as("band"))
      val q = stream.writeStream
        .queryName(s"graft_kanon_$run")
        .option("checkpointLocation", ckDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.coalesce(1).write.mode("overwrite").parquet(s"$sink/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      sink
    })
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs.listStatus(outPath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("b_"))
      .map(_.getPath.toString)
    val wave =
      if (batchDirs.isEmpty)
        spark.range(0).select(col("id").as("doc_id"),
          col("id").cast("string").as("lang"), col("id").as("band"))
      else spark.read.parquet(batchDirs.toSeq: _*)
    val frozenCounts = graft.core.Tables.documents(spark, sfDir)
      .filter(col("source") =!= graft.ops.Dedup.IncrementalSource)
      .select(col("lang"), expr(s"n_chars div ${graft.ops.Privacy.DocBand}").as("band"))
      .groupBy("lang", "band")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_frozen"))
    graft.ops.Privacy.kAnonVerdictsOf(wave, frozenCounts)
  }
}
