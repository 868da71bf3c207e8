package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.chat.{Embedder, HashingEmbedder, Language}

/** Incremental re-indexing: the reference PROPOSES (but never built)
  * watching a repository for changes and updating the index without a
  * full rebuild (/root/reference/docs/proposals.md:75-114). Structured
  * Streaming's file source makes it one pipeline: new files appear in
  * the watched directory -> chunk -> embed -> append to the chunks
  * parquet. Chunk ids are (batchId << 32 | row) so appends never
  * collide with existing ids; the RP-forest leaf assignment of new
  * chunks is computed in the same batch (a seeded forest is a pure
  * function, so old and new assignments agree).
  */
object IncrementalIndex {

  private val counter = new AtomicInteger(0)

  /** Start watching `watchDir`; each discovered file is chunked and
    * embedded, and the rows append to `indexDir/chunks`. Returns the
    * query handle (stop() to end; processAllAvailable() to drain). */
  def start(spark: SparkSession, watchDir: String, indexDir: String,
            embedder: Embedder = new HashingEmbedder()): StreamingQuery = {
    import spark.implicits._
    val supported = Language.supportedExtensions.toSet
    // the streaming file source requires an explicit schema; this is
    // the fixed schema of the binaryFile format
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema)
      .option("recursiveFileLookup", "true")
      .load(watchDir)
      .select(col("path"), col("content"))
    val name = s"graft_incremental_${counter.incrementAndGet()}"
    files.writeStream
      .queryName(name)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val rows = batch.as[(String, Array[Byte])].flatMap { case (uri, bytes) =>
          val path = uri.stripPrefix("file:")
          val rel = path.stripPrefix(watchDir).dropWhile(_ == '/')
          val ext = rel.split('.').lastOption
            .filter(_ => rel.contains('.')).map(_.toLowerCase)
          ext match {
            case Some(e) if supported.contains(e) =>
              val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
              graft.chat.Chunker.splitContent(text).map(c => (rel, c, Language.detect(e), Some(e)))
            case _ => Seq.empty
          }
        }.mapPartitions { it =>
          it.grouped(32).flatMap { group =>
            val vecs = embedder.embedBatch(group.map(_._2))
            group.zip(vecs).map { case ((f, c, lang, e), v) => (f, c, lang, e, v.toSeq) }
          }
        }.toDF("file", "code", "language", "extension", "vector")
          // ids disjoint from any prior batch or the base build
          .withColumn("chunk_id",
            lit(batchId << 32) + monotonically_increasing_id() % (1L << 32))
          .select("chunk_id", "file", "code", "language", "extension", "vector")
        rows.write.mode("append").partitionBy("language")
          .parquet(s"$indexDir/chunks")
        ()
      }
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
  }
}
