package graft.streaming

/** Scratch placement for bounded REPLAY harnesses (the q26/q70/q98/q102
  * verification paths): offset/commit logs, state-store files, and
  * sink spill for a replay are ephemeral by construction — the stream
  * is drained to completion and the checkpoint never resumed — so they
  * go to tmpfs when the host has one. A replay pays ~20 small
  * sequential file ops per micro-batch in the stream lifecycle plus
  * one state-store commit per stateful shuffle partition; on disk
  * those are the dominant fixed cost of the whole bounded query.
  * Production unbounded deployments keep a durable checkpointLocation
  * instead — this path is only ever chosen for throwaway replay dirs.
  */
private[graft] object StreamScratch {
  private[graft] val root: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
  }

  // every dir handed out is deleted at JVM exit: tmpfs outlives the
  // process, so without this each replay would permanently pin its
  // state-store and sink files in RAM (an explicit checkpointLocation
  // also opts out of Spark's own temp-checkpoint auto-delete)
  private val issued = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      issued.asScala.foreach { d =>
        try {
          java.nio.file.Files.walk(d).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        } catch { case _: Exception => () }
      }
    }, "graft-stream-scratch-cleanup"))
  }

  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(root, prefix)
    issued.add(d)
    d.toString
  }

  /** Parquet footer schemas per source file — immutable inputs, so
    * replays of the same firehose don't re-sniff per run. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def schemaOf(spark: org.apache.spark.sql.SparkSession,
               path: String): org.apache.spark.sql.types.StructType =
    schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)

  private val waveRuns = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), String]()
  private val waveCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Shared bounded-wave replay harness for the APPEND-ONLY streaming
    * twins (q179 reservoir, q193 k-anon gate): read the wave as an
    * AvailableNow file stream (optionally split into micro-batches via
    * maxFilesPerTrigger), run `perBatch` on each micro-batch, write its
    * result to a batchId-named OVERWRITE subdir of a scratch sink —
    * foreachBatch's at-least-once replay rewrites identical
    * deterministic rows, exactly-once in effect — and return the
    * unioned sink read (None when no batch produced rows; the caller
    * supplies its empty-schema fallback). ONE definition so the stream
    * mechanics — run cache (keyed on source AND batching, so a
    * different filesPerTrigger is a different run), glob/schema
    * resolution, the Hadoop-FS batch-dir listing (the r11 remote-FS
    * fix) — cannot drift per twin. */
  def waveSink(spark: org.apache.spark.sql.SparkSession, name: String,
               sfDir: String, streamSrc: Option[String],
               filesPerTrigger: Option[Int], defaultGlob: String,
               perBatch: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame):
      Option[org.apache.spark.sql.DataFrame] = {
    val key = (spark,
      s"$name|$sfDir|${streamSrc.getOrElse("")}|${filesPerTrigger.getOrElse(-1)}")
    val out = waveRuns.computeIfAbsent(key, _ => {
      val run = waveCounter.incrementAndGet()
      val sink = dir(s"graft_${name}_$run")
      val ckDir = dir(s"graft_${name}_ck_$run")
      val (src, glob) = streamSrc match {
        case Some(d) => (d, "*.parquet")
        case None    => (sfDir, defaultGlob)
      }
      val schema = streamSrc match {
        case Some(d) => schemaOf(spark, d)
        case None    => schemaOf(spark, s"$sfDir/$defaultGlob")
      }
      val reader = spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
      filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      val q = reader.parquet(src).writeStream
        .queryName(s"graft_${name}_$run")
        .option("checkpointLocation", ckDir)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          perBatch(batch).coalesce(1)
            .write.mode("overwrite").parquet(s"$sink/b_$batchId")
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
    if (batchDirs.isEmpty) None
    else Some(spark.read.parquet(batchDirs.toSeq: _*))
  }
}
