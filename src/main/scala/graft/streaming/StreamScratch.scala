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
}
