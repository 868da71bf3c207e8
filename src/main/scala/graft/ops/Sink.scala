package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write path for the curated corpus — the step after the filter/dedup
  * decisions, where the surviving documents land as a readable-at-scale
  * table. The layout rules are the ones every downstream consumer of a
  * 100-TB corpus depends on:
  *
  *  - PARTITIONED BY the coarse selector (lang here): language-targeted
  *    readers prune whole directories at the scan, the same discipline
  *    as AnnIndex's language-partitioned chunks;
  *  - ONE shuffle keyed on the partition column before the write
  *    (repartition by lang), so each task owns whole hive partitions
  *    and the job emits one file per partition per size bound — not the
  *    tasks × partitions small-file explosion an unshuffled
  *    partitionBy write produces;
  *  - records SORTED by doc_id within each file: parquet min/max column
  *    statistics then make doc_id range scans skip row groups, and
  *    downstream joins see clustered keys;
  *  - file sizes bounded via maxRecordsPerFile, the knob that keeps a
  *    skewed partition (one dominant language) from producing a
  *    monolithic file no executor can split.
  */
object Sink {

  /** Write `df` (must carry `lang` and `doc_id` columns) as the curated
    * corpus layout. Returns the number of data files written. */
  def writeCurated(df: DataFrame, path: String,
                   maxRecordsPerFile: Long = 1000000L): Long = {
    df.repartition(col("lang"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("lang")
      .parquet(path)
    // count through the Hadoop FileSystem API, not java.nio: the write
    // path accepts any Spark-writable URI (hdfs://, s3a://), and the
    // post-write count must not fail on the non-local ones
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val it = fs.listFiles(hPath, true)
    var n = 0L
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1L }
    n
  }
}
