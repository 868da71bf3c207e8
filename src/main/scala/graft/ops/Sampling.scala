package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deterministic sampling / splitting operators for training-data
  * pipelines. Both are driven by a content-independent HASH of the
  * stable document id — never by rand() — so assignments are
  * reproducible across runs, engines, cluster sizes, and repartitions:
  * the property that makes train/test splits auditable and leak-free
  * at 100 TB (a random split re-drawn per run silently contaminates
  * evaluation sets). Scale shape: pure map-side predicates on the scan
  * (no shuffle at all until the verification aggregate).
  */
object Sampling {

  /** Portable 32-bit hash of the doc_id column: first 8 hex nibbles of
    * md5(cast(doc_id as string)) — the same construction the dedup
    * operators use for shingles, and bit-identical in DuckDB. */
  private def docIdHash: Column =
    (0 until 8).map { j =>
      val w = 1L << (4 * (7 - j))
      (expr(s"instr('0123456789abcdef', substring(md5(cast(doc_id as string)), ${j + 1}, 1))")
        .cast("long") - 1) * w
    }.reduce(_ + _)

  private val sqlDocHash = (0 until 8).map { j =>
    val w = 1L << (4 * (7 - j))
    s"(cast(strpos('0123456789abcdef', substring(md5(cast(doc_id as varchar)), ${j + 1}, 1)) as bigint) - 1) * $w"
  }.mkString("(", " + ", ")")

  val TrainPct = 80L
  val ValPct = 10L // remainder = test

  /** q50: deterministic train/val/test split — bucket = hash mod 100;
    * <80 train, <90 val, else test. Verified by the per-split counts
    * and token totals (the assignment itself is a scan-time map). */
  def hashSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = pmod(docIdHash, lit(100L))
    Tables.documents(spark, sfDir)
      .withColumn("split",
        when(bucket < TrainPct, "train")
          .when(bucket < TrainPct + ValPct, "val")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalytics.tokens(col("text"))).cast("long")).as("n_tokens"))
      .orderBy("split")
  }

  def hashSplitSql: String =
    s"""SELECT split, count(*) AS n_docs,
       |  cast(sum(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != ''))) as bigint) AS n_tokens
       |FROM (
       |  SELECT text,
       |    CASE WHEN $sqlDocHash % 100 < $TrainPct THEN 'train'
       |         WHEN $sqlDocHash % 100 < ${TrainPct + ValPct} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents)
       |GROUP BY split
       |ORDER BY split""".stripMargin

  val SourceCap = 60L

  /** q53: per-source quota cap — keep at most SourceCap docs per
    * source, selected deterministically by (doc hash, doc_id) order,
    * never by rand(). This is the "cap documents per domain" step of a
    * web-scale corpus (one domain must not dominate the training mix).
    * Physical shape: the rank<=cap filter directly above the window
    * triggers Spark's WindowGroupLimit, so each partition keeps only
    * its top rows BEFORE the shuffle — per-group selection work is
    * O(cap), not O(group). The output aggregates (count + doc_id
    * checksum of the kept set) prove the exact selected SET matches
    * the oracle, not just its size. */
  def sourceCap(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("h"), col("doc_id"))
    val ranked = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .withColumn("h", docIdHash)
      .withColumn("rn", row_number().over(w))
    val kept = ranked.filter(col("rn") <= SourceCap)
    val totals = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n_total"))
    kept.groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("kept_id_sum"))
      .join(totals, "source")
      .select(col("source"), col("n_total"), col("n_kept"), col("kept_id_sum"))
      .orderBy("source")
  }

  def sourceCapSql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY $sqlDocHash, doc_id) AS rn
       |  FROM documents)
       |SELECT source,
       |  (SELECT count(*) FROM documents d WHERE d.source = ranked.source) AS n_total,
       |  count(*) AS n_kept,
       |  cast(sum(doc_id) as bigint) AS kept_id_sum
       |FROM ranked
       |WHERE rn <= $SourceCap
       |GROUP BY source
       |ORDER BY source""".stripMargin

  val SamplePerMille = 100L // 10% per stratum

  /** q51: stratified deterministic sample — keep docs whose hash lands
    * in the first 100 of 1000 buckets, WITHIN each (lang) stratum, so
    * every language keeps ~10% regardless of its share of the corpus
    * (plain sampling starves rare strata). Emits per-stratum totals vs
    * sampled counts so the rate is audit-checkable. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val keep = pmod(docIdHash, lit(1000L)) < SamplePerMille
    Tables.documents(spark, sfDir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when(keep, 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("rate",
        col("n_sampled").cast("double") / col("n_total").cast("double"))
      .orderBy("lang")
  }

  def stratifiedSampleSql: String =
    s"""SELECT lang, count(*) AS n_total,
       |  cast(sum(CASE WHEN $sqlDocHash % 1000 < $SamplePerMille THEN 1 ELSE 0 END) as bigint) AS n_sampled,
       |  cast(sum(CASE WHEN $sqlDocHash % 1000 < $SamplePerMille THEN 1 ELSE 0 END) as double)
       |    / cast(count(*) as double) AS rate
       |FROM documents
       |GROUP BY lang
       |ORDER BY lang""".stripMargin
}
