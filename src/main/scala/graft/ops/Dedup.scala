package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Consts, Tables}
import graft.ops.TextAnalytics.{tokens, shingles3, sqlShingles}

/** Deduplication operators over `documents`: exact (hash group-by),
  * MinHash+LSH near-dup, n-gram Jaccard, and SimHash.
  *
  * Scale shapes (the point at 100 TB):
  *  - exact dedup = one shuffle on the content hash with map-side
  *    pre-aggregation;
  *  - MinHash = explode(shingles) -> groupBy(doc) min-per-seed (partial
  *    aggregation makes the shuffle carry one signature row per doc, not
  *    the shingles), then an equi-join on band signatures — candidate
  *    generation never goes O(n^2);
  *  - the only quadratic step left is Jaccard verification over LSH
  *    candidates, which is proportional to the true-duplicate count;
  *  - plain `jaccardPairs` (blocked by `source`) is the small-block
  *    baseline/oracle, not the scale path.
  */
object Dedup {

  /** doc_id, shingle-set column (distinct 3-gram shingles). */
  private def shingleSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), shingles3(tokens(col("text"))).as("s"))

  // -------------------------------------------------------------------
  // Exact dedup: md5 group-by, keep lowest doc_id.
  // -------------------------------------------------------------------

  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("content_hash")

  def exactDedupSql: String =
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
      |  count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY content_hash""".stripMargin

  // -------------------------------------------------------------------
  // MinHash signatures + LSH banding + Jaccard verification.
  // -------------------------------------------------------------------

  /** One row per doc: 16 minhash values (seed-prefixed md5 mins). */
  def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame = {
    val exploded = shingleSets(spark, sfDir)
      .select(col("doc_id"), explode(col("s")).as("sh"))
    val aggs = Consts.MinhashSeeds.map(s =>
      min(md5(concat(lit(s"$s|"), col("sh")).cast("binary"))).as(s"mh$s"))
    exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Candidate pairs from LSH bands, verified with exact Jaccard.
    *
    * Bands are exploded to (doc_id, band_idx, band_hash) rows and the
    * candidate join is ONE self-equi-join on (band_idx, band_hash) —
    * a single shuffle whose two sides are identical subplans (Spark
    * reuses the exchange), instead of one join per band re-running the
    * whole MinHash lineage. */
  def minhashLshPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = minhashSignatures(spark, sfDir)
    val bandHashes = (0 until Consts.LshBands).map { b =>
      val rows = (0 until Consts.LshRowsPerBand)
        .map(r => col(s"mh${b * Consts.LshRowsPerBand + r}"))
      md5(concat_ws("|", rows: _*).cast("binary"))
    }
    val banded = sig.select(col("doc_id"),
      posexplode(array(bandHashes: _*)).as(Seq("band_idx", "band_hash")))
    val x = banded.alias("x"); val y = banded.alias("y")
    val candidates = x.join(y,
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sets = shingleSets(spark, sfDir).select(col("doc_id"), col("s"))
    val a = sets.alias("sa"); val b = sets.alias("sb")
    candidates
      .join(a, col("doc_a") === col("sa.doc_id"))
      .join(b, col("doc_b") === col("sb.doc_id"))
      .withColumn("jaccard",
        size(array_intersect(col("sa.s"), col("sb.s"))).cast("double") /
          size(array_union(col("sa.s"), col("sb.s"))).cast("double"))
      .filter(col("jaccard") >= Consts.MinhashJaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  def minhashLshPairsSql: String = {
    val minCols = Consts.MinhashSeeds
      .map(s => s"min(md5('$s|' || sh)) AS mh$s").mkString(",\n    ")
    val bandCols = (0 until Consts.LshBands).map { b =>
      val rows = (0 until Consts.LshRowsPerBand)
        .map(r => s"mh${b * Consts.LshRowsPerBand + r}").mkString(" || '|' || ")
      s"md5($rows) AS band$b"
    }.mkString(",\n    ")
    val bandJoins = (0 until Consts.LshBands).map { b =>
      s"SELECT x.doc_id AS doc_a, y.doc_id AS doc_b FROM banded x JOIN banded y ON x.band$b = y.band$b AND x.doc_id < y.doc_id"
    }.mkString("\n    UNION\n    ")
    s"""WITH sets AS (
       |  SELECT doc_id, $sqlShingles s
       |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') t FROM documents)),
       |exploded AS (SELECT doc_id, unnest(s) AS sh FROM sets),
       |sig AS (SELECT doc_id,
       |    $minCols
       |  FROM exploded GROUP BY doc_id),
       |banded AS (SELECT doc_id,
       |    $bandCols
       |  FROM sig),
       |cand AS (
       |    $bandJoins)
       |SELECT doc_a, doc_b,
       |  cast(len(list_intersect(sa.s, sb.s)) as double) / cast(len(list_distinct(sa.s || sb.s)) as double) AS jaccard
       |FROM cand
       |JOIN sets sa ON doc_a = sa.doc_id
       |JOIN sets sb ON doc_b = sb.doc_id
       |WHERE cast(len(list_intersect(sa.s, sb.s)) as double) / cast(len(list_distinct(sa.s || sb.s)) as double) >= ${Consts.MinhashJaccardThreshold}
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -------------------------------------------------------------------
  // n-gram Jaccard pairs, blocked by `source` (small-block baseline).
  // -------------------------------------------------------------------

  def jaccardPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sets = shingleSets(spark, sfDir)
    val a = sets.alias("a"); val b = sets.alias("b")
    a.join(b,
        col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("jaccard",
        size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          size(array_union(col("a.s"), col("b.s"))).cast("double"))
      .filter(col("jaccard") >= Consts.JaccardPairThreshold)
      .select(
        col("a.source").as("source"),
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        col("jaccard"))
      .orderBy("source", "doc_a", "doc_b")
  }

  def jaccardPairsSql: String =
    s"""WITH sets AS (
       |  SELECT doc_id, source, $sqlShingles s
       |  FROM (SELECT doc_id, source, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') t FROM documents))
       |SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  cast(len(list_intersect(a.s, b.s)) as double) / cast(len(list_distinct(a.s || b.s)) as double) AS jaccard
       |FROM sets a JOIN sets b ON a.source = b.source AND a.doc_id < b.doc_id
       |WHERE cast(len(list_intersect(a.s, b.s)) as double) / cast(len(list_distinct(a.s || b.s)) as double) >= ${Consts.JaccardPairThreshold}
       |ORDER BY source, doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------------
  // SimHash: 16-bit signatures from token md5 nibbles + hamming pairs.
  // -------------------------------------------------------------------

  /** doc_id, simhash (long in [0, 2^16)). Bit k is the sign of the sum
    * over tokens of +/-1 on the high bit of hex nibble k of md5(token).
    * Token multiplicity counts (frequency-weighted simhash). */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("h", md5(col("tok").cast("binary")))
    val bitSums = (0 until Consts.SimHashBits).map { k =>
      sum(when(substring(col("h"), k + 1, 1).isin(Consts.HexHigh: _*), 1)
        .otherwise(-1)).as(s"b$k")
    }
    val sig = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until Consts.SimHashBits).map { k =>
      when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    sig.select(col("doc_id"), hash.as("simhash")).orderBy("doc_id")
  }

  def simhashSql: String = {
    val bitSums = (0 until Consts.SimHashBits).map { k =>
      val hi = Consts.HexHigh.map(h => s"'$h'").mkString(", ")
      s"sum(CASE WHEN substring(h, ${k + 1}, 1) IN ($hi) THEN 1 ELSE -1 END) AS b$k"
    }.mkString(",\n    ")
    val hash = (0 until Consts.SimHashBits)
      .map(k => s"CASE WHEN b$k > 0 THEN ${1L << k} ELSE 0 END").mkString(" + ")
    s"""SELECT doc_id, cast($hash as bigint) AS simhash FROM (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM (SELECT doc_id, md5(unnest(t)) AS h
       |        FROM (SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') t FROM documents))
       |  GROUP BY doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Near-dup candidates: simhash pairs within hamming distance <= 3. */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = simhash(spark, sfDir)
    val a = sig.alias("a"); val b = sig.alias("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long"))
      .filter(col("hamming") <= Consts.SimhashMaxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  def simhashPairsSql: String =
    s"""WITH sig AS (${simhashSql.replace("ORDER BY doc_id", "")})
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  cast(bit_count(xor(a.simhash, b.simhash)) as bigint) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= ${Consts.SimhashMaxHamming}
       |ORDER BY doc_a, doc_b""".stripMargin
}
