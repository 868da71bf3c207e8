package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Consts, Tables}
import graft.ops.TextAnalytics.{tokens, shingles3, sqlShingles}

/** Incremental-ingest admission: the frozen-corpus reference, the
  * persisted band-partitioned admission index (save/load/append/
  * compact), and the at-ingest train/test split guard.
  *
  * One mixin slice of [[Dedup]] (round-12 file split along the family
  * seams; no behavior change — every member keeps its `Dedup.` call
  * surface through the mixin).
  */
/** Frozen-corpus reference triple (top-level for the same no-outer
  * rule as [[DocShingles]]). */
private[graft] case class FrozenCorpus(hashes: DataFrame, banded: DataFrame,
                                       sets: DataFrame)

trait DedupAdmission { this: Dedup.type =>


  // -------------------------------------------------------------------
  // Incremental-ingest dedup: the daily-batch admission check.
  // -------------------------------------------------------------------

  /** Source treated as the INCOMING batch; every other source is the
    * already-ingested corpus. (The synthetic corpus has no ingest
    * timestamp, so a source plays the role of "today's crawl".) */
  val IncrementalSource = "src0"

  /** q99: incremental dedup — the admission check a continuously-fed
    * corpus runs on each new batch: which incoming documents are
    * exact copies of something already ingested, which are near-dups
    * of it (MinHash-LSH at the q14 threshold), and which actually
    * add novel content. Per-document verdicts, not a report, because
    * the verdict column IS the ingest filter.
    *
    * Scale shape: the batch is small relative to the corpus, so the
    * batch side of every join BROADCASTS (its band rows and its
    * content hashes); the corpus is scanned, never shuffled, for the
    * LSH candidate join, and the exact check is one keyed equi-join
    * on the content hash. Candidate verification joins are
    * candidate-sized. The corpus's own internal duplicates are
    * irrelevant here by design — this op answers "is it new", not
    * "is the corpus clean" (q74 answers that). Duplicates WITHIN the
    * incoming batch are likewise out of scope: admitted docs still
    * pass through the corpus-internal dedup (q13/q74) on ingest, the
    * same two-stage discipline real crawl pipelines run. */
  /** The frozen corpus reference the admission check joins against:
    * distinct content hashes, the exploded band table, and the
    * per-doc shingle sets — all from corpus sources only. */

  /** Drop band buckets larger than `cap` — the ONE filter frozenCorpus
    * and compactDedupIndex share, so build-time and compaction-time
    * capping cannot drift. */
  private[ops] def capBanded(banded: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band_hash")
    banded.withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= cap).drop("bsz")
  }

  /** `bandCap`: the admission-side twin of `candidateOverlap`'s
    * hot-bucket guard. The admission join is corpus-banded ×
    * broadcast batch (not a self-join), so its fan-out is |corpus
    * bucket| × |batch bucket| — bounded by the batch, but a web-scale
    * TEMPLATE family still puts 10^5+ corpus rows in one bucket, and
    * one incoming member of that family then drags the whole bucket
    * through candidate verification. Capping at FREEZE time drops
    * oversized buckets from the probe side once, for every subsequent
    * admission (batch, stream, or artifact-served): an incoming doc
    * is missed only if every band it shares with the corpus is
    * oversubscribed — i.e. it belongs to a template family large
    * enough that its dedup story is the cluster/survivorship family,
    * and the EXACT-hash check (uncapped, one equi-join) still drops
    * byte-identical members. `None` (default, oracle mode) is
    * uncapped — the DuckDB-checked queries stay byte-identical. */
  private[graft] def frozenCorpus(spark: SparkSession, sfDir: String,
                                  bits: Int = DefaultHashBits,
                                  bandCap: Option[Int] = None): FrozenCorpus = {
    val (summary, _, _) = sharedSummary(spark, sfDir, bits)
    val corpusSummary = summary.filter(col("source") =!= IncrementalSource)
    val banded0 = corpusSummary.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    // unlike candidateOverlap (whose count window rides the shuffle its
    // self-join needs anyway), the admission join BROADCASTS the batch
    // side and streams the corpus side with no exchange — so this
    // window is one genuinely extra (band_idx, band_hash) exchange,
    // paid ONCE at freeze/build time and amortized across every
    // serving admission that then probes the bounded table
    val banded = bandCap.fold(banded0)(capBanded(banded0, _))
    FrozenCorpus(
      hashes = Tables.documents(spark, sfDir)
        .filter(col("source") =!= IncrementalSource)
        .select(md5(col("text").cast("binary")).as("h")).distinct(),
      banded = banded,
      sets = corpusSummary.select(col("doc_id"), col("s")))
  }

  /** Checkpointed frozen-corpus reference, cached per (sfDir, bits)
    * for the JVM lifetime. The admission reference is train-once/
    * serve-many state (the q41 bucket-table / q81 IVF-artifact
    * discipline): freezing — summary scan + three localCheckpoints —
    * is the BUILD half, and every subsequent admission (batch q99 or
    * any number of q102 stream replays) joins the same pinned blocks.
    * Deliberately NOT Materialize-tracked: a release() between bench
    * passes would unpersist lineage-truncated RDDs, which cannot
    * recompute; the pinned tables are narrow (one row per corpus doc).
    * Corpus re-freeze = new JVM or a new (sfDir, bits) key — the same
    * quiesce contract as IvfStream compaction. */
  @transient private val frozenCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), FrozenCorpus]()

  /** Test seam: drop every cached frozen corpus AND unpersist its
    * pinned blocks, so the next admission rebuilds the freeze pipeline
    * from scratch (AqeParitySpec re-freezes under each execution mode —
    * without this the build half would run once and the "AQE on" pass
    * would only ever join cached blocks). */
  private[graft] def resetFrozenCorpusCache(): Unit = {
    import scala.jdk.CollectionConverters._
    frozenCache.values.asScala.foreach { fc =>
      Seq(fc.hashes, fc.banded, fc.sets).foreach(df =>
        try org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(df)
        catch { case _: Exception => () })
    }
    frozenCache.clear()
  }

  private[graft] def preparedFrozenCorpus(spark: SparkSession, sfDir: String,
                                          bits: Int = DefaultHashBits): FrozenCorpus =
    frozenCache.computeIfAbsent((sfDir, bits), _ => {
      val c0 = frozenCorpus(spark, sfDir, bits)
      // Size the pinned blocks to the corpus, not to shuffle.partitions:
      // the summary rows are narrower than the raw documents, so
      // input-bytes/128MB is a conservative upper bound on how many
      // blocks the reference needs. At test SF that is ONE block —
      // every admission stage then runs one task per consumer instead
      // of 32 near-empty ones; at 100 TB the same rule yields
      // thousands of blocks and full cluster parallelism. Sizing goes
      // through the Hadoop FileSystem so it is correct for single-file
      // AND directory parquet layouts on any filesystem (S3/HDFS too,
      // where java.nio cannot stat); if the filesystem cannot answer,
      // the checkpoint keeps its natural partitioning — a wrong-sized
      // coalesce is worse than none.
      val parts: Option[Int] =
        try {
          val p = new org.apache.hadoop.fs.Path(sfDir, "documents.parquet")
          val bytes = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .getContentSummary(p).getLength
          Some(math.min(math.max(1L, bytes / (128L << 20)), 1L << 20).toInt)
        } catch { case _: Exception => None }
      def pin(df: DataFrame): DataFrame =
        parts.fold(df)(df.coalesce).localCheckpoint(true)
      FrozenCorpus(pin(c0.hashes), pin(c0.banded), pin(c0.sets))
    })

  /** Admission verdicts for an arbitrary batch of incoming documents
    * (doc_id, source, text) against a frozen corpus — the core batch
    * q99 and the streaming q102 share. No output ordering (the
    * caller orders; a stream appends). */
  private[graft] def admissionVerdicts(newDocs: DataFrame, corpus: FrozenCorpus,
                                       bits: Int = DefaultHashBits): DataFrame = {
    val nh = newDocs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("h"))
    val exact = nh.join(corpus.hashes, Seq("h"), "left_semi")
      .select(col("doc_id"), lit(true).as("exact_dup"))

    val nsum = docShingleSummaryOf(newDocs, bits)
    val nb = nsum.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash"))).alias("x")
    val cand = corpus.banded.alias("y").join(broadcast(nb),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash"))
      .select(col("x.doc_id").as("doc_new"), col("y.doc_id").as("doc_old"))
      .distinct()
    val near = cand
      .join(nsum.select(col("doc_id"), col("s")).alias("sa"),
        col("doc_new") === col("sa.doc_id"))
      .join(corpus.sets.alias("sb"), col("doc_old") === col("sb.doc_id"))
      .filter(size(array_intersect(col("sa.s"), col("sb.s"))).cast("double") /
        size(array_union(col("sa.s"), col("sb.s"))).cast("double")
        >= Consts.MinhashJaccardThreshold)
      .select(col("doc_new").as("doc_id")).distinct()
      .withColumn("near_dup", lit(true))

    newDocs.select("doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
        coalesce(col("near_dup"), lit(false)).as("near_dup"))
      .withColumn("verdict",
        when(col("exact_dup"), "drop_exact")
          .when(col("near_dup"), "drop_near")
          .otherwise("ingest"))
  }

  def incrementalDedup(spark: SparkSession, sfDir: String,
                       bits: Int = DefaultHashBits): DataFrame = {
    val newDocs = Tables.documents(spark, sfDir)
      .filter(col("source") === IncrementalSource)
      .select("doc_id", "source", "text")
    admissionVerdicts(newDocs, preparedFrozenCorpus(spark, sfDir, bits), bits)
      .orderBy("doc_id")
  }

  // -------------------------------------------------------------------
  // Persisted admission index — the durable-artifact half of the
  // train-once/serve-many split for the DEDUP family, mirroring the
  // IVF artifact (Similarity.saveIvfIndex): `preparedFrozenCorpus`
  // makes the freeze JVM-lifetime state, but at 100 TB admission runs
  // as MANY jobs over weeks and none of them should re-scan the corpus
  // to rebuild band tables. The freeze becomes a versioned build
  // artifact on shared storage:
  //   path/hashes/                   (h)                exact-dup keys
  //   path/banded/band_idx=<b>/      (doc_id, band_hash) LSH postings
  //   path/sets/                     (doc_id, s)        verify shingles
  // banded/ is PARTITIONED BY band_idx. A full admission probes every
  // band, so the partitioning does NOT prune that scan — its value is
  // band-parallel layout (each band's postings are contiguous files a
  // band-restricted read, re-band, or per-band compaction prunes to
  // directly) and the bounded per-band file listing. Appending
  // admitted docs is an append-mode write of the same three
  // projections — no rebuild, the same add() discipline as
  // assignToIndex.
  // -------------------------------------------------------------------

  /** Write the admission-index artifact for `sfDir`'s corpus (its
    * non-incremental sources — the same reference `frozenCorpus`
    * freezes in memory). `bandCap` (see [[frozenCorpus]]) is applied
    * at BUILD time, so every serving job inherits the bounded probe
    * side without paying the count window per admission. */
  def saveDedupIndex(spark: SparkSession, sfDir: String, path: String,
                     bits: Int = DefaultHashBits,
                     bandCap: Option[Int] = None): Unit = {
    val c = frozenCorpus(spark, sfDir, bits, bandCap)
    c.hashes.write.mode("overwrite").parquet(s"$path/hashes")
    c.banded.write.mode("overwrite").partitionBy("band_idx")
      .parquet(s"$path/banded")
    c.sets.write.mode("overwrite").parquet(s"$path/sets")
  }

  /** The artifact as a [[FrozenCorpus]]. `band_idx` is a hive
    * partition column on read, so its inferred type is pinned back to
    * the int `posexplode` emits in the in-memory freeze. */
  def loadDedupIndex(spark: SparkSession, path: String): FrozenCorpus =
    FrozenCorpus(
      hashes = spark.read.parquet(s"$path/hashes"),
      banded = spark.read.parquet(s"$path/banded")
        .withColumn("band_idx", col("band_idx").cast("int")),
      sets = spark.read.parquet(s"$path/sets"))

  /** Admission verdicts for an external batch served from a persisted
    * index — the production entry point: no corpus access at all, the
    * three artifact scans are the only reference reads. */
  def admissionFromIndex(spark: SparkSession, indexPath: String,
                         newDocs: DataFrame,
                         bits: Int = DefaultHashBits): DataFrame =
    admissionVerdicts(newDocs, loadDedupIndex(spark, indexPath), bits)

  /** Append ADMITTED documents (doc_id, source, text) to a persisted
    * admission index — the add() half of the lifecycle, mirroring
    * `Similarity.assignToIndex`/IvfStream: the same three projections
    * the build writes, in append mode, so the next admission's scans
    * see the new rows with no rebuild. `hashes/` may accumulate a
    * repeated h across append generations (exact-dup checks are
    * left-semi, so repeats are verdict-invisible); a periodic
    * [[compactDedupIndex]] is OPTIONAL hygiene, never a correctness
    * need. The
    * caller appends only verdict == "ingest" survivors — appending a
    * dropped doc would be harmless but wasted bytes. `bits` must match
    * the build's width (band hashes of different widths never
    * collide).
    *
    * Crash recovery: the three writes are not one transaction (plain
    * parquet dirs have no log). A crash between them leaves a partial
    * append whose only effect is UNDER-dropping (exact checks may see
    * the new docs before near checks do), and the recovery is simply
    * re-running the append: duplicates in any projection are
    * verdict-invisible (the lifecycle spec double-appends on purpose),
    * so the append is idempotent under retry; [[compactDedupIndex]]
    * normalizes the bytes later. Near-dups admitted during the gap are
    * caught by the corpus-internal pass (q74) — the standard two-stage
    * discipline.
    *
    * Appends write UNCAPPED postings even into a `bandCap`-built
    * artifact: a per-wave cap cannot see bucket sizes across append
    * generations, so capping here would be theater. A hot bucket that
    * regrows through appended waves is re-dropped by the next
    * [[compactDedupIndex]] with the same cap — capping is a build/
    * compact-time global decision, by design. */
  def appendToDedupIndex(spark: SparkSession, indexPath: String,
                         docs: DataFrame, bits: Int = DefaultHashBits): Unit = {
    // pin the narrow projection once: the caller's docs frame is
    // typically the admission join's survivors, and without this both
    // the hashes write and the summary pass would re-run that lineage
    val d = docs.select("doc_id", "source", "text").localCheckpoint(true)
    try {
      d.select(md5(col("text").cast("binary")).as("h")).distinct()
        .write.mode("append").parquet(s"$indexPath/hashes")
      // one batch-sized summary pass feeds both remaining projections
      val summary = docShingleSummaryOf(d, bits).localCheckpoint(true)
      try {
        summary.select(col("doc_id"),
            posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
          .write.mode("append").partitionBy("band_idx").parquet(s"$indexPath/banded")
        summary.select(col("doc_id"), col("s"))
          .write.mode("append").parquet(s"$indexPath/sets")
      } finally org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(summary)
    } finally org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(d)
  }

  /** The optional hygiene pass the append scaladoc promises: rewrite
    * an artifact into `dst` with `hashes/` deduplicated and each
    * projection's files re-laid (append generations fragment banded/
    * partitions into one file per wave). Compaction writes a NEW
    * versioned path rather than rewriting in place — reading and
    * overwriting the same parquet path races the lazy scan, and a
    * versioned swap is the same quiesce contract as IvfStream
    * compaction: serving jobs move to `dst` between admissions.
    * `bandCap` re-applies the build-time hot-bucket guard over the
    * whole compacted table — the point where appended generations'
    * bucket growth becomes globally visible (see appendToDedupIndex:
    * appends are deliberately uncapped). */
  def compactDedupIndex(spark: SparkSession, src: String, dst: String,
                        bandCap: Option[Int] = None): Unit = {
    // normalized comparison: a trailing slash or relative spelling of
    // the same dir must not sneak past into a read-and-overwrite race
    def norm(p: String) =
      java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString
    require(norm(src) != norm(dst), "compaction writes a new versioned path")
    val c = loadDedupIndex(spark, src)
    // distinct everywhere: legitimate appends never repeat a doc_id,
    // so on a well-used artifact only hashes/ actually shrinks — but a
    // double-appended doc's banded/sets rows normalize away too
    c.hashes.distinct().write.mode("overwrite").parquet(s"$dst/hashes")
    bandCap.fold(c.banded.distinct())(capBanded(c.banded.distinct(), _))
      .write.mode("overwrite").partitionBy("band_idx")
      .parquet(s"$dst/banded")
    c.sets.distinct().write.mode("overwrite").parquet(s"$dst/sets")
  }

  @transient private val dedupIndexes =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()

  /** JVM-lifetime artifact build (the q41/q81 discipline: the index
    * WRITE is the untimed build half; the timed query is the serving
    * read). Keyed like `frozenCache` — the cached value is just an
    * on-disk path any session can read, so a per-session key would
    * only rebuild an artifact that already exists. The path comes from
    * `StreamScratch` (unique per JVM, deleted at exit), so repeated
    * Bench/Scaling runs never accumulate scratch artifacts and two
    * JVMs can never collide on a shared name. */
  def preparedDedupIndex(spark: SparkSession, sfDir: String,
                         bits: Int = DefaultHashBits): String =
    dedupIndexes.computeIfAbsent((sfDir, bits), _ => {
      val path = graft.streaming.StreamScratch.dir(s"graft_dedupidx_b$bits")
      saveDedupIndex(spark, sfDir, path, bits)
      path
    })

  /** q105: q99 served from the persisted artifact (shares q99's
    * oracle — the artifact round-trip must be verdict-invisible). */
  def incrementalDedupFromIndex(spark: SparkSession, sfDir: String,
                                bits: Int = DefaultHashBits): DataFrame = {
    val newDocs = Tables.documents(spark, sfDir)
      .filter(col("source") === IncrementalSource)
      .select("doc_id", "source", "text")
    admissionFromIndex(spark, preparedDedupIndex(spark, sfDir, bits), newDocs, bits)
      .orderBy("doc_id")
  }

  def incrementalDedupSql: String = {
    val bandJoins = (0 until Consts.LshBands).map { b =>
      s"SELECT x.doc_id AS doc_new, y.doc_id AS doc_old FROM banded x JOIN banded y ON x.band$b = y.band$b AND x.source = '$IncrementalSource' AND y.source <> '$IncrementalSource'"
    }.mkString("\n    UNION\n    ")
    s"""WITH sets AS (
       |  SELECT doc_id, source, list_distinct([${shingleHashExpr("strpos", "md5(x)")} for x in s0]) AS s
       |  FROM (SELECT doc_id, source, $sqlShingles s0
       |        FROM (SELECT doc_id, source, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') t FROM documents))),
       |exploded AS (SELECT doc_id, source, unnest(s) AS hv FROM sets),
       |sig AS (SELECT doc_id, source,
       |    $minColsSql
       |  FROM exploded GROUP BY doc_id, source),
       |banded AS (SELECT doc_id, source,
       |    $bandColsSql
       |  FROM sig),
       |cand AS (
       |    $bandJoins),
       |near AS (
       |  SELECT DISTINCT doc_new FROM cand
       |  JOIN sets sa ON doc_new = sa.doc_id
       |  JOIN sets sb ON doc_old = sb.doc_id
       |  WHERE cast(len(list_intersect(sa.s, sb.s)) as double) / cast(len(list_distinct(sa.s || sb.s)) as double) >= ${Consts.MinhashJaccardThreshold}),
       |exact AS (
       |  SELECT DISTINCT n.doc_id FROM documents n
       |  JOIN documents c ON md5(n.text) = md5(c.text) AND c.source <> '$IncrementalSource'
       |  WHERE n.source = '$IncrementalSource')
       |SELECT d.doc_id,
       |  (e.doc_id IS NOT NULL) AS exact_dup,
       |  (nr.doc_new IS NOT NULL) AS near_dup,
       |  CASE WHEN e.doc_id IS NOT NULL THEN 'drop_exact'
       |       WHEN nr.doc_new IS NOT NULL THEN 'drop_near'
       |       ELSE 'ingest' END AS verdict
       |FROM documents d
       |LEFT JOIN exact e ON d.doc_id = e.doc_id
       |LEFT JOIN near nr ON d.doc_id = nr.doc_new
       |WHERE d.source = '$IncrementalSource'
       |ORDER BY d.doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // Admission split guard (q180): q177's leakage audit moved to where
  // it can still PREVENT the leak — the admission frontier. For each
  // incoming (src0) document: the split the q50 hash rule will route it
  // to, its verified near-dup partners against the FROZEN corpus and
  // against the wave itself (two wave near-dups routed apart leak
  // exactly like a wave↔corpus pair), and whether any partner lives in
  // a different split. A cross-split dup quarantines BEFORE it lands;
  // a same-split dup routes to the dedup path; a novel doc admits.
  // (Lee et al. ACL 2022 / Dodge et al. EMNLP 2021 contamination, as an
  // at-ingest gate rather than a post-hoc report.)
  //
  // Scale shape: candidate generation is the q99/q102 admission probe —
  // the wave's bands BROADCAST into the frozen band postings, never the
  // reverse — plus the wave-sized wave↔wave arm; split tags ride one
  // doc_id-only corpus projection joined to the ANSWER-SIZED edge list
  // (both orientations of the verified pairs); the report is one
  // doc-keyed agg over wave-sized rows, and every incoming doc gets a
  // row (novel docs report zeros — an admission verdict must cover the
  // whole wave).
  // -------------------------------------------------------------------

  def admissionSplitGuard(spark: SparkSession, sfDir: String,
                          bits: Int = DefaultHashBits): DataFrame = {
    val newDocs = Tables.documents(spark, sfDir)
      .filter(col("source") === IncrementalSource)
      .select("doc_id", "source", "text")
    splitGuardReport(spark, sfDir,
      admissionPairs(newDocs, preparedFrozenCorpus(spark, sfDir, bits), bits))
  }

  /** The guard's report half over an externally supplied verified-pair
    * relation (doc_a, doc_b, inter, uni) — the seam the STREAMING twin
    * (q181) serves through: per-batch pair emission unions to exactly
    * [[admissionPairs]]'s pair set (see admissionPairsWithPrior), so
    * stream and batch reports are row-identical by construction. */
  private[graft] def splitGuardReport(spark: SparkSession, sfDir: String,
                                      rawPairs: DataFrame): DataFrame = {
    val newDocs = Tables.documents(spark, sfDir)
      .filter(col("source") === IncrementalSource)
      .select("doc_id", "source", "text")
    val pairs = rawPairs
      .select(col("doc_a"), col("doc_b"),
        expr("cast(inter as bigint) * 1000 div cast(uni as bigint)").as("jac_permille"))
    val spl = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        Sampling.splitOf(pmod(Sampling.docIdHash, lit(100L))).as("split"),
        col("source"))
    val edges = pairs
      .select(col("doc_b").as("doc_id"), col("doc_a").as("partner"), col("jac_permille"))
      .unionAll(pairs
        .select(col("doc_a").as("doc_id"), col("doc_b").as("partner"), col("jac_permille")))
    val waveEdges = edges
      .join(spl.filter(col("source") === IncrementalSource)
        .select(col("doc_id"), col("split").as("own_split")), Seq("doc_id"))
      .join(spl.select(col("doc_id").as("partner"), col("split").as("partner_split")),
        Seq("partner"))
    val agg = waveEdges.groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_matches"),
        sum(when(col("own_split") =!= col("partner_split"), 1L).otherwise(0L))
          .as("n_cross_split"),
        max(when(col("own_split") =!= col("partner_split"), col("jac_permille"))
          .otherwise(lit(0L))).as("max_cross_permille"))
    newDocs.select(col("doc_id"))
      .withColumn("own_split", Sampling.splitOf(pmod(Sampling.docIdHash, lit(100L))))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("own_split"),
        coalesce(col("n_dup_matches"), lit(0L)).as("n_dup_matches"),
        coalesce(col("n_cross_split"), lit(0L)).as("n_cross_split"),
        coalesce(col("max_cross_permille"), lit(0L)).as("max_cross_permille"))
      .withColumn("verdict",
        when(col("n_cross_split") > 0, "quarantine")
          .when(col("n_dup_matches") > 0, "dedup_same_split")
          .otherwise("admit"))
      .orderBy("doc_id")
  }

  def admissionSplitGuardSql: String = {
    val bandJoins = (0 until Consts.LshBands).map { b =>
      s"SELECT x.doc_id AS d, y.doc_id AS p FROM banded x JOIN banded y ON x.band$b = y.band$b AND x.source = '$IncrementalSource' AND x.doc_id <> y.doc_id"
    }.mkString("\n    UNION\n    ")
    s"""WITH sets AS (
       |  SELECT doc_id, source, list_distinct([${shingleHashExpr("strpos", "md5(x)")} for x in s0]) AS s
       |  FROM (SELECT doc_id, source, $sqlShingles s0
       |        FROM (SELECT doc_id, source, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') t FROM documents))),
       |exploded AS (SELECT doc_id, source, unnest(s) AS hv FROM sets),
       |sig AS (SELECT doc_id, source,
       |    $minColsSql
       |  FROM exploded GROUP BY doc_id, source),
       |banded AS (SELECT doc_id, source,
       |    $bandColsSql
       |  FROM sig),
       |cand AS (
       |    $bandJoins),
       |ver AS (
       |  SELECT DISTINCT d, p,
       |    (cast(len(list_intersect(sa.s, sb.s)) as bigint) * 1000)
       |      // cast(len(list_distinct(sa.s || sb.s)) as bigint) AS jac_permille
       |  FROM cand
       |  JOIN sets sa ON d = sa.doc_id
       |  JOIN sets sb ON p = sb.doc_id
       |  WHERE cast(len(list_intersect(sa.s, sb.s)) as double) / cast(len(list_distinct(sa.s || sb.s)) as double) >= ${Consts.MinhashJaccardThreshold}),
       |spl AS (
       |  SELECT doc_id, ${Sampling.sqlSplitCase} AS split
       |  FROM documents),
       |agg AS (
       |  SELECT d AS doc_id,
       |    cast(count(*) as bigint) AS n_dup_matches,
       |    cast(sum(CASE WHEN so.split <> sp.split THEN 1 ELSE 0 END) as bigint) AS n_cross_split,
       |    max(CASE WHEN so.split <> sp.split THEN jac_permille ELSE cast(0 as bigint) END) AS max_cross_permille
       |  FROM ver JOIN spl so ON d = so.doc_id JOIN spl sp ON p = sp.doc_id
       |  GROUP BY d)
       |SELECT n.doc_id, s.split AS own_split,
       |  coalesce(a.n_dup_matches, 0) AS n_dup_matches,
       |  coalesce(a.n_cross_split, 0) AS n_cross_split,
       |  coalesce(a.max_cross_permille, 0) AS max_cross_permille,
       |  CASE WHEN coalesce(a.n_cross_split, 0) > 0 THEN 'quarantine'
       |       WHEN coalesce(a.n_dup_matches, 0) > 0 THEN 'dedup_same_split'
       |       ELSE 'admit' END AS verdict
       |FROM documents n
       |JOIN spl s ON n.doc_id = s.doc_id
       |LEFT JOIN agg a ON n.doc_id = a.doc_id
       |WHERE n.source = '$IncrementalSource'
       |ORDER BY n.doc_id""".stripMargin
  }

  def clusterSplit(spark: SparkSession, sfDir: String,
                   bits: Int = DefaultHashBits): DataFrame =
    clusterSplitWith(spark, sfDir,
      starComponents(dedupGraphEdges(spark, sfDir, bits)))

  /** q91 over an external (node, label) component table (the
    * persisted-graph serving seam). */
  private[graft] def clusterSplitWith(spark: SparkSession, sfDir: String,
                                      comp: DataFrame): DataFrame = {
    def hash32(colName: String): org.apache.spark.sql.Column =
      graft.core.Hash32.column(s"md5(cast($colName as string))")
    def splitOf(bucket: org.apache.spark.sql.Column) =
      when(bucket < Sampling.TrainPct, "train")
        .when(bucket < Sampling.TrainPct + Sampling.ValPct, "val")
        .otherwise("test")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    docs.join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .withColumn("root", coalesce(col("label"), col("doc_id")))
      .withColumn("split", splitOf(pmod(hash32("root"), lit(100L))))
      .withColumn("naive_split", splitOf(pmod(hash32("doc_id"), lit(100L))))
      .groupBy("root", "split")
      .agg(count(lit(1)).as("nd"),
        countDistinct(col("naive_split")).as("n_naive"))
      .groupBy("split")
      .agg(sum(col("nd")).as("n_docs"),
        count(lit(1)).as("n_clusters"),
        sum(when(col("n_naive") > 1, 1L).otherwise(0L)).as("naive_mixed_clusters"))
      .orderBy("split")
  }

  def clusterSplitSql: String = {
    def sqlHash32(colName: String) =
      graft.core.Hash32.sql(s"md5(cast($colName as varchar))")
    def sqlSplit(h: String) =
      s"""CASE WHEN $h % 100 < ${Sampling.TrainPct} THEN 'train'
         |     WHEN $h % 100 < ${Sampling.TrainPct + Sampling.ValPct} THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH RECURSIVE
       |$sqlDedupGraphCtes,
       |rooted AS (
       |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS root
       |  FROM ddocs d LEFT JOIN comp c USING (doc_id)),
       |assigned AS (
       |  SELECT root,
       |    ${sqlSplit(sqlHash32("root"))} AS split,
       |    ${sqlSplit(sqlHash32("doc_id"))} AS naive_split
       |  FROM rooted),
       |per_root AS (
       |  SELECT root, split, cast(count(*) as bigint) AS nd,
       |    cast(count(DISTINCT naive_split) as bigint) AS n_naive
       |  FROM assigned GROUP BY root, split)
       |SELECT split, cast(sum(nd) as bigint) AS n_docs,
       |  cast(count(*) as bigint) AS n_clusters,
       |  cast(sum(CASE WHEN n_naive > 1 THEN 1 ELSE 0 END) as bigint) AS naive_mixed_clusters
       |FROM per_root
       |GROUP BY split
       |ORDER BY split""".stripMargin
  }
}
