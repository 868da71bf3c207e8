package graft.chat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.chat.Schemas.QueryClassification

/** Query-time filtering / sorting / top-k pipeline (reference:
  * src/hyde.rs:824-1214, ops F1-F10) and the rerank stage (R2).
  *
  * Operates on the kNN candidate DataFrame `(file, code, language,
  * extension, distance, rank)`. Semantics replicate the reference
  * exactly, including its quirks:
  *  - folder matching is SUBSTRING-based, not path-segment-normalized
  *    (hyde.rs:833-839);
  *  - the doc-extension set differs between the code/doc split
  *    (md|txt|rst|adoc — hyde.rs:1016) and the non-code preference sort
  *    (md|txt|rst — hyde.rs:1190); both are preserved;
  *  - doc quota decision tree (hyde.rs:1117-1160) including the
  *    >=3-code-rows check, a genuine count barrier.
  */
object Retrieval {

  /** Upper bound on the crossRerank input window: comfortably above any
    * real k*2 over-fetch (CLI k maxes in the tens) while far below
    * anything corpus-sized. */
  val MaxRerankWindow = 256

  // -------------------------------------------------------------------
  // F2: folder include-filter (hyde.rs:824-866).
  // -------------------------------------------------------------------

  def folderMatch(path: Column, folder: String): Column = {
    val lastSeg = folder.split('/').lastOption.getOrElse(folder)
    path.contains(s"/$folder/") ||
      path.startsWith(s"$folder/") ||
      (path.contains(s"/$folder") && path.endsWith(s"/$lastSeg"))
  }

  def folderFilter(df: DataFrame, folders: Seq[String]): DataFrame =
    if (folders.isEmpty) df
    else df.filter(folders.map(f => folderMatch(col("file"), f)).reduce(_ || _))

  // -------------------------------------------------------------------
  // F3: extension include-filter with path fallback (hyde.rs:868-927).
  // -------------------------------------------------------------------

  def extensionFilter(df: DataFrame, targets: Seq[String]): DataFrame = {
    if (targets.isEmpty) return df
    val norm = targets.map(_.dropWhile(_ == '.'))
    val metaMatch = norm.map(t =>
      regexp_replace(col("extension"), "^\\.+", "") === t).reduce(_ || _)
    val pathMatch = norm.map(t => col("file").endsWith(s".$t")).reduce(_ || _)
    df.filter(when(col("extension").isNotNull, metaMatch).otherwise(pathMatch))
  }

  // -------------------------------------------------------------------
  // F4: exclude anti-filter (hyde.rs:929-964). The bare contains check
  // subsumes the slash variants; replicated in full regardless.
  // -------------------------------------------------------------------

  def excludeFilter(df: DataFrame, patterns: Seq[String]): DataFrame =
    if (patterns.isEmpty) df
    else {
      val lower_file = lower(col("file"))
      val hit = patterns.map { p0 =>
        val p = p0.toLowerCase
        lower_file.contains(p) || lower_file.contains(s"/$p/") ||
          lower_file.startsWith(s"$p/") || lower_file.endsWith(s"/$p")
      }.reduce(_ || _)
      df.filter(!hit)
    }

  // -------------------------------------------------------------------
  // F5: code/doc classification (hyde.rs:1012-1056).
  // -------------------------------------------------------------------

  val DocExtsSplit = Seq("md", "txt", "rst", "adoc")   // hyde.rs:1016
  val DocExtsPrefer = Seq("md", "txt", "rst")          // hyde.rs:1190

  def isDocCol: Column = {
    val lf = lower(col("file"))
    val pathIsCode = !lf.endsWith(".md") && !lf.endsWith(".txt") &&
      !lf.contains("/docs/") && !lf.contains("readme") &&
      !lf.contains("resources") && !lf.contains("changelog") &&
      !lf.contains("license")
    when(col("extension").isNotNull, col("extension").isin(DocExtsSplit: _*))
      .otherwise(!pathIsCode)
  }

  // -------------------------------------------------------------------
  // F6: language-priority sort key (hyde.rs:1064-1107).
  // -------------------------------------------------------------------

  def langMatchCol(targetLang: String): Column = {
    val t = targetLang.toLowerCase
    val extToLang = Language.dimensionRows
      .map { case (e, l) => (e, l.toLowerCase) }.toMap
    val viaExt = extToLang.filter(_._2 == t).keys.toSeq
    val extMatch =
      if (viaExt.isEmpty) lit(false)
      else col("extension").isNotNull && lower(col("extension")).isin(viaExt: _*)
    (lower(col("language")) === t) || extMatch
  }

  // -------------------------------------------------------------------
  // The composed pipeline (apply_llm_based_filtering, hyde.rs:976-1214).
  // -------------------------------------------------------------------

  def applyFilters(results: DataFrame, c: QueryClassification, k: Int): DataFrame = {
    var df = folderFilter(results, c.target_folders.getOrElse(Seq.empty))
    df = extensionFilter(df, c.target_extensions.getOrElse(Seq.empty))
    df = excludeFilter(df, c.exclude_patterns.getOrElse(Seq.empty))

    // the branch/priority pair makes the final order a SINGLE orderBy —
    // deterministic under any partitioning (no reliance on union order)
    val out =
      if (c.wants_code && c.confidence > 0.7) {
        val tagged = df.withColumn("is_doc", isDocCol)
        val code = tagged.filter(!col("is_doc"))
        val docs = tagged.filter(col("is_doc"))
        val sortedCode = (c.language match {
          case Some(lang) => code.withColumn("priority", langMatchCol(lang).cast("int"))
          case None       => code.withColumn("priority", lit(0))
        }).withColumn("branch", lit(0))
        val nCode = sortedCode.count()
        val docLimit: Int =
          if (c.confidence > 0.8) 0
          else c.intent match {
            case "how_it_works" => if (nCode >= 3) 0 else 1
            case "implementation" | "debugging" => 0
            case "explanation" => 1
            case _ => 0
          }
        val quotaDocs = docs.orderBy(col("distance").asc).limit(docLimit)
          .withColumn("priority", lit(0)).withColumn("branch", lit(1))
        sortedCode.unionAll(quotaDocs).drop("is_doc")
      } else {
        val isDocPrefer = (col("extension").isNotNull &&
          col("extension").isin(DocExtsPrefer: _*)).cast("int")
        val priority = if (!c.wants_code) isDocPrefer else lit(0)
        df.withColumn("priority", priority).withColumn("branch", lit(0))
      }
    out.orderBy(col("branch").asc, col("priority").desc, col("distance").asc)
      .limit(k) // F9 truncate
      .drop("branch", "priority")
  }

  // -------------------------------------------------------------------
  // R2: rerank — deterministic lexical-overlap cross-scorer stand-in
  // for the cross-encoder (rerank.rs:16-19); higher = better,
  // descending sort (hyde.rs:529-542).
  // -------------------------------------------------------------------

  /** R2 with the cross-encoder-shaped [[Reranker]]: the candidate
    * window (<= k*2 rows by construction, F1 over-fetch) is scored in
    * ONE rerank(query, docs) call — the reference's exact contract
    * (rerank.rs:16-19 scores the retrieve window driver-side too) —
    * then re-sorted descending with distance as the tiebreak. The
    * bounded collect matches the reference's flow; this is a post-top-k
    * presentation stage, never a corpus-sized operator. */
  def crossRerank(results: DataFrame, query: String,
                  rr: Reranker = new TfidfReranker()): DataFrame = {
    val spark = results.sparkSession
    // F1 contract guard: the input is a post-top-k window (<= k*2
    // rows). Collecting through limit(max+1) bounds the driver-side
    // memory to 257 rows in the SAME job that fetches the window (a
    // separate count() would re-execute the whole retrieval lineage),
    // and the loud failure below catches a mis-wired corpus-sized
    // input before it can become a silent driver OOM.
    val rows = results.limit(Retrieval.MaxRerankWindow + 1).collect()
    require(rows.length <= Retrieval.MaxRerankWindow,
      s"crossRerank input exceeds ${Retrieval.MaxRerankWindow} rows — " +
        "it must be the k*2 over-fetch window (F1), not a corpus-sized frame")
    val docIdx = results.schema.fieldIndex("code")
    val scores = rr.rerank(query, rows.toSeq.map(_.getString(docIdx)))
    val scored = rows.zip(scores).map { case (r, s) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ s)
    }
    val schema = results.schema.add("rerank_score",
      org.apache.spark.sql.types.DoubleType, nullable = false)
    // LocalRelation (see ChatPipeline.query's window materialization):
    // the scored window lives on the driver; an RDD round-trip would
    // cost a job per downstream action
    spark.createDataFrame(java.util.Arrays.asList(scored: _*), schema)
      .orderBy(col("rerank_score").desc, col("distance").asc)
  }

  // -------------------------------------------------------------------
  // Driver-local twins of the presentation stages (round-12 serving
  // floor). ChatPipeline.query collects the F1 over-fetch window
  // (<= k*2 rows) to the driver anyway; running F2-F10 + R2 as Spark
  // actions over that LocalRelation cost ~115 ms/query in tiny-job
  // overhead — a third of the serving latency — for <= 6 rows of work.
  // The reference runs this stage driver-side too (hyde.rs:976-1214).
  //
  // The DataFrame operators above remain the batch/oracle path (q167
  // composedRetrieve pins them cross-engine); these twins replicate
  // their semantics row-for-row and RetrievalLocalParitySpec asserts
  // DataFrame-vs-local equality over the full classification grid.
  // -------------------------------------------------------------------

  private def folderMatchLocal(path: String, folder: String): Boolean = {
    val lastSeg = folder.split('/').lastOption.getOrElse(folder)
    path.contains(s"/$folder/") ||
      path.startsWith(s"$folder/") ||
      (path.contains(s"/$folder") && path.endsWith(s"/$lastSeg"))
  }

  private def extMatchLocal(file: String, extension: Option[String],
                            norm: Seq[String]): Boolean =
    extension match {
      case Some(e) => norm.contains(e.dropWhile(_ == '.'))
      case None    => norm.exists(t => file.endsWith(s".$t"))
    }

  private def excludedLocal(file: String, patterns: Seq[String]): Boolean = {
    val lf = file.toLowerCase
    patterns.exists { p0 =>
      val p = p0.toLowerCase
      lf.contains(p) || lf.contains(s"/$p/") ||
        lf.startsWith(s"$p/") || lf.endsWith(s"/$p")
    }
  }

  private def isDocLocal(file: String, extension: Option[String]): Boolean =
    extension match {
      case Some(e) => DocExtsSplit.contains(e)
      case None =>
        val lf = file.toLowerCase
        val pathIsCode = !lf.endsWith(".md") && !lf.endsWith(".txt") &&
          !lf.contains("/docs/") && !lf.contains("readme") &&
          !lf.contains("resources") && !lf.contains("changelog") &&
          !lf.contains("license")
        !pathIsCode
    }

  /** Priority under [[langMatchCol]]'s exact three-valued logic: the
    * column is `(lower(language) = t) OR extMatch`; with a NULL
    * language and no extension match that is SQL NULL, which the
    * `priority DESC` sort puts after 0 (nulls last) — encoded here as
    * -1 so the local descending sort lands identically. */
  private def langPriorityLocal(language: Option[String], extension: Option[String],
                                targetLang: String): Int = {
    val t = targetLang.toLowerCase
    val viaExt = Language.dimensionRows
      .filter(_._2.toLowerCase == t).map(_._1)
    val extM = viaExt.nonEmpty && extension.exists(e => viaExt.contains(e.toLowerCase))
    if (extM) 1
    else language match {
      case Some(l) => if (l.toLowerCase == t) 1 else 0
      case None    => -1 // SQL NULL: sorts after 0 under DESC
    }
  }

  /** One over-fetch-window row, driver-resident. */
  final case class LocalHit(file: String, code: String,
                            language: Option[String],
                            extension: Option[String], distance: Double)

  def localHits(rows: Seq[org.apache.spark.sql.Row],
                schema: org.apache.spark.sql.types.StructType): Seq[LocalHit] = {
    val iF = schema.fieldIndex("file"); val iC = schema.fieldIndex("code")
    val iL = schema.fieldIndex("language"); val iE = schema.fieldIndex("extension")
    val iD = schema.fieldIndex("distance")
    rows.map(r => LocalHit(r.getString(iF), r.getString(iC),
      Option(r.getString(iL)), Option(r.getString(iE)), r.getDouble(iD)))
  }

  /** Row-level twin of [[applyFilters]] — same branches, same decision
    * tree, same final (branch, -priority, distance) order, same k
    * truncation. Ties beyond those keys follow input order (the
    * DataFrame path leaves them unspecified). */
  def applyFiltersLocal(hits: Seq[LocalHit], c: QueryClassification,
                        k: Int): Seq[LocalHit] = {
    var hs = hits
    val folders = c.target_folders.getOrElse(Seq.empty)
    if (folders.nonEmpty)
      hs = hs.filter(h => folders.exists(f => folderMatchLocal(h.file, f)))
    val targets = c.target_extensions.getOrElse(Seq.empty)
    if (targets.nonEmpty) {
      val norm = targets.map(_.dropWhile(_ == '.'))
      hs = hs.filter(h => extMatchLocal(h.file, h.extension, norm))
    }
    val patterns = c.exclude_patterns.getOrElse(Seq.empty)
    if (patterns.nonEmpty) hs = hs.filterNot(h => excludedLocal(h.file, patterns))

    // (hit, branch, priority)
    val tagged: Seq[(LocalHit, Int, Int)] =
      if (c.wants_code && c.confidence > 0.7) {
        val (docs, code) = hs.partition(h => isDocLocal(h.file, h.extension))
        val sortedCode = code.map { h =>
          val pr = c.language match {
            case Some(lang) => langPriorityLocal(h.language, h.extension, lang)
            case None       => 0
          }
          (h, 0, pr)
        }
        val nCode = sortedCode.size
        val docLimit: Int =
          if (c.confidence > 0.8) 0
          else c.intent match {
            case "how_it_works" => if (nCode >= 3) 0 else 1
            case "implementation" | "debugging" => 0
            case "explanation" => 1
            case _ => 0
          }
        val quotaDocs = docs.sortBy(_.distance).take(docLimit).map(h => (h, 1, 0))
        sortedCode ++ quotaDocs
      } else {
        hs.map { h =>
          val pr =
            if (!c.wants_code && h.extension.exists(DocExtsPrefer.contains)) 1 else 0
          (h, 0, pr)
        }
      }
    tagged.sortBy { case (h, b, p) => (b, -p, h.distance) }
      .take(k).map(_._1)
  }

  /** Row-level twin of [[crossRerank]]: one rerank(query, docs) call
    * over the window, then (rerank_score desc, distance asc). Same
    * window-size guard. */
  def crossRerankLocal(hits: Seq[LocalHit], query: String,
                       rr: Reranker = new TfidfReranker()): Seq[LocalHit] = {
    require(hits.length <= MaxRerankWindow,
      s"crossRerank input exceeds $MaxRerankWindow rows — " +
        "it must be the k*2 over-fetch window (F1), not a corpus-sized frame")
    val scores = rr.rerank(query, hits.map(_.code))
    hits.zip(scores).sortBy { case (h, s) => (-s, h.distance) }.map(_._1)
  }

  def lexicalRerank(results: DataFrame, query: String): DataFrame = {
    val qTokens = query.toLowerCase.split("\\W+").filter(_.nonEmpty).distinct.toSeq
    val codeTokens = array_distinct(
      filter(split(lower(col("code")), "\\W+"), t => t =!= lit("")))
    val overlap = size(array_intersect(codeTokens, typedLit(qTokens))).cast("double")
    val denom = sqrt(lit(qTokens.size.toDouble) * size(codeTokens).cast("double"))
    results
      .withColumn("rerank_score",
        when(size(codeTokens) > 0, overlap / denom).otherwise(lit(0.0)))
      .orderBy(col("rerank_score").desc, col("distance").asc)
  }
}
