package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Hybrid retrieval: Reciprocal Rank Fusion (RRF, Cormack/Clarke/
  * Büttcher 2009) of a lexical BM25 ranking and a hash-embedding
  * cosine ranking over the documents table — the standard two-signal
  * retrieval stack of a curation pipeline (pull topic subsets from a
  * web corpus with lexical precision AND embedding recall; the same
  * fusion a RAG serving tier runs). The reference's chat pipeline runs
  * these signals sequentially (vector fetch then rerank,
  * /root/reference/src/hyde.rs:500-560); fusion treats them as peers,
  * which is the form that needs no score calibration — RRF consumes
  * RANKS, not scores, so the two rankers' incomparable score scales
  * never meet.
  *
  * Determinism discipline: each ranker's rank is pinned by a total
  * order (score desc, doc_id asc); the fused score is the integer
  * `1000000 div (60 + rank)` sum (k=60, the paper's constant), so the
  * whole report is bigint and hash-checks cross-engine. A candidate
  * missing from one ranking contributes 0 from that side (reported as
  * rank 0, never null, so the hash gate sees identical bytes).
  *
  * Scale shape: the lexical side is q85's plan (query-term filter
  * inside the scan projection, |terms|-row broadcast df, scalar-stats
  * broadcast, top-N via TakeOrderedAndProject); the semantic side is
  * q33's inverted-index shape restricted to the QUERY's buckets (the
  * ≤3-row bucket table broadcasts, so candidate dots ride one
  * map-side-combined agg, and only docs sharing a query bucket ever
  * leave the scan). Both rankings collapse to CandidateDepth rows via
  * orderBy+limit (physical top-k, never a global sort/window over the
  * corpus) BEFORE the bounded rank window and the full-outer fuse run
  * on ≤2·CandidateDepth rows. */
object Hybrid {

  /** per-ranker candidate list depth feeding the fusion. */
  val CandidateDepth = 50
  /** fused rows reported. */
  val FusedTopK = 20
  /** the paper's smoothing constant. */
  val RrfK = 60

  private def nib(c: Char): Int = "0123456789abcdef".indexOf(c)

  /** The fixed query's 256-slot hash-embedding histogram, computed
    * driver-side from constants (bucket = first md5 byte, exactly
    * HashingEmbedder/q33 semantics over the lowercased terms). */
  private[ops] def queryBuckets(terms: Seq[String]): Seq[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    terms.map(_.toLowerCase)
      .map { t =>
        val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (d(0) & 0xff).toLong
      }
      .groupBy(identity).toSeq
      .map { case (b, g) => (b, g.size.toLong) }
      .sortBy(_._1)
  }

  /** (doc_id, lex_rank 1..N): BM25 top-N for the fixed query — q85's
    * exact pipeline with the ranking depth widened to CandidateDepth
    * and the rank materialized (window over the already-limited N-row
    * frame, so the window task is constant-sized). */
  private def lexicalRanked(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = TextAnalytics.tokens(col("text"))
    val isQueryTerm = (t: Column) =>
      TextAnalytics.Bm25Terms.map(q => t === lit(q)).reduce(_ || _)
    val perTerm = docs.select(col("doc_id"), size(toks).as("dl"),
        explode(filter(toks, isQueryTerm)).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val stats = broadcast(docs.select(size(toks).as("dl0"))
      .agg(count(lit(1)).as("nd"), sum(col("dl0")).as("sdl")))
    val dfc = broadcast(perTerm.groupBy("term").agg(count(lit(1)).as("df")))
    val top = perTerm.join(dfc, "term").crossJoin(stats)
      .withColumn("tscore", expr(TextAnalytics.bm25ScoreExpr))
      .groupBy("doc_id").agg(sum(col("tscore")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(CandidateDepth)
    top.withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "lex_rank")
  }

  /** (doc_id, sem_rank 1..N): cosine of each doc's 256-bucket hash
    * embedding against the query histogram, top-N. Only docs sharing
    * at least one query bucket have a dot at all — the join IS the
    * candidate filter, exactly the inverted-index discipline of q33. */
  private def semanticRanked(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val qb = queryBuckets(TextAnalytics.Bm25Terms)
    val qnrm = qb.map { case (_, c) => c * c }.sum
    val qbDf = broadcast(qb.toDF("b", "qc"))
    val dots = ChatOracle.bucketed(spark, sfDir).join(qbDf, Seq("b"))
      .groupBy("doc_id").agg(sum(col("qc") * col("c")).as("dot"))
    val top = dots.join(ChatOracle.docNorms(spark, sfDir), "doc_id")
      .withColumn("sim", col("dot").cast("double") /
        (sqrt(lit(qnrm).cast("double")) * sqrt(col("nrm").cast("double"))))
      .orderBy(col("sim").desc, col("doc_id").asc)
      .limit(CandidateDepth)
    top.withColumn("sem_rank",
        row_number().over(Window.orderBy(col("sim").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "sem_rank")
  }

  /** q127: RRF-fused hybrid top-k.
    * Columns: doc_id, lex_rank, sem_rank (0 = absent from that
    * ranking), rrf (integer fused score), rank. */
  def rrfHybrid(spark: SparkSession, sfDir: String): DataFrame = {
    val lex = lexicalRanked(spark, sfDir)
    val sem = semanticRanked(spark, sfDir)
    val fusedExpr = expr(s"CASE WHEN lex_rank > 0 THEN 1000000 div (${RrfK} + lex_rank) ELSE 0 END + " +
      s"CASE WHEN sem_rank > 0 THEN 1000000 div (${RrfK} + sem_rank) ELSE 0 END")
    lex.join(sem, Seq("doc_id"), "full_outer")
      .na.fill(0L, Seq("lex_rank", "sem_rank"))
      .withColumn("rrf", fusedExpr)
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(FusedTopK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "lex_rank", "sem_rank", "rrf", "rank")
  }

  def rrfHybridSql: String = {
    val inList = TextAnalytics.Bm25Terms.map(t => s"'$t'").mkString(", ")
    val qbRows = TextAnalytics.Bm25Terms.map(t =>
      s"SELECT (strpos('0123456789abcdef', substring(md5(lower('$t')), 1, 1)) - 1) * 16 + " +
        s"strpos('0123456789abcdef', substring(md5(lower('$t')), 2, 1)) - 1 AS b").mkString(" UNION ALL ")
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') AS t
       |  FROM documents),
       |per AS (
       |  SELECT doc_id, dl, term, cast(count(*) as bigint) AS tf FROM (
       |    SELECT doc_id, cast(len(t) as int) AS dl,
       |      unnest(list_filter(t, x -> x IN ($inList))) AS term
       |    FROM tok)
       |  GROUP BY doc_id, dl, term),
       |stats AS (
       |  SELECT cast(count(*) as bigint) AS nd, cast(sum(len(t)) as bigint) AS sdl FROM tok),
       |dfc AS (SELECT term, cast(count(*) as bigint) AS df FROM per GROUP BY term),
       |lextop AS (
       |  SELECT doc_id, cast(sum(${TextAnalytics.bm25ScoreExpr}) as bigint) AS score
       |  FROM per JOIN dfc USING (term) CROSS JOIN stats
       |  GROUP BY doc_id
       |  ORDER BY score DESC, doc_id ASC LIMIT $CandidateDepth),
       |lex AS (
       |  SELECT doc_id, cast(row_number() OVER (ORDER BY score DESC, doc_id ASC) as bigint) AS lex_rank
       |  FROM lextop),
       |ltoks AS (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x != '')) AS tok
       |  FROM documents),
       |buckets AS (
       |  SELECT doc_id,
       |    (strpos('0123456789abcdef', substring(md5(tok), 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substring(md5(tok), 2, 1)) - 1 AS b,
       |    cast(count(*) as bigint) AS c
       |  FROM ltoks GROUP BY 1, 2),
       |norms AS (SELECT doc_id, sum(c*c) AS nrm FROM buckets GROUP BY doc_id),
       |qb AS (SELECT b, cast(count(*) as bigint) AS qc FROM ($qbRows) GROUP BY b),
       |qn AS (SELECT sum(qc*qc) AS qnrm FROM qb),
       |sdots AS (
       |  SELECT d.doc_id, sum(qb.qc * d.c) AS dot
       |  FROM buckets d JOIN qb ON d.b = qb.b GROUP BY d.doc_id),
       |semtop AS (
       |  SELECT sdots.doc_id,
       |    cast(dot as double) / (sqrt(cast(qnrm as double)) * sqrt(cast(nrm as double))) AS sim
       |  FROM sdots CROSS JOIN qn JOIN norms ON norms.doc_id = sdots.doc_id
       |  ORDER BY sim DESC, sdots.doc_id ASC LIMIT $CandidateDepth),
       |sem AS (
       |  SELECT doc_id, cast(row_number() OVER (ORDER BY sim DESC, doc_id ASC) as bigint) AS sem_rank
       |  FROM semtop),
       |fused AS (
       |  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       |    coalesce(lex_rank, 0) AS lex_rank, coalesce(sem_rank, 0) AS sem_rank,
       |    (CASE WHEN coalesce(lex_rank, 0) > 0 THEN 1000000 // ($RrfK + lex_rank) ELSE 0 END +
       |     CASE WHEN coalesce(sem_rank, 0) > 0 THEN 1000000 // ($RrfK + sem_rank) ELSE 0 END) AS rrf
       |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
       |  ORDER BY rrf DESC, doc_id ASC LIMIT $FusedTopK)
       |SELECT doc_id, lex_rank, sem_rank, rrf,
       |  cast(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) as bigint) AS rank
       |FROM fused
       |ORDER BY rank""".stripMargin
  }
}
