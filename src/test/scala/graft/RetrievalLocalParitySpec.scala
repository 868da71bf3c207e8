package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.chat.{Retrieval, TfidfReranker}
import graft.chat.Schemas.QueryClassification

/** Round-12 serving floor: ChatPipeline.query runs the F2-F10 + R2
  * presentation stages driver-local (Retrieval.applyFiltersLocal /
  * crossRerankLocal) over the collected over-fetch window. This spec is
  * the parity pin: over the full classification decision grid and a row
  * fixture that exercises every predicate branch, the local twins must
  * produce EXACTLY the rows, in EXACTLY the order, of the DataFrame
  * operators that q167's DuckDB oracle certifies.
  */
class RetrievalLocalParitySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("code", StringType, nullable = false),
    StructField("language", StringType, nullable = true),
    StructField("extension", StringType, nullable = true),
    StructField("distance", DoubleType, nullable = false)))

  // every predicate branch represented: code vs doc extensions, null
  // extension with doc-ish / code-ish paths, folder hits, excludable
  // paths, language matches via name and via extension, leading-dot
  // extension metadata. Distances strictly distinct so the DataFrame
  // path's tie order is fully specified.
  private val fixture: Seq[Row] = Seq(
    Row(1L, "src/main/app.scala", "def main(): Unit = run()", "Scala", "scala", 0.010),
    Row(2L, "docs/guide.md", "how the engine works end to end", "Markdown", "md", 0.020),
    Row(3L, "src/util/helpers.py", "def helper(): return 42", "Python", "py", 0.030),
    Row(4L, "README", "project readme without extension", null, null, 0.040),
    Row(5L, "scripts/build", "#!/bin/sh make all", null, null, 0.050),
    Row(6L, "notes.txt", "plain text notes", null, "txt", 0.060),
    Row(7L, "src/test/app_test.scala", "test suite for app", "Scala", "scala", 0.070),
    Row(8L, "vendor/lib/dep.js", "module.exports = {}", "JavaScript", "js", 0.080),
    Row(9L, "docs/api.rst", "api reference text", null, "rst", 0.090),
    Row(10L, "src/main/core.rs", "fn core() -> i32 { 0 }", "Rust", ".rs", 0.100),
    Row(11L, "CHANGELOG", "list of changes", null, null, 0.110),
    Row(12L, "resources/data.adoc", "asciidoc resource", null, "adoc", 0.120),
    Row(13L, "deep/nested/docs/topic.md", "nested doc topic", "Markdown", "md", 0.130),
    Row(14L, "build.gradle", "plugins { id 'java' }", "Groovy", "gradle", 0.140),
    // NULL language + matching code extension: langMatchCol is
    // (NULL = t) OR true = true; and NULL language + no ext = SQL NULL
    Row(15L, "tools/gen.scala", "object Gen extends App", null, "scala", 0.150),
    Row(16L, "misc/RUNBOOK", "operational runbook text", null, null, 0.160))

  private val classifications: Seq[QueryClassification] = {
    val intents = Seq("how_it_works", "implementation", "debugging",
      "explanation", "general")
    val base = for {
      wantsCode <- Seq(true, false)
      conf <- Seq(0.6, 0.75, 0.85)
      intent <- intents
      lang <- Seq(None, Some("Scala"), Some("rust"))
    } yield QueryClassification(lang, intent, wantsCode, conf, None, None, None)
    val filtered = Seq(
      QueryClassification(None, "implementation", true, 0.75,
        Some(Seq("src")), None, None),
      QueryClassification(None, "explanation", true, 0.75,
        Some(Seq("docs")), None, None),
      QueryClassification(Some("Python"), "how_it_works", true, 0.75,
        None, Some(Seq("py", ".md")), None),
      QueryClassification(None, "general", false, 0.6,
        None, Some(Seq("txt")), None),
      QueryClassification(None, "debugging", true, 0.72,
        None, None, Some(Seq("vendor", "test"))),
      QueryClassification(None, "how_it_works", true, 0.75,
        Some(Seq("src", "docs")), Some(Seq("scala", "md", "rst")),
        Some(Seq("README"))),
      QueryClassification(Some("JavaScript"), "explanation", true, 0.71,
        None, None, Some(Seq("nested"))))
    base ++ filtered
  }

  private def df = spark.createDataFrame(
    java.util.Arrays.asList(fixture: _*), schema)

  private def proj(r: Row): (String, String, Option[String], Option[String], Double) =
    (r.getString(1), r.getString(2), Option(r.getString(3)),
      Option(r.getString(4)), r.getDouble(5))

  test("applyFiltersLocal matches the DataFrame operator over the full grid") {
    val local = Retrieval.localHits(fixture, schema)
    for (c <- classifications; k <- Seq(2, 3, 6, 20)) {
      val dfOut = Retrieval.applyFilters(df, c, k)
        .select("file", "code", "language", "extension", "distance")
        .collect().map(r => (r.getString(0), r.getString(1),
          Option(r.getString(2)), Option(r.getString(3)), r.getDouble(4))).toSeq
      val localOut = Retrieval.applyFiltersLocal(local, c, k)
        .map(h => (h.file, h.code, h.language, h.extension, h.distance))
      assert(localOut == dfOut, s"divergence for c=$c k=$k")
    }
  }

  test("crossRerankLocal matches the DataFrame operator") {
    val rr = new TfidfReranker()
    for (query <- Seq("how does the engine work", "scala main run",
      "api reference", "zzz nothing matches")) {
      val dfOut = Retrieval.crossRerank(df, query, rr)
        .select("file", "code", "language", "extension", "distance")
        .collect().map(r => (r.getString(0), r.getString(1),
          Option(r.getString(2)), Option(r.getString(3)), r.getDouble(4))).toSeq
      val localOut = Retrieval
        .crossRerankLocal(Retrieval.localHits(fixture, schema), query, rr)
        .map(h => (h.file, h.code, h.language, h.extension, h.distance))
      assert(localOut == dfOut, s"divergence for query='$query'")
    }
  }

  test("crossRerankLocal enforces the window guard") {
    val big = (0 until Retrieval.MaxRerankWindow + 1).map(i =>
      Row(i.toLong, s"f$i.scala", s"code $i", "Scala", "scala", i / 1000.0))
    val hits = Retrieval.localHits(big, schema)
    assertThrows[IllegalArgumentException] {
      Retrieval.crossRerankLocal(hits, "q", new TfidfReranker())
    }
  }
}
