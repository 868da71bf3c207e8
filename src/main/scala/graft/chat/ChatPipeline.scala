package graft.chat

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.chat.Schemas._

/** End-to-end orchestration (reference: src/main.rs command flows +
  * hyde.rs retrieve, SURVEY.md §3).
  *
  * index:  chunk_repo -> embed -> chunks parquet + RP-forest index +
  *         profile.json          (main.rs:274-382)
  * query:  classify -> hyde doc -> embed -> kNN(k*2) -> filters ->
  *         rerank|distance sort -> truncate k -> synthesize
  *         (hyde.rs:468-576: over-fetch k*2 at :500, truncate at :519)
  */
object ChatPipeline {

  case class QueryOutput(results: Seq[RetrievalResult], answer: Seq[String])

  def index(spark: SparkSession, repoDir: String, outDir: String,
            embedder: Embedder = new HashingEmbedder()): Long = {
    val chunks = Chunker.chunkRepo(spark, repoDir)
    val rows = Embed.embedChunks(spark, chunks, embedder).toDF()
    AnnIndex.save(rows, outDir)
    val chunksDf = AnnIndex.load(spark, outDir)
    val n = chunksDf.count()
    val forest = AnnIndex.sampleForest(embedder.dim, n)
    AnnIndex.savePlanes(spark, forest, outDir)
    AnnIndex.saveForestIndex(AnnIndex.buildForestIndex(chunksDf, forest), outDir)
    // profile job over the same scan
    val files = filesFrame(spark, repoDir)
    val profile = Profile.profile(files, repoDir.split('/').last)
    writeProfileJson(profile, s"$outDir/profile.json")
    n
  }

  /** files DataFrame for the profile job: (path, filename, extension,
    * line_count, content). Applies the same gitignore + .git pre-pass
    * as Chunker.chunkRepo, so profile line counts and build-file
    * detection never include ignored artifacts (target/, logs, .git
    * internals) — matching the reference's gitignore-aware repo walk
    * (repo.rs WalkBuilder standard filters). */
  def filesFrame(spark: SparkSession, repoDir: String): DataFrame = {
    val rootPath = java.nio.file.Paths.get(repoDir).toAbsolutePath
    val keep = Chunker.gitignorePredicate(rootPath)
    val rootStr = rootPath.toString
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(rootStr)
      .filter { row =>
        val rel = row.getAs[String]("path").stripPrefix("file:")
          .stripPrefix(rootStr).stripPrefix("/")
        keep(rel)
      }
      .select(
        col("path"),
        element_at(split(col("path"), "/"), -1).as("filename"),
        col("content").cast("string").as("content"))
      .withColumn("extension",
        when(col("filename").contains("."),
          element_at(split(col("filename"), "\\."), -1)).otherwise(lit(null)))
      .withColumn("line_count", size(split(col("content"), "\n")).cast("long"))
  }

  def writeProfileJson(p: RepoProfile, path: String): Unit = {
    // escape ALL control chars, not just \n: a CRLF or tabbed README
    // leaves raw \r/\t in readme_summary, which a strict JSON parser
    // (readProfile's Jackson) rejects — same escaping class as
    // Verify's oracle_sql.json writer
    def js(s: String) = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def arr(xs: Seq[String]) = xs.map(js).mkString("[", ",", "]")
    val json =
      s"""{"name":${js(p.name)},"primary_languages":${arr(p.primary_languages)},
         |"build_files":${arr(p.build_files)},"frameworks":${arr(p.frameworks)},
         |"readme_summary":${p.readme_summary.map(js).getOrElse("null")}}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** The retrieve flow (hyde.rs:468-576) with pluggable ChatClient. */
  def query(spark: SparkSession, indexDir: String, question: String, k: Int = 3,
            rerank: Boolean = false,
            client: ChatClient = new MockChatClient(),
            embedder: Embedder = new HashingEmbedder(),
            approx: Boolean = false): QueryOutput = {
    val chunks = AnnIndex.load(spark, indexDir)
    val profile = readProfile(indexDir)
    val classification = client.classify(question)                 // Step 1 (L1)
    val hypoDoc = client.hyde(question, classification, profile)   // Step 2 (L2)
    val qVec = embedder.embed(hypoDoc)                             // embed hypo ONLY (hyde.rs:500)
    val hits =
      if (approx) {
        // the persisted planes are authoritative — never re-sample from
        // the live count, which drifts after incremental appends
        val forest = AnnIndex.loadPlanes(spark, indexDir)
        val idx = spark.read.parquet(s"$indexDir/forest")
        AnnIndex.knnApprox(spark, chunks, idx, forest, qVec, k * 2)
      } else AnnIndex.knnExact(chunks, qVec, k * 2)                // Step 3, over-fetch F1
    val filtered = Retrieval.applyFilters(hits, classification, k) // Step 4 + truncate
    val ordered =
      if (rerank) Retrieval.crossRerank(filtered, question,        // Step 5 (R2)
        Rerankers.fromEnv())
      else filtered.orderBy(col("distance").asc)                   // F10
    val rows = ordered.select("file", "code", "language", "extension", "distance")
      .collect().zipWithIndex.map { case (r, i) =>
        RetrievalResult(r.getString(0), r.getString(1),
          Option(r.getString(2)), Option(r.getString(3)), r.getDouble(4), i)
      }.toSeq
    val snippets = rows.map(r => (r.file, r.code, r.distance))
    QueryOutput(rows, client.synthesize(question, classification, profile, snippets).toSeq)
  }

  /** Full round-trip of writeProfileJson: the prompt surface consumes
    * primary_languages/frameworks/build_files (persona capabilities,
    * HyDE language fallback), so parsing only the name would silently
    * degrade every profile-aware template. */
  def readProfile(indexDir: String): Option[RepoProfile] = {
    val p = java.nio.file.Paths.get(s"$indexDir/profile.json")
    if (!java.nio.file.Files.exists(p)) None
    else {
      val n = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(p))
      def arr(f: String): Seq[String] = {
        import scala.jdk.CollectionConverters._
        val v = n.path(f)
        if (v.isArray) v.elements().asScala.map(_.asText).toSeq else Seq.empty
      }
      Some(RepoProfile(
        name = n.path("name").asText("repo"),
        primary_languages = arr("primary_languages"),
        build_files = arr("build_files"),
        frameworks = arr("frameworks"),
        readme_summary =
          if (n.path("readme_summary").isTextual) Some(n.path("readme_summary").asText)
          else None))
    }
  }
}

/** Thin CLI mirroring main.rs:42-92 commands (index / query /
  * interactive REPL holding one session — SURVEY.md §3.3). */
object ChatCli {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-chat")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "index" :: repo :: out :: Nil =>
        // GRAFT_ONNX_MODEL selects a real model file for embeddings
        val n = ChatPipeline.index(spark, repo, out,
          embedder = Embedders.fromEnv())
        println(s"indexed $n chunks from $repo -> $out")
      case "query" :: indexDir :: question :: rest =>
        if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(indexDir, "chunks"))) {
          System.err.println(s"error: no index at $indexDir (run: index <repo> $indexDir)")
          spark.stop(); sys.exit(2)
        }
        val k = rest.headOption.map(_.toInt).getOrElse(3)
        // GRAFT_OPENAI_BASE_URL switches the LLM touchpoints to a real
        // endpoint; unset, the deterministic mock answers
        val out = ChatPipeline.query(spark, indexDir, question, k,
          client = OpenAiChatClient.fromEnv(),
          embedder = Embedders.fromEnv())
        out.results.foreach(r =>
          println(f"Chunk ${r.rank} | ${r.file} | Relevance ${r.distance}%.4f"))
        out.answer.foreach(print)
      case "interactive" :: Nil =>
        println("commands: index <repo> <out> | load <dir> | query <q> | exit")
        var indexDir: Option[String] = None
        var line = ""
        while ({ line = Option(scala.io.StdIn.readLine("> ")).getOrElse("exit"); line != "exit" }) {
          line.split("\\s+").toList match {
            case "index" :: repo :: out :: Nil =>
              // same env-selected embedder as the top-level commands —
              // REPL-built indexes and queries must share vector space
              ChatPipeline.index(spark, repo, out, embedder = Embedders.fromEnv())
              indexDir = Some(out)
            case "load" :: dir :: Nil => indexDir = Some(dir)
            case "query" :: qs if indexDir.isDefined =>
              val out = ChatPipeline.query(spark, indexDir.get, qs.mkString(" "),
                client = OpenAiChatClient.fromEnv(),
                embedder = Embedders.fromEnv())
              out.answer.foreach(print); println()
            case _ => println("unrecognized (or no index loaded)")
          }
        }
      case _ =>
        System.err.println("usage: index <repo> <out> | query <indexDir> <question> [k] | interactive")
    }
    spark.stop()
  }
}
