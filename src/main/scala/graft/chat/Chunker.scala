package graft.chat

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.chat.Schemas.CodeChunk

/** Repository scan + chunking (reference: src/chunker.rs).
  *
  * Spark-first shape: `binaryFile` recursive scan -> supported-extension
  * filter (P1) -> flatMap chunk split (P3, the UDTF shape) -> projection
  * (P4) -> observable stats (P5). The reference uses tree-sitter
  * AST-aligned chunks (chunker.rs:89-116); tree-sitter isn't on the JVM
  * classpath, so chunking parity here is BEHAVIORAL: deterministic
  * line-greedy packing with max_size=1000 chars (chunker.rs:70),
  * hard-splitting oversized lines, per-file chunk order preserved.
  *
  * Gitignore semantics (chunker.rs:22 WalkBuilder standard_filters):
  * Spark has no gitignore-aware source, so a driver-side pre-pass parses
  * root .gitignore patterns into a path filter column (simple glob
  * subset: dir names, *.ext, exact paths) — enough for standard layouts.
  */
object Chunker {

  val MaxChunkSize = 1000 // chars, chunker.rs:70

  /** Greedy line-packing chunk split: each chunk <= maxSize chars,
    * lines never split unless a single line exceeds maxSize. */
  def splitContent(content: String, maxSize: Int = MaxChunkSize): Seq[String] = {
    if (content.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur.clear() }
    val parts = content.split("\n", -1)
    parts.zipWithIndex.foreach { case (p, i) =>
      // re-attach the newline we split on; the FINAL part never had one
      // (for n newlines, split -1 yields n+1 parts)
      val line = if (i < parts.length - 1) p + "\n" else p
      if (line.isEmpty) ()
      else if (line.length > maxSize) {
        flush()
        line.grouped(maxSize).foreach(out += _)
      } else {
        if (cur.length + line.length > maxSize) flush()
        cur ++= line
      }
    }
    flush()
    out.toSeq
  }

  /** Structure-aware chunk split — narrows the tree-sitter gap
    * (reference chunker.rs:89-116 splits on AST node ranges, then
    * packs to max_size): content first divides into top-level UNITS —
    * brace-balance tracking for brace languages (a unit ends on the
    * line where the brace depth returns to 0, i.e. a top-level fn /
    * impl / class closes), column-0 starts for indent languages
    * (Python) — then whole units pack greedily into chunks <= maxSize,
    * so chunk boundaries fall between top-level declarations whenever
    * they can. An oversized single unit falls back to the line-greedy
    * splitter. Units are contiguous line spans, so concatenation
    * round-trips exactly, like splitContent. */
  def splitStructured(content: String, language: Option[String],
                      maxSize: Int = MaxChunkSize): Seq[String] = {
    if (content.isEmpty) return Seq.empty
    val indentBased = language.contains("Python")
    val headingBased = language.contains("Markdown")
    val parts = content.split("\n", -1)
    val lines = parts.zipWithIndex.map { case (p, i) =>
      if (i < parts.length - 1) p + "\n" else p
    }.filter(_.nonEmpty)
    // 1. top-level units
    val units = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flushUnit(): Unit = if (cur.nonEmpty) { units += cur.toString; cur.clear() }
    var depth = 0
    var inFence = false
    // decorators and comment runs bind FORWARD onto the def/class they
    // annotate (chunker.rs's AST nodes carry leading trivia the same
    // way), so "@decorator\ndef f():" never splits across units.
    // Tracked incrementally (true while the open unit holds only
    // blank/decorator/comment lines) — rescanning the unit per line
    // would be quadratic over long comment runs.
    var onlyTrivia = true
    lines.foreach { line =>
      if (indentBased) {
        // a non-blank column-0 line starts a new top-level unit: a
        // def/class plus its indented block stays one unit
        val t = line.trim
        if (t.nonEmpty && !line.head.isWhitespace && !(cur.nonEmpty && onlyTrivia)) {
          flushUnit(); onlyTrivia = true
        }
        if (!(t.isEmpty || t.startsWith("@") || t.startsWith("#"))) onlyTrivia = false
        cur ++= line
      } else if (headingBased) {
        // units are heading sections; fenced code is opaque (a '#'
        // inside ``` is a comment, not a heading)
        val t = line.trim
        if (t.startsWith("```") || t.startsWith("~~~")) {
          cur ++= line; inFence = !inFence
        } else {
          if (!inFence && t.startsWith("#")) flushUnit()
          cur ++= line
        }
      } else {
        cur ++= line
        depth = math.max(0, depth + line.count(_ == '{') - line.count(_ == '}'))
        if (depth == 0) flushUnit() // top-level statement or block closed
      }
    }
    flushUnit()
    // 2. greedy packing of whole units; oversized units line-split
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val chunk = new StringBuilder
    def flushChunk(): Unit = if (chunk.nonEmpty) { out += chunk.toString; chunk.clear() }
    units.foreach { u =>
      if (u.length > maxSize) {
        flushChunk()
        out ++= splitContent(u, maxSize)
      } else {
        if (chunk.length + u.length > maxSize) flushChunk()
        chunk ++= u
      }
    }
    flushChunk()
    out.toSeq
  }

  /** Driver-side .gitignore pre-pass: returns predicate over relative
    * paths (true = keep). Supports the common subset: comment lines,
    * `dir/`, `*.ext`, bare names, leading-slash anchors. */
  def gitignorePredicate(root: Path): String => Boolean = {
    val gi = root.resolve(".gitignore")
    val patterns: Seq[String] =
      if (Files.exists(gi))
        Files.readAllLines(gi).asScala.toSeq
          .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      else Seq.empty
    val always = Seq(".git/") // standard filter
    val all = patterns ++ always
    (rel: String) => !all.exists { p0 =>
      val p = p0.stripPrefix("/")
      if (p.endsWith("/")) {
        val d = p.stripSuffix("/")
        rel == d || rel.startsWith(d + "/") || rel.contains("/" + d + "/")
      } else if (p.startsWith("*.")) {
        rel.endsWith(p.stripPrefix("*"))
      } else {
        rel == p || rel.endsWith("/" + p)
      }
    }
  }

  /** The ONE "relative path + text → chunk rows" contract every
    * indexing path shares (base build, incremental stream, refresh
    * driver path, refresh distributed path): extension detect →
    * supported filter → language detect → splitStructured, with the
    * intra-file chunk index preserved. `text` is by-name so callers
    * never decode bytes for unsupported extensions. Keeping this in one
    * place is what makes the byte-identical-across-paths guarantees
    * (RefreshHardeningSpec, the stream==batch specs) provable rather
    * than accidental — four drifting copies encoded it before. */
  private[graft] def fileChunkRows(rel: String, text: => String)
      : Seq[(String, Int, String, Option[String], Option[String])] = {
    val ext = rel.split('.').lastOption
      .filter(_ => rel.contains('.')).map(_.toLowerCase)
    ext match {
      case Some(e) if Language.supportedExtensions.contains(e) =>
        val lang = Language.detect(e)
        splitStructured(text, lang).zipWithIndex.map {
          case (c, i) => (rel, i, c, lang, Some(e))
        }
      case _ => Seq.empty
    }
  }

  /** S1+P1-P4: scan a directory into chunk rows. Uses Spark's binaryFile
    * source for the distributed read; the gitignore pre-pass and
    * extension filter prune before content ever moves. */
  def chunkRepo(spark: SparkSession, root: String): Dataset[CodeChunk] = {
    import spark.implicits._
    val rootPath = Paths.get(root).toAbsolutePath
    val keep = gitignorePredicate(rootPath)
    val rootStr = rootPath.toString
    val files = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(rootStr)
      .select(col("path"), col("content"))
    files.flatMap { row =>
      val uri = row.getString(0)
      val path = uri.stripPrefix("file:")
      val rel = path.stripPrefix(rootStr).stripPrefix("/")
      if (!keep(rel)) Seq.empty[CodeChunk]
      else fileChunkRows(rel,
          new String(row.getAs[Array[Byte]](1),
            java.nio.charset.StandardCharsets.UTF_8))
        .map { case (r, _, c, lang, e) => CodeChunk(r, c, lang, e) }
    }
  }

  /** P5: observable per-language stats of a chunk set. */
  def chunkStats(chunks: DataFrame): DataFrame =
    chunks.groupBy(coalesce(col("language"), lit("unknown")).as("language"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("file_path")).as("n_files"))
      .orderBy("language")
}
