package graft.chat

/** Core data model of the code-chat engine (reference: cargo-chat).
  *
  * Mirrors /root/reference/src/chunker.rs:9-19 (CodeChunk),
  * ann.rs:271-277 (ChunkMeta), hyde.rs:60-69 (QueryClassification),
  * repo.rs:10-22 (RepoProfile), hyde.rs:81-86 (HydeResult).
  */
object Schemas {

  /** One source-file chunk (chunker.rs:9-19). */
  case class CodeChunk(
      file_path: String,
      content: String,
      language: Option[String],
      extension: Option[String])

  /** Chunk + embedding row, the unit of the ANN index (ann.rs:7-11:
    * parallel vector/metadata arrays become one table here). */
  case class ChunkRow(
      chunk_id: Long,
      file: String,
      code: String,
      language: Option[String],
      extension: Option[String],
      vector: Array[Float])

  /** LLM query classification (hyde.rs:60-69). */
  case class QueryClassification(
      language: Option[String],
      intent: String,
      wants_code: Boolean,
      confidence: Double,
      target_folders: Option[Seq[String]],
      target_extensions: Option[Seq[String]],
      exclude_patterns: Option[Seq[String]])

  /** Aggregated repository profile (repo.rs:10-22). */
  case class RepoProfile(
      name: String,
      primary_languages: Seq[String],
      build_files: Seq[String],
      frameworks: Seq[String],
      readme_summary: Option[String])

  /** Retrieval result row (hyde.rs:81-86; `rank` is the reference's
    * `index` field — the enumeration position, NOT a stable chunk id,
    * a quirk preserved deliberately, hyde.rs:1228). */
  case class RetrievalResult(
      file: String,
      code: String,
      language: Option[String],
      extension: Option[String],
      distance: Double,
      rank: Int)
}
