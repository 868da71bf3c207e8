package graft.chat

import graft.chat.Schemas.{QueryClassification, RepoProfile}

/** LLM touchpoints behind a pluggable trait (reference ops L1-L5:
  * src/hyde.rs:350-466 classify, 317-347/578-603 HyDE, 605-764
  * synthesize, src/openai.rs client).
  *
  * Every network call in the reference is driver-side; the engine only
  * needs the trait + a deterministic offline implementation (the test /
  * oracle workhorse). An OpenAI-compatible HTTP client can be slotted in
  * behind the same trait when an endpoint is configured; none is in this
  * offline environment, so that impl is intentionally absent rather than
  * stubbed with dead network code.
  */
trait ChatClient extends Serializable {

  /** L1: query classification (structured output, hyde.rs:350-466). */
  def classify(query: String): QueryClassification

  /** L2: HyDE hypothetical document, budget = chunk_size chars
    * (hyde.rs:317-347; the EMBEDDED text is the hypo doc alone, not
    * query+hypo — hyde.rs:500). The profile supplies the reference's
    * primary-language fallback for the intent template
    * (hyde.rs:98-116) when the query names no language. */
  def hyde(query: String, classification: QueryClassification,
           profile: Option[RepoProfile] = None): String

  /** L3: answer synthesis from formatted snippets (hyde.rs:605-764);
    * streamed as an iterator of tokens (L4 analog). */
  def synthesize(query: String, classification: QueryClassification,
                 profile: Option[RepoProfile],
                 snippets: Seq[(String, String, Double)]): Iterator[String]
}

/** Two-model routing (main.rs:456-476): the reference builds SEPARATE
  * clients from `--hyde-model` (cheaper) and `--answer-model`, and
  * hyde.rs routes classify (:395) and HyDE generation (:586) through
  * the hyde client while synthesis (:743) rides the answer client.
  * Same contract here, as a delegating composite over the trait. */
class SplitChatClient(hydeClient: ChatClient,
                      answerClient: ChatClient) extends ChatClient {
  override def classify(query: String): QueryClassification =
    hydeClient.classify(query)
  override def hyde(query: String, classification: QueryClassification,
                    profile: Option[RepoProfile] = None): String =
    hydeClient.hyde(query, classification, profile)
  override def synthesize(query: String, classification: QueryClassification,
                          profile: Option[RepoProfile],
                          snippets: Seq[(String, String, Double)]): Iterator[String] =
    answerClient.synthesize(query, classification, profile, snippets)
}

/** Deterministic rule-based client: same decision surface as the LLM
  * prompts (intents, wants_code, folder/extension extraction) but pure
  * string rules — reproducible for tests and the correctness oracle. */
class MockChatClient(chunkSize: Int = 1000) extends ChatClient {

  private val LangKeywords: Seq[(String, String)] = Seq(
    "rust" -> "rust", "python" -> "python", "javascript" -> "javascript",
    "typescript" -> "typescript", "java " -> "java", "scala" -> "scala",
    "golang" -> "go", " go " -> "go")

  override def classify(query: String): QueryClassification = {
    val q = query.toLowerCase
    val intent =
      if (q.contains("how does") || q.contains("how do") || q.contains("how it works"))
        "how_it_works"
      else if (q.contains("implement") || q.contains("where is")) "implementation"
      else if (q.contains("bug") || q.contains("error") || q.contains("debug") ||
        q.contains("fix")) "debugging"
      else if (q.contains("explain") || q.contains("what is") || q.contains("what does"))
        "explanation"
      else "other"
    val wantsCode = intent != "explanation" || q.contains("code") || q.contains("function")
    val language = LangKeywords.collectFirst { case (k, l) if q.contains(k) => l }
    val folders = Seq("src", "lib", "tests", "docs").filter(f => q.contains(s"$f/") || q.contains(s"in $f"))
    val exts = "\\.(rs|py|js|ts|go|java|md)\\b".r.findAllMatchIn(q).map(_.group(1)).toSeq.distinct
    QueryClassification(
      language = language,
      intent = intent,
      wants_code = wantsCode,
      confidence = if (language.isDefined) 0.9 else 0.75,
      target_folders = if (folders.nonEmpty) Some(folders) else None,
      target_extensions = if (exts.nonEmpty) Some(exts) else None,
      exclude_patterns = None)
  }

  override def hyde(query: String, c: QueryClassification,
                    profile: Option[RepoProfile] = None): String = {
    // a deterministic "hypothetical document": the query restated with
    // intent/language context, truncated to the chunk budget; the
    // profile's primary language backs the query's (hyde.rs:98-116)
    val lang = c.language
      .orElse(profile.flatMap(_.primary_languages.headOption).map(_.toLowerCase))
      .getOrElse("code")
    val body = c.intent match {
      case "how_it_works"   => s"This $lang module works by $query. The main flow calls each step in order."
      case "implementation" => s"fn implementation() { // $query in $lang\n}"
      case "debugging"      => s"The error in $query is caused by an unhandled case in the $lang code path."
      case "explanation"    => s"$query. This concept is documented with examples and usage notes."
      case _                => s"$query"
    }
    body.take(chunkSize)
  }

  override def synthesize(query: String, c: QueryClassification,
                          profile: Option[RepoProfile],
                          snippets: Seq[(String, String, Double)]): Iterator[String] = {
    val header = profile.map(p =>
      s"[${p.name}: ${Profile.humanList(p.primary_languages)}] ").getOrElse("")
    val refs = snippets.zipWithIndex.map { case ((file, _, dist), i) =>
      f"Chunk ${i} | $file | Relevance ${dist}%.4f"
    }
    (Iterator(s"${header}Answer to: $query\n") ++ refs.iterator.map(_ + "\n"))
  }
}
