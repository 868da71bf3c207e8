package graft.chat

import java.io.{BufferedReader, InputStreamReader}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import graft.chat.Schemas.{QueryClassification, RepoProfile}

/** L4: SSE (text/event-stream) decoder — the streaming half of the
  * reference's OpenAI client (/root/reference/src/openai.rs SSE loop,
  * hyde.rs:766-810 stream_answer). Pure function over a line iterator
  * so it is testable without a socket.
  */
object Sse {

  /** Decode SSE lines into `data` payloads: consecutive `data:` lines
    * of one event concatenate with '\n', events end at a blank line,
    * `:` comment lines and non-data fields are ignored, and iteration
    * stops at the OpenAI `[DONE]` sentinel. Lazy: pulls source lines
    * only as events are consumed (streaming tokens arrive as they are
    * sent). */
  def dataEvents(lines: Iterator[String]): Iterator[String] = new Iterator[String] {
    private var pending: String = _
    private var finished = false

    private def emit(data: String): Unit =
      if (data == "[DONE]") finished = true else pending = data

    private def fetch(): Unit = {
      if (pending != null || finished) return
      val buf = new StringBuilder
      var has = false
      while (pending == null && !finished && lines.hasNext) {
        val line = lines.next()
        if (line.isEmpty) {
          if (has) emit(buf.toString)
          buf.clear(); has = false
        } else if (line.startsWith(":")) ()    // comment / keep-alive
        else if (line.startsWith("data:")) {
          val v = line.substring(5).stripPrefix(" ")
          if (has) buf.append('\n')
          buf.append(v); has = true
        } else ()                              // event:/id:/retry: ignored
      }
      // source ended without a trailing blank line: flush the event
      if (pending == null && !finished) {
        if (has) emit(buf.toString)
        if (pending == null) finished = true
      }
    }

    override def hasNext: Boolean = { fetch(); pending != null }
    override def next(): String = {
      fetch()
      if (pending == null) throw new NoSuchElementException("SSE stream exhausted")
      val r = pending; pending = null; r
    }
  }
}

/** L5: OpenAI-compatible chat client over java.net.http (no extra
  * dependency), mirroring /root/reference/src/openai.rs:1-101 — same
  * three touchpoints (classify / hyde / streamed synthesis), same
  * chat-completions wire format, driver-side only (network never runs
  * inside executors). Construct via [[OpenAiChatClient.fromEnv]]; with
  * no endpoint configured the deterministic [[MockChatClient]] is used,
  * so the offline pipeline never carries dead network code paths.
  */
class OpenAiChatClient(baseUrl: String, apiKey: Option[String], model: String,
                       chunkSize: Int = 1000) extends ChatClient {

  @transient private lazy val http = HttpClient.newHttpClient()
  @transient private lazy val mapper = new ObjectMapper()

  private def jstr(s: String): String = mapper.writeValueAsString(s)

  private def chatBody(system: String, user: String, stream: Boolean): String =
    s"""{"model":${jstr(model)},"stream":$stream,"messages":[""" +
      s"""{"role":"system","content":${jstr(system)}},""" +
      s"""{"role":"user","content":${jstr(user)}}]}"""

  private def post(body: String): HttpResponse[java.io.InputStream] = {
    val b = HttpRequest.newBuilder()
      .uri(URI.create(s"${baseUrl.stripSuffix("/")}/chat/completions"))
      .header("Content-Type", "application/json")
    apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
    http.send(b.POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofInputStream())
  }

  private def completeOnce(system: String, user: String): String = {
    val resp = post(chatBody(system, user, stream = false))
    if (resp.statusCode() / 100 != 2) {
      val body = new String(resp.body().readAllBytes(), StandardCharsets.UTF_8)
      throw new RuntimeException(
        s"chat completion failed: HTTP ${resp.statusCode()}: ${body.take(500)}")
    }
    mapper.readTree(resp.body())
      .path("choices").path(0).path("message").path("content").asText("")
  }

  /** L1: ask for the classification as JSON, parse leniently (the
    * reference strips markdown fences before parsing — hyde.rs
    * classify JSON cleanup). */
  override def classify(query: String): QueryClassification =
    OpenAiChatClient.parseClassification(completeOnce(
      "Classify the repository question. Reply ONLY with JSON: " +
        """{"language":string|null,"intent":"how_it_works"|"implementation"|"debugging"|"explanation"|"other",""" +
        """"wants_code":bool,"confidence":number,"target_folders":[string]|null,""" +
        """"target_extensions":[string]|null,"exclude_patterns":[string]|null}""",
      query))

  /** L2: hypothetical document, truncated to the chunk budget
    * (hyde.rs:317-347). */
  override def hyde(query: String, c: QueryClassification): String =
    completeOnce(
      s"Write a hypothetical ${c.language.getOrElse("code")} document that would " +
        s"answer the question (intent: ${c.intent}). No preamble.",
      query).take(chunkSize)

  /** L3+L4: streamed synthesis — each SSE event's delta content is one
    * emitted token, ending at [DONE] (openai.rs stream loop). */
  override def synthesize(query: String, c: QueryClassification,
                          profile: Option[RepoProfile],
                          snippets: Seq[(String, String, Double)]): Iterator[String] = {
    val ctx = snippets.zipWithIndex
      .map { case ((file, code, dist), i) => f"[$i] $file (distance $dist%.4f)\n$code" }
      .mkString("\n\n")
    val header = profile.map(p => s"Repository: ${p.name}. ").getOrElse("")
    val resp = post(chatBody(
      s"${header}Answer from the provided snippets only.",
      s"$query\n\nSnippets:\n$ctx", stream = true))
    if (resp.statusCode() / 100 != 2) {
      val body = new String(resp.body().readAllBytes(), StandardCharsets.UTF_8)
      throw new RuntimeException(
        s"chat stream failed: HTTP ${resp.statusCode()}: ${body.take(500)}")
    }
    val lines = new BufferedReader(
      new InputStreamReader(resp.body(), StandardCharsets.UTF_8))
      .lines().iterator().asScala
    Sse.dataEvents(lines).flatMap { payload =>
      val delta = mapper.readTree(payload)
        .path("choices").path(0).path("delta").path("content")
      if (delta.isTextual) Some(delta.asText) else None
    }
  }
}

object OpenAiChatClient {

  /** Env-gated factory: GRAFT_OPENAI_BASE_URL (e.g.
    * https://api.openai.com/v1) enables the HTTP client, with
    * GRAFT_OPENAI_API_KEY / GRAFT_OPENAI_MODEL optional; unset, the
    * deterministic mock drives the pipeline. */
  def fromEnv(env: Map[String, String] = sys.env): ChatClient =
    env.get("GRAFT_OPENAI_BASE_URL") match {
      case Some(base) => new OpenAiChatClient(base,
        env.get("GRAFT_OPENAI_API_KEY"),
        env.getOrElse("GRAFT_OPENAI_MODEL", "gpt-4o-mini"))
      case None => new MockChatClient()
    }

  private[graft] def parseClassification(content: String): QueryClassification = {
    val mapper = new ObjectMapper()
    val clean = content.trim
      .replaceAll("^```(?:json)?\\s*", "").replaceAll("\\s*```$", "").trim
    val n = mapper.readTree(clean)
    def optStr(f: String): Option[String] = {
      val v = n.path(f)
      if (v.isTextual) Some(v.asText) else None
    }
    def optSeq(f: String): Option[Seq[String]] = {
      val v = n.path(f)
      if (v.isArray) Some(v.elements().asScala.map(_.asText).toSeq).filter(_.nonEmpty)
      else None
    }
    QueryClassification(
      language = optStr("language"),
      intent = optStr("intent").getOrElse("other"),
      wants_code = !n.path("wants_code").isBoolean || n.path("wants_code").asBoolean,
      confidence = if (n.path("confidence").isNumber) n.path("confidence").asDouble else 0.5,
      target_folders = optSeq("target_folders"),
      target_extensions = optSeq("target_extensions"),
      exclude_patterns = optSeq("exclude_patterns"))
  }
}
