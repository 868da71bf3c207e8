package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.chat.{OpenAiChatClient, Sse}
import org.scalatest.funsuite.AnyFunSuite

/** L4/L5 specs: the SSE decoder as a pure function, and the
  * OpenAI-compatible HTTP client end-to-end against a local
  * com.sun.net.httpserver stub (offline: loopback only). */
class OpenAiSpec extends AnyFunSuite {

  // ---------------------------------------------------------------
  // Sse.dataEvents
  // ---------------------------------------------------------------

  test("SSE decoder: events split on blank lines, multi-line data joins with \\n") {
    val lines = Iterator(
      ": keep-alive comment",
      "event: message",
      "data: first",
      "",
      "data: part one",
      "data: part two",
      "",
      "data: [DONE]",
      "",
      "data: after done is never read")
    assert(Sse.dataEvents(lines).toSeq == Seq("first", "part one\npart two"))
  }

  test("SSE decoder: flushes a trailing event with no final blank line") {
    assert(Sse.dataEvents(Iterator("data: tail")).toSeq == Seq("tail"))
    assert(Sse.dataEvents(Iterator.empty).toSeq == Seq.empty)
    // the 'data:' prefix without a space is also valid SSE
    assert(Sse.dataEvents(Iterator("data:x", "")).toSeq == Seq("x"))
  }

  test("SSE decoder is lazy: tokens are available before the stream ends") {
    var pulled = 0
    val src = Iterator("data: a", "", "data: b", "").map { l => pulled += 1; l }
    val it = Sse.dataEvents(src)
    assert(it.next() == "a")
    assert(pulled == 2, "decoder must not read past the first event")
    assert(it.next() == "b")
  }

  // ---------------------------------------------------------------
  // classification JSON parsing (fence-stripping, lenient fields)
  // ---------------------------------------------------------------

  test("classification parsing strips markdown fences and tolerates nulls") {
    val c = OpenAiChatClient.parseClassification(
      """```json
        |{"language": "rust", "intent": "implementation", "wants_code": true,
        | "confidence": 0.9, "target_folders": ["src"], "target_extensions": null,
        | "exclude_patterns": null}
        |```""".stripMargin)
    assert(c.language.contains("rust"))
    assert(c.intent == "implementation")
    assert(c.wants_code && c.confidence == 0.9)
    assert(c.target_folders.contains(Seq("src")))
    assert(c.target_extensions.isEmpty)
  }

  // ---------------------------------------------------------------
  // HTTP client against a local stub server
  // ---------------------------------------------------------------

  private def withServer(handler: (String, HttpExchange) => Unit)(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val req = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      handler(req, ex)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, payload: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  test("client round-trips classify through a real HTTP endpoint") {
    var sawAuth: String = null
    withServer { (req, ex) =>
      sawAuth = ex.getRequestHeaders.getFirst("Authorization")
      assert(req.contains("\"stream\":false"))
      respond(ex,
        """{"choices":[{"message":{"content":
          |"{\"language\":\"scala\",\"intent\":\"debugging\",\"wants_code\":true,\"confidence\":0.8}"}}]}"""
          .stripMargin.replace("\n", ""))
    } { base =>
      val client = new OpenAiChatClient(base, Some("sk-test"), "test-model")
      val c = client.classify("why does the build fail?")
      assert(c.language.contains("scala"))
      assert(c.intent == "debugging")
      assert(sawAuth == "Bearer sk-test")
    }
  }

  test("client streams synthesis tokens through SSE") {
    withServer { (req, ex) =>
      assert(req.contains("\"stream\":true"))
      val sse = Seq("Hello", " from", " the", " stream").map { tok =>
        s"""data: {"choices":[{"delta":{"content":"$tok"}}]}\n\n"""
      }.mkString + "data: [DONE]\n\n"
      respond(ex, sse, "text/event-stream")
    } { base =>
      val client = new OpenAiChatClient(base, None, "test-model")
      val out = client.synthesize("q", new graft.chat.MockChatClient().classify("q"),
        None, Seq(("a.rs", "fn a() {}", 0.1))).mkString("")
      assert(out == "Hello from the stream")
    }
  }

  test("fromEnv gates on the base-url variable") {
    assert(OpenAiChatClient.fromEnv(Map.empty).isInstanceOf[graft.chat.MockChatClient])
    assert(OpenAiChatClient.fromEnv(Map("GRAFT_OPENAI_BASE_URL" -> "http://x/v1"))
      .isInstanceOf[OpenAiChatClient])
  }
}
