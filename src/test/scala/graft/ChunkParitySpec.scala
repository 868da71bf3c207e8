package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ChunkParity

/** q201 chunk-boundary parity corpus (reference chunker.rs:89-116 via
  * the code-splitter crate's parse -> descend-into-oversized ->
  * greedy-merge). Three layers:
  *
  *  1. reference-derived INVARIANTS every fixture must satisfy
  *     (byte-exact round-trip, 1000-char budget, a fitting declaration
  *     is never split across chunks — the crate's merge rule);
  *  2. the PINNED table: chunk grouping + md5 per chunk, cross-checked
  *     against the identical DuckDB VALUES oracle by the driver
  *     (q201). On mismatch this spec prints the regenerated pin so a
  *     DELIBERATE splitter change is a one-paste update;
  *  3. descent cases: the oversized Java/C++/C# wrappers must break at
  *     MEMBER boundaries, never mid-statement (the round-12 gap: the
  *     old line-greedy fallback split wherever 1000 chars ran out).
  */
class ChunkParitySpec extends AnyFunSuite {

  private def chunksOf(file: String, text: String): Seq[String] =
    graft.chat.Chunker.fileChunkRows(file, text).map(_._3)

  test("q201 fixtures: round-trip, budget, and multi-chunk packing for all 12 languages") {
    assert(ChunkParity.fixtures.size == 12)
    ChunkParity.fixtures.foreach { case (file, text) =>
      val chunks = chunksOf(file, text)
      assert(chunks.mkString("") == text, s"$file must round-trip byte-exactly")
      assert(chunks.forall(_.length <= graft.chat.Chunker.MaxChunkSize),
        s"$file chunk over budget")
      assert(chunks.size >= 2, s"$file must exercise packing (got ${chunks.size})")
    }
  }

  // One fitting declaration per language, given as (opening line,
  // distinctive body line): both must land in the SAME chunk — the
  // reference's AST packing never splits a node that fits the budget.
  private val neverSplit = Seq(
    "fixture.rs" -> ("pub fn distance(a: Point, b: Point) -> f64 {",
      "    (dx * dx + dy * dy).sqrt()"),
    "fixture.js" -> ("function emit(name, payload) {", "        fn(payload);"),
    "fixture.ts" -> ("export function memoize<V>(cache: TtlCache<V>, key: string,",
      "    cache.put(key, value, now);"),
    "fixture.java" -> ("    public double getVariance() {",
      "        return m2 / (count - 1);"),
    "fixture.cpp" -> ("double mean(const RingBuffer& rb) {",
      "    return static_cast<double>(sum(rb)) / rb.size();"),
    "fixture.c" -> ("uint32_t adler32(const uint8_t *buf, size_t len) {",
      "    return (b << 16) | a;"),
    "fixture.rb" -> ("def merge(a, b)", "  out = Inventory.new"),
    "fixture.cs" -> ("        public string Dequeue()",
      "            throw new InvalidOperationException(\"empty queue\");"),
    "fixture.swift" -> ("func summarize(_ readings: [Reading]) -> Summary {",
      "    return Summary(min: lo, max: hi, mean: average(readings))"),
    "fixture.go" -> ("func TopWords(text string, k int) []string {",
      "	return words[:k]"),
    "fixture.py" -> ("class Retrier:",
      "                time.sleep(backoff(attempt) / 1000.0)"),
    "fixture.md" -> ("## Install", "make install"))

  test("q201 fixtures: a fitting declaration is never split across chunks") {
    val byFile = ChunkParity.fixtures.toMap
    neverSplit.foreach { case (file, (open, body)) =>
      val text = byFile(file)
      assert(text.contains(open) && text.contains(body),
        s"$file anchor lines must exist in the fixture")
      val chunks = chunksOf(file, text)
      val withOpen = chunks.filter(_.contains(open))
      assert(withOpen.size == 1, s"$file: opening line in ${withOpen.size} chunks")
      assert(withOpen.head.contains(body),
        s"$file: declaration split across chunks — body line left the chunk " +
          s"holding the opening line")
    }
  }

  test("q201 descent: oversized class/namespace wrappers break at member boundaries") {
    // Java: the class is bigger than the budget; the second class chunk
    // must START at a method declaration, not a body statement
    val java = chunksOf("fixture.java", ChunkParity.fixtures.toMap.apply("fixture.java"))
    val javaTail = java.drop(2)
    javaTail.foreach { c =>
      val first = c.linesIterator.find(_.trim.nonEmpty).get.trim
      assert(first.matches("(public|private|protected).*\\{") || first == "}",
        s"Java descent chunk starts mid-member: '$first'")
    }
    // C#: Allman braces — the member chunk must start at a declaration
    val cs = chunksOf("fixture.cs", ChunkParity.fixtures.toMap.apply("fixture.cs"))
    val csMembers = cs(2)
    val csFirst = csMembers.linesIterator.find(_.trim.nonEmpty).get.trim
    assert(csFirst.startsWith("private readonly"),
      s"C# member chunk must start at the first member: '$csFirst'")
    assert(!csFirst.startsWith("return"), "C# must not line-split mid-method")
  }

  test("q201 alias extensions resolve through the P1 dimension (jsx/mjs/tsx/hpp/h/pyi/markdown, case-insensitive)") {
    val want = Map(
      "alias.mjs" -> "JavaScript", "alias.tsx" -> "TypeScript",
      "alias.hpp" -> "C++", "alias.h" -> "C", "alias.pyi" -> "Python",
      "alias.markdown" -> "Markdown", "alias.GO" -> "Go")
    assert(ChunkParity.aliasFixtures.map(_._1).toSet == want.keySet)
    ChunkParity.aliasFixtures.foreach { case (file, text) =>
      val rows = graft.chat.Chunker.fileChunkRows(file, text)
      assert(rows.nonEmpty, s"$file must chunk")
      assert(rows.forall(_._4.contains(want(file))),
        s"$file must resolve to ${want(file)}, got ${rows.head._4}")
      assert(rows.map(_._3).mkString("") == text, s"$file must round-trip")
    }
  }

  test("q201 pinned table matches the splitter output (prints regenerated pin on drift)") {
    def md5(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val got = (ChunkParity.fixtures ++ ChunkParity.aliasFixtures).flatMap {
      case (file, text) =>
        val ref = graft.chat.Chunker.fileChunkRows(file, text, refContent = true)
          .map { case (_, idx, chunk, _, _) => idx -> chunk }.toMap
        graft.chat.Chunker.fileChunkRows(file, text).map {
          case (_, idx, chunk, lang, _) =>
            val first = chunk.linesIterator.find(_.trim.nonEmpty)
              .map(_.trim).getOrElse("")
            val rc = ref(idx)
            (file, lang.getOrElse(""), idx.toLong, chunk.length.toLong, first,
              md5(chunk), rc.length.toLong, md5(rc))
        }
    }
    if (got != ChunkParity.expected) {
      println("=== ChunkParity.expected regeneration (paste into ChunkParity.scala):")
      got.foreach { case (fl, l, i, n, f, h, rl, rh) =>
        println(s"""    ("$fl", "$l", ${i}L, ${n}L, "${f.replace("\"", "\\\"")}", "$h", ${rl}L, "$rh"),""")
      }
    }
    assert(got == ChunkParity.expected,
      "splitter output drifted from the pinned parity table (see regeneration above)")
  }

  // round-14 refWhitespace projection (the reference's node-aligned byte
  // ranges): grouping identical to default mode, content = the line span
  // stripped of the whitespace that falls between chunks
  test("refWhitespace mode: node-trimmed content, identical grouping, whitespace-only chunks dropped") {
    (ChunkParity.fixtures ++ ChunkParity.aliasFixtures).foreach { case (file, text) =>
      val def_ = graft.chat.Chunker.fileChunkRows(file, text)
      val ref = graft.chat.Chunker.fileChunkRows(file, text, refContent = true)
      // no fixture chunk is all-whitespace -> 1:1 by position
      assert(ref.size == def_.size, s"$file: mode pair drifted in count")
      def_.zip(ref).foreach { case ((_, i, c, l, e), (_, ri, rc, rl, re)) =>
        assert(i == ri && l == rl && e == re)
        assert(rc == c.trim, s"$file chunk $i: ref content must be the trimmed span")
        assert(rc.nonEmpty && rc == rc.trim, s"$file chunk $i: no edge whitespace")
      }
    }
    // an all-whitespace chunk (oversized blank run between declarations)
    // corresponds to no AST node: ref mode drops it and renumbers
    val blanky = "def a():\n    return 1\n" + ("\n" * 1200) + "def b():\n    return 2\n"
    val d = graft.chat.Chunker.fileChunkRows("w.py", blanky)
    val r = graft.chat.Chunker.fileChunkRows("w.py", blanky, refContent = true)
    assert(d.exists(_._3.trim.isEmpty), "planted corpus must produce a blank chunk")
    assert(r.forall(_._3.trim.nonEmpty))
    assert(r.map(_._2) == r.indices.toSeq, "ref indices renumber densely")
    assert(r.map(_._3) == d.map(_._3.trim).filter(_.nonEmpty))
  }
}
