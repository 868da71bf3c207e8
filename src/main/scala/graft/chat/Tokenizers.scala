package graft.chat

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Real-model tokenizers for the E1/E2 embedding path.
  *
  * The reference's models ship with trained vocabularies
  * (/root/reference/src/embedding.rs:22-35 loads Jina-512 / Qwen3-1024
  * checkpoints whose tokenizers are part of the model artifact);
  * reproducing their embeddings end-to-end means tokenizing EXACTLY as
  * the checkpoint expects — `OnnxTokens`' hash-bucketed word ids are
  * the vocab-less fallback, not a reproduction. Two public tokenizer
  * families cover those model lines:
  *
  *  - [[WordPieceTokenizer]] (BERT/Jina family): `vocab.txt` with one
  *    token per line (line number = id); basic tokenization
  *    (lowercase, punctuation split-off), then greedy
  *    longest-match-first subwords with the `##` continuation prefix,
  *    `[CLS] … [SEP]` wrapping and `[UNK]` fallback.
  *  - [[BpeTokenizer]] (GPT-2/Qwen byte-level BPE family):
  *    `vocab.json` (token -> id) + `merges.txt` (ranked merge list);
  *    input bytes map through the GPT-2 byte-to-unicode table, then
  *    pairs merge by PRIORITY (always the lowest-rank pair present —
  *    a later merge can expose an earlier-rank pair, which one
  *    sequential pass per merge would miss). The merge step itself is
  *    `ops.Bpe.applyMerge`, the same primitive the distributed BPE
  *    TRAINER uses — training applies merges incrementally, so its
  *    inference rule is sequential (`Bpe.encode`); shipped GPT-2-style
  *    lists assume priority application, implemented here.
  *
  * Both emit ids into the model's own vocabulary; `OnnxEmbedder`
  * validates every id against the checkpoint's embedding-table size
  * (the E3 dim-validation analog on the input side).
  */
sealed trait ModelTokenizer extends Serializable {
  /** Token ids for one text, truncated to `maxTokens`, including any
    * special wrapping the model family expects. Never empty. */
  def encode(text: String, maxTokens: Int): Array[Int]

  /** Cross-encoder (query, doc) PAIR in the family's trained pair
    * format — not a concatenation of two standalone encodings (which
    * would plant a second [CLS] mid-sequence). Query gets at most half
    * the window; the doc fills the rest. */
  def encodePair(query: String, doc: String, maxTokens: Int): Array[Int]

  def vocabSize: Int
}

/** BERT-style WordPiece. `vocab`: token -> id (from vocab.txt line
  * numbers). Specials default to the BERT names; missing specials fall
  * back to id 0 so toy vocabularies stay usable. */
final class WordPieceTokenizer(
    vocab: Map[String, Int],
    lowercase: Boolean = true) extends ModelTokenizer {

  private val unkId = vocab.getOrElse("[UNK]", 0)
  private val clsId = vocab.getOrElse("[CLS]", unkId)
  private val sepId = vocab.getOrElse("[SEP]", unkId)
  override val vocabSize: Int = if (vocab.isEmpty) 1 else vocab.values.max + 1

  /** CJK ideograph (BMP ranges of BERT's `_is_chinese_char`): the
    * BasicTokenizer isolates each such character into its own word
    * BEFORE whitespace splitting (`tokenize_chinese_chars`), because
    * the training corpora space-segmented CJK per character.
    * Supplementary-plane CJK (surrogate pairs here) is out of scope
    * for the checkpoint families this feeds. */
  private def isCjk(c: Char): Boolean = {
    val cp = c.toInt
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0xF900 && cp <= 0xFAFF)
  }

  /** Basic tokenization: fold case, split on whitespace, split each
    * punctuation character into its own token (BERT's BasicTokenizer
    * rule — "don't," -> don | ' | t | ,), and isolate every CJK
    * ideograph as its own word. */
  private def basic(text: String): Seq[String] = {
    val t = if (lowercase) text.toLowerCase else text
    t.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      w.foreach { c =>
        if (isCjk(c)) {
          if (cur.nonEmpty) { out += cur.toString; cur.clear() }
          out += c.toString
        } else if (c.isLetterOrDigit) cur.append(c)
        else {
          if (cur.nonEmpty) { out += cur.toString; cur.clear() }
          out += c.toString
        }
      }
      if (cur.nonEmpty) out += cur.toString
      out
    }
  }

  /** Greedy longest-match-first subword split; whole word becomes
    * [UNK] when any position has no matching piece, or when the word
    * exceeds [[WordPieceTokenizer.MaxCharsPerWord]] characters (the
    * published WordpieceTokenizer guard: a pathological unbroken run
    * must not pay O(len²) greedy matching — it is [UNK] outright). */
  private def pieces(word: String): Seq[Int] = {
    if (word.length > WordPieceTokenizer.MaxCharsPerWord) return Seq(unkId)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var hit = -1
      while (end > start && hit < 0) {
        val sub = (if (start > 0) "##" else "") + word.substring(start, end)
        vocab.get(sub) match {
          case Some(id) => hit = id
          case None => end -= 1
        }
      }
      if (hit < 0) return Seq(unkId)
      out += hit
      start = end
    }
    out.toSeq
  }

  override def encode(text: String, maxTokens: Int): Array[Int] = {
    val body = basic(text).flatMap(pieces).take(math.max(0, maxTokens - 2))
    (clsId +: body :+ sepId).toArray
  }

  /** BERT pair format: [CLS] query [SEP] doc [SEP]. */
  override def encodePair(query: String, doc: String, maxTokens: Int): Array[Int] = {
    val room = math.max(0, maxTokens - 3) // CLS + two SEPs
    val qb = basic(query).flatMap(pieces).take(math.max(0, maxTokens / 2 - 2))
    val db = basic(doc).flatMap(pieces).take(math.max(0, room - qb.length))
    ((clsId +: qb :+ sepId) ++ db :+ sepId).toArray
  }
}

object WordPieceTokenizer {
  /** BERT WordpieceTokenizer's `max_input_chars_per_word` default:
    * words longer than this become [UNK] without subword matching. */
  val MaxCharsPerWord = 100

  /** vocab.txt: one token per line, id = line number. */
  def fromFile(path: String, lowercase: Boolean = true): WordPieceTokenizer = {
    val lines = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8).asScala
    new WordPieceTokenizer(lines.zipWithIndex.map { case (t, i) => (t, i) }.toMap, lowercase)
  }
}

/** GPT-2-style byte-level BPE. `vocab`: token -> id; `merges`: ranked
  * (left, right) pairs, rank = list position. */
final class BpeTokenizer(
    vocab: Map[String, Int],
    merges: Seq[(String, String)]) extends ModelTokenizer {

  private val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  private val unkId = vocab.getOrElse("<unk>", 0)
  override val vocabSize: Int = if (vocab.isEmpty) 1 else vocab.values.max + 1

  /** Priority BPE: repeatedly merge the lowest-rank adjacent pair
    * present. The merge application is ops.Bpe.applyMerge. */
  private def bpe(unit: String): Seq[String] = {
    var syms: Seq[String] = unit.map(_.toString)
    var continue = syms.length > 1
    while (continue) {
      val best = syms.zip(syms.tail)
        .flatMap(p => ranks.get(p).map(r => (r, p)))
        .sortBy(_._1).headOption
      best match {
        case Some((_, (l, r))) => syms = graft.ops.Bpe.applyMerge(syms, l, r)
        case None => continue = false
      }
      if (syms.length < 2) continue = false
    }
    syms
  }

  override def encode(text: String, maxTokens: Int): Array[Int] = {
    // GPT-2 pre-tokenization approximation: split on whitespace, mark
    // word starts with the U+0120 space marker (how GPT-2-family
    // vocabularies spell a leading space after byte-mapping)
    val words = text.split("\\s+").filter(_.nonEmpty)
    val ids = words.zipWithIndex.flatMap { case (w, i) =>
      val mapped = BpeTokenizer.toByteLevel(w)
      val marked = if (i == 0) mapped else BpeTokenizer.SpaceMarker + mapped
      bpe(marked).map(s => vocab.getOrElse(s, unkId))
    }
    val out = ids.take(maxTokens)
    if (out.isEmpty) Array(unkId) else out
  }

  /** GPT-family pair: no special wrapping in this vocabulary model —
    * the halves concatenate, query capped at half the window. */
  override def encodePair(query: String, doc: String, maxTokens: Int): Array[Int] = {
    val q = encode(query, maxTokens / 2)
    (q ++ encode(doc, math.max(1, maxTokens - q.length))).take(maxTokens)
  }
}

object BpeTokenizer {
  /** GPT-2 byte-to-unicode table (public gpt-2 encoder.py): printable
    * byte ranges map to themselves; the rest shift into 256+ so every
    * byte is a visible character and merges operate on exact bytes. */
  private val byteToUnicode: Array[Char] = {
    val keep = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val table = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (keep.contains(b)) table(b) = b.toChar
      else { table(b) = (256 + n).toChar; n += 1 }
    }
    table
  }

  /** U+0120 — the byte-level image of ' ' (0x20), used as the
    * word-start marker in GPT-2-family vocabularies. */
  val SpaceMarker: String = byteToUnicode(' '.toInt).toString

  def toByteLevel(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8).map(b => byteToUnicode(b & 0xff)))

  /** vocab.json ({"token": id, ...}) + merges.txt ("left right" per
    * line, '#'-comments and version header skipped). */
  def fromFiles(vocabJsonPath: String, mergesPath: String): BpeTokenizer = {
    val json = new String(Files.readAllBytes(Paths.get(vocabJsonPath)), StandardCharsets.UTF_8)
    // minimal flat-object JSON parse (keys are token strings with
    // standard escapes, values are integer ids)
    val entry = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(\\d+)".r
    val vocab = entry.findAllMatchIn(json).map { m =>
      (unescapeJson(m.group(1)), m.group(2).toInt)
    }.toMap
    // only the conventional FIRST-line "#version" header is a comment:
    // '#' is a printable byte that maps to itself in the byte-level
    // table, so real merge rules can legitimately start with '#'
    // (they produce the '##'/'###' tokens of code-heavy vocabularies)
    // and must not be dropped
    val merges = Files.readAllLines(Paths.get(mergesPath), StandardCharsets.UTF_8).asScala
      .map(_.trim)
      .zipWithIndex
      .filterNot { case (l, i) => l.isEmpty || (i == 0 && l.startsWith("#version")) }
      .map { case (l, _) => val Array(a, b) = l.split(" ", 2); (a, b) }
      .toSeq
    new BpeTokenizer(vocab, merges)
  }

  private def unescapeJson(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' => out.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'n' => out.append('\n'); i += 2
          case 't' => out.append('\t'); i += 2
          case other => out.append(other); i += 2
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}

object ModelTokenizer {
  /** Resolve the tokenizer shipped NEXT TO a checkpoint, the way real
    * model directories lay out their artifacts: `vocab.txt` beside the
    * .onnx selects WordPiece; `vocab.json` + `merges.txt` selects
    * byte-level BPE; neither -> None (caller falls back to
    * OnnxTokens). */
  def forModel(modelPath: String): Option[ModelTokenizer] = {
    val dir = Option(Paths.get(modelPath).getParent).getOrElse(Paths.get("."))
    val stem = {
      val n = Paths.get(modelPath).getFileName.toString
      if (n.endsWith(".onnx")) n.dropRight(5) else n
    }
    def existing(name: String) = {
      val p = dir.resolve(name)
      if (Files.exists(p)) Some(p.toString) else None
    }
    val wp = existing(s"$stem.vocab.txt").orElse(existing("vocab.txt"))
    val bpeV = existing(s"$stem.vocab.json").orElse(existing("vocab.json"))
    val bpeM = existing(s"$stem.merges.txt").orElse(existing("merges.txt"))
    (wp, bpeV, bpeM) match {
      case (Some(v), _, _) => Some(WordPieceTokenizer.fromFile(v))
      case (None, Some(v), Some(m)) => Some(BpeTokenizer.fromFiles(v, m))
      case _ => None
    }
  }
}
