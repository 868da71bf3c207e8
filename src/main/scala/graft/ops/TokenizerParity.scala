package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** q202: tokenizer-parity corpus for the E1 model-input seam
  * (reference embedding.rs loads the model family's tokenizer;
  * rerank.rs:12 feeds a cross-encoder PAIR encoding). The real
  * pretrained vocabularies are egress-blocked (RealCheckpointSpec),
  * but the ALGORITHMS are public and exactly testable on constructed
  * vocabularies: BERT WordPiece (Devlin et al. 2019; basic-tokenizer
  * punctuation split, greedy longest-match-first subwords, whole-word
  * [UNK], [CLS]/[SEP] framing, pair format) and GPT-2 byte-level BPE
  * (Radford et al. 2019 + the public encoder.py byte table; ranked
  * merges, U+0120 space marker on non-initial words, byte fallback).
  *
  * Every expected id sequence below is HAND-DERIVED from those
  * published algorithms given the pinned toy vocabularies — the
  * Spark side then runs the PRODUCTION WordPieceTokenizer /
  * BpeTokenizer (the classes the ONNX embed/rerank path uses) and
  * must reproduce them; the DuckDB side is the same table as VALUES.
  * A drift in either tokenizer breaks the hash, which is the point:
  * the encode layer feeding every embedding is pinned cross-engine.
  */
object TokenizerParity {

  /** WordPiece toy vocabulary (vocab.txt order = id). Round-14
    * additions append AFTER the original 22 entries so the original
    * case ids are unchanged: 的 (a CJK ideograph the BasicTokenizer
    * must isolate per character). */
  val wpVocab: Map[String, Int] = Seq(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "the", "quick", "brown", "fox",
    "jump", "##s", "##ed", "over",
    "dog", ",", ".", "'",
    "don", "##t", "t", "un",
    "##believ", "##able",
    "的").zipWithIndex.toMap

  /** BPE toy vocabulary + ranked merges (G = the U+0120 marker).
    * Round-14 additions append after the originals (ids/ranks of the
    * original cases unchanged): "oo" + merge (o,o) for the
    * overlapping-occurrence tie case, and U+0121 — the byte table's
    * image of 0x7F — so one SHIFTED table entry is pinned by exact id,
    * not just by [UNK] arity. */
  private def G = graft.chat.BpeTokenizer.SpaceMarker
  val bpeVocab: Map[String, Int] = Map(
    "low" -> 0, s"${G}low" -> 1, "er" -> 2, "e" -> 3,
    "s" -> 4, "t" -> 5, "<unk>" -> 6,
    "oo" -> 7, "ġ" -> 8)
  val bpeMerges: Seq[(String, String)] = Seq(
    ("l", "o"),      // rank 0: l o   -> lo
    ("lo", "w"),     // rank 1: lo w  -> low
    (G, "low"),      // rank 2: G low -> Glow
    ("e", "r"),      // rank 3: e r   -> er
    ("o", "o"))      // rank 4: o o   -> oo (round 14, tie case)

  /** (tokenizer, case_id, what is exercised, encode thunk). */
  private def cases: Seq[(String, Long, Array[Int])] = {
    val wp = new graft.chat.WordPieceTokenizer(wpVocab)
    val bpe = new graft.chat.BpeTokenizer(bpeVocab, bpeMerges)
    Seq(
      // case folding, punctuation split, greedy subword (jump ##s),
      // repeated word: [CLS] the quick brown fox jump ##s over the dog . [SEP]
      ("wordpiece", 1L, wp.encode("The quick brown fox jumps over the dog.", 16)),
      // BasicTokenizer: don't -> don | ' | t; '!' has no vocab entry ->
      // whole-word [UNK]
      ("wordpiece", 2L, wp.encode("Don't JUMP!", 16)),
      // greedy longest-match-first across three pieces
      ("wordpiece", 3L, wp.encode("unbelievable", 16)),
      // truncation: body capped at maxTokens-2, framing kept
      ("wordpiece", 4L, wp.encode("The quick brown fox jumps over the dog.", 6)),
      // BERT pair format: [CLS] q [SEP] d [SEP], query capped at half
      ("wordpiece", 5L, wp.encodePair("the fox", "jumps over the dog", 10)),
      // ranked merges: low | Glow er | Glow e s t
      ("bpe", 1L, bpe.encode("low lower lowest", 16)),
      // no applicable merges, no vocab entries -> per-symbol <unk>
      ("bpe", 2L, bpe.encode("zap", 16)),
      // byte-level mapping: 'é' is two UTF-8 bytes -> two shifted
      // symbols, both unknown in the toy vocab
      ("bpe", 3L, bpe.encode("é", 16)),
      // hard truncation at maxTokens (no framing in the GPT family)
      ("bpe", 4L, bpe.encode("low lower lowest", 4)),
      // GPT pair: plain concatenation, query capped at half the window
      ("bpe", 5L, bpe.encodePair("low", "lower", 8)),

      // ---- round-14 adversarial cases (derivations in
      // TokenizerParitySpec; ids hand-derived from the published
      // algorithms, never from running this code) ----
      // WordPiece max_input_chars_per_word: a 102-char word whose
      // pieces ALL exist in the vocab still becomes whole-word [UNK]
      ("wordpiece", 6L, wp.encode("un" + "believ" * 16 + "able", 16)),
      // CJK isolation: each ideograph is its own word — 的(22) 猫[UNK] 的(22) fox(7)
      ("wordpiece", 7L, wp.encode("的猫的fox", 16)),
      // truncation mid-WORD: token-level cap cuts inside unbelievable's pieces
      ("wordpiece", 8L, wp.encode("unbelievable fox", 4)),
      // pair with an over-half query: query capped at maxTokens/2 - 2
      ("wordpiece", 9L, wp.encodePair("the quick brown fox jumps", "dog", 8)),
      // overlapping same-pair occurrences: rank 0 fires before rank 4,
      // then (o,o) merges left-to-right non-overlapping
      ("bpe", 6L, bpe.encode("loooo", 16)),
      // byte table, shifted arm: 0x7F maps to U+0121 exactly (vocab id
      // 8), flanked by printable bytes that map to themselves
      ("bpe", 7L, bpe.encode("a\u007fb", 16)),
      // 4-byte UTF-8 (U+1F642): four byte symbols, not one or two
      ("bpe", 8L, bpe.encode("🙂", 16)),
      // truncation lands mid-word AFTER merges complete: Glow kept, er cut
      ("bpe", 9L, bpe.encode("low lower", 2)))
  }

  /** The q202 query: the production tokenizers over the pinned cases,
    * exploded to (tokenizer, case_id, pos, token_id) rows. */
  def tokenizerParity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    cases.flatMap { case (tk, cid, ids) =>
      ids.zipWithIndex.map { case (id, pos) => (tk, cid, pos.toLong, id.toLong) }
    }.toDF("tokenizer", "case_id", "pos", "token_id")
      .orderBy("tokenizer", "case_id", "pos")
  }

  /** Hand-derived expectations (see TokenizerParitySpec for the
    * per-case derivations). */
  val expected: Seq[(String, Long, Seq[Long])] = Seq(
    ("wordpiece", 1L, Seq(2, 4, 5, 6, 7, 8, 9, 11, 4, 12, 14, 3)),
    ("wordpiece", 2L, Seq(2, 16, 15, 18, 8, 1, 3)),
    ("wordpiece", 3L, Seq(2, 19, 20, 21, 3)),
    ("wordpiece", 4L, Seq(2, 4, 5, 6, 7, 3)),
    ("wordpiece", 5L, Seq(2, 4, 7, 3, 8, 9, 11, 4, 12, 3)),
    ("bpe", 1L, Seq(0, 1, 2, 1, 3, 4, 5)),
    ("bpe", 2L, Seq(6, 6, 6)),
    ("bpe", 3L, Seq(6, 6)),
    ("bpe", 4L, Seq(0, 1, 2, 1)),
    ("bpe", 5L, Seq(0, 0, 2)),
    // round-14 adversarial rows (derivations in TokenizerParitySpec)
    ("wordpiece", 6L, Seq(2, 1, 3)),
    ("wordpiece", 7L, Seq(2, 22, 1, 22, 7, 3)),
    ("wordpiece", 8L, Seq(2, 19, 20, 3)),
    ("wordpiece", 9L, Seq(2, 4, 5, 3, 12, 3)),
    ("bpe", 6L, Seq(6, 7, 6)),
    ("bpe", 7L, Seq(6, 8, 6)),
    ("bpe", 8L, Seq(6, 6, 6, 6)),
    ("bpe", 9L, Seq(0, 1)))

  def tokenizerParitySql: String = {
    val rows = expected.flatMap { case (tk, cid, ids) =>
      ids.zipWithIndex.map { case (id, pos) => s"('$tk', $cid, $pos, $id)" }
    }.mkString(",\n  ")
    s"""SELECT tokenizer, cast(case_id as bigint) AS case_id,
       |  cast(pos as bigint) AS pos, cast(token_id as bigint) AS token_id
       |FROM (VALUES
       |  $rows)
       |  AS t(tokenizer, case_id, pos, token_id)
       |ORDER BY tokenizer, case_id, pos""".stripMargin
  }
}
