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

  /** WordPiece toy vocabulary (vocab.txt order = id). */
  val wpVocab: Map[String, Int] = Seq(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "the", "quick", "brown", "fox",
    "jump", "##s", "##ed", "over",
    "dog", ",", ".", "'",
    "don", "##t", "t", "un",
    "##believ", "##able").zipWithIndex.toMap

  /** BPE toy vocabulary + ranked merges (G = the U+0120 marker). */
  private def G = graft.chat.BpeTokenizer.SpaceMarker
  val bpeVocab: Map[String, Int] = Map(
    "low" -> 0, s"${G}low" -> 1, "er" -> 2, "e" -> 3,
    "s" -> 4, "t" -> 5, "<unk>" -> 6)
  val bpeMerges: Seq[(String, String)] = Seq(
    ("l", "o"),      // rank 0: l o   -> lo
    ("lo", "w"),     // rank 1: lo w  -> low
    (G, "low"),      // rank 2: G low -> Glow
    ("e", "r"))      // rank 3: e r   -> er

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
      ("bpe", 5L, bpe.encodePair("low", "lower", 8)))
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
    ("bpe", 5L, Seq(0, 0, 2)))

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
