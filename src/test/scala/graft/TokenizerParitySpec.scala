package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TokenizerParity

/** q202: the E1 encode layer pinned against hand-derived WordPiece /
  * byte-level-BPE expectations (the production tokenizer classes the
  * ONNX embed/rerank path uses). Derivations, so the pin is auditable
  * without re-running anything:
  *
  * WordPiece vocab ids: [PAD]0 [UNK]1 [CLS]2 [SEP]3 the4 quick5
  * brown6 fox7 jump8 ##s9 ##ed10 over11 dog12 ,13 .14 '15 don16
  * ##t17 t18 un19 ##believ20 ##able21.
  *  - case 1 "The quick brown fox jumps over the dog." lowercases,
  *    splits '.' off, and greedy-matches jumps = jump + ##s:
  *    [CLS] 4 5 6 7 8 9 11 4 12 14 [SEP].
  *  - case 2 "Don't JUMP!": BasicTokenizer splits don | ' | t; 't' is
  *    a standalone word (id 18, not ##t); '!' has no entry, so the
  *    whole word becomes [UNK]: [CLS] 16 15 18 8 1 [SEP].
  *  - case 3 "unbelievable" = un + ##believ + ##able (longest-first).
  *  - case 4 truncation: maxTokens 6 keeps 4 body ids + framing.
  *  - case 5 pair: [CLS] q [SEP] d [SEP], query capped at
  *    maxTokens/2 - 2 = 3 ids (qb has only 2).
  *
  * BPE vocab: low0 Ġlow1 er2 e3 s4 t5 <unk>6; merges ranked
  * (l,o) (lo,w) (Ġ,low) (e,r).
  *  - case 1 "low lower lowest": low; Ġlower -> Ġ,lo,w,e,r -> Ġ,low
  *    -> Ġlow,e,r -> Ġlow,er; Ġlowest -> Ġlow,e,s,t (no (e,s) merge):
  *    0 | 1 2 | 1 3 4 5.
  *  - case 2 "zap": no merges apply, no symbols in vocab: 6 6 6.
  *  - case 3 "é" is UTF-8 C3 A9; both bytes are in the keep ranges of
  *    the public GPT-2 byte table, so two symbols, both unknown: 6 6.
  *  - case 4: hard take(4) of case 1: 0 1 2 1.
  *  - case 5 pair: encode("low",4)=0 then encode("lower",7)=low,er
  *    (first word unmarked): 0 0 2.
  */
class TokenizerParitySpec extends AnyFunSuite {

  test("q202: production tokenizers reproduce the hand-derived id sequences") {
    val wp = new graft.chat.WordPieceTokenizer(TokenizerParity.wpVocab)
    val bpe = new graft.chat.BpeTokenizer(
      TokenizerParity.bpeVocab, TokenizerParity.bpeMerges)
    val got: Map[(String, Long), Seq[Long]] = Map(
      ("wordpiece", 1L) -> wp.encode("The quick brown fox jumps over the dog.", 16).toSeq.map(_.toLong),
      ("wordpiece", 2L) -> wp.encode("Don't JUMP!", 16).toSeq.map(_.toLong),
      ("wordpiece", 3L) -> wp.encode("unbelievable", 16).toSeq.map(_.toLong),
      ("wordpiece", 4L) -> wp.encode("The quick brown fox jumps over the dog.", 6).toSeq.map(_.toLong),
      ("wordpiece", 5L) -> wp.encodePair("the fox", "jumps over the dog", 10).toSeq.map(_.toLong),
      ("bpe", 1L) -> bpe.encode("low lower lowest", 16).toSeq.map(_.toLong),
      ("bpe", 2L) -> bpe.encode("zap", 16).toSeq.map(_.toLong),
      ("bpe", 3L) -> bpe.encode("é", 16).toSeq.map(_.toLong),
      ("bpe", 4L) -> bpe.encode("low lower lowest", 4).toSeq.map(_.toLong),
      ("bpe", 5L) -> bpe.encodePair("low", "lower", 8).toSeq.map(_.toLong))
    TokenizerParity.expected.foreach { case (tk, cid, want) =>
      assert(got((tk, cid)) == want, s"$tk case $cid")
    }
    assert(got.size == TokenizerParity.expected.size)
  }

  test("q202: framing invariants hold on every wordpiece case") {
    val wp = new graft.chat.WordPieceTokenizer(TokenizerParity.wpVocab)
    val cls = TokenizerParity.wpVocab("[CLS]").toLong
    val sep = TokenizerParity.wpVocab("[SEP]").toLong
    TokenizerParity.expected.filter(_._1 == "wordpiece").foreach {
      case (_, cid, ids) =>
        assert(ids.head == cls, s"case $cid must open with [CLS]")
        assert(ids.last == sep, s"case $cid must close with [SEP]")
        // the pair case carries exactly two SEPs; singles exactly one
        val seps = ids.count(_ == sep)
        assert(if (cid == 5L) seps == 2 else seps == 1, s"case $cid")
    }
    // no expected sequence exceeds its case's token budget
    assert(TokenizerParity.expected.forall(_._3.size <= 16))
  }
}
