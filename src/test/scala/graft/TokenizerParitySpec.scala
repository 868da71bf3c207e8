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
  *
  * Round-14 adversarial cases (the published algorithms' nasty edges;
  * vocab additions append-only: 的=22 wordpiece; oo=7 ġ=8, merge
  * (o,o)=rank4 bpe):
  *  - wp case 6, max_input_chars_per_word: "un"+"believ"×16+"able" is
  *    102 chars. Greedy matching WOULD yield un ##believ×16 ##able
  *    (every piece in vocab), but the published WordpieceTokenizer
  *    checks len > 100 FIRST and emits whole-word [UNK]:
  *    [CLS] 1 [SEP] = 2 1 3.
  *  - wp case 7, CJK isolation: BasicTokenizer's
  *    tokenize_chinese_chars puts each ideograph in its own word
  *    before whitespace/punct splitting, so "的猫的fox" -> 的|猫|的|fox:
  *    的=22, 猫 has no entry (whole-word [UNK]=1), fox=7:
  *    [CLS] 22 1 22 7 [SEP].
  *  - wp case 8, truncation mid-word: "unbelievable fox" at
  *    maxTokens=4 keeps body take(2) = un(19) ##believ(20) — the cap
  *    is TOKEN-level and legally cuts inside a word's pieces:
  *    2 19 20 3.
  *  - wp case 9, over-half query in a pair: qb = the(4) quick(5)
  *    brown(6) fox(7) jump(8) ##s(9) capped at 8/2-2 = 2 -> 4 5;
  *    room = 8-3 = 5, doc gets 5-2 = 3 -> dog(12):
  *    [CLS] 4 5 [SEP] 12 [SEP] = 2 4 5 3 12 3.
  *  - bpe case 6, overlapping occurrences: "loooo" = l o o o o.
  *    Lowest rank present is (l,o)=0 (not (o,o)=4) -> lo o o o; then
  *    (o,o) merges left-to-right NON-overlapping -> lo oo o:
  *    lo∉vocab=6, oo=7, o∉vocab=6 -> 6 7 6.
  *  - bpe case 7, shifted byte-table arm: 0x7F is outside encoder.py's
  *    keep ranges (33-126, 161-172, 174-255); the 33 shifted bytes
  *    before it are 0x00-0x20, so 0x7F maps to chr(256+33) = U+0121 ġ
  *    = vocab 8, flanked by self-mapped a,b (∉vocab): 6 8 6.
  *  - bpe case 8, 4-byte UTF-8: 🙂 (U+1F642) is F0 9F 99 82 -> ð (240
  *    self-mapped) + three shifted symbols = FOUR byte symbols, none
  *    in vocab: 6 6 6 6.
  *  - bpe case 9, truncation after merges: "low lower" fully merges to
  *    low(0) Ġlow(1) er(2) and THEN take(2) cuts mid-word: 0 1.
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
      ("bpe", 5L) -> bpe.encodePair("low", "lower", 8).toSeq.map(_.toLong),
      ("wordpiece", 6L) -> wp.encode("un" + "believ" * 16 + "able", 16).toSeq.map(_.toLong),
      ("wordpiece", 7L) -> wp.encode("的猫的fox", 16).toSeq.map(_.toLong),
      ("wordpiece", 8L) -> wp.encode("unbelievable fox", 4).toSeq.map(_.toLong),
      ("wordpiece", 9L) -> wp.encodePair("the quick brown fox jumps", "dog", 8).toSeq.map(_.toLong),
      ("bpe", 6L) -> bpe.encode("loooo", 16).toSeq.map(_.toLong),
      ("bpe", 7L) -> bpe.encode("a\u007fb", 16).toSeq.map(_.toLong),
      ("bpe", 8L) -> bpe.encode("🙂", 16).toSeq.map(_.toLong),
      ("bpe", 9L) -> bpe.encode("low lower", 2).toSeq.map(_.toLong))
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
        // pair cases (5, 9) carry exactly two SEPs; singles exactly one
        val seps = ids.count(_ == sep)
        assert(if (cid == 5L || cid == 9L) seps == 2 else seps == 1, s"case $cid")
    }
    // no expected sequence exceeds its case's token budget
    assert(TokenizerParity.expected.forall(_._3.size <= 16))
  }

  test("wordpiece length guard: a 98-char word still tokenizes; the rule binds only past 100") {
    val wp = new graft.chat.WordPieceTokenizer(TokenizerParity.wpVocab)
    // same construction as adversarial case 6 minus the tail: 2+96=98
    // chars -> un ##believ×16, NOT [UNK]
    val ids = wp.encode("un" + "believ" * 16, 40).toSeq.map(_.toLong)
    assert(ids == (2L +: 19L +: Seq.fill(16)(20L)) :+ 3L)
    assert(graft.chat.WordPieceTokenizer.MaxCharsPerWord == 100)
  }
}
