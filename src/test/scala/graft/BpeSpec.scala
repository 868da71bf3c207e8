package graft

import graft.ops.Bpe

/** BPE training specs: the classic hand-computable example from the
  * Sennrich et al. formulation, determinism, and the compression
  * monotonicity a tokenizer team relies on. */
class BpeSpec extends SparkSpec {

  // the canonical BPE teaching corpus: {low:5, lower:2, newest:6, widest:3}
  private val corpus = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  private def ds = {
    import spark.implicits._
    spark.createDataset(corpus)
  }

  test("learns the classic merges in frequency order") {
    val merges = Bpe.trainFromCounts(ds, 4)
    // pair counts: (e,s)=9, (s,t)=9, (t,</>)... no end marker here, so:
    // round 1: (e,s) 9 vs (s,t) 9 -> tie broken lexicographically: (e,s)
    assert(merges.head.left == "e" && merges.head.right == "s")
    assert(merges.head.pairCount == 9)
    // round 2: ("es","t") now 9 and wins
    assert(merges(1).left == "es" && merges(1).right == "t")
    // merges are deterministic run to run
    val again = Bpe.trainFromCounts(ds, 4)
    assert(merges == again)
  }

  test("encode applies merges in training order") {
    val merges = Bpe.trainFromCounts(ds, 6)
    val enc = Bpe.encode("newest", merges)
    assert(enc.mkString("|").replace("|", "") == "newest") // round-trips
    assert(enc.length < "newest".length, s"no compression: $enc")
    // unseen word still encodes (subwords fall back to chars)
    val unseen = Bpe.encode("zzz", merges)
    assert(unseen == Seq("z", "z", "z"))
  }

  test("tokens-per-word decreases monotonically with more merges") {
    val merges = Bpe.trainFromCounts(ds, 8)
    val curve = (0 to merges.length).map(k =>
      Bpe.tokensPerWord(corpus, merges.take(k)))
    curve.sliding(2).foreach { case Seq(a, b) => assert(b <= a, curve.toString) }
    assert(curve.last < curve.head)
  }

  test("trains on the real corpus and compresses its tokens") {
    val merges = Bpe.train(spark, sf0001, nMerges = 10)
    assert(merges.nonEmpty && merges.length <= 10)
    // every learned pair was genuinely frequent
    assert(merges.forall(_.pairCount >= 2))
    // compression on the corpus's own most frequent tokens
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val top = graft.core.Tables.documents(spark, sf0001)
      .select(explode(graft.ops.TextAnalytics.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc).limit(50)
      .as[(String, Long)].collect().toSeq
    assert(Bpe.tokensPerWord(top, merges) < Bpe.tokensPerWord(top, Seq.empty))
  }
}
