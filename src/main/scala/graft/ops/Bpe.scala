package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Byte-pair-encoding vocabulary TRAINING (Sennrich, Haddow, Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016) — the step upstream of every token count in a training-data
  * pipeline: learn the merge table itself from the corpus.
  *
  * Distributed shape: the corpus collapses to a (word, count) frequency
  * table first (BPE statistics are identical on frequencies — the
  * classic formulation), so each merge round runs over DISTINCT words,
  * not raw text. One round = flatMap adjacent symbol pairs weighted by
  * word count -> groupBy(pair) sum -> take the max (count desc, pair
  * asc for determinism) -> map-side merge of that pair in every word.
  * The merge list lives on the driver (tiny — it IS the model); word
  * state is cached and lineage-truncated per round like the
  * connected-components loop. At 100 TB the frequency table is the only
  * large state, and it shrinks every round.
  *
  * Training is iterative state evolution, not a query, so there is no
  * SQL oracle; the spec reproduces the classic hand-computable example
  * and pins determinism + the tokens-per-word monotonicity instead.
  */
object Bpe {

  case class Merge(left: String, right: String, pairCount: Long)

  /** Learn up to nMerges merges from a (word, count) frequency table. */
  def trainFromCounts(words: Dataset[(String, Long)], nMerges: Int): Seq[Merge] = {
    val spark = words.sparkSession
    import spark.implicits._
    var syms: Dataset[(Seq[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString): Seq[String], c) }.cache()
    var cached = syms
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var continue = true
    var round = 0
    while (continue && round < nMerges) {
      val best = syms.flatMap { case (s, c) =>
        s.iterator.zip(s.iterator.drop(1)).map { case (a, b) => ((a, b), c) }.toSeq
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), c) => (a, b, c) }
        .orderBy(col("_3").desc, col("_1").asc, col("_2").asc)
        .limit(1).collect().headOption
      best match {
        case Some((l, r, c)) if c >= 2 =>
          merges += Merge(l, r, c)
          val next = syms.map { case (s, cnt) => (applyMerge(s, l, r), cnt) }.cache()
          next.count() // materialize before dropping the parent cache
          cached.unpersist()
          cached = next
          syms = next
        case _ => continue = false
      }
      round += 1
    }
    cached.unpersist()
    merges.toSeq
  }

  /** Convenience: train on the documents table's token frequencies. */
  def train(spark: SparkSession, sfDir: String, nMerges: Int): Seq[Merge] = {
    import spark.implicits._
    val words = Tables.documents(spark, sfDir)
      .select(explode(TextAnalytics.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)]
    trainFromCounts(words, nMerges)
  }

  /** One left-to-right pass replacing adjacent (l, r) with l+r — the
    * standard greedy merge application. */
  private[graft] def applyMerge(s: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  /** Encode a word with a learned merge list (merges applied in
    * training order — the standard inference rule). */
  def encode(word: String, merges: Seq[Merge]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) { (s, m) =>
      applyMerge(s, m.left, m.right)
    }

  /** Average encoded tokens per corpus word occurrence for a merge
    * list — the compression curve a tokenizer team reads off while
    * sizing a vocabulary. */
  def tokensPerWord(words: Seq[(String, Long)], merges: Seq[Merge]): Double = {
    val (toks, occ) = words.foldLeft((0L, 0L)) { case ((t, o), (w, c)) =>
      (t + encode(w, merges).length * c, o + c)
    }
    toks.toDouble / occ.toDouble
  }
}
