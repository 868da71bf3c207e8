package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** BPE vocabulary induction over the corpus — the tokenizer TRAINING
  * stage of a pre-training pipeline (Sennrich et al. 2016). The
  * reference engine only ever APPLIES pretrained merge tables
  * (chat/Tokenizers byte-BPE mirrors its tokenizer.rs usage); a
  * pipeline that produces training data must also be able to induce
  * those merges from the corpus it curated, so this is engine-side.
  *
  * The classic trainer runs on the WORD-COUNT table, not the token
  * stream (every BPE implementation does this — pair statistics are
  * identical and the table is vocabulary-sized): one corpus pass
  * aggregates word counts with map-side combine, and every merge
  * iteration after that touches only the cached vocab table.
  *
  * Scale shape: the corpus is scanned exactly ONCE (the word-count
  * agg); each of the k merge steps is a typed flatMap over the cached
  * vocab-sized table (merges-so-far applied scan-locally — the loop
  * state is the k-row merge list living in the task closure, never a
  * rewritten word table) into an alphabet²-bounded pair aggregate,
  * and the argmax collects ONE row (the q73/q84 train-step
  * discipline). At 100 TB the vocab table is ~10⁸ narrow rows — each
  * iteration is a sub-second cached pass on a real cluster, and the
  * corpus itself is never re-read.
  */
object BpeTrain {

  /** Rows reported by q121 (answer-sized; the pair alphabet at step 0
    * is bounded by the character alphabet squared). */
  val BpeTopK = 20

  /** Default merge count for [[trainBpe]] (spec-exercised; real runs
    * pass vocabulary-size - alphabet-size). */
  val BpeMerges = 10

  /** One corpus pass: word → count. */
  private[ops] def wordCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(TextAnalytics.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Apply an ordered merge list to one word: standard BPE
    * left-to-right non-overlapping replacement, one merge at a time
    * in rank order. Symbols start as single characters. */
  private[graft] def applyMerges(word: String,
                                 merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Weighted adjacent-pair counts over the word-count table with
    * `merges` applied scan-locally. Output is pair-alphabet-sized. */
  private def pairCounts(spark: SparkSession, wc: DataFrame,
                         merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val ms = merges.toArray
    wc.as[(String, Long)]
      .mapPartitions { it =>
        it.flatMap { case (w, cnt) =>
          val s = applyMerges(w, ms.toSeq)
          (0 until s.length - 1).iterator.map(i => (s(i), s(i + 1), cnt))
        }
      }
      .toDF("left_sym", "right_sym", "c")
      .groupBy("left_sym", "right_sym")
      .agg(sum(col("c")).as("n_weighted"))
  }

  /** q121: the first BPE merge step's pair statistics — the top
    * [[BpeTopK]] weighted adjacent character pairs over the corpus
    * word-count table, rank 1 being the pair the first merge fuses.
    * Deterministic tie-break (count DESC, pair ASC) so the merge
    * choice — and therefore the whole induced vocabulary — is
    * reproducible across runs and engines; the full k-step trainer is
    * [[trainBpe]], spec-pinned against an independent JVM reference
    * (step 2+ state is not SQL-expressible, the q73 kmeans split). */
  def bpePairs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("n_weighted").desc, col("left_sym"), col("right_sym"))
    // the window runs AFTER the pair aggregate, over an
    // alphabet²-bounded frame — answer-sized, same as q113's
    // languages-frame window
    pairCounts(spark, wordCounts(spark, sfDir), Nil)
      .withColumn("merge_rank", row_number().over(w).cast("long"))
      .filter(col("merge_rank") <= BpeTopK)
      .select("merge_rank", "left_sym", "right_sym", "n_weighted")
      .orderBy("merge_rank")
  }

  def bpePairsSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(${TextAnalytics.sqlTokens}) AS w FROM documents),
       |wc AS (SELECT w, cast(count(*) as bigint) AS cnt FROM toks GROUP BY w),
       |pos AS (SELECT w, cnt, unnest(range(length(w) - 1)) AS i FROM wc),
       |pc AS (
       |  SELECT substr(w, cast(i + 1 as int), 1) AS left_sym,
       |    substr(w, cast(i + 2 as int), 1) AS right_sym,
       |    cast(sum(cnt) as bigint) AS n_weighted
       |  FROM pos GROUP BY 1, 2),
       |rk AS (
       |  SELECT cast(row_number() OVER (
       |      ORDER BY n_weighted DESC, left_sym, right_sym) as bigint) AS merge_rank,
       |    left_sym, right_sym, n_weighted
       |  FROM pc)
       |SELECT merge_rank, left_sym, right_sym, n_weighted
       |FROM rk WHERE merge_rank <= $BpeTopK
       |ORDER BY merge_rank""".stripMargin

  /** The k-step trainer: each iteration applies the merges learned so
    * far scan-locally over the CACHED word-count table, aggregates
    * pair counts, and collects the single argmax row (count DESC,
    * pair ASC — the q121 tie-break). Returns the learned merge table
    * (merge_rank, left_sym, right_sym, n_weighted). Stops early if no
    * pair remains. */
  def trainBpe(spark: SparkSession, sfDir: String,
               k: Int = BpeMerges): DataFrame = {
    import spark.implicits._
    val wc = Materialize.shared(spark, wordCounts(spark, sfDir))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var done = false
    while (!done && merges.length < k) {
      val top = pairCounts(spark, wc, merges.map(m => (m._2, m._3)).toSeq)
        .orderBy(col("n_weighted").desc, col("left_sym"), col("right_sym"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val r = top(0)
        merges += ((merges.length + 1L, r.getAs[String]("left_sym"),
          r.getAs[String]("right_sym"), r.getAs[Long]("n_weighted")))
      }
    }
    merges.toSeq.toDF("merge_rank", "left_sym", "right_sym", "n_weighted")
  }
}
