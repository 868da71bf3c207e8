package graft

import org.apache.spark.sql.functions._

/** Specs for the round-7 additions. Each operator is checked against an
  * INDEPENDENT in-spec reference implementation (pure-Scala prefix
  * sums, explicit sorts), not against the operator's own machinery.
  */
class Round7OpsSpec extends SparkSpec {

  private def toks(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  // ---------------------------------------------------------------- q123

  test("q123: coverage curve matches an explicit sorted-prefix reference at sf0.001") {
    // independent reference: literal (cnt desc, tok asc) sort + prefix sum
    // — any tie order yields the same mass, which is exactly the property
    // the operator's histogram shortcut relies on
    val counts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().flatMap(r => toks(r.getString(0)))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val sorted = counts.sortBy { case (w, c) => (-c, w) }
    val totalMass = counts.map(_._2).sum
    val out = graft.ops.TextAnalytics.vocabCoverage(spark, sf0001).collect()
    assert(out.map(_.getAs[Long]("vocab_size")).toSeq ==
      graft.ops.TextAnalytics.CoverageCheckpoints.sorted)
    out.foreach { r =>
      val v = r.getAs[Long]("vocab_size")
      val covered = sorted.take(v.toInt).map(_._2).sum
      assert(r.getAs[Long]("total_types") == counts.length.toLong)
      assert(r.getAs[Long]("total_mass") == totalMass)
      assert(r.getAs[Long]("covered_mass") == covered, s"V=$v")
      assert(r.getAs[Boolean]("vocab_exhausted") == (v >= counts.length))
      assert(r.getAs[Long]("coverage_permille") == covered * 1000L / totalMass)
    }
    // the checkpoint list must exercise both branches on the spec corpus
    assert(out.exists(!_.getAs[Boolean]("vocab_exhausted")))
    assert(out.exists(_.getAs[Boolean]("vocab_exhausted")))
    // coverage is monotone in V
    val per = out.map(_.getAs[Long]("coverage_permille")).toSeq
    assert(per == per.sorted)
  }

  test("q123: tie runs split exactly and empty corpora are total coverage") {
    import spark.implicits._
    // planted histogram: three types at count 5, two at 2, one at 1
    val wc = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 2L), ("e", 2L), ("f", 1L))
      .toDF("tok", "cnt")
    val got = graft.ops.TextAnalytics
      .vocabCoverageOf(spark, wc, Seq(2L, 4L, 6L, 10L)).collect()
      .map(r => (r.getAs[Long]("vocab_size"), r.getAs[Long]("covered_mass"),
        r.getAs[Long]("coverage_permille"), r.getAs[Boolean]("vocab_exhausted")))
      .toSeq
    // V=2 splits the 5-run (2x5); V=4 takes the full run + 1 of the 2-run;
    // V=6 is the exact boundary; V=10 overshoots the vocabulary
    assert(got == Seq((2L, 10L, 500L, false), (4L, 17L, 850L, false),
      (6L, 20L, 1000L, true), (10L, 20L, 1000L, true)))
    val empty = graft.ops.TextAnalytics
      .vocabCoverageOf(spark, wc.filter(col("cnt") < 0L), Seq(4L)).collect()
    assert(empty.length == 1)
    assert(empty(0).getAs[Long]("covered_mass") == 0L)
    assert(empty(0).getAs[Long]("coverage_permille") == 1000L)
    assert(empty(0).getAs[Boolean]("vocab_exhausted"))
  }

  // ---------------------------------------------------------------- q124

  /** Independent classic DP Levenshtein. */
  private def lev(a: String, b: String): Long = {
    val prev = Array.tabulate(b.length + 1)(_.toLong)
    val cur = new Array[Long](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i.toLong
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0L else 1L)
        cur(j) = math.min(math.min(prev(j) + 1L, cur(j - 1) + 1L), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("q124: edit verdicts match an independent DP reference on every reported pair") {
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val out = graft.ops.Dedup.editVerifiedPairs(spark, sf0001, 32).collect()
    assert(out.nonEmpty, "no candidates above the screen at sf0.001")
    out.foreach { r =>
      val (a, b) = (texts(r.getAs[Long]("doc_a")), texts(r.getAs[Long]("doc_b")))
      val l = lev(a, b)
      val simP = 1000L - l * 1000L / math.max(a.length, b.length)
      assert(r.getAs[Long]("lev") == l)
      assert(r.getAs[Long]("sim_permille") == simP)
      assert(r.getAs[Boolean]("confirmed") ==
        (simP >= graft.ops.Dedup.EditConfirmPermille))
      assert(r.getAs[Long]("jacc_permille") >= graft.ops.Dedup.EditScreenPermille)
    }
    // ordering is the presentation contract
    val keys = out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
    assert(keys == keys.sorted)
    // measured corpus property this spec RELIES on elsewhere: at sf0.001
    // every LSH candidate is a true near-dup, so the reject branch must
    // be exercised by the planted case below, not here
    assert(out.forall(_.getAs[Boolean]("confirmed")))
  }

  test("q124: planted bag-similar/sequence-different pair is screened in but rejected") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the red fox jumped over the lazy dog near the old barn today"),
      (2L, "today barn old the near dog lazy the over jumped fox red the"),
      (3L, "alpha beta gamma delta epsilon"),
      (4L, "alpha beta gamma delta epsilonX"),
      (5L, "completely unrelated text here")).toDF("doc_id", "text")
    // planted candidates: (1,2) high bag overlap, scrambled order;
    // (3,4) one-char edit; (1,5) below the screen -> must be dropped
    val cands = Seq((1L, 2L, 6L, 10L), (3L, 4L, 5L, 8L), (1L, 5L, 1L, 12L))
      .toDF("doc_a", "doc_b", "inter", "uni")
    val rows = graft.ops.Dedup.editVerifyCore(cands, docs).collect()
    assert(rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq ==
      Seq((1L, 2L), (3L, 4L)))
    val r12 = rows(0); val r34 = rows(1)
    assert(r12.getAs[Long]("jacc_permille") == 600L)
    assert(!r12.getAs[Boolean]("confirmed"),
      s"scrambled pair confirmed at sim ${r12.getAs[Long]("sim_permille")}")
    // the exact DP values, independently computed
    val t = docs.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(r12.getAs[Long]("lev") == lev(t(1L), t(2L)))
    assert(r34.getAs[Boolean]("confirmed"))
    assert(r34.getAs[Long]("lev") == 1L)
    assert(r34.getAs[Long]("sim_permille") ==
      1000L - 1000L / t(4L).length)
  }

  test("q124: verification joins are equi-joins — no nested loop over candidates") {
    val plan = graft.ops.Dedup.editVerifiedPairs(spark, sf0001, 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q123: no corpus-sized sort or window — ranking never materializes per type") {
    // the cumulative window must consume the count-value HISTOGRAM, not
    // the type table: assert the executed plan's window sits above an
    // aggregate keyed on cnt, and no Sort node orders the type table
    // (the only sorts allowed are the window's histogram sort and the
    // presentation orderBy on the constants-sized output)
    val df = graft.ops.TextAnalytics.vocabCoverage(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    // per-type ranking would need row_number over (cnt, tok): the type
    // column must not appear in any Window ordering
    assert(!plan.matches("(?s).*Window.*tok.*ASC.*"), plan)
  }
}
