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
