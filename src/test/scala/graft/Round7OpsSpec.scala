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

  // ---------------------------------------------------------------- q125

  test("q125: JL projection recall matches an independent full reference ranking") {
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val k = graft.core.Consts.KnnK
    val nq = graft.core.Consts.KnnQueries
    // independent reference: quantize, hash-derive the sign matrix from
    // md5 directly (not via the operator's helper), project, rank
    def md5Sign(j: Int, i: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp|$j|$i".getBytes("UTF-8"))
      val hex = "0123456789abcdef" (((d(0) >> 4) & 0xf))
      if ("02468ace".contains(hex)) 1L else -1L
    }
    val q = embs.map { case (id, e) =>
      (id, e.map(x => math.floor(x.toDouble * 1e6).toLong))
    }
    val proj = q.map { case (id, v) =>
      (id, Array.tabulate(graft.ops.Similarity.RpDims)(j =>
        (0 until v.length).map(i => md5Sign(j, i) * v(i)).sum))
    }.toMap
    val vmap = q.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val ids = q.map(_._1)
    val expected = (0L until nq.toLong).map { qid =>
      def topk(space: Map[Long, Array[Long]]): Set[Long] =
        ids.filter(_ != qid)
          .map(id => (id, cos(space(qid), space(id))))
          .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
      val hit = (topk(vmap) intersect topk(proj)).size.toLong
      qid -> hit
    }.toMap
    val out = graft.ops.Similarity.rpRecall(spark, sf0001).collect()
    assert(out.length == nq)
    out.foreach { r =>
      val qid = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("n_true") == k.toLong)
      assert(r.getAs[Long]("n_hit") == expected(qid), s"query $qid")
      assert(r.getAs[Long]("recall_permille") == expected(qid) * 1000L / k)
    }
    // the projection must beat chance with margin. The synthetic
    // embeddings are near-isotropic noise (the measured property that
    // makes LSH non-pruning at q18's threshold), so EVERY 4x tier is
    // weak on them — matryoshka q96 measures 0-200 permille on the same
    // corpus; the honest gate is vs the random baseline k/(N-1), not an
    // absolute bar real clustered embeddings would clear easily
    val mean = out.map(_.getAs[Long]("recall_permille")).sum / out.length
    val baseline = k * 1000L / (embs.length - 1)
    assert(mean >= 3 * baseline,
      s"mean recall $mean permille vs random baseline $baseline — projection uninformative")
  }

  test("q125: the sign matrix is balanced and data-independent") {
    val signs = for (j <- 0 until graft.ops.Similarity.RpDims;
                     i <- 0 until graft.ops.Similarity.EmbDims)
      yield graft.ops.Similarity.rpSign(j, i)
    assert(signs.forall(s => s == 1L || s == -1L))
    val plus = signs.count(_ == 1L)
    // hash parity: both signs well represented (balance within 3 sigma
    // of a fair coin over 1024 draws)
    assert(math.abs(plus - signs.length / 2) < 3 * math.sqrt(signs.length / 4.0),
      s"$plus of ${signs.length} positive")
    // data-independence is constructional: the entry depends only on
    // (j, i) — re-evaluation is bit-identical
    assert(signs == (for (j <- 0 until graft.ops.Similarity.RpDims;
                          i <- 0 until graft.ops.Similarity.EmbDims)
      yield graft.ops.Similarity.rpSign(j, i)))
  }

  // ---------------------------------------------------------------- q126

  test("q126: source drift matches an independent JVM reference and a skewed probe is detected") {
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    val stf = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (s, t) =>
      t.foreach(w => stf((s, w)) = stf.getOrElse((s, w), 0L) + 1L)
    }
    val cf = stf.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val nSrc = stf.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val nTotal = cf.values.sum
    val expected = stf.groupBy(_._1._1).map { case (s, m) =>
      val driftSum = m.map { case ((_, w), c) =>
        c * ((bitlen(nTotal) - bitlen(cf(w))) - (bitlen(nSrc(s)) - bitlen(c)))
      }.sum
      s -> ((nSrc(s), m.size.toLong, driftSum, driftSum * 1000L / nSrc(s)))
    }
    val out = graft.ops.TextAnalytics.sourceDrift(spark, sf0001).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val e = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_tokens") == e._1)
      assert(r.getAs[Long]("n_types") == e._2)
      assert(r.getAs[Long]("drift_sum") == e._3, r.getAs[String]("source"))
      assert(r.getAs[Long]("drift_mean_milli") == e._4)
    }
    // quantization honesty: the floor-log2 gap is within +-1 bit per
    // term of exact KL, which is >= 0 — so mean drift can dip slightly
    // negative but never below -2000 milli-bits
    assert(out.forall(r => r.getAs[Long]("drift_mean_milli") > -2000L))
  }

  test("q126: a divergent source stands out against same-distribution sources") {
    // planted corpus through the same operator path is not reachable
    // (the operator reads sfDir), so the detection property is pinned on
    // the reference arithmetic: a source drawing from a disjoint
    // vocabulary scores strictly higher drift than one drawing from the
    // corpus-typical distribution
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    def drift(sources: Map[String, Seq[String]]): Map[String, Double] = {
      val stf = sources.toSeq.flatMap { case (s, ws) =>
        ws.groupBy(identity).map { case (w, g) => (s, w, g.size.toLong) }
      }
      val cf = stf.groupBy(_._2).map { case (w, rs) => w -> rs.map(_._3).sum }
      val nTotal = cf.values.sum
      sources.map { case (s, ws) =>
        val mine = stf.filter(_._1 == s)
        val nS = ws.length.toLong
        val d = mine.map { case (_, w, c) =>
          c * ((bitlen(nTotal) - bitlen(cf(w))) - (bitlen(nS) - bitlen(c)))
        }.sum
        s -> d.toDouble / nS
      }
    }
    val typical = Seq.fill(40)(Seq("the", "data", "spark", "join")).flatten
    val d = drift(Map(
      "web_a" -> typical, "web_b" -> typical,
      "medical" -> Seq.fill(40)(Seq("dosage", "hepatic", "lesion", "biopsy")).flatten))
    // a full bit of mean divergence separates the disjoint-vocabulary
    // source; the same-distribution sources sit at exactly zero
    assert(d("medical") >= d("web_a") + 1.0,
      s"divergent source not separated: $d")
    assert(d("web_a") == 0.0 && d("web_b") == 0.0, d.toString)
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
