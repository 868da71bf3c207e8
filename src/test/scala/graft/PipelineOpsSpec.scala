package graft

import graft.core.{Consts, Tables}
import graft.ops.{Dedup, Events, Similarity, TextAnalytics}
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Specs for the round-4 pipeline additions: duplicated-span detection,
  * SemDeDup, hard-negative mining, PII redaction, tf-idf keywords, and
  * the native session_window streaming replay. */
class PipelineOpsSpec extends SparkSpec {

  // ---------------------------------------------------------------- q65

  test("dupSpans: span counts reconcile with token counts, ratios bounded") {
    val spans = Dedup.dupSpans(spark, sf0001).cache()
    val docs = Tables.documents(spark, sf0001)
    assert(spans.count() == docs.count())
    assert(spans.filter(col("n_dup_spans") > col("n_spans")).count() == 0)
    assert(spans.filter(col("dup_span_ratio") < 0 || col("dup_span_ratio") > 1).count() == 0)
    // n_spans is exactly max(n_tokens - (N-1), 0)
    val toks = TextAnalytics.tokenStats(spark, sf0001).select("doc_id", "n_tokens")
    val bad = spans.join(toks, "doc_id")
      .filter(col("n_spans") =!=
        greatest(col("n_tokens") - (Dedup.DupSpanN - 1), lit(0L)))
    assert(bad.count() == 0)
    spans.unpersist()
  }

  test("dupSpans probe: planted copies are fully duplicated, unique doc is clean") {
    import spark.implicits._
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val probe = Seq(
      (1L, "web", body),
      (2L, "web", body), // exact copy: every 5-gram span is cross-doc duplicated
      (3L, "web", "one two three four five six seven eight nine ten"),
      (4L, "web", "too short")) // < 5 tokens: zero spans
      .toDF("doc_id", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("dupspan_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.dupSpans(spark, tmp.toString).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_spans") == 6L)
    assert(rows(1L).getAs[Double]("dup_span_ratio") == 1.0)
    assert(rows(2L).getAs[Double]("dup_span_ratio") == 1.0)
    assert(rows(3L).getAs[Long]("n_dup_spans") == 0L)
    assert(rows(4L).getAs[Long]("n_spans") == 0L)
    assert(rows(4L).getAs[Double]("dup_span_ratio") == 0.0)
  }

  // ---------------------------------------------------------------- q66

  /** In-memory reference for the quantized integer vectors. */
  private def quantizedVecs(): Array[(Long, Array[Long], Int)] =
    Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding", "label").collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong).toArray
        (r.getLong(0), v, r.getInt(2))
      }
      .sortBy(_._1)

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var d = 0L; var na = 0L; var nb = 0L
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  test("semanticDedup equals an in-memory SemDeDup reference") {
    val vecs = quantizedVecs()
    val cents = vecs.filter(_._1 < Similarity.NCentroids)
    // nearest centroid, ties to the lower cid (same order as the op)
    def assign(v: Array[Long]): Long =
      cents.map { case (cid, cv, _) => (cid, cos(cv, v)) }
        .sortBy { case (cid, s) => (-s, cid) }.head._1
    val clusters = vecs.map { case (id, v, _) => (id, assign(v), v) }
    val byCluster = clusters.groupBy(_._2)
    val expected = clusters.map { case (id, cid, v) =>
      val nd = byCluster(cid).count { case (oid, _, ov) =>
        oid < id && cos(ov, v) >= Consts.CosineNearDupThreshold }
      (id, cid, nd.toLong, nd > 0)
    }.sortBy(_._1)
    val got = Similarity.semanticDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"got $g expected $e") }
    // the clustering must actually spread the corpus (not one mega-cluster)
    assert(byCluster.size > 1)
  }

  test("semanticDedup tiled equals the row-join baseline at two SFs") {
    for (sf <- Seq(sf0001, sf001)) {
      val tiled = Similarity.semanticDedup(spark, sf)
      val pair = Similarity.semanticDedupPairwise(spark, sf)
      assert(tiled.exceptAll(pair).count() == 0, s"tiled-only rows at $sf")
      assert(pair.exceptAll(tiled).count() == 0, s"pairwise-only rows at $sf")
    }
  }

  // ---------------------------------------------------------------- q67

  test("hardNegatives equals a label-filtered brute-force reference") {
    val vecs = quantizedVecs()
    val labels = vecs.map { case (id, _, l) => id -> l }.toMap
    val expected = vecs.filter(_._1 < Consts.KnnQueries).flatMap { case (qid, qv, ql) =>
      vecs.filter { case (oid, _, ol) => ol != ql }
        .map { case (oid, ov, ol) => (oid, ol, cos(qv, ov)) }
        .sortBy { case (oid, _, s) => (-s, oid) }
        .take(Consts.KnnK)
        .zipWithIndex
        .map { case ((oid, ol, s), i) => (qid, oid, ol, i + 1L) }
    }.sortBy(t => (t._1, t._4))
    val got = Similarity.hardNegatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == (e._1, e._2, e._3, e._4), s"got $g expected $e") }
    // no neighbor shares its query's label
    got.foreach { case (qid, _, nl, _) => assert(nl != labels(qid)) }
  }

  // ---------------------------------------------------------------- q68

  test("piiRedact: replacement extents match the JVM regex reference") {
    import spark.implicits._
    val texts = Seq(
      (1L, "web", "contact: alice@example.com or bob.smith@test.org; " +
        "call +1-555-123-4567 maybe; server at 10.0.0.1 and 192.168.1.100"),
      (2L, "web", "no sensitive content in this one at all"))
    val tmp = java.nio.file.Files.createTempDirectory("redact_probe")
    texts.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextAnalytics.piiRedact(spark, tmp.toString).collect()
      .map(r => r.getLong(0) -> r).toMap
    // independent reference: same patterns, same pass order, JVM regex
    def redact(s: String): String = s
      .replaceAll(TextAnalytics.PiiEmailRe, "<EMAIL>")
      .replaceAll(TextAnalytics.PiiPhoneRe, "<PHONE>")
      .replaceAll(TextAnalytics.PiiIpRe, "<IP>")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    texts.foreach { case (id, _, t) =>
      val exp = redact(t)
      assert(rows(id).getAs[String]("redacted_hash") == md5hex(exp))
      assert(rows(id).getAs[Long]("redacted_len") == exp.length.toLong)
    }
    assert(rows(1L).getAs[Long]("n_pii_matches") == 5L)
    assert(rows(2L).getAs[Long]("n_pii_matches") == 0L)
    assert(rows(1L).getAs[String]("redacted_hash") !=
      rows(2L).getAs[String]("redacted_hash"))
  }

  // ---------------------------------------------------------------- q69

  test("tfidf keywords come from their document with dense ranks and exact scores") {
    val kw = TextAnalytics.tfidfKeywords(spark, sf0001).cache()
    assert(kw.filter(col("rk") < 1 || col("rk") > TextAnalytics.TfidfTopK).count() == 0)
    // integer score definition holds row by row
    assert(kw.filter(col("score") =!= expr("(tf * 1000000) div df")).count() == 0)
    // every keyword occurs in its own document exactly tf times
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(TextAnalytics.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
    val bad = kw.join(toks, Seq("doc_id", "tok"), "left")
      .filter(col("n").isNull || col("n") =!= col("tf"))
    assert(bad.count() == 0)
    // ranks are dense per doc: k rows have ranks 1..k
    val dense = kw.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), max(col("rk")).as("mx"))
      .filter(col("mx") =!= col("k"))
    assert(dense.count() == 0)
    kw.unpersist()
  }

  test("tfidf contiguous top-k equals the windowed formulation") {
    // pins the doc-contiguity contract the mapPartitions top-k relies on
    assert(TextAnalytics.tfidfKeywords(spark, sf0001).collect().map(_.toString).toSeq ==
      TextAnalytics.tfidfKeywordsWindowed(spark, sf0001).collect().map(_.toString).toSeq)
  }

  // ---------------------------------------------------------------- q71

  test("importanceWeights: scores bounded, feature counts reconcile, target lang wins") {
    val w = graft.ops.Sampling.importanceWeights(spark, sf0001).cache()
    // per-feature score is in (0, 1e6]: cnt_t <= cnt_all
    assert(w.filter(col("mean_score") < 0 || col("mean_score") > 1000000L).count() == 0)
    // n_feats = max(n_tokens - 1, 0) (word bigrams)
    val toks = TextAnalytics.tokenStats(spark, sf0001).select("doc_id", "n_tokens")
    assert(w.join(toks, "doc_id")
      .filter(col("n_feats") =!= greatest(col("n_tokens") - 1, lit(0L)))
      .count() == 0)
    // documents of the target language score higher on average than a
    // non-target language (the whole point of importance weighting)
    val byLang = w.join(Tables.documents(spark, sf0001).select("doc_id", "lang"), "doc_id")
      .filter(col("n_feats") > 0)
      .groupBy("lang").agg(avg(col("mean_score")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byLang(graft.ops.Sampling.DsirTargetLang) > byLang("zh"),
      s"target-language docs must outweigh non-target: $byLang")
    w.unpersist()
  }

  // ---------------------------------------------------------------- q72

  test("sourceOverlap equals an in-memory set reference") {
    val got = Dedup.sourceOverlap(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // independent reference over the same shingle definition
    val sets = Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (src, rs) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        src -> rs.flatMap { r =>
          val t = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
          if (t.length < 3) Seq.empty[Long]
          else (0 to t.length - 3).map { i =>
            val d = md.digest(s"${t(i)} ${t(i + 1)} ${t(i + 2)}"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          }
        }.toSet
      }
    val srcs = sets.keys.toSeq.sorted
    for (a <- srcs; b <- srcs if a < b) {
      val shared = (sets(a) & sets(b)).size.toLong
      if (shared > 0)
        assert(got((a, b)) == shared, s"pair ($a,$b): got ${got.get((a, b))}, expected $shared")
      else assert(!got.contains((a, b)))
    }
  }

  // ---------------------------------------------------------------- q73

  test("kmeansIter: memberships conserve the corpus and centroids match a reference") {
    val vecs = quantizedVecs()
    val got = Similarity.kmeansIter(spark, sf0001).collect()
    val n = vecs.length.toLong
    assert(got.map(_.getAs[Long]("n_before")).sum == n)
    assert(got.map(_.getAs[Long]("n_after")).sum == n)
    assert(got.length == Similarity.NCentroids)
    // reference: assign -> integer-mean centroids -> md5
    val cents = vecs.filter(_._1 < Similarity.NCentroids)
    def assign(v: Array[Long], cs: Array[(Long, Array[Long])]): Long =
      cs.map { case (cid, cv) => (cid, cos(cv, v)) }
        .sortBy { case (cid, s) => (-s, cid) }.head._1
    val c0 = cents.map { case (id, v, _) => (id, v) }
    val members = vecs.groupBy { case (_, v, _) => assign(v, c0) }
    val expected = members.map { case (cid, ms) =>
      val dim = ms.head._2.length
      val cv = Array.tabulate(dim) { d =>
        val sx = ms.map(_._2(d)).sum
        sx / ms.length // JVM integer division truncates like Spark div
      }
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(cv.mkString(",").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      cid -> hex
    }
    got.foreach { r =>
      assert(r.getAs[String]("centroid_hash") == expected(r.getAs[Long]("cid")))
    }
  }

  // ---------------------------------------------------------------- q74

  test("dedupSurvivors equals a union-find reference over exact + LSH edges") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // union-find over exact-hash groups and the q14 pair relation
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    docs.groupBy(_._3).values.foreach { g =>
      val ids = g.map(_._1).sorted; ids.tail.foreach(union(ids.head, _)) }
    Dedup.minhashLshPairs(spark, sf0001).select("doc_a", "doc_b").collect()
      .foreach(r => union(r.getLong(0), r.getLong(1)))
    def tokens(t: String) = t.trim.split("\\s+").count(_.nonEmpty).toLong
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val kept = ds.filter(d => find(d._1) == d._1)
      src -> ((src, ds.length.toLong, kept.length.toLong,
        kept.map(d => tokens(d._3)).sum,
        ds.filterNot(d => find(d._1) == d._1).map(d => tokens(d._3)).sum))
    }
    val got = Dedup.dedupSurvivors(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == expected.size)
    got.foreach { g => assert(g == expected(g._1), s"got $g expected ${expected(g._1)}") }
  }

  // ---------------------------------------------------------------- q75

  test("normalizedDedup probe: trivial variants collapse, distinct text does not") {
    import spark.implicits._
    val probe = Seq(
      (1L, "web", "Hello, World!"),
      (2L, "web", "hello world"),
      (3L, "web", "HELLO   world"),
      (4L, "web", "something else entirely"),
      (5L, "web", "hello world")) // raw duplicate of 2
      .toDF("doc_id", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("norm_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Dedup.normalizedDedup(spark, tmp.toString).collect()
    assert(rows.length == 1, s"expected one collision group, got ${rows.toSeq}")
    val g = rows.head
    assert(g.getAs[Long]("n_docs") == 4L)      // docs 1, 2, 3, 5
    assert(g.getAs[Long]("n_variants") == 3L)  // three raw spellings
    assert(g.getAs[Long]("keep_doc_id") == 1L)
  }

  // ---------------------------------------------------------------- q76

  test("forestRecall equals a hand-computed RP-forest reference") {
    val vecs = quantizedVecs()
    val byId = vecs.map(v => v._1 -> v._2).toMap
    def leaf(v: Array[Long], planes: Seq[Seq[Long]]): Long =
      planes.zipWithIndex.map { case (p, lvl) =>
        var d = 0L; var i = 0
        while (i < v.length) { d += v(i) * p(i); i += 1 }
        if (d >= 0) 1L << lvl else 0L
      }.sum
    val leaves = vecs.flatMap { case (id, v, _) =>
      Consts.ForestPlanes.zipWithIndex.map { case (tp, t) => (id, t, leaf(v, tp)) } }
    val expected = vecs.filter(_._1 < Consts.KnnQueries).map { case (qid, qv, _) =>
      val qls = leaves.filter(_._1 == qid).map(l => (l._2, l._3)).toSet
      val cands = leaves.filter(l => l._1 != qid && qls.contains((l._2, l._3))).map(_._1).distinct
      val truth = vecs.filter(_._1 != qid).map { case (oid, ov, _) => (oid, cos(qv, ov)) }
        .sortBy { case (oid, s) => (-s, oid) }.take(Consts.KnnK).map(_._1).toSet
      val approx = cands.map(oid => (oid, cos(qv, byId(oid))))
        .sortBy { case (oid, s) => (-s, oid) }.take(Consts.KnnK).map(_._1).toSet
      val nHit = truth.intersect(approx).size.toLong
      (qid, truth.size.toLong, nHit, nHit * 1000L / truth.size)
    }.sortBy(_._1)
    val got = Similarity.forestRecall(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    // the forest is a live index, not a degenerate empty-candidate report
    assert(got.map(_._3).sum > 0, s"forest retrieved nothing: ${got.mkString(",")}")
  }

  test("annRecall equals hand-computed intersection of IVF and brute-force") {
    val truth = Similarity.knnBruteForce(spark, sf0001)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfKnn(spark, sf0001)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.annRecall(spark, sf0001).collect()
    assert(got.length == Consts.KnnQueries)
    got.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val nTrue = truth.count(_._1 == q).toLong
      val nHit = truth.count(p => p._1 == q && approx(p)).toLong
      assert(r.getAs[Long]("n_true") == nTrue)
      assert(r.getAs[Long]("n_hit") == nHit)
      assert(r.getAs[Long]("recall_permille") == nHit * 1000 / nTrue)
    }
  }

  // ---------------------------------------------------------------- q77

  test("mixtureWeights: sqrt temperature flattens shares, permilles consistent") {
    val rows = graft.ops.Sampling.mixtureWeights(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("weight") == math.floor(math.sqrt(n.toDouble) * 1e6).toLong)
    }
    // permille shares each sum to ~1000 (integer division loses < #sources)
    val rawSum = rows.map(_.getAs[Long]("raw_permille")).sum
    val smpSum = rows.map(_.getAs[Long]("sampled_permille")).sum
    assert(rawSum > 1000 - rows.length && rawSum <= 1000)
    assert(smpSum > 1000 - rows.length && smpSum <= 1000)
    // temperature scaling: the largest source's share shrinks, smallest grows
    val byRaw = rows.sortBy(_.getAs[Long]("raw_permille"))
    assert(byRaw.last.getAs[Long]("sampled_permille") <= byRaw.last.getAs[Long]("raw_permille"))
    assert(byRaw.head.getAs[Long]("sampled_permille") >= byRaw.head.getAs[Long]("raw_permille"))
  }

  // ---------------------------------------------------------------- q78

  test("lengthHistogram: buckets are log2-consistent and partition the corpus") {
    val rows = TextAnalytics.lengthHistogram(spark, sf0001).collect()
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val lo = r.getAs[Long]("min_tokens"); val hi = r.getAs[Long]("max_tokens")
      assert(lo <= hi)
      // bucket b holds counts with bit length b: [2^(b-1), 2^b)
      assert(lo >= (1L << (b - 1).toInt) || b == 1)
      assert(hi < (1L << b.toInt))
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf0001).count())
  }

  // ---------------------------------------------------------------- q79

  test("filterFunnel: stage counts are monotone and match per-doc recompute") {
    val rows = TextAnalytics.filterFunnel(spark, sf0001).collect()
    rows.foreach { r =>
      val passes = Seq("pass_length", "pass_unique", "pass_stopword",
        "pass_dedup", "pass_repetition").map(r.getAs[Long])
      assert(r.getAs[Long]("n_docs") >= passes.head)
      passes.sliding(2).foreach { case Seq(a, b) => assert(a >= b) }
    }
    // the cascade must actually discriminate at this SF
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val kept = rows.map(_.getAs[Long]("pass_repetition")).sum
    assert(kept > 0 && kept < total)
  }

  test("filterFunnel probe: each stage drops its designed offender") {
    import spark.implicits._
    val stops = "the a of and to in is"
    val natural = ("the quick brown fox jumps over a lazy dog and then " +
      "runs far away to find some more interesting words in this world").trim
    val probe = Seq(
      (1L, "web", natural),                                   // passes all
      (2L, "web", "too short"),                               // fails length
      (3L, "web", ("the " * 30).trim),                        // fails unique ratio
      (4L, "web", (1 to 30).map(i => s"w$i").mkString(" ")),  // fails stopword
      (5L, "web", natural),                                   // fails dedup (copy of 1)
      (6L, "web", (stops + " unique1 unique2 unique3 unique4 unique5 unique6 " +
        "unique7 unique8 unique9 " + ("zz " * 12)).trim))     // fails top-token cap
      .toDF("doc_id", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("funnel_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextAnalytics.filterFunnel(spark, tmp.toString).collect().head
    assert(r.getAs[Long]("n_docs") == 6L)
    assert(r.getAs[Long]("pass_length") == 5L)     // doc 2 out
    assert(r.getAs[Long]("pass_unique") == 4L)     // doc 3 out
    assert(r.getAs[Long]("pass_stopword") == 3L)   // doc 4 out
    assert(r.getAs[Long]("pass_dedup") == 2L)      // doc 5 out
    assert(r.getAs[Long]("pass_repetition") == 1L) // doc 6 out
  }

  // ---------------------------------------------------------------- q70

  test("session_window streaming replay equals batch sessionize") {
    val streamed = EventStream.sessionWindowStream(spark, sf0001).collect()
    val batch = Events.sessionize(spark, sf0001).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s == b, s"stream row $s != batch row $b") }
  }

  // ---------------------------------------------------------------- q83

  test("containment pairs: asymmetric subset signal bounded by the shingle sets") {
    val pairs = Dedup.containmentPairs(spark, sf0001).collect()
    assert(pairs.nonEmpty, "the planted near-dup pair must surface")
    // containment dominates jaccard for the same pair: |A∩B|/min >= |A∩B|/|A∪B|
    val jac = Dedup.jaccardPairs(spark, sf0001)
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    pairs.foreach { r =>
      val key = (r.getLong(1), r.getLong(2))
      assert(r.getDouble(4) >= graft.core.Consts.ContainmentThreshold)
      jac.get(key).foreach(j => assert(r.getDouble(4) >= j, s"$key: containment < jaccard"))
    }
  }

  // ---------------------------------------------------------------- q84

  test("perceptron step equals a JVM reference (weights, scores, predictions)") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val nb = graft.ops.Classifier.PerceptronBuckets.toInt
    def feats(txt: String): Array[Long] = {
      val c = new Array[Long](nb)
      txt.trim.split("\\s+").foreach { t =>
        if (t.nonEmpty) {
          val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val hv = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          c((hv % nb).toInt) += 1L
        }
      }
      c
    }
    val target = graft.ops.Classifier.PerceptronTargetLang
    val w = new Array[Long](nb)
    docs.foreach { case (_, lang, txt) =>
      if (lang == target) { val x = feats(txt); var b = 0; while (b < nb) { w(b) += x(b); b += 1 } }
    }
    val expected = docs.map { case (id, lang, txt) =>
      val x = feats(txt)
      val s = x.zip(w).map { case (a, b) => a * b }.sum
      val label = if (lang == target) 1L else -1L
      (id, label, s, if (s > 0) 1L else -1L)
    }
    val got = graft.ops.Classifier.perceptronStep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
  }

  // ---------------------------------------------------------------- q85

  test("bm25: top-k is ordered, bounded, and every hit contains a query term") {
    val hits = TextAnalytics.bm25Search(spark, sf0001).collect()
    assert(hits.nonEmpty && hits.length <= TextAnalytics.Bm25TopK)
    // (score desc, doc_id asc) ordering holds
    hits.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) > b.getLong(2) ||
        (a.getLong(2) == b.getLong(2) && a.getLong(0) < b.getLong(0)))
    case _ => ()
    }
    assert(hits.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= TextAnalytics.Bm25Terms.length))
    val texts = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    hits.foreach { r =>
      val toks = texts(r.getLong(0)).trim.split("\\s+").toSet
      assert(TextAnalytics.Bm25Terms.exists(toks.contains), s"doc ${r.getLong(0)} has no query term")
    }
  }

  // ---------------------------------------------------------------- q91

  test("cluster-aware split never tears a near-dup cluster; aggregate matches a union-find reference") {
    // reference components over the SAME edge set (exact md5 + near pairs)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val exactPairs = docs.groupBy(_._2).values.filter(_.length > 1)
      .flatMap(g => g.map(_._1).sorted.sliding(2).map(p => (p(0), p(1))))
    val nearPairs = graft.ops.Dedup.minhashLshPairs(spark, sf0001, graft.ops.Dedup.OracleHashBits)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    (exactPairs ++ nearPairs).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(x: Long): Long = {
      val hex = md.digest(x.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      val h = hex.take(8).map("0123456789abcdef".indexOf(_).toLong)
        .zipWithIndex.map { case (v, j) => v * (1L << (4 * (7 - j))) }.sum
      h % 100L
    }
    def splitOf(b: Long) = if (b < 80) "train" else if (b < 90) "val" else "test"
    val assigned = docs.map(_._1).map { id =>
      val root = find(id)
      (id, root, splitOf(bucket(root)), splitOf(bucket(id)))
    }
    // zero leakage by construction: same cluster => same split
    assigned.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).distinct.length == 1, s"cluster torn: $g")
    }
    // the operator's aggregate equals the reference aggregate
    val expected = assigned.groupBy(_._3).map { case (split, g) =>
      val clusters = g.map(_._2).distinct
      val mixed = clusters.count(r => g.filter(_._2 == r).map(_._4).distinct.length > 1)
      split -> (g.length.toLong, clusters.length.toLong, mixed.toLong)
    }
    val got = graft.ops.Dedup.clusterSplit(spark, sf0001, graft.ops.Dedup.OracleHashBits)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, s"got $got vs $expected")
  }

  // ---------------------------------------------------------- pipeline

  test("curation pipeline: monotone funnel, dup-free output, report reconciles with the files") {
    val out = java.nio.file.Files.createTempDirectory("curation_run").toString
    val report = graft.ops.CurationPipeline.run(spark, sf0001, out).collect()
    assert(report.nonEmpty)
    report.foreach { r =>
      val (n, q, d, w) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= q && q >= d && d >= w, s"stage counts must shrink: $r")
    }
    val written = spark.read.parquet(out)
    assert(written.count() == report.map(_.getLong(4)).sum)
    // no exact duplicates survive
    val texts = written.select("text").collect().map(_.getString(0))
    assert(texts.distinct.length == texts.length, "exact dup in curated output")
    // every written doc passed the quality gates (spot: token length bound)
    val lens = written.select(size(TextAnalytics.tokens(col("text"))).cast("long")).collect().map(_.getLong(0))
    lens.foreach(n => assert(n >= TextAnalytics.FunnelMinTokens && n <= TextAnalytics.FunnelMaxTokens))
  }

  // ---------------------------------------------------------------- sink

  test("curated writer: partition pruning layout, bounded files, doc_id-clustered") {
    val src = Tables.documents(spark, sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("curated_sink").toString
    val nFiles = graft.ops.Sink.writeCurated(src, tmp, maxRecordsPerFile = 20L)
    assert(nFiles > 0)
    // hive layout by lang; full fidelity on read-back
    val langs = new java.io.File(tmp).listFiles().filter(_.isDirectory).map(_.getName)
    assert(langs.nonEmpty && langs.forall(_.startsWith("lang=")), langs.toSeq.toString)
    val back = spark.read.parquet(tmp)
    assert(back.count() == src.count())
    // size bound and per-file doc_id clustering hold for every file
    import org.apache.spark.sql.functions.input_file_name
    val perFile = back.select(input_file_name().as("f"), col("doc_id"))
      .collect().groupBy(_.getString(0)).map { case (_, rs) => rs.map(_.getLong(1)).toSeq }
    perFile.foreach { ids =>
      assert(ids.length <= 20, s"file exceeds bound: ${ids.length}")
      assert(ids == ids.sorted, "doc_id not clustered within file")
    }
    // partition pruning is real: a lang filter reads only its directory
    val pruned = back.filter(col("lang") === "en")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(pruned.nonEmpty && pruned.forall(_.contains("lang=en")))
  }

  // ---------------------------------------------------------------- q88

  test("Misra-Gries merged summary honors the n/m bound under heavy eviction") {
    import spark.implicits._
    // vocabulary (1 hot + 1500 singletons) far exceeds m = 64, so the
    // decrement path runs constantly; the hot token must still surface
    // with count error <= n/m
    val hot = Seq.fill(500)("hot")
    val rare = (0 until 1500).map(i => s"rare$i")
    val words = new scala.util.Random(7).shuffle(hot ++ rare)
    val docs = words.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, "src0", ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("mg_probe")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = 64
    val est = graft.ops.Sketches.mgMerged(spark, tmp.toString, m)
    val n = words.length.toLong
    val exact = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    exact.foreach { case (w, cnt) =>
      val e = est.getOrElse(w, 0L)
      assert(e <= cnt, s"$w overestimated: $e > $cnt")
      assert((cnt - e) * m <= n, s"$w bound violated: exact $cnt est $e n $n m $m")
    }
    assert(est.getOrElse("hot", 0L) > 0L, "the heavy hitter must survive eviction")
  }

  // ---------------------------------------------------------------- q86

  test("funnel stages are strictly ordered and null-monotone") {
    val rows = Events.funnelStages(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "one row per user")
    var reached = (0, 0, 0)
    rows.foreach { r =>
      val v = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val c = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val p = if (r.isNullAt(3)) None else Some(r.getLong(3))
      // a stage only exists if the previous one does, strictly later
      if (v.isEmpty) assert(c.isEmpty)
      if (c.isEmpty) assert(p.isEmpty)
      for (vv <- v; cc <- c) assert(cc > vv)
      for (cc <- c; pp <- p) assert(pp > cc)
      reached = (reached._1 + v.size, reached._2 + c.size, reached._3 + p.size)
    }
    assert(reached._1 >= reached._2 && reached._2 >= reached._3)
    assert(reached._3 > 0, "some user completes the funnel at sf0.001")
  }

  // ---------------------------------------------------------------- q87

  test("prototype scores: cluster geometry matches q66, prune cut is ceil(10%)") {
    val proto = Similarity.prototypeScores(spark, sf0001).collect()
    // same coarse quantizer as SemDeDup — assignments must agree 1:1
    val semCid = Similarity.semanticDedup(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    proto.foreach(r => assert(semCid(r.getLong(0)) == r.getLong(1)))
    // per cluster: ranks dense from 1, prune flags = ceil(n/10), and
    // sims non-increasing in rank
    proto.groupBy(_.getLong(1)).foreach { case (cid, rs) =>
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to rs.length).toSeq, s"cid $cid")
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(2) >= b.getDouble(2))
        case _ => ()
      }
      val expectedPruned = (rs.length + 9) / 10
      assert(rs.count(_.getBoolean(4)) == expectedPruned, s"cid $cid prune count")
    }
  }

  // ---------------------------------------------------------------- q92

  test("gopher gate equals a JVM rule reference") {
    val got = TextAnalytics.gopherGate(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got.length == docs.length && got.nonEmpty)
    val stops = Consts.Stopwords.toSet
    got.zip(docs).foreach { case (row, (id, _, text)) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty)
      val n = t.length.toLong
      val charSum = t.map(_.length.toLong).sum
      val alpha = t.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val stop = t.count(stops).toLong
      val meanC = charSum * 100 / n
      val alphaPm = alpha * 1000 / n
      val rWords = n >= TextAnalytics.GopherMinWords && n <= TextAnalytics.GopherMaxWords
      val rWlen = meanC >= TextAnalytics.GopherMinMeanWlenC && meanC <= TextAnalytics.GopherMaxMeanWlenC
      val rAlpha = alphaPm >= TextAnalytics.GopherMinAlphaPermille
      val rStop = stop >= TextAnalytics.GopherMinStopHits
      assert(row.getLong(0) == id)
      assert(row.getLong(2) == n, s"doc $id n_words")
      assert(row.getLong(3) == meanC, s"doc $id mean_wlen_c")
      assert(row.getLong(4) == alphaPm, s"doc $id alpha_permille")
      assert(row.getLong(5) == stop, s"doc $id stop_hits")
      assert(row.getBoolean(6) == rWords && row.getBoolean(7) == rWlen &&
        row.getBoolean(8) == rAlpha && row.getBoolean(9) == rStop, s"doc $id rules")
      assert(row.getBoolean(10) == (rWords && rWlen && rAlpha && rStop), s"doc $id keep")
    }
    // the gate discriminates on this corpus (not vacuously all-pass/all-fail)
    val keeps = got.count(_.getBoolean(10))
    assert(keeps > 0 && keeps < got.length)
  }

  test("gopher gate and span corruption probe: empty and whitespace-only docs get definite zero verdicts, not NULLs or dropped rows") {
    import spark.implicits._
    val probe = Seq(
      (1L, ""),
      (2L, "   \t  "),
      (3L, "the quick brown fox a the and jumps over the lazy dog again"))
      .map { case (id, txt) => (id, txt, "en", "probe", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("empty_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val gate = TextAnalytics.gopherGate(spark, tmp.toString).collect()
    assert(gate.length == 3)
    gate.filter(_.getLong(2) == 0L).foreach { r =>
      assert(!r.isNullAt(3) && r.getLong(3) == 0L, s"mean_wlen_c NULL/junk: $r")
      assert(!r.isNullAt(4) && r.getLong(4) == 0L, s"alpha_permille NULL/junk: $r")
      assert(!r.isNullAt(10) && !r.getBoolean(10), s"empty doc must be a definite reject: $r")
    }
    val sc = TextAnalytics.spanCorruption(spark, tmp.toString).collect()
    assert(sc.length == 3, "zero-token docs must not vanish from the corruption output")
    sc.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L &&
        r.getString(4) == "" && r.getString(5) == "", s"empty doc row: $r")
    }
  }

  // ---------------------------------------------------------------- q93

  test("pagerank iteration equals an in-memory graph reference; run(1) agrees; mass is conserved under iteration") {
    val pairs = Dedup.minhashLshPairs(spark, sf0001, Dedup.OracleHashBits)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val inSum = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val inDeg = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.foreach { case (u, v) =>
      inSum(v) += Dedup.PagerankUnit / deg(u); inDeg(v) += 1L
    }
    val got = Dedup.pagerankIter(spark, sf0001, Dedup.OracleHashBits).collect()
    assert(got.map(_.getLong(0)).toSet == deg.keySet)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == inDeg(id), s"doc $id deg")
      assert(r.getLong(2) == inSum(id), s"doc $id in_sum")
      assert(r.getLong(3) == Dedup.PagerankBase + (85L * inSum(id)) / 100L, s"doc $id rank_u")
    }
    // run(1) is the same step from the uniform start
    val run1 = Dedup.pagerankRun(spark, sf0001, 1, Dedup.OracleHashBits).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(run1(r.getLong(0)) == r.getLong(3), s"run(1) vs iter ${r.getLong(0)}"))
    // after more iterations: every rank >= damped base, and total mass
    // never exceeds the initial n*unit (floor division only loses mass)
    val run5 = Dedup.pagerankRun(spark, sf0001, 5, Dedup.OracleHashBits).collect()
    assert(run5.length == deg.size)
    assert(run5.forall(_.getLong(1) >= Dedup.PagerankBase))
    assert(run5.map(_.getLong(1)).sum <= deg.size * Dedup.PagerankUnit)
  }

  test("pagerank probe: a symmetric near-dup pair sits at the unit fixpoint; a 3-chain centers its mass") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    // chain: ends are near-dups of the middle but not of each other
    val mid = a
    val left = (a.split(" ").dropRight(1) :+ "OMEGA").mkString(" ")
    val right = ("PSI" +: a.split(" ").drop(1)).mkString(" ")
    val pairDoc = "one two three four five six seven eight nine ten eleven twelve"
    val probe = Seq(
      (1L, left), (2L, mid), (3L, right),     // chain 1-2-3
      (10L, pairDoc), (11L, pairDoc))         // exact pair (jaccard 1)
      .map { case (id, txt) => (id, txt, "en", "web", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("pagerank_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.minhashLshPairs(spark, tmp.toString)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(pairs.contains((10L, 11L)) && pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    val ranks = Dedup.pagerankRun(spark, tmp.toString, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the isolated pair: each node's full rank flows to the other and
    // back — the damped fixpoint IS the unit (floor losses only)
    assert(ranks(10L) == ranks(11L))
    assert(ranks(10L) > Dedup.PagerankUnit - 100 && ranks(10L) <= Dedup.PagerankUnit,
      s"pair fixpoint drifted: ${ranks(10L)}")
    // the chain: the middle node (two in-edges) outranks the ends
    if (!pairs.contains((1L, 3L))) {
      assert(ranks(2L) > ranks(1L) && ranks(2L) > ranks(3L),
        s"hub must outrank spokes: $ranks")
    }
    graft.ops.Materialize.release(spark)
  }

  // ---------------------------------------------------------------- q94

  test("surprisal equals a JVM unigram-LM reference and tracks -log2 p within 1 bit") {
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val tfs = docs.map { case (id, text) =>
      id -> text.trim.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    }
    val cf = tfs.flatMap(_._2).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val n = cf.values.sum
    val got = TextAnalytics.surprisalScores(spark, sf0001).collect()
    assert(got.length == docs.length)
    got.zip(tfs).foreach { case (row, (id, tf)) =>
      val nTok = tf.values.sum
      val sSum = tf.map { case (tok, c) => c * (bitlen(n) - bitlen(cf(tok))) }.sum
      assert(row.getLong(0) == id)
      assert(row.getLong(1) == nTok, s"doc $id n_tokens")
      assert(row.getLong(2) == sSum, s"doc $id surprisal_sum")
      assert(row.getLong(3) == sSum * 1000 / nTok, s"doc $id mean_milli")
    }
    // the bit-length gap is floor(log2 N) - floor(log2 cf): strictly
    // within 1 bit of the true -log2 p(tok)
    cf.foreach { case (tok, c) =>
      val s = bitlen(n) - bitlen(c)
      val trueBits = math.log(n.toDouble / c.toDouble) / math.log(2.0)
      assert(math.abs(s - trueBits) < 1.0 + 1e-9, s"token $tok: $s vs $trueBits")
    }
  }

  // ---------------------------------------------------------------- q96

  test("matryoshka recall equals a JVM prefix-metric reference") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1e6).toLong)
    }
    def cos(a: Array[Long], b: Array[Long], d: Int): Double = {
      var dot = 0L; var na = 0L; var nb = 0L
      for (i <- 0 until d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val dims = q.head._2.length
    def topk(qid: Long, qv: Array[Long], d: Int): Seq[Long] =
      q.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v, d)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(Consts.KnnK).map(_._1)
    val expected = q.filter(_._1 < Consts.KnnQueries).map { case (qid, qv) =>
      val full = topk(qid, qv, dims).toSet
      val trunc = topk(qid, qv, Similarity.MatryoshkaDims).toSet
      qid -> (full & trunc).size.toLong
    }.toMap
    val got = Similarity.matryoshkaRecall(spark, sf0001).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == Consts.KnnK.toLong)
      assert(r.getLong(2) == expected(id), s"query $id overlap")
      assert(r.getLong(3) == expected(id) * 1000 / Consts.KnnK, s"query $id permille")
    }
    // the truncated metric must be informative on this corpus: strictly
    // better than disjoint, strictly lossier than identical on average
    val mean = got.map(_.getLong(3)).sum / got.length
    assert(mean > 0 && mean < 1000, s"degenerate mean recall $mean")
  }

  // ---------------------------------------------------------------- q97

  test("span corruption round-trips: substituting each sentinel's target span into the input reconstructs the document") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalytics.spanCorruption(spark, sf0001).collect()
    assert(got.length == docs.size)
    val sentinel = "<extra_id_(\\d+)>".r
    var masked = 0L; var total = 0L
    got.foreach { r =>
      val (id, nTok, nMasked, nSpans) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (input, target) = (r.getString(4), r.getString(5))
      // parse target into span_id -> tokens
      val spans = scala.collection.mutable.Map.empty[Int, List[String]]
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach {
        case sentinel(k) => cur = k.toInt; spans(cur) = Nil
        case tok => spans(cur) = spans(cur) :+ tok
      }
      assert(spans.keySet == (0 until nSpans.toInt).toSet, s"doc $id span ids")
      assert(spans.values.map(_.length.toLong).sum == nMasked, s"doc $id masked count")
      // reconstruct
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap {
        case sentinel(k) => spans(k.toInt)
        case tok => Seq(tok)
      }
      val orig = docs(id).trim.split("\\s+").filter(_.nonEmpty)
      assert(rebuilt.toSeq == orig.toSeq, s"doc $id round-trip")
      assert(nTok == orig.length.toLong, s"doc $id n_tokens")
      masked += nMasked; total += nTok
    }
    // hash-mask rate concentrates near 25%
    val rate = masked.toDouble / total.toDouble
    assert(rate > 0.18 && rate < 0.32, s"mask rate $rate")
  }

  // ---------------------------------------------------------------- q99

  test("incremental dedup probe: exact copy dropped, one-token edit dropped as near, novel doc ingested") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val corpusDoc = base.trim
    val nearDoc = (base.trim.split(" ").dropRight(1) :+ "OMEGA").mkString(" ")
    val novel = "one two three four five six seven eight nine ten eleven twelve " * 3
    val probe = Seq(
      (1L, Dedup.IncrementalSource, corpusDoc),           // exact dup of 10
      (2L, Dedup.IncrementalSource, nearDoc),             // near dup of 10
      (3L, Dedup.IncrementalSource, novel.trim),          // novel
      (10L, "corpus", corpusDoc),
      (11L, "corpus", "completely different text " * 10))
      .map { case (id, src, txt) => (id, txt, "en", src, txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("incr_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.incrementalDedup(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getString(3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._1 && got(1L)._3 == "drop_exact", s"exact copy: ${got(1L)}")
    assert(!got(2L)._1 && got(2L)._2 && got(2L)._3 == "drop_near", s"near copy: ${got(2L)}")
    assert(got(3L)._3 == "ingest", s"novel: ${got(3L)}")
    graft.ops.Materialize.release(spark)
  }

  test("streaming admission verdicts equal the batch q99 row for row") {
    val batch = Dedup.incrementalDedup(spark, sf0001, Dedup.OracleHashBits).collect()
    val stream = graft.streaming.DedupStream.admissionStream(spark, sf0001).collect()
    assert(stream.length == batch.length && batch.nonEmpty)
    batch.zip(stream).foreach { case (b, st) =>
      assert(b.getLong(0) == st.getLong(0) && b.getBoolean(1) == st.getBoolean(1) &&
        b.getBoolean(2) == st.getBoolean(2) && b.getString(3) == st.getString(3),
        s"verdict drift: $b vs $st")
    }
  }

  test("index-served admission (q105) equals the in-memory freeze row for row, from a band-partitioned artifact") {
    val batch = Dedup.incrementalDedup(spark, sf0001, Dedup.OracleHashBits).collect()
    val served = Dedup.incrementalDedupFromIndex(spark, sf0001, Dedup.OracleHashBits).collect()
    assert(served.length == batch.length && batch.nonEmpty)
    batch.zip(served).foreach { case (b, s) =>
      assert(b.getLong(0) == s.getLong(0) && b.getBoolean(1) == s.getBoolean(1) &&
        b.getBoolean(2) == s.getBoolean(2) && b.getString(3) == s.getString(3),
        s"artifact round-trip changed a verdict: $b vs $s")
    }
    // the artifact's LSH postings are physically partitioned by band,
    // so each probe join is partition pruning at the scan
    val idxPath = Dedup.preparedDedupIndex(spark, sf0001, Dedup.OracleHashBits)
    val bandDirs = new java.io.File(s"$idxPath/banded").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("band_idx=")).sorted
    assert(bandDirs.toSeq ==
      (0 until graft.core.Consts.LshBands).map(b => s"band_idx=$b"),
      s"banded layout: ${bandDirs.toSeq}")
    graft.ops.Materialize.release(spark)
  }

  test("streaming admission served from the durable artifact equals the frozen-reference stream row for row") {
    val fromFreeze = graft.streaming.DedupStream.admissionStream(spark, sf0001).collect()
    val idx = Dedup.preparedDedupIndex(spark, sf0001, Dedup.OracleHashBits)
    val fromArtifact = graft.streaming.DedupStream
      .admissionStream(spark, sf0001, Some(idx)).collect()
    assert(fromArtifact.length == fromFreeze.length && fromFreeze.nonEmpty)
    fromFreeze.zip(fromArtifact).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getBoolean(1) == b.getBoolean(1) &&
        a.getBoolean(2) == b.getBoolean(2) && a.getString(3) == b.getString(3),
        s"artifact-served stream drifted: $a vs $b")
    }
  }

  test("freeze-side bandCap: oversized buckets leave the probe side, a permissive cap is invisible, exact checks are immune") {
    import org.apache.spark.sql.functions.{col, max}
    val un = Dedup.frozenCorpus(spark, sf0001, Dedup.OracleHashBits)
    val maxB = un.banded.groupBy("band_idx", "band_hash").count()
      .agg(max("count")).head.getLong(0)
    assert(maxB > 1, "fixture must contain at least one multi-doc band bucket")
    // cap at the observed max: nothing exceeds it, so the probe side
    // is row-identical — capped == uncapped when no bucket is hot
    val perm = Dedup.frozenCorpus(spark, sf0001, Dedup.OracleHashBits, Some(maxB.toInt))
    assert(perm.banded.exceptAll(un.banded).count() == 0 &&
      un.banded.exceptAll(perm.banded).count() == 0)
    // cap=1: every surviving bucket is a singleton — the hot-bucket
    // mass is gone from candidate generation entirely
    val tight = Dedup.frozenCorpus(spark, sf0001, Dedup.OracleHashBits, Some(1))
    assert(tight.banded.groupBy("band_idx", "band_hash").count()
      .agg(max("count")).head.getLong(0) == 1)
    val newDocs = Tables.documents(spark, sf0001)
      .filter(col("source") === Dedup.IncrementalSource)
      .select("doc_id", "source", "text")
    val a = Dedup.admissionVerdicts(newDocs, un, Dedup.OracleHashBits)
      .orderBy("doc_id").collect()
    val b = Dedup.admissionVerdicts(newDocs, perm, Dedup.OracleHashBits)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "permissive cap changed a verdict")
    // the exact-hash join is deliberately uncapped: byte-identical
    // incoming docs drop even when EVERY band bucket is suppressed
    val c = Dedup.admissionVerdicts(newDocs, tight, Dedup.OracleHashBits)
      .orderBy("doc_id").collect()
    a.zip(c).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      if (x.getString(3) == "drop_exact")
        assert(y.getString(3) == "drop_exact",
          s"doc ${x.getLong(0)} lost its exact verdict under cap=1")
    }
    graft.ops.Materialize.release(spark)
  }

  test("artifact append lifecycle: admitted docs are visible to the next admission wave") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val corpusDoc = base.trim
    val novel = "one two three four five six seven eight nine ten eleven twelve " * 3
    def docsDf(rows: Seq[(Long, String, String)]) =
      rows.map { case (id, src, txt) => (id, txt, "en", src, txt.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = graft.streaming.StreamScratch.dir("append_probe")
    docsDf(Seq(
      (1L, Dedup.IncrementalSource, corpusDoc),   // wave-1 exact dup
      (3L, Dedup.IncrementalSource, novel.trim),  // wave-1 novel
      (10L, "corpus", corpusDoc),
      (11L, "corpus", "completely different text " * 10)))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val idx = graft.streaming.StreamScratch.dir("append_idx")
    Dedup.saveDedupIndex(spark, tmp.toString, idx)
    val wave1 = Dedup.incrementalDedup(spark, tmp.toString).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(wave1 == Map(1L -> "drop_exact", 3L -> "ingest"), s"wave 1: $wave1")
    // append ONLY the admitted survivor, the documented lifecycle
    Dedup.appendToDedupIndex(spark, idx,
      docsDf(Seq((3L, Dedup.IncrementalSource, novel.trim)))
        .select("doc_id", "source", "text"))
    // wave 2 against the grown artifact: an exact copy and a one-token
    // near-copy of the PREVIOUSLY NOVEL doc must now be dropped, and a
    // genuinely new doc still ingests
    val nearNovel =
      (novel.trim.split(" ").dropRight(1) :+ "OMEGA").mkString(" ")
    val wave2docs = docsDf(Seq(
        (4L, Dedup.IncrementalSource, novel.trim),
        (5L, Dedup.IncrementalSource, nearNovel),
        (6L, Dedup.IncrementalSource, "fresh words never seen before anywhere at all " * 4)))
      .select("doc_id", "source", "text")
    val wave2 = Dedup.admissionFromIndex(spark, idx, wave2docs)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(wave2 == Map(4L -> "drop_exact", 5L -> "drop_near", 6L -> "ingest"),
      s"wave 2: $wave2")
    // append the same survivor AGAIN (idempotent bytes, repeated h),
    // compact to a versioned path: hashes deduplicate, verdicts hold
    Dedup.appendToDedupIndex(spark, idx,
      docsDf(Seq((3L, Dedup.IncrementalSource, novel.trim)))
        .select("doc_id", "source", "text"))
    val h0 = spark.read.parquet(s"$idx/hashes").count()
    val hd = spark.read.parquet(s"$idx/hashes").distinct().count()
    assert(h0 > hd, "double append must leave a repeated hash to compact away")
    val idx2 = graft.streaming.StreamScratch.dir("append_idx_v2")
    Dedup.compactDedupIndex(spark, idx, idx2)
    assert(spark.read.parquet(s"$idx2/hashes").count() == hd)
    val wave2c = Dedup.admissionFromIndex(spark, idx2, wave2docs)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(wave2c == wave2, s"compaction changed verdicts: $wave2c")
    // compaction is where a band-capped artifact re-drops buckets that
    // regrew through uncapped appends: cap=1 leaves only singletons
    val idx3 = graft.streaming.StreamScratch.dir("append_idx_v3")
    Dedup.compactDedupIndex(spark, idx, idx3, bandCap = Some(1))
    import org.apache.spark.sql.functions.{count => fcount, lit => flit, max => fmax}
    assert(spark.read.parquet(s"$idx3/banded")
      .groupBy("band_idx", "band_hash").agg(fcount(flit(1)).as("n"))
      .agg(fmax("n")).head.getLong(0) == 1)
    // and the same-path guard rejects alias spellings, not just equality
    intercept[IllegalArgumentException] {
      Dedup.compactDedupIndex(spark, idx, idx + "/")
    }
    graft.ops.Materialize.release(spark)
  }

  test("incremental dedup near verdicts agree with the corpus-wide LSH pair relation") {
    val verdicts = Dedup.incrementalDedup(spark, sf0001, Dedup.OracleHashBits).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val sources = Tables.documents(spark, sf0001).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val crossNear = Dedup.minhashLshPairs(spark, sf0001, Dedup.OracleHashBits)
      .select("doc_a", "doc_b").collect()
      .flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (sources(a) == Dedup.IncrementalSource, sources(b) == Dedup.IncrementalSource) match {
          case (true, false) => Seq(a)
          case (false, true) => Seq(b)
          case _ => Seq.empty
        }
      }.toSet
    verdicts.foreach { case (id, near) =>
      assert(near == crossNear.contains(id), s"doc $id near verdict vs pair relation")
    }
  }

  // ---------------------------------------------------------------- q103

  test("multi-suite decontamination: any-suite flag equals q62, per-suite counts match a JVM reference") {
    val single = Dedup.decontamination(spark, sf0001, Dedup.OracleHashBits)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    val multi = Dedup.multiDecontamination(spark, sf0001, Dedup.OracleHashBits).collect()
    assert(multi.length == single.size && multi.nonEmpty)
    // JVM reference: per-doc distinct shingle hashes, suite-tagged bench
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    def shingles(text: String): Set[Long] = {
      val t = text.trim.split("\\s+").filter(_.nonEmpty)
      (0 to t.length - 3).map { i =>
        val d = md.digest(s"${t(i)} ${t(i + 1)} ${t(i + 2)}".getBytes("UTF-8"))
        // 32-bit oracle packing: first 4 md5 bytes, unsigned
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }.toSet
    }
    val benchBySuite = docs.filter(_._1 < Dedup.DecontamBenchmarkDocs)
      .groupBy(_._1 % Dedup.NDecontamSuites)
      .map { case (k, ds) => k -> ds.flatMap(d => shingles(d._2)).toSet }
    multi.foreach { r =>
      val id = r.getLong(0)
      val sh = shingles(docs.find(_._1 == id).get._2)
      assert(r.getLong(1) == sh.size.toLong, s"doc $id n_shingles")
      val perSuite = (0 until Dedup.NDecontamSuites).map { k =>
        (sh & benchBySuite.getOrElse(k.toLong, Set.empty)).size.toLong
      }
      (0 until Dedup.NDecontamSuites).foreach { k =>
        assert(r.getLong(2 + k) == perSuite(k), s"doc $id suite $k")
      }
      val total = perSuite.sum
      assert(r.getBoolean(2 + Dedup.NDecontamSuites) == (total > 0), s"doc $id contaminated")
      assert(r.getBoolean(2 + Dedup.NDecontamSuites) == single(id)._2, s"doc $id vs q62 flag")
      val expectedWorst =
        if (total == 0) -1L
        else perSuite.zipWithIndex.maxBy { case (c, k) => (c, -k) }._2.toLong
      assert(r.getLong(3 + Dedup.NDecontamSuites) == expectedWorst, s"doc $id worst suite")
    }
  }

  // ---------------------------------------------------------------- q104

  test("threshold sweep equals a JVM histogram over the LSH candidate pairs") {
    val rows = Dedup.docShingleSummary(spark, sf0001, Dedup.OracleHashBits).collect()
    val sets = rows.map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    val bands = rows.map(r => r.getLong(0) -> r.getSeq[String](3).zipWithIndex).toMap
    val ids = sets.keySet.toSeq.sorted
    val cands = for {
      i <- ids; j <- ids if i < j
      if bands(i).exists { case (h, idx) => bands(j).contains((h, idx)) }
    } yield (i, j)
    assume(cands.nonEmpty)
    val bucketOf = cands.map { case (a, b) =>
      val inter = (sets(a) & sets(b)).size.toLong
      val uni = (sets(a) | sets(b)).size.toLong
      val bk = math.min(
        math.floor(inter.toDouble / uni.toDouble * Dedup.SweepBuckets.toDouble).toLong,
        Dedup.SweepBuckets - 1L)
      (a, b, bk)
    }
    val pairHist = bucketOf.groupBy(_._3).map { case (bk, ps) => bk -> ps.length.toLong }
    val docMax = bucketOf.groupBy(_._2).map { case (_, ps) => ps.map(_._3).max }
    val docHist = docMax.groupBy(identity).map { case (bk, ds) => bk -> ds.size.toLong }
    val got = Dedup.thresholdSweep(spark, sf0001, Dedup.OracleHashBits).collect()
    assert(got.map(_.getLong(0)).toSet == pairHist.keySet)
    var cumP = 0L; var cumD = 0L
    got.sortBy(-_.getLong(0)).foreach { r =>
      val bk = r.getLong(0)
      assert(r.getLong(1) == pairHist(bk), s"bucket $bk n_pairs")
      cumP += pairHist(bk); cumD += docHist.getOrElse(bk, 0L)
      assert(r.getLong(2) == cumP, s"bucket $bk cumulative pairs")
      assert(r.getLong(3) == cumD, s"bucket $bk cumulative docs")
    }
    // the chosen q14 threshold's pair count is recoverable FROM THE
    // CURVE: reading n_pairs_at_or_above at the threshold's bucket
    // must reproduce the pair query's count (bucket-boundary
    // alignment of floor(j*20) with the j >= 0.7 filter)
    val q14pairs = Dedup.minhashLshPairs(spark, sf0001, Dedup.OracleHashBits).count()
    assume(q14pairs > 0)
    val tb = math.round(graft.core.Consts.MinhashJaccardThreshold * Dedup.SweepBuckets)
    val atOrAbove = got.filter(_.getLong(0) >= tb).map(_.getLong(1)).sum
    assert(q14pairs == atOrAbove,
      s"curve at bucket $tb reads $atOrAbove but q14 has $q14pairs pairs")
  }

  // ---------------------------------------------------------------- q100

  test("token budget equals a JVM plan reference; temperature favors small sources") {
    val got = graft.ops.Sampling.tokenBudget(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split("\\s+").count(_.nonEmpty).toLong))
    val per = docs.groupBy(_._1).map { case (s, rows) =>
      s -> (rows.length.toLong, rows.map(_._2).sum)
    }
    val weights = per.map { case (s, (_, n)) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong
    }
    val tt = per.values.map(_._2).sum
    val tw = weights.values.sum
    assert(got.length == per.size)
    got.foreach { r =>
      val src = r.getString(0)
      val (nd, nt) = per(src)
      val w = weights(src)
      val share = w * 1000 / tw
      val alloc = graft.ops.Sampling.BudgetEpochsX * tt * share / 1000
      assert(r.getLong(1) == nd && r.getLong(2) == nt && r.getLong(3) == w, s"$src stats")
      assert(r.getLong(4) == share, s"$src share")
      assert(r.getLong(5) == alloc, s"$src alloc")
      assert(r.getLong(6) == alloc * 1000 / nt, s"$src epochs")
      assert(r.getBoolean(7) == (alloc * 1000 / nt > 1000), s"$src repeats")
    }
    // sqrt temperature: the smallest source gets MORE epochs than the
    // largest (that is the whole point of the flattening)
    val bySize = got.sortBy(_.getLong(2))
    assert(bySize.head.getLong(6) >= bySize.last.getLong(6),
      s"temperature not flattening: ${bySize.head} vs ${bySize.last}")
    // shares are a floor-quantized partition of (at most) the whole
    assert(got.map(_.getLong(4)).sum <= 1000)
  }

  // ---------------------------------------------------------------- q101

  test("JSONL probe: quotes, backslashes, newlines, tabs, unicode, and empty strings survive the roundtrip") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain text"),
      (2L, "a \"quoted\" phrase and a \\ backslash"),
      (3L, "line one\nline two\r\nline three"),
      (4L, "tab\there and control  char"),
      (5L, "unicode: 你好 éèê 😀"),
      (6L, ""),
      (7L, "{\"looks\": \"like json\"}"))
      .map { case (id, txt) => (id, txt, "en", "probe", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("jsonl_probe")
    nasty.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val dir = graft.sources.JsonlCorpus.preparedJsonl(spark, tmp.toString)
    val back = spark.read.schema(graft.sources.JsonlCorpus.DocumentsSchema).json(dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = nasty.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == orig, s"escaping broke the roundtrip: $back")
  }

  test("JSONL export ingests back row-identical to the parquet corpus") {
    val dir = graft.sources.JsonlCorpus.preparedJsonl(spark, sf0001)
    val back = spark.read.schema(graft.sources.JsonlCorpus.DocumentsSchema).json(dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    val orig = Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    assert(back == orig, "JSONL roundtrip lost or mutated documents")
    assert(back.nonEmpty)
  }

  // ---------------------------------------------------------------- q95

  test("source datacard equals a JVM per-source reference") {
    val docs = Tables.documents(spark, sf0001)
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val got = TextAnalytics.sourceDatacard(spark, sf0001).collect()
    val bySource = docs.groupBy(_._1)
    assert(got.length == bySource.size)
    got.foreach { r =>
      val src = r.getString(0)
      val rows = bySource(src)
      val nDocs = rows.length.toLong
      val toks = rows.map(_._3.trim.split("\\s+").count(_.nonEmpty).toLong)
      val nDistinct = rows.map(_._3).distinct.length.toLong
      assert(r.getLong(1) == nDocs, s"$src n_docs")
      assert(r.getLong(2) == rows.map(_._2).distinct.length.toLong, s"$src n_langs")
      assert(r.getLong(3) == nDistinct, s"$src n_distinct")
      assert(r.getLong(4) == toks.sum, s"$src n_tokens")
      assert(r.getLong(5) == toks.min && r.getLong(6) == toks.max, s"$src extremes")
      assert(r.getLong(7) == (nDocs - nDistinct) * 1000 / nDocs, s"$src dup_permille")
      assert(r.getLong(8) == toks.sum * 100 / nDocs, s"$src mean_tokens_c")
    }
  }
}
