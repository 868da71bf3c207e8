package graft

import org.apache.spark.sql.functions._

/** Specs for the round-8 additions, each checked against an INDEPENDENT
  * in-spec reference implementation (plain-Scala md5 hashing, explicit
  * double-math rankings, literal sorts) rather than the operator's own
  * machinery.
  */
class Round8OpsSpec extends SparkSpec {

  private def toks(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  private def md5FirstByte(s: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff
  }

  // ---------------------------------------------------------------- q127

  /** independent end-to-end RRF reference over a documents dir. */
  private def rrfReference(sfDir: String): Seq[(Long, Long, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    // --- independent lexical ranking: literal Okapi formula, same
    // integer per-term quantization as the operator's shared expr
    val terms = graft.ops.TextAnalytics.Bm25Terms
    val n = docs.length.toLong
    val dls = docs.map { case (id, t) => id -> toks(t).length.toLong }.toMap
    val sdl = dls.values.sum
    val tfs = docs.flatMap { case (id, t) =>
      toks(t).filter(terms.contains).groupBy(identity).map { case (w, ws) => ((id, w), ws.length.toLong) }
    }.toMap
    val dfm = tfs.keys.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val lexScores = tfs.groupBy(_._1._1).map { case (id, g) =>
      id -> g.map { case ((_, w), tf) =>
        val dl = dls(id); val df = dfm(w)
        val num = tf.toDouble * 2.2
        val den = tf.toDouble + 1.2 * (0.25 + 0.75 * ((dl * n).toDouble / sdl.toDouble))
        val idf = ((n - df).toDouble + 0.5) / (df.toDouble + 0.5)
        math.floor((num / den) * idf * 1000000.0).toLong
      }.sum
    }
    val lexRank = lexScores.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(graft.ops.Hybrid.CandidateDepth)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap

    // --- independent semantic ranking: 256-bucket md5 histograms over
    // lowercased tokens, cosine vs the query histogram
    val qb = terms.map(t => md5FirstByte(t.toLowerCase))
      .groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    val qnrm = math.sqrt(qb.values.map(c => (c * c).toDouble).sum)
    val semScores = docs.flatMap { case (id, t) =>
      val counts = new Array[Long](256)
      toks(t.toLowerCase).foreach(w => counts(md5FirstByte(w)) += 1L)
      val dot = qb.map { case (b, qc) => qc * counts(b) }.sum
      if (dot == 0L) None
      else {
        val nrm = math.sqrt(counts.map(c => (c * c).toDouble).sum)
        Some(id -> dot.toDouble / (qnrm * nrm))
      }
    }
    val semRank = semScores.sortBy { case (id, s) => (-s, id) }
      .take(graft.ops.Hybrid.CandidateDepth)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap

    // --- independent fusion
    def contrib(r: Long): Long = if (r > 0L) 1000000L / (graft.ops.Hybrid.RrfK + r) else 0L
    (lexRank.keySet ++ semRank.keySet).toSeq.map { id =>
      val lr = lexRank.getOrElse(id, 0L); val sr = semRank.getOrElse(id, 0L)
      (id, lr, sr, contrib(lr) + contrib(sr))
    }.sortBy { case (id, _, _, f) => (-f, id) }
      .take(graft.ops.Hybrid.FusedTopK)
      .zipWithIndex.map { case ((id, lr, sr, f), i) => (id, lr, sr, f, i + 1L) }
  }

  private def rrfGot(sfDir: String): Seq[(Long, Long, Long, Long, Long)] =
    graft.ops.Hybrid.rrfHybrid(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("lex_rank"),
        r.getAs[Long]("sem_rank"), r.getAs[Long]("rrf"), r.getAs[Long]("rank")))
      .toSeq

  test("q127: RRF fusion matches an independent two-ranker reference at sf0.001") {
    assert(rrfGot(sf0001) == rrfReference(sf0001))
  }

  test("q127: the fusion also matches at sf0.01, where the top-50 lists diverge") {
    assert(rrfGot(sf001) == rrfReference(sf001))
  }

  test("q127: a semantic-only candidate fuses through the single-ranker branch") {
    import spark.implicits._
    // a token with NO query term in it whose md5 first byte collides with
    // a query term's bucket: its doc gets a semantic rank but no lexical
    // one, which is exactly the rank-0/contribution-0 branch
    val qbuckets = graft.ops.TextAnalytics.Bm25Terms.map(t => md5FirstByte(t.toLowerCase)).toSet
    val collider = Iterator.from(0).map(i => s"w$i")
      .find(w => qbuckets.contains(md5FirstByte(w))).get
    val dir = graft.streaming.StreamScratch.dir("q127-planted")
    Seq(
      (0L, "join spark stream join", "en", "s0", 22L),
      (1L, s"$collider $collider other words here", "en", "s0", 30L),
      (2L, "unrelated text entirely apart", "en", "s0", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = rrfGot(dir)
    assert(got == rrfReference(dir))
    val semOnly = got.find(_._1 == 1L).get
    assert(semOnly._2 == 0L && semOnly._3 > 0L)
    assert(semOnly._4 == 1000000L / (graft.ops.Hybrid.RrfK + semOnly._3))
    // doc 2 shares neither a term nor a bucket: absent from the report
    assert(!got.exists(_._1 == 2L))
  }

  // ---------------------------------------------------------------- q128

  private def md5Hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** independent winnowing: literal sliding-window min over gram hashes. */
  private def winnowRef(text: String, n: Int, w: Int): Set[Long] = {
    val t = toks(text)
    val m = t.length - n + 1
    if (m <= 0) Set.empty
    else {
      val h = (0 until m).map(i => md5Hash32(t.slice(i, i + n).mkString(" ")))
      (0 to math.max(0, m - w)).map(s => h.slice(s, math.min(s + w, m)).min).toSet
    }
  }

  test("q128: pairs report matches an independent winnowing reference at sf0.001") {
    val n = graft.ops.Dedup.WinnowGramN; val w = graft.ops.Dedup.WinnowWindow
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val fps = docs.map { case (id, t) => id -> winnowRef(t, n, w) }.toMap
    val expected = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b
      shared = (fa & fb).size.toLong if shared >= graft.ops.Dedup.WinnowMinShared
    } yield (a, b, shared, fa.size.toLong, fb.size.toLong,
        shared * 1000L / math.min(fa.size, fb.size)))
      .sortBy { case (a, b, _, _, _, _) => (a, b) }
    val got = graft.ops.Dedup.winnowPairs(spark, sf0001, graft.ops.Dedup.OracleHashBits)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("shared_fps"),
        r.getAs[Long]("a_fps"), r.getAs[Long]("b_fps"), r.getAs[Long]("overlap_permille")))
      .toSeq
    assert(got == expected)
    assert(got.nonEmpty, "spec corpus must actually produce overlapping pairs")
  }

  test("q128: a shared w+n-1 token run is deterministically fingerprinted") {
    import spark.implicits._
    val n = graft.ops.Dedup.WinnowGramN; val w = graft.ops.Dedup.WinnowWindow
    // two docs sharing EXACTLY one 6-token run (w+n-1) inside otherwise
    // disjoint text: winnowing GUARANTEES at least one shared fingerprint
    val run = "alpha bravo charlie delta echo foxtrot"
    val dir = graft.streaming.StreamScratch.dir("q128-planted")
    Seq(
      (0L, s"xx1 xx2 xx3 $run yy1 yy2 yy3", "en", "s0", 40L),
      (1L, s"zz1 zz2 zz3 $run qq1 qq2 qq3", "en", "s0", 40L),
      (2L, "totally different content with no shared run at all", "en", "s0", 52L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.ops.Dedup.winnowFingerprintRows(spark, dir, graft.ops.Dedup.OracleHashBits)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = rows.groupBy(_._1).map { case (id, g) => id -> g.map(_._2).toSet }
    assert((byDoc(0L) & byDoc(1L)).nonEmpty,
      "a shared run of w+n-1 tokens must share a fingerprint — the MOSS guarantee")
    assert((byDoc(0L) & byDoc(2L)).isEmpty && (byDoc(1L) & byDoc(2L)).isEmpty)
    // and each doc's fingerprints match the independent reference
    byDoc.foreach { case (id, got) =>
      val txt = Seq(s"xx1 xx2 xx3 $run yy1 yy2 yy3",
        s"zz1 zz2 zz3 $run qq1 qq2 qq3",
        "totally different content with no shared run at all")(id.toInt)
      assert(got == winnowRef(txt, n, w), s"doc $id")
    }
  }

  test("q128: small-doc fallback and compression density") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q128-small")
    // 4 tokens -> 2 grams < window 4: exactly ONE fingerprint (min of all)
    Seq((0L, "a b c d", "en", "s0", 7L), (1L, "xy", "en", "s0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.ops.Dedup.winnowFingerprintRows(spark, dir, graft.ops.Dedup.OracleHashBits)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.count(_._1 == 0L) == 1)
    assert(rows.head._2 == Seq("a b c", "b c d").map(md5Hash32).min)
    // a doc below the gram width has no fingerprints at all
    assert(!rows.exists(_._1 == 1L))
    // corpus-level compression: winnowing stores a strict subset of grams
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val nGrams = docs.map(t => math.max(0, toks(t).length - graft.ops.Dedup.WinnowGramN + 1)).sum
    val nFps = graft.ops.Dedup.winnowFingerprintRows(spark, sf0001, graft.ops.Dedup.OracleHashBits).count()
    assert(nFps < nGrams / 2, s"winnowing should be sparse: $nFps fps vs $nGrams grams")
  }

  // ---------------------------------------------------------------- q129

  test("q129: distinct-n report matches an independent reference at sf0.001") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val expected = (for {
      n <- graft.ops.TextAnalytics.DiversityOrders
      (src, rows) <- docs.groupBy(_._1).toSeq
    } yield {
      val grams = rows.flatMap { case (_, t) =>
        val w = toks(t)
        (0 to w.length - n).map(i => md5Hash32(w.slice(i, i + n).mkString(" ")))
      }
      val total = grams.length.toLong
      val distinct = grams.distinct.length.toLong
      (src, n.toLong, total, distinct, distinct * 1000L / total)
    }).sortBy { case (s, n, _, _, _) => (s, n) }
    val got = graft.ops.TextAnalytics
      .distinctNgrams(spark, sf0001, graft.ops.Dedup.OracleHashBits).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n"), r.getAs[Long]("total_ngrams"),
        r.getAs[Long]("distinct_ngrams"), r.getAs[Long]("distinct_permille")))
      .toSeq
    assert(got == expected)
  }

  test("q129: a template-spam source scores below a diverse one at every order") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q129-planted")
    // spam: one 6-token template repeated; diverse: all-distinct tokens
    val spam = Seq.fill(10)("buy cheap pills online now fast").mkString(" ")
    val diverse = (0 until 60).map(i => s"tok$i").mkString(" ")
    Seq((0L, spam, "en", "spam", spam.length.toLong),
        (1L, diverse, "en", "fine", diverse.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalytics
      .distinctNgrams(spark, dir, graft.ops.Dedup.OracleHashBits).collect()
      .map(r => ((r.getAs[String]("source"), r.getAs[Long]("n")), r.getAs[Long]("distinct_permille")))
      .toMap
    graft.ops.TextAnalytics.DiversityOrders.map(_.toLong).foreach { n =>
      assert(got(("spam", n)) < got(("fine", n)) / 2,
        s"order $n: spam ${got(("spam", n))} vs fine ${got(("fine", n))}")
    }
    // the diverse source is maximally diverse: permille exactly 1000
    assert(graft.ops.TextAnalytics.DiversityOrders.forall(n => got(("fine", n.toLong)) == 1000L))
  }

  // ---------------------------------------------------------------- q130

  /** independent source-union minhash signature from raw text. */
  private def sourceSigRef(docs: Seq[(String, String)]): Map[String, Seq[Long]] = {
    val prime = graft.core.Consts.MinhashPrime
    docs.groupBy(_._1).map { case (src, g) =>
      val hvs = g.flatMap { case (_, t) =>
        val w = toks(t)
        (0 to w.length - 3).map(i => md5Hash32(w.slice(i, i + 3).mkString(" ")))
      }.distinct
      src -> graft.core.Consts.MinhashParams.map { case (a, b) =>
        hvs.map(hv => (hv * a + b) % prime).min
      }
    }
  }

  test("q130: source matrix matches an independent union-signature reference at sf0.001") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val sigs = sourceSigRef(docs)
    val expected = (for {
      (a, sa) <- sigs.toSeq; (b, sb) <- sigs.toSeq if a < b
    } yield {
      val m = sa.zip(sb).count { case (x, y) => x == y }.toLong
      (a, b, m, m * 1000L / sa.size)
    }).sortBy { case (a, b, _, _) => (a, b) }
    val got = graft.ops.Dedup
      .sourceMinhashMatrix(spark, sf0001, graft.ops.Dedup.OracleHashBits).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"),
        r.getAs[Long]("matching_perms"), r.getAs[Long]("est_jaccard_permille")))
      .toSeq
    assert(got == expected)
  }

  test("q130: identical sources estimate 1000 permille, disjoint sources 0") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q130-planted")
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val other = "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11"
    Seq((0L, shared, "en", "sA", 1L), (1L, shared, "en", "sB", 1L),
        (2L, other, "en", "sC", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup
      .sourceMinhashMatrix(spark, dir, graft.ops.Dedup.OracleHashBits).collect()
      .map(r => ((r.getAs[String]("source_a"), r.getAs[String]("source_b")),
        (r.getAs[Long]("matching_perms"), r.getAs[Long]("est_jaccard_permille"))))
      .toMap
    // identical shingle unions: every permutation's min agrees
    assert(got(("sA", "sB")) == (16L, 1000L))
    // disjoint shingle unions: no permutation min can agree (no shared hv)
    assert(got(("sA", "sC")) == (0L, 0L))
    assert(got(("sB", "sC")) == (0L, 0L))
  }

  // ---------------------------------------------------------------- q131

  /** independent stub-path dHash: first-72-bytes grid, literal bit rule. */
  private def dhashRef(text: String): Long = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      def b(p: Int) = if (p < bytes.length) bytes(p) & 0xff else 0
      if (b(r * 9 + c) < b(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
    }
    h
  }

  test("q131: banded pairs equal an independent all-pairs reference at sf0.01") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 == 0)
    val sigs = docs.map { case (id, t) => (id, dhashRef(t)) }
    val expected = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      ham = java.lang.Long.bitCount(ha ^ hb).toLong
      if ham <= graft.ops.Multimodal.DHashMaxHamming
    } yield (a, b, ham)).sortBy { case (a, b, _) => (a, b) }.toSeq
    val got = graft.ops.Multimodal.dhashPairs(spark, sf001).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"), r.getAs[Long]("hamming")))
      .toSeq
    assert(got == expected)
    assert(got.nonEmpty, "the sf0.01 corpus must produce near-dup image pairs")
    // per-image signatures match the reference kernel too
    val gotSigs = graft.ops.Multimodal.imageDHashes(spark, sf001).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("dhash"))).toMap
    sigs.foreach { case (id, h) => assert(gotSigs(id) == h, s"media $id") }
  }

  test("q131: real ImageIO decode path — re-encoding and brightness shift survive, different content does not") {
    import spark.implicits._
    def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) { val v = f(x, y) & 0xff; img.setRGB(x, y, (v << 16) | (v << 8) | v) }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // a diagonal gradient, the same gradient brightened by +12, the same
    // gradient re-encoded at a different size, and unrelated noise-bars
    val base = png(64, 48, (x, y) => 2 * x + 2 * y)
    val bright = png(64, 48, (x, y) => math.min(255, 2 * x + 2 * y + 12))
    val resized = png(128, 96, (x, y) => x + y)
    val bars = png(64, 48, (x, _) => if ((x / 8) % 2 == 0) 230 else 10)
    val hashes = graft.ops.Multimodal
      .imageDHash(Seq((0L, base), (1L, bright), (2L, resized), (3L, bars),
        (4L, "not an image at all".getBytes)).toDS())
      .collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    assert(ham(0L, 1L) <= graft.ops.Multimodal.DHashMaxHamming,
      s"brightness shift must survive dHash (got ${ham(0L, 1L)})")
    assert(ham(0L, 2L) <= graft.ops.Multimodal.DHashMaxHamming,
      s"re-encode at another size must survive dHash (got ${ham(0L, 2L)})")
    assert(ham(0L, 3L) > graft.ops.Multimodal.DHashMaxHamming,
      s"different content must NOT collide (got ${ham(0L, 3L)})")
    // undecodable payloads drop instead of failing the job
    assert(!hashes.contains(4L))
  }

  test("q131: the candidate join is banded equi-join, never a cross product") {
    val plan = graft.ops.Multimodal.dhashPairs(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "dhash pairing must ride the banded equi-join")
  }

  // ---------------------------------------------------------------- q132

  test("q132: separation matrix matches an independent fixed-point reference at sf0.001") {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getSeq[Float](1).toArray))
    val byLabel = rows.groupBy(_._1)
    val cents = byLabel.map { case (l, g) =>
      val n = g.size.toLong
      val sums = Array.fill(64)(0L)
      g.foreach { case (_, v) =>
        v.zipWithIndex.foreach { case (x, d) =>
          sums(d) += math.floor(x.toDouble * 1e6).toLong
        }
      }
      l -> sums.map(s => math.floor(s.toDouble / n).toLong)
    }
    val expected = (for {
      (a, ca) <- cents.toSeq; (b, cb) <- cents.toSeq if a < b
    } yield {
      val dot = ca.zip(cb).map { case (x, y) => x * y }.sum
      val na = math.sqrt(ca.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(cb.map(x => x * x).sum.toDouble)
      (a, b, byLabel(a).size.toLong, byLabel(b).size.toLong,
        math.floor(1000.0 * dot.toDouble / (na * nb)).toLong)
    }).sortBy { case (a, b, _, _, _) => (a, b) }
    val got = graft.ops.Similarity.labelCentroids(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("label_a"), r.getAs[Long]("label_b"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("cos_permille")))
      .toSeq
    assert(got == expected)
    assert(got.size == cents.size * (cents.size - 1) / 2)
  }

  test("q132: identical labels read 1000 permille, disjoint-support labels 0") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q132-planted")
    def vec(active: Range, v: Float): Array[Float] =
      Array.tabulate(64)(d => if (active.contains(d)) v else 0.0f)
    // labels 0 and 1: identical single-vector centroids on dims 0-7;
    // label 2: disjoint support on dims 32-39
    Seq((0L, vec(0 until 8, 0.3f), 0), (1L, vec(0 until 8, 0.3f), 1),
        (2L, vec(32 until 40, 0.4f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.Similarity.labelCentroids(spark, dir).collect()
      .map(r => ((r.getAs[Long]("label_a"), r.getAs[Long]("label_b")), r.getAs[Long]("cos_permille")))
      .toMap
    assert(got((0L, 1L)) == 1000L, "identical centroids must read exactly 1000")
    assert(got((0L, 2L)) == 0L && got((1L, 2L)) == 0L,
      "disjoint-support centroids must read exactly 0")
  }

  // ---------------------------------------------------------------- q133

  test("q133: audit matches an independent bucket/membership recompute at sf0.01") {
    // independent quality + bucketing; dup membership from the pair list
    // (itself independently referenced in TextDedupSimilaritySpec) plus a
    // pure-Scala exact-dup group-by
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def quality(t: String): Double = {
      val chars = t.length.toDouble
      val alpha = t.count(c => c >= 'a' && c <= 'z').toDouble / chars
      val w = toks(t)
      val stop = w.count(graft.core.Consts.Stopwords.contains).toDouble / w.length
      alpha * (1.0 - stop)
    }
    val exactDup = docs.groupBy(_._2).values.filter(_.size > 1).flatMap(_.map(_._1)).toSet
    val lshDup = graft.ops.Dedup
      .minhashLshPairs(spark, sf001, graft.ops.Dedup.OracleHashBits)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val dup = exactDup ++ lshDup
    val expected = docs.map { case (id, t) =>
      (math.min(math.floor(quality(t) * 10.0).toLong, 9L), id, toks(t).length.toLong)
    }.groupBy(_._1).toSeq.map { case (b, g) =>
      val nd = g.count(r => dup.contains(r._2)).toLong
      (b, g.length.toLong, nd, nd * 1000L / g.length,
        g.map(_._3).sum, g.filter(r => dup.contains(r._2)).map(_._3).sum)
    }.sortBy(_._1)
    val got = graft.ops.Dedup.qualityDupAudit(spark, sf001, graft.ops.Dedup.OracleHashBits)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_members"),
        r.getAs[Long]("dup_permille"), r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_tokens")))
      .toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == docs.length.toLong, "every doc lands in exactly one band")
  }

  test("q133: duplication planted in the low-quality band is reported there") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q133-planted")
    // low-quality (digits → alpha ratio ~0) template repeated 3×;
    // high-quality all-alpha docs unique
    val junk = "111 222 333 444 555 666 777 888"
    val rows = Seq(
      (0L, junk, "en", "s0", 1L), (1L, junk, "en", "s0", 1L), (2L, junk, "en", "s0", 1L),
      (3L, "alpha bravo charlie delta echo foxtrot golf", "en", "s0", 1L),
      (4L, "hotel india juliet kilo lima mike november", "en", "s0", 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.qualityDupAudit(spark, dir, graft.ops.Dedup.OracleHashBits)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"), r.getAs[Long]("dup_permille")))
      .toSeq
    // band 0 = the three junk copies, all duplicated; band 8 = the clean
    // unique docs (spaces hold alpha-ratio just under 0.9), none duplicated
    assert(got.contains((0L, 3L, 1000L)), s"got $got")
    assert(got.contains((8L, 2L, 0L)), s"got $got")
  }

  // ---------------------------------------------------------------- q134

  test("q134: stream replay is row-identical to the batch twin and an independent reference") {
    val stream = graft.streaming.DedupStream.dhashStream(spark, sf001).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Boolean]("is_dup"),
        r.getAs[Long]("match_id"), r.getAs[Long]("hamming"))).toSeq
    val batch = graft.ops.Multimodal.dhashAdmission(spark, sf001).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Boolean]("is_dup"),
        r.getAs[Long]("match_id"), r.getAs[Long]("hamming"))).toSeq
    assert(stream == batch, "stream replay must be row-identical to the batch twin")
    // independent all-pairs reference
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._1 % 3 == 0)
    val inc = docs.filter(_._2 == graft.ops.Dedup.IncrementalSource)
    val corp = docs.filter(_._2 != graft.ops.Dedup.IncrementalSource)
    val expected = inc.map { case (id, _, t) =>
      val h = dhashRef(t)
      val hits = corp.map { case (cid, _, ct) =>
        (java.lang.Long.bitCount(h ^ dhashRef(ct)).toLong, cid)
      }.filter(_._1 <= graft.ops.Multimodal.DHashMaxHamming)
      if (hits.isEmpty) (id, false, -1L, -1L)
      else { val best = hits.min; (id, true, best._2, best._1) }
    }.sortBy(_._1).toSeq
    assert(stream == expected)
    // both verdict branches must fire on this corpus
    assert(stream.exists(_._2) && stream.exists(!_._2))
  }

  // ---------------------------------------------------------------- q135

  test("q135: fertility report matches an independent regex recompute at sf0.001") {
    val pat = java.util.regex.Pattern.compile(graft.core.Consts.BpeTokenPattern)
    def bpe(t: String): Long = {
      val m = pat.matcher(t); var c = 0L; while (m.find()) c += 1; c
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("lang", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).toSeq.map { case (lang, g) =>
      val w = g.map(d => toks(d._2).length.toLong).sum
      val b = g.map(d => bpe(d._2)).sum
      val c = g.map(d => d._2.length.toLong).sum
      (lang, g.length.toLong, w, b, c, b * 1000L / w, c * 1000L / b)
    }.sortBy(_._1)
    val got = graft.ops.TextAnalytics.tokenizerFertility(spark, sf0001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bpe_tokens"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("fertility_milli"), r.getAs[Long]("chars_per_token_milli")))
      .toSeq
    assert(got == expected)
  }

  test("q135: a punctuation-fragmented language shows higher fertility") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q135-planted")
    // plain words → 1 BPE token per word (fertility 1000); hyphen/digit
    // mixed words fragment into several tokens each
    Seq((0L, "alpha bravo charlie delta", "plain", "s0", 1L),
        (1L, "ab-1cd ef-2gh ij-3kl mn-4op", "frag", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalytics.tokenizerFertility(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("fertility_milli"))).toMap
    assert(got("plain") == 1000L)
    assert(got("frag") == 4000L, s"each frag word is [ab][-][1][cd] = 4 tokens: $got")
  }

  // ---------------------------------------------------------------- q136

  test("q136: sweep matches an independent signature-level reference at sf0.001") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    def simhash(t: String): Long = {
      val votes = Array.fill(16)(0)
      toks(t).foreach { w =>
        val h = hex(w)
        (0 until 16).foreach(k => votes(k) += (if (h(k) >= '8') 1 else -1))
      }
      (0 until 16).map(k => if (votes(k) > 0) 1L << k else 0L).sum
    }
    def shingleSet(t: String): Set[Long] = {
      val w = toks(t)
      (0 to w.length - 3).map(i => md5Hash32(w.slice(i, i + 3).mkString(" "))).toSet
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(d => toks(d._2).nonEmpty)
    val sigOf = docs.map { case (id, t) => id -> simhash(t) }.toMap
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    def jacc(a: Long, b: Long): Long = {
      val (sa, sb) = (sets(a), sets(b))
      val inter = (sa & sb).size.toLong
      val uni = sa.size.toLong + sb.size.toLong - inter
      if (uni > 0) inter * 1000L / uni else 0L
    }
    val byGroup = docs.map(_._1).groupBy(sigOf)
    val g = byGroup.toSeq.map { case (sh, ids) =>
      val sorted = ids.sorted
      (sh, ids.length.toLong, sorted.head, sorted.drop(1).headOption)
    }
    val cross = (for {
      (sa, ca, ra, _) <- g; (sb, cb, rb, _) <- g if sa < sb
      h = java.lang.Long.bitCount(sa ^ sb).toLong if h <= graft.ops.Dedup.SimhashSweepMax
    } yield (h, ca * cb, jacc(ra, rb)))
    val same = g.collect { case (_, c, r1, Some(r2)) if c >= 2 =>
      (0L, c * (c - 1) / 2, jacc(r1, r2)) }
    val all = cross ++ same
    val expected = (0L to graft.ops.Dedup.SimhashSweepMax).map { t =>
      val in = all.filter(_._1 <= t)
      if (in.isEmpty) (t, 0L, 0L, -1L, -1L)
      else (t, in.size.toLong, in.map(_._2).sum,
        in.map(_._3).sum / in.size, in.map(_._3).min)
    }
    val got = graft.ops.Dedup.simhashSweep(spark, sf0001, graft.ops.Dedup.OracleHashBits)
      .collect()
      .map(r => (r.getAs[Long]("max_hamming"), r.getAs[Long]("n_sig_pairs"),
        r.getAs[Long]("n_doc_pairs"), r.getAs[Long]("mean_rep_jacc_permille"),
        r.getAs[Long]("min_rep_jacc_permille")))
      .toSeq
    assert(got == expected)
    // cumulative counts are monotone and the curve decays: tighter
    // thresholds merge more set-similar docs
    assert(got.map(_._2) == got.map(_._2).sorted)
    val means = got.filter(_._2 > 0).map(_._4)
    assert(means.nonEmpty && means.head == means.max,
      s"hamming-0 mean similarity should top the curve: $means")
  }

  // ---------------------------------------------------------------- q137

  /** independent proportional-waterfill reference. */
  private def waterfillRef(perSource: Seq[(String, Long)], budgetX: Long, capMilli: Long)
      : Seq[(String, Long, Boolean, Long)] = {
    val w = perSource.map { case (s, n) => (s, n, math.floor(math.sqrt(n.toDouble) * 1e6).toLong) }
    val tw = w.map(_._3).sum
    val tt = perSource.map(_._2).sum
    val rows = w.map { case (s, n, wt) =>
      val share = wt * 1000L / tw
      val cap = n * capMilli / 1000L
      (s, n, share, cap, cap.toDouble / share.toDouble)
    }.sortBy { case (s, _, _, _, ratio) => (ratio, s) }
    val ts = rows.map(_._3).sum
    var rb = budgetX * tt; var rw = ts
    var level: Option[(Long, Long)] = None
    val out = rows.map { case (s, n, share, cap, _) =>
      val sat = level.isEmpty && cap * rw <= rb * share
      if (sat) { rb -= cap; rw -= share; (s, n, true, cap) }
      else {
        if (level.isEmpty) level = Some((rb, rw))
        val (lrb, lrw) = level.get
        (s, n, false, lrb * share / lrw)
      }
    }
    out.sortBy(_._1)
  }

  test("q137: allocation matches an independent waterfill reference and stays feasible at sf0.01") {
    val per = spark.read.parquet(s"$sf001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), toks(r.getString(1)).length.toLong))
      .groupBy(_._1).toSeq.map { case (s, g) => (s, g.map(_._2).sum) }
    val expected = waterfillRef(per,
      graft.ops.Sampling.BudgetEpochsX, graft.ops.Sampling.EpochCapMilli)
    val got = graft.ops.Sampling.epochCappedAllocation(spark, sf001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Boolean]("saturated"), r.getAs[Long]("alloc_tokens")))
      .toSeq.sortBy(_._1)
    assert(got == expected)
    // feasibility: never over budget; integer-div undershoot < Σ shares
    val budget = graft.ops.Sampling.BudgetEpochsX * per.map(_._2).sum
    val used = got.map(_._4).sum
    assert(used <= budget && budget - used < 1000L, s"used $used of $budget")
  }

  test("q137: a skewed corpus saturates the small source at exactly the epoch cap") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q137-planted")
    // tiny source: sqrt-temperature share far exceeds its 4-epoch cap
    val tiny = (0 until 10).map(i => s"t$i").mkString(" ")
    val bigDocs = (0 until 50).map { i =>
      (i.toLong + 1, (0 until 200).map(j => s"w${i}_$j").mkString(" "), "en", "big", 1L)
    }
    ((0L, tiny, "en", "tiny", 1L) +: bigDocs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Sampling.epochCappedAllocation(spark, dir).collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Boolean]("saturated"), r.getAs[Long]("epochs_milli")))).toMap
    assert(got("tiny") == ((true, graft.ops.Sampling.EpochCapMilli)),
      s"tiny must cap out at exactly ${graft.ops.Sampling.EpochCapMilli} milli-epochs: $got")
    assert(!got("big")._1 && got("big")._2 < graft.ops.Sampling.EpochCapMilli)
  }

  // ---------------------------------------------------------------- q138

  test("q138: per-doc dup-segment report matches an independent recompute at sf0.001") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val segsByDoc = docs.map { case (id, t) =>
      id -> graft.ops.Dedup.cdcSplit(t)
    }
    val docCount = segsByDoc.flatMap { case (id, segs) => segs.distinct.map(s => (s, id)) }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).distinct.size }
    val expected = segsByDoc.map { case (id, segs) =>
      val dup = segs.filter(s => docCount(s) > 1)
      val total = segs.map(s => s.codePointCount(0, s.length).toLong).sum
      val dupCps = dup.map(s => s.codePointCount(0, s.length).toLong).sum
      (id, segs.length.toLong, dup.length.toLong, total, dupCps,
        if (total > 0) dupCps * 1000L / total else 0L)
    }.sortBy(_._1).toSeq
    val got = graft.ops.Dedup.cdcDedup(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_segments"),
        r.getAs[Long]("n_dup_segments"), r.getAs[Long]("n_cps"),
        r.getAs[Long]("dup_cps"), r.getAs[Long]("dup_permille")))
      .toSeq
    assert(got == expected)
    // exact-dup docs exist in the corpus, so full-redundancy rows must too
    assert(got.exists(_._6 == 1000L))
    assert(got.exists(_._6 < 1000L))
  }

  test("q138: a shared paragraph at a different offset still resolves to shared segments") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q138-planted")
    // the same long paragraph embedded after different-length prefixes:
    // CDC boundaries resynchronize inside the shared run, so interior
    // segments match even though byte offsets differ
    val para = (0 until 120).map(i => s"shared$i").mkString(" ")
    Seq((0L, s"intro one $para", "en", "s0", 1L),
        (1L, s"a completely different and much longer introduction $para", "en", "s0", 1L),
        (2L, "nothing in common here", "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.cdcDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_dup_segments"), r.getAs[Long]("dup_permille")))
      .toSeq.sortBy(_._1)
    assert(got(0)._2 > 0 && got(1)._2 > 0,
      s"offset-shifted shared paragraph must share interior segments: $got")
    assert(got(2)._2 == 0 && got(2)._3 == 0)
    // the shared mass dominates both docs despite the differing prefixes
    assert(got(0)._3 > 500 && got(1)._3 > 500, s"got $got")
  }

  // ---------------------------------------------------------------- q139

  test("q139: every scope is within bound and union-of-sketches equals direct sketching") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.Sketches.hllUnionReport(spark, sf001).collect()
      .map(r => (r.getAs[String]("scope"), r.getAs[Long]("exact_distinct"),
        r.getAs[Boolean]("within_bound"))).toSeq
    assert(got.last._1 == "~union", "the union row must sort last")
    assert(got.forall(_._3), s"every sketch estimate must sit within bound: $got")
    // independent exact counts
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1).map { case (s, g) =>
      s -> g.flatMap(d => toks(d._2)).distinct.size.toLong }
    got.dropRight(1).foreach { case (s, n, _) => assert(bySrc(s) == n, s"scope $s") }
    assert(got.last._2 == docs.flatMap(d => toks(d._2)).distinct.size.toLong)
    // THE mergeability property: union of per-source sketches estimates
    // exactly what sketching the whole corpus directly estimates
    val tok = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("source"), explode(graft.ops.TextAnalytics.tokens(col("text"))).as("tok"))
    val viaUnion = tok.groupBy("source").agg(hll_sketch_agg(col("tok")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e")).head().getLong(0)
    val direct = tok.agg(hll_sketch_estimate(hll_sketch_agg(col("tok"))).as("e")).head().getLong(0)
    assert(viaUnion == direct,
      s"HLL union must commute with sketching: $viaUnion != $direct")
  }

  // ---------------------------------------------------------------- q140

  /** independent drift recompute over (source, text) rows. */
  private def embedDriftRef(docs: Seq[(String, String)]): Map[String, (Long, Long)] = {
    val bySrc = docs.groupBy(_._1).map { case (s, g) =>
      val counts = new Array[Long](256)
      g.foreach { case (_, t) =>
        toks(t.toLowerCase).foreach(w => counts(md5FirstByte(w)) += 1L)
      }
      s -> counts
    }
    val corpus = new Array[Long](256)
    bySrc.values.foreach(c => (0 until 256).foreach(b => corpus(b) += c(b)))
    val tt = corpus.sum
    bySrc.map { case (s, c) =>
      val n = c.sum
      val sShare = c.map(_ * 1000L / n)
      val rShare = (0 until 256).map(b => (corpus(b) - c(b)) * 1000L / (tt - n)).toArray
      val dot = (0 until 256).map(b => sShare(b) * rShare(b)).sum.toDouble
      val ns = math.sqrt(sShare.map(x => (x * x).toDouble).sum)
      val nr = math.sqrt(rShare.map(x => (x * x).toDouble).sum)
      s -> (n, math.floor(1000.0 * dot / (ns * nr)).toLong)
    }
  }

  test("q140: drift report matches an independent recompute at sf0.001") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val expected = embedDriftRef(docs).toSeq
      .map { case (s, (n, cosm)) => (s, n, cosm) }.sortBy(_._1)
    val got = graft.ops.ChatOracle.sourceEmbedDrift(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cos_to_rest_permille"))).toSeq
    assert(got == expected)
  }

  test("q140: a divergent-vocabulary source reads far below same-distribution sources") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q140-planted")
    val common = (0 until 50).map(i => s"word$i").mkString(" ")
    Seq((0L, common, "en", "sA", 1L), (1L, common, "en", "sB", 1L),
        (2L, (0 until 50).map(i => s"zz$i").mkString(" "), "en", "sDrift", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.ChatOracle.sourceEmbedDrift(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("cos_to_rest_permille"))).toMap
    // sA's complement still contains sB's identical histogram: high cosine
    assert(got("sA") > 700L && got("sB") > 700L, s"got $got")
    // the drifted source's complement is the common histogram: low cosine
    assert(got("sDrift") < got("sA") / 2, s"got $got")
  }

  // ---------------------------------------------------------------- q141

  test("q141: spectrum matches an independent recompute at sf0.001") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val grams = docs.flatMap { t =>
      val w = toks(t)
      (0 to w.length - 5).map(i => md5Hash32(w.slice(i, i + 5).mkString(" ")))
    }
    val freq = grams.groupBy(identity).map(_._2.length.toLong)
    val tot = freq.sum
    val expected = freq.groupBy(f => if (f == 1L) 1L else if (f == 2L) 2L else if (f < 10L) 3L else 10L)
      .toSeq.map { case (b, fs) =>
        (b, fs.size.toLong, fs.sum, fs.sum * 1000L / tot) }
      .sortBy(_._1)
    val got = graft.ops.Dedup.dupSpectrum(spark, sf0001, graft.ops.Dedup.OracleHashBits)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_occurrences"), r.getAs[Long]("mass_permille")))
      .toSeq
    assert(got == expected)
    // occurrence mass partitions the corpus: buckets sum to the total
    assert(got.map(_._3).sum == tot)
  }

  test("q141: a memorized-sequence candidate lands in the 10+ bucket") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q141-planted")
    // one 5-gram repeated 12 times across docs + unique filler
    val meme = "alpha bravo charlie delta echo"
    val rows = (0 until 12).map { i =>
      (i.toLong, s"$meme u${i}a u${i}b u${i}c u${i}d", "en", "s0", 1L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.dupSpectrum(spark, dir, graft.ops.Dedup.OracleHashBits)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_grams"), r.getAs[Long]("n_occurrences")))
      .toSeq.sortBy(_._1)
    assert(got.exists { case (b, g, o) => b == 10L && g == 1L && o == 12L },
      s"the repeated gram must land in the 10+ bucket: $got")
  }

  // ---------------------------------------------------------------- q142

  test("q142: stream replay is row-identical to the batch twin and an independent reference") {
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cos_permille"), r.getAs[Boolean]("flagged"))).toSeq
    val stream = collect(graft.streaming.DedupStream.driftStream(spark, sf001))
    val batch = collect(graft.ops.ChatOracle.docDrift(spark, sf001))
    assert(stream == batch, "stream replay must be row-identical to the batch twin")
    // independent reference
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val refCounts = new Array[Long](256)
    docs.filter(_._2 != graft.ops.Dedup.IncrementalSource)
      .foreach { case (_, _, t) => toks(t.toLowerCase).foreach(w => refCounts(md5FirstByte(w)) += 1L) }
    val tt = refCounts.sum
    val rShare = refCounts.map(_ * 1000L / tt)
    val nr = math.sqrt(rShare.map(x => (x * x).toDouble).sum)
    val expected = docs.filter(_._2 == graft.ops.Dedup.IncrementalSource)
      .map { case (id, _, t) =>
        val c = new Array[Long](256)
        var n = 0L
        toks(t.toLowerCase).foreach { w => c(md5FirstByte(w)) += 1L; n += 1L }
        val sShare = c.map(x => x * 1000L / n)
        val dot = (0 until 256).map(b => sShare(b) * rShare(b)).sum.toDouble
        val ns = math.sqrt(sShare.map(x => (x * x).toDouble).sum)
        val cos = math.floor(1000.0 * dot / (ns * nr)).toLong
        (id, n, cos, cos < graft.ops.ChatOracle.DriftFlagPermille)
      }.sortBy(_._1).toSeq
    assert(stream == expected)
    // in-distribution incoming docs must NOT flag at the floor
    assert(stream.forall(!_._4))
  }

  test("q142: an out-of-distribution document is flagged at ingest") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q142-planted")
    val common = (0 until 40).map(i => s"word${i % 10}").mkString(" ")
    val rows = (0 until 5).map(i => (i.toLong, common, "en", "corpus", 1L)) ++ Seq(
      (10L, common, "en", graft.ops.Dedup.IncrementalSource, 1L),
      (11L, (0 until 40).map(i => s"zzz$i").mkString(" "), "en", graft.ops.Dedup.IncrementalSource, 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.ChatOracle.docDrift(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("flagged"))).toMap
    assert(!got(10L), "an in-distribution doc must pass")
    assert(got(11L), "a disjoint-vocabulary doc must be flagged")
  }

  // ---------------------------------------------------------------- q143

  test("q143: per-source top tokens match an independent recompute and ride WindowGroupLimit") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, g) =>
      val counts = g.flatMap(d => toks(d._2)).groupBy(identity)
        .map { case (t, ts) => (t, ts.length.toLong) }
      counts.toSeq.sortBy { case (t, c) => (-c, t) }
        .take(graft.ops.TextAnalytics.SourceTopK)
        .zipWithIndex.map { case ((t, c), i) => (src, i + 1L, t, c) }
    }.sortBy { case (s, r, _, _) => (s, r) }
    val got = graft.ops.TextAnalytics.sourceTopTokens(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"),
        r.getAs[String]("tok"), r.getAs[Long]("cnt"))).toSeq
    assert(got == expected)
    val plan = graft.ops.TextAnalytics.sourceTopTokens(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "per-group top-k must truncate before the window sort (WindowGroupLimit)")
  }

  // ---------------------------------------------------------------- q144

  test("q144: sampler table matches an independent unigram^0.75 recompute with contiguous ranges") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val counts = docs.flatMap(toks).groupBy(identity).map { case (t, ts) => (t, ts.length.toLong) }
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(graft.ops.Sampling.NegSampleK)
      .map { case (t, c) =>
        (t, c, math.floor(math.sqrt(c.toDouble * math.sqrt(c.toDouble)) * 1000.0).toLong) }
    val tw = top.map(_._3).sum
    var cum = 0L
    val expected = top.zipWithIndex.map { case ((t, c, wt), i) =>
      val start = cum * 1000L / tw; cum += wt
      (i + 1L, t, c, wt, start, cum * 1000L / tw)
    }
    val got = graft.ops.Sampling.negativeSamplingTable(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("tok"), r.getAs[Long]("cnt"),
        r.getAs[Long]("weight"), r.getAs[Long]("cum_start_permille"),
        r.getAs[Long]("cum_end_permille"))).toSeq
    assert(got == expected)
    // the ranges tile [0, 1000] with no gaps: a uniform permille draw
    // always lands in exactly one token's range
    assert(got.head._5 == 0L && got.last._6 == 1000L)
    got.sliding(2).foreach { case Seq(a, b) => assert(a._6 == b._5, s"gap at rank ${b._1}") }
    // ^0.75 flattens: the top token's share of weight is strictly below
    // its share of raw counts
    val topShareW = got.head._4.toDouble / got.map(_._4).sum
    val topShareC = got.head._3.toDouble / got.map(_._3).sum
    assert(topShareW < topShareC)
  }

  // ----------------------------------------------------- plan shapes

  test("new pair-join operators never fall back to a cross product") {
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val plans = Map(
      "q128" -> planOf(graft.ops.Dedup.winnowPairs(spark, sf0001, graft.ops.Dedup.OracleHashBits)),
      "q136" -> planOf(graft.ops.Dedup.simhashSweep(spark, sf0001, graft.ops.Dedup.OracleHashBits)),
      "q138" -> planOf(graft.ops.Dedup.cdcDedup(spark, sf0001)))
    plans.foreach { case (q, p) =>
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product in plan")
    }
    // q136's signature all-pairs join is the DOCUMENTED bounded-constant
    // exception (2^16 space), so it may nested-loop — but q128/q138 must not
    Seq("q128", "q138").foreach { q =>
      assert(!plans(q).contains("BroadcastNestedLoopJoin"), s"$q: nested loop in plan")
    }
  }

  test("q127: rankings collapse via physical top-k, not a corpus-wide window") {
    val plan = graft.ops.Hybrid.rrfHybrid(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "candidate selection should be orderBy+limit (TakeOrderedAndProject)")
  }
}
