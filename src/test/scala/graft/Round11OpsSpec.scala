package graft

import org.apache.spark.sql.functions._

/** Round-11 operator specs: q173–q176 (diagonal Mahalanobis outliers,
  * Efraimidis–Spirakis weighted reservoir, interpolated Kneser–Ney
  * cross-entropy, bounded GSP sequential patterns). Each operator is
  * oracle-green at sf0.01; these specs replay the full arithmetic
  * against independent in-test references at sf0.001 and pin the edge
  * arms the oracle corpus cannot reach — zero/negative variance dims,
  * the u = 1 log edge, the P <= 1 invariant, session set-semantics. */
class Round11OpsSpec extends SparkSpec {

  /** Test-side twin of graft.core.Hash32 (plain JVM, no Spark). */
  private def hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  // ---------------------------------------------------------------- q173

  test("q173: sf0.001 top-k matches an independent in-test Mahalanobis replay (floor grid incl.)") {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("int"),
        transform(col("embedding"), x => floor(x.cast("double") * lit(1e6)).cast("long")).as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val dims = rows.head._3.length
    val n = rows.length.toLong
    val mus = new Array[Long](dims)
    val vrs = new Array[Long](dims)
    for (d <- 0 until dims) {
      val xs = rows.map(_._3(d))
      val mu = math.floor(xs.sum.toDouble / n).toLong
      val m2 = math.floor(xs.map(x => x * x).sum.toDouble / n).toLong
      mus(d) = mu; vrs(d) = m2 - mu * mu
    }
    val expected = rows.map { case (id, lbl, v) =>
      var acc = 0L
      for (d <- 0 until dims) if (vrs(d) > 0L) {
        val dx = v(d) - mus(d)
        acc += dx * dx * 1000L / vrs(d)
      }
      (id, lbl, acc)
    }.sortBy { case (id, _, s) => (-s, id) }
      .take(graft.ops.Similarity.OutlierTopK)
      .zipWithIndex.map { case ((id, lbl, s), i) => (i + 1L, id, lbl, s) }.toSeq
    val got = graft.ops.Similarity.embedOutliers(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Int]("label"), r.getAs[Long]("score_milli"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q173: zero and negative variance dimensions contribute 0 by rule, not a crash") {
    import spark.implicits._
    val got = Seq(Tuple1(Array(10L, 20L, 30L))).toDF("v")
      .select(graft.functions.MahalanobisMilli(col("v"),
        typedLit(Seq(0L, 0L, 0L)), typedLit(Seq(4L, 0L, -5L))).as("s"))
      .head.getLong(0)
    // dim0: 100*1000/4 = 25000; dim1 var=0 and dim2 var<0 contribute 0
    assert(got == 25000L)
  }

  // ---------------------------------------------------------------- q174

  test("q174: sf0.001 reservoir matches an independent in-test A-Res key replay") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
      .filter(_._2 >= 1L)
    val expected = docs.map { case (id, w) =>
      val h20 = (hash32(id.toString) >> 12) + 1L
      val nl2 = (20L << 16) - graft.functions.FixedLog2.q16(h20)
      (id, w, (nl2 << 20) / w)
    }.sortBy { case (id, _, k) => (k, id) }
      .take(graft.ops.Sampling.ReservoirK)
      .zipWithIndex.map { case ((id, w, k), i) => (i + 1L, id, w, k) }.toSeq
    val got = graft.ops.Sampling.weightedReservoir(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("w"), r.getAs[Long]("es_key"))).toSeq
    assert(got == expected)
    assert(got.size == graft.ops.Sampling.ReservoirK)
  }

  test("q174: the u = 1 edge (h20 = 2^20) maps to key 0 — certain selection at any weight") {
    assert(graft.functions.FixedLog2.q16(1L << 20) == (20L << 16))
    // nl2 = 0 -> es_key = 0 for every w >= 1: the key grid's floor
    // never pushes a certain pick out of the reservoir
  }

  // ---------------------------------------------------------------- q175

  test("q175: sf0.001 per-source cross-entropy matches an independent in-test KN replay; P <= 1 holds") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def bigrams(t: String): Seq[(String, String)] = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      toks.dropRight(1).zip(toks.drop(1)).toSeq
    }
    val srcTf = docs.flatMap { case (s, t) => bigrams(t).map(b => (s, b)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c12 = srcTf.groupBy { case ((_, b), _) => b }.view
      .mapValues(_.values.sum).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nctx = c12.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nword = c12.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nall = c12.size.toLong
    val perSource = srcTf.toSeq.map { case ((src, (w1, w2)), tf) =>
      val num = (4L * c12((w1, w2)) - 3L) * nall + 3L * nctx(w1) * nword(w2)
      val den = 4L * c1(w1) * nall
      assert(num >= 1L && num <= den,
        s"P_KN out of (0, 1] for ($w1,$w2): num=$num den=$den")
      (src, tf, tf * (graft.functions.FixedLog2.q16(den) - graft.functions.FixedLog2.q16(num)))
    }.groupBy(_._1).view.mapValues { ts =>
      (ts.map(_._2).sum, ts.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val expected = perSource.map { case (src, (nb, s)) =>
      (src, nb, s, s * 1000L / (nb * 65536L))
    }
    val got = graft.ops.TextAnalytics.knBigramXent(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("sum_log2_q16"), r.getAs[Long]("xent_milli_bits"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  // ---------------------------------------------------------------- q184

  /** Independent constellation replay: energies/peaks/hashes/df-cap/
    * votes recomputed in plain Scala from the raw text bytes. */
  private def constellationReference(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long)] = {
    val W = graft.ops.Multimodal.AudioWindows
    def energies(text: String): Array[Long] = {
      val bytes = text.getBytes("UTF-8")
      Array.tabulate(W) { w =>
        val lo = w * bytes.length / W
        val hi = (w + 1) * bytes.length / W
        if (hi <= lo) 0L else bytes.slice(lo, hi).map(b => (b & 0xff).toLong).sum / (hi - lo)
      }
    }
    val hashes = docs.flatMap { case (id, text) =>
      val e = energies(text)
      val peaks = (1 until W - 1).filter(w => e(w) > e(w - 1) && e(w) >= e(w + 1))
      for {
        i <- peaks.indices; j <- (i + 1) until peaks.length
        if peaks(j) - peaks(i) <= graft.ops.Multimodal.ConstellationZone
      } yield (id, peaks(i),
        e(peaks(i)) / graft.ops.Multimodal.ConstellationQuant,
        e(peaks(j)) / graft.ops.Multimodal.ConstellationQuant,
        peaks(j) - peaks(i))
    }
    val keep = hashes.groupBy { case (_, _, q1, q2, dt) => (q1, q2, dt) }
      .filter { case (_, hs) => hs.map(_._1).distinct.size <=
        graft.ops.Multimodal.ConstellationHashDfCap }
      .keySet
    val kept = hashes.filter { case (_, _, q1, q2, dt) => keep((q1, q2, dt)) }
    val votes = (for {
      x <- kept; y <- kept
      if x._1 < y._1 && (x._3, x._4, x._5) == ((y._3, y._4, y._5))
    } yield (x._1, y._1, (x._2 - y._2).toLong))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    votes.groupBy { case ((a, b, _), _) => (a, b) }.flatMap { case ((a, b), vs) =>
      val ((_, _, off), v) = vs.minBy { case ((_, _, o), n) => (-n, o) }
      if (v >= graft.ops.Multimodal.ConstellationMinVotes) Some((a, b, off, v)) else None
    }.toSeq.sortBy { case (a, b, _, _) => (a, b) }
  }

  test("q184: sf0.001 matches an independent in-test constellation replay") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 == 1)
    val expected = constellationReference(docs.toSeq)
    val got = graft.ops.Multimodal.audioConstellation(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"),
        r.getAs[Long]("offset"), r.getAs[Long]("votes"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q184: a clip time-shifted by two windows is matched AT offset -2 (the landmark claim)") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q184-shift")
    val s = 6 // block size; 17 equal blocks align exactly with windows
    def clip(levels: Seq[Int]): String = levels.map(l => l.toChar.toString * s).mkString
    val a = Seq(40, 80, 40, 70, 40, 90, 40, 75, 40, 85, 40, 65, 40, 95, 40, 60, 40)
    val b = Seq(37, 37) ++ a.take(15) // two pad blocks, content shifted right 2 windows
    Seq((1L, clip(a), "en", "s0"), (4L, clip(b), "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Multimodal.audioConstellation(spark, dir).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"),
        r.getAs[Long]("offset"), r.getAs[Long]("votes")))
    assert(got.length == 1)
    val (ma, mb, off, votes) = got.head
    assert((ma, mb, off) == ((1L, 4L, -2L)),
      s"the offset histogram must localize the 2-window shift: got $got")
    assert(votes >= 5L, s"aligned landmarks must pile up at the true offset: $votes")
  }

  // ---------------------------------------------------------------- q176

  /** Independent containment reference: brute-force i<j (and i<j<k)
    * enumeration — O(n^3) per session, obviously correct, shares no
    * code with the operator's greedy first-occurrence emission. */
  private def bruteSupported(s: Array[String]): Set[(String, String, String)] = {
    val out = collection.mutable.Set.empty[(String, String, String)]
    for (i <- s.indices; j <- (i + 1) until s.length) {
      out += ((s(i), s(j), null))
      for (k <- (j + 1) until s.length) out += ((s(i), s(j), s(k)))
    }
    out.toSet
  }

  test("q176: sf0.001 support table matches a brute-force i<j<k containment reference") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val sessions = ev.groupBy { case (u, us, _, _) => (u, us / 3600000000L) }
      .values.map(_.sortBy { case (_, us, eid, _) => (us, eid) }.map(_._4).toArray)
    val support = sessions.toSeq.flatMap(s => bruteSupported(s).toSeq)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val expected = support.map { case ((a, b, c), n) =>
      val pat = if (c == null) s"$a>$b" else s"$a>$b>$c"
      val len = if (c == null) 2L else 3L
      (pat, len, n)
    }.sortBy { case (p, _, n) => (-n, p) }
      .take(graft.ops.Events.SeqPatternTopK.toInt)
    val got = graft.ops.Events.seqPatterns(spark, sf0001).collect()
      .map(r => (r.getAs[String]("pattern"), r.getAs[Long]("len"),
        r.getAs[Long]("support"))).toSeq
    assert(got == expected)
    assert(got.size == graft.ops.Events.SeqPatternTopK.toInt)
    // the set-semantics claim must actually be exercised by the corpus:
    // some session repeats a type
    assert(sessions.exists(s => s.length != s.distinct.length))
  }

  // ---------------------------------------------------------------- q177

  test("q177: sf0.001 report matches a plain-Scala recomposition of graph pairs x hash splits") {
    val path = graft.ops.Dedup.preparedDedupGraph(spark, sf0001, graft.ops.Dedup.OracleHashBits)
    val pairs = graft.ops.Dedup.loadGraphPairs(spark, path).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter") * 1000L / r.getAs[Long]("uni")))
    def split(id: Long): String = {
      val b = ((hash32(id.toString) % 100) + 100) % 100
      if (b < graft.ops.Sampling.TrainPct) "train"
      else if (b < graft.ops.Sampling.TrainPct + graft.ops.Sampling.ValPct) "val"
      else "test"
    }
    val expected = pairs.map { case (a, b, j) =>
      val (lo, hi) = {
        val (sa, sb) = (split(a), split(b))
        if (sa <= sb) (sa, sb) else (sb, sa)
      }
      (lo, hi, j, a, b)
    }.groupBy { case (lo, hi, _, _, _) => (lo, hi) }
      .map { case ((lo, hi), rs) =>
        (lo, hi, if (lo != hi) 1L else 0L, rs.length.toLong,
          rs.flatMap(r => Seq(r._4, r._5)).distinct.length.toLong,
          rs.map(_._3).max)
      }.toSeq.sortBy { case (lo, hi, _, _, _, _) => (lo, hi) }
    val got = graft.ops.Sampling.splitLeakage(spark, sf0001).collect()
      .map(r => (r.getAs[String]("split_lo"), r.getAs[String]("split_hi"),
        r.getAs[Long]("leak"), r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("max_jaccard_permille"))).toSeq
    assert(got == expected)
    assert(got.exists(_._3 == 1L), "the sf0.001 corpus must actually exhibit leakage")
  }

  test("q177: a planted near-dup pair straddling train/test surfaces as a leak row") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q177-planted")
    def splitOf(id: Long): Long = ((hash32(id.toString) % 100) + 100) % 100
    val trainId = (0L to 500L).find(id => splitOf(id) < graft.ops.Sampling.TrainPct).get
    val testId = (0L to 500L).find(id => splitOf(id) >= graft.ops.Sampling.TrainPct + graft.ops.Sampling.ValPct).get
    val para = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (trainId, para + " trailer alpha", "en", "s0"),
      (testId, para + " trailer beta", "en", "s0"),
      // unique filler so the corpus is not a single family
      (900001L, (1 to 60).map(i => s"other$i").mkString(" "), "en", "s1"),
      (900002L, (1 to 60).map(i => s"misc$i").mkString(" "), "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Sampling.splitLeakage(spark, dir).collect()
      .map(r => (r.getAs[String]("split_lo"), r.getAs[String]("split_hi"),
        r.getAs[Long]("leak"), r.getAs[Long]("n_pairs")))
    assert(got.contains(("test", "train", 1L, 1L)),
      s"the planted train/test near-dup must surface: ${got.mkString(", ")}")
  }

  // ------------------------------------------------------------ q180/q181

  /** Fixture shared by q180/q181: a frozen corpus plus a 5-doc wave
    * exercising every guard arm. Returns the dir, the doc rows, and the
    * named wave ids. */
  private def splitGuardFixture(name: String)
      : (String, Seq[(Long, String, String, String)], Map[String, Long]) = {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir(name)
    def bucket(id: Long): Long = ((hash32(id.toString) % 100) + 100) % 100
    val trainPct = graft.ops.Sampling.TrainPct
    val testFloor = trainPct + graft.ops.Sampling.ValPct
    def findId(from: Long, pred: Long => Boolean): Long =
      Iterator.iterate(from)(_ + 1).find(pred).get
    val cTrain = findId(0L, id => bucket(id) < trainPct)
    val wTest1 = findId(1000L, id => bucket(id) >= testFloor)
    val cTrain2 = findId(cTrain + 1, id => bucket(id) < trainPct)
    val wTrain2 = findId(2000L, id => bucket(id) < trainPct)
    val wTrain3 = findId(wTrain2 + 1, id => bucket(id) < trainPct)
    val wTest3 = findId(wTest1 + 1, id => bucket(id) >= testFloor)
    val wNovel = findId(3000L, id => bucket(id) < trainPct)
    def para(p: String) = (1 to 60).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      // frozen corpus
      (cTrain, para("aa") + " tail one", "en", "web"),
      (cTrain2, para("bb") + " tail one", "en", "web"),
      (8888888L, para("zz"), "en", "web"),
      // incoming wave (src0)
      (wTest1, para("aa") + " tail two", "en", "src0"),   // cross-split vs corpus -> quarantine
      (wTrain2, para("bb") + " tail two", "en", "src0"),  // same-split dup -> dedup_same_split
      (wTrain3, para("cc") + " tail one", "en", "src0"),  // wave-internal pair, train side
      (wTest3, para("cc") + " tail two", "en", "src0"),   // wave-internal pair, test side
      (wNovel, para("qq"), "en", "src0"))                 // novel -> admit
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (dir, docs, Map("wTest1" -> wTest1, "wTrain2" -> wTrain2,
      "wTrain3" -> wTrain3, "wTest3" -> wTest3, "wNovel" -> wNovel))
  }

  private def guardRows(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (String, Long, Long, Long, String)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("own_split"), r.getAs[Long]("n_dup_matches"),
        r.getAs[Long]("n_cross_split"), r.getAs[Long]("max_cross_permille"),
        r.getAs[String]("verdict")))).toMap

  test("q180: quarantine/dedup/admit arms all fire, including the wave-internal cross-split leak") {
    val (dir, _, ids) = splitGuardFixture("q180-arms")
    val got = guardRows(
      graft.ops.Dedup.admissionSplitGuard(spark, dir, graft.ops.Dedup.OracleHashBits))
    assert(got(ids("wTest1"))._5 == "quarantine" && got(ids("wTest1"))._1 == "test")
    assert(got(ids("wTrain2"))._5 == "dedup_same_split" && got(ids("wTrain2"))._3 == 0L)
    assert(got(ids("wTrain3"))._5 == "quarantine",
      "two wave docs routed apart leak exactly like a wave-corpus pair")
    assert(got(ids("wTest3"))._5 == "quarantine")
    assert(got(ids("wNovel")) == (("train", 0L, 0L, 0L, "admit")))
  }

  test("q181: a 3-micro-batch wave replay is row-identical to batch q180 (cross-batch pair included)") {
    import spark.implicits._
    val (dir, docs, ids) = splitGuardFixture("q181-stream")
    // the wave, split so the wave-internal pair's endpoints arrive in
    // DIFFERENT micro-batches — only the prior-summary arm can pair them
    val waveSrc = graft.streaming.StreamScratch.dir("q181-wavesrc")
    val batches = Seq(
      Seq(ids("wTest1"), ids("wTrain3")),
      Seq(ids("wTrain2"), ids("wTest3")),
      Seq(ids("wNovel")))
    val byId = docs.map(d => d._1 -> d).toMap
    batches.zipWithIndex.foreach { case (idsIn, i) =>
      val tmp = graft.streaming.StreamScratch.dir(s"q181-b$i")
      idsIn.map(byId).toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(waveSrc, s"wave$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val streamed = guardRows(graft.streaming.DedupStream.splitGuardStream(
      spark, dir, streamSrc = Some(waveSrc), filesPerTrigger = Some(1)))
    val batch = guardRows(
      graft.ops.Dedup.admissionSplitGuard(spark, dir, graft.ops.Dedup.OracleHashBits))
    assert(streamed == batch)
    assert(streamed(ids("wTrain3"))._5 == "quarantine" &&
      streamed(ids("wTest3"))._5 == "quarantine",
      "the cross-batch wave pair must surface through the prior-summary arm")
  }

  // ---------------------------------------------------------------- q178

  test("q178: sf0.001 collocations match an independent in-test PMI replay; min-count floor holds") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val bf = docs.flatMap { t =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      toks.dropRight(1).zip(toks.drop(1))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val c2 = bf.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = bf.values.sum
    val expected = bf.toSeq
      .filter { case (_, c12) => c12 >= graft.ops.TextAnalytics.PmiMinCount }
      .map { case ((w1, w2), c12) =>
        val pmi = graft.functions.FixedLog2.q16(c12 * n) -
          graft.functions.FixedLog2.q16(c1(w1) * c2(w2))
        (w1, w2, c12, pmi)
      }.sortBy { case (w1, w2, _, p) => (-p, w1, w2) }
      .take(graft.ops.TextAnalytics.PmiTopK)
      .zipWithIndex.map { case ((w1, w2, c12, p), i) => (i + 1L, w1, w2, c12, p) }
    val got = graft.ops.TextAnalytics.pmiCollocations(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c12"), r.getAs[Long]("pmi_q16"))).toSeq
    assert(got == expected)
    assert(got.forall(_._4 >= graft.ops.TextAnalytics.PmiMinCount))
  }

  // ---------------------------------------------------------------- q182

  test("q182: sf0.001 exponents match an independent in-test Heaps replay") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty)
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val half = ds.filter { case (id, _, _) => hash32(id.toString) % 2 == 0 }
      val n1 = half.map(d => toks(d._3).length.toLong).sum
      val v1 = half.flatMap(d => toks(d._3)).distinct.length.toLong
      val n2 = ds.map(d => toks(d._3).length.toLong).sum
      val v2 = ds.flatMap(d => toks(d._3)).distinct.length.toLong
      val den =
        if (n1 == 0) 0L
        else graft.functions.FixedLog2.q16(n2) - graft.functions.FixedLog2.q16(n1)
      val beta =
        if (n1 == 0 || den <= 0) -1L
        else (graft.functions.FixedLog2.q16(v2) - graft.functions.FixedLog2.q16(v1)) * 1000L / den
      (src, n1, v1, n2, v2, beta)
    }.toSeq.sortBy(_._1)
    val got = graft.ops.TextAnalytics.heapsLaw(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n1"), r.getAs[Long]("v1"),
        r.getAs[Long]("n2"), r.getAs[Long]("v2"), r.getAs[Long]("beta_milli"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q182: an open-vocabulary source reads beta near 1000; a closed template source reads 0") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q182-planted")
    // 'openv': every doc contributes brand-new tokens (vocab grows
    // linearly with tokens -> beta ~ 1000); 'tmpl': one fixed 20-token
    // template repeated (vocab saturates immediately -> beta 0)
    val docs = (0L until 40L).map { i =>
      (i, (0 until 25).map(j => s"uniq_${i}_$j").mkString(" "), "en", "openv")
    } ++ (100L until 140L).map { i =>
      (i, (0 until 20).map(j => s"t$j").mkString(" "), "en", "tmpl")
    }
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalytics.heapsLaw(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("beta_milli")).toMap
    assert(got("openv") == 1000L,
      s"all-unique tokens: V doubles exactly as N does -> beta exactly 1000, got ${got("openv")}")
    assert(got("tmpl") == 0L,
      s"fixed template: V1 = V2 -> beta 0, got ${got("tmpl")}")
  }

  test("floor-grid kernel: moments stay exact past i64 AND past the double mantissa") {
    import spark.implicits._
    // per-row squares fit i64; the 3-row SUM (~1.2e19) exceeds BOTH
    // Long.MaxValue (a wrapping accumulator would zero the variance)
    // and 2^53 (a double-division path would lose the low ~10 bits —
    // the mixed values make exact and double results provably differ)
    val xs = Seq(2000000000L, 2000000000L, 2000000001L)
    val df = xs.map(("g", _)).toDF("g", "x")
    val r = graft.ops.FloorGrid.moments(df, Seq(col("g")), col("x")).collect().head
    val s = xs.map(BigInt(_)).sum
    val ss = xs.map(x => BigInt(x) * BigInt(x)).sum
    val mu = (s / 3).toLong
    val m2 = (ss / 3).toLong
    assert(m2 != math.floor(ss.doubleValue / 3).toLong,
      "probe self-check: this case must distinguish exact from double division")
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("mu") == mu)
    assert(r.getAs[Long]("vr") == m2 - mu * mu,
      s"vr must come from EXACT integer division of the 1.2e19 sum, got ${r.getAs[Long]("vr")}")
    // the negative-sum floor adjustment (q173's embedding sums go
    // negative): floor(-7/3) = -3, not the truncating -2
    val neg = Seq(("h", -7L), ("h", 0L), ("h", 0L)).toDF("g", "x")
    val rn = graft.ops.FloorGrid.moments(neg, Seq(col("g")), col("x")).collect().head
    assert(rn.getAs[Long]("mu") == -3L,
      s"first-moment division must FLOOR on negatives, got ${rn.getAs[Long]("mu")}")
  }

  // ---------------------------------------------------------------- q183

  test("q183: sf0.001 allocation matches an independent Neyman/Hamilton replay; budget exact") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Long]("n_chars")))
    val k = graft.ops.Sampling.NeymanK
    def isqrt(v: Long): Long = {
      var s = math.floor(math.sqrt(v.toDouble)).toLong
      while ((s + 1) * (s + 1) <= v) s += 1
      while (s * s > v) s -= 1
      s
    }
    val stats = docs.groupBy(_._2).map { case (lang, ds) =>
      val n = ds.length.toLong
      val mu = math.floor(ds.map(_._3).sum.toDouble / n).toLong
      val m2 = math.floor(ds.map(d => d._3 * d._3).sum.toDouble / n).toLong
      (lang, n, isqrt(math.max(m2 - mu * mu, 0L)))
    }.toSeq.sortBy(_._1)
    val wtot = stats.map { case (_, n, s) => n * s }.sum
    val wx = stats.map { case (lang, n, s) => (lang, n, s, if (wtot > 0) n * s else n) }
    val wsum = wx.map(_._4).sum
    val base = wx.map { case (lang, n, s, w) => (lang, n, s, k * w / wsum, k * w - (k * w / wsum) * wsum) }
    val extra = k - base.map(_._4).sum
    val winners = base.sortBy { case (lang, _, _, _, rem) => (-rem, lang) }
      .take(extra.toInt).map(_._1).toSet
    val alloc = base.map { case (lang, n, s, b, _) =>
      (lang, n, s, b + (if (winners.contains(lang)) 1L else 0L))
    }
    val expected = alloc.map { case (lang, n, s, a) =>
      val pick = docs.filter(_._2 == lang)
        .sortBy { case (id, _, _) => (hash32(id.toString), id) }
        .take(a.toInt)
      (lang, n, s, a, pick.length.toLong, pick.map(_._3).sum)
    }
    val got = graft.ops.Sampling.neymanAlloc(spark, sf0001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"), r.getAs[Long]("sigma"),
        r.getAs[Long]("n_alloc"), r.getAs[Long]("n_picked"), r.getAs[Long]("picked_chars"))).toSeq
    assert(got == expected)
    assert(got.map(_._4).sum == k, "Hamilton apportionment must spend the budget exactly")
  }

  test("q183: all-constant strata fall back to proportional allocation (zero total weight)") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q183-const")
    // every doc in each stratum has IDENTICAL length -> sigma 0 for all
    val docs = (0L until 30L).map(i => (i, "x " * 10, "en", "s0")) ++
      (100L until 110L).map(i => (i, "y " * 10, "de", "s1"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Sampling.neymanAlloc(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_alloc")).toMap
    val k = graft.ops.Sampling.NeymanK
    assert(got("en") == k * 30 / 40 && got("de") == k - got("en"),
      s"zero total weight must apportion by stratum size: $got")
  }

  // ---------------------------------------------------------------- q179

  test("q179: a 4-micro-batch replay folds to the EXACT batch reservoir (top-k is a monoid)") {
    import spark.implicits._
    val src = graft.streaming.StreamScratch.dir("q179-multibatch")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
    docs.grouped(math.max(1, docs.length / 4 + 1)).zipWithIndex.foreach { case (part, i) =>
      val tmp = graft.streaming.StreamScratch.dir(s"q179-part$i")
      part.toSeq.toDF("doc_id", "n_chars").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(src, s"batch$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val streamed = graft.streaming.SampleStream
      .reservoirStream(spark, sf0001, streamSrc = Some(src), filesPerTrigger = Some(1))
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("w"), r.getAs[Long]("es_key"))).toSeq
    val batch = graft.ops.Sampling.weightedReservoir(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("w"), r.getAs[Long]("es_key"))).toSeq
    assert(streamed == batch)
  }

  test("q176: repeats inside one session count once (GSP session support, not occurrences)") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q176-repeats")
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 05:$m%02d:00")
    // u1's session <a,a,b>: supports a>a, a>b, a>a>b — once each,
    // though a>b embeds twice; u2's <a,b> supports a>b only
    Seq((at(1), 1L, 1L, "a"), (at(2), 2L, 1L, "a"), (at(3), 3L, 1L, "b"),
        (at(4), 4L, 2L, "a"), (at(5), 5L, 2L, "b"))
      .toDF("ts", "event_id", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.Events.seqPatterns(spark, dir).collect()
      .map(r => (r.getAs[String]("pattern"), r.getAs[Long]("len"), r.getAs[Long]("support"))).toSeq
    assert(got == Seq(("a>b", 2L, 2L), ("a>a", 2L, 1L), ("a>a>b", 3L, 1L)))
  }
}
