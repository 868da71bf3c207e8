package graft

import org.apache.spark.sql.functions._
import graft.ops.Privacy

/** The privacy/linkage family (q188-q190), each pinned against an
  * INDEPENDENT in-test reference computed from first principles on a
  * crafted fixture. The one shared primitive the q190 reference reuses
  * is FixedLog2.q16 — reimplementing it with libm doubles would differ
  * by design (that non-portability is exactly why the kernel exists);
  * its own exactness is property-tested in PropertySpec. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- q188

  test("q188: k-anonymity/l-diversity audit matches a brute-force reference on a crafted registry") {
    // nation 0: a 6-strong class (safe), a 2-strong class (suppress),
    //   and a singleton (suppress); the 6-strong class has only two
    //   distinct balances -> l-diversity violation (l=2 < 3)
    // nation 1: one 5-strong class, all-distinct balances (fully safe)
    val rows = Seq(
      (1L, "c1", 0, 100.0, "AUTO"), (2L, "c2", 0, 100.0, "AUTO"),
      (3L, "c3", 0, 150.0, "AUTO"), (4L, "c4", 0, 150.0, "AUTO"),
      (5L, "c5", 0, 150.0, "AUTO"), (6L, "c6", 0, 100.0, "AUTO"),
      (7L, "c7", 0, 100.0, "BIKE"), (8L, "c8", 0, 200.0, "BIKE"),
      (9L, "c9", 0, 1100.0, "AUTO"),
      (10L, "d1", 1, 10.0, "AUTO"), (11L, "d2", 1, 20.0, "AUTO"),
      (12L, "d3", 1, 30.0, "AUTO"), (13L, "d4", 1, 40.0, "AUTO"),
      (14L, "d5", 1, 50.0, "AUTO"))
    val dir = graft.streaming.StreamScratch.dir("priv-kanon")
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    // independent reference: literal Sweeney/Machanavajjhala definitions
    val classes = rows.groupBy(r =>
        (r._3, r._5, math.floor(r._4 / Privacy.BalBand).toLong))
      .map { case (qi, members) =>
        (qi._1, members.size.toLong, members.map(_._4).distinct.size.toLong) }
      .toSeq
    val expect = classes.groupBy(_._1).map { case (nat, cs) =>
      nat -> (cs.map(_._2).sum, cs.size.toLong, cs.map(_._2).min,
        cs.count(_._2 < Privacy.KAnonK).toLong,
        cs.filter(_._2 < Privacy.KAnonK).map(_._2).sum,
        cs.map(_._3).min, cs.count(_._3 < Privacy.KAnonL).toLong)
    }

    val got = Privacy.kAnonAudit(spark, dir).collect()
    assert(got.length == 2)
    got.foreach { r =>
      val (nRows, nClasses, minClass, belowK, suppressed, minL, belowL) =
        expect(r.getAs[Int]("c_nationkey"))
      assert(r.getAs[Long]("n_rows") == nRows)
      assert(r.getAs[Long]("n_classes") == nClasses)
      assert(r.getAs[Long]("min_class") == minClass)
      assert(r.getAs[Long]("classes_below_k") == belowK)
      assert(r.getAs[Long]("rows_suppressed") == suppressed)
      assert(r.getAs[Long]("min_l") == minL)
      assert(r.getAs[Long]("classes_below_l") == belowL)
      assert(r.getAs[Long]("suppressed_permille") == suppressed * 1000 / nRows)
    }
    // the crafted semantics: nation 0 must suppress 3 of 9 rows and
    // flag the homogeneous class; nation 1 is fully safe
    val n0 = got.find(_.getAs[Int]("c_nationkey") == 0).get
    assert(n0.getAs[Long]("rows_suppressed") == 3)
    assert(n0.getAs[Long]("classes_below_l") >= 1)
    val n1 = got.find(_.getAs[Int]("c_nationkey") == 1).get
    assert(n1.getAs[Long]("rows_suppressed") == 0)
    assert(n1.getAs[Long]("min_l") == 5)
  }

  // ---------------------------------------------------------------- q189

  /** Independent replay of the seeded two-sided-geometric draw: java
    * MessageDigest md5 -> hex-nibble fold (the Hash32 construction,
    * re-derived rather than imported) -> Bernoulli(2/3) trials ->
    * leading-run difference. */
  private def noiseRef(source: String, lang: String): Long = {
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(8).foldLeft(0L)((a, c) => a * 16 + java.lang.Long.parseLong(c.toString, 16))
    }
    def run(side: String): Long = {
      val firstFail = (1L to Privacy.DpTrials).find { t =>
        h32(s"$source|$lang|$side|$t") % 3 >= 2
      }
      firstFail.map(_ - 1).getOrElse(Privacy.DpTrials)
    }
    run("p") - run("n")
  }

  test("q189: DP histogram noise matches the first-principles geometric replay; release clamps at zero") {
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, s"tok$i a b c", if (i % 3 == 0) "en" else "de",
        s"s${i % 4}", 10L))
    val dir = graft.streaming.StreamScratch.dir("priv-dp")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val trueCounts = docs.groupBy(d => (d._4, d._3)).view.mapValues(_.size.toLong).toMap

    val got = Privacy.dpHistogram(spark, dir).collect()
    assert(got.length == trueCounts.size)
    got.foreach { r =>
      val (src, lang) = (r.getAs[String]("source"), r.getAs[String]("lang"))
      val n = r.getAs[Long]("n_docs")
      val noise = r.getAs[Long]("noise")
      assert(n == trueCounts((src, lang)))
      assert(noise == noiseRef(src, lang), s"$src/$lang")
      assert(math.abs(noise) <= 2 * Privacy.DpTrials)
      assert(r.getAs[Long]("released") == math.max(n + noise, 0L))
    }
    // the mechanism must actually perturb: a seeded draw that returned
    // zero for every key would be a broken hash, not privacy
    assert(got.map(_.getAs[Long]("noise")).distinct.length >= 2)
  }

  // ---------------------------------------------------------------- q190

  /** Brute-force Fellegi-Sunter reference: literal pair enumeration,
    * gamma patterns, add-one-smoothed clamped ppm estimates, Q16 log2
    * weights, decision bands. `refined = true` restates the production
    * hierarchical-blocking rule literally: a coarse nb32 block larger
    * than LinkSplitThreshold re-keys by the min md5-hashed token. */
  private def fsRef(docs: Seq[(Long, String, String)],
                    refined: Boolean = false):
      Map[Long, (Long, Long, Long, String)] = { // pattern -> (nPairs, nMatch, weight, band)
    import graft.functions.FixedLog2
    val byText = docs.groupBy(_._2).filter(_._2.size >= 2)
    val label = byText.values.flatMap { g =>
      val root = g.map(_._1).min; g.map(d => d._1 -> root) }.toMap
    case class P(gs: Seq[Boolean], m: Boolean)
    def toks(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def minTok(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = toks(s).map(t =>
        md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      if (hs.isEmpty) "" else hs.min
    }
    val coarseSize = docs.groupBy(_._2.length / 32).view.mapValues(_.size).toMap
    def sub(d: (Long, String, String)): String =
      if (refined && coarseSize(d._2.length / 32) > Privacy.LinkSplitThreshold)
        minTok(d._2)
      else ""
    val pairs = for {
      a <- docs; b <- docs if a._1 < b._1
      if a._2.length / 32 == b._2.length / 32 // same (lang, nb32) block
      if sub(a) == sub(b)
    } yield {
      val (ta, tb) = (toks(a._2), toks(b._2))
      P(Seq(a._3 == b._3,
          ta.take(6).mkString(" ") == tb.take(6).mkString(" "),
          ta.reverse.take(6).mkString(" ") == tb.reverse.take(6).mkString(" "),
          a._2.length / 4 == b._2.length / 4),
        label.get(a._1).exists(la => label.get(b._1).contains(la)))
    }
    val nm = pairs.count(_.m).toLong
    val nu = pairs.size - nm
    def clamp(x: Long) = math.min(math.max(x, 1L), 999999L)
    val wts = (0 until 4).map { i =>
      val am = pairs.count(p => p.m && p.gs(i)).toLong
      val au = pairs.count(p => !p.m && p.gs(i)).toLong
      val mp = clamp((am + 1) * 1000000L / (nm + 2))
      val up = clamp((au + 1) * 1000000L / (nu + 2))
      (FixedLog2.q16(mp) - FixedLog2.q16(up),
        FixedLog2.q16(1000000L - mp) - FixedLog2.q16(1000000L - up))
    }
    pairs.groupBy(_.gs).map { case (gs, ps) =>
      val pid = gs.zip(Seq(8L, 4L, 2L, 1L)).collect { case (true, v) => v }.sum
      val w = (0 until 4).map(i => if (gs(i)) wts(i)._1 else wts(i)._2).sum
      val band = if (w >= Privacy.LinkUpperQ16) "link"
        else if (w <= Privacy.LinkLowerQ16) "nonlink" else "review"
      pid -> ((ps.size.toLong, ps.count(_.m).toLong, w, band))
    }
  }

  test("q190: F-S pattern weights match the brute-force reference; full agreement links, full disagreement does not") {
    // two exact-dup families (the labeled match set) + two distinct
    // docs, all inside one 32-char length band so they block together;
    // token sets are disjoint across families (no near-dup edges).
    // Lengths: A=44, B=40, C=42, D=47 chars -> one block, mixed nb4.
    val tA = "alpha bravo charlie delta echo foxtrot golf"
    val tB = "kilo lima mike november oscar papa quebec"
    val tC = "romeo sierra tango uniform victor whiskey"
    val tD = "yankee zulu binary ternary quaternary penta"
    val docs = Seq(
      (1L, tA, "s1"), (2L, tA, "s1"), (3L, tA, "s2"),
      (10L, tB, "s1"), (11L, tB, "s3"),
      (20L, tC, "s1"), (21L, tD, "s2"))
    val dir = graft.streaming.StreamScratch.dir("priv-fs")
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val expect = fsRef(docs)
    val got = Privacy.fsLinkage(spark, dir, graft.ops.Dedup.OracleHashBits).collect()
    assert(got.map(_.getAs[Long]("pattern")).toSet == expect.keySet)
    got.foreach { r =>
      val pid = r.getAs[Long]("pattern")
      val (np, nmm, w, band) = expect(pid)
      assert(r.getAs[Long]("n_pairs") == np, s"pattern $pid")
      assert(r.getAs[Long]("n_match") == nmm, s"pattern $pid")
      assert(r.getAs[Long]("weight_q16") == w, s"pattern $pid")
      assert(r.getAs[String]("band") == band, s"pattern $pid")
    }
    // F-S semantics on this fixture: the all-agree pattern is the
    // within-source exact-dup pair and must band 'link' with positive
    // weight; the all-disagree pattern must carry negative weight
    val full = got.find(_.getAs[Long]("pattern") == 15L).get
    assert(full.getAs[String]("band") == "link")
    assert(full.getAs[Long]("weight_q16") > 0)
    val none = got.find(_.getAs[Long]("pattern") == 0L)
    none.foreach(r => assert(r.getAs[Long]("weight_q16") < 0))
  }

  test("q190: an oversized coarse block re-blocks by min-token subkey — cross-content pairs drop, dup families stay co-blocked") {
    // 300 docs in ONE (lang, nb32) coarse block (> LinkSplitThreshold =
    // 256): two 150-doc exact-dup families with disjoint token sets and
    // equal lengths. The hierarchical refinement must split the block
    // by content (min md5 token), so the 150x150 cross-family pairs are
    // never enumerated while every within-family pair survives.
    val tX = "alpha bravo charlie delta echo foxtrot golf hotel"
    val tY = "kilo lima mike november oscar papa quebec romeo x"
    assert(tX.length / 32 == tY.length / 32)
    val docs = (0 until 150).map(i => (i.toLong, tX, if (i % 2 == 0) "s1" else "s2")) ++
      (0 until 150).map(i => (1000L + i, tY, if (i % 3 == 0) "s1" else "s2"))
    val dir = graft.streaming.StreamScratch.dir("priv-fs-split")
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val expect = fsRef(docs, refined = true)
    val got = Privacy.fsLinkage(spark, dir, graft.ops.Dedup.OracleHashBits).collect()
    // only within-family pairs: 2 * C(150,2), none enumerated across
    assert(got.map(_.getAs[Long]("n_pairs")).sum == 2L * 150 * 149 / 2)
    // cross-family pairs would disagree on prefix (g2=false); within an
    // exact-dup family every non-source field agrees
    assert(got.forall(_.getAs[Boolean]("agree_prefix")))
    assert(got.map(_.getAs[Long]("pattern")).toSet == expect.keySet)
    got.foreach { r =>
      val pid = r.getAs[Long]("pattern")
      val (np, nmm, w, band) = expect(pid)
      assert(r.getAs[Long]("n_pairs") == np, s"pattern $pid")
      assert(r.getAs[Long]("n_match") == nmm, s"pattern $pid")
      assert(r.getAs[Long]("weight_q16") == w, s"pattern $pid")
      assert(r.getAs[String]("band") == band, s"pattern $pid")
    }
  }

  // ---------------------------------------------------------------- q191

  /** Literal recursive relaxed-Mondrian reference (LeFevre et al. 2006):
    * widest globally-normalized dimension by integer cross-mult, rank
    * split at ceil(n/2), cut refused when either side would drop below
    * k, depth capped at MondrianRounds. Returns final partitions as
    * id-sets with their generalized intervals. */
  private def mondrianRef(rows: Seq[(Long, Long, Long)]):
      Set[(Set[Long], (Long, Long, Long, Long), Boolean)] = {
    val db = rows.map(_._2).max - rows.map(_._2).min
    val dg = rows.map(_._3).max - rows.map(_._3).min
    def recurse(part: Seq[(Long, Long, Long)], depth: Int): Seq[Seq[(Long, Long, Long)]] = {
      val n = part.size
      val nl = (n + 1) / 2
      if (depth == Privacy.MondrianRounds || nl < Privacy.KAnonK ||
          n - nl < Privacy.KAnonK) Seq(part)
      else {
        val rb = part.map(_._2).max - part.map(_._2).min
        val rg = part.map(_._3).max - part.map(_._3).min
        val sorted = if (rb * dg >= rg * db) part.sortBy(r => (r._2, r._1))
          else part.sortBy(r => (r._3, r._1))
        recurse(sorted.take(nl), depth + 1) ++ recurse(sorted.drop(nl), depth + 1)
      }
    }
    recurse(rows, 0).map { p =>
      (p.map(_._1).toSet,
        (p.map(_._2).min, p.map(_._2).max, p.map(_._3).min, p.map(_._3).max),
        p.size >= Privacy.KAnonK)
    }.toSet
  }

  test("q191: relaxed Mondrian matches the literal recursion and refuses unallowable cuts") {
    // 23 rows, balances spread over two nations: round 1 cuts 12/11,
    // round 2 cuts to 6/6/6/5, round 3 refuses every cut (3 < k=5) —
    // the recursion must stop on the allowable-cut rule, not on depth
    val rows = (1L to 23L).map(i =>
      (i, s"c$i", (i % 2).toInt, i.toDouble * 37 + (if (i % 3 == 0) -50.0 else 25.0), "SEG"))
    val dir = graft.streaming.StreamScratch.dir("priv-mondrian")
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val expect = mondrianRef(rows.map(r =>
      (r._1, math.floor(r._4 * 100.0).toLong, r._3.toLong)))
    assert(expect.forall(_._1.size >= Privacy.KAnonK),
      "fixture sanity: every final partition is k-anonymous here")
    assert(expect.size == 4, "fixture sanity: 6/6/6/5 partitioning")

    val got = Privacy.mondrian(spark, dir).collect()
    // intervals + sizes + flags must match the reference partitioning
    val gotSet = got.map(r =>
      ((r.getAs[Long]("bal_lo"), r.getAs[Long]("bal_hi"),
        r.getAs[Long]("nat_lo"), r.getAs[Long]("nat_hi")),
       r.getAs[Long]("n_rows"), r.getAs[Boolean]("is_kanon"))).toSet
    val expSet = expect.map(e => (e._2, e._1.size.toLong, e._3))
    assert(gotSet == expSet)
  }

  test("q191: a sub-2k registry is never cut; a mixed-dimension registry replays the recursion exactly") {
    // 7 rows (< 2k = 10): no allowable cut at any depth -> ONE partition
    val tiny = (1L to 7L).map(i => (i, s"t$i", 3, i * 1000.0, "SEG"))
    val dirT = graft.streaming.StreamScratch.dir("priv-mondrian-tiny")
    tiny.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dirT/customer.parquet")
    val one = Privacy.mondrian(spark, dirT).collect()
    assert(one.length == 1 && one.head.getAs[Long]("n_rows") == 7)
    assert(one.head.getAs[Boolean]("is_kanon")) // 7 >= 5

    // a registry where nation correlates with balance bands: after the
    // root cut (always the tie -> balance, since both normalized ranges
    // are 1 at the root), later rounds must pick dimensions by the
    // globally-normalized cross-mult — the recursion replay pins every
    // choice
    val rows = (1L to 40L).map(i =>
      (i, s"n$i", (i % 4).toInt, 1000.0 * (i % 7) + 13.0 * i, "SEG"))
    val dirN = graft.streaming.StreamScratch.dir("priv-mondrian-norm")
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dirN/customer.parquet")
    val expect = mondrianRef(rows.map(r =>
      (r._1, math.floor(r._4 * 100.0).toLong, r._3.toLong)))
      .map(e => (e._2, e._1.size.toLong, e._3))
    val got = Privacy.mondrian(spark, dirN).collect().map(r =>
      ((r.getAs[Long]("bal_lo"), r.getAs[Long]("bal_hi"),
        r.getAs[Long]("nat_lo"), r.getAs[Long]("nat_hi")),
       r.getAs[Long]("n_rows"), r.getAs[Boolean]("is_kanon"))).toSet
    assert(got == expect)
  }

  // ------------------------------------------------------------ q192/q193

  test("q192: admission verdicts cover frozen-backed, wave-internal, and suppressed classes") {
    val band = Privacy.DocBand.toInt
    def doc(id: Long, lang: String, len: Int, src: String) =
      (id, "x" * len, lang, src, len.toLong)
    // frozen: 4 'en' docs in band 0 (wave member makes 5 = k);
    // wave-internal: 5 'de' docs in band 1, frozen has none;
    // suppressed: 1 'fr' wave doc, nothing anywhere near
    val docs =
      (1L to 4L).map(i => doc(i, "en", 10, "frozen")) ++
      Seq(doc(10L, "en", 12, "src0")) ++
      (20L to 24L).map(i => doc(i, "de", band + 3, "src0")) ++
      Seq(doc(30L, "fr", 2 * band + 1, "src0"))
    val dir = graft.streaming.StreamScratch.dir("priv-kadm")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Privacy.kAnonAdmission(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_frozen"), r.getAs[Long]("n_wave"),
          r.getAs[Long]("n_release"), r.getAs[String]("verdict")))).toMap
    assert(got.keySet == Set(10L) ++ (20L to 24L) + 30L,
      "every wave doc gets a row; frozen docs get none")
    assert(got(10L) == ((4L, 1L, 5L, "admit")))     // frozen-backed
    (20L to 24L).foreach(i =>
      assert(got(i) == ((0L, 5L, 5L, "admit")), s"doc $i")) // wave-internal
    assert(got(30L) == ((0L, 1L, 1L, "suppress")))  // metadata singleton
  }

  test("q193: a multi-batch wave is row-identical to batch q192, including classes spanning batches") {
    val band = Privacy.DocBand.toInt
    def doc(id: Long, lang: String, len: Int, src: String) =
      (id, "x" * len, lang, src, len.toLong)
    // the 'de' class reaches k=5 only across batches 1+2+3: an early
    // arrival's verdict must reflect the whole wave (retro-amendment)
    val frozen = (1L to 3L).map(i => doc(i, "en", 10, "frozen"))
    val b1 = Seq(doc(10L, "de", 5, "src0"), doc(11L, "de", 7, "src0"))
    val b2 = Seq(doc(12L, "de", 9, "src0"), doc(13L, "en", 11, "src0"))
    val b3 = Seq(doc(14L, "de", 12, "src0"), doc(15L, "de", 3, "src0"))
    val dir = graft.streaming.StreamScratch.dir("priv-kstream")
    (frozen ++ b1 ++ b2 ++ b3)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val waveDir = graft.streaming.StreamScratch.dir("priv-kstream-wave")
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      val tmp = graft.streaming.StreamScratch.dir(s"priv-kstream-part$i")
      b.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(waveDir, s"batch$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    val batch = Privacy.kAnonAdmission(spark, dir).collect().toSeq
    val stream = graft.streaming.PrivacyStream.kAnonGateStream(
      spark, dir, streamSrc = Some(waveDir), filesPerTrigger = Some(1))
      .collect().toSeq
    assert(batch.nonEmpty && stream == batch)
    // the cross-batch property specifically: every 'de' doc admits —
    // the class reaches 5 only across three batches
    val byId = stream.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    Seq(10L, 11L, 12L, 14L, 15L).foreach(i => assert(byId(i) == "admit", s"doc $i"))
    assert(byId(13L) == "suppress") // 3 frozen + 1 wave = 4 < k
  }

  test("q190: the graph-served form is row-identical to the inline form") {
    val docs = Seq(
      (1L, "one two three four five six seven eight", "sa"),
      (2L, "one two three four five six seven eight", "sb"),
      (3L, "nine ten eleven twelve thirteen fourteen", "sa"),
      (4L, "gamma delta epsilon zeta eta theta iotas", "sb"))
    val dir = graft.streaming.StreamScratch.dir("priv-fs-served")
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val bits = graft.ops.Dedup.OracleHashBits
    val inline = Privacy.fsLinkage(spark, dir, bits).collect().toSeq
    val served = Privacy.fsLinkageFromGraph(spark, dir, bits).collect().toSeq
    assert(inline.nonEmpty && inline == served)
  }
}
