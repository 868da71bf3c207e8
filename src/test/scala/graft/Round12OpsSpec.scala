package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalytics

/** Round-12 operators, each pinned against an INDEPENDENT in-test
  * reference computed from first principles on a crafted fixture —
  * never against the operator's own output shape. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(tag: String, docs: Seq[(Long, String, String)]): String = {
    val dir = graft.streaming.StreamScratch.dir(s"r12-$tag")
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  // ---------------------------------------------------------------- q185

  /** Independent folded-pairing reference: brute force over a length
    * list, following Krell et al.'s depth-2 rule literally. */
  private def foldedRef(lens: Seq[Long], b: Long):
      (Long, Long, Long, Long, Long) = { // (pairs, singletons, oversizePacks, packs, sumTokens)
    val (over, fit0) = lens.partition(_ > b)
    val fit = fit0.sorted.reverse
    val m = fit.length
    var pairs = 0L; var singles = 0L
    for (r <- 1 to m / 2) {
      if (fit(r - 1) + fit(m - r) <= b) pairs += 1 else singles += 2
    }
    if (m % 2 == 1) singles += 1
    val overPacks = over.map(l => (l + b - 1) / b).sum
    (pairs, singles, overPacks, pairs + singles + overPacks, lens.sum)
  }

  test("q185: folded packing matches the brute-force depth-2 reference per source") {
    val b = TextAnalytics.PackBudgetTokens
    // source A: classic mix incl. a non-fitting top pair and an odd
    // middle; source B: one oversize (3 packs) + two that pair exactly
    // at the budget; source C: oversize only
    val lensA = Seq(500L, 400L, 300L, 200L, 100L, 50L, 12L)
    val lensB = Seq(1100L, 312L, 200L)
    val lensC = Seq(2000L)
    val docs = (lensA.zipWithIndex.map { case (l, i) => (100L + i, words(l.toInt), "a") } ++
      lensB.zipWithIndex.map { case (l, i) => (200L + i, words(l.toInt), "b") } ++
      lensC.zipWithIndex.map { case (l, i) => (300L + i, words(l.toInt), "c") })
    val dir = writeDocs("packing", docs)
    val got = TextAnalytics.foldedPacking(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_singletons"),
          r.getAs[Long]("oversize_packs"), r.getAs[Long]("n_packs"),
          r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("packing_efficiency_permille")))).toMap
    for ((src, lens) <- Seq("a" -> lensA, "b" -> lensB, "c" -> lensC)) {
      val (p, s, o, k, t) = foldedRef(lens, b)
      val eff = if (k == 0) 0L else t * 1000 / (k * b)
      assert(got(src) == ((p, s, o, k, t, eff)), s"source $src")
    }
    // the depth-2 refinement must never do worse than one-doc-per-pack
    got.values.foreach { case (_, _, _, packs, tokens, _) =>
      assert(packs <= docs.length + tokens / b)
    }
  }

  test("q185: pairing beats q63's doc-order contiguity on an adversarial length mix") {
    // lengths alternating just-over-half and small: contiguous doc_id
    // order wastes nearly half of every pack; folded pairing fills them
    val lens = Seq(260L, 260L, 260L, 260L, 250L, 250L, 250L, 250L)
    val dir = writeDocs("packing-adv",
      lens.zipWithIndex.map { case (l, i) => (i.toLong, words(l.toInt), "s") })
    val row = TextAnalytics.foldedPacking(spark, dir).collect().head
    assert(row.getAs[Long]("n_pairs") == 4)   // every 260 pairs with a 250
    assert(row.getAs[Long]("n_packs") == 4)
    assert(row.getAs[Long]("packing_efficiency_permille") == 996) // 2040000 div 2048
  }

  // ---------------------------------------------------------------- q186

  test("q186: competence schedule follows Platanios et al.'s sqrt ramp and admits by value cutoff") {
    // three difficulty bands via vocabulary rarity: docs repeating one
    // common token are LOW surprisal; docs of unique tokens are HIGH
    val docs =
      (0 until 10).map(i => (i.toLong, ("common " * 20).trim, "s")) ++
      (10 until 15).map(i => (i.toLong, (s"mid$i " * 10 + "common " * 10).trim, "s")) ++
      (15 until 20).map(i => (i.toLong, (0 until 20).map(j => s"rare${i}_$j").mkString(" "), "s"))
    val dir = writeDocs("curriculum", docs)
    val out = TextAnalytics.curriculumSchedule(spark, dir).collect()
    assert(out.length == TextAnalytics.CurriculumEpochs)
    val comp = out.map(_.getAs[Long]("competence_permille"))
    // independent reference for the ramp: c = floor(sqrt((c0sq + (990*e) div 8) * 1000))
    val expected = (1L to TextAnalytics.CurriculumEpochs).map { e =>
      val c2 = TextAnalytics.CurriculumC0SqPermille +
        (1000 - TextAnalytics.CurriculumC0SqPermille) * e / TextAnalytics.CurriculumEpochs
      math.sqrt((c2 * 1000).toDouble).toLong
    }
    assert(comp.toSeq == expected)
    // monotone admission; the final epoch (competence 1000) admits all
    val admitted = out.map(_.getAs[Long]("n_admitted"))
    assert(admitted.zip(admitted.tail).forall { case (x, y) => x <= y })
    assert(admitted.last == docs.length)
    // value-cutoff rule: every epoch's admitted count covers its target
    val difficulties = TextAnalytics.surprisalScores(spark, dir).collect()
      .map(_.getAs[Long]("surprisal_mean_milli")).sorted
    out.foreach { r =>
      val target = docs.length * r.getAs[Long]("competence_permille") / 1000
      val nAdm = r.getAs[Long]("n_admitted")
      assert(nAdm >= target, s"epoch ${r.getAs[Long]("epoch")}")
      // the threshold is a real difficulty value and admits exactly the
      // docs at or below it
      val thr = r.getAs[Long]("threshold_milli")
      assert(difficulties.count(_ <= thr) == nAdm)
    }
    // the easy band is admitted before the hard band: epoch 1 admits
    // only low-surprisal docs
    val firstThr = out.head.getAs[Long]("threshold_milli")
    assert(firstThr <= difficulties(docs.length / 2),
      "early competence must cut below the median difficulty")
  }

  // ---------------------------------------------------------------- q187

  /** Independent replay of the audit's plane/leaf math from first
    * principles: java MessageDigest md5 -> nibble fold -> coef, exact
    * i64 dots over the micro grid, depth-bit leaf ids. */
  private def leafRef(vecs: Seq[(Long, Array[Float])]):
      Map[(Long, Long), Long] = { // (tree, leaf) -> count
    import graft.ops.Similarity.{LeafAuditTrees, LeafAuditDepth, LeafAuditDim}
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(8).foldLeft(0L)((a, c) => a * 16 + java.lang.Long.parseLong(c.toString, 16))
    }
    val coef = Array.tabulate(LeafAuditTrees, LeafAuditDepth, LeafAuditDim) {
      (t, l, d) => h32(s"lp-$t-$l-$d") % 2001 - 1000
    }
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, v) <- vecs; t <- 0 until LeafAuditTrees) {
      val xq = v.map(x => math.floor(x.toDouble * 1000000.0).toLong)
      var leaf = 0L
      for (l <- 0 until LeafAuditDepth) {
        val dot = (0 until LeafAuditDim).map(d => xq(d) * coef(t)(l)(d)).sum
        if (dot >= 0) leaf |= 1L << l
      }
      counts((t.toLong, leaf)) = counts.getOrElse((t.toLong, leaf), 0L) + 1
    }
    counts.toMap
  }

  test("q187: leaf-skew audit matches the first-principles md5/i64 replay, and a near-dup mass concentrates") {
    import graft.ops.Similarity.{LeafAuditTrees, LeafAuditDim}
    val rng = new scala.util.Random(7)
    // 40 diverse vectors + a 60-copy near-identical family (1e-4 jitter:
    // way inside any plane's margin at the micro grid)
    val diverse = (0 until 40).map(i =>
      (i.toLong, Array.fill(LeafAuditDim)(rng.nextFloat() * 2 - 1)))
    val base = Array.fill(LeafAuditDim)(rng.nextFloat() * 2 - 1)
    val family = (100 until 160).map(i =>
      (i.toLong, base.clone()))
    val vecs = diverse ++ family
    val dir = graft.streaming.StreamScratch.dir("r12-leafskew")
    vecs.toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = graft.ops.Similarity.annLeafSkew(spark, dir).collect()
    assert(got.length == LeafAuditTrees)
    val ref = leafRef(vecs)
    val byTree = ref.groupBy(_._1._1)
    got.foreach { r =>
      val t = r.getAs[Long]("tree")
      val cnts = byTree(t).values.toSeq
      assert(r.getAs[Long]("n_vecs") == vecs.length)
      assert(r.getAs[Long]("n_leaves") == cnts.length, s"tree $t")
      assert(r.getAs[Long]("max_leaf") == cnts.max, s"tree $t")
      assert(r.getAs[Long]("top_share_permille") == cnts.max * 1000 / vecs.length)
      // the 60-copy family shares one leaf per tree: concentration must
      // be at least its share
      assert(r.getAs[Long]("max_leaf") >= 60, s"tree $t")
    }
  }

  // ---------------------------------------------------------------- q194

  /** Independent Simple Good-Turing replay: literal Gale-Sampson
    * formulas over a hand-counted vocabulary, logs via the shared
    * FixedLog2.q16 kernel (reimplementing it with libm would differ by
    * design — its exactness is property-tested separately), sums in
    * BigInt, floor via explicit adjustment. */
  private def sgtRef(counts: Map[String, Long]):
      Seq[(Long, Long, Long, Long, Long, Long)] = {
    import graft.functions.FixedLog2.q16
    val zr = counts.values.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val n = zr.size
    val rows = zr.zipWithIndex.map { case ((r, z), i) =>
      val q = if (i == 0) 0L else zr(i - 1)._1
      val t = if (i == n - 1) 2 * r - q else zr(i + 1)._1
      val x = q16(r)
      val y = q16(2 * z) - q16(t - q)
      (r, z, x, y, q16(r + 1))
    }
    val (sx, sy, sxy, sxx) = rows.foldLeft(
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0))) { case ((a, b, c, d), r) =>
      (a + r._3, b + r._4, c + BigInt(r._3) * r._4, d + BigInt(r._3) * r._3)
    }
    val bnum = (BigInt(n) * sxy - sx * sy) * 1000
    val bden = BigInt(n) * sxx - sx * sx
    val bMilli = if (bden == 0) 0L else {
      val tdiv = bnum / bden // BigInt division truncates toward zero
      (if (bnum % bden != 0 && bnum < 0) tdiv - 1 else tdiv).toLong
    }
    val ntok = counts.values.sum
    val z1 = zr.find(_._1 == 1L).map(_._2).getOrElse(0L)
    val p0 = z1 * 1000000L / ntok
    rows.zipWithIndex.map { case ((r, z, x, _, lr1), i) =>
      // -1 sentinel where r+1 is unobserved (the nullable-bigint
      // convention; q194 coalesces in both engines)
      val turing = zr.lift(i + 1).collect {
        case (rn, zn) if rn == r + 1 => (r + 1) * zn * 1000 / z
      }.getOrElse(-1L)
      val sgt = lr1 + bMilli * (lr1 - x) / 1000 // both engines truncate
      (r, z, turing, sgt, bMilli, p0)
    }
  }

  test("q194: SGT report matches the literal Gale-Sampson replay on a Zipf-ish vocabulary") {
    // counts: r=1 x3 (d,e,f), r=2 x1 (g), r=3 x2 (b,c), r=5 x1 (a)
    // -> Turing estimate defined at r=1 (next is 2) and r=2 (next is
    // 3), undefined at r=3 (next observed is 5) and at the tail
    val counts = Map("a" -> 5L, "b" -> 3L, "c" -> 3L, "g" -> 2L,
      "d" -> 1L, "e" -> 1L, "f" -> 1L)
    val text = counts.toSeq.sortBy(_._1)
      .flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" ")
    val dir = writeDocs("sgt", Seq((1L, text, "s")))
    val got = graft.ops.TextAnalytics.goodTuring(spark, dir).collect()
      .map(r => (r.getAs[Long]("r"), r.getAs[Long]("z"),
        r.getAs[Long]("turing_permille"),
        r.getAs[Long]("sgt_log2_q16"), r.getAs[Long]("b_milli"),
        r.getAs[Long]("p0_ppm"))).toSeq
    val ref = sgtRef(counts)
    assert(got == ref)
    // the classic regime on this vocabulary: negative Zipf slope,
    // unseen mass = 3/16 of the corpus, Turing at r=1 discounts (the
    // adjusted count 2*1/3 < 1 signals mass flowing to the unseen)
    assert(got.head._5 < 0, "b must be negative on a Zipf-ish tail")
    assert(got.head._6 == 3L * 1000000L / 16L)
    assert(got.head._3 == 2L * 1L * 1000L / 3L)
  }

  // ---------------------------------------------------------------- q195

  /** Independent Dirichlet query-likelihood reference: the literal
    * Zhai-Lafferty score over hand-tokenized docs, logs via the shared
    * q16 kernel, ordered desc with doc_id tiebreak, top-k. */
  private def qlRef(docs: Seq[(Long, String)]):
      Seq[(Long, Long, Long)] = { // (doc_id, n_match, score_q16)
    import graft.functions.FixedLog2.q16
    import graft.ops.TextAnalytics.{Bm25Terms, QlMu, Bm25TopK}
    val toked = docs.map { case (id, t) =>
      (id, t.trim.split("\\s+").filter(_.nonEmpty).toSeq) }
    val ncorp = toked.map(_._2.size.toLong).sum
    val cf = Bm25Terms.map(t =>
      t -> toked.map(_._2.count(_ == t).toLong).sum).filter(_._2 > 0)
    toked.map { case (id, toks) =>
      val dl = toks.size.toLong
      val score = cf.map { case (t, c) =>
        val tf = toks.count(_ == t).toLong
        q16(tf * ncorp + QlMu * c) - q16(ncorp * (dl + QlMu))
      }.sum
      val nMatch = cf.count { case (t, _) => toks.contains(t) }.toLong
      (id, nMatch, score)
    }.sortBy { case (id, _, s) => (-s, id) }.take(Bm25TopK)
  }

  test("q195: Dirichlet QL matches the literal Zhai-Lafferty reference; zero-match docs rank by length") {
    // docs 1-2 contain query terms; 3-4 match nothing (3 shorter than
    // 4, so 3 must outrank 4 on smoothed mass alone); the query term
    // 'stream' is absent from the corpus and must be dropped, not -inf
    val docs = Seq(
      (1L, "spark join spark filler one two three"),
      (2L, "join other words here padding padding padding padding"),
      (3L, "tiny doc"),
      (4L, "a much longer document with many many filler words inside it"))
    val dir = writeDocs("ql", docs.map(d => (d._1, d._2, "s")))
    val got = graft.ops.TextAnalytics.queryLikelihood(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_match"),
        r.getAs[Long]("score_q16"))).toSeq
    val ref = qlRef(docs)
    assert(got == ref)
    // semantic pins: the double-match doc wins; among zero-match docs
    // the SHORTER one scores higher (Dirichlet mass concentrates)
    assert(got.head._1 == 1L)
    val byId = got.map(g => g._1 -> g._3).toMap
    assert(byId(3L) > byId(4L))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L),
      "every document ranks — zero-match docs still carry smoothed mass")
  }

  // ---------------------------------------------------------------- q196

  /** Literal Webber-Moffat-Zobel RBO on two rank lists, using the
    * shared integer weight cascade (the grid definition under test). */
  private def rboRef(l1: Seq[Long], l2: Seq[Long]):
      (Seq[(Long, Long, Long)], Long) = { // per-depth (d, overlap, aPermille), rboPpm
    val ws = graft.ops.TextAnalytics.RboWeights
    val rows = ws.map { case (d, w) =>
      val ov = (l1.take(d).toSet intersect l2.take(d).toSet).size.toLong
      (d.toLong, ov, ov * 1000 / d, ov * w / d)
    }
    (rows.map(r => (r._1, r._2, r._3)), rows.map(_._4).sum / 10000000L)
  }

  test("q196: RBO agreement matches the literal reference over the rankers' own outputs") {
    val dir = sf0001
    def ranksOf(df: org.apache.spark.sql.DataFrame, score: String): Seq[Long] =
      df.collect().map(r => (r.getAs[Long](score), r.getAs[Long]("doc_id")))
        .sortBy { case (s, id) => (-s, id) }.map(_._2).toSeq
    val l1 = ranksOf(graft.ops.TextAnalytics.bm25Search(spark, dir)
      .selectExpr("doc_id", "score"), "score")
    val l2 = ranksOf(graft.ops.TextAnalytics.queryLikelihood(spark, dir), "score_q16")
    val (refRows, refRbo) = rboRef(l1, l2)
    val got = graft.ops.TextAnalytics.rankAgreement(spark, dir).collect()
      .map(r => (r.getAs[Long]("depth"), r.getAs[Long]("n_overlap"),
        r.getAs[Long]("a_permille"), r.getAs[Long]("rbo_ppm"))).toSeq
    assert(got.map(g => (g._1, g._2, g._3)) == refRows)
    assert(got.forall(_._4 == refRbo))
    // weight-cascade normalization sanity: a ranking compared with
    // itself reads RBO ~ 1 (the truncated-prefix mass at p=0.9, k=20:
    // 1 - 0.9^20 ~ 0.878, on the floor grid)
    val (_, self) = rboRef(l1, l1)
    assert(self > 878000 - 10 && self <= 878424, s"self-RBO was $self")
  }

  // ---------------------------------------------------------------- q197

  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    hex.take(8).foldLeft(0L)((a, c) => a * 16 + java.lang.Long.parseLong(c.toString, 16))
  }

  test("q197: the z-test matches the literal rational form on a planted effect, and degenerate designs read zero") {
    import graft.ops.Events.{AbGoalEvent, AbGoalCount, AbZ2MilliCut}
    // plant a real effect: arm-0 users convert (AbGoalCount purchases),
    // arm-1 users never do — replaying the assignment hash to know who
    // lands where
    val users = (1L to 60L)
    val byArm = users.groupBy(u => h32(s"ab-$u") % 2)
    assert(byArm(0L).nonEmpty && byArm(1L).nonEmpty)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ev(id: Long, u: Long, tpe: String) = (id, t0, u, tpe, 10.0, "{}")
    var eid = 0L
    val events = users.flatMap { u =>
      val converts = h32(s"ab-$u") % 2 == 0
      val n = if (converts) AbGoalCount.toInt else 1
      (1 to n).map { _ => eid += 1; ev(eid, u, AbGoalEvent) } :+
        { eid += 1; ev(eid, u, "view") }
    }
    val dir = graft.streaming.StreamScratch.dir("q197-ab")
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = graft.ops.Events.abReadout(spark, dir).collect()
    assert(got.length == 2)
    val na = byArm(0L).size.toLong; val nb = byArm(1L).size.toLong
    val (ca, cb) = (na, 0L) // arm 0 all convert, arm 1 none
    val num = BigInt(cb * na - ca * nb).pow(2) * (na + nb) * 1000
    val den = BigInt(na) * nb * (ca + cb) * (na + nb - ca - cb)
    val z2 = (num / den).toLong
    got.foreach { r =>
      assert(r.getAs[Long]("z2_milli") == z2)
      assert(r.getAs[Boolean]("significant") == (z2 >= AbZ2MilliCut))
    }
    assert(z2 >= AbZ2MilliCut, "the planted effect must read significant")
    val a0 = got.find(_.getAs[Long]("variant") == 0L).get
    assert(a0.getAs[Long]("n_users") == na)
    assert(a0.getAs[Long]("conv_permille") == 1000)
    assert(a0.getAs[Long]("revenue_cents") == ca * AbGoalCount * 1000)

    // degenerate design: EVERY user converts -> no variance, z2 = 0 by
    // the stated rule (the guard, not a division error)
    val all = users.flatMap { u =>
      (1 to AbGoalCount.toInt).map { _ => eid += 1; ev(eid, u, AbGoalEvent) } }
    val dir2 = graft.streaming.StreamScratch.dir("q197-ab-degen")
    all.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val degen = graft.ops.Events.abReadout(spark, dir2).collect()
    degen.foreach { r =>
      assert(r.getAs[Long]("z2_milli") == 0L)
      assert(!r.getAs[Boolean]("significant"))
    }

    // A/A property on the shipped corpus: identical arms by
    // construction, so the readout must NOT be significant (a
    // significant A/A reads as a broken assignment hash)
    val aa = graft.ops.Events.abReadout(spark, sf0001).collect()
    aa.foreach(r => assert(!r.getAs[Boolean]("significant")))
  }

  // ---------------------------------------------------------------- q198

  test("q198: CUPED matches the literal Deng et al. math on a correlated fixture and buys real variance") {
    import graft.ops.Events.AbGoalEvent
    // plant strong pre/post correlation: user u makes x_u = (u mod 7)
    // pre-period purchases and y_u = 2*x_u + (u mod 3) post-period —
    // the persistent-propensity structure CUPED exists for
    val users = (1L to 50L)
    val pre  = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val post = java.sql.Timestamp.valueOf("2026-01-03 00:00:00")
    var eid = 0L
    val events = users.flatMap { u =>
      val x = (u % 7).toInt; val y = (2 * (u % 7) + u % 3).toInt
      (1 to x).map { _ => eid += 1; (eid, pre, u, AbGoalEvent, 1.0, "{}") } ++
        (1 to y).map { _ => eid += 1; (eid, post, u, AbGoalEvent, 1.0, "{}") } :+
        { eid += 1; (eid, pre, u, "view", 1.0, "{}") } // anchor min ts
    }
    val dir = graft.streaming.StreamScratch.dir("q198-cuped")
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // literal reference: theta by OLS (BigInt), per-user milli
    // adjustment, floor-grid variance with explicit floors
    val xs = users.map(u => u % 7)
    val ys = users.map(u => 2 * (u % 7) + u % 3)
    val n = users.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val theta = (BigInt(n) * sxy - BigInt(sx) * sy) * 1000 /
      (BigInt(n) * sxx - BigInt(sx) * sx) // positive here: plain div ok
    val ycup = users.map { u =>
      val x = u % 7; val y = 2 * (u % 7) + u % 3
      y * 1000 - (theta.toLong * (x * n - sx)) / n
    }
    def vr(v: Seq[Long]): Long = {
      val s = v.map(BigInt(_)).sum; val ss = v.map(x => BigInt(x) * x).sum
      val mu = (s / v.size).toLong // non-negative here
      (ss / v.size).toLong - mu * mu
    }
    val varY = vr(ys.map(_ * 1000)); val varC = vr(ycup)
    val expectRed = (varY - varC) * 1000 / varY

    val got = graft.ops.Events.cupedReadout(spark, dir).collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getAs[Long]("theta_milli") == theta.toLong)
      assert(r.getAs[Long]("var_y") == varY)
      assert(r.getAs[Long]("var_cuped") == varC)
      assert(r.getAs[Long]("var_reduction_permille") == expectRed)
    }
    assert(expectRed > 700,
      s"the planted propensity must buy most of the variance (got $expectRed permille)")
    // the treatment-effect estimate is unbiased: pooled mean of the
    // adjusted metric equals the pooled raw mean (theta centers on X̄)
    val totN = got.map(_.getAs[Long]("n_users")).sum
    assert(totN == n)
  }

  // ---------------------------------------------------------------- q199

  test("q199: the streaming monitor is row-identical to batch q197, incl. a threshold crossed across batches") {
    import graft.ops.Events.{AbGoalEvent, AbGoalCount}
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    var eid = 0L
    def ev(u: Long, tpe: String) = { eid += 1; (eid, t0, u, tpe, 10.0, "{}") }
    // user 1 converts ONLY across batches (8 + 7 goal events split over
    // two batches, neither alone reaching 15); users 2-12 pad the arms
    val b1 = (1 to 8).map(_ => ev(1L, AbGoalEvent)) ++
      (2L to 12L).map(u => ev(u, "view"))
    val b2 = (1 to 7).map(_ => ev(1L, AbGoalEvent)) ++
      (2L to 6L).flatMap(u => (1 to AbGoalCount.toInt).map(_ => ev(u, AbGoalEvent)))
    val b3 = (7L to 12L).map(u => ev(u, "click"))
    val dir = graft.streaming.StreamScratch.dir("q199-ab")
    (b1 ++ b2 ++ b3).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val waveDir = graft.streaming.StreamScratch.dir("q199-ab-wave")
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      val tmp = graft.streaming.StreamScratch.dir(s"q199-part$i")
      b.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(waveDir, s"batch$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val batch = graft.ops.Events.abReadout(spark, dir).collect().toSeq
    val stream = graft.streaming.EventStream.abMonitorStream(
      spark, dir, streamSrc = Some(waveDir), filesPerTrigger = Some(1))
      .collect().toSeq
    assert(batch.nonEmpty && stream == batch)
    // the cross-batch conversion specifically: user 1's 15 goals span
    // batches, so total conversions include them
    assert(batch.map(_.getAs[Long]("n_converted")).sum == 6) // user 1 + users 2-6
  }

  // ---------------------------------------------------------------- q200

  test("q200: SRM fires on planted assignment loss at the user unit only; the shipped split reads clean") {
    import graft.ops.Events.SrmChi2MilliCut
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    var eid = 0L
    def ev(u: Long) = { eid += 1; (eid, t0, u, "view", 1.0, "{}") }
    // plant logging loss: 400 candidate users, but 70% of arm-1 users
    // never reach the log (their events dropped) — the realized split
    // deviates way beyond chance at the user unit
    val users = (1L to 400L)
    val kept = users.filter(u => h32(s"ab-$u") % 2 == 0 || u % 10 < 3)
    val events = kept.flatMap(u => Seq.fill(1 + (u % 3).toInt)(ev(u)))
    val dir = graft.streaming.StreamScratch.dir("q200-srm")
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = graft.ops.Events.srmGuard(spark, dir).collect()
      .map(r => r.getAs[String]("unit") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("chi2_milli"), r.getAs[Boolean]("srm_detected")))).toMap
    // literal replay at the user unit
    val na = kept.count(u => h32(s"ab-$u") % 2 == 0).toLong
    val nb = kept.size - na
    val chi2 = (BigInt(na - nb).pow(2) * 1000 / (na + nb)).toLong
    assert(got("users") == ((na, nb, chi2, chi2 >= SrmChi2MilliCut)))
    assert(got("users")._4, "the planted loss must alarm")
    // events-unit: diagnostic only — never alarms even when its chi2
    // is large (clustered events violate the binomial assumption)
    assert(!got("events")._4)

    // the shipped corpus's hash split is sound: users row clean, and
    // the events row's big chi2 (per-user volume skew) must NOT alarm
    val ship = graft.ops.Events.srmGuard(spark, sf0001).collect()
      .map(r => r.getAs[String]("unit") -> r.getAs[Boolean]("srm_detected")).toMap
    assert(!ship("users") && !ship("events"))
  }
}
