package graft

import org.apache.spark.sql.functions._

/** Round-9 operator specs: q145+ (shared-run pairs and successors). */
class Round9OpsSpec extends SparkSpec {

  private def toks(t: String): Array[String] =
    t.trim.split("\\s+").filter(_.nonEmpty)

  // ---------------------------------------------------------------- q145

  /** Independent reference: maximal common token RUNS per doc pair via
    * the O(La*Lb) longest-common-substring DP over raw token equality —
    * a different algorithm from the operator's gram-island formulation
    * (and hash-free, so it also proves the gram hashing added no
    * collisions at this SF). Returns (n_runs, max_run, mass) per pair
    * with any maximal run >= minRun. */
  private def dpRuns(a: Array[String], b: Array[String], minRun: Int): Option[(Long, Long, Long)] = {
    val la = a.length; val lb = b.length
    var runs = List.empty[Int]
    var prev = new Array[Int](lb)
    var cur = new Array[Int](lb)
    var i = 0
    while (i < la) {
      var j = 0
      while (j < lb) {
        if (a(i) == b(j)) {
          cur(j) = (if (j == 0) 0 else prev(j - 1)) + 1
          // maximal iff the run cannot extend to (i+1, j+1)
          if ((i == la - 1 || j == lb - 1 || a(i + 1) != b(j + 1)) && cur(j) >= minRun)
            runs ::= cur(j)
        } else cur(j) = 0
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    if (runs.isEmpty) None
    else Some((runs.length.toLong, runs.max.toLong, runs.map(_.toLong).sum))
  }

  test("q145: pair report matches an independent LCS-DP reference over every gram-sharing pair at sf0.001") {
    val n = graft.ops.Dedup.DupSpanN
    val minRun = graft.ops.Dedup.SharedRunMinTokens
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1)))).sortBy(_._1)
    // candidate pairs = share at least one word n-gram (a superset of
    // the reported pairs, so this also checks COMPLETENESS: no pair
    // with a qualifying run is missing from the report)
    val byGram = scala.collection.mutable.HashMap.empty[String, List[Long]]
    docs.foreach { case (id, t) =>
      (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" ")).distinct
        .foreach(g => byGram(g) = id :: byGram.getOrElse(g, Nil))
    }
    val cand = byGram.values.filter(_.size > 1)
      .flatMap(ids => for (x <- ids; y <- ids if x < y) yield (x, y)).toSet
    val byId = docs.toMap
    val expected = cand.toSeq.sorted.flatMap { case (x, y) =>
      dpRuns(byId(x), byId(y), minRun).map { case (nr, mx, mass) => (x, y, nr, mx, mass) }
    }
    val got = graft.ops.Dedup.sharedRunPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_runs"), r.getAs[Long]("max_run_tokens"),
        r.getAs[Long]("run_token_mass"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "the planted near-dup corpus must surface shared runs")
    // memorization-grade (>=50-token) runs exist in the testdata
    assert(got.exists(_._4 >= 50L))
  }

  test("q145: a run at exactly the floor is reported, one token shorter is not, disjoint runs both count") {
    import spark.implicits._
    val minRun = graft.ops.Dedup.SharedRunMinTokens
    val dir = graft.streaming.StreamScratch.dir("q145-planted")
    val run20 = (0 until minRun).map(i => s"ra$i").mkString(" ")
    val run19 = (0 until minRun - 1).map(i => s"rb$i").mkString(" ")
    val run25a = (0 until 25).map(i => s"rc$i").mkString(" ")
    val run25b = (0 until 25).map(i => s"rd$i").mkString(" ")
    Seq(
      (0L, s"zero00 zero01 zero02 $run20 zero03", "en", "s0", 1L),
      (1L, s"one00 $run20 one01 one02 one03 one04 one05", "en", "s0", 1L),
      (2L, s"two00 $run19 two01", "en", "s0", 1L),
      (3L, s"three00 three01 $run19 three02", "en", "s0", 1L),
      (4L, s"four00 $run25a four01 four02 $run25b four03", "en", "s0", 1L),
      (5L, s"five00 five01 $run25b five02 $run25a five03", "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.sharedRunPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_runs"), r.getAs[Long]("max_run_tokens"),
        r.getAs[Long]("run_token_mass"))).toSeq
    // (0,1): exactly-at-floor run, shifted offsets. (2,3): one short,
    // absent. (4,5): two 25-token runs on DIFFERENT diagonals (swapped
    // order), both counted, mass = 50.
    assert(got == Seq((0L, 1L, 1L, minRun.toLong, minRun.toLong),
      (4L, 5L, 2L, 25L, 50L)))
  }

  test("q145: candidate generation is a gh equi-join — no cross product in the plan") {
    val plan = graft.ops.Dedup.sharedRunPairs(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"shared-run pairing must never fall back to a cross product:\n$plan")
  }

  test("q145: dfCap equals uncapped when no gram exceeds the cap, and bounds hot-gram fan-out when one does") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q145-cap")
    val boiler = (0 until 30).map(i => s"tmpl$i").mkString(" ")
    // the same 30-token boilerplate run in 6 docs (a template family)
    val rows = (0L until 6L).map(i => (i, s"u${i}a u${i}b $boiler u${i}c", "en", "s0", 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val uncapped = graft.ops.Dedup.sharedRunPairs(spark, dir).collect()
    assert(uncapped.length == 15, "all 15 template pairs pair uncapped")
    // cap below the family df: the boilerplate grams drop from pairing
    val capped = graft.ops.Dedup.sharedRunPairs(spark, dir, dfCap = Some(3)).collect()
    assert(capped.isEmpty, "capped mode drops grams hotter than the cap from candidate generation")
    // cap above every df: byte-identical to uncapped (the oracle-mode guarantee)
    val cappedHigh = graft.ops.Dedup.sharedRunPairs(spark, dir, dfCap = Some(100)).collect()
    assert(cappedHigh.map(_.toString).toSeq == uncapped.map(_.toString).toSeq)
  }

  // ---------------------------------------------------------------- q146

  test("q146: cohesion report matches a pure-Scala union-find + set-arithmetic reference at sf0.001") {
    // edge set = q14's verified pairs (independently spec-pinned);
    // the NEW logic under test is clustering + cohesion arithmetic, so
    // the reference recomputes those from scratch: union-find over the
    // pair list, per-pair permille from RAW STRING shingle sets (no
    // hashes — also re-proving the 64-bit hashed intersection counts).
    val pairs = graft.ops.Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def shingleSet(t: String): Set[String] = {
      val w = toks(t)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byCluster = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
      .groupBy(find)
    val permille = pairs.map { case (a, b) =>
      val (sa, sb) = (shingleSet(docs(a)), shingleSet(docs(b)))
      val inter = (sa & sb).size.toLong
      (a, b) -> inter * 1000L / (sa.size + sb.size - inter)
    }.toMap
    val expected = byCluster.toSeq.map { case (cl, members) =>
      val e = pairs.filter { case (a, _) => find(a) == cl }
      val n = members.length.toLong
      val poss = n * (n - 1) / 2
      (cl, n, e.length.toLong, poss, e.length * 1000L / poss,
        e.map(permille).min)
    }.sortBy(_._1)
    val got = graft.ops.Dedup.clusterCohesion(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_edges"), r.getAs[Long]("n_possible"),
        r.getAs[Long]("density_permille"), r.getAs[Long]("min_edge_permille"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q146: a clique reads density 1000; a chain reads 666 with its weakest edge exposed") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q146-planted")
    // triangle: three docs sharing an 85-word core with 15 own words
    // each — every pair verifies (J ~ 0.74), so the cluster is a clique.
    // chain: B = 100 words, A = B's first 80 + 20 own, C = 20 own +
    // B's last 80; J(A,B) = J(B,C) ~ 0.66 >= 0.5 but J(A,C) ~ 0.42
    // stays BELOW the verification threshold no matter what the
    // banding does, so the A-C edge can never appear and {A,B,C}
    // merges on reachability alone — the chaining pathology this audit
    // exists to expose. Word spellings picked offline so the (fully
    // deterministic) 4x4 banding fires for exactly the 5 wanted edges.
    val core = (0 until 85).map(i => s"co0x$i").mkString(" ")
    val bw = (0 until 100).map(i => s"ch0x$i")
    val aTxt = (bw.take(80) ++ (0 until 20).map(i => s"ax0x$i")).mkString(" ")
    val bTxt = bw.mkString(" ")
    val cTxt = ((0 until 20).map(i => s"cx0x$i") ++ bw.drop(20)).mkString(" ")
    Seq(
      (0L, s"$core " + (0 until 15).map(i => s"ta0x$i").mkString(" "), "en", "s0", 1L),
      (1L, s"$core " + (0 until 15).map(i => s"tb0x$i").mkString(" "), "en", "s0", 1L),
      (2L, s"$core " + (0 until 15).map(i => s"tc0x$i").mkString(" "), "en", "s0", 1L),
      (10L, aTxt, "en", "s0", 1L),
      (11L, bTxt, "en", "s0", 1L),
      (12L, cTxt, "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // fixture sanity: the banding fired for exactly the 3 clique edges
    // and the 2 chain edges (deterministic — minhash is a pure function
    // of the text)
    val edges = graft.ops.Dedup.minhashLshPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(edges == Set((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (11L, 12L)),
      s"fixture banding drifted: $edges")
    val got = graft.ops.Dedup.clusterCohesion(spark, dir).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_edges"), r.getAs[Long]("n_possible"),
        r.getAs[Long]("density_permille"), r.getAs[Long]("min_edge_permille"))).toSeq
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)) ==
      Seq((0L, 3L, 3L, 3L, 1000L), (10L, 3L, 2L, 3L, 666L)))
    // the chain's weakest verified edge is reported (the re-verify cue)
    assert(got(1)._6 >= 600L && got(1)._6 < 1000L)
  }

  // ---------------------------------------------------------------- q147

  private def quantizeRef(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1e6).toLong).toArray

  test("q147: anisotropy report matches an independent recompute AND the mean pairwise cosine it estimates") {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("embedding").collect()
      .map(r => quantizeRef(r.getSeq[Float](0)))
    val n = vecs.length
    val d = vecs.head.length
    val s = Array.tabulate(d)(j => vecs.map(_(j)).sum)
    val ss = Array.tabulate(d)(j => vecs.map(v => v(j) * v(j)).sum)
    val mu2 = s.map(x => { val m = math.floor(x.toDouble / n).toLong; m * m }).sum
    val avg2 = ss.map(x => math.floor(x.toDouble / n).toLong).sum
    val got = graft.ops.Similarity.anisotropyReport(spark, sf0001).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getAs[Long]("n_vectors"), r.getAs[Long]("mu_norm2"),
      r.getAs[Long]("avg_norm2"), r.getAs[Long]("anisotropy_permille")) ==
      (n.toLong, mu2, avg2, mu2 * 1000L / avg2))
    // the estimator's CONTRACT: it tracks the mean pairwise cosine.
    // This synthetic corpus is near-isotropic (the measured property
    // the similarity family's docs cite for LSH being non-pruning at
    // q18's threshold) — both readings sit within a few permille of 0.
    val norms = vecs.map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    var acc = 0.0; var cnt = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var dot = 0.0; var k = 0
        while (k < d) { dot += vecs(i)(k).toDouble * vecs(j)(k); k += 1 }
        acc += dot / (norms(i) * norms(j)); cnt += 1
        j += 1
      }
      i += 1
    }
    val meanCosPermille = acc / cnt * 1000.0
    val aniso = r.getAs[Long]("anisotropy_permille")
    assert(math.abs(meanCosPermille - aniso) < 20.0,
      s"estimator $aniso vs measured mean pairwise cosine $meanCosPermille")
    assert(aniso < 50L, s"synthetic corpus must read near-isotropic, got $aniso")
  }

  test("q147: identical vectors read 1000 permille; an antipodal cloud reads 0") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q147-planted")
    val v = (0 until 64).map(i => (i % 7).toFloat / 7f + 0.1f)
    val rows = (0L until 8L).map(i => (i, v, 0)) // all identical -> mu = x
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r1 = graft.ops.Similarity.anisotropyReport(spark, dir).collect().head
    assert(r1.getAs[Long]("anisotropy_permille") == 1000L)
    val dir2 = graft.streaming.StreamScratch.dir("q147-planted2")
    // +v / -v in equal numbers: integer mean is exactly 0 only when
    // the quantized grid is symmetric, so use values whose floor(x*1e6)
    // negates cleanly (multiples of 1e-6 would; use exact halves)
    val w = (0 until 64).map(i => (i % 5).toFloat - 2f)
    val rows2 = (0L until 4L).map(i => (i, w, 0)) ++
      (4L until 8L).map(i => (i, w.map(-_), 0))
    rows2.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")
    val r2 = graft.ops.Similarity.anisotropyReport(spark, dir2).collect().head
    assert(r2.getAs[Long]("anisotropy_permille") == 0L,
      s"antipodal cloud must read 0, got ${r2.mkString(",")}")
  }

  // ---------------------------------------------------------------- q148

  test("q148: phrase scores match an independent recompute at sf0.001") {
    val delta = graft.ops.TextAnalytics.PhraseDelta
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().map(r => toks(r.getString(0)))
    val cf = scala.collection.mutable.HashMap.empty[String, Long]
    val bf = scala.collection.mutable.HashMap.empty[(String, String), Long]
    docs.foreach { t =>
      t.foreach(w => cf(w) = cf.getOrElse(w, 0L) + 1L)
      (0 until t.length - 1).foreach { i =>
        val k = (t(i), t(i + 1)); bf(k) = bf.getOrElse(k, 0L) + 1L
      }
    }
    val n = cf.values.sum
    val expected = bf.toSeq.filter(_._2 > delta).map { case ((a, b), cab) =>
      (a, b, cf(a), cf(b), cab, ((cab - delta) * 1000000L / cf(a)) * n / cf(b))
    }.sortBy { case (a, b, _, _, _, s) => (-s, a, b) }
      .take(graft.ops.TextAnalytics.PhraseTopK)
    val got = graft.ops.TextAnalytics.phraseScores(spark, sf0001).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_a"), r.getAs[Long]("c_b"), r.getAs[Long]("c_ab"),
        r.getAs[Long]("score_micro"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q148: a planted collocation tops the table; independent words read the baseline") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q148-planted")
    // 'new york' always adjacent (a true collocation); filler words
    // appear equally often but in rotating order (independent)
    val filler = (0 until 8).map(i => s"f$i")
    val docRows = (0L until 12L).map { d =>
      val rot = (0 until 8).map(i => filler(((i + d) % 8).toInt))
      (d, (rot.take(4) ++ Seq("new", "york") ++ rot.drop(4)).mkString(" "), "en", "s0", 1L)
    }
    docRows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalytics.phraseScores(spark, dir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"), r.getAs[Long]("score_micro")))
    assert(got.head._1 == "new" && got.head._2 == "york",
      s"the always-adjacent pair must top the table: ${got.take(3).mkString(";")}")
    // perfect collocation: c_ab = c_a = c_b = 12, N = 120 ->
    // score = ((12-5)*1e6/12)*120/12 = 5833330; independence baseline ~ N*1e6/c
    val others = got.tail
    assert(others.forall(_._3 < got.head._3))
  }

  // ---------------------------------------------------------------- q149

  test("q149: boilerplate-gram list matches an independent recompute at sf0.001") {
    val n = graft.ops.Dedup.DupSpanN
    val k = graft.ops.Dedup.BoilerplateTopK
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
    val df = scala.collection.mutable.HashMap.empty[String, Set[Long]]
    val cf = scala.collection.mutable.HashMap.empty[String, Long]
    docs.foreach { case (id, t) =>
      (0 to t.length - n).foreach { i =>
        val g = t.slice(i, i + n).mkString(" ")
        df(g) = df.getOrElse(g, Set.empty) + id
        cf(g) = cf.getOrElse(g, 0L) + 1L
      }
    }
    val nDocs = docs.length.toLong
    val expected = df.toSeq.map { case (g, ids) => (g, ids.size.toLong, cf(g)) }
      .sortBy { case (g, d, _) => (-d, g) }.take(k)
      .map { case (g, d, c) => (g, d, c, d * 1000L / nDocs) }
    val got = graft.ops.Dedup.boilerplateGrams(spark, sf0001).collect()
      .map(r => (r.getAs[String]("gram"), r.getAs[Long]("df"),
        r.getAs[Long]("cf"), r.getAs[Long]("df_permille"))).toSeq
    assert(got == expected)
    assert(got.size == k)
  }

  test("q149: a planted template gram tops the list with its readable text") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q149-planted")
    val boiler = "all rights reserved contact us"
    val rows = (0L until 20L).map { i =>
      (i, s"own${i}a own${i}b own${i}c own${i}d $boiler own${i}e own${i}f own${i}g own${i}h", "en", "s0", 1L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.boilerplateGrams(spark, dir).collect()
    assert(got.head.getAs[String]("gram") == boiler)
    assert(got.head.getAs[Long]("df") == 20L)
    assert(got.head.getAs[Long]("df_permille") == 1000L)
    // every other gram contains per-doc words -> df 1
    assert(got.tail.forall(_.getAs[Long]("df") == 1L))
  }

  // ---------------------------------------------------------------- q150

  test("q150: bit-bias audit matches an independent signature recompute at sf0.001") {
    val bits = graft.core.Consts.SimHashBits
    val sigs = graft.ops.Dedup.simhash(spark, sf0001).collect()
      .map(r => r.getAs[Long]("simhash"))
    val expected = (0 until bits).map { b =>
      val ones = sigs.count(s => ((s >> b) & 1L) == 1L).toLong
      val pm = ones * 1000L / sigs.length
      (b.toLong, sigs.length.toLong, ones, pm, math.abs(pm - 500L))
    }
    val got = graft.ops.Dedup.simhashBitBias(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("bit"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_ones"),
        r.getAs[Long]("ones_permille"), r.getAs[Long]("bias_permille"))).toSeq
    assert(got == expected)
    // the audit's finding on this corpus: the 31-token shared
    // vocabulary votes most bits the same way in most documents, so
    // the 16-bit signature is entropy-starved — the mechanism behind
    // q136's weak calibration curve, now measured per bit
    assert(got.map(_._5).max > 300L,
      "shared-vocabulary corpus must show strongly biased bits")
  }

  test("q150: identical docs read bias 500 on every bit; a balanced split reads 0") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q150-planted")
    // half the docs get text A, half text B whose signatures differ in
    // every bit we check below; with a 50/50 split any differing bit
    // reads ones_permille 500 -> bias 0, and any agreeing bit reads
    // 0 or 1000 -> bias 500
    val rows = (0L until 6L).map(i => (i, "alpha beta gamma delta", "en", "s0", 1L)) ++
      (6L until 12L).map(i => (i, "omega psi chi phi", "en", "s0", 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sigA = graft.ops.Dedup.simhash(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("simhash"))).toMap
    val (sa, sb) = (sigA(0L), sigA(6L))
    val got = graft.ops.Dedup.simhashBitBias(spark, dir).collect()
      .map(r => (r.getAs[Long]("bit"), r.getAs[Long]("bias_permille"))).toMap
    (0 until graft.core.Consts.SimHashBits).foreach { b =>
      val expectBias = if (((sa >> b) & 1L) != ((sb >> b) & 1L)) 0L else 500L
      assert(got(b.toLong) == expectBias, s"bit $b")
    }
    // sanity: the two planted texts do differ somewhere
    assert(sa != sb)
  }

  // ---------------------------------------------------------------- q151

  /** Independent stub-path reference: envelope → 16 bits from raw
    * UTF-8 byte arithmetic, all-pairs Hamming — proves banded == exact
    * and re-derives every fingerprint. */
  private def refAudioFp(text: String): Long = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val L = bytes.length
    val e = (0 until 17).map { w =>
      val lo = w * L / 17; val hi = (w + 1) * L / 17
      if (hi <= lo) 0L
      else bytes.slice(lo, hi).map(b => (b & 0xff).toLong).sum / (hi - lo)
    }
    (0 until 16).map(k => if (e(k + 1) > e(k)) 1L << k else 0L).sum
  }

  test("q151: banded pairs equal an independent all-pairs reference at sf0.01") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 == 1)
    val fps = docs.map { case (id, t) => (id, refAudioFp(t)) }
    val expected = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb).toLong if h <= 3
    } yield (a, b, h)).sortBy(p => (p._1, p._2)).toSeq
    val got = graft.ops.Multimodal.audioEnvelopePairs(spark, sf001).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"),
        r.getAs[Long]("hamming"))).toSeq
    assert(got == expected)
    assert(got.exists(_._3 == 0L), "exact-dup docs must fingerprint identically")
    assert(!got.toString.contains("Cartesian"))
  }

  test("q151: real-PCM path — a gain-scaled copy fingerprints identically, a different melody does not") {
    import spark.implicits._
    // synthesize 16-bit mono WAV with a controlled amplitude envelope
    def wav(env: Int => Double): Array[Byte] = {
      val rate = 8000f
      val n = 8000
      val pcm = new Array[Byte](n * 2)
      val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).foreach { i =>
        val amp = env(i)
        val s = (amp * math.sin(2 * math.Pi * 440 * i / rate) * 8000).toShort
        bb.putShort(s)
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val bais = new java.io.ByteArrayInputStream(pcm)
      val ais = new javax.sound.sampled.AudioInputStream(bais, fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rising = (i: Int) => 0.2 + 0.8 * i / 8000.0
    val wobble = (i: Int) => 0.6 + 0.4 * math.sin(2 * math.Pi * 5 * i / 8000.0)
    val ds = Seq(
      (0L, wav(rising)),
      (1L, wav(i => rising(i) * 1.3 / 1.0)), // uniform gain x1.3
      (2L, wav(wobble)),
      (3L, "not audio at all".getBytes)).toDS()
    val fps = graft.ops.Multimodal.audioFingerprint(ds).collect().toMap
    assert(fps.keySet == Set(0L, 1L, 2L), "undecodable payloads drop")
    assert(fps(0L) == fps(1L),
      "uniform gain must not flip any envelope-difference bit (Haitsma-Kalker invariance)")
    assert(java.lang.Long.bitCount(fps(0L) ^ fps(2L)) > 3,
      s"a different envelope shape must read far: ${fps(0L)} vs ${fps(2L)}")
  }

  // ---------------------------------------------------------------- q152

  test("q152: cross-source matrix matches the pair list rolled up independently at sf0.001") {
    val srcs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val pairs = graft.ops.Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val cells = pairs.map { case (a, b) =>
      val (sa, sb) = (srcs(a), srcs(b))
      (Seq(sa, sb).min, Seq(sa, sb).max)
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.length.toLong) }
    val total = pairs.length.toLong
    val expected = cells.toSeq.map { case (a, b, n) =>
      (a, b, n, a != b, n * 1000L / total)
    }.sortBy(c => (c._1, c._2))
    val got = graft.ops.Dedup.crossSourceMatrix(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"),
        r.getAs[Long]("n_pairs"), r.getAs[Boolean]("cross_source"),
        r.getAs[Long]("share_permille"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q152: a planted mirror pair shows up as a cross-source cell") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q152-planted")
    val text = (0 until 60).map(i => s"mir$i").mkString(" ")
    Seq(
      (0L, text, "en", "crawlA", 1L),
      (1L, text, "en", "crawlB", 1L), // the mirror
      (2L, text + " extra tail words here", "en", "crawlA", 1L),
      (3L, (0 until 40).map(i => s"own$i").mkString(" "), "en", "crawlB", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.crossSourceMatrix(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"),
        r.getAs[Long]("n_pairs"), r.getAs[Boolean]("cross_source"))).toSeq
    val cross = got.filter(_._4)
    assert(cross.nonEmpty && cross.forall(c => c._1 == "crawlA" && c._2 == "crawlB"))
    // the identical mirror pair (0,1) plus (1,2) near-dup across sources;
    // (0,2) is within-crawlA
    assert(got.exists(c => c._1 == "crawlA" && c._2 == "crawlA" && !c._4))
  }

  // ---------------------------------------------------------------- q153

  test("q153: the served ranking is bit-identical to q85's recompute, from a partition-pruned read") {
    val recompute = graft.ops.TextAnalytics.bm25Search(spark, sf001).collect().map(_.toString).toSeq
    val served = graft.ops.TextAnalytics.bm25Served(spark, sf001)
    assert(served.collect().map(_.toString).toSeq == recompute)
    // the serving read prunes to the query terms' partitions: the scan
    // node must carry term as a PartitionFilter, not a post-scan Filter
    val plan = served.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("postings") && l.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("term"),
      s"postings scan must prune on term:\n$plan")
  }

  // ---------------------------------------------------------------- q154

  test("q154: eval report matches an independent full-protocol recompute at sf0.001") {
    val depth = graft.ops.Hybrid.CandidateDepth
    val topK = graft.ops.Hybrid.EvalTopK
    val rrfK = graft.ops.Hybrid.RrfK
    // ground truth: the separately spec-pinned pair list, symmetric
    val pairs = graft.ops.Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val rel = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (q, v) => q -> v.map(_._2).toSet }
    // the deterministic eval-set cap (smallest qids), mirrored
    val qids = rel.keySet.toSeq.sorted.take(graft.ops.Hybrid.EvalQueries).toSet
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // BM25 rankings from scratch
    val tok = docs.map { case (id, t) => id -> toks(t) }.toMap
    val tfm = tok.map { case (id, t) => id -> t.groupBy(identity).map { case (k, v) => k -> v.length.toLong } }
    val dl = tok.map { case (id, t) => id -> t.length.toLong }
    val nd = docs.length.toLong
    val sdl = dl.values.sum
    val dfm = tfm.values.flatMap(_.keys).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def bm25(qid: Long, did: Long): Long = {
      tfm(qid).keys.toSeq.map { term =>
        tfm(did).get(term).fold(0L) { tf =>
          val df = dfm(term)
          math.floor(((tf.toDouble * 2.2) /
            (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl(did).toDouble * nd / sdl)))) *
            ((nd - df + 0.5) / (df + 0.5)) * 1000000.0).toLong
        }
      }.sum
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val bk = docs.map { case (id, t) =>
      val c = new Array[Long](256)
      toks(t.toLowerCase).foreach { w =>
        c(md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff) += 1L }
      id -> c
    }.toMap
    val nrm = bk.map { case (id, c) => id -> c.map(x => x * x).sum }
    def cos(a: Long, b: Long): Double = {
      val (ca, cb) = (bk(a), bk(b))
      var d = 0L; var i = 0
      while (i < 256) { d += ca(i) * cb(i); i += 1 }
      d.toDouble / (math.sqrt(nrm(a).toDouble) * math.sqrt(nrm(b).toDouble))
    }
    val cands = docs.map(_._1)
    def recall(rank: Long => Seq[Long]): (Long, Long) = {
      val hits = qids.count(q => rank(q).take(topK).exists(rel(q))).toLong
      (qids.size.toLong, hits)
    }
    val bmRank = (q: Long) => cands.filter(_ != q)
      .map(d => (d, bm25(q, d))).filter(_._2 != 0L || true)
      .sortBy { case (d, s) => (-s, d) }.take(depth).map(_._1).toSeq
    val semRank = (q: Long) => cands.filter(_ != q)
      .filter(d => { val (ca, cb) = (bk(q), bk(d)); (0 until 256).exists(i => ca(i) > 0 && cb(i) > 0) })
      .map(d => (d, cos(q, d))).sortBy { case (d, s) => (-s, d) }.take(depth).map(_._1).toSeq
    val rrfRank = (q: Long) => {
      val lex = bmRank(q).zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
      val sem = semRank(q).zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
      (lex.keySet ++ sem.keySet).toSeq
        .map(d => (d, lex.get(d).fold(0L)(r => 1000000L / (rrfK + r)) +
          sem.get(d).fold(0L)(r => 1000000L / (rrfK + r))))
        .sortBy { case (d, s) => (-s, d) }.map(_._1)
    }
    val expected = Seq(
      ("bm25", recall(bmRank)), ("embed", recall(semRank)), ("rrf", recall(rrfRank)))
      .map { case (s, (n, h)) => (s, n, h, h * 1000L / n) }
    val gotRows = graft.ops.Hybrid.retrievalEval(spark, sf0001).collect()
    val got = gotRows
      .map(r => (r.getAs[String]("system"), r.getAs[Long]("n_queries"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_permille"))).toSeq
    assert(got == expected)
    // the sampling column: every row states the anchor population the
    // EvalQueries cap sampled from, and it can never be below the sample
    gotRows.foreach { r =>
      assert(r.getAs[Long]("n_queries_total") >= r.getAs[Long]("n_queries"))
    }
    // the measured corpus finding: histogram cosine resolves near-dups
    // this BM25 cannot discriminate on a 31-token shared vocabulary
    assert(got.find(_._1 == "embed").get._4 > got.find(_._1 == "bm25").get._4)
  }

  // ---------------------------------------------------------------- q155

  test("q155: consensus report matches an independent union-find over the three pair lists at sf0.001") {
    def pairsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
    val mh = pairsOf(graft.ops.Dedup.minhashLshPairs(spark, sf0001))
    val runs = pairsOf(graft.ops.Dedup.sharedRunPairs(spark, sf0001))
    val win = pairsOf(graft.ops.Dedup.winnowPairs(spark, sf0001))
    val edges = mh.map((_, "minhash")) ++ runs.map((_, "runs")) ++ win.map((_, "winnow"))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case ((a, b), _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = edges.flatMap { case ((a, b), _) => Seq(a, b) }.distinct.groupBy(find)
    val expected = members.toSeq.map { case (cl, ms) =>
      val ce = edges.filter { case ((a, _), _) => find(a) == cl }
      val byPair = ce.groupBy(_._1)
      (cl, ms.length.toLong, byPair.size.toLong,
        ce.count(_._2 == "minhash").toLong, ce.count(_._2 == "runs").toLong,
        ce.count(_._2 == "winnow").toLong,
        byPair.values.map(_.length).max.toLong)
    }.sortBy(_._1)
    val got = graft.ops.Dedup.consensusClusters(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_edges"), r.getAs[Long]("minhash_edges"),
        r.getAs[Long]("run_edges"), r.getAs[Long]("winnow_edges"),
        r.getAs[Long]("max_agreement"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
    // the three detectors genuinely disagree somewhere on this corpus
    // (otherwise the consensus graph adds nothing over any one signal)
    assert(got.exists(_._7 >= 2L) || got.exists(c => c._4 == 0L || c._5 == 0L || c._6 == 0L))
  }

  test("q155: single-signal and full-agreement clusters are separated by max_agreement") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q155-planted")
    // pair (0,1): verbatim duplicates -> ALL THREE signals fire, agreement 3.
    // pair (10,11): bag-similar but sequence-scrambled with distinct word
    // FORMS per doc is hard to plant portably; instead use a pair sharing
    // only a 14-token run — long enough for >= 2 shared winnow
    // fingerprints, below q145's 20-token floor, and far too little
    // bag overlap for minhash at 0.5: a winnow-only edge.
    val dup = (0 until 80).map(i => s"dd$i").mkString(" ")
    val run8 = (0 until 14).map(i => s"rr$i").mkString(" ")
    val fillA = (0 until 70).map(i => s"fa$i").mkString(" ")
    val fillB = (0 until 70).map(i => s"fb$i").mkString(" ")
    Seq(
      (0L, dup, "en", "s0", 1L),
      (1L, dup, "en", "s0", 1L),
      (10L, s"$fillA $run8", "en", "s0", 1L),
      (11L, s"$run8 $fillB", "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.consensusClusters(spark, dir).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("minhash_edges"), r.getAs[Long]("run_edges"),
        r.getAs[Long]("winnow_edges"), r.getAs[Long]("max_agreement"))).toSeq
    assert(got.length == 2, s"got $got")
    val full = got.find(_._1 == 0L).get
    assert(full == (0L, 2L, 1L, 1L, 1L, 3L),
      s"verbatim dup must carry all three signals: $full")
    val weak = got.find(_._1 == 10L).get
    assert(weak._3 == 0L && weak._4 == 0L && weak._5 >= 1L && weak._6 == 1L,
      s"the 8-token-run pair must be winnow-only: $weak")
  }

  // ---------------------------------------------------------------- q156

  test("q156: entropy report matches an independent recompute at sf0.001") {
    def bl(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val expected = docs.map { case (id, t) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val hist = bytes.groupBy(b => b & 0xff).map { case (_, v) => v.length.toLong }
      val n = bytes.length.toLong
      val ent = hist.map(c => c * (bl(n) - bl(c))).sum
      (id, n, hist.size.toLong, if (n == 0) 0L else ent * 1000L / n)
    }.toSeq
    val got = graft.ops.TextAnalytics.byteEntropy(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bytes"),
        r.getAs[Long]("distinct_bytes"), r.getAs[Long]("entropy_milli_bits"))).toSeq
    assert(got == expected)
  }

  test("q156: high-entropy binary-like payloads read far above natural text") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q156-planted")
    // pseudo-random printable bytes (a base64-blob stand-in) vs words
    val rnd = new scala.util.Random(7)
    val junk = (0 until 800).map(_ => (33 + rnd.nextInt(94)).toChar).mkString
    val words = (0 until 130).map(i => Seq("alpha", "beta", "gamma", "delta")(i % 4)).mkString(" ")
    Seq((0L, words, "en", "s0", 1L), (1L, junk, "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalytics.byteEntropy(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("entropy_milli_bits"))).toMap
    assert(got(1L) > got(0L) + 2000L,
      s"binary-like payload must read well over 2 bits above repetitive words: $got")
  }

  test("q156: non-ASCII docs histogram BYTES, not characters, matching a local byte-level reference") {
    import spark.implicits._
    def bl(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val dir = graft.streaming.StreamScratch.dir("q156-multibyte")
    // 2-byte (é), 3-byte (CJK), and 4-byte (emoji) UTF-8 sequences —
    // the byte histogram must count each byte of the encoding
    val docs = Seq(
      (0L, "héllo wörld café résumé"),
      (1L, "中文文本的字节熵检查 中文文本"),
      (2L, "ascii only words here"),
      (3L, "mixed ascii with 😀 emoji and ümläuts"))
    docs.map { case (id, t) => (id, t, "xx", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val expected = docs.map { case (id, t) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val hist = bytes.groupBy(b => b & 0xff).map { case (_, v) => v.length.toLong }
      val n = bytes.length.toLong
      val ent = hist.map(c => c * (bl(n) - bl(c))).sum
      (id, n, hist.size.toLong, if (n == 0) 0L else ent * 1000L / n)
    }
    val got = graft.ops.TextAnalytics.byteEntropy(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bytes"),
        r.getAs[Long]("distinct_bytes"), r.getAs[Long]("entropy_milli_bits"))).toSeq
    assert(got == expected)
    // the probe is genuinely multi-byte: byte length exceeds char length
    assert(got.head._2 > docs.head._2.length.toLong)
  }

  // ---------------------------------------------------------------- q157

  test("q157: flagged cells match an independent recompute and respect the K floor") {
    val k = graft.ops.TextAnalytics.SmallCellK
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100L))
    val expected = docs.groupBy(identity).map { case (cell, v) =>
      (cell._1, cell._2, cell._3, v.length.toLong)
    }.filter(_._4 < k).toSeq.sortBy(c => (c._1, c._2, c._3))
    val got = graft.ops.TextAnalytics.smallCells(spark, sf0001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("len_band"), r.getAs[Long]("n_docs"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.forall(_._4 < k))
  }

  // ---------------------------------------------------------------- q158

  test("q158: walks match an independent hash-driven traversal at sf0.001") {
    val steps = graft.ops.Dedup.WalkSteps
    val pairs = graft.ops.Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (n, v) => n -> v.map(_._2).sorted }
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val expected = adj.keys.toSeq.sorted.flatMap { start =>
      var cur = start
      (0 to steps).map { t =>
        if (t > 0) {
          val nbrs = adj(cur)
          cur = nbrs((h32(s"$start|$cur|$t") % nbrs.length).toInt)
        }
        (start, t.toLong, cur)
      }
    }
    val got = graft.ops.Dedup.dupGraphWalks(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("start"), r.getAs[Long]("step"), r.getAs[Long]("node"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
    // walks actually move: some step-1 node differs from its start
    assert(got.exists(w => w._2 == 1L && w._3 != w._1))
  }

  // ---------------------------------------------------------------- q159

  test("q159: weight table matches an independent union-find and conserves content mass") {
    val pairs = graft.ops.Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val inGraph = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val cluster = ids.map(id => id -> (if (inGraph(id)) find(id) else id)).toMap
    val size = cluster.values.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
    val expected = ids.map { id =>
      val c = cluster(id); val s = size(c)
      (id, c, s, 1000L / s)
    }.toSeq
    val got = graft.ops.Dedup.dupLossWeights(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Long]("weight_milli"))).toSeq
    assert(got == expected)
    // conservation: each cluster's weights sum to 1000 minus the floor
    // remainder (< cluster_size milli) — content counts once
    got.groupBy(_._2).foreach { case (_, ms) =>
      val total = ms.map(_._4).sum
      val s = ms.head._3
      assert(total <= 1000L && total > 1000L - s, s"cluster mass $total size $s")
    }
    assert(got.exists(_._4 == 1000L) && got.exists(_._4 < 1000L))
  }

  // ---------------------------------------------------------------- q160

  test("q160: sweep is monotone, anchored by exhaustive search, and consistent with q76 at nprobe=2") {
    val got = graft.ops.Similarity.nprobeSweep(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_true"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("recall_permille"))).toSeq
    assert(got.map(_._1) == graft.ops.Similarity.NprobeSweep.map(_.toLong))
    // cost strictly grows with probes; recall never decreases
    assert(got.sliding(2).forall { case Seq(a, b) => b._2 > a._2 && b._5 >= a._5 })
    // the self-validating anchor: probing every list IS exhaustive search
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    val last = got.last
    assert(last._5 == 1000L && last._4 == last._3)
    assert(last._2 == graft.core.Consts.KnnQueries * (n - 1),
      s"nprobe=all must scan every candidate: ${last._2} vs ${graft.core.Consts.KnnQueries * (n - 1)}")
    // cross-operator consistency: the nprobe=2 row micro-averages
    // exactly q76's per-query recall report
    val q76 = graft.ops.Similarity.annRecall(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("n_true"), r.getAs[Long]("n_hit")))
    val p2 = got.find(_._1 == 2L).get
    assert(p2._3 == q76.map(_._1).sum && p2._4 == q76.map(_._2).sum)
  }

  // ---------------------------------------------------------------- q161

  test("q161: triplets match an independent mining recompute at sf0.001") {
    val pairs = graft.ops.Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val rel = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (q, v) => q -> v.map(_._2).toSet }
    val anchors = rel.keySet.toSeq.sorted.take(graft.ops.Hybrid.EvalQueries)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val bk = docs.map { case (id, t) =>
      val c = new Array[Long](256)
      toks(t.toLowerCase).foreach { w =>
        c(md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff) += 1L }
      id -> c
    }.toMap
    val nrm = bk.map { case (id, c) => id -> c.map(x => x * x).sum }
    def cos(a: Long, b: Long): Double = {
      val (ca, cb) = (bk(a), bk(b))
      var d = 0L; var i = 0
      while (i < 256) { d += ca(i) * cb(i); i += 1 }
      d.toDouble / (math.sqrt(nrm(a).toDouble) * math.sqrt(nrm(b).toDouble))
    }
    val ids = docs.map(_._1)
    val expected = anchors.map { a =>
      val pos = rel(a).min
      val negs = ids.filter(d => d != a && !rel(a)(d))
        .filter(d => { val (ca, cb) = (bk(a), bk(d)); (0 until 256).exists(i => ca(i) > 0 && cb(i) > 0) })
        .map(d => (d, cos(a, d)))
      val (neg, negSim) = negs.minBy { case (d, s) => (-s, d) }
      val posP = math.floor(cos(a, pos) * 1000.0).toLong
      val negP = math.floor(negSim * 1000.0).toLong
      (a, pos, posP, neg, negP, posP - negP)
    }
    val got = graft.ops.Hybrid.trainingTriplets(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("anchor"), r.getAs[Long]("positive"),
        r.getAs[Long]("pos_sim_permille"), r.getAs[Long]("negative"),
        r.getAs[Long]("neg_sim_permille"), r.getAs[Long]("margin_permille"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q161: a bag-identical scrambled decoy is mined as a NEGATIVE-margin hard negative") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q161-planted")
    val words = (0 until 60).map(i => s"tw1x$i")
    val aTxt = words.mkString(" ")
    // positive: last 10 words swapped -> shingle J ~ 0.7 (verified pair)
    val pTxt = (words.take(50) ++ (0 until 10).map(i => s"tp1x$i")).mkString(" ")
    // decoy: the SAME bag reversed -> identical histogram (cosine
    // exactly 1000) but near-zero shingle overlap: never a partner
    val dTxt = words.reverse.mkString(" ")
    Seq((0L, aTxt, "en", "s0", 1L), (1L, pTxt, "en", "s0", 1L),
        (2L, dTxt, "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // fixture sanity: exactly the (0,1) pair is verified
    val edges = graft.ops.Dedup.minhashLshPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(edges == Set((0L, 1L)), s"fixture banding drifted: $edges")
    val got = graft.ops.Hybrid.trainingTriplets(spark, dir).collect()
      .map(r => (r.getAs[Long]("anchor"), r.getAs[Long]("positive"),
        r.getAs[Long]("negative"), r.getAs[Long]("neg_sim_permille"),
        r.getAs[Long]("margin_permille"))).toSeq
    val a0 = got.find(_._1 == 0L).get
    assert(a0._2 == 1L && a0._3 == 2L)
    // identical histograms: dot = n but sqrt(n)*sqrt(n) can round a
    // half-ulp BELOW n, so the floored permille reads 999 or 1000
    assert(a0._4 >= 999L, s"bag-identical decoy must read cosine ~1000: $a0")
    assert(a0._5 < 0L, s"the hard negative out-similars the positive: $a0")
  }

  // ---------------------------------------------------------------- q162

  test("q162: LM matrix matches an independent add-one recompute at sf0.001") {
    def bl(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    docs.foreach { case (s, t) =>
      toks(t).foreach(w => counts((s, w)) = counts.getOrElse((s, w), 0L) + 1L) }
    val sources = docs.map(_._1).distinct.sorted
    val vocab = counts.keys.map(_._2).toSeq.distinct
    val v = vocab.size.toLong
    val totals = sources.map(s => s -> vocab.map(w => counts.getOrElse((s, w), 0L)).sum).toMap
    val expected = (for {
      m <- sources; e <- sources
    } yield {
      val (bitsSum, nEval) = vocab.foldLeft((0L, 0L)) { case ((bs, ne), w) =>
        val ce = counts.getOrElse((e, w), 0L)
        if (ce == 0L) (bs, ne)
        else (bs + ce * (bl(totals(m) + v) - bl(counts.getOrElse((m, w), 0L) + 1L)), ne + ce)
      }
      (m, e, bitsSum * 1000L / nEval)
    }).sortBy(c => (c._1, c._2)).toSeq
    val got = graft.ops.TextAnalytics.sourceLmMatrix(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source_model"), r.getAs[String]("source_eval"),
        r.getAs[Long]("milli_bits"))).toSeq
    assert(got == expected)
    assert(got.size == sources.size * sources.size)
  }

  test("q162: a disjoint-vocabulary source reads far above the diagonal; a twin reads at it") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q162-planted")
    val common = (0 until 40).map(i => s"cm$i")
    def draw(seed: Int): String =
      (0 until 120).map(i => common((i * (seed + 3) + seed) % 40)).mkString(" ")
    val alien = (0 until 120).map(i => s"al${i % 30}").mkString(" ")
    Seq(
      (0L, draw(1), "en", "twinA", 1L), (1L, draw(2), "en", "twinA", 1L),
      (2L, draw(3), "en", "twinB", 1L), (3L, draw(4), "en", "twinB", 1L),
      (4L, alien, "en", "alien", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalytics.sourceLmMatrix(spark, dir).collect()
      .map(r => ((r.getAs[String]("source_model"), r.getAs[String]("source_eval")),
        r.getAs[Long]("milli_bits"))).toMap
    // the alien's tokens are UNSEEN by twinA's LM: every one pays the
    // full add-one-floor surprisal, far above twinA's own diagonal
    assert(got(("twinA", "alien")) > got(("twinA", "twinA")) + 2000L,
      s"alien must read >2 bits above the diagonal: $got")
    // twin sources drawn from the same vocabulary read near each other
    val crossTwin = got(("twinA", "twinB"))
    val diag = got(("twinA", "twinA"))
    assert(math.abs(crossTwin - diag) < 2000L, s"twin cross $crossTwin vs diag $diag")
  }

  // ---------------------------------------------------------------- q163

  /** Pure-Scala winnowing fingerprints (the q128 kernel re-derived). */
  private def refWinnowFps(t: Array[String]): Set[Long] = {
    val n = graft.ops.Dedup.WinnowGramN; val w = graft.ops.Dedup.WinnowWindow
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = t.length - n + 1
    if (m <= 0) Set.empty
    else {
      val h = (0 until m).map { i =>
        val d = md.digest(t.slice(i, i + n).mkString(" ")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
          ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      }.toArray
      (0 to math.max(0, m - w)).map { s =>
        h.slice(s, math.min(s + w, m)).min
      }.toSet
    }
  }

  test("q163: attribution matches an independent fingerprint recompute at sf0.001") {
    val minShared = graft.ops.Dedup.WinnowMinShared
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val fps = docs.map { case (id, s, t) => (id, s, refWinnowFps(toks(t))) }
    val bySource = fps.groupBy(_._2).map { case (s, v) => s -> v.flatMap(_._3).toSet }
    val expected = fps.flatMap { case (id, s, f) =>
      val cands = bySource.keys.filter(_ != s).map { os =>
        (os, f.count(bySource(os)).toLong)
      }.filter(_._2 >= minShared).toSeq
      if (cands.isEmpty || f.isEmpty) None
      else {
        val (best, n) = cands.minBy { case (os, c) => (-c, os) }
        Some((id, best, n, f.size.toLong, n * 1000L / f.size))
      }
    }.toSeq.sortBy(_._1)
    val got = graft.ops.Dedup.winnowAttribution(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("attr_source"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("n_fp"),
        r.getAs[Long]("share_permille"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q163: a copied paragraph attributes to its origin source; a unique doc is absent") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q163-planted")
    val para = (0 until 40).map(i => s"org$i").mkString(" ")
    Seq(
      (0L, para, "en", "origin", 1L),
      // the copier quotes the paragraph after its own intro
      (1L, s"own0 own1 own2 $para", "en", "copier", 1L),
      (2L, (0 until 40).map(i => s"uni$i").mkString(" "), "en", "loner", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.winnowAttribution(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("attr_source"),
        r.getAs[Long]("share_permille"))).toSeq
    val copier = got.find(_._1 == 1L).get
    assert(copier._2 == "origin" && copier._3 > 500L,
      s"the quoted paragraph dominates the copier's fingerprints: $copier")
    assert(!got.exists(_._1 == 2L), "a content-unique doc gets no attribution")
  }

  // ---------------------------------------------------------------- q164

  test("q164: the streaming entropy screen replays row-identical to batch q156") {
    val batch = graft.ops.TextAnalytics.byteEntropy(spark, sf0001)
      .collect().map(_.toString).toSeq
    val streamed = graft.streaming.DedupStream.entropyStream(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
