package graft

import org.apache.spark.sql.functions._

/** Specs for the round-6 curation additions: quality-aware survivor
  * selection (q106), the Count-Min sketch (q107), semantic
  * decontamination (q108), decontamination redaction (q109), SQ8
  * scalar-quantization recall (q110), and the streaming quality gate
  * (q111). Each is checked against an INDEPENDENT in-spec reference
  * implementation (union-find, pure-Scala hashing/argmax), not against
  * the operator's own machinery.
  */
class Round6OpsSpec extends SparkSpec {

  /** Pure-Scala first-4-md5-bytes hash — independent of Dedup.packHash. */
  private def hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private def toks(text: String): Array[String] =
    text.trim.split("\\s+").filter(_.nonEmpty)

  // ---------------------------------------------------------------- q106

  test("q106: quality survivor is the per-cluster quality argmax (union-find reference)") {
    val out = graft.ops.Dedup.qualitySurvivors(spark, sf0001, 32).collect()
    assert(out.nonEmpty, "no clusters at sf0.001 — the spec corpus has known dup families")
    out.foreach { r =>
      // the naive (min-id) survivor IS the component label by construction
      assert(r.getAs[Long]("naive_doc_id") == r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("n_members") >= 2L)
      val sq = r.getAs[Double]("survivor_quality")
      val nq = r.getAs[Double]("naive_quality")
      assert(sq >= nq, s"quality rule picked a worse survivor: $sq < $nq")
      assert(r.getAs[Boolean]("upgraded") ==
        (r.getAs[Long]("survivor_doc_id") != r.getAs[Long]("naive_doc_id")))
      assert(r.getAs[Double]("quality_gain") == sq - nq)
    }
    // independent reference: union-find over the same edge set, quality
    // from the oracle-checked q10 report
    val edges = graft.ops.Dedup.dedupGraphEdges(spark, sf0001, 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val q = graft.ops.TextAnalytics.qualityScore(spark, sf0001)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .groupBy(find).map { case (root, ms) =>
        (root, ms.length.toLong, ms.minBy(m => (-q(m), m)))
      }.toSet
    val got = out.map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_members"),
      r.getAs[Long]("survivor_doc_id"))).toSet
    assert(got == expected, s"survivor sets diverge:\n got $got\n exp $expected")
    // the whole point: at least one cluster's best doc is not the min id
    assert(out.exists(_.getAs[Boolean]("upgraded")),
      "spec corpus should contain a cluster where quality beats crawl order")
  }

  // ---------------------------------------------------------------- q107

  test("q107: CMS never underestimates and overestimates under forced collisions") {
    import spark.implicits._
    // vocabulary (4000 singletons + 1 hot) far exceeds the 1024-cell
    // width, so every row of the sketch carries collisions
    val hot = Seq.fill(300)("hot")
    val rare = (0 until 4000).map(i => s"r$i")
    val words = new scala.util.Random(11).shuffle(hot ++ rare)
    val docs = words.grouped(50).zipWithIndex
      .map { case (ws, i) => (i.toLong, "src0", ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("cms_probe")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.ops.Sketches.cmsTokensChecked(spark, tmp.toString).collect()
    assert(out.length == 4001)
    val exact = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    out.foreach { r =>
      val tok = r.getAs[String]("tok")
      assert(r.getAs[Long]("n_exact") == exact(tok))
      assert(r.getAs[Boolean]("within_bound"), s"CMS underestimated $tok")
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("overcount") == r.getAs[Long]("cms_est") - r.getAs[Long]("n_exact"))
    }
    assert(out.count(_.getAs[Long]("overcount") > 0) > 0,
      "4001 tokens into 1024 columns must collide somewhere")
    // the heavy hitter's estimate still dominates the noise floor
    val hotRow = out.find(_.getAs[String]("tok") == "hot").get
    assert(hotRow.getAs[Long]("cms_est") >= 300L)
  }

  // ---------------------------------------------------------------- q108

  test("q108: scan-local argmax equals an independent per-row reference") {
    val out = graft.ops.Similarity.semanticDecontam(spark, sf0001).collect()
    val vecs = graft.core.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong).toArray))
      .sortBy(_._1)
    val bench = vecs.filter(_._1 < graft.ops.Similarity.SemDecontamBenchVecs)
    val corpus = vecs.filter(_._1 >= graft.ops.Similarity.SemDecontamBenchVecs)
    def nrm(v: Array[Long]): Long = v.map(x => x * x).sum
    val expected = corpus.map { case (vid, v) =>
      val sq = math.sqrt(nrm(v).toDouble)
      var bestId = -1L; var bestSim = 0.0
      bench.foreach { case (bid, bv) =>
        var dot = 0L; var k = 0
        while (k < v.length) { dot += bv(k) * v(k); k += 1 }
        val sim = dot.toDouble / (math.sqrt(nrm(bv).toDouble) * sq)
        if (bestId == -1L || java.lang.Double.compare(sim, bestSim) > 0) {
          bestSim = sim; bestId = bid
        }
      }
      (vid, bestId, bestSim)
    }.toSeq
    val got = out.map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Long]("nearest_bench_id"), r.getAs[Double]("max_sim"))).toSeq
    assert(got == expected)
    out.foreach { r =>
      assert(r.getAs[Boolean]("leaked") ==
        (r.getAs[Double]("max_sim") >= graft.core.Consts.CosineNearDupThreshold))
    }
  }

  // ---------------------------------------------------------------- q109

  test("q109: redaction rebuilds exactly the uncovered tokens (independent reference)") {
    val out = graft.ops.Dedup.decontamRedact(spark, sf0001, 32).collect()
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val benchDocs = docs.filter(_._1 < graft.ops.Dedup.DecontamBenchmarkDocs)
    val bench: Set[Long] = benchDocs.flatMap { case (_, txt) =>
      val t = toks(txt)
      (0 to t.length - 3).map(i => hash32(s"${t(i)} ${t(i + 1)} ${t(i + 2)}"))
    }.toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
    val expected = docs.filter(_._1 >= graft.ops.Dedup.DecontamBenchmarkDocs)
      .map { case (id, txt) =>
        val t = toks(txt)
        val covered = Array.fill(t.length)(false)
        for (i <- 0 to t.length - 3)
          if (bench.contains(hash32(s"${t(i)} ${t(i + 1)} ${t(i + 2)}")))
            (i to i + 2).foreach(covered(_) = true)
        val kept = t.indices.filterNot(covered).map(t)
        (id, t.length.toLong, (t.length - kept.length).toLong,
          kept.length == t.length, md5hex(kept.mkString(" ")))
      }.toSeq
    val got = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
      r.getAs[Long]("n_removed"), r.getAs[Boolean]("clean"),
      r.getAs[String]("redacted_hash"))).toSeq
    assert(got == expected)
    assert(out.exists(!_.getAs[Boolean]("clean")),
      "spec corpus contains benchmark overlap (q62 finds it) — redaction must too")
  }

  test("q109: a planted benchmark quote is cut, surrounding text survives") {
    import spark.implicits._
    // doc 0 is the benchmark; doc 100 quotes 3 of its tokens verbatim
    val docs = Seq(
      (0L, "bench", "alpha beta gamma delta"),
      (100L, "web", "intro words here alpha beta gamma delta trailing words stay"),
      (101L, "web", "totally unrelated clean document text")
    ).toDF("doc_id", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("redact_probe")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.ops.Dedup.decontamRedact(spark, tmp.toString, 32)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[Boolean]("clean"))).toMap
    // all four quoted tokens are covered by the matching 3-grams
    assert(out(100L)._1 == 4L && !out(100L)._2)
    assert(out(101L)._1 == 0L && out(101L)._2)
  }

  // ---------------------------------------------------------------- q110

  test("q110: SQ8 recall report is well-formed and the 8x-compressed index is usable") {
    val out = graft.ops.Similarity.sq8Recall(spark, sf0001).collect()
    assert(out.length == graft.core.Consts.KnnQueries.toInt)
    out.foreach { r =>
      assert(r.getAs[Long]("n_true") == graft.core.Consts.KnnK.toLong)
      val hit = r.getAs[Long]("n_hit")
      val rp = r.getAs[Long]("recall_permille")
      assert(hit >= 0L && hit <= r.getAs[Long]("n_true"))
      assert(rp == hit * 1000L / r.getAs[Long]("n_true"))
    }
    // SQ8 keeps 8 bits/dim of real signal: mean recall must beat chance
    // by a wide margin (brute-force over reconstructions, not a prune)
    val mean = out.map(_.getAs[Long]("recall_permille")).sum / out.length
    assert(mean >= 500L, s"SQ8 mean recall collapsed: $mean permille")
  }

  // ---------------------------------------------------------------- q111

  test("q111: streaming gate replay is row-identical to the batch gate") {
    val streamed = graft.streaming.DedupStream.gateStream(spark, sf0001).collect().toSeq
    val batch = graft.ops.TextAnalytics.gopherGate(spark, sf0001).collect().toSeq
    assert(streamed == batch)
  }

  // ---------------------------------------------------------------- q112

  test("q112: streaming decontamination replay is row-identical to the batch screen") {
    val streamed = graft.streaming.DedupStream.decontamStream(spark, sf0001).collect().toSeq
    val batch = graft.ops.Dedup.decontamination(spark, sf0001, 32).collect().toSeq
    assert(streamed == batch)
    assert(streamed.exists(_.getAs[Boolean]("contaminated")),
      "the spec corpus has known benchmark overlap — the stream must flag it")
  }

  // ---------------------------------------------------------------- q113

  test("q113: closed-form waterfill matches the iterative UniMax reference") {
    val rows = graft.ops.Sampling.uniMaxAllocation(spark, sf0001).collect()
    val cap = rows.map(r => r.getAs[String]("lang") -> r.getAs[Long]("capacity")).toMap
    val budget = graft.ops.Sampling.UniMaxBudgetX * rows.map(_.getAs[Long]("n_tokens")).sum
    // independent reference: the paper's iterative waterfill — give every
    // unsaturated language an equal share, cap whoever can't absorb it,
    // repeat until the level clears all remaining capacities
    var satSet = Map.empty[String, Long]
    var remaining = budget
    var live = cap.keySet
    var level = 0L
    var done = false
    while (!done && live.nonEmpty) {
      val lvl = remaining / live.size
      val newSat = live.filter(l => cap(l) <= lvl)
      if (newSat.isEmpty) { level = lvl; done = true }
      else {
        satSet ++= newSat.map(l => l -> cap(l))
        remaining -= newSat.toSeq.map(cap).sum
        live --= newSat
      }
    }
    rows.foreach { r =>
      val l = r.getAs[String]("lang")
      assert(r.getAs[Boolean]("saturated") == satSet.contains(l))
      val expect = satSet.getOrElse(l, level)
      assert(r.getAs[Long]("alloc_tokens") == expect,
        s"$l: operator ${r.getAs[Long]("alloc_tokens")} != reference $expect")
    }
    // both branches must actually be exercised by the spec corpus
    assert(rows.exists(_.getAs[Boolean]("saturated")), "no saturated language — cap too high to test")
    assert(rows.exists(!_.getAs[Boolean]("saturated")), "all saturated — budget exceeds total capacity")
    // budget exhausted up to the documented integer undershoot (< live slots)
    val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc <= budget && budget - alloc < math.max(1, live.size),
      s"undershoot ${budget - alloc} outside [0, ${live.size})")
  }

  // ---------------------------------------------------------------- q114

  test("q114: training order is a bijection with contiguous per-shard positions and unique global steps") {
    val rows = graft.ops.Sampling.trainOrder(spark, sf0001).collect()
    val nShards = graft.ops.Sampling.NumShards
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq == docs.toSeq,
      "every doc appears exactly once")
    rows.foreach { r =>
      // shard is the independent pure-Scala hash, mod NumShards
      assert(r.getAs[Long]("shard") == hash32(r.getAs[Long]("doc_id").toString) % nShards)
      assert(r.getAs[Long]("global_step") ==
        (r.getAs[Long]("position") - 1) * nShards + r.getAs[Long]("shard"))
    }
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      // positions are 1..len, ordered by the content-independent (h, doc_id)
      assert(rs.map(_.getAs[Long]("position")).sorted.toSeq == (1L to rs.length).toSeq)
      val byPos = rs.sortBy(_.getAs[Long]("position"))
        .map(r => (hash32(r.getAs[Long]("doc_id").toString), r.getAs[Long]("doc_id")))
      assert(byPos.toSeq == byPos.sortBy(identity).toSeq, "shard order is (h, doc_id)")
    }
    val steps = rows.map(_.getAs[Long]("global_step"))
    assert(steps.distinct.length == steps.length, "global steps are unique")
  }

  // ---------------------------------------------------------------- q115

  test("q115: dup-span redaction matches an independent keeper/cut reference over every doc") {
    val n = graft.ops.Dedup.DupSpanN
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    // independent reference: gram -> min doc_id, then per-doc position cut
    def grams(t: Array[String]): Seq[(Int, Long)] =
      (0 to t.length - n).map(i => i -> (hash32(t.slice(i, i + n).mkString(" ")) & 0xffffffffL))
    val keeper = scala.collection.mutable.Map.empty[Long, Long]
    docs.foreach { case (id, txt) =>
      grams(toks(txt)).foreach { case (_, gh) =>
        if (!keeper.contains(gh) || keeper(gh) > id) keeper(gh) = id
      }
    }
    val expected = docs.map { case (id, txt) =>
      val t = toks(txt)
      val covered = new Array[Boolean](t.length)
      grams(t).foreach { case (i, gh) =>
        if (keeper(gh) < id) (i until math.min(i + n, t.length)).foreach(covered(_) = true)
      }
      val kept = t.indices.filterNot(covered).map(t)
      (id, t.length.toLong, covered.count(identity).toLong, kept.mkString(" "))
    }
    val out = graft.ops.Dedup.dupSpanRedact(spark, sf0001, 32).collect()
    assert(out.length == docs.length)
    out.zip(expected).foreach { case (r, (id, nt, nRem, rt)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Long]("n_tokens") == nt)
      assert(r.getAs[Long]("n_removed") == nRem, s"doc $id removed count")
      assert(r.getAs[Boolean]("clean") == (nRem == 0L))
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(rt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(r.getAs[String]("redacted_hash") == md.map("%02x".format(_)).mkString,
        s"doc $id redacted text")
    }
    // both branches fire on the spec corpus, and the earliest doc of any
    // dup family is untouched by construction of the min-id keeper rule
    assert(out.exists(_.getAs[Long]("n_removed") > 0L), "no spans cut — dup families exist at sf0.001")
    assert(out.exists(r => r.getAs[Boolean]("clean") && r.getAs[Long]("n_tokens") >= n),
      "some gram-bearing doc stays clean")
  }

  // ---------------------------------------------------------------- q116

  test("q116: perplexity terciles match an independent per-language cut reference") {
    // independent per-doc surprisal from the oracle-checked q94 report
    val sp = graft.ops.TextAnalytics.surprisalScores(spark, sf0001)
      .select("doc_id", "surprisal_mean_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val langOf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byLang = sp.keys.groupBy(langOf)
    val expected = byLang.flatMap { case (lang, ids) =>
      val vals = ids.toSeq.map(sp).sorted // toSeq FIRST: ids is a Set and mapping would dedup ties
      val nn = vals.length
      def atRank(k: Int) = vals(k - 1) // k-th smallest = smallest value with cum >= k
      val t1 = atRank((nn + 2) / 3)
      val t2 = atRank((2 * nn + 2) / 3)
      ids.groupBy { id =>
        val s = sp(id)
        if (s <= t1) "head" else if (s <= t2) "middle" else "tail"
      }.map { case (bucket, bIds) =>
        (lang, bucket) -> (bIds.size.toLong, bIds.map(identity).sum,
          bIds.map(sp).min, bIds.map(sp).max, t1, t2)
      }
    }
    val out = graft.ops.TextAnalytics.perplexityBuckets(spark, sf0001).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("bucket"))
      val (nd, idSum, minS, maxS, t1, t2) = expected(key)
      assert(r.getAs[Long]("n_docs") == nd, s"$key n_docs")
      assert(r.getAs[Long]("doc_id_sum") == idSum, s"$key doc_id_sum")
      assert(r.getAs[Long]("min_s") == minS && r.getAs[Long]("max_s") == maxS, s"$key extremes")
      assert(r.getAs[Long]("t1") == t1 && r.getAs[Long]("t2") == t2, s"$key cuts")
    }
    // value-based invariants (ties SHARE buckets, so on this synthetic
    // corpus — surprisal mass concentrated at one value — the middle
    // tercile is legitimately empty and t1 == t2 reports that): head is
    // never empty, head holds at least its rank share, and value ranges
    // never overlap across buckets. Per-language bucket MULTIPLICITY is
    // already pinned exactly by the reference equality above (a dominant
    // top value can legitimately collapse a language to one bucket), so
    // only corpus meaningfulness is asserted: somewhere the cut splits.
    assert(out.groupBy(_.getAs[String]("lang")).exists(_._2.length >= 2),
      "no language splits at all — bucketing untested")
    val byLangOut = out.groupBy(_.getAs[String]("lang"))
    byLangOut.foreach { case (l, rs) =>
      val n = rs.map(_.getAs[Long]("n_docs")).sum
      val head = rs.find(_.getAs[String]("bucket") == "head")
      assert(head.isDefined, s"$l: head empty")
      assert(head.get.getAs[Long]("n_docs") >= (n + 2) / 3, s"$l: head below its rank share")
      val ordered = Seq("head", "middle", "tail").flatMap(b => rs.find(_.getAs[String]("bucket") == b))
      ordered.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.getAs[Long]("max_s") < b.getAs[Long]("min_s"), s"$l: bucket value ranges overlap")
        case _ => ()
      }
    }
  }

  // ---------------------------------------------------------------- q117

  test("q117: cluster-balanced sample caps every cluster at the quota with a hash-deterministic kept set") {
    val out = graft.ops.Similarity.clusterBalancedSample(spark, sf0001).collect()
    val quota = graft.ops.Similarity.ClusterQuota
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nt, nk) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      assert(nk == math.min(nt, quota), s"cluster ${r.getAs[Long]("cid")}: kept $nk of $nt")
    }
    assert(out.exists(_.getAs[Long]("n_total") > quota), "no cluster exceeds the quota — cap untested")
    assert(out.exists(r => r.getAs[Long]("n_total") <= quota), "every cluster capped — uncapped branch untested")
    assert(out.map(_.getAs[Long]("n_total")).sum == 500L, "every vector assigned exactly once")
    // kept set is the hash-order prefix: recompute from the oracle-checked
    // q73 assignment semantics via the operator's own assignment is NOT
    // independent, so derive membership from kept_id_sum stability across
    // a re-run (determinism) plus the quota arithmetic above
    val again = graft.ops.Similarity.clusterBalancedSample(spark, sf0001).collect()
    assert(out.map(r => (r.getAs[Long]("cid"), r.getAs[Long]("kept_id_sum"))).toSeq ==
      again.map(r => (r.getAs[Long]("cid"), r.getAs[Long]("kept_id_sum"))).toSeq)
    // the pre-shuffle group-limit shape must hold (the q53 skew argument)
    val plan = graft.ops.Similarity.clusterBalancedSample(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  // ---------------------------------------------------------------- q118

  test("q118: shard manifest matches an independent order-sensitive checksum and detects reordering") {
    val mod = graft.ops.Sampling.ManifestMod
    val nShards = graft.ops.Sampling.NumShards
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // independent reference: pure-Scala shard, order, checksum
    val ordered = docs
      .map { case (id, txt) => (id, hash32(id.toString), hash32(txt),
        toks(txt).length.toLong) }
      .groupBy(_._2 % nShards)
      .map { case (shard, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._1))
        val checksum = sorted.zipWithIndex
          .map { case ((_, _, ch, _), i) => ((i + 1).toLong * ch) % mod }
          .sum % mod
        shard -> (rs.length.toLong, rs.map(_._1).sum, rs.map(_._4).sum, checksum)
      }
    val out = graft.ops.Sampling.shardManifest(spark, sf0001).collect()
    assert(out.length == ordered.size)
    out.foreach { r =>
      val (nd, idSum, nt, cs) = ordered(r.getAs[Long]("shard"))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("id_sum") == idSum)
      assert(r.getAs[Long]("n_tokens") == nt)
      assert(r.getAs[Long]("ordered_checksum") == cs,
        s"shard ${r.getAs[Long]("shard")} checksum")
    }
    // sensitivity probe: swapping two adjacent UNEQUAL docs in any shard
    // changes the checksum (position weights differ)
    val probe = ordered.collectFirst {
      case (shard, _) if docs.count(d => hash32(d._1.toString) % nShards == shard) >= 2 => shard
    }.get
    val rs = docs.filter(d => hash32(d._1.toString) % nShards == probe)
      .map { case (id, txt) => (id, hash32(id.toString), hash32(txt)) }
      .sortBy(r => (r._2, r._1))
    val swapped = rs.updated(0, rs(1)).updated(1, rs(0))
    def csOf(seq: Seq[(Long, Long, Long)]) =
      seq.zipWithIndex.map { case ((_, _, ch), i) => ((i + 1).toLong * ch) % mod }.sum % mod
    if (rs(0)._3 != rs(1)._3)
      assert(csOf(rs.toSeq) != csOf(swapped.toSeq), "checksum blind to order")
  }

  // ---------------------------------------------------------------- q120

  test("q120: within-doc span redaction matches an independent first-occurrence reference and is scan-local") {
    val n = graft.ops.TextAnalytics.WithinSpanN
    // independent reference: pure-Scala first-seen scan per doc
    def ref(txt: String): (Long, Long, String) = {
      val t = toks(txt)
      val covered = new Array[Boolean](t.length)
      val seen = scala.collection.mutable.Set.empty[Seq[String]]
      for (i <- 0 to t.length - n)
        if (!seen.add(t.slice(i, i + n).toSeq))
          (i until i + n).foreach(covered(_) = true)
      val kept = t.indices.filter(!covered(_)).map(t(_)).mkString(" ")
      (t.length.toLong, covered.count(identity).toLong, kept)
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val out = graft.ops.TextAnalytics.withinDocRedact(spark, sf0001).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val (nt, nRem, kept) = ref(docs(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_tokens") == nt)
      assert(r.getAs[Long]("n_removed") == nRem)
      assert(r.getAs[Boolean]("clean") == (nRem == 0L))
      assert(r.getAs[String]("redacted_hash") == md5hex(kept),
        s"doc ${r.getAs[Long]("doc_id")} redacted text")
    }
    // the corpus must exercise both branches
    assert(out.exists(!_.getAs[Boolean]("clean")), "no doc with a within-doc repeat")
    assert(out.exists(_.getAs[Boolean]("clean")), "no clean doc")
    // planted probe: the second x y z occurrence is cut, the first kept;
    // overlapping self-repeats (a a a a) keep only the first gram's span
    assert(ref("x y z w x y z") == (7L, 3L, "x y z w"))
    assert(ref("a a a a") == (4L, 3L, "a"))
    // scan-local: no join, no aggregate, no shuffle except the
    // presentation sort's range partitioning
    val plan = graft.ops.TextAnalytics.withinDocRedact(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  // ---------------------------------------------------------------- q121

  test("q121: BPE trainer matches an independent JVM reference over the collected word counts") {
    // independent reference: word counts, then k greedy merges with the
    // (count DESC, pair ASC) tie-break, left-to-right non-overlapping
    val words = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().flatMap(r => toks(r.getString(0)))
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    def applyOne(syms: List[String], l: String, r: String): List[String] = syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: applyOne(rest, l, r)
      case a :: rest => a :: applyOne(rest, l, r)
      case Nil => Nil
    }
    def refTrain(k: Int): Seq[(Long, String, String, Long)] = {
      var state = words.map { case (w, c) => (w.map(_.toString).toList, c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      var rank = 1L
      while (rank <= k) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        state.foreach { case (syms, c) =>
          syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
        }
        if (counts.isEmpty) rank = k + 1L
        else {
          val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
          out += ((rank, l, r, n))
          state = state.map { case (syms, c) => (applyOne(syms, l, r), c) }
          rank += 1L
        }
      }
      out.toSeq
    }
    val k = graft.ops.BpeTrain.BpeMerges
    val ref = refTrain(k)
    val got = graft.ops.BpeTrain.trainBpe(spark, sf0001, k).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("n_weighted"))).toSeq
    assert(got == ref)
    // merges must actually compound: at least one learned symbol is
    // multi-character by rank k (a merge consumed an earlier merge's
    // output), otherwise the loop never left step-0 statistics
    assert(ref.exists { case (_, l, r, _) => l.length > 1 || r.length > 1 },
      s"no compound merge in $ref — trainer state is not advancing")
    // q121 (the oracle-checked first step) agrees with the reference's
    // rank-1 pair and count
    val first = graft.ops.BpeTrain.bpePairs(spark, sf0001).collect()
      .find(_.getAs[Long]("merge_rank") == 1L).get
    assert((first.getAs[String]("left_sym"), first.getAs[String]("right_sym"),
      first.getAs[Long]("n_weighted")) == ((ref.head._2, ref.head._3, ref.head._4)))
  }

  // ---------------------------------------------------------------- q122

  test("q122: bigram surprisal matches an independent reference and sees word order where q94 cannot") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), toks(r.getString(1))))
    // independent reference: global bigram + context counts, then per-doc
    // sums of the bit-length gaps
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val bf = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (_, t) =>
      t.zip(t.drop(1)).foreach(p => bf(p) = bf.getOrElse(p, 0L) + 1L)
    }
    val ctx = bf.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val expected = docs.filter(_._2.length >= 2).map { case (id, t) =>
      val pairs = t.zip(t.drop(1))
      val s = pairs.map(p => (bitlen(ctx(p._1)) - bitlen(bf(p))).toLong).sum
      id -> ((pairs.length.toLong, s, s * 1000L / pairs.length))
    }.toMap
    val out = graft.ops.TextAnalytics.bigramSurprisal(spark, sf0001).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (nb, s, m) = {
        val e = expected(r.getAs[Long]("doc_id")); (e._1, e._2, e._3)
      }
      assert(r.getAs[Long]("n_bigrams") == nb)
      assert(r.getAs[Long]("surprisal_sum") == s)
      assert(r.getAs[Long]("surprisal_mean_milli") == m)
    }
    // order sensitivity: q94 is permutation-blind (bag-of-words), the
    // bigram score is not — verified on the reference machinery by
    // scoring one doc's tokens reversed: same unigram bag, different
    // bigram sum (for any doc whose reversed bigrams differ in count)
    val probe = docs.find { case (_, t) =>
      t.length >= 2 && {
        val rev = t.reverse
        val sFwd = t.zip(t.drop(1)).map(p => (bitlen(ctx(p._1)) - bitlen(bf(p))).toLong).sum
        rev.zip(rev.drop(1)).forall(bf.contains) && {
          val sRev = rev.zip(rev.drop(1)).map(p => (bitlen(ctx(p._1)) - bitlen(bf(p))).toLong).sum
          sFwd != sRev
        }
      }
    }
    assert(probe.nonEmpty, "no doc demonstrates order sensitivity")
  }

  // ---------------------------------------------------------------- q119

  test("q119: streaming PII redaction replay is row-identical to the batch redaction") {
    val streamed = graft.streaming.DedupStream.piiRedactStream(spark, sf0001).collect().toSeq
    val batch = graft.ops.TextAnalytics.piiRedact(spark, sf0001).collect().toSeq
    assert(streamed == batch)
    // the synthetic corpus has no PII-shaped text (redaction MECHANICS are
    // pinned by q68's planted-fixture specs); here the stream must cover
    // every doc and the equality above pins the hashes row-for-row
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(streamed.length.toLong == nDocs, "stream must emit a verdict per doc")
  }
}
