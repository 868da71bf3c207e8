package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Persisted dedup-graph artifact: the build/serve split applied to the
  * verified pair list. The serving reads MUST be bit-identical to the
  * inline recomputes (they share the q74/q155/q158 oracles), and the
  * append → compact lifecycle must converge to the same graph a
  * from-scratch build produces.
  */
class DedupGraphSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def asSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet[Row].map(_.toSeq)

  private val bits = Dedup.OracleHashBits

  test("q74 served from the graph artifact is bit-identical to the inline recompute") {
    val inline = Dedup.dedupSurvivors(spark, sf0001, bits)
    val served = Dedup.dedupSurvivorsFromGraph(spark, sf0001, bits)
    assert(inline.columns.toSeq == served.columns.toSeq)
    assert(rows(inline) == rows(served))
    assert(rows(served).nonEmpty)
  }

  test("q155 served from the graph artifact is bit-identical to the inline recompute") {
    val inline = Dedup.consensusClusters(spark, sf0001, bits)
    val served = Dedup.consensusClustersFromGraph(spark, sf0001, bits)
    assert(inline.columns.toSeq == served.columns.toSeq)
    assert(rows(inline) == rows(served))
    assert(rows(served).nonEmpty)
  }

  test("q158 served from the graph artifact is bit-identical to the inline recompute") {
    val inline = Dedup.dupGraphWalks(spark, sf0001, bits)
    val served = Dedup.dupGraphWalksFromGraph(spark, sf0001, bits)
    assert(inline.columns.toSeq == served.columns.toSeq)
    assert(rows(inline) == rows(served))
    assert(rows(served).nonEmpty)
  }

  test("all other served consumers are bit-identical to their inline recomputes") {
    val cases: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("q91", Dedup.clusterSplit(spark, sf0001, bits),
        Dedup.clusterSplitFromGraph(spark, sf0001, bits)),
      ("q93", Dedup.pagerankIter(spark, sf0001, bits),
        Dedup.pagerankIterFromGraph(spark, sf0001, bits)),
      ("q106", Dedup.qualitySurvivors(spark, sf0001, bits),
        Dedup.qualitySurvivorsFromGraph(spark, sf0001, bits)),
      ("q133", Dedup.qualityDupAudit(spark, sf0001, bits),
        Dedup.qualityDupAuditFromGraph(spark, sf0001, bits)),
      ("q146", Dedup.clusterCohesion(spark, sf0001, bits),
        Dedup.clusterCohesionFromGraph(spark, sf0001, bits)),
      ("q152", Dedup.crossSourceMatrix(spark, sf0001, bits),
        Dedup.crossSourceMatrixFromGraph(spark, sf0001, bits)),
      ("q159", Dedup.dupLossWeights(spark, sf0001, bits),
        Dedup.dupLossWeightsFromGraph(spark, sf0001, bits)))
    cases.foreach { case (name, inline, served) =>
      assert(inline.columns.toSeq == served.columns.toSeq, name)
      assert(rows(inline) == rows(served), name)
      assert(rows(served).nonEmpty, name)
    }
  }

  test("artifact layout: pairs are hive-bucketed, signals carry all three detectors") {
    val path = Dedup.preparedDedupGraph(spark, sf0001, bits)
    val buckets = new java.io.File(s"$path/pairs").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName)
    assert(buckets.nonEmpty, "pairs/ must be partitioned by bucket")
    val sigs = Dedup.loadGraphSignals(spark, path)
      .select("signal").distinct().collect().map(_.getString(0)).toSet
    assert(sigs == Set("minhash", "runs", "winnow"))
    // the pair artifact IS the q14 relation
    val art = Dedup.loadGraphPairs(spark, path).select("doc_a", "doc_b")
    val q14 = Dedup.minhashLshPairs(spark, sf0001, bits).select("doc_a", "doc_b")
    assert(asSet(art) == asSet(q14))
  }

  // ------------------------------------------------------------------
  // Lifecycle: snapshot build + appended admission wave + compaction
  // converge to the from-scratch graph. The synthetic corpus plants a
  // near-dup family in the snapshot and an appended wave whose fresh
  // docs (higher ids, the admission id discipline) duplicate snapshot
  // docs — including one BRIDGE doc matching two distinct snapshot
  // clusters, the case append defers and compact must resolve.
  // ------------------------------------------------------------------

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  // near-dup families: long shared token runs with a one-word tail
  // tweak keeps jaccard above the 0.7 merge threshold
  private def fam(seed: String, tweak: String): String =
    (1 to 60).map(i => s"$seed$i").mkString(" ") + " " + tweak
  private val famA = (0 to 1).map(i => fam("alpha", s"tailA$i"))
  private val famB = (0 to 1).map(i => fam("beta", s"tailB$i"))

  test("append attaches labels for every delta node without touching snapshot labels") {
    val snapDir = graft.streaming.StreamScratch.dir("dg-snap")
    writeDocs(snapDir, Seq(
      0L -> famA(0), 1L -> famA(1), 2L -> famB(0), 3L -> famB(1),
      4L -> (1 to 80).map(i => s"solo$i").mkString(" ")))
    val gPath = graft.streaming.StreamScratch.dir("dg-art")
    Dedup.saveDedupGraph(spark, snapDir, gPath, bits)
    val before = asSet(spark.read.parquet(s"$gPath/cc"))
    assert(before.nonEmpty)

    // admission wave: doc 10 duplicates family A; doc 11 is a bridge
    // matching BOTH a-family and b-family members
    import spark.implicits._
    val wave = Seq((0L, 10L, 9L, 10L, 0.9), (1L, 10L, 9L, 10L, 0.9),
        (2L, 11L, 9L, 10L, 0.9), (0L, 11L, 9L, 10L, 0.9))
      .toDF("doc_a", "doc_b", "inter", "uni", "jaccard")
    Dedup.appendToDedupGraph(spark, gPath, wave)

    val after = spark.read.parquet(s"$gPath/cc")
    // snapshot labels unchanged (append never rewrites, only adds)
    assert(before.subsetOf(asSet(after)))
    // both delta nodes labeled, at the min over their incident edges
    val delta = after.filter(col("node").isin(10L, 11L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(delta(10L) == 0L)
    assert(delta(11L) == 0L)
  }

  test("append + compact converges to the from-scratch build (pairs, cc)") {
    // sliding 100-token windows over one 200-token template: shingle
    // jaccard of shift-s windows is exactly (98-s)/(98+s) (distinct
    // tokens, 3-gram shingles), so cluster geometry is arithmetic.
    def win(from: Int): String = (from until from + 100).map(i => s"w$i").mkString(" ")
    // snapshot: clusters {0,1} (shift 4, J=0.92) and {2,3}; the two
    // clusters sit 36 apart (J=0.463 < 0.5 threshold -> separate)
    val snapDir = graft.streaming.StreamScratch.dir("dg-snap2")
    writeDocs(snapDir, Seq(
      0L -> win(0), 1L -> win(4), 2L -> win(40), 3L -> win(44),
      4L -> (1 to 80).map(i => s"solo$i").mkString(" ")))
    // full corpus adds a fresh two-doc CHAIN between the clusters:
    // 10 near cluster A (shift 8 from doc1), 11 near cluster B
    // (shift 12 from doc2) and near 10 (shift 16) — exact CC merges
    // everything into one component
    val fullDir = graft.streaming.StreamScratch.dir("dg-full")
    writeDocs(fullDir, Seq(
      0L -> win(0), 1L -> win(4), 2L -> win(40), 3L -> win(44),
      4L -> (1 to 80).map(i => s"solo$i").mkString(" "),
      10L -> win(12), 11L -> win(28)))

    val gSnap = graft.streaming.StreamScratch.dir("dg-art2")
    Dedup.saveDedupGraph(spark, snapDir, gSnap, bits)
    val gFull = graft.streaming.StreamScratch.dir("dg-art-full")
    Dedup.saveDedupGraph(spark, fullDir, gFull, bits)

    // the wave = exactly the verified pairs the full build found that
    // the snapshot build didn't (what an admission job would emit)
    val wave = Dedup.loadGraphPairs(spark, gFull)
      .exceptAll(Dedup.loadGraphPairs(spark, gSnap))
    assert(wave.count() > 0, "the chain docs must add verified pairs")
    Dedup.appendToDedupGraph(spark, gSnap, wave)

    val gComp = graft.streaming.StreamScratch.dir("dg-art-comp")
    Dedup.compactDedupGraph(spark, gSnap, gComp)

    // compacted == from-scratch on the pair relation and exact CC
    // (signals/consensus_cc legitimately differ: appended waves carry
    // only the minhash signal — the documented append contract)
    assert(asSet(Dedup.loadGraphPairs(spark, gComp)) ==
      asSet(Dedup.loadGraphPairs(spark, gFull)))
    assert(asSet(spark.read.parquet(s"$gComp/cc")) ==
      asSet(spark.read.parquet(s"$gFull/cc")))
    assert(asSet(spark.read.parquet(s"$gComp/pair_cc")) ==
      asSet(spark.read.parquet(s"$gFull/pair_cc")))
    // chain resolved: all six chained docs share one component min = 0
    val lab = spark.read.parquet(s"$gComp/cc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L, 2L, 3L, 10L, 11L).foreach(n => assert(lab(n) == 0L, s"node $n"))
    assert(!lab.contains(4L), "the singleton never enters the graph")
    // before compaction the bridge is honestly deferred: B-cluster
    // keeps its snapshot label, delta nodes carry attach labels
    val attached = spark.read.parquet(s"$gSnap/cc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(attached(2L) == 2L && attached(3L) == 2L)
    assert(attached.contains(10L) && attached.contains(11L))
  }

  test("q154/q161/q49 served from the graph artifact are bit-identical to inline") {
    val cases: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("q154", graft.ops.Hybrid.retrievalEval(spark, sf0001, bits),
        graft.ops.Hybrid.retrievalEvalFromGraph(spark, sf0001, bits)),
      ("q161", graft.ops.Hybrid.trainingTriplets(spark, sf0001, bits),
        graft.ops.Hybrid.trainingTripletsFromGraph(spark, sf0001, bits)),
      ("q49", Dedup.nearDupClusters(spark, sf0001, bits),
        Dedup.nearDupClustersFromGraph(spark, sf0001, bits)))
    cases.foreach { case (name, inline, served) =>
      assert(inline.columns.toSeq == served.columns.toSeq, name)
      assert(rows(inline) == rows(served), name)
      assert(rows(served).nonEmpty, name)
    }
  }

  test("q163 served from the winnow fingerprint index is bit-identical to inline") {
    val inline = Dedup.winnowAttribution(spark, sf0001, bits)
    val served = Dedup.winnowAttributionFromIndex(spark, sf0001, bits)
    assert(inline.columns.toSeq == served.columns.toSeq)
    assert(rows(inline) == rows(served))
    assert(rows(served).nonEmpty)
    // the index is uncapped: serve-time dfCap=None equals inline uncapped
    assert(rows(Dedup.winnowAttribution(spark, sf0001, bits, dfCap = None)) ==
      rows(Dedup.winnowAttributionFromIndex(spark, sf0001, bits, dfCap = None)))
  }

  test("q203/q204 served from the overlap postings artifact are bit-identical to inline q15/q83") {
    val cases = Seq(
      ("q203", Dedup.jaccardPairs(spark, sf0001, bits),
        Dedup.jaccardPairsFromPostings(spark, sf0001, bits)),
      ("q204", Dedup.containmentPairs(spark, sf0001, bits),
        Dedup.containmentPairsFromPostings(spark, sf0001, bits)))
    cases.foreach { case (name, inline, served) =>
      assert(inline.columns.toSeq == served.columns.toSeq, name)
      assert(rows(inline) == rows(served), name)
      assert(rows(served).nonEmpty, name)
    }
  }

  test("q166 streaming graph append replays row-identical to batch q165") {
    val batch = rows(Dedup.graphAppendReport(spark, sf0001, bits))
    val streamed = rows(
      graft.streaming.DedupStream.graphAppendStream(spark, sf0001))
    assert(batch == streamed)
    assert(batch.nonEmpty)
  }

  test("q165 attach semantics: total over the wave, clusters point at snapshot-or-wave minima") {
    val incIds = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("source") === Dedup.IncrementalSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rep = Dedup.graphAppendReport(spark, sf0001, bits).collect()
    // one row per incremental doc, no more, no fewer
    assert(rep.map(_.getLong(0)).toSet == incIds)
    rep.foreach { r =>
      val (id, cluster, attached) =
        (r.getLong(0), r.getLong(1), r.getBoolean(2))
      if (attached) assert(cluster != id || incIds.contains(cluster),
        s"doc $id attached to itself without a wave partner")
      else assert(cluster == id, s"unattached doc $id must self-cluster")
    }
    // something in the wave actually attaches on this corpus (the
    // testdata plants near-dups across the incremental source)
    assert(rep.exists(_.getBoolean(2)))
  }

  test("property: attach bounds exact CC from above; compact equals exact CC (8 seeded graphs)") {
    import spark.implicits._
    // local union-find reference (min-label roots)
    def exactCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      (edges.flatMap(e => Seq(e._1, e._2)).distinct)
        .map(n => n -> find(n)).toMap
    }
    val rnd = new scala.util.Random(42)
    (0 until 8).foreach { k =>
      val snapEdges = Seq.fill(rnd.nextInt(10) + 3) {
        val (a, b) = (rnd.nextInt(16).toLong, rnd.nextInt(16).toLong)
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val waveEdges = Seq.fill(rnd.nextInt(8) + 2) {
        if (rnd.nextBoolean()) (rnd.nextInt(16).toLong, 100L + rnd.nextInt(8))
        else {
          val (a, b) = (100L + rnd.nextInt(8), 100L + rnd.nextInt(8))
          (math.min(a, b), math.max(a, b))
        }
      }.filter(e => e._1 != e._2).distinct
      if (snapEdges.nonEmpty && waveEdges.nonEmpty) {
        // fabricate a minimal snapshot artifact around the edge list
        val g = graft.streaming.StreamScratch.dir(s"dg-prop-$k")
        def pairsOf(es: Seq[(Long, Long)]) = es.toDF("doc_a", "doc_b")
          .withColumn("inter", lit(9L)).withColumn("uni", lit(10L))
          .withColumn("jaccard", lit(0.9))
        pairsOf(snapEdges)
          .withColumn("bucket", pmod(col("doc_a"), lit(Dedup.GraphPairBuckets)))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$g/pairs")
        pairsOf(snapEdges)
          .select(col("doc_a"), col("doc_b"), lit("minhash").as("signal"))
          .write.mode("overwrite").partitionBy("signal").parquet(s"$g/signals")
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
          .write.mode("overwrite").parquet(s"$g/exact")
        val snapCc = Dedup.starComponents(snapEdges.toDF("doc_a", "doc_b"))
        Seq("cc", "pair_cc", "consensus_cc").foreach(t =>
          snapCc.write.mode("overwrite").parquet(s"$g/$t"))

        Dedup.appendToDedupGraph(spark, g, pairsOf(waveEdges))
        val attached = spark.read.parquet(s"$g/cc")
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .groupBy(_._1).map { case (n, ls) => n -> ls.map(_._2).min }
        val exact = exactCc(snapEdges ++ waveEdges)
        val waveNodes = waveEdges.flatMap(e => Seq(e._1, e._2)).distinct
        waveNodes.foreach { n =>
          val a = attached.getOrElse(n, n)
          // single-pass attach can only OVER-estimate the component min
          // (bridges and wave-internal chains defer to compact), and
          // never exceeds the node's own id
          assert(a >= exact(n) && a <= n, s"seed $k node $n: attach $a vs exact ${exact(n)}")
        }
        // compact resolves everything exactly
        val gc = graft.streaming.StreamScratch.dir(s"dg-prop-c-$k")
        Dedup.compactDedupGraph(spark, g, gc)
        val compacted = spark.read.parquet(s"$gc/cc")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(compacted == exact, s"seed $k: compact != exact CC")
      }
    }
  }

  test("graphStatus: zero debt fresh, planted bridge counted after append, zero after compact") {
    val snapDir = graft.streaming.StreamScratch.dir("dg-status-snap")
    writeDocs(snapDir, Seq(
      0L -> famA(0), 1L -> famA(1), 2L -> famB(0), 3L -> famB(1)))
    val g = graft.streaming.StreamScratch.dir("dg-status-art")
    Dedup.saveDedupGraph(spark, snapDir, g, bits)
    val fresh = Dedup.graphStatus(spark, g).collect().head
    assert(fresh.getAs[Long]("waves_appended") == 0L)
    assert(fresh.getAs[Long]("bridge_cc") == 0L)
    assert(fresh.getAs[Long]("bridge_pair_cc") == 0L)
    assert(fresh.getAs[Long]("bridge_consensus_cc") == 0L)
    assert(fresh.getAs[Long]("multi_label_nodes") == 0L)
    assert(fresh.getAs[Long]("pairs_rows") > 0L)
    // the advisory consumes the status: silent on a fresh build
    assert(Dedup.compactAdvisory(spark, g).isEmpty,
      "advisory fired on a fresh graph")

    // wave doc 11 BRIDGES clusters {0,1} and {2,3}: the single-pass
    // attach labels 11 with min(0,2)=0 and defers relabeling {2,3} —
    // exactly the debt graphStatus must surface
    import spark.implicits._
    val wave = Seq((0L, 11L, 9L, 10L, 0.9), (2L, 11L, 9L, 10L, 0.9))
      .toDF("doc_a", "doc_b", "inter", "uni", "jaccard")
    Dedup.appendToDedupGraph(spark, g, wave)
    val after = Dedup.graphStatus(spark, g).collect().head
    assert(after.getAs[Long]("waves_appended") == 1L)
    assert(after.getAs[Long]("bridge_cc") > 0L)
    assert(after.getAs[Long]("bridge_pair_cc") > 0L)
    assert(after.getAs[Long]("pairs_rows") ==
      fresh.getAs[Long]("pairs_rows") + 2L)

    // ... and advises compaction while the bridge debt stands
    val advice = Dedup.compactAdvisory(spark, g)
    assert(advice.exists(_.contains("compactDedupGraph")),
      s"advisory missing after a bridging append: $advice")

    val gc = graft.streaming.StreamScratch.dir("dg-status-comp")
    Dedup.compactDedupGraph(spark, g, gc)
    val comp = Dedup.graphStatus(spark, gc).collect().head
    assert(comp.getAs[Long]("waves_appended") == 0L)
    assert(comp.getAs[Long]("bridge_cc") == 0L)
    assert(comp.getAs[Long]("bridge_pair_cc") == 0L)
    assert(comp.getAs[Long]("bridge_consensus_cc") == 0L)
    assert(comp.getAs[Long]("multi_label_nodes") == 0L)
    // silent again once compaction folded the appends
    assert(Dedup.compactAdvisory(spark, gc).isEmpty,
      "advisory fired on a freshly compacted graph")
  }

  test("q166 multi-batch wave: cross-batch within-wave pairs keep the replay row-identical to batch q165") {
    import spark.implicits._
    def winF(from: Int): String = (from until from + 100).map(i => s"mbf$i").mkString(" ")
    def winW(from: Int): String = (from until from + 100).map(i => s"mbw$i").mkString(" ")
    val all = Seq(
      (0L, winF(0), "s0"), (1L, winF(4), "s0"),
      (4L, (1 to 80).map(i => s"mbsolo$i").mkString(" "), "s0"),
      // the wave: 10 near the frozen cluster; 11 and 12 near EACH
      // OTHER only — their pair exists solely within the wave
      (10L, winF(8), Dedup.IncrementalSource),
      (11L, winW(0), Dedup.IncrementalSource),
      (12L, winW(4), Dedup.IncrementalSource))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.streaming.StreamScratch.dir("dg-mb")
    all.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // wave files for the stream source: {10, 11} then {12}, so the
    // (11,12) pair spans two micro-batches at maxFilesPerTrigger=1
    def writeOneFile(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
      val tmp = graft.streaming.StreamScratch.dir("dg-mb-part")
      df.repartition(1).write.mode("overwrite").parquet(s"$tmp/x")
      val part = new java.io.File(s"$tmp/x").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(dest))
    }
    val waveSrc = graft.streaming.StreamScratch.dir("dg-mb-wave")
    writeOneFile(all.filter(col("doc_id").isin(10L, 11L)), s"$waveSrc/w1.parquet")
    writeOneFile(all.filter(col("doc_id") === 12L), s"$waveSrc/w2.parquet")

    val batch = rows(Dedup.graphAppendReport(spark, dir, bits))
    val streamed = rows(graft.streaming.DedupStream.graphAppendStream(
      spark, dir, streamSrc = Some(waveSrc), filesPerTrigger = Some(1)))
    assert(batch == streamed)
    // the cross-batch pair attached: 12 clusters with 11
    val byId = streamed.map(r => r.head -> r).toMap
    assert(byId(12L) == Seq(12L, 11L, true),
      "doc 12 must attach to 11 across micro-batches")
    assert(byId(11L) == Seq(11L, 11L, true))
    assert(byId(10L) == Seq(10L, 0L, true))
  }

  test("graph-append micro-batch replay is a no-op (foreachBatch at-least-once)") {
    import spark.implicits._
    def winF(from: Int): String = (from until from + 100).map(i => s"rpf$i").mkString(" ")
    def winW(from: Int): String = (from until from + 100).map(i => s"rpw$i").mkString(" ")
    val all = Seq(
      (0L, winF(0), "s0"), (1L, winF(4), "s0"),
      (10L, winF(8), Dedup.IncrementalSource),
      (11L, winW(0), Dedup.IncrementalSource),
      (12L, winW(4), Dedup.IncrementalSource))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.streaming.StreamScratch.dir("dg-replay")
    all.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (_, frozenG) = Dedup.preparedFrozenGraph(spark, dir, bits)
    val work = Dedup.takeGraphSnapshot(dir, bits, frozenG)
    val idx = Dedup.loadDedupIndex(spark, Dedup.preparedDedupIndex(spark, dir, bits))
    val waveDir = graft.streaming.StreamScratch.dir("dg-replay-wave")
    val wave = all.filter(col("source") === Dedup.IncrementalSource)
      .select("doc_id", "source", "text")
    val b0 = wave.filter(col("doc_id").isin(10L, 11L))
    val b1 = wave.filter(col("doc_id") === 12L)
    def append(b: DataFrame, id: Long): Unit =
      graft.streaming.DedupStream.appendWaveBatch(
        spark, waveDir, work, frozenG, idx, bits, b, id)
    append(b0, 0L); append(b1, 1L)
    def graphCounts: Seq[Long] =
      Seq("pairs", "signals", "waves", "cc", "pair_cc", "consensus_cc")
        .map(s => spark.read.parquet(s"$work/$s").count())
    def summaryRows: Long =
      spark.read.parquet(s"$waveDir/b0", s"$waveDir/b1").count()
    val before = (graphCounts, summaryRows)
    assert(before._1.head > 0L, "wave appended no pairs — test corpus broken")
    // the at-least-once window: both batches replay after a lost sink
    // acknowledgment (done-markers present) — every write must no-op
    append(b0, 0L); append(b1, 1L)
    assert((graphCounts, summaryRows) == before,
      "a replayed completed batch must not double-append")
    // and the accumulated appends still reduce to the one-call batch
    // attach (the row-identity the idempotency exists to protect)
    val streamedReport = rows(Dedup.attachReport(spark, dir, work))
    val batchReport = rows(Dedup.graphAppendReport(spark, dir, bits))
    assert(streamedReport == batchReport)
    // crash BEFORE the summary write (no marker, no subdir): the replay
    // recomputes from scratch against strictly-earlier priors only
    val waveDir2 = graft.streaming.StreamScratch.dir("dg-replay-wave2")
    val work2 = Dedup.takeGraphSnapshot(dir, bits, frozenG)
    graft.streaming.DedupStream.appendWaveBatch(
      spark, waveDir2, work2, frozenG, idx, bits, b0, 0L)
    // simulate a crash between b1's summary write and its graph append:
    // summary subdir exists, marker absent — the replay must overwrite
    // the summary (not read it as prior / not double it) and append once
    val (_, b1sum) = Dedup.admissionPairsWithPrior(
      b1, Some(spark.read.parquet(s"$waveDir2/b0")), idx, bits)
    b1sum.write.mode("overwrite").parquet(s"$waveDir2/b1")
    graft.streaming.DedupStream.appendWaveBatch(
      spark, waveDir2, work2, frozenG, idx, bits, b1, 1L)
    assert(rows(Dedup.attachReport(spark, dir, work2)) == batchReport,
      "replay after a crash-before-append must still match the batch attach")

    // the WORST replay window: crash after b1's append fully committed
    // but before its done-marker — without the pending-manifest
    // rollback the replay would append every edge of the batch twice.
    // Reconstruct the crash state on work2: pre-b1 file snapshot as the
    // pending manifest, marker removed.
    def filesUnder(root: String): Seq[String] = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try {
        val out = scala.collection.mutable.ArrayBuffer[String]()
        w.forEach(p => if (java.nio.file.Files.isRegularFile(p)) out += p.toString)
        out.toSeq.sorted
      } finally w.close()
    }
    val waveDir3 = graft.streaming.StreamScratch.dir("dg-replay-wave3")
    val work3 = Dedup.takeGraphSnapshot(dir, bits, frozenG)
    graft.streaming.DedupStream.appendWaveBatch(
      spark, waveDir3, work3, frozenG, idx, bits, b0, 0L)
    val preB1 = filesUnder(work3)
    graft.streaming.DedupStream.appendWaveBatch(
      spark, waveDir3, work3, frozenG, idx, bits, b1, 1L)
    val committed = filesUnder(work3)
    assert(committed.size > preB1.size, "b1 appended nothing — fixture broken")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(waveDir3, "_done_1"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(waveDir3, "_pending_1"), preB1.mkString("\n"))
    graft.streaming.DedupStream.appendWaveBatch(
      spark, waveDir3, work3, frozenG, idx, bits, b1, 1L)
    def counts3: Seq[Long] =
      Seq("pairs", "signals", "waves", "cc", "pair_cc", "consensus_cc")
        .map(s => spark.read.parquet(s"$work3/$s").count())
    assert(counts3 == graphCounts,
      "post-append replay doubled the batch instead of rolling back first")
    assert(rows(Dedup.attachReport(spark, dir, work3)) == batchReport)
  }

  test("compaction refuses to rewrite its source path in place") {
    val p = graft.streaming.StreamScratch.dir("dg-selfcompact")
    intercept[IllegalArgumentException] {
      Dedup.compactDedupGraph(spark, p, p + "/")
    }
  }
}
