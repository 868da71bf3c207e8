package graft

import org.apache.spark.sql.functions._

/** Round-10 operator specs: q168–q172, the published-algorithm panel
  * (MMR, DLT priority sampling, degree-ordered triangles, TwoNN, RM3).
  * Each operator is oracle-green at sf0.01; these specs pin the edge
  * arms the oracle corpus cannot reach — tie-breaks, degeneracies,
  * cap bites — against independent in-test references. */
class Round10OpsSpec extends SparkSpec {

  /** Test-side twin of graft.core.Hash32: first 8 hex nibbles of md5
    * as a bigint (plain JVM arithmetic, no Spark). */
  private def hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  // ---------------------------------------------------------------- q168

  /** Independent greedy reference for one query: exact integer scores
    * replayed in plain Scala from the quantized vectors. */
  private def mmrReference(queryV: Array[Long], cands: Seq[(Long, Array[Long])],
                           k: Int): Seq[(Long, Long, Long)] = {
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Long], b: Array[Long]): Double =
      dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
    val rel = cands.map { case (id, v) =>
      id -> math.floor(cos(queryV, v) * 1e9).toLong
    }.toMap
    val byId = cands.toMap
    val l = graft.ops.Similarity.MmrLambdaTenths
    var selected = List.empty[Long]
    val out = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var rank = 1L
    while (rank <= k && selected.size < cands.size) {
      val best = cands.map(_._1).filter(c => !selected.contains(c)).map { c =>
        val score =
          if (selected.isEmpty) l * rel(c)
          else l * rel(c) - (10L - l) * selected.map { s =>
            math.floor(cos(byId(c), byId(s)) * 1e9).toLong
          }.max
        (score, c)
      }.minBy { case (s, c) => (-s, c) }
      selected ::= best._2
      out += ((rank, best._2, best._1))
      rank += 1
    }
    out.toSeq
  }

  test("q168: sf0.001 selections match an independent in-test greedy (pins tie-breaks)") {
    val quant = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => floor(x.cast("double") * lit(1e6)).cast("long")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    val byId = quant.toMap
    val nq = graft.core.Consts.KnnQueries
    def cos(a: Array[Long], b: Array[Long]): Double = {
      def dot(x: Array[Long], y: Array[Long]) = x.zip(y).map { case (p, q) => p * q }.sum
      dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
    }
    val expected = (0L until nq.toLong).flatMap { qid =>
      val qv = byId(qid)
      val pool = quant.filter(_._1 != qid)
        .map { case (id, v) => (math.floor(cos(qv, v) * 1e9).toLong, id, v) }
        .sortBy { case (s, id, _) => (-s, id) }
        .take(graft.ops.Similarity.MmrCandidates)
        .map { case (_, id, v) => (id, v) }.toSeq
      mmrReference(qv, pool, graft.ops.Similarity.MmrK)
        .map { case (rank, id, score) => (qid, rank, id, score) }
    }
    val got = graft.ops.Similarity.mmrDiversify(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Long]("mmr_score"))).toSeq
    assert(got == expected)
  }

  test("q168: a pool smaller than MmrK exhausts candidates and stops; a singleton pool still yields its rank-1 pick") {
    import spark.implicits._
    // 4 vectors, all of vec_id < KnnQueries => every vector is a query
    // with a 3-candidate pool (< MmrK = 5): emits exactly 3 rows/query
    val dir = graft.streaming.StreamScratch.dir("q168-exhaust")
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.Similarity.mmrDiversify(spark, dir).collect()
    assert(got.length == 4 * 3)
    assert(got.groupBy(_.getAs[Long]("query_id")).values
      .forall(_.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L)))

    // 2 vectors: each query's pool is ONE candidate — no pair rows at
    // all, the arm the seed rows exist for (a pairs-only groupByKey
    // emitted nothing here)
    val dir1 = graft.streaming.StreamScratch.dir("q168-singleton")
    Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.5f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir1/embeddings.parquet")
    val g1 = graft.ops.Similarity.mmrDiversify(spark, dir1).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(g1 == Seq((0L, 1L, 1L), (1L, 1L, 0L)))
  }

  // ---------------------------------------------------------------- q169

  test("q169: sf0.001 sample matches an independent in-test DLT replay") {
    val k = graft.ops.Sampling.PrioritySampleK
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(docs.length > k + 1, "reference corpus must exceed the sample size")
    val pri = docs.map { case (id, w) =>
      val h20 = (hash32(id.toString) >> 12) + 1
      (id, w, (w << 20) / h20)
    }.sortBy { case (id, _, p) => (-p, id) }
    val tau = pri(k)._3
    val expected = pri.take(k).zipWithIndex.map { case ((id, w, p), i) =>
      (i + 1L, id, w, p, math.max(w, tau))
    }.toSeq
    val got = graft.ops.Sampling.prioritySample(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"), r.getAs[Long]("w"),
        r.getAs[Long]("priority"), r.getAs[Long]("est_w"))).toSeq
    assert(got == expected)
  }

  test("q169: n <= k keeps every doc with est_w = w (DLT degeneracy guard)") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q169-degen")
    val rows = (0L until 10L).map(i => (i, s"doc $i text", "en", "s0", 100L + i))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Sampling.prioritySample(spark, dir).collect()
    assert(got.length == 10, "with n <= k the whole corpus IS the sample")
    assert(got.forall(r => r.getAs[Long]("est_w") == r.getAs[Long]("w")),
      "no (k+1)-th priority exists: every kept weight is exact, est_w = w")
  }

  // ---------------------------------------------------------------- q170

  private def triRow(dir: String): (Long, Long, Long, Long, Long) = {
    val r = graft.ops.Events.coVisitTriangles(spark, dir).collect().head
    (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"),
      r.getAs[Long]("n_triangles"), r.getAs[Long]("gcc_permille"))
  }

  private def writeEvents(dir: String, rows: Seq[(java.sql.Timestamp, Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def at(hour: Int, minute: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("q170: a viral cell past CoVisitCellCap is dropped; the same cell at the cap is kept") {
    val cap = graft.ops.Events.CoVisitCellCap.toInt
    // base graph: users 1,2,3 share TWO cells -> all three pairs have
    // ncells=2, mutual top-K keeps all -> one triangle
    val base = Seq(
      (at(1), 1L, "a"), (at(1), 2L, "a"), (at(1), 3L, "a"),
      (at(2), 1L, "b"), (at(2), 2L, "b"), (at(2), 3L, "b"))
    val dirV = graft.streaming.StreamScratch.dir("q170-viral")
    writeEvents(dirV, base ++ (0 until cap + 1).map(i => (at(3), 100L + i, "v")))
    assert(triRow(dirV) == ((3L, 3L, 3L, 1L, 1000L)),
      "a cell with cap+1 distinct users must contribute no pairs")

    // at the cap the cell participates: with 64 users of ncells=1
    // pairs, the mutual top-8 rule keeps exactly the 9 smallest ids as
    // a clique (user 100's top-8 excludes 109+, so larger ids have no
    // mutual edge) — the sparsifier biting is part of the pin
    val dirC = graft.streaming.StreamScratch.dir("q170-atcap")
    writeEvents(dirC, base ++ (0 until cap).map(i => (at(3), 100L + i, "v")))
    val k = graft.ops.Events.CoVisitTopK.toInt
    val clique = k + 1L // 9 nodes, complete
    val (nodes, edges, wedges, tris, gcc) = triRow(dirC)
    assert(nodes == 3L + clique)
    assert(edges == 3L + clique * (clique - 1) / 2)
    assert(tris == 1L + clique * (clique - 1) * (clique - 2) / 6)
    assert(wedges == 3L + clique * ((clique - 1) * (clique - 2) / 2))
    assert(gcc == 1000L, "two disjoint cliques: every wedge closes")
  }

  test("q170: repeated events of the same (user, cell) count once (distinct-cell semantics)") {
    val base = Seq(
      (at(1), 1L, "a"), (at(1), 2L, "a"), (at(1), 3L, "a"),
      (at(2), 1L, "b"), (at(2), 2L, "b"), (at(2), 3L, "b"))
    val dup = base ++ Seq((at(1, 10), 1L, "a"), (at(1, 20), 1L, "a"), (at(2, 30), 2L, "b"))
    val d1 = graft.streaming.StreamScratch.dir("q170-nodup")
    val d2 = graft.streaming.StreamScratch.dir("q170-dup")
    writeEvents(d1, base); writeEvents(d2, dup)
    assert(triRow(d1) == triRow(d2),
      "co-visit affinity is set semantics over (cell, user), not event counts")
  }

  // ---------------------------------------------------------------- q171

  test("q171: sf0.001 report matches an independent in-test TwoNN replay (incl. duplicate exclusion)") {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("int"),
        transform(col("embedding"), x => floor(x.cast("double") * lit(1e6)).cast("long")).as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))
    def dot(a: Array[Long], b: Array[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val mod = graft.ops.Similarity.TwoNnAnchorMod
    val expected = rows.filter { case (id, _, _) => hash32(id.toString) % mod == 0 }
      .flatMap { case (aid, albl, av) =>
        val sqs = rows.filter { case (id, lbl, _) => lbl == albl && id != aid }
          .map { case (id, _, v) =>
            (dot(av, av) - 2 * dot(av, v) + dot(v, v), id)
          }.sortBy { case (sq, id) => (sq, id) }.take(2)
        if (sqs.length == 2 && sqs(0)._1 > 0)
          Some((albl, graft.functions.FixedLog2.q16(sqs(1)._1) - graft.functions.FixedLog2.q16(sqs(0)._1)))
        else None
      }
      .groupBy(_._1).view.mapValues(ts => (ts.length.toLong, ts.map(_._2).sum))
      .toSeq.filter(_._2._2 > 0)
      .map { case (lbl, (n, s)) =>
        (lbl, n, s, (n.toDouble * 131072.0) / (0.6931471805599453 * s.toDouble))
      }.sortBy(_._1)
    val got = graft.ops.Similarity.twoNnDim(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("n_anchors"),
        r.getAs[Long]("sum_log2_q16"), r.getAs[Double]("d_hat"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q171: an anchor whose nearest neighbor is an exact duplicate (sq1 = 0) is excluded, not a crash") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q171-dup")
    // find an anchor id under the hash rule, then plant its exact copy
    val mod = graft.ops.Similarity.TwoNnAnchorMod
    val anchorId = (0L to 100L).find(id => hash32(id.toString) % mod == 0).get
    val others = (0L to 100L).filter(i => i != anchorId && hash32(i.toString) % mod != 0).take(3)
    val vecs = Seq(
      (anchorId, Array(1.0f, 2.0f, 3.0f), 7),
      (others(0), Array(1.0f, 2.0f, 3.0f), 7), // exact duplicate of the anchor
      (others(1), Array(1.5f, 2.5f, 3.5f), 7),
      (others(2), Array(9.0f, 9.0f, 9.0f), 7))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.Similarity.twoNnDim(spark, dir).collect()
    // the duplicated anchor drops (sq1 = 0); any OTHER anchors among
    // the chosen ids contribute normally — assert the report excludes
    // the duplicate pair's anchor by recomputing the expected count
    val anchorIds = vecs.map(_._1).filter(id => hash32(id.toString) % mod == 0)
    assert(anchorIds.contains(anchorId))
    val survivors = anchorIds.filterNot(_ == anchorId)
    if (survivors.isEmpty) assert(got.isEmpty)
    else assert(got.map(_.getAs[Long]("n_anchors")).sum == survivors.length.toLong)
  }

  test("q171: FixedLog2 expression path yields null (not a task abort) for v < 1") {
    import spark.implicits._
    val df = Seq(4L, 1L, 0L, -5L).toDF("v")
      .select(col("v"), graft.functions.FixedLog2(col("v")).as("l"))
    val got = df.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got.toSeq == Seq(
      (4L, Some(2L << 16)), (1L, Some(0L)), (0L, None), (-5L, None)))
    intercept[IllegalArgumentException] { graft.functions.FixedLog2.q16(0L) }
  }

  // ---------------------------------------------------------------- q172

  test("q172: mined-term rm_mass ties break by term asc (the winning term's docs are re-ranked in)") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q172-ties")
    // five docs carrying the query terms (the pseudo-relevant set),
    // each also carrying expansion candidates: aaa/bbb twice (tied,
    // higher mass), ccc/ddd once (tied, lower mass). FbTerms = 3 =>
    // selection by (mass desc, term asc) = aaa, bbb, ccc — ddd loses
    // its tie to ccc purely on the term tie-break.
    val rel = (0L until 5L).map { i =>
      (i, "join spark stream aaa aaa bbb bbb ccc ddd", "en", "s0", 1L)
    }
    // probe docs: no query terms, one expansion candidate each — the
    // ccc probe can only appear in the output if ccc was mined, the
    // ddd probe only if ddd was (wrongly) mined
    val probes = Seq(
      (100L, "ccc ccc ccc", "en", "s0", 1L),
      (101L, "ddd ddd ddd", "en", "s0", 1L))
    (rel ++ probes).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ids = graft.ops.TextAnalytics.rm3Expansion(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids.contains(100L), "ccc must be mined (tie won by term asc)")
    assert(!ids.contains(101L), "ddd must lose its rm_mass tie to ccc")
    assert((0L until 5L).forall(ids.contains), "the seed docs still rank")
  }

  test("q172: expansion terms re-rank docs the original query cannot reach") {
    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("q172-reach")
    val rel = (0L until 5L).map { i =>
      (i, "join spark stream expansionterm filler" + i, "en", "s0", 1L)
    }
    val probe = Seq((50L, "expansionterm expansionterm", "en", "s0", 1L),
      (51L, "unrelated words only", "en", "s0", 1L))
    (rel ++ probe).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ids = graft.ops.TextAnalytics.rm3Expansion(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids.contains(50L), "a doc matching only the mined expansion must enter the ranking")
    assert(!ids.contains(51L), "a doc matching nothing stays out")
  }
}
