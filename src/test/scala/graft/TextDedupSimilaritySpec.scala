package graft

import graft.core.Consts
import graft.ops.{Dedup, Sampling, Similarity, TextAnalytics}
import org.apache.spark.sql.functions._

class TextDedupSimilaritySpec extends SparkSpec {

  test("tokenStats covers every document with sane values") {
    val df = TextAnalytics.tokenStats(spark, sf0001)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(df.count() == docs)
    assert(df.filter(col("n_tokens") <= 0 || col("mean_token_len") <= 0).count() == 0)
    // token counts reconcile with character counts (tokens + separators)
    assert(df.filter(col("n_chars") < col("n_tokens")).count() == 0)
  }

  test("qualityScore ratios are all within [0, 1]") {
    val df = TextAnalytics.qualityScore(spark, sf0001)
    val bad = df.filter(
      col("alpha_ratio") < 0 || col("alpha_ratio") > 1 ||
      col("digit_ratio") < 0 || col("digit_ratio") > 1 ||
      col("space_ratio") < 0 || col("space_ratio") > 1 ||
      col("stopword_ratio") < 0 || col("stopword_ratio") > 1 ||
      col("quality") < 0 || col("quality") > 1)
    assert(bad.count() == 0)
  }

  test("langId classifies every document exactly once") {
    val df = TextAnalytics.langId(spark, sf0001)
    val total = df.agg(sum("n")).collect()(0).getLong(0)
    assert(total == spark.read.parquet(s"$sf0001/documents.parquet").count())
  }

  test("fingerprint is unique per distinct text and deterministic") {
    val df = TextAnalytics.fingerprint(spark, sf0001).cache()
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").distinct().count()
    assert(df.select("content_hash").distinct().count() == texts)
    // re-running produces identical hashes (pure function of content)
    val again = TextAnalytics.fingerprint(spark, sf0001)
    assert(df.exceptAll(again).count() == 0)
    df.unpersist()
  }

  test("zipf quality: ranks bounded by the tail, rare-token docs score worst") {
    import graft.ops.TextAnalytics
    val rows = TextAnalytics.zipfQuality(spark, sf001).collect()
    val nDocs = graft.core.Tables.documents(spark, sf001).count()
    assert(rows.length == nDocs)
    val tail = (TextAnalytics.VocabSize + 1).toDouble
    rows.foreach { r =>
      val med = r.getAs[Double]("median_rank")
      val mean = r.getAs[Double]("mean_rank")
      assert(med >= 1.0 && med <= tail, s"median $med out of range")
      assert(mean >= 1.0 && mean <= tail, s"mean $mean out of range")
      assert(r.getAs[Long]("n_tokens") > 0)
    }
    // a doc whose tokens are all OOV must hit exactly the tail rank;
    // common-token docs must rank strictly better than it
    val scores = rows.map(r => r.getAs[Double]("median_rank"))
    assert(scores.min < tail, "at least one doc should use in-vocab tokens")
  }

  test("repetition stats: ratios in [0,1], planted near-dup templates repeat hardest") {
    import graft.ops.TextAnalytics
    val rows = TextAnalytics.repetitionStats(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (c <- Seq("dup_line_ratio", "dup_char_ratio", "top_bigram_ratio")) {
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range")
      }
      assert(r.getAs[Long]("n_lines") > 0)
    }
    // a synthetic fully-repeated doc must saturate the line ratios
    import spark.implicits._
    val probe = Seq((1L, "same line\nsame line\nsame line\nx y x y x y"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("rep_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pr = TextAnalytics.repetitionStats(spark, tmp.toString).collect().head
    assert(pr.getAs[Double]("dup_line_ratio") == 0.75) // 3 of 4 lines duplicated
    assert(pr.getAs[Double]("top_bigram_ratio") == 3.0 / 11.0) // "same line" x3 of 11
  }

  test("decontamination flags exactly the docs sharing shingles with the benchmark set") {
    import spark.implicits._
    val bench = graft.ops.Dedup.DecontamBenchmarkDocs
    val probe = Seq(
      (1L, "web", "alpha beta gamma delta epsilon zeta"),            // benchmark
      (bench + 1, "web", "alpha beta gamma delta something else"),   // leaks 'alpha beta gamma'+1
      (bench + 2, "web", "totally different words entirely here now")) // clean
      .toDF("doc_id", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("decontam_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = graft.ops.Dedup.decontamination(spark, tmp.toString).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_shared"), r.getAs[Boolean]("contaminated"))).toMap
    // benchmark docs are screened out of the result
    assert(!rows.contains(1L))
    assert(rows(bench + 1)._2 && rows(bench + 1)._1 == 2L) // two shared 3-grams
    assert(!rows(bench + 2)._2 && rows(bench + 2)._1 == 0L)
    // and on the real corpus: ratio bounded, counts consistent
    graft.ops.Dedup.decontamination(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_shingles"))
      val ratio = r.getAs[Double]("overlap_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("sequence packing: contiguous per-source packs, budget blocks consistent") {
    import graft.ops.TextAnalytics
    val rows = TextAnalytics.sequencePacking(spark, sf001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("pack_id")))
    assert(rows.nonEmpty)
    // within a source, pack ids are non-decreasing in doc order and
    // reproduce the cumulative-sum block arithmetic exactly
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._2)
      var cum = 0L
      var lastPack = -1L
      sorted.foreach { case (_, _, n, pack) =>
        assert(pack == cum / TextAnalytics.PackBudgetTokens)
        assert(pack >= lastPack)
        lastPack = pack
        cum += n
      }
    }
  }

  test("PII screen counts planted emails/phones/IPs (cross-engine-pinned counts)") {
    import spark.implicits._
    // the synthetic corpus contains no PII (the oracle match there is
    // trivially all-zero), so the pattern semantics are pinned on a
    // probe with KNOWN counts, verified to produce the same matches in
    // DuckDB's RE2 engine: 2 emails, 1 phone, 2 IPs
    val probe = Seq(
      (1L, "web", "contact: alice@example.com or bob.smith@test.org; " +
        "call +1-555-123-4567 maybe; server at 10.0.0.1 and 192.168.1.100"),
      (2L, "web", "no sensitive content in this one at all"))
      .toDF("doc_id", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("pii_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = graft.ops.TextAnalytics.piiScreen(spark, tmp.toString).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_emails") == 2L)
    assert(rows(1L).getAs[Long]("n_phones") == 1L)
    assert(rows(1L).getAs[Long]("n_ips") == 2L)
    assert(rows(1L).getAs[Boolean]("has_pii"))
    assert(!rows(2L).getAs[Boolean]("has_pii"))
  }

  test("minhash LSH finds the planted near-duplicates") {
    val pairs = Dedup.minhashLshPairs(spark, sf0001).cache()
    val n = pairs.count()
    assert(n > 0, "expected planted near-dup pairs in the synthetic corpus")
    // every reported pair clears the verification threshold
    assert(pairs.filter(col("jaccard") < Consts.MinhashJaccardThreshold).count() == 0)
    pairs.unpersist()
  }

  test("bandCap: capped equals uncapped when no bucket exceeds the cap") {
    // sf0.001 has no band bucket anywhere near this cap, so the hot-
    // bucket guard must be a no-op — same pairs, same jaccard values
    val uncapped = Dedup.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.minhashLshPairs(spark, sf0001, bandCap = Some(1 << 20))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(uncapped.nonEmpty && capped == uncapped)
  }

  test("bandCap: a template family's hot bucket is dropped from candidate generation, small buckets survive") {
    import spark.implicits._
    // 30-doc template family (one shingle set -> one band bucket of 30
    // per band) + one independent near-dup pair (buckets of 2). The
    // family models the web-scale boilerplate case: the band join would
    // enumerate all 435 within-family pairs from a single bucket.
    val template = "the quick brown fox jumps over the lazy dog near the river bank today"
    val family = (1L to 30L).map(i => (i, "web", template))
    val outsider = Seq(
      (101L, "web", "completely unrelated sentence about distributed query engines and shuffles"),
      (102L, "web", "completely unrelated sentence about distributed query engines and shuffles"))
    val tmp = java.nio.file.Files.createTempDirectory("bandcap_probe")
    (family ++ outsider).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val uncapped = Dedup.minhashLshPairs(spark, tmp.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((101L, 102L)))
    assert(uncapped.count { case (a, b) => a <= 30 && b <= 30 } == 30 * 29 / 2)

    val capped = Dedup.minhashLshPairs(spark, tmp.toString, bandCap = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // capped is a subset; the 30-wide bucket is gone; the 2-wide survives
    assert(capped.subsetOf(uncapped))
    assert(capped == Set((101L, 102L)),
      s"expected only the small-bucket pair to survive, got $capped")

    // cap=1: single-doc buckets cannot form pairs — empty by construction
    assert(Dedup.minhashLshPairs(spark, tmp.toString, bandCap = Some(1)).isEmpty)
  }

  test("simhash signatures stay within 16 bits; near-dups have close hashes") {
    val sig = Dedup.simhash(spark, sf0001).cache()
    assert(sig.filter(col("simhash") < 0 || col("simhash") >= (1L << 16)).count() == 0)
    // planted near-dup pairs (high jaccard) should collide in simhash space
    val dups = Dedup.minhashLshPairs(spark, sf0001)
      .filter(col("jaccard") >= 0.8)
    val a = sig.select(col("doc_id").as("doc_a"), col("simhash").as("ha"))
    val b = sig.select(col("doc_id").as("doc_b"), col("simhash").as("hb"))
    val joined = dups.join(a, "doc_a").join(b, "doc_b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
    val avgHam = joined.agg(avg("hamming")).collect()(0).getDouble(0)
    assert(avgHam <= 4.0, s"avg hamming of near-dups was $avgHam")
    sig.unpersist()
  }

  test("brute-force kNN returns exactly k ranked neighbors per query") {
    val knn = Similarity.knnBruteForce(spark, sf0001).cache()
    val perQuery = knn.groupBy("query_id").count().collect()
    assert(perQuery.length == Consts.KnnQueries)
    assert(perQuery.forall(_.getAs[Long]("count") == Consts.KnnK))
    // ranks are 1..k and sim is non-increasing with rank
    val viol = knn.groupBy("query_id")
      .agg(expr("max_by(sim, rank)").as("last"), expr("min_by(sim, rank)").as("first"))
      .filter(col("last") > col("first")).count()
    assert(viol == 0)
    knn.unpersist()
  }

  test("LSH kNN results are a subset of the full similarity ordering") {
    // every LSH neighbor must share the query's bucket and its sim must
    // match the brute-force computed sim for the same pair
    val lsh = Similarity.lshKnn(spark, sf0001)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("lsh_sim"))
    val bf = Similarity.knnBruteForce(spark, sf0001)
    // spot check: for pairs present in both, sims agree exactly
    val joined = lsh.join(bf, Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("lsh_sim") =!= col("sim")).count() == 0)
  }

  test("sparse inverted-index jaccard equals the blocked pairwise baseline") {
    for (sf <- Seq(sf0001, sf001)) {
      val sparse = Dedup.jaccardPairsSparse(spark, sf)
      val blocked = Dedup.jaccardPairsBlocked(spark, sf)
      assert(sparse.exceptAll(blocked).count() == 0, s"sparse-only rows at $sf")
      assert(blocked.exceptAll(sparse).count() == 0, s"blocked-only rows at $sf")
    }
  }

  test("hash width: 32-bit (oracle) and 64-bit (default) agree on every exact dedup operator at sf0.001") {
    // these operators are exact given a collision-free hash; at sf0.001
    // (~1e5 distinct shingles) no 32-bit collision lands inside one doc
    // or one near-threshold pair, so the two widths must agree. The
    // q14 MinHash family is excluded by design: its banding is a
    // probabilistic function of the hash values themselves, so 32- and
    // 64-bit runs legitimately draw different candidate sets.
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    val pairs = Seq[(String, Int => org.apache.spark.sql.DataFrame)](
      ("jaccardPairsSparse", b => Dedup.jaccardPairsSparse(spark, sf0001, bits = b)),
      ("noveltyScores",      b => Dedup.noveltyScores(spark, sf0001, b)),
      ("decontamination",    b => Dedup.decontamination(spark, sf0001, b)),
      ("sourceOverlap",      b => Dedup.sourceOverlap(spark, sf0001, b)),
      ("dupSpans",           b => Dedup.dupSpans(spark, sf0001, b)))
    pairs.foreach { case (name, f) =>
      assert(rows(f(Dedup.OracleHashBits)) == rows(f(Dedup.DefaultHashBits)),
        s"$name: 32- vs 64-bit drift at sf0.001")
    }
  }

  test("scan-local doc summary reproduces the aggregate minhash signatures at both widths") {
    import org.apache.spark.sql.functions.col
    for (bits <- Seq(Dedup.OracleHashBits, Dedup.DefaultHashBits)) {
      val fromSummary = Dedup.docShingleSummary(spark, sf0001, bits)
        .collect()
        .map { r =>
          // signatures ride the band strings: "m0|m1|m2|m3" per band
          r.getLong(0) -> r.getSeq[String](3).flatMap(_.split('|')).map(_.toLong)
        }.toMap
      val fromAgg = Dedup.minhashSignatures(spark, sf0001, bits)
        .collect()
        .map(r => r.getLong(0) -> (1 until 17).map(r.getLong(_)))
        .toMap
      assert(fromSummary.keySet == fromAgg.keySet, s"bits=$bits doc sets differ")
      fromSummary.foreach { case (id, sig) =>
        assert(sig == fromAgg(id), s"bits=$bits doc $id signature drift")
      }
    }
  }

  test("hash width: a synthetic 32-bit collision separates the widths (saturation case)") {
    // find two distinct shingle strings whose md5 digests share their
    // first 4 bytes but differ in the first 8 — a birthday search over
    // ~2^16 candidates. Each probe doc holds exactly one 3-token
    // shingle, so at 32 bits the two docs look identical (jaccard 1.0)
    // while at 64 bits they share nothing.
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String, bytes: Int): Long =
      md.digest(s.getBytes("UTF-8")).take(bytes)
        .foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    val seen = scala.collection.mutable.HashMap.empty[Long, Int]
    var collision: Option[(Int, Int)] = None
    var i = 0
    while (collision.isEmpty) {
      val k = h(s"a b $i", 4)
      seen.get(k) match {
        case Some(j) if h(s"a b $j", 8) != h(s"a b $i", 8) => collision = Some((j, i))
        case Some(_) => ()
        case None => seen(k) = i
      }
      i += 1
    }
    val (n1, n2) = collision.get
    import spark.implicits._
    val probe = Seq(
      (0L, "web", s"a b $n1"),
      (1L, "web", s"a b $n2")).toDF("doc_id", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("hashwidth_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val at32 = Dedup.jaccardPairsSparse(spark, tmp.toString, bits = Dedup.OracleHashBits)
    val at64 = Dedup.jaccardPairsSparse(spark, tmp.toString, bits = Dedup.DefaultHashBits)
    assert(at32.count() == 1, "32-bit width must report the colliding docs as a duplicate pair")
    assert(at32.collect().head.getAs[Double]("jaccard") == 1.0)
    assert(at64.count() == 0, "64-bit width must keep the colliding shingles distinct")
  }

  test("sourceOverlap df cap: capped equals uncapped when no shingle exceeds the cap, drops ubiquitous shingles above it") {
    // no shingle can appear in more sources than exist, so a cap of
    // #sources is vacuous and must change nothing
    val nSources = graft.core.Tables.documents(spark, sf0001)
      .select("source").distinct().count()
    val uncapped = Dedup.sourceOverlap(spark, sf0001)
    val vacuous = Dedup.sourceOverlap(spark, sf0001, dfCap = Some(nSources))
    assert(uncapped.exceptAll(vacuous).count() == 0)
    assert(vacuous.exceptAll(uncapped).count() == 0)
    // cap=1 keeps only single-source shingles: every shared count is 0,
    // so no pair rows survive the inner pair join
    assert(Dedup.sourceOverlap(spark, sf0001, dfCap = Some(1L)).count() == 0)
  }

  test("starComponents equals min-label propagation on random graphs and real LSH edges") {
    import spark.implicits._
    // seeded random graphs of mixed shape: cliques, chains, isolated edges
    val rnd = new scala.util.Random(7)
    val edges = (
      // a chain 0-1-2-...-29
      (0 until 29).map(i => (i.toLong, (i + 1).toLong)) ++
      // a clique over 100..109
      (for (i <- 100 to 109; j <- (i + 1) to 109) yield (i.toLong, j.toLong)) ++
      // random sparse edges over 200..399 (with dups and both orders)
      Seq.fill(150)((200 + rnd.nextInt(200)).toLong -> (200 + rnd.nextInt(200)).toLong)
    ).toDF("a", "b")
    // all three formulations: hybrid (single-task union-find here),
    // forced distributed star rounds, and the min-label baseline
    val star = Dedup.starComponents(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pure = Dedup.starComponentsWithRounds(edges, localFinishEdges = 0L)
      ._1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mlp = Dedup.minLabelComponents(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == mlp)
    assert(pure == mlp)
    // and on the real near-dup graph: q49 output is identical either way
    val lsh = Dedup.minhashLshPairs(spark, sf0001).select("doc_a", "doc_b")
    val s2 = Dedup.starComponents(lsh).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val m2 = Dedup.minLabelComponents(lsh).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s2 == m2)
  }

  test("starComponents converges in logarithmic rounds on a chain (min-label needs diameter rounds)") {
    import spark.implicits._
    val n = 1024
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    // localFinishEdges = 0 forces the distributed star rounds (the
    // hybrid would resolve a graph this small in one union-find task)
    val (labels, rounds) = Dedup.starComponentsWithRounds(chain, localFinishEdges = 0L)
    // every node collapses to the single component minimum 0
    assert(labels.filter(col("label") =!= 0L).count() == 0)
    assert(labels.count() == n)
    // a 1023-hop diameter costs min-label ~1023 join rounds; the
    // alternating star algorithm is O(log^2 n) — generous bound here
    assert(rounds <= 15, s"expected logarithmic rounds, got $rounds")
    // the hybrid path (star rounds + single-task union-find finish)
    // produces identical labels
    val hybrid = Dedup.starComponents(chain)
    assert(hybrid.exceptAll(labels).isEmpty && labels.exceptAll(hybrid).isEmpty)
  }

  test("df-capped jaccard keeps the qualifying pairs (cap above the planted dups' rare shingles)") {
    // cap=50 is far above this corpus's max df (25 at sf0.1): results exact
    val capped = Dedup.jaccardPairsSparse(spark, sf001, dfCap = Some(50L))
    val exact = Dedup.jaccardPairsBlocked(spark, sf001)
    assert(capped.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(capped).count() == 0)
  }

  // the JaccardDfCap-on-by-default decision (round 14, the WinnowDfCap
  // discipline): the DEFAULT must be byte-identical to uncapped on the
  // oracle corpora — that invariance is what keeps q15's DuckDB oracle
  // green — and must actually bite on a planted boilerplate corpus,
  // dropping ONLY pairs whose every shared shingle is oversubscribed
  test("q15 default df cap: invisible on oracle corpora, bites on planted boilerplate") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)
    for (sf <- Seq(sf0001, sf001)) {
      assert(rows(Dedup.jaccardPairsSparse(spark, sf)) ==
        rows(Dedup.jaccardPairsSparse(spark, sf, dfCap = None)), s"cap bit at $sf")
    }

    import spark.implicits._
    val dir = graft.streaming.StreamScratch.dir("jaccard-dfcap")
    // JaccardDfCap+8 same-SOURCE docs all opening with the same
    // 30-token boilerplate header (every boilerplate shingle's
    // per-source df > cap), each followed by unique filler; docs
    // 9000/9001 share a rare 30-token run no one else has. df for q15
    // is per (source, shingle), so everything lives in one source.
    val boiler = (1 to 30).map(i => s"license$i").mkString(" ")
    val rare = (1 to 30).map(i => s"rare$i").mkString(" ")
    val nBoiler = (Dedup.JaccardDfCap + 8).toInt
    val docs =
      (0 until nBoiler).map { d =>
        (d.toLong, boiler + " " + (1 to 40).map(i => s"u${d}x$i").mkString(" "))
      } ++ Seq(
        9000L -> (rare + " " + (1 to 40).map(i => s"a$i").mkString(" ")),
        9001L -> (rare + " " + (1 to 40).map(i => s"b$i").mkString(" ")))
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cappedP = rows(Dedup.jaccardPairsSparse(spark, dir, bits = Dedup.OracleHashBits))
    val uncapped = rows(Dedup.jaccardPairsSparse(spark, dir, dfCap = None,
      bits = Dedup.OracleHashBits))
    val cp = cappedP.map(r => (r(1), r(2))).toSet
    val up = uncapped.map(r => (r(1), r(2))).toSet
    // uncapped enumerates the boilerplate family pairwise; capped does not
    assert(up.size > cp.size, s"cap must bite: capped=${cp.size} uncapped=${up.size}")
    assert(cp.subsetOf(up))
    assert(up.contains((0L, 1L)), "boilerplate pair present uncapped")
    assert(!cp.contains((0L, 1L)), "boilerplate-only pair dropped capped")
    // the rare pair survives with an IDENTICAL row (jaccard included):
    // none of its shared shingles is popular
    val rareC = cappedP.filter(r => r(1) == 9000L && r(2) == 9001L)
    val rareU = uncapped.filter(r => r(1) == 9000L && r(2) == 9001L)
    assert(rareC.nonEmpty, "rare-run pair must survive the cap")
    assert(rareC == rareU)

    // round 15: the postings ARTIFACT bakes the same cap in at build —
    // serving from it reproduces the capped inline report exactly
    // (boilerplate-only pairs absent, the rare pair byte-identical)
    val served = rows(Dedup.jaccardPairsFromPostings(spark, dir,
      bits = Dedup.OracleHashBits))
    assert(served == cappedP,
      "artifact-served report must equal the capped inline report")
  }

  test("banded simhash pair join equals the all-pairs baseline and avoids the nested loop") {
    for (sf <- Seq(sf0001, sf001)) {
      val banded = Dedup.simhashPairs(spark, sf)
      val allPairs = Dedup.simhashPairsAllPairs(spark, sf)
      assert(banded.exceptAll(allPairs).count() == 0, s"banded-only rows at $sf")
      assert(allPairs.exceptAll(banded).count() == 0, s"all-pairs-only rows at $sf")
    }
    // the candidate join must be an equi-join, not a broadcast nested loop
    val plan = Dedup.simhashPairs(spark, sf0001).queryExecution.executedPlan
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val next = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: next.flatMap(flatten)
    }
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    assert(!flatten(plan).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "banded simhash join should not contain a nested-loop join")
  }

  test("simhashClusters equals union-find over the materialized pair expansion") {
    // union-find over q17's doc-pair output (test-scale driver-side)
    val pairs = Dedup.simhashPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clustered = Dedup.simhashClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every doc appears exactly once, singletons included
    val nDocs = Dedup.simhash(spark, sf0001).count()
    assert(clustered.length == nDocs)
    assert(clustered.map(_._1).distinct.length == clustered.length)
    // same partition: docs in pairs group exactly as union-find says,
    // docs in no pair are singletons labeled by themselves
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val expect = clustered.map(_._1).map { d =>
      d -> (if (paired.contains(d)) find(d) else d)
    }.toMap
    val expectGroups = expect.groupBy(_._2).values.map(_.keySet).toSet
    val gotGroups = clustered.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(gotGroups == expectGroups)
    // cluster_id is the min member (survivorship representative)
    clustered.groupBy(_._2).foreach { case (cid, ms) =>
      assert(cid == ms.map(_._1).min)
    }
  }

  test("tiled GEMM near-dup equals the row-pair join baseline") {
    for (sf <- Seq(sf0001, sf001)) {
      val tiled = Similarity.nearDupPairs(spark, sf)
      val pairwise = Similarity.nearDupPairsPairwise(spark, sf)
      assert(tiled.exceptAll(pairwise).count() == 0, s"tiled-only rows at $sf")
      assert(pairwise.exceptAll(tiled).count() == 0, s"pairwise-only rows at $sf")
    }
  }

  test("near-dup clusters resolve transitive chains to one representative each") {
    val clusters = Dedup.nearDupClusters(spark, sf001).cache()
    val pairs = Dedup.minhashLshPairs(spark, sf001)
      .select("doc_a", "doc_b").cache()
    val nodes = pairs.select(col("doc_a").as("d"))
      .union(pairs.select(col("doc_b").as("d"))).distinct().count()
    // every clustered doc is counted exactly once across clusters
    assert(clusters.agg(sum("n_members")).collect()(0).getLong(0) == nodes)
    // each cluster has >= 2 members (clusters come from pairs)
    assert(clusters.filter(col("n_members") < 2).count() == 0)
    // fixpoint check: the reported (cluster_id, n_members) rows must
    // equal an independent union-find over the same edge list
    val m = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val uf = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = uf.getOrElse(x, x); if (p == x) x else { val r = find(p); uf(x) = r; r } }
    m.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) uf(math.max(ra, rb)) = math.min(ra, rb) }
    val expected = m.flatMap { case (a, b) => Seq(a, b) }.distinct
      .groupBy(find).map { case (root, ms) => (ms.min, ms.length.toLong) }
    val got = clusters.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected, s"clusters $got != union-find $expected")
    clusters.unpersist(); pairs.unpersist()
  }

  test("hash split is deterministic, complete, and roughly 80/10/10") {
    val s1 = Sampling.hashSplit(spark, sf001).collect()
    val s2 = Sampling.hashSplit(spark, sf001).collect()
    assert(s1.toSeq == s2.toSeq)
    val total = s1.map(_.getAs[Long]("n_docs")).sum
    assert(total == spark.read.parquet(s"$sf001/documents.parquet").count())
    val train = s1.find(_.getString(0) == "train").get.getAs[Long]("n_docs")
    assert(math.abs(train.toDouble / total - 0.8) < 0.1)
  }

  test("stratified sample keeps every stratum near the target rate") {
    val s = Sampling.stratifiedSample(spark, sf001).collect()
    assert(s.nonEmpty)
    s.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate >= 0.0 && rate <= 0.35,
        s"${r.getString(0)}: rate $rate far from 10% target")
    }
  }

  test("source cap keeps a deterministic bounded subset per source") {
    val s1 = Sampling.sourceCap(spark, sf001).collect()
    val s2 = Sampling.sourceCap(spark, sf001).collect()
    assert(s1.toSeq == s2.toSeq) // same SET selected every run
    s1.foreach { r =>
      val total = r.getAs[Long]("n_total"); val kept = r.getAs[Long]("n_kept")
      assert(kept == math.min(total, Sampling.SourceCap),
        s"${r.getString(0)}: kept $kept of $total")
    }
    // the cap filter must ride WindowGroupLimit (partial per-group
    // top-k before the shuffle)
    val plan = Sampling.sourceCap(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("novelty is 1 for unique content and low for planted duplicates") {
    val nov = Dedup.noveltyScores(spark, sf001).cache()
    assert(nov.filter(col("novelty") < 0 || col("novelty") > 1).count() == 0)
    // planted near-dups share nearly all shingles -> low novelty
    val dups = Dedup.minhashLshPairs(spark, sf001).filter(col("jaccard") >= 0.9)
      .select(col("doc_a").as("doc_id"))
    val dupNov = nov.join(dups, "doc_id").agg(avg("novelty")).collect()(0).getDouble(0)
    val allNov = nov.agg(avg("novelty")).collect()(0).getDouble(0)
    assert(dupNov < allNov, s"dup novelty $dupNov should be below corpus avg $allNov")
    nov.unpersist()
  }

  test("IVF-PQ + exact refine: results are a subset of IVF candidates with decent recall") {
    import graft.ops.Similarity
    val ivfpq = Similarity.ivfPqKnn(spark, sf001).collect()
    val brute = Similarity.knnBruteForce(spark, sf001).collect()
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs(ivfpq)
    assert(got.nonEmpty)
    // deterministic
    assert(pairs(Similarity.ivfPqKnn(spark, sf001).collect()) == got)
    // the refine stage scores exactly: every returned sim equals the
    // brute-force sim for that (query, neighbor) pair
    val bruteSims = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    ivfpq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteSims.get(key).foreach(s => assert(math.abs(s - r.getDouble(3)) == 0.0))
    }
    // recall against the exact top-k: pruning is real but not absurd
    val recall = got.intersect(pairs(brute)).size.toDouble / pairs(brute).size
    assert(recall >= 0.2, s"recall $recall collapsed — probe/refine windows broken")
  }

  test("PQ-ADC kNN: exact integer distances, deterministic, nonzero recall vs brute force") {
    val pq = Similarity.pqKnn(spark, sf0001).cache()
    assert(pq.groupBy("query_id").count().collect()
      .forall(_.getAs[Long]("count") == Consts.KnnK))
    // integer ADC distances are exact -> bit-stable across runs
    assert(pq.exceptAll(Similarity.pqKnn(spark, sf0001)).count() == 0)
    // the compressed representation must still retrieve signal: some
    // overlap with the exact top-k (random 64-d corpus, 16 sampled
    // codewords — PQ is an approximation, not a reranker)
    val exact = Similarity.knnBruteForce(spark, sf0001)
      .select("query_id", "neighbor_id")
    val overlap = pq.select("query_id", "neighbor_id")
      .join(exact, Seq("query_id", "neighbor_id")).count()
    assert(overlap > 0, s"PQ found none of the exact neighbors")
    pq.unpersist()
  }

  test("CDC never anchors inside uniform runs and re-syncs after an insertion") {
    // regression for the degenerate first cut (31^2 == 1 mod 64 made
    // every 8-char run anchor at every position): a run of identical
    // characters must produce NO internal boundaries
    for (c <- Seq(' ', '-', 'a', '=')) {
      val run = c.toString * 64
      assert(Dedup.cdcSplit(run) == Seq(run), s"uniform '$c' run split: ${Dedup.cdcSplit(run).length} segs")
    }
    // anchoring: an insertion near the front shifts early boundaries
    // but the suffix re-synchronizes to identical segments
    val base = "the quick brown fox jumps over the lazy dog " * 40
    val edited = "INSERTED TEXT " + base
    val a = Dedup.cdcSplit(base); val b = Dedup.cdcSplit(edited)
    assert(a.mkString("") == base && b.mkString("") == edited)
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.nonEmpty, "suffix segments should re-synchronize after an edit")
  }

  test("CDC segments round-trip, stay anchored, and dedup shared blocks across docs") {
    import spark.implicits._
    val segs = Dedup.cdcSegments(spark, sf001).cache()
    // segment lengths reassemble every document exactly
    val lens = segs.groupBy("doc_id").agg(sum("seg_len").as("total"))
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .filter(col("len") > 0)
    assert(lens.join(docs, "doc_id").filter(col("total") =!= col("len")).count() == 0)
    // block-level dedup: planted near-duplicates share segments, so
    // distinct hashes < total segments
    val total = segs.count()
    val uniq = segs.select("seg_md5").distinct().count()
    assert(uniq < total, s"expected shared blocks, got $uniq/$total")
    // re-synchronization: at least one segment hash appears in MORE
    // than one distinct document (cross-doc block sharing)
    val crossDoc = segs.groupBy("seg_md5")
      .agg(countDistinct("doc_id").as("nd")).filter(col("nd") > 1).count()
    assert(crossDoc > 0)
    segs.unpersist()
  }

  test("exact dedup keeps one row per distinct content") {
    val d = Dedup.exactDedup(spark, sf0001)
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").distinct().count()
    assert(d.count() == texts)
  }
}
