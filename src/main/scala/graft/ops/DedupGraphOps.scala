package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Consts, Tables}
import graft.ops.TextAnalytics.{tokens, shingles3, sqlShingles}

/** Near-dup graph machinery: connected components (large-star /
  * local union-find), survivorship and quality audits, PageRank,
  * cohesion, consensus clustering, random walks, loss weights, and
  * the cross-source matrix.
  *
  * One mixin slice of [[Dedup]] (round-12 file split along the family
  * seams; no behavior change — every member keeps its `Dedup.` call
  * surface through the mixin).
  */
trait DedupGraphOps { this: Dedup.type =>


  // -------------------------------------------------------------------
  // Near-dup CLUSTER resolution: connected components over the MinHash
  // pair graph. Pair detection alone is not a dedup policy — a real
  // pipeline must resolve transitive chains (a~b, b~c => one cluster)
  // and keep one representative per cluster.
  // -------------------------------------------------------------------

  /** Connected components via iterative min-label propagation (the
    * standard distributed CC shape, cf. GraphX/GraphFrames): each node
    * starts labeled with its own id; every round takes the min of its
    * own and its neighbors' labels (one equi-join + groupBy-min per
    * round); fixpoint in <= graph-diameter rounds. Labels only
    * decrease, so termination is guaranteed; the driver loop carries
    * only a converged? count per round, never data. Output: one row
    * per cluster — (cluster_id = min doc_id, n_members), i.e. the
    * survivorship decision (keep cluster_id, drop the rest). */
  /** Iterative min-label propagation over an undirected edge list
    * (pairs of longs, one direction — symmetrized here). Returns one
    * row per node that appears in an edge: (node, label) with label =
    * min node id of its component.
    *
    * The input is localCheckpoint'ed (not cached): caching keeps the
    * full upstream LOGICAL plan, so every round's action re-analyzes
    * and re-optimizes it — measured at 1.3-1.5 s of pure planning per
    * round over a 512-edge graph. A flat LogicalRDD plans in ms. */
  /** Connected components via the alternating large-star/small-star
    * algorithm (Kiveris et al. 2014, "Connected Components in MapReduce
    * and Beyond"). Each round applies two rewrites to a canonical
    * (hi > lo) edge list:
    *
    *  - large-star: every node's strictly-larger neighbors re-point at
    *    the minimum of its closed neighborhood — long chains contract
    *    toward their minimum in parallel;
    *  - small-star: every node's smaller neighbors (and itself) connect
    *    directly to the smallest of them — partial stars flatten.
    *
    * Fixpoint = a union of stars centered at each component's minimum
    * node, reached in O(log^2 n) rounds regardless of diameter, versus
    * min-label propagation's one round PER DIAMETER STEP (a 1000-link
    * chain costs ~1000 joins there, ~20 here). Per round this pays two
    * shuffles + a convergence check over a strictly non-growing edge
    * set; every round localCheckpoints (flat re-plans, releasable
    * blocks), like the min-label loop below.
    *
    * Returns (node, label) for every node in the input edge list,
    * label = component minimum — same contract as minLabelComponents,
    * which survives as the spec cross-check baseline. */
  private[graft] def starComponents(pairs: DataFrame): DataFrame =
    starComponentsWithRounds(pairs)._1

  /** Below this many edges the remaining resolution runs as ONE
    * single-task union-find (mapPartitions over a coalesce(1) view)
    * instead of more distributed rounds: near-dup edge sets are
    * answer-sized (true duplicate pairs), and at this size the loop's
    * per-round job latency exceeds the actual compute by orders of
    * magnitude. 2M edges of two longs plus hash-map overhead is well
    * under one task's memory. The star loop above the threshold is the
    * 100-TB path: rounds are diameter-independent and the edge set
    * never grows, so a huge graph either converges distributed or
    * passes through unchanged until its answer fits one task. */
  val LocalCcFinishEdges = 2000000L

  /** Single-task union-find over an edge list: emits the canonical
    * star forest (node, component-min) for node != min — the same
    * shape a converged star loop leaves behind. Union-by-min keeps
    * every tree's root at its component minimum. */
  private def localUnionFindStars(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val Seq(c1, c2) = edges.columns.toSeq
    edges.select(col(c1).cast("long"), col(c2).cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        // path compression mutates the map — snapshot keys first
        val ks = parent.keys.toArray
        ks.iterator.map(k => (k, find(k))).filter(p => p._1 != p._2)
      }
      .toDF("hi", "lo")
  }

  private[graft] def starComponentsWithRounds(
      pairs: DataFrame,
      localFinishEdges: Long = LocalCcFinishEdges): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val Seq(pa, pb) = pairs.columns.toSeq
    // ONE checkpoint of the (possibly expensive) upstream pair pipeline;
    // the node roster and the edge seed both derive from it. Tracked:
    // Bench/Verify release the blocks after the query's action.
    val input = Materialize.tracked(spark,
      pairs.select(col(pa).cast("long").as("a"), col(pb).cast("long").as("b"))
        .localCheckpoint(true))
    val nodes = input.select(col("a").as("node"))
      .unionAll(input.select(col("b").as("node"))).distinct()
    var rounds = 0
    var edges: DataFrame = null
    if (input.count() <= localFinishEdges) {
      // small regime: skip the canonical distinct AND the loop — one
      // task resolves everything exactly (raw dups/self-loops are
      // union-find no-ops)
      edges = Materialize.tracked(spark,
        localUnionFindStars(input).localCheckpoint(true))
      rounds = 1
    } else {
      edges = Materialize.tracked(spark,
        input.filter(col("a") =!= col("b"))
          .select(greatest(col("a"), col("b")).as("hi"), least(col("a"), col("b")).as("lo"))
          .distinct().localCheckpoint(true))
      // convergence bookkeeping: one tiny (count, xor-of-xxhash64)
      // aggregate per round over the checkpointed edge set. Equal
      // summaries across a round mean "converged" with collision odds
      // ~2^-64 — and because component labels must be EXACT, a summary
      // match is then confirmed with one exceptAll before exiting (on
      // the astronomically-unlikely false match the loop just
      // continues). This replaces the count+count+exceptAll trio per
      // round that dominated the loop's wall time.
      def summarize(e: DataFrame): (Long, Long) = {
        val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("hi"), col("lo")))).collect()(0)
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      var cur = summarize(edges)
      var done = cur._1 == 0L
      while (!done) {
        if (cur._1 <= localFinishEdges) {
          // the rounds so far contracted the graph under the one-task
          // bound — finish exactly, no more distributed rounds
          val fin = Materialize.tracked(spark,
            localUnionFindStars(edges).localCheckpoint(true))
          org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(edges)
          edges = fin
          done = true
        } else {
          // large-star over the symmetric view: for each u,
          // m = min(N(u) ∪ {u}); each edge is re-emitted once, from its
          // smaller endpoint's side. Window aggregates instead of
          // groupBy+join: ONE shuffle of the big side per star step and
          // no join build side. Duplicate (hi, lo) rows are tolerated
          // until the round's final distinct (min is dup-safe).
          val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
            .unionAll(edges.select(col("lo").as("u"), col("hi").as("v")))
          val wU = org.apache.spark.sql.expressions.Window.partitionBy("u")
          val large = sym
            .select(col("u"), col("v"), least(col("u"), min("v").over(wU)).as("m"))
            .filter(col("v") > col("u"))
            .select(col("v").as("hi"), col("m").as("lo"))
          // small-star: per hi, connect hi and all its los to min(los);
          // explode emits both rewritten edges in one pass instead of a
          // self-union that would compute the window twice
          val wH = org.apache.spark.sql.expressions.Window.partitionBy("hi")
          val re = large.select(col("hi"), col("lo"), min("lo").over(wH).as("m"))
          val small = re.select(explode(when(col("lo") =!= col("m"),
              array(struct(col("hi").as("h"), col("m").as("l")),
                    struct(col("lo").as("h"), col("m").as("l"))))
            .otherwise(array(struct(col("hi").as("h"), col("m").as("l"))))).as("e"))
            .select(col("e.h").as("hi"), col("e.l").as("lo"))
            .distinct()
          val next = Materialize.tracked(spark, small.localCheckpoint(true))
          val ns = summarize(next)
          done = ns == cur && next.exceptAll(edges).isEmpty
          org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(edges)
          edges = next
          cur = ns
        }
        rounds += 1
      }
    }
    // the final edge set is a proper star forest: every hi points at
    // exactly one lo = its component min; roots and isolated nodes
    // label themselves. Left as a lazy two-checkpoint join (no extra
    // materialization job); input/edges blocks are freed by the
    // session release after the caller's action.
    val labels = nodes
      .join(edges.select(col("hi").as("node"), col("lo").as("star")), Seq("node"), "left")
      .select(col("node"), coalesce(col("star"), col("node")).as("label"))
    (labels, rounds)
  }

  private[graft] def minLabelComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val Seq(a, b) = pairs.columns.toSeq
    // tracked: Bench/Verify release the checkpoint blocks after the
    // query's action instead of waiting for driver GC
    val sym = Materialize.tracked(spark, pairs
      .unionAll(pairs.select(col(b).as(a), col(a).as(b)))
      .toDF("src", "dst").localCheckpoint(true))
    // each round CHECKPOINTS its step, not cache(): step_n's logical
    // plan references labels_{n-1} twice (the propagation join and the
    // carried old label), so a cache-based loop doubles the LOGICAL
    // tree per round — fine at duplicate-graph diameters (2-4), an
    // exponential treeString/planning blowup on a 30-hop chain. A
    // checkpoint re-roots each round at a flat LogicalRDD.
    var step = Materialize.tracked(spark,
      sym.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
        .withColumn("next_label", col("node")).localCheckpoint(true))
    var labels = step.select(col("node"), col("label"))
    var changed = 1L
    while (changed > 0) {
      val prop = sym.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(min("label").as("prop_label"))
      // carry old + new label through one materialized frame so the
      // convergence check and the next round share a single job
      val next = Materialize.tracked(spark, labels.join(prop, Seq("node"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("prop_label"), col("label"))).as("next_label"))
        .localCheckpoint(true))
      changed = next.filter(col("next_label") =!= col("label")).count()
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(step)
      step = next
      labels = step.select(col("node"), col("next_label").as("label"))
    }
    // re-root the final projection so every loop block can be freed NOW
    // (leaking blocks per call degrades long sessions — measured as GC
    // pressure on later queries in the benchmark suite)
    val finalLabels = Materialize.tracked(spark, labels.localCheckpoint(true))
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(step)
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(sym)
    finalLabels
  }

  def nearDupClusters(spark: SparkSession, sfDir: String,
                      bits: Int = DefaultHashBits): DataFrame =
    starComponents(
        minhashLshPairs(spark, sfDir, bits).select(col("doc_a"), col("doc_b")))
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy("cluster_id")

  def nearDupClustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM (${minhashLshPairsSql}) ),
       |sym AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach AS (
       |  SELECT src AS doc_id, src AS label FROM sym
       |  UNION
       |  SELECT e.dst AS doc_id, r.label FROM reach r JOIN sym e ON e.src = r.doc_id)
       |SELECT cluster_id, count(*) AS n_members FROM (
       |  SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id)
       |GROUP BY cluster_id
       |ORDER BY cluster_id""".stripMargin

  /** q74: dedup survivorship report — the END of the dedup pipeline.
    * Exact-duplicate edges (same content hash → link to the group's
    * min doc) and near-duplicate edges (the q14 MinHash+LSH pair
    * relation) union into ONE graph; each connected component keeps
    * its minimum doc_id; everything else drops. The report is the
    * per-source docs/tokens kept-vs-dropped — the number a curation
    * run actually publishes ("dedup removed X% of source Y's tokens").
    *
    * Scale shape: exact edges cost one hash aggregation; near edges
    * reuse the banded LSH join (never O(n²)); the component resolution
    * is the shared diameter-bounded min-label loop (driver holds one
    * count per round, lineage checkpoint-truncated). The final stats
    * are one shuffle by source with map-side combine. */
  /** Per-doc survivorship verdicts (doc_id, source, n_tokens, kept):
    * exact-hash and MinHash near-dup edges resolve through shared
    * connected components; a doc survives iff it is its component's
    * minimum (or untouched by any edge). Row-level so composite
    * pipelines act on the same verdicts the q74 report aggregates. */
  /** Exact-hash ∪ MinHash-LSH near-dup edges over documents — the ONE
    * edge set every cluster-level dedup decision (q74 survivorship,
    * q91 leakage-safe split, q106 quality-aware survivors) resolves
    * through shared connected components, so "what counts as a
    * duplicate" cannot drift between the decisions built on it. */
  private[graft] def dedupGraphEdges(spark: SparkSession, sfDir: String,
                                     bits: Int = DefaultHashBits): DataFrame =
    exactDupEdges(spark, sfDir)
      .unionAll(minhashLshPairs(spark, sfDir, bits).select("doc_a", "doc_b"))

  /** The exact-duplicate arm of [[dedupGraphEdges]] on its own: one
    * content-hash aggregation linking every byte-identical copy to its
    * group's minimum doc_id. Split out so the persisted dedup-graph
    * build ([[saveDedupGraph]]) can write it as a standalone
    * projection. */
  private[graft] def exactDupEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val minPerHash = docs.groupBy("h").agg(min("doc_id").as("root"))
    docs.join(minPerHash, "h")
      .filter(col("doc_id") =!= col("root"))
      .select(col("root").as("doc_a"), col("doc_id").as("doc_b"))
  }

  /** Shared DuckDB CTE block mirroring [[dedupGraphEdges]] +
    * [[starComponents]]: binds `ddocs(doc_id, h)`, `edges`, and
    * `comp(doc_id, cluster)` (clustered docs only; cluster = min
    * member id). Callers prepend `WITH RECURSIVE` and append their own
    * CTEs — one definition for q74/q91/q106 so the three oracles agree
    * on the graph by construction. */
  private[ops] def sqlDedupGraphCtes: String =
    s"""ddocs AS (SELECT doc_id, md5(text) AS h FROM documents),
       |mh AS (SELECT h, min(doc_id) AS hroot FROM ddocs GROUP BY h),
       |exact_e AS (
       |  SELECT hroot AS doc_a, doc_id AS doc_b FROM ddocs JOIN mh USING (h)
       |  WHERE doc_id != hroot),
       |near_e AS (SELECT doc_a, doc_b FROM (${minhashLshPairsSql})),
       |edges AS (SELECT * FROM exact_e UNION ALL SELECT * FROM near_e),
       |sym AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM edges
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM edges),
       |reach AS (
       |  SELECT src AS doc_id, src AS label FROM sym
       |  UNION
       |  SELECT e.dst AS doc_id, r.label FROM reach r JOIN sym e ON e.src = r.doc_id),
       |comp AS (SELECT doc_id, min(label) AS cluster FROM reach GROUP BY doc_id)""".stripMargin

  private[graft] def survivorFlags(spark: SparkSession, sfDir: String,
                                   bits: Int = DefaultHashBits): DataFrame =
    survivorFlagsWith(spark, sfDir,
      starComponents(dedupGraphEdges(spark, sfDir, bits)))

  /** [[survivorFlags]] against an EXTERNAL (node, label) component
    * table — the seam the persisted dedup-graph serving path shares
    * with the inline form, so "who survives" cannot drift between the
    * recompute and the artifact read. */
  private[graft] def survivorFlagsWith(spark: SparkSession, sfDir: String,
                                       comp: DataFrame): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    docs.join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .withColumn("kept", col("doc_id") === coalesce(col("label"), col("doc_id")))
      .select("doc_id", "source", "n_tokens", "kept")
  }

  def dedupSurvivors(spark: SparkSession, sfDir: String,
                     bits: Int = DefaultHashBits): DataFrame =
    dedupSurvivorsOf(survivorFlags(spark, sfDir, bits))

  /** The q74 aggregation over any per-doc survivor-flag frame. */
  private[ops] def dedupSurvivorsOf(flags: DataFrame): DataFrame = {
    flags
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("tokens_kept"),
        sum(when(!col("kept"), col("n_tokens")).otherwise(0L)).as("tokens_dropped"))
      .orderBy("source")
  }

  def dedupSurvivorsSql: String =
    s"""WITH RECURSIVE
       |$sqlDedupGraphCtes,
       |docs AS (
       |  SELECT doc_id, source,
       |    cast(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '')) as bigint) AS n_tokens
       |  FROM documents)
       |SELECT source, count(*) AS n_docs,
       |  cast(sum(CASE WHEN kept THEN 1 ELSE 0 END) as bigint) AS n_kept,
       |  cast(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) as bigint) AS tokens_kept,
       |  cast(sum(CASE WHEN NOT kept THEN n_tokens ELSE 0 END) as bigint) AS tokens_dropped
       |FROM (SELECT d.source, d.n_tokens,
       |        d.doc_id = coalesce(c.cluster, d.doc_id) AS kept
       |      FROM docs d LEFT JOIN comp c USING (doc_id))
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** q106: QUALITY-AWARE survivor selection — the FineWeb/RefinedWeb
    * refinement of q74's keep-the-minimum-id rule: within each near-dup
    * cluster, keep the member with the HIGHEST quality score (q10's
    * alpha×(1−stopword) score, the shared `qualityCol` — ties broken by
    * doc_id). Min-id survivorship is arbitrary: when a boilerplate
    * family contains one clean original and N mangled copies, the
    * survivor should be chosen by content, not by crawl order. The
    * report contrasts both rules per cluster (`upgraded` = the quality
    * rule picked a different doc than min-id; `quality_gain` = how much
    * better its survivor scores).
    *
    * Scale shape: the quality score is a scan-local projection
    * (per-row regex + token ratios, no shuffle); the edge set and
    * components are the SHARED `dedupGraphEdges`/`starComponents`
    * machinery (q49/q74/q91 — banded LSH, never O(n²)); clustered
    * members join quality by doc_id (one keyed shuffle, sized by the
    * duplicate count, not the corpus); the argmax is `max_by` over a
    * (q, -doc_id) struct key — a PARTIAL-aggregating single shuffle,
    * deliberately not a window: a web-scale template family puts 10⁶
    * members in one cluster, and a window must sort that whole
    * partition on one task while map-side-combined max_by reduces it
    * to one row per map task before the exchange. The oracle keeps
    * the equivalent row_number formulation (DuckDB's arg_max cannot
    * take a struct key; the oracle only needs semantics, not the
    * scale plan). */
  def qualitySurvivors(spark: SparkSession, sfDir: String,
                       bits: Int = DefaultHashBits): DataFrame =
    qualitySurvivorsWith(spark, sfDir,
      starComponents(dedupGraphEdges(spark, sfDir, bits)))

  /** q106 over an external (node, label) component table (the
    * persisted-graph serving seam). */
  private[graft] def qualitySurvivorsWith(spark: SparkSession, sfDir: String,
                                          compIn: DataFrame): DataFrame = {
    val qd = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("t"))
      .select(col("doc_id"),
        TextAnalytics.qualityCol(col("text"), col("t")).as("q"))
    val comp = compIn
      .withColumnRenamed("node", "doc_id")
      .withColumnRenamed("label", "cluster")
    // struct ordering is lexicographic: max over (q, -doc_id) == the
    // window's (q DESC, doc_id ASC) rank-1 row; doc_id is unique so
    // the argmax is unambiguous, and max(q) IS the survivor's quality
    comp.join(qd, Seq("doc_id"))
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n_members"),
        max_by(col("doc_id"),
          struct(col("q"), (-col("doc_id")).as("nid"))).as("survivor_doc_id"),
        max(col("q")).as("survivor_quality"),
        min(col("doc_id")).as("naive_doc_id"),
        min_by(col("q"), col("doc_id")).as("naive_quality"))
      .select(col("cluster"), col("n_members"),
        col("survivor_doc_id"), col("survivor_quality"),
        col("naive_doc_id"), col("naive_quality"),
        (col("survivor_doc_id") =!= col("naive_doc_id")).as("upgraded"),
        (col("survivor_quality") - col("naive_quality")).as("quality_gain"))
      .orderBy("cluster")
  }

  def qualitySurvivorsSql: String =
    s"""WITH RECURSIVE
       |$sqlDedupGraphCtes,
       |qd AS (
       |  SELECT doc_id, ${TextAnalytics.qualitySqlExpr} AS q
       |  FROM (SELECT doc_id, text, ${TextAnalytics.sqlTokens} t FROM documents)),
       |m AS (
       |  SELECT c.cluster, c.doc_id, qd.q,
       |    row_number() OVER (PARTITION BY c.cluster ORDER BY qd.q DESC, c.doc_id ASC) AS rank
       |  FROM comp c JOIN qd USING (doc_id))
       |SELECT cluster, cast(count(*) as bigint) AS n_members,
       |  cast(max(CASE WHEN rank = 1 THEN doc_id END) as bigint) AS survivor_doc_id,
       |  max(CASE WHEN rank = 1 THEN q END) AS survivor_quality,
       |  cast(min(doc_id) as bigint) AS naive_doc_id,
       |  arg_min(q, doc_id) AS naive_quality,
       |  max(CASE WHEN rank = 1 THEN doc_id END) != min(doc_id) AS upgraded,
       |  max(CASE WHEN rank = 1 THEN q END) - arg_min(q, doc_id) AS quality_gain
       |FROM m
       |GROUP BY cluster
       |ORDER BY cluster""".stripMargin

  /** q133: quality×duplication calibration — the audit that tells you
    * whether the quality score and the dedup graph agree: per quality
    * decile band (floor(q·10), clamped to 9), how many docs sit inside
    * ANY near-dup family and what token mass they carry. A healthy
    * curation setup shows duplication concentrated in the low-quality
    * bands (template spam is both low-quality and duplicated); a FLAT
    * profile means the quality filter and the deduper are removing
    * DIFFERENT documents and the pipeline genuinely needs both; dup
    * mass concentrated in HIGH bands is the red flag — the "quality"
    * signal is probably rewarding boilerplate (FineWeb's motivation
    * for quality-aware survivorship, q106). Composes three existing
    * seams: q10's shared qualityCol, q49's shared graph/CC machinery,
    * q74's membership flags — no new signal, which is the point: the
    * audit is only trustworthy because both axes are EXACTLY the
    * production signals.
    *
    * Scale shape: quality and token counts are scan-local projections;
    * the component set is the shared banded-LSH + star/union-find
    * machinery (never O(n²)); membership is one left equi-join keyed
    * doc_id (sized by the duplicate count); the report is one agg onto
    * ≤10 bands. */
  def qualityDupAudit(spark: SparkSession, sfDir: String,
                      bits: Int = DefaultHashBits): DataFrame =
    qualityDupAuditWith(spark, sfDir,
      starComponents(dedupGraphEdges(spark, sfDir, bits)))

  /** q133 over an external (node, label) component table (the
    * persisted-graph serving seam). */
  private[graft] def qualityDupAuditWith(spark: SparkSession, sfDir: String,
                                         compIn: DataFrame): DataFrame = {
    val qd = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("t"))
      .select(col("doc_id"),
        TextAnalytics.qualityCol(col("text"), col("t")).as("q"),
        size(col("t")).cast("long").as("n_tokens"))
      .withColumn("bucket",
        least(floor(col("q") * lit(10.0)).cast("long"), lit(9L)))
    val comp = compIn
      .withColumnRenamed("node", "doc_id")
      .select(col("doc_id"), lit(true).as("in_dup"))
    qd.join(comp, Seq("doc_id"), "left")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("in_dup"), 1L).otherwise(0L)).as("n_dup_members"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("in_dup"), col("n_tokens")).otherwise(0L)).as("dup_tokens"))
      .withColumn("dup_permille", expr("n_dup_members * 1000 div n_docs"))
      .select("bucket", "n_docs", "n_dup_members", "dup_permille",
        "n_tokens", "dup_tokens")
      .orderBy("bucket")
  }

  def qualityDupAuditSql: String =
    s"""WITH RECURSIVE
       |$sqlDedupGraphCtes,
       |qd AS (
       |  SELECT doc_id,
       |    least(cast(floor((${TextAnalytics.qualitySqlExpr}) * 10.0) as bigint), 9) AS bucket,
       |    cast(len(t) as bigint) AS n_tokens
       |  FROM (SELECT doc_id, text, ${TextAnalytics.sqlTokens} t FROM documents))
       |SELECT bucket, count(*) AS n_docs,
       |  cast(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_dup_members,
       |  cast(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) as bigint) * 1000
       |    // count(*) AS dup_permille,
       |  cast(sum(n_tokens) as bigint) AS n_tokens,
       |  cast(sum(CASE WHEN c.doc_id IS NOT NULL THEN n_tokens ELSE 0 END) as bigint) AS dup_tokens
       |FROM qd LEFT JOIN comp c USING (doc_id)
       |GROUP BY bucket
       |ORDER BY bucket""".stripMargin

  /** q91: CLUSTER-AWARE train/val/test split — the leakage guard a
    * training pipeline needs between dedup and splitting: two near-
    * duplicate documents on opposite sides of the train/test boundary
    * are memorization leakage, so the split must be decided per
    * CONNECTED COMPONENT, not per document. Assignment hashes the
    * component ROOT with q50's exact bucket arithmetic — every member
    * of a cluster lands whole in one split by construction — and the
    * report contrasts with the naive per-doc hash split, counting the
    * clusters naive assignment would have torn across splits.
    *
    * Scale shape: the component resolution is the shared star/union-
    * find machinery (q49/q74); everything after it is one scan-time
    * hash map and a cluster-then-split pair of keyed aggregations. */
  // -------------------------------------------------------------------
  // PageRank iteration over the near-dup graph: duplication centrality.
  // -------------------------------------------------------------------

  /** Damping in micro-units: rank mass is 1_000_000 per node, the
    * damped base is floor(0.15e6) and the propagated share is
    * floor(85·sum/100) — all integer, so one iteration is
    * hash-checkable (the q73/q84 train-step discipline). */
  val PagerankUnit = 1000000L
  val PagerankBase = 150000L

  /** q93: one damped PageRank iteration over the SYMMETRIC near-dup
    * graph (the q14 MinHash-LSH pairs). The stationary rank of this
    * graph is "duplication centrality" — template/boilerplate hubs
    * whose text seeds many near-copies score high, which is a
    * curation prune signal the pairwise Jaccard number alone doesn't
    * give (a hub with 50 spokes outranks 25 disjoint pairs). One
    * iteration is oracle-pinned; a full run is a driver loop over
    * this step with localCheckpoint-truncated lineage, exactly like
    * q73's Lloyd iteration — per-iteration state is one (node, rank)
    * table, never the graph re-derivation.
    *
    * Scale shape: edges are LSH-bounded (never all-pairs); degree is
    * one keyed agg; the contribution pass is one equi-join + one
    * keyed agg. Rank mass moves as integer micro-units with floor
    * division, so repeated iterations stay exactly reproducible
    * across partitionings (addition of longs commutes; no float
    * accumulation order risk). */
  def pagerankIter(spark: SparkSession, sfDir: String,
                   bits: Int = DefaultHashBits): DataFrame =
    // truncate before the union: both union branches read the pair
    // table, and an unmaterialized plan would re-run the LSH self-join
    // once per branch (measured 2x the query at sf0.1)
    pagerankIterWith(spark, Materialize.tracked(spark,
      minhashLshPairs(spark, sfDir, bits).select("doc_a", "doc_b")
        .localCheckpoint(true)))

  /** q93 over an external verified (doc_a, doc_b) pair relation (the
    * persisted-graph serving seam — an artifact scan is cheap per
    * branch, so the serving caller skips the checkpoint). */
  private[graft] def pagerankIterWith(spark: SparkSession,
                                      pairs: DataFrame): DataFrame = {
    val edges = pairs.union(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val deg = edges.groupBy("doc_a").agg(count(lit(1)).as("deg"))
    edges.join(deg, "doc_a")
      .select(col("doc_b").as("doc_id"), expr(s"$PagerankUnit div deg").as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("deg"), sum(col("c")).as("in_sum"))
      .withColumn("rank_u", expr(s"$PagerankBase + (85 * in_sum) div 100"))
      .select("doc_id", "deg", "in_sum", "rank_u")
      .orderBy("doc_id")
  }

  /** Full damped PageRank run: `iters` repetitions of the q93 step
    * with the q49/q73 driver-loop discipline — the graph (edges +
    * degrees) derives ONCE and is lineage-truncated; per-iteration
    * state is a (doc_id, rank_u) table, localCheckpoint'ed so the
    * plan never re-grows. pagerankRun(_, _, 1) is spec-pinned equal
    * to pagerankIter's rank column. Nodes keep full integer rank
    * mass; isolated nodes don't occur (every node has >= 1 edge by
    * construction of the pair graph). */
  def pagerankRun(spark: SparkSession, sfDir: String, iters: Int,
                  bits: Int = DefaultHashBits): DataFrame = {
    require(iters >= 1, "iters >= 1")
    val pairs = Materialize.tracked(spark,
      minhashLshPairs(spark, sfDir, bits).select("doc_a", "doc_b")
        .localCheckpoint(true))
    val edges = Materialize.tracked(spark,
      pairs.union(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint(true))
    val deg = Materialize.tracked(spark,
      edges.groupBy("doc_a").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true))
    var ranks = deg.select(col("doc_a").as("doc_id"),
      lit(PagerankUnit).as("rank_u"))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val next = Materialize.tracked(spark,
        edges.join(deg, "doc_a")
          .join(ranks.withColumnRenamed("doc_id", "doc_a"), "doc_a")
          .select(col("doc_b").as("doc_id"), expr("rank_u div deg").as("c"))
          .groupBy("doc_id")
          .agg(sum(col("c")).as("in_sum"))
          .withColumn("rank_u", expr(s"$PagerankBase + (85 * in_sum) div 100"))
          .select("doc_id", "rank_u")
          .localCheckpoint(true))
      // the superseded iteration's blocks are dead the moment the next
      // one materializes (the q49 loop's release discipline)
      if (prev != null) org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(prev)
      prev = next
      ranks = next
    }
    ranks.orderBy("doc_id")
  }

  def pagerankIterSql: String =
    s"""WITH p AS (SELECT doc_a, doc_b FROM ($minhashLshPairsSql)),
       |e AS (SELECT doc_a, doc_b FROM p
       |      UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM p),
       |d AS (SELECT doc_a, cast(count(*) as bigint) AS deg FROM e GROUP BY doc_a),
       |c AS (SELECT e.doc_b AS doc_id, $PagerankUnit // d.deg AS c
       |      FROM e JOIN d USING (doc_a))
       |SELECT doc_id, cast(count(*) as bigint) AS deg,
       |  cast(sum(c) as bigint) AS in_sum,
       |  $PagerankBase + (85 * cast(sum(c) as bigint)) // 100 AS rank_u
       |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q146: cluster COHESION audit — the chaining-pathology report for
  // connected-component dedup. CC merges by REACHABILITY: A~B and B~C
  // put A and C in one cluster with no direct evidence they are
  // similar, and at corpus scale long chains of marginal pairs quietly
  // merge genuinely distinct documents into one survivor (the known
  // failure mode of union-find dedup that SemDeDup/verification stages
  // exist to counter). This report quantifies it per cluster: edge
  // support (how many of the n(n-1)/2 member pairs q14 actually
  // verified), density, and the weakest verified edge. Density 1000 =
  // clique (every merge directly evidenced); low density on a large
  // cluster = chain — exactly the clusters a reviewer re-verifies
  // (q124's edit verdict) before trusting q74's survivorship.
  // -------------------------------------------------------------------

  /** q146: per-cluster edge support over q49's exact machinery: the
    * edge set IS q14's verified pair list (banded candidates, exact
    * Jaccard >= threshold) and the clusters ARE starComponents over it,
    * so the audit measures precisely the graph survivorship acted on.
    * An absent edge means "q14 did not verify this member pair" —
    * either truly dissimilar (chaining) or an LSH banding miss; both
    * are unsupported merges, which is what the audit counts.
    *
    * Scale shape: edges and labels are the q14/q49 plans unchanged;
    * the audit itself is two keyed aggs over the answer-sized edge and
    * label relations (a pair's cluster is its doc_a endpoint's label —
    * both endpoints share it by construction) plus a broadcast-sized
    * join of the two per-cluster frames. Integer columns throughout
    * (edge strength as inter*1000 div uni permille). */
  def clusterCohesion(spark: SparkSession, sfDir: String,
                      bits: Int = DefaultHashBits,
                      bandCap: Option[Int] = None): DataFrame = {
    val pairs = Materialize.shared(spark,
      candidateOverlap(spark, sfDir, bits, bandCap)
        .filter(col("inter").cast("double") / col("uni").cast("double")
          >= Consts.MinhashJaccardThreshold)
        .withColumn("jacc_permille", expr("inter * 1000 div uni"))
        .select(col("doc_a"), col("doc_b"), col("jacc_permille")))
    clusterCohesionWith(pairs,
      starComponents(pairs.select(col("doc_a"), col("doc_b"))))
  }

  /** q146 over an external (doc_a, doc_b, jacc_permille) verified pair
    * relation + its PAIR-graph component labels (the persisted-graph
    * serving seam — the artifact keeps inter/uni so jacc_permille is
    * the same exact integer division). */
  private[graft] def clusterCohesionWith(pairs: DataFrame,
                                         labels: DataFrame): DataFrame = {
    val members = labels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    val edges = pairs
      .join(labels.select(col("node").as("doc_a"), col("label").as("cluster_id")), "doc_a")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_edges"),
        min(col("jacc_permille")).as("min_edge_permille"))
    members.join(edges, Seq("cluster_id"))
      .withColumn("n_possible", expr("n_members * (n_members - 1) div 2"))
      .withColumn("density_permille", expr("n_edges * 1000 div n_possible"))
      .select("cluster_id", "n_members", "n_edges", "n_possible",
        "density_permille", "min_edge_permille")
      .orderBy("cluster_id")
  }

  def clusterCohesionSql: String =
    s"""WITH RECURSIVE $sqlCandCtes,
       |pairs AS (
       |  -- DISTINCT is load-bearing: under a RECURSIVE with-clause
       |  -- DuckDB does not collapse the multi-arm UNION inside cand,
       |  -- so a pair agreeing on two bands arrives twice and would
       |  -- double-count n_edges (measured; plain-WITH q14 dedups fine)
       |  SELECT DISTINCT doc_a, doc_b,
       |    cast(len(list_intersect(sa.s, sb.s)) as bigint) * 1000
       |      // cast(len(list_distinct(sa.s || sb.s)) as bigint) AS jacc_permille
       |  FROM cand
       |  JOIN sets sa ON doc_a = sa.doc_id
       |  JOIN sets sb ON doc_b = sb.doc_id
       |  WHERE cast(len(list_intersect(sa.s, sb.s)) as double)
       |      / cast(len(list_distinct(sa.s || sb.s)) as double) >= ${Consts.MinhashJaccardThreshold}),
       |sym AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach AS (
       |  SELECT src AS doc_id, src AS label FROM sym
       |  UNION
       |  SELECT e.dst AS doc_id, r.label FROM reach r JOIN sym e ON e.src = r.doc_id),
       |lab AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id),
       |members AS (SELECT cluster_id, cast(count(*) as bigint) AS n_members FROM lab GROUP BY cluster_id),
       |eg AS (
       |  SELECT l.cluster_id, cast(count(*) as bigint) AS n_edges,
       |    cast(min(jacc_permille) as bigint) AS min_edge_permille
       |  FROM pairs p JOIN lab l ON p.doc_a = l.doc_id GROUP BY l.cluster_id)
       |SELECT m.cluster_id, n_members, n_edges,
       |  n_members * (n_members - 1) // 2 AS n_possible,
       |  n_edges * 1000 // (n_members * (n_members - 1) // 2) AS density_permille,
       |  min_edge_permille
       |FROM members m JOIN eg USING (cluster_id)
       |ORDER BY cluster_id""".stripMargin

  // -------------------------------------------------------------------
  // q155: multi-signal consensus dedup graph — production dedup does
  // not trust one detector: MinHash (bag similarity), exact shared
  // runs (sequence identity), and winnowing fingerprints (local
  // selection) each catch families the others miss, and a merge
  // supported by two or three independent signals is a different
  // decision than one supported by a single marginal band collision.
  // This operator unions the three pair relations into ONE edge set
  // tagged with provenance, resolves components once, and reports per
  // cluster how much of its edge mass each signal contributed plus the
  // maximum per-edge agreement — the q146 cohesion discipline extended
  // from "how many edges" to "how many DETECTORS per edge".
  // -------------------------------------------------------------------

  /** q155: per-cluster report over the consensus graph:
    * `n_members`, per-signal edge counts, `n_edges` (distinct pairs),
    * and `max_agreement` (most detectors agreeing on one pair, 1-3).
    * Clusters whose every edge has agreement 1 are single-signal
    * merges — the review queue; agreement-3 edges are
    * beyond-reasonable-doubt duplicates.
    *
    * Scale shape: each signal's pair list arrives answer-sized from
    * its own banded/inverted-index plan (q14/q145/q128 unchanged);
    * the union is answer-sized, components run once over it
    * (starComponents — the q49 machinery), and the report is two
    * keyed aggs on the edge relation. */
  def consensusClusters(spark: SparkSession, sfDir: String,
                        bits: Int = DefaultHashBits): DataFrame = {
    val mh = minhashLshPairs(spark, sfDir, bits)
      .select(col("doc_a"), col("doc_b"), lit("minhash").as("signal"))
    val runs = sharedRunPairs(spark, sfDir, bits)
      .select(col("doc_a"), col("doc_b"), lit("runs").as("signal"))
    val win = winnowPairs(spark, sfDir, bits)
      .select(col("doc_a"), col("doc_b"), lit("winnow").as("signal"))
    val edges = Materialize.shared(spark, mh.unionAll(runs).unionAll(win))
    consensusReport(edges, starComponents(edges.select("doc_a", "doc_b").distinct()))
  }

  /** The q155 report over any tagged edge relation + its component
    * labels — the seam the inline recompute and the persisted-graph
    * serving path share, so the consensus verdicts cannot drift
    * between the two. `labels` must cover every node of `edges`
    * (starComponents over the same distinct pair set guarantees it). */
  private[graft] def consensusReport(edges: DataFrame, labels: DataFrame): DataFrame = {
    val tagged = edges
      .join(labels.select(col("node").as("doc_a"), col("label").as("cluster_id")), "doc_a")
    val perPair = tagged.groupBy("cluster_id", "doc_a", "doc_b")
      .agg(count(lit(1)).as("agreement"))
    val pairStats = perPair.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_edges"), max(col("agreement")).as("max_agreement"))
    val sigStats = tagged.groupBy("cluster_id")
      .agg(
        sum(when(col("signal") === "minhash", 1L).otherwise(0L)).as("minhash_edges"),
        sum(when(col("signal") === "runs", 1L).otherwise(0L)).as("run_edges"),
        sum(when(col("signal") === "winnow", 1L).otherwise(0L)).as("winnow_edges"))
    val members = labels.groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    members.join(pairStats, Seq("cluster_id")).join(sigStats, Seq("cluster_id"))
      .select("cluster_id", "n_members", "n_edges", "minhash_edges",
        "run_edges", "winnow_edges", "max_agreement")
      .orderBy("cluster_id")
  }

  def consensusClustersSql: String =
    s"""WITH RECURSIVE mh AS (SELECT doc_a, doc_b FROM ($minhashLshPairsSql)),
       |runs0 AS (SELECT doc_a, doc_b FROM ($sharedRunPairsSql)),
       |win0 AS (SELECT doc_a, doc_b FROM ($winnowPairsSql)),
       |edges AS (
       |  SELECT doc_a, doc_b, 'minhash' AS signal FROM mh
       |  UNION ALL SELECT doc_a, doc_b, 'runs' FROM runs0
       |  UNION ALL SELECT doc_a, doc_b, 'winnow' FROM win0),
       |sym AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM edges
       |  UNION ALL SELECT doc_b, doc_a FROM edges),
       |reach AS (
       |  SELECT src AS doc_id, src AS label FROM sym
       |  UNION
       |  SELECT e.dst AS doc_id, r.label FROM reach r JOIN sym e ON e.src = r.doc_id),
       |lab AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id),
       |tagged AS (
       |  SELECT l.cluster_id, doc_a, doc_b, signal
       |  FROM edges JOIN lab l ON edges.doc_a = l.doc_id),
       |per_pair AS (
       |  SELECT cluster_id, doc_a, doc_b, cast(count(*) as bigint) AS agreement
       |  FROM tagged GROUP BY cluster_id, doc_a, doc_b),
       |pair_stats AS (
       |  SELECT cluster_id, cast(count(*) as bigint) AS n_edges,
       |    cast(max(agreement) as bigint) AS max_agreement
       |  FROM per_pair GROUP BY cluster_id),
       |sig_stats AS (
       |  SELECT cluster_id,
       |    cast(sum(CASE WHEN signal = 'minhash' THEN 1 ELSE 0 END) as bigint) AS minhash_edges,
       |    cast(sum(CASE WHEN signal = 'runs' THEN 1 ELSE 0 END) as bigint) AS run_edges,
       |    cast(sum(CASE WHEN signal = 'winnow' THEN 1 ELSE 0 END) as bigint) AS winnow_edges
       |  FROM tagged GROUP BY cluster_id),
       |members AS (SELECT cluster_id, cast(count(*) as bigint) AS n_members FROM lab GROUP BY cluster_id)
       |SELECT m.cluster_id, n_members, n_edges, minhash_edges, run_edges, winnow_edges, max_agreement
       |FROM members m JOIN pair_stats USING (cluster_id) JOIN sig_stats USING (cluster_id)
       |ORDER BY cluster_id""".stripMargin

  // -------------------------------------------------------------------
  // q158: deterministic random walks over the near-dup graph — the
  // DeepWalk/node2vec data-prep step (Perozzi et al. 2014): walks are
  // the "sentences" a skip-gram model trains on to embed graph
  // structure, and over THIS graph they embed duplication topology
  // (which documents sit in which template neighborhood — input to
  // cluster-aware curriculum or contrastive sampling). Randomness is
  // the usual cross-engine poison, so the walker draws each step from
  // a HASH of (start, current, step) — deterministic, portable,
  // restart-stable, the q97 corruption-mask discipline applied to
  // graph traversal (and the same trick production walk engines use
  // for reproducible epochs).
  // -------------------------------------------------------------------

  /** walk length (steps beyond the start node). */
  val WalkSteps = 4

  /** q158: (start, step, node) rows, one walk per pair-graph node,
    * step 0..[[WalkSteps]]. Next hop = sorted-neighbor index
    * H(start|cur|step) mod degree, H the family's 32-bit md5 fold —
    * every engine (and every re-run) derives the identical corpus of
    * walks.
    *
    * Scale shape: the adjacency relation is answer-sized (the verified
    * pair list, symmetric, with a per-node row_number); each step is
    * one equi-join of the walk frontier against it (no driver state,
    * no loop-carried lineage growth at this fixed unrolled depth); a
    * node's neighbor pick is O(1) through the (node, idx) key. */
  def dupGraphWalks(spark: SparkSession, sfDir: String,
                    bits: Int = DefaultHashBits): DataFrame =
    walksOverPairs(spark, minhashLshPairs(spark, sfDir, bits).select("doc_a", "doc_b"))

  /** The q158 walker over any (doc_a, doc_b) pair relation — the seam
    * the inline recompute and the persisted-graph serving path share.
    * Every step is hash-derived from (start, cur, step), so the walk
    * corpus depends only on the pair SET, never on row order or which
    * engine materialized it. (Measured: the per-step checkpoint
    * barriers stay ON even for the cheap artifact-scan source — the
    * step cost is per-plan codegen/scheduling floor, not source
    * re-execution, and un-checkpointed branch re-runs measured
    * slightly slower at sf0.1.) */
  private[graft] def walksOverPairs(spark: SparkSession, pairs: DataFrame): DataFrame = {
    // ONE cached relation: node → ascending neighbor list. Replaces the
    // round-14 three-frame form (sym + row_number-ranked adj + deg):
    // element_at(nbrs, H mod size(nbrs) + 1) over the sorted array IS
    // the sorted-neighbor-index hop the ranked row table encoded, so
    // each step is ONE equi-join on `cur` instead of a deg join + a
    // (cur, idx) point join, the ranking window and its exchange
    // disappear, and the eager-materialization count jobs drop 3 → 1
    // (guide §2.4: same answer, fewer exchanges/passes). Multiplicity
    // is preserved (sort_array over collect_list, not collect_set), so
    // a duplicated edge still widens the hash-index range exactly as
    // the row_number form did. Per-node arrays are degree-bounded —
    // the same per-key footprint the ranking window's partitions had.
    val sym = pairs.unionAll(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("node", "nbr")
    val adj = Materialize.shared(spark,
      sym.groupBy("node").agg(sort_array(collect_list(col("nbr"))).as("nbrs")))
    val hopH = shingleHashExpr("instr",
      "md5(concat(cast(start as string), '|', cast(cur as string), '|', cast(step as string)))")
    var frontier = adj.select(col("node").as("start"))
      .select(col("start"), col("start").as("cur"), lit(0L).as("step"))
    var out = frontier
    (1 to WalkSteps).foreach { t =>
      // each step re-roots at a flat checkpointed frame (the q93/CC
      // loop discipline): the union of w0..wT would otherwise inline
      // w1's join lineage T times and re-execute it per branch —
      // measured 4.9 s → ~1 s at sf0.1 for a 470-node graph
      val stepped = Materialize.tracked(spark, frontier
        .withColumn("step", lit(t.toLong))
        .join(adj.withColumnRenamed("node", "cur"), "cur")
        .select(col("start"),
          element_at(col("nbrs"),
            (expr(s"$hopH % size(nbrs)") + lit(1)).cast("int")).as("cur"),
          col("step"))
        .localCheckpoint(true))
      out = out.unionAll(stepped)
      frontier = stepped
    }
    out.select(col("start"), col("step"), col("cur").as("node"))
      .orderBy("start", "step")
  }

  def dupGraphWalksSql: String = {
    def hop(t: Int) = shingleHashExpr("strpos",
      s"md5(cast(start as varchar) || '|' || cast(cur as varchar) || '|' || '$t')")
    val steps = (1 to WalkSteps).map { t =>
      s"""w$t AS (
         |  SELECT w.start, adj.nbr AS cur
         |  FROM w${t - 1} w
         |  JOIN deg ON deg.node = w.cur
         |  JOIN adj ON adj.node = w.cur AND adj.idx = ${hop(t)} % deg.deg)""".stripMargin
    }.mkString(",\n")
    val sel = (0 to WalkSteps).map { t =>
      s"SELECT start, cast($t as bigint) AS step, cur AS node FROM w$t"
    }.mkString("\nUNION ALL\n")
    s"""WITH pairs0 AS (SELECT doc_a, doc_b FROM ($minhashLshPairsSql)),
       |sym AS (SELECT doc_a AS node, doc_b AS nbr FROM pairs0
       |        UNION ALL SELECT doc_b, doc_a FROM pairs0),
       |adj AS (SELECT node, nbr,
       |    cast(row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 as bigint) AS idx
       |  FROM sym),
       |deg AS (SELECT node, cast(count(*) as bigint) AS deg FROM sym GROUP BY node),
       |w0 AS (SELECT DISTINCT node AS start, node AS cur FROM sym),
       |$steps
       |$sel
       |ORDER BY start, step""".stripMargin
  }

  /** q159: duplication-aware loss weights — the SOFT alternative to
    * q74's hard survivorship: instead of dropping duplicates, each
    * document in a near-dup cluster of size s trains at weight 1/s, so
    * every piece of CONTENT contributes one unit of loss mass no
    * matter how many copies the crawl collected (the down-weighting
    * variant discussed alongside SemDeDup/D4-style pruning — it keeps
    * the copies' formatting/context diversity while removing their
    * frequency advantage, and it is reversible where a drop is not).
    * Output is the per-doc table a trainer's loss actually consumes:
    * (doc_id, cluster_id, cluster_size, weight_milli), singletons at
    * 1000, cluster members at 1000 div s (a size-3 cluster sums to
    * 999 — the floor remainder is stated, not redistributed).
    *
    * Scale shape: clusters are the q49 star machinery over the
    * answer-sized verified pair list; the weight table is one left
    * join of the corpus's doc_id projection against the cluster
    * labels plus a cluster-sized size join. */
  def dupLossWeights(spark: SparkSession, sfDir: String,
                     bits: Int = DefaultHashBits): DataFrame =
    dupLossWeightsWith(spark, sfDir, starComponents(
      minhashLshPairs(spark, sfDir, bits).select("doc_a", "doc_b")))

  /** q159 over an external (node, label) component table for the
    * PAIR-ONLY graph (the persisted-graph serving seam; note q159's
    * graph is verified minhash pairs without the exact-dup arm —
    * pair_cc/, not cc/). */
  private[graft] def dupLossWeightsWith(spark: SparkSession, sfDir: String,
                                        labels: DataFrame): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val tagged = docs
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
    val sizes = tagged.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    tagged.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        expr("1000 div cluster_size").as("weight_milli"))
      .orderBy("doc_id")
  }

  def dupLossWeightsSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM (${minhashLshPairsSql}) ),
       |sym AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |reach AS (
       |  SELECT src AS doc_id, src AS label FROM sym
       |  UNION
       |  SELECT e.dst AS doc_id, r.label FROM reach r JOIN sym e ON e.src = r.doc_id),
       |lab AS (SELECT doc_id, min(label) AS label FROM reach GROUP BY doc_id),
       |tagged AS (
       |  SELECT d.doc_id, coalesce(lab.label, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
       |sizes AS (SELECT cluster_id, cast(count(*) as bigint) AS cluster_size
       |          FROM tagged GROUP BY cluster_id)
       |SELECT doc_id, cluster_id, cluster_size,
       |  1000 // cluster_size AS weight_milli
       |FROM tagged JOIN sizes USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** q152: cross-source duplication matrix — q14's VERIFIED pair list
    * rolled up to (source, source) cells: how many near-dup pairs link
    * each pair of crawls, split into within-source and cross-source
    * rows by construction (source_a <= source_b lexicographically).
    * This is the syndication report a curation team reads next to
    * q72's shingle-level overlap: q72 says two dumps share raw
    * content mass; this says how many whole DOCUMENTS the verifier
    * would actually merge across them — the difference between "these
    * crawls quote each other" and "these crawls mirror each other",
    * and the input to choosing which source survives survivorship.
    *
    * Scale shape: the pair list is answer-sized; sources attach via
    * two doc_id equi-joins against the narrow (doc_id, source)
    * projection, and the matrix is one keyed agg on the pair list.
    * Integer columns plus the exact permille share of all verified
    * pairs. */
  def crossSourceMatrix(spark: SparkSession, sfDir: String,
                        bits: Int = DefaultHashBits,
                        bandCap: Option[Int] = None): DataFrame =
    crossSourceMatrixWith(spark, sfDir,
      candidateOverlap(spark, sfDir, bits, bandCap)
        .filter(col("inter").cast("double") / col("uni").cast("double")
          >= Consts.MinhashJaccardThreshold)
        .select("doc_a", "doc_b"))

  /** q152 over an external verified (doc_a, doc_b) pair relation (the
    * persisted-graph serving seam). */
  private[graft] def crossSourceMatrixWith(spark: SparkSession, sfDir: String,
                                           pairs: DataFrame): DataFrame = {
    val srcs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val tagged = pairs
      .join(srcs.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(srcs.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
    val total = tagged.agg(count(lit(1)).as("n_total"))
    tagged.groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(total))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        (col("source_a") =!= col("source_b")).as("cross_source"),
        expr("n_pairs * 1000 div n_total").as("share_permille"))
      .orderBy("source_a", "source_b")
  }

  def crossSourceMatrixSql: String =
    s"""WITH $sqlCandCtes,
       |pairs AS (
       |  SELECT DISTINCT doc_a, doc_b
       |  FROM cand
       |  JOIN sets sa ON doc_a = sa.doc_id
       |  JOIN sets sb ON doc_b = sb.doc_id
       |  WHERE cast(len(list_intersect(sa.s, sb.s)) as double)
       |      / cast(len(list_distinct(sa.s || sb.s)) as double) >= ${Consts.MinhashJaccardThreshold}),
       |tagged AS (
       |  SELECT least(da.source, db.source) AS source_a,
       |    greatest(da.source, db.source) AS source_b
       |  FROM pairs
       |  JOIN documents da ON doc_a = da.doc_id
       |  JOIN documents db ON doc_b = db.doc_id),
       |tot AS (SELECT cast(count(*) as bigint) AS n_total FROM tagged)
       |SELECT source_a, source_b, cast(count(*) as bigint) AS n_pairs,
       |  source_a != source_b AS cross_source,
       |  cast(count(*) as bigint) * 1000 // n_total AS share_permille
       |FROM tagged, tot
       |GROUP BY source_a, source_b, n_total
       |ORDER BY source_a, source_b""".stripMargin
}
