package graft

import graft.ops.{Relational, Scale, Similarity}
import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class ScaleSpec extends SparkSpec {

  test("salted aggregation equals the plain group-by exactly") {
    val salted = Scale.saltedTypeCounts(spark, sf0001)
    val plain = graft.core.Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100).cast("long")) / lit(100.0)).as("sum_value"))
      .orderBy("event_type")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("bucketed join runs without a shuffle below the join") {
    val df = Scale.bucketedOrderRevenueFresh(spark, sf0001)
    val rows = df.collect()
    // same values as the shuffle-join formulation
    val shuffled = Relational.orderRevenueByPriority(spark, sf0001).collect()
    assert(rows.toSeq == shuffled.toSeq)
    assert(Scale.joinHasNoExchangeBelow(df),
      "expected bucketed scans to satisfy the join's distribution; plan:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("Scaling.amplified: replicas preserve structure, share none of it, and factor 1 is the identity") {
    import graft.ops.Dedup
    // StreamScratch dirs are deleted at JVM exit — repeated test runs
    // must not accumulate corpora in the system temp dir
    val tmp = java.nio.file.Paths.get(
      graft.streaming.StreamScratch.dir("graft_amp_spec"))
    def mat(f: Int): String = {
      val d = tmp.resolve(s"f$f").toString
      Scaling.amplified(spark, sf0001, f)
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val (d1, d2) = (mat(1), mat(2))
    val base = graft.core.Tables.documents(spark, sf0001)
    val n = base.count()
    // factor 1 is a byte-identical rewrite of the source corpus —
    // BOTH multiset directions, so dropped rows fail as loudly as
    // invented ones
    val d1docs = graft.core.Tables.documents(spark, d1)
      .select("doc_id", "text", "lang", "source")
    val baseDocs = base.select("doc_id", "text", "lang", "source")
    assert(d1docs.count() == n)
    assert(d1docs.exceptAll(baseDocs).count() == 0 &&
      baseDocs.exceptAll(d1docs).count() == 0)
    // row count and doc_id cardinality scale exactly (no remap collisions)
    val amp = graft.core.Tables.documents(spark, d2)
    assert(amp.count() == 2 * n && amp.select("doc_id").distinct().count() == 2 * n)
    // SCALING.md's construction claims, machine-checked. (1) EXACT
    // duplicate structure transports verbatim — word-suffixing is a
    // bijection on texts, so every hash family doubles and family
    // SIZES are untouched:
    val fams1 = Dedup.exactDedup(spark, d1)
      .groupBy("n_copies").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fams2 = Dedup.exactDedup(spark, d2)
      .groupBy("n_copies").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fams2 == fams1.map { case (k, v) => k -> 2 * v },
      s"exact-dup family histogram not doubled: $fams1 -> $fams2")
    // (2) NEAR-dup pairs never cross replicas (zero shared shingles),
    // so pair output is a per-replica sum — linear in the factor.
    // (Per-replica counts vary a little: suffixed shingles hash to new
    // minhash values, i.e. each replica draws a fresh LSH permutation;
    // that probabilistic wiggle is why the gate is a log-log slope, not
    // an exact ratio.)
    val rep = (id: org.apache.spark.sql.Column) => floor(id / lit(10000000L))
    val crossers = Dedup.minhashLshPairs(spark, d2, Dedup.OracleHashBits)
      .filter(rep(col("doc_a")) =!= rep(col("doc_b"))).count()
    assert(crossers == 0, s"$crossers LSH pairs crossed replicas")
    graft.ops.Materialize.release(spark)
  }

  test("IVF kNN neighbors carry exact similarities and bounded ranks") {
    val ivf = Similarity.ivfKnn(spark, sf0001).cache()
    assert(ivf.filter(col("rank") < 1 || col("rank") > graft.core.Consts.KnnK).count() == 0)
    // sims agree with brute force for overlapping pairs
    val bf = Similarity.knnBruteForce(spark, sf0001)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bf_sim"))
    val joined = ivf.join(bf, Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("sim") =!= col("bf_sim")).count() == 0)
    ivf.unpersist()
  }

  test("stream-stream interval join pairs errors with recent same-user clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val errors = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = EventStream.clickErrorJoinStream(
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      errors.toDF().toDF("user_id", "ts", "event_id"))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode(OutputMode.Append()).start()
    // user 1: click 5 min before the error (joins); click 20 min before
    // (outside the interval); user 2's click never joins user 1's error
    clicks.addData((1L, t("2024-01-01 10:00:00"), 100L),
      (1L, t("2024-01-01 10:15:00"), 101L),
      (2L, t("2024-01-01 10:16:00"), 102L))
    errors.addData((1L, t("2024-01-01 10:20:00"), 900L))
    q.processAllAvailable()
    val out = spark.table("ssj_test").collect()
    q.stop()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 900L, 101L)))
  }

  test("streaming dedup drops duplicate content within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "content_hash")
    val q = EventStream.dedupStream(df).writeStream
      .format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 10:00:00"), "aaa"), (t("2024-01-01 10:00:00"), "aaa"),
      (t("2024-01-01 10:01:00"), "bbb"))
    q.processAllAvailable()
    // same content again in a later batch, same event time -> still dropped
    mem.addData((t("2024-01-01 10:00:00"), "aaa"), (t("2024-01-01 10:05:00"), "ccc"))
    q.processAllAvailable()
    val out = spark.table("dedup_test").collect()
    q.stop()
    assert(out.map(_.getString(1)).sorted.toSeq == Seq("aaa", "bbb", "ccc"))
  }
}
