package graft

import graft.ops.Events
import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventsStreamingSpec extends SparkSpec {

  test("hourly windows partition all events exactly once") {
    val w = Events.hourlyTypeCounts(spark, sf0001)
    val total = w.agg(sum("n")).collect()(0).getLong(0)
    val events = graft.core.Tables.events(spark, sf0001).count()
    assert(total == events)
    // window starts are hour-aligned
    assert(w.filter(col("window_start_us") % (3600L * 1000000L) =!= 0).count() == 0)
  }

  test("sliding windows count each event exactly 4 times") {
    val s = Events.slidingWindowCounts(spark, sf0001)
    val total = s.agg(sum("n")).collect()(0).getLong(0)
    val events = graft.core.Tables.events(spark, sf0001).count()
    assert(total == events * 4)
  }

  test("sessionization: gaps within a session never exceed 30 minutes") {
    val sess = Events.sessionize(spark, sf0001)
    // sessions of one user never overlap and are ordered
    val viol = sess.alias("a").join(sess.alias("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.session_id") + 1 === col("b.session_id"))
      .filter(col("b.session_start_us") - col("a.session_end_us") <= 30L * 60L * 1000000L)
      .count()
    assert(viol == 0, "consecutive sessions closer than the gap threshold")
    val events = graft.core.Tables.events(spark, sf0001).count()
    assert(sess.agg(sum("n_events")).collect()(0).getLong(0) == events)
  }

  test("as-of join: matched error is at or before the click") {
    val df = Events.clickErrorAsOf(spark, sf0001)
    assert(df.filter(col("err_id") =!= -1 && col("gap_us") < 0).count() == 0)
    val clicks = graft.core.Tables.events(spark, sf0001)
      .filter(col("event_type") === "click").count()
    assert(df.count() == clicks)
  }

  test("streaming windowed agg equals the batch result") {
    val streamed = EventStream.hourlyTypeCountsStream(spark, sf0001)
    val batch = Events.hourlyTypeCounts(spark, sf0001)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("watermarked append-mode windows emit finalized windows via MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventStream.withWatermarkedWindows(df)
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append()).start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: events in hour 10; batch 2: watermark jumps past hour 12
    mem.addData((t("2024-01-01 10:00:01"), "click", 1.0),
                (t("2024-01-01 10:30:00"), "click", 2.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 15:00:00"), "view", 1.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-01 18:00:00"), "view", 1.0))
    q.processAllAvailable()
    val out = spark.table("wm_test").collect()
    q.stop()
    // the hour-10 window is finalized once the watermark passes it
    assert(out.exists(r => r.getAs[Long]("n") == 2 && r.getAs[String]("event_type") == "click"))
  }

  test("streaming near-dup suppression equals the batch simhash pair relation") {
    import spark.implicits._
    import graft.streaming.DedupStream
    implicit val sqlCtx = spark.sqlContext
    // batch ground truth: doc_b of every pair is "the later duplicate"
    val pairs = graft.ops.Dedup.simhashPairs(spark, sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expectFlagged = pairs.map(_._2).toSet
    val pairSet = pairs.toSet
    // the map-side kernel must agree with the batch aggregate bit-for-bit
    val batchSigs = graft.ops.Dedup.simhash(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => DedupStream.Doc(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id)
    docs.take(50).foreach(d =>
      assert(DedupStream.simhash16(d.text) == batchSigs(d.doc_id),
        s"kernel mismatch for doc ${d.doc_id}"))
    // replay in TWO batches (split by doc id) — arrival order = id order
    val mem = MemoryStream[DedupStream.Doc]
    val out = DedupStream.nearDupStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("neardup_stream")
      .outputMode(OutputMode.Append()).start()
    val (first, second) = docs.splitAt(docs.length / 2)
    mem.addData(first.toSeq); q.processAllAvailable()
    mem.addData(second.toSeq); q.processAllAvailable()
    val rows = spark.table("neardup_stream").collect()
    q.stop()
    val flagged = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(flagged == expectFlagged,
      s"missing=${(expectFlagged -- flagged).take(5)} extra=${(flagged -- expectFlagged).take(5)}")
    // every detection is a genuine qualifying pair with an earlier doc
    rows.foreach { r =>
      val (d, of) = (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))
      assert(of < d, s"dup_of must be earlier under id-ordered arrival: $of vs $d")
      assert(pairSet.contains((of, d)), s"($of, $d) is not a batch pair")
      assert(r.getAs[Int]("hamming") <= graft.core.Consts.SimhashMaxHamming)
    }
  }

  test("stateful sessionizeStream closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Ev]
    val out = EventStream.sessionizeStream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("sess_test")
      .outputMode(OutputMode.Append()).start()
    val us = 1000000L
    mem.addData(EventStream.Ev(1L, 0L, 1.0), EventStream.Ev(1L, 60L * us, 2.0))
    q.processAllAvailable()
    // gap of 2 hours closes the first session
    mem.addData(EventStream.Ev(1L, 7200L * us, 5.0))
    q.processAllAvailable()
    val rows = spark.table("sess_test").collect()
    q.stop()
    assert(rows.length == 1)
    val s = rows(0)
    assert(s.getAs[Long]("n_events") == 2 && s.getAs[Double]("sum_value") == 3.0)
  }

  test("streaming anomaly monitor equals the batch q90 (frozen moments over the replayed state)") {
    val batch = graft.ops.Events.anomalyWindows(spark, sf0001).collect()
    val stream = EventStream.anomalyWindowsStream(spark, sf0001).collect()
    assert(stream.length == batch.length && batch.nonEmpty)
    batch.zip(stream).foreach { case (b, st) =>
      assert(b.getString(0) == st.getString(0) && b.getLong(1) == st.getLong(1) &&
        b.getLong(2) == st.getLong(2) && b.getLong(3) == st.getLong(3) &&
        b.getDouble(4) == st.getDouble(4),
        s"row drift: $b vs $st")
    }
  }
}
