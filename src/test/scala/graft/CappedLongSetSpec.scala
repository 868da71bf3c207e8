package graft

import org.apache.spark.sql.functions._
import graft.functions.CappedLongSet

/** The q170 cell cap as a PHYSICAL bound: the CappedLongSet aggregate
  * must never hold more than cap+1 values in any buffer, drop over-cap
  * groups exactly, and reassemble exact sorted sets for groups within
  * the cap — including across partial/merge boundaries. */
class CappedLongSetSpec extends SparkSpec {
  import spark.implicits._

  private def agg(cap: Int) = org.apache.spark.sql.graft.Bridge.column(
    CappedLongSet(org.apache.spark.sql.graft.Bridge.expression(col("v")), cap)
      .toAggregateExpression())

  test("exact sorted set under the cap, NULL over it — across many partitions") {
    // group 1: 3 distinct (under cap 4); group 2: exactly 4 (at cap);
    // group 3: 5 distinct (over cap -> NULL); heavy duplication so
    // partial buffers see repeats; 8 partitions so merge() runs
    val rows = (1 to 200).flatMap { i =>
      Seq((1L, (i % 3).toLong), (2L, (i % 4).toLong), (3L, (i % 5).toLong))
    }
    val df = rows.toDF("g", "v").repartition(8)
      .groupBy("g").agg(agg(4).as("s"))
    val out = df.collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out(1L).contains(Seq(0L, 1L, 2L)))
    assert(out(2L).contains(Seq(0L, 1L, 2L, 3L)))
    assert(out(3L).isEmpty, "over-cap group must evaluate to NULL")
  }

  test("buffer size is bounded by cap+1 even for a viral group") {
    val a = CappedLongSet(org.apache.spark.sql.graft.Bridge.expression(col("v")), 8)
    val buf = a.createAggregationBuffer()
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    // feed 10k distinct values through update: the buffer must stop
    // absorbing at cap+1 = 9
    val probe = CappedLongSet(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = false), 8)
    (0 until 10000).foreach { i => row.update(0, i.toLong); probe.update(buf, row) }
    assert(buf.size() == 9, s"buffer grew to ${buf.size()}")
    assert(probe.eval(buf) == null)
    // merge of two saturated buffers stays bounded
    val buf2 = probe.deserialize(probe.serialize(buf))
    val merged = probe.merge(buf, buf2)
    assert(merged.size() <= 9)
  }

  test("merge reassembles an exact set when the true distinct count is under the cap") {
    val probe = CappedLongSet(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = false), 10)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    val b1 = probe.createAggregationBuffer()
    val b2 = probe.createAggregationBuffer()
    Seq(5L, 1L, 9L).foreach { v => row.update(0, v); probe.update(b1, row) }
    Seq(9L, 3L, 5L).foreach { v => row.update(0, v); probe.update(b2, row) }
    val m = probe.merge(b1, probe.deserialize(probe.serialize(b2)))
    val out = probe.eval(m)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(out.toSeq == Seq(1L, 3L, 5L, 9L))
  }
}
