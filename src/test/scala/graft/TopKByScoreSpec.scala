package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TopKByScore

/** TopKByScore must equal the `row_number() OVER (ORDER BY score DESC,
  * value ASC) <= K` window it replaces in q170 — including across
  * partial/merge boundaries — while every buffer stays physically
  * bounded at K entries. */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  private def agg(k: Int) = org.apache.spark.sql.graft.Bridge.column(
    TopKByScore(
      org.apache.spark.sql.graft.Bridge.expression(col("v")),
      org.apache.spark.sql.graft.Bridge.expression(col("s")),
      k).toAggregateExpression())

  test("equals the row_number window on seeded random groups, in rank order") {
    val rnd = new scala.util.Random(13)
    // many groups, scores with deliberate ties so the value tiebreak
    // decides; 8 partitions so merge() runs
    val rows = (1 to 5000).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(8).toLong)
    }.distinct // distinct (g, v) pairs like q170's pair frame
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val df = rows.toDF("g", "v", "s").repartition(8)
    for (k <- Seq(1, 3, 8)) {
      val got = df.groupBy("g").agg(agg(k).as("vs"))
        .select(col("g"), posexplode(col("vs")).as(Seq("rk", "v")))
        .collect().map(r => (r.getLong(0), r.getInt(1).toLong + 1, r.getLong(2))).toSet
      val want = df.withColumn("rk", row_number().over(
          Window.partitionBy("g").orderBy(col("s").desc, col("v").asc)))
        .filter(col("rk") <= k)
        .select("g", "rk", "v")
        .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSet
      assert(got == want, s"k=$k drift vs the window form")
    }
  }

  test("buffer never exceeds k entries; merge is exact and rank-ordered") {
    val probe = TopKByScore(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.LongType, nullable = false), 4)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    val b1 = probe.createAggregationBuffer()
    (0 until 10000).foreach { i =>
      row.update(0, i.toLong); row.update(1, (i % 100).toLong)
      probe.update(b1, row)
    }
    assert(b1.n == 4)
    // top by (score desc, value asc): score 99 first seen at values 99,
    // 199, 299, 399
    assert(probe.eval(b1)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == Seq(99L, 199L, 299L, 399L))
    // a serialize/deserialize round-trip then merge with a buffer whose
    // entries interleave: result is the global top-4
    val b2 = probe.createAggregationBuffer()
    Seq((7L, 100L), (8L, 99L), (9L, 98L)).foreach { case (v, s) =>
      row.update(0, v); row.update(1, s); probe.update(b2, row)
    }
    val m = probe.merge(probe.deserialize(probe.serialize(b1)), b2)
    assert(probe.eval(m)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == Seq(7L, 8L, 99L, 199L))
  }
}
