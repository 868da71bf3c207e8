package graft

import org.apache.spark.sql.SparkSession

/** Adaptive-query-execution parity sweep (VERDICT r5 item 2).
  *
  * A real 100-TB deployment runs with AQE on — runtime partition
  * coalescing, skew-join splitting (the runtime backstop for the
  * bandCap hot-bucket guard), and dynamic join-strategy switches all
  * re-plan mid-query. Spark has defaulted `spark.sql.adaptive.enabled`
  * to true since 3.2, so the bench/test sessions already execute
  * adaptively; what could still rot unnoticed is the OTHER direction —
  * a query whose result silently depends on the adaptive re-plan (e.g.
  * a double-sum whose order shifts with coalesced partition counts, or
  * an ordering assumption that only holds under one join strategy).
  *
  * This sweep runs EVERY declared query twice against the same
  * SparkContext: once with AQE fully off (the static plans the plan
  * audits inspect), once with AQE on plus `forceOptimizeSkewedJoin`
  * (so the skew-split machinery exercises even at spec scale), and
  * asserts row-identical results. That pins the engine's documented
  * invariant: results are a function of the logical plan, never of the
  * runtime re-plan.
  */
class AqeParitySpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  test("all declared queries return identical rows with AQE off and AQE on (skew-join split forced)") {
    val off = spark.newSession()
    off.conf.set("spark.sql.adaptive.enabled", "false")
    val on = spark.newSession()
    on.conf.set("spark.sql.adaptive.enabled", "true")
    // force the skew-join split path even though spec-scale partitions
    // are far below the size thresholds that normally trigger it
    on.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

    val ordered = SparkEntry.queries.toSeq.sortBy { case (name, _) =>
      name.stripPrefix("q").takeWhile(_.isDigit).toInt
    }
    val diffs = ordered.flatMap { case (name, fn) =>
      val a = canon(fn(off, sf0001))
      // the frozen admission corpus is JVM-lifetime state — drop it so
      // the AQE-on pass re-runs the freeze pipeline under AQE instead
      // of joining blocks the off pass built
      graft.ops.Dedup.resetFrozenCorpusCache()
      val b = canon(fn(on, sf0001))
      // free the per-query shared caches (both sessions) so the sweep
      // holds at most one query's summaries at a time
      graft.ops.Materialize.release(off)
      graft.ops.Materialize.release(on)
      graft.ops.Dedup.resetFrozenCorpusCache()
      if (a == b) None else Some(name)
    }
    assert(diffs.isEmpty, s"AQE changed results for: ${diffs.mkString(", ")}")
  }
}
