package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The floor-grid first/second-moment kernel shared by the per-group
  * variance consumers (q173 embedding outliers, q183 Neyman
  * allocation): mu = floor(s/n), m2 = floor(ss/n), vr = m2 − mu² —
  * floor interplay can make a near-constant group's vr 0 or slightly
  * negative; consumers treat vr ≤ 0 as "no signal BY RULE".
  *
  * ONE definition per engine (the core.Hash32 / splitOf discipline):
  * the grid rule is correctness-critical and must not drift
  * copy-by-copy between its consumers' Spark and DuckDB twins.
  *
  * Exactness at scale, end-to-end INTEGER: the raw sums accumulate in
  * decimal(38,0) on the Spark side — a wrapping i64 Σx² silently
  * zeroes the variance of exactly the LARGEST groups (1e11 docs ×
  * (1e5 chars)² ≈ 1e21 ≫ 2⁶³) while DuckDB's sum(bigint) → HUGEINT
  * stays exact — and mu/m2 come from exact integer division, NEVER a
  * double: past 2⁵³ a double division loses low bits even when
  * correctly rounded, and DuckDB's HUGEINT→DOUBLE cast is measurably
  * NOT correctly rounded (probed: composed upper·2⁶⁴ + lower
  * conversion double-rounds on ~0.2% of values from ~2⁷⁰ up — inside
  * the regime this kernel exists for). Both engines truncate integer
  * division toward zero (Spark `div`, DuckDB `//`), so floor semantics
  * for possibly-negative first moments come from an explicit
  * remainder adjustment. (The PER-ROW square must still fit i64 —
  * true for char counts and the 1e-6 quantization grid, |x| ≤ ~3e9;
  * it is the cross-row SUM that overflows at corpus scale.)
  */
object FloorGrid {

  /** Per-group (n, mu, m2, vr) over `x`, grouped by `groupCols`. `m2`
    * (the raw floored second moment) rides along for consumers that
    * fold moments further (q147 anisotropy sums m2 across dims). */
  def moments(df: DataFrame, groupCols: Seq[Column], x: Column): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        sum(x.cast("decimal(38,0)")).as("s"),
        sum((x * x).cast("decimal(38,0)")).as("ss"))
      // floor(s/n) from truncating div: adjust when s < 0 with remainder
      .withColumn("mu", expr(
        "cast(s div n as bigint) - CASE WHEN s % n != 0 AND s < 0 THEN 1 ELSE 0 END"))
      .withColumn("m2", expr("cast(ss div n as bigint)"))
      .withColumn("vr", col("m2") - col("mu") * col("mu"))
      .drop("s", "ss")

  /** DuckDB twin: SELECT group, n, mu, m2, vr FROM (src). `group` is a
    * column name in `src`; `x` an expression over its columns. */
  def sqlMoments(src: String, group: String, x: String): String =
    s"""SELECT $group, n, mu, m2, m2 - mu*mu AS vr FROM (
       |  SELECT $group, n,
       |    cast((s // n) - CASE WHEN s % n != 0 AND s < 0 THEN 1 ELSE 0 END as bigint) AS mu,
       |    cast(ss // n as bigint) AS m2
       |  FROM (SELECT $group, cast(count(*) as bigint) AS n,
       |          sum($x) AS s, sum(($x)*($x)) AS ss
       |        FROM ($src) GROUP BY $group))""".stripMargin

  /** First-moment-only arm: per-group (n, <as> = floor(Σx / n)) with
    * the same exact-integer discipline (decimal(38,0) sum, truncating
    * div + negative-remainder adjustment). For consumers that fold a
    * centroid coordinate but never need a variance (q132 label
    * centroids), where carrying Σx² would double the aggregation state
    * of the widest shuffle for nothing. */
  def floorMean(df: DataFrame, groupCols: Seq[Column], x: Column,
                as: String): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"), sum(x.cast("decimal(38,0)")).as("s"))
      .withColumn(as, expr(
        "cast(s div n as bigint) - CASE WHEN s % n != 0 AND s < 0 THEN 1 ELSE 0 END"))
      .drop("s")

  /** DuckDB twin of [[floorMean]]: SELECT group, n, <as> FROM (src). */
  def sqlFloorMean(src: String, group: String, x: String, as: String): String =
    s"""SELECT $group, n,
       |  cast((s // n) - CASE WHEN s % n != 0 AND s < 0 THEN 1 ELSE 0 END as bigint) AS $as
       |FROM (SELECT $group, cast(count(*) as bigint) AS n, sum($x) AS s
       |      FROM ($src) GROUP BY $group)""".stripMargin
}
