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
  * Exactness at scale: the raw sums accumulate in decimal(38,0) on the
  * Spark side — a wrapping i64 Σx² silently zeroes the variance of
  * exactly the LARGEST groups (1e11 docs × (1e5 chars)² ≈ 1e21 ≫ 2⁶³)
  * while DuckDB's sum(bigint) → HUGEINT stays exact, an engine
  * divergence with no error anywhere. Both engines then round the SAME
  * exact integer through cast-to-double before the floor, so the grid
  * stays bit-identical at any corpus size. (The PER-ROW square must
  * still fit i64 — true for char counts and the 1e-6 quantization grid,
  * |x| ≤ ~3e9; it is the cross-row SUM that overflows at corpus scale.)
  */
object FloorGrid {

  /** Per-group (n, mu, vr) over `x`, grouped by `groupCols`. */
  def moments(df: DataFrame, groupCols: Seq[Column], x: Column): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        sum(x.cast("decimal(38,0)")).as("s"),
        sum((x * x).cast("decimal(38,0)")).as("ss"))
      .withColumn("mu", expr("cast(floor(cast(s as double) / n) as bigint)"))
      .withColumn("m2", expr("cast(floor(cast(ss as double) / n) as bigint)"))
      .withColumn("vr", col("m2") - col("mu") * col("mu"))
      .drop("s", "ss", "m2")

  /** DuckDB twin: SELECT group, n, mu, vr FROM (src). `group` is a
    * column name in `src`; `x` an expression over its columns. */
  def sqlMoments(src: String, group: String, x: String): String =
    s"""SELECT $group, n, mu, m2 - mu*mu AS vr FROM (
       |  SELECT $group, cast(count(*) as bigint) AS n,
       |    cast(floor(cast(sum($x) as double) / count(*)) as bigint) AS mu,
       |    cast(floor(cast(sum(($x)*($x)) as double) / count(*)) as bigint) AS m2
       |  FROM ($src) GROUP BY $group)""".stripMargin
}
