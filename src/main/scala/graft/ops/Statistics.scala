package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Statistics + string-distance operators.
  *
  * Correlation is computed from EXACT integer moments (scaled sums of
  * x, y, xy, x2, y2 as int64) with the Pearson formula applied once in
  * doubles at the end — engine-portable, unlike built-in corr(), whose
  * accumulation order varies. Levenshtein is integer-exact in both
  * engines, making edit-distance blocking oracle-checkable.
  */
object Statistics {

  /** Pearson correlation of quantity vs extended price per return flag,
    * from exact integer moments over floor-to-integer values (prices up
    * to ~1e5 squared and summed over 6e5 rows stay far inside i64;
    * a cent-scale would overflow the y^2 moment at sf >= 0.1). */
  def quantityPriceCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("long").as("x"),
        floor(col("l_extendedprice")).cast("long").as("y"))
    val m = l.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val cov = n * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val vx = n * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val vy = n * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    m.select(col("l_returnflag"), col("n"),
        (cov / (sqrt(vx) * sqrt(vy))).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  def quantityPriceCorrSql: String =
    """SELECT l_returnflag, n,
      |  (cast(n as double) * cast(sxy as double) - cast(sx as double) * cast(sy as double))
      |    / (sqrt(cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double))
      |       * sqrt(cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))) AS corr_qty_price
      |FROM (
      |  SELECT l_returnflag, count(*) AS n,
      |    cast(sum(x) as bigint) AS sx, cast(sum(y) as bigint) AS sy,
      |    cast(sum(x*y) as bigint) AS sxy,
      |    cast(sum(x*x) as bigint) AS sxx, cast(sum(y*y) as bigint) AS syy
      |  FROM (SELECT l_returnflag,
      |          cast(floor(l_quantity) as bigint) AS x,
      |          cast(floor(l_extendedprice) as bigint) AS y
      |        FROM lineitem)
      |  GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  /** Edit-distance near-dup blocking over part names: pairs within the
    * same (brand, size) block with levenshtein <= threshold. The
    * blocked self-join is the standard fuzzy-dedup shape — quadratic
    * cost per block, never global; the two-attribute key keeps blocks
    * small (brand alone made q48 8M levenshtein pairs at sf0.1). */
  val EditDistanceMax = 10

  def partNameNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select("p_partkey", "p_brand", "p_size", "p_name")
    val a = p.alias("a"); val b = p.alias("b")
    a.join(b,
        col("a.p_brand") === col("b.p_brand") &&
        col("a.p_size") === col("b.p_size") &&
        col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("dist",
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long"))
      .filter(col("dist") <= EditDistanceMax)
      .groupBy(col("a.p_brand").as("p_brand"))
      .agg(count(lit(1)).as("n_near_dup_pairs"), min(col("dist")).as("min_dist"))
      .orderBy("p_brand")
  }

  def partNameNearDupSql: String =
    s"""SELECT p_brand, count(*) AS n_near_dup_pairs, min(dist) AS min_dist
       |FROM (
       |  SELECT a.p_brand AS p_brand,
       |    cast(levenshtein(a.p_name, b.p_name) as bigint) AS dist
       |  FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey)
       |WHERE dist <= $EditDistanceMax
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin
}
