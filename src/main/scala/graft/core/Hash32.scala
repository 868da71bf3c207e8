package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The cross-engine portable 32-bit hash the sampling / split /
  * checksum operators share: the first 8 hex nibbles of an md5,
  * folded into a bigint by per-nibble table lookup — evaluable
  * identically as a Spark Column (`instr`) and a DuckDB expression
  * (`strpos`). ONE definition for both engines and all call sites, so
  * the construction cannot drift copy-by-copy (it is correctness-
  * critical: every hash-bucketed split and checksum oracle depends on
  * the two sides agreeing bit-for-bit). */
object Hash32 {

  /** Spark side. `md5Expr` is a Spark SQL expression yielding the md5
    * hex string, e.g. "md5(cast(doc_id as string))". */
  def column(md5Expr: String): Column =
    (0 until 8).map { j =>
      val w = 1L << (4 * (7 - j))
      (expr(s"instr('0123456789abcdef', substring($md5Expr, ${j + 1}, 1))")
        .cast("long") - 1) * w
    }.reduce(_ + _)

  /** DuckDB side. `md5Expr` is the DuckDB spelling of the same md5,
    * e.g. "md5(cast(doc_id as varchar))". */
  def sql(md5Expr: String): String = (0 until 8).map { j =>
    val w = 1L << (4 * (7 - j))
    s"(cast(strpos('0123456789abcdef', substring($md5Expr, ${j + 1}, 1)) as bigint) - 1) * $w"
  }.mkString("(", " + ", ")")
}
