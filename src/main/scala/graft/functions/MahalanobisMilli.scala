package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Diagonal-covariance Mahalanobis score in exact milli units:
  * sum_d floor((x_d - mu_d)^2 * 1000 / var_d), var_d = 0 dims
  * contribute 0 (a constant dimension carries no outlier signal).
  *
  * The fused-loop discipline of [[LongArrayDot]]: per-row HOF
  * formulations (zip_with + aggregate) allocate an intermediate array
  * and run interpreted; this is one codegen loop over three
  * array<bigint> columns (the vector and the BROADCAST-LITERAL mean /
  * variance arrays — dimension-sized driver values, the seeded-centroid
  * pattern). Every step is i64 multiply/divide on non-negative
  * operands, so truncating `/` equals floor and the DuckDB `//`
  * spelling is bit-identical.
  *
  * Headroom: |x - mu| <= ~4e6 on the micro grid; (x-mu)^2 * 1000 <=
  * ~1.6e16 per dim, * 64 dims < 2^63.
  */
case class MahalanobisMilli(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any, mu: Any, varr: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val m = mu.asInstanceOf[ArrayData]
    val s = varr.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), math.min(m.numElements(), s.numElements()))
    var acc = 0L
    var i = 0
    while (i < n) {
      val vd = s.getLong(i)
      if (vd > 0L) {
        val d = x.getLong(i) - m.getLong(i)
        acc += d * d * 1000L / vd
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mu, varr) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val vd = ctx.freshName("vd")
      s"""
         |int $n = java.lang.Math.min($v.numElements(),
         |  java.lang.Math.min($mu.numElements(), $varr.numElements()));
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $vd = $varr.getLong($i);
         |  if ($vd > 0L) {
         |    long $d = $v.getLong($i) - $mu.getLong($i);
         |    $acc += $d * $d * 1000L / $vd;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MahalanobisMilli =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MahalanobisMilli {
  def apply(v: Column, mu: Column, varr: Column): Column =
    Bridge.column(MahalanobisMilli(
      Bridge.expression(v), Bridge.expression(mu), Bridge.expression(varr)))
}
