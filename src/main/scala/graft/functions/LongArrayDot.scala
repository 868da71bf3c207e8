package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native integer dot product over two array<bigint> columns.
  *
  * The higher-order-function formulation
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` materializes the products
  * array per row; on an O(n^2) pair join that allocation dominates.
  * This expression is a single fused loop with full codegen — no
  * intermediate array, no lambda dispatch — and is the hot inner
  * kernel of the similarity operators (reference analogue: the
  * distance loop of /root/reference/src/ann.rs:262-268).
  *
  * Semantics match the HOF version exactly (left-to-right exact i64
  * accumulation), so DuckDB-oracle parity is unaffected. Nulls: result
  * is null if either side is null; elements are containsNull=false by
  * construction (quantized vectors).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are always array<bigint> by construction (quantized vectors);
  // no ExpectsInputTypes since AbstractDataType is private[sql]
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  def apply(a: Column, b: Column): Column =
    Bridge.column(LongArrayDot(Bridge.expression(a), Bridge.expression(b)))
}
