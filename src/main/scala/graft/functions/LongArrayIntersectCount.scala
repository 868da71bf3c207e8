package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** |A ∩ B| for two array<bigint> columns holding DISTINCT, SORTED
  * elements (produce them with sort_array(collect_set(...))).
  *
  * Spark's ArrayIntersect is a CodegenFallback expression that builds a
  * boxed hash set per invocation — the dominant cost of a pairwise
  * Jaccard join. This expression merge-counts two pre-sorted primitive
  * long[] copies: no boxing, no per-call hash map, no per-pair sort
  * (each set is sorted once at build, then intersected O(n) per pair),
  * full codegen.
  */
case class LongArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongArrayIntersectCount.count(
      a.asInstanceOf[ArrayData].toLongArray(),
      b.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = LongArrayIntersectCount.getClass.getName.stripSuffix("$") + "$"
      s"""
         |${ev.value} = $cls.MODULE$$.count($a.toLongArray(), $b.toLongArray());
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}

object LongArrayIntersectCount {
  def apply(a: Column, b: Column): Column =
    Bridge.column(
      LongArrayIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  /** Merge intersection count over pre-sorted primitive arrays. */
  def count(x: Array[Long], y: Array[Long]): Long = {
    var i = 0; var j = 0; var c = 0L
    while (i < x.length && j < y.length) {
      if (x(i) < y(j)) i += 1
      else if (x(i) > y(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}
