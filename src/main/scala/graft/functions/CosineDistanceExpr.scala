package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, ArrayType}

/** Cosine distance (1 - cosine similarity) over two array<float> columns.
  *
  * Numerically identical to the composed higher-order-function form in
  * [[VectorFunctions.cosineDistance]] — dot and both squared norms
  * accumulate left-to-right in doubles, each in its own accumulator, so
  * the IEEE result matches the three-loop HOF formulation bit-for-bit —
  * but as one fused codegen loop (the HOF form is interpreted and
  * re-evaluates its inputs per lambda).
  *
  * This expression is also the anchor the ANN pushdown rule pattern-
  * matches on (graft.plans.AnnPushdownRule): `ORDER BY
  * cosine_distance(vector, <literal>) LIMIT k` over a registered index
  * relation is rewritten to search only the query's RP-forest leaves.
  */
case class CosineDistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def value(a: ArrayData, i: Int, floats: Boolean): Double =
    if (floats) a.getFloat(i).toDouble else a.getDouble(i)

  private lazy val leftFloats = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val rightFloats = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val a = value(x, i, leftFloats)
      val b = value(y, i, rightFloats)
      dot += a * b; na += a * a; nb += b * b
      i += 1
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val av = ctx.freshName("av"); val bv = ctx.freshName("bv")
      def get(arr: String, idx: String, floats: Boolean) =
        if (floats) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $av = ${get(l, i, leftFloats)};
         |  double $bv = ${get(r, i, rightFloats)};
         |  $dot += $av * $bv; $na += $av * $av; $nb += $bv * $bv;
         |}
         |${ev.value} = 1.0 - $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineDistanceExpr =
    copy(left = newLeft, right = newRight)
}

object CosineDistanceExpr {
  def apply(a: Column, b: Column): Column =
    Bridge.column(CosineDistanceExpr(Bridge.expression(a), Bridge.expression(b)))
}
