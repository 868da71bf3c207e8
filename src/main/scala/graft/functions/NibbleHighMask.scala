package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit mask of "high" hex nibbles over the first 16 chars of a hex
  * string: bit k is set iff hex digit k (0-based, lowercase) is in
  * [8-9a-f], i.e. the nibble's top bit is set.
  *
  * This is the per-token kernel of SimHash (reference analogue: the
  * per-token bit vote of a simhash signature). The previous
  * formulation — 16 separate `substring(h,k,1).isin('8'..'f')`
  * conditional sums — walked the hash 16 times per token and carried
  * 16 CASE branches through the aggregate; this expression reads the
  * 16 bytes once in one fused codegen loop, and the per-bit vote
  * counts become 16 native shift-and-mask sums over one long.
  *
  * Semantics match the substring/isin version exactly (md5 hex is
  * lowercase ASCII, one byte per char), so the DuckDB oracle SQL is
  * unchanged.
  */
case class NibbleHighMask(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = math.min(16, s.numBytes)
    var m = 0L
    var k = 0
    while (k < n) {
      val c = s.getByte(k)
      if ((c >= '8' && c <= '9') || (c >= 'a' && c <= 'f')) m |= (1L << k)
      k += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min(16, $s.numBytes());
         |long $m = 0L;
         |for (int $k = 0; $k < $n; $k++) {
         |  byte $c = $s.getByte($k);
         |  if (($c >= '8' && $c <= '9') || ($c >= 'a' && $c <= 'f')) $m |= (1L << $k);
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NibbleHighMask =
    copy(child = newChild)
}

object NibbleHighMask {
  def apply(c: Column): Column = Bridge.column(NibbleHighMask(Bridge.expression(c)))
}
