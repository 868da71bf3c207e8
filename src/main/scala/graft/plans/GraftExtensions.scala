package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Add, Expression, ExpressionInfo, Generator, LambdaFunction, Literal, Multiply, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, ZipWith}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface extension points (SURVEY.md §4 custom-work list):
  *
  *  - `chunk_text(text, max_size)` — the chunk flatMap (op P3) as a
  *    Catalyst Generator, so SQL users get the chunker as a
  *    lateral-view/UDTF without touching the Scala API;
  *  - [[DotProductRewrite]] — an optimizer rule recognizing the
  *    higher-order-function dot product `aggregate(zip_with(a, b, *),
  *    0L, +)` over array<bigint> and swapping in the codegen
  *    [[graft.functions.LongArrayDot]] (HOF lambdas are interpreted;
  *    the native expression measured ~30x faster on pair joins).
  *
  * Register with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(ChunkText.description)
    ext.injectFunction(CosineDistanceFn.description)
    ext.injectFunction(SimHashFn.description)
    ext.injectFunction(ShingleHashesFn.description)
    ext.injectFunction(MinhashSigFn.description)
    ext.injectFunction(LshBandsFn.description)
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectOptimizerRule(session => AnnPushdownRule(session))
  }
}

/** SQL registration for the codegen cosine distance — `SELECT ...
  * ORDER BY cosine_distance(vector, array(...)) LIMIT k` is then the
  * pure-SQL ANN surface: the same expression the pushdown rule anchors
  * on, so registered indexes accelerate SQL queries too (the array
  * literal is constant-folded before the rule runs). */
object CosineDistanceFn {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_distance"),
    new ExpressionInfo(classOf[graft.functions.CosineDistanceExpr].getName, "cosine_distance"),
    (args: Seq[Expression]) => args match {
      case Seq(a, b) => graft.functions.CosineDistanceExpr(a, b)
      case _ => throw new IllegalArgumentException(
        "cosine_distance(a, b) takes exactly 2 array arguments")
    })
}

/** `simhash16(text)` — the q16 per-doc signature as a SQL scalar. */
object SimHashFn {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash16"),
    new ExpressionInfo(classOf[graft.functions.SimHash16].getName, "simhash16"),
    (args: Seq[Expression]) => args match {
      case Seq(t) => graft.functions.SimHash16(t)
      case _ => throw new IllegalArgumentException(
        "simhash16(text) takes exactly 1 string argument")
    })
}

/** `shingle_hashes(text[, bits])` — the per-doc shingle-hash set as a
  * SQL scalar (64-bit library default; 32 = oracle width). */
object ShingleHashesFn {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[graft.functions.ShingleHashes].getName, "shingle_hashes"),
    (args: Seq[Expression]) => args match {
      case Seq(t) => graft.functions.ShingleHashes(t, graft.ops.Dedup.DefaultHashBits)
      case Seq(t, Literal(b: Int, IntegerType)) => graft.functions.ShingleHashes(t, b)
      case _ => throw new IllegalArgumentException(
        "shingle_hashes(text[, bits]) takes a string and an optional int literal")
    })
}

/** `minhash_sig(text[, bits])` — the q14 16-value MinHash signature as
  * a SQL scalar (64-bit library default; 32 = oracle width). With
  * `lsh_bands` this makes the whole dedup family drivable from pure
  * SQL: the banded candidate join, the signature columns, and the
  * shingle sets are all scalar-expressible (SqlDedupSurfaceSpec pins a
  * full SQL q14 to the batch operator row-for-row). */
object MinhashSigFn {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[graft.functions.MinhashSig].getName, "minhash_sig"),
    (args: Seq[Expression]) => args match {
      case Seq(t) => graft.functions.MinhashSig(t, graft.ops.Dedup.DefaultHashBits)
      case Seq(t, Literal(b: Int, IntegerType)) => graft.functions.MinhashSig(t, b)
      case _ => throw new IllegalArgumentException(
        "minhash_sig(text[, bits]) takes a string and an optional int literal")
    })
}

/** `lsh_bands(text[, bits])` — the q14 LSH band strings as a SQL
  * scalar; see [[MinhashSigFn]]. */
object LshBandsFn {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lsh_bands"),
    new ExpressionInfo(classOf[graft.functions.LshBandStrings].getName, "lsh_bands"),
    (args: Seq[Expression]) => args match {
      case Seq(t) => graft.functions.LshBandStrings(t, graft.ops.Dedup.DefaultHashBits)
      case Seq(t, Literal(b: Int, IntegerType)) => graft.functions.LshBandStrings(t, b)
      case _ => throw new IllegalArgumentException(
        "lsh_bands(text[, bits]) takes a string and an optional int literal")
    })
}

/** Generator form of the line-greedy chunker (1 text -> N chunk rows).
  * Mirrors graft.chat.Chunker.splitContent exactly. */
case class ChunkText(text: Expression, maxSize: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, maxSize)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    val m = maxSize.eval(input)
    if (t == null || m == null) return Seq.empty
    val chunks = graft.chat.Chunker.splitContent(
      t.asInstanceOf[UTF8String].toString, m.asInstanceOf[Int])
    chunks.zipWithIndex.map { case (c, i) =>
      InternalRow(i, UTF8String.fromString(c))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkText =
    copy(text = newChildren(0), maxSize = newChildren(1))
}

object ChunkText {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("chunk_text"),
    new ExpressionInfo(classOf[ChunkText].getName, "chunk_text"),
    (args: Seq[Expression]) => args match {
      case Seq(t) => ChunkText(t, Literal(graft.chat.Chunker.MaxChunkSize))
      case Seq(t, m) => ChunkText(t, m)
      case _ => throw new IllegalArgumentException(
        "chunk_text(text[, max_size]) takes 1 or 2 arguments")
    })
}

/** Rewrites `aggregate(zip_with(a, b, (x, y) -> x * y), 0L,
  * (acc, v) -> acc + v)` over array<bigint> into LongArrayDot(a, b).
  * Semantics are identical (left-to-right exact i64 accumulation). */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(lacc: NamedLambdaVariable, lv: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(lfin: NamedLambdaVariable), _))
          if isLongArray(a) && isLongArray(b) &&
            x.exprId == lx.exprId && y.exprId == ly.exprId &&
            acc.exprId == lacc.exprId && v.exprId == lv.exprId &&
            fin.exprId == lfin.exprId =>
        graft.functions.LongArrayDot(a, b)
    }
}
