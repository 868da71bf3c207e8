package graft.plans

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, AttributeReference, EqualTo, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Join, JoinHint, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.chat.AnnIndex
import graft.functions.CosineDistanceExpr

/** ANN top-k pushdown (SURVEY.md §4 custom item 3 — the one genuinely
  * novel planner piece).
  *
  * After `AnnCatalog.register(spark, indexDir)`, a query of the shape
  *
  *   chunks.withColumn("distance", cosineDistance(vector, <query vec>))
  *         .orderBy(distance[, tiebreak]).limit(k)
  *
  * over that index's chunks relation is rewritten so the scan only
  * considers the query's RP-forest candidate leaves: the chunks child
  * gains a LEFT SEMI join against `forest/` filtered to the leaf the
  * query vector lands in per tree (partition-pruned — the forest table
  * is written partitioned by (tree, leaf)). The Sort+Limit stay on top,
  * so results are exactly `knnApprox`: top-k of the candidate set.
  *
  * This is the declarative form of the reference's index search
  * (/root/reference/src/ann.rs:262-268): the user writes brute-force
  * kNN; the optimizer consults the index.
  */
object AnnCatalog {
  case class Entry(indexDir: String, forest: Array[Array[Array[Float]]])

  /** keyed by the chunks parquet location (path suffix match). */
  private[plans] val entries = TrieMap.empty[String, Entry]

  def register(spark: SparkSession, indexDir: String): Unit = {
    // prefer the persisted planes (index identity survives appends);
    // fall back to re-sampling only for pre-planes index layouts
    val forest =
      if (AnnIndex.hasPlanes(indexDir)) AnnIndex.loadPlanes(spark, indexDir)
      else {
        val chunks = AnnIndex.load(spark, indexDir)
        AnnIndex.sampleForest(AnnIndex.dim(chunks), chunks.count())
      }
    entries.put(s"$indexDir/chunks", Entry(indexDir, forest))
  }

  def clear(): Unit = entries.clear()

  private[plans] def lookup(paths: Seq[String]): Option[Entry] =
    entries.collectFirst {
      case (chunksPath, e) if paths.exists(p =>
        p.stripSuffix("/").endsWith(chunksPath.stripPrefix("file:"))) => e
    }
}

case class AnnPushdownRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def literalVector(l: Literal): Option[Array[Float]] = l.dataType match {
    case ArrayType(FloatType, _) =>
      Some(l.value.asInstanceOf[ArrayData].toFloatArray())
    case ArrayType(DoubleType, _) =>
      Some(l.value.asInstanceOf[ArrayData].toDoubleArray().map(_.toFloat))
    case _ => None
  }

  private def relationPaths(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case r: LogicalRelation =>
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten

  /** candidate chunk_ids logical plan for this query vector. */
  private def candidatePlan(e: AnnCatalog.Entry, q: Array[Float]): LogicalPlan = {
    import org.apache.spark.sql.functions.col
    val leaves = AnnIndex.queryLeaves(q, e.forest)
    val forestDf = spark.read.parquet(s"${e.indexDir}/forest")
    val cond = leaves.map { case (t, l) => col("tree") === t && col("leaf") === l }
      .reduce(_ || _)
    // the OPTIMIZED subtree: this rule runs mid-optimization, after
    // ReplaceDeduplicateWithAggregate, so an analyzed Deduplicate node
    // would survive to physical planning and fail there
    forestDf.filter(cond).select("chunk_id").distinct()
      .queryExecution.optimizedPlan
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (AnnCatalog.entries.isEmpty) return plan
    plan.transformDown {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_,
          sort @ Sort(SortOrder(sortAttr: AttributeReference, Ascending, _, _) +: _, true,
            proj @ Project(projList, child), _)))
          // idempotence: skip once a semi join is already in place
          if !child.exists { case Join(_, _, LeftSemi, _, _) => true; case _ => false } =>
        val distDef = projList.collectFirst {
          case a @ Alias(CosineDistanceExpr(_, l: Literal), _)
              if a.exprId == sortAttr.exprId => l
        }
        (distDef, AnnCatalog.lookup(relationPaths(child))) match {
          case (Some(lit), Some(entry)) =>
            literalVector(lit) match {
              case Some(q) =>
                val cand = candidatePlan(entry, q)
                val leftId = child.output.find(_.name == "chunk_id")
                val rightId = cand.output.find(_.name == "chunk_id")
                (leftId, rightId) match {
                  case (Some(li), Some(ri)) =>
                    val semi = Join(child, cand, LeftSemi,
                      Some(EqualTo(li, ri)), JoinHint.NONE)
                    gl.copy(child = ll.copy(child =
                      sort.copy(child = proj.copy(child = semi))))
                  case _ => gl
                }
              case None => gl
            }
          case _ => gl
        }
    }
  }
}
