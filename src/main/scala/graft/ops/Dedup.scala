package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Consts, Tables}
import graft.ops.TextAnalytics.{tokens, shingles3, sqlShingles}

/** Deduplication operators over `documents`: exact (hash group-by),
  * MinHash+LSH near-dup, n-gram Jaccard, and SimHash.
  *
  * Scale shapes (the point at 100 TB):
  *  - exact dedup = one shuffle on the content hash with map-side
  *    pre-aggregation;
  *  - MinHash = explode(shingles) -> groupBy(doc) min-per-seed (partial
  *    aggregation makes the shuffle carry one signature row per doc, not
  *    the shingles), then an equi-join on band signatures — candidate
  *    generation never goes O(n^2);
  *  - the only quadratic step left is Jaccard verification over LSH
  *    candidates, which is proportional to the true-duplicate count;
  *  - `jaccardPairs` defaults to the sparse inverted-index join (work
  *    tracks shared-shingle overlap); the blocked O(n^2) pairwise form
  *    survives only as the spec cross-check baseline;
  *  - near-dup pairs resolve into clusters (connected components) with
  *    one representative each — the actual survivorship decision.
  */
object Dedup
  extends DedupSignatures with DedupOverlap with DedupWinnow
  with DedupAdmission with DedupGraphOps with DedupGraphArtifact
  with Serializable {
  // Serializable: trait methods calling sibling members from Spark
  // closures capture the module; the caches above are @transient, so
  // the captured payload is the constants only. External alias for the
  // one nested type consumers name through the object:
  private[graft] type FrozenCorpus = graft.ops.FrozenCorpus
}
