package graft.ops

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialization of a subplan shared by consumers with
  * DIFFERENT shuffle keys.
  *
  * Spark reuses an exchange only when two consumers shuffle the same
  * subplan by the same key; a second consumer with a different key
  * re-runs the whole lineage. For an expensive lineage (e.g. 5M+ MD5
  * digests behind the shingle table) that recompute dominated the
  * round-2 bench: q15 spent 11.6 s re-hashing for its `sizes`
  * aggregate, and q14/q49 repeated the pattern.
  *
  * `shared` persists the frame and materializes it EAGERLY (one count
  * job) so every consumer — whatever its shuffle key — reads cached
  * blocks instead of re-running the lineage. Plain `persist` (not
  * `localCheckpoint`) keeps the lineage intact, so block eviction under
  * memory pressure degrades to recompute instead of job failure, and a
  * frame that is never released is merely LRU-evictable cache, not a
  * leak that can fail later queries.
  *
  * `release(spark)` unpersists everything registered by the session —
  * Bench calls it between timed passes (each pass measures the full
  * compute, not a warm cache) and Verify calls it per query (bounded
  * memory across the 50+ query sweep).
  */
object Materialize {
  private val registry =
    new ConcurrentHashMap[String, ConcurrentLinkedQueue[DataFrame]]()

  def shared(spark: SparkSession, df: DataFrame): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    registry
      .computeIfAbsent(spark.sessionUUID, _ => new ConcurrentLinkedQueue[DataFrame]())
      .add(cached)
    cached
  }

  def release(spark: SparkSession): Unit = {
    val q = registry.remove(spark.sessionUUID)
    if (q != null) q.forEach(df => df.unpersist(false))
  }
}
