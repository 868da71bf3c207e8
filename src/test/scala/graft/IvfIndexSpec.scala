package graft

import graft.ops.Similarity
import graft.core.Consts

/** Persisted IVF artifact specs: the train-once/serve-many split must
  * be invisible in the results — every index-served query is pinned
  * bit-identical to its retrain-every-time twin — and the artifact
  * layout must actually be the partition-pruned shape it claims.
  */
class IvfIndexSpec extends SparkSpec {

  private lazy val indexPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    Similarity.saveIvfIndex(spark, sf0001, dir)
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("artifact layout: one centroids table + cid-partitioned inverted lists") {
    val vecDirs = new java.io.File(s"$indexPath/vectors").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(vecDirs.nonEmpty && vecDirs.forall(_.startsWith("cid=")), vecDirs.toString)
    val cent = Similarity.loadIvfCentroids(spark, indexPath)
    assert(cent.count() == Similarity.NCentroids)
    // every corpus row is in exactly one inverted list
    val vecs = Similarity.loadIvfVectors(spark, indexPath)
    assert(vecs.select("vid").distinct().count() == vecs.count())
  }

  test("semanticDedupIndexed is bit-identical to the retrain path (q66)") {
    assert(rows(Similarity.semanticDedupIndexed(spark, indexPath)) ==
      rows(Similarity.semanticDedup(spark, sf0001)))
  }

  test("hardNegativesIndexed is bit-identical to the retrain path (q67)") {
    assert(rows(Similarity.hardNegativesIndexed(spark, indexPath)) ==
      rows(Similarity.hardNegatives(spark, sf0001)))
  }

  test("probing every inverted list reproduces exact hard negatives") {
    assert(rows(Similarity.hardNegativesProbed(spark, indexPath, Similarity.NCentroids)) ==
      rows(Similarity.hardNegatives(spark, sf0001)))
  }

  test("Lloyd-trained quantizer raises mean assigned similarity; serving API unchanged") {
    import org.apache.spark.sql.functions._
    val trainedDir = java.nio.file.Files.createTempDirectory("graft_ivf_trained").toString
    Similarity.saveIvfIndex(spark, sf0001, trainedDir, trainIters = 2)
    def meanAssignedSim(dir: String): Double = {
      val vecs = Similarity.loadIvfVectors(spark, dir)
      val cent = Similarity.loadIvfCentroids(spark, dir)
      vecs.join(cent, "cid")
        .select(Similarity.qcosine(col("cv"), col("v"), col("cnrm"), col("nrm")).as("sim"))
        .agg(avg(col("sim"))).head().getDouble(0)
    }
    val seeded = meanAssignedSim(indexPath)
    val trained = meanAssignedSim(trainedDir)
    assert(trained > seeded, s"training must tighten clusters: $trained vs seeded $seeded")
    // the serving paths run unchanged against learned centroids
    val sd = Similarity.semanticDedupIndexed(spark, trainedDir)
    assert(sd.count() == Similarity.loadIvfVectors(spark, trainedDir).count())
  }

  test("streaming ingestion appends to the frozen-centroid inverted lists; serving sees the rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // fresh artifact so the append does not disturb the shared one
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_stream").toString
    Similarity.saveIvfIndex(spark, sf0001, idx)
    val before = Similarity.loadIvfVectors(spark, idx).count()
    // new vectors arrive: ids beyond the corpus, recognizable payloads
    val watch = java.nio.file.Files.createTempDirectory("graft_ivf_watch").toString
    val rnd = new scala.util.Random(3)
    val newRows = (0 until 40).map { i =>
      (1000000L + i, Array.fill(64)((rnd.nextFloat() - 0.5f)), i % 4)
    }.toDF("vec_id", "embedding", "label")
    newRows.write.mode("overwrite").parquet(s"$watch/batch1.parquet")
    val q = graft.streaming.IvfStream.start(spark, watch, idx)
    try q.processAllAvailable() finally q.stop()
    val after = Similarity.loadIvfVectors(spark, idx)
    assert(after.count() == before + 40)
    // appended assignments equal the batch assignment of the same rows
    // (one shared function, but prove it end-to-end through the files)
    val expected = Similarity.assignToIndex(spark, idx, newRows)
      .select("vid", "cid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = after.filter(col("vid") >= 1000000L)
      .select("vid", "cid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // serving path reads the grown lists without retraining
    assert(Similarity.hardNegativesIndexed(spark, idx).count() > 0)
  }

  test("pruned probes return well-formed label-filtered top-k from probed lists only") {
    val pruned = Similarity.hardNegativesProbed(spark, indexPath, Similarity.NProbe)
    val got = pruned.collect()
    assert(got.nonEmpty && got.length <= Consts.KnnQueries * Consts.KnnK)
    // per-query ranks are 1..n with no gaps
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // the probe pruning is real: each anchor's neighbors come from at
    // most NProbe inverted lists (their cids), never the whole corpus
    val vecs = Similarity.loadIvfVectors(spark, indexPath)
      .select("vid", "cid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val lists = rs.map(r => vecs(r.getLong(1))).toSet
      assert(lists.size <= Similarity.NProbe, s"anchor $qid drew from lists $lists")
    }
  }
}
