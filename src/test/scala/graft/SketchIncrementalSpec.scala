package graft

import java.nio.file.Files
import graft.ops.Sketches
import graft.streaming.IncrementalIndex
import org.apache.spark.sql.functions._

class SketchIncrementalSpec extends SparkSpec {

  test("HLL approx distinct stays within its error bound") {
    val df = Sketches.approxDistinctUsers(spark, sf001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // default rsd is 5%; allow 3 sigma
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_err") <= 0.15,
        s"${r.getAs[String]("event_type")}: ${r.getAs[Double]("rel_err")}")
    }
  }

  test("approx quantiles land within sketch tolerance of the exact percentiles") {
    val rows = Sketches.approxValueQuantiles(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for ((e, a) <- Seq(("p50_exact", "p50_approx"), ("p90_exact", "p90_approx"),
                         ("p99_exact", "p99_approx"))) {
        val exact = r.getAs[Double](e); val approx = r.getAs[Double](a)
        // accuracy=1000 => rank error <= n/1000; generous value-space bound
        assert(math.abs(approx - exact) <= math.max(0.05 * math.abs(exact), 0.5),
          s"${r.getString(0)} $e=$exact vs $a=$approx")
      }
    }
  }

  test("bloom-prefiltered semi-join equals the exact semi-join") {
    val df = Sketches.bloomPrunedOrderLineitems(spark, sf0001)
    val bloom = df.collect()
    val exact = Sketches.exactOrderLineitems(spark, sf0001).collect()
    assert(bloom.toSeq == exact.toSeq)
    // the probe must be the native expression, not a boxed UDF
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("UDF") && !planStr.contains("BatchEvalPython"),
      s"bloom probe should be codegen-native, plan:\n$planStr")
    assert(planStr.contains("might_contain"),
      s"expected BloomFilterMightContain in plan:\n$planStr")
  }

  test("incremental index appends new files without a rebuild") {
    val watch = Files.createTempDirectory("graft_watch").toFile
    val idx = Files.createTempDirectory("graft_inc_idx").toFile
    def w(rel: String, content: String): Unit = {
      val f = new java.io.File(watch, rel); f.getParentFile.mkdirs()
      Files.writeString(f.toPath, content)
    }
    w("a.rs", "fn first() { let x = 1; }\n")
    val q = IncrementalIndex.start(spark, watch.getAbsolutePath, idx.getAbsolutePath)
    try {
      q.processAllAvailable()
      val chunks1 = spark.read.parquet(s"${idx.getAbsolutePath}/chunks")
      val n1 = chunks1.count()
      assert(n1 >= 1)
      assert(chunks1.filter(col("file") === "a.rs").count() == 1)
      // a new file appears -> next micro-batch appends it
      w("b.py", "def second():\n    return 2\n")
      q.processAllAvailable()
      val chunks2 = spark.read.parquet(s"${idx.getAbsolutePath}/chunks")
      assert(chunks2.count() > n1)
      assert(chunks2.filter(col("file") === "b.py").count() == 1)
      // ids unique across batches; vectors present and normalized
      assert(chunks2.select("chunk_id").distinct().count() == chunks2.count())
      assert(chunks2.filter(size(col("vector")) =!= 256).count() == 0)
      // unsupported extensions are ignored
      w("notes.xyz", "not indexed\n")
      q.processAllAvailable()
      val chunks3 = spark.read.parquet(s"${idx.getAbsolutePath}/chunks")
      assert(chunks3.filter(col("file") === "notes.xyz").count() == 0)
    } finally q.stop()
  }

  test("incremental appends keep the forest index complete when planes are persisted") {
    import graft.chat.{AnnIndex, ChatPipeline, HashingEmbedder}
    val repo = Files.createTempDirectory("graft_base_repo").toFile
    val watch = Files.createTempDirectory("graft_watch2").toFile
    val idx = Files.createTempDirectory("graft_inc_idx2").toFile
    Files.writeString(new java.io.File(repo, "base.rs").toPath,
      "fn base() { let answer = 42; }\n")
    // full build: writes chunks + planes + forest
    ChatPipeline.index(spark, repo.getAbsolutePath, idx.getAbsolutePath)
    assert(AnnIndex.hasPlanes(idx.getAbsolutePath))
    val q = IncrementalIndex.start(spark, watch.getAbsolutePath, idx.getAbsolutePath)
    try {
      Files.writeString(new java.io.File(watch, "new.py").toPath,
        "def added():\n    return 'appended after build'\n")
      q.processAllAvailable()
      val chunks = spark.read.parquet(s"${idx.getAbsolutePath}/chunks")
      val forest = spark.read.parquet(s"${idx.getAbsolutePath}/forest")
      // every chunk (base + appended) has one leaf assignment per tree
      assert(forest.count() == chunks.count() * AnnIndex.NumTrees)
      assert(forest.select("chunk_id").distinct().count() == chunks.count())
      // approximate search with the PERSISTED planes can reach the new
      // chunk even though the live count differs from build time
      val planes = AnnIndex.loadPlanes(spark, idx.getAbsolutePath)
      val emb = new HashingEmbedder()
      val hits = AnnIndex.knnApprox(spark, chunks, forest, planes,
        emb.embed("def added(): return 'appended after build'"), 2)
      assert(hits.count() >= 1)
    } finally q.stop()
  }

  test("compaction collapses append-generated small files without changing the data") {
    import graft.chat.AnnIndex
    val watch = Files.createTempDirectory("graft_watch3").toFile
    val idx = Files.createTempDirectory("graft_inc_idx3").toFile
    def w(rel: String, content: String): Unit =
      Files.writeString(new java.io.File(watch, rel).toPath, content)
    val q = IncrementalIndex.start(spark, watch.getAbsolutePath, idx.getAbsolutePath)
    try {
      // several micro-batches -> several small files per partition
      for (i <- 1 to 4) { w(s"f$i.py", s"def fn_$i():\n    return $i\n"); q.processAllAvailable() }
    } finally q.stop()
    val before = spark.read.parquet(s"${idx.getAbsolutePath}/chunks")
      .collect().map(_.toString).sorted.toSeq
    def fileCount = java.nio.file.Files.walk(
        java.nio.file.Paths.get(idx.getAbsolutePath, "chunks"))
      .filter(_.toString.endsWith(".parquet")).count()
    val filesBefore = fileCount
    assert(filesBefore >= 4, s"expected multiple append files, got $filesBefore")
    val filesAfter = AnnIndex.compactChunks(spark, idx.getAbsolutePath)
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter")
    val after = spark.read.parquet(s"${idx.getAbsolutePath}/chunks")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "compaction must not change the data")
  }

  test("forest planes round-trip through disk, independent of sampling parameters") {
    import graft.chat.AnnIndex
    val dir = Files.createTempDirectory("graft_planes").toFile.getAbsolutePath
    // a NON-default seed: the loader must answer from the persisted
    // planes alone, with no knowledge of how they were sampled
    val forest = AnnIndex.sampleForest(dim = 16, nRows = 1000, seed = 4242L)
    AnnIndex.savePlanes(spark, forest, dir)
    val loaded = AnnIndex.loadPlanes(spark, dir)
    assert(loaded.length == forest.length)
    forest.zip(loaded).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (pa, pb) => assert(pa.sameElements(pb)) }
    }
  }
}
