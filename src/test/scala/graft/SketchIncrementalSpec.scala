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

  test("bloom-prefiltered semi-join equals the exact semi-join") {
    val bloom = Sketches.bloomPrunedOrderLineitems(spark, sf0001).collect()
    val exact = Sketches.exactOrderLineitems(spark, sf0001).collect()
    assert(bloom.toSeq == exact.toSeq)
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
}
