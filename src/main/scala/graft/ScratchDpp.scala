package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway probe — deleted before commit
object ScratchDpp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sfDir = "/root/testdata/sf0.1"
    val replicate = 8
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val docs = (0 until replicate).flatMap(r =>
      base.map { case (id, t) =>
        (id + r.toLong * 1000000L, if (r == 0) t else s"copy $r of: $t")
      }).toArray
    val repoDir = graft.streaming.StreamScratch.dir("probe_repo")
    docs.grouped(8).zipWithIndex.foreach { case (g, i) =>
      val body = g.map { case (id, t) => s"## doc $id\n\n$t\n" }.mkString("\n")
      val p = java.nio.file.Paths.get(repoDir, f"docs/part$i%05d.md")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, body)
    }
    val idxDir = graft.streaming.StreamScratch.dir("probe_idx")
    graft.chat.ChatPipeline.index(spark, repoDir, idxDir)
    graft.plans.AnnCatalog.register(spark, idxDir)

    val emb = new graft.chat.HashingEmbedder()
    val step = math.max(1, docs.length / 24)
    val queries = docs.indices.by(step).take(24).map { i =>
      "what is " + docs(i)._2.trim.split("\\s+").filter(_.nonEmpty).take(6).mkString(" ")
    }
    // warm
    queries.take(3).foreach(q => graft.chat.ChatPipeline.query(spark, idxDir, q, k = 3, rerank = true))

    def phase(tag: String, registered: Boolean): Unit = {
      if (!registered) graft.plans.AnnCatalog.clear()
      else graft.plans.AnnCatalog.register(spark, idxDir)
      queries.take(3).foreach(q => graft.chat.ChatPipeline.query(spark, idxDir, q, k = 3, rerank = true))
      val chunks = graft.chat.AnnIndex.loadServing(spark, idxDir)
      var tKnn = 0.0; var tFull = 0.0
      queries.drop(3).take(12).foreach { qstr =>
        val t0 = System.nanoTime()
        graft.chat.ChatPipeline.query(spark, idxDir, qstr, k = 3, rerank = true)
        tFull += (System.nanoTime() - t0) / 1e6
        val qv = emb.embed(qstr)
        val t1 = System.nanoTime()
        graft.chat.AnnIndex.knnExact(chunks, qv, 6).collect()
        tKnn += (System.nanoTime() - t1) / 1e6
      }
      println(f"$tag: full=${tFull / 12}%.0f ms, knnOnly=${tKnn / 12}%.0f ms")
    }
    phase("pushdown", registered = true)
    phase("brute   ", registered = false)
    phase("pushdown2", registered = true)
    val chunks = graft.chat.AnnIndex.loadServing(spark, idxDir)
    def split(tag: String): Unit = {
      var tPlan = 0.0; var tExec = 0.0; var tBare = 0.0
      (0 until 10).foreach { i =>
        val qv = emb.embed(s"what is doc $i about")
        val t0 = System.nanoTime()
        val df = graft.chat.AnnIndex.knnExact(chunks, qv, 6)
        df.queryExecution.executedPlan
        val t1 = System.nanoTime()
        df.collect()
        val t2 = System.nanoTime()
        chunks.withColumn("distance",
            graft.functions.CosineDistanceExpr(col("vector"), typedLit(qv.toSeq)))
          .orderBy(col("distance").asc, col("chunk_id").asc).limit(6).collect()
        val t3 = System.nanoTime()
        tPlan += (t1 - t0) / 1e6; tExec += (t2 - t1) / 1e6; tBare += (t3 - t2) / 1e6
      }
      println(f"$tag: plan=${tPlan / 10}%.0f exec=${tExec / 10}%.0f bareTotal=${tBare / 10}%.0f ms")
    }
    split("pushdown-split")
    graft.plans.AnnCatalog.clear()
    split("brute-split   ")
    spark.stop()
  }
}
