package graft

import org.apache.spark.sql.functions._
import graft.chat.{AnnIndex, ChatPipeline, HashingEmbedder, Retrieval}
import graft.plans.{AnnCatalog, PreparedKnn}

/** Round-12 serving floor: the prepared-plan executor must be
  * BIT-IDENTICAL to the AnnPushdownRule fast path — same candidate
  * leaves, same (distance, chunk_id) winners, same payload — and must
  * revalidate its captured plans when the index mutates underneath it.
  */
class PreparedKnnSpec extends SparkSpec {

  private def buildIndex(tag: String, nFiles: Int = 40): (String, String) = {
    val repoDir = java.nio.file.Files.createTempDirectory(s"graft_pk_repo_$tag").toFile
    (1 to nFiles).foreach { i =>
      val f = new java.io.File(repoDir, s"src/file$i.rs")
      f.getParentFile.mkdirs()
      java.nio.file.Files.writeString(f.toPath,
        s"fn function_$i() { let value_$i = compute_$i(); }\n")
    }
    val idxDir = java.nio.file.Files.createTempDirectory(s"graft_pk_idx_$tag").toFile
    ChatPipeline.index(spark, repoDir.getAbsolutePath, idxDir.getAbsolutePath)
    (repoDir.getAbsolutePath, idxDir.getAbsolutePath)
  }

  private def rulePathHits(idxDir: String, q: Array[Float], k2: Int): Seq[Retrieval.LocalHit] = {
    val hits0 = AnnIndex.knnExact(AnnIndex.loadServing(spark, idxDir), q, k2)
    Retrieval.localHits(hits0.collect().toSeq, hits0.schema)
  }

  test("prepared executor returns exactly the rule path's rows") {
    val (_, idxDir) = buildIndex("parity")
    AnnCatalog.register(spark, idxDir)
    try {
      val emb = new HashingEmbedder()
      for (question <- Seq("compute function value", "let value", "function 17 compute",
        "unrelated query text entirely")) {
        val q = emb.embed(question)
        val viaRule = rulePathHits(idxDir, q, 6)
        val viaPrepared = PreparedKnn.search(spark, idxDir, q, 6)
        assert(viaPrepared.isDefined, "prepared path must engage on a registered r9-layout index")
        assert(viaPrepared.get == viaRule, s"divergence for '$question'")
      }
    } finally AnnCatalog.clear()
  }

  test("prepared executor is not engaged for an unregistered index") {
    val (_, idxDir) = buildIndex("unreg")
    AnnCatalog.clear()
    val q = new HashingEmbedder().embed("anything")
    assert(PreparedKnn.search(spark, idxDir, q, 6).isEmpty)
  }

  test("stamp revalidation: an out-of-process rebuild re-prepares within one query") {
    val (repoDir, idxDir) = buildIndex("mut")
    AnnCatalog.register(spark, idxDir)
    try {
      val emb = new HashingEmbedder()
      val q1 = emb.embed("compute function value")
      assert(PreparedKnn.search(spark, idxDir, q1, 6).isDefined)

      // mutate the index as another process would: add a source file
      // and rebuild in place (rewrites chunks/forest and the build
      // metadata the stamp watches)
      val f = new java.io.File(repoDir, "src/zz_new.rs")
      java.nio.file.Files.writeString(f.toPath,
        "fn zz_brand_new_marker() { let zz_marker = zz_unique(); }\n")
      ChatPipeline.index(spark, repoDir, idxDir)
      AnnIndex.invalidateServing(idxDir)

      val q2 = emb.embed("zz_brand_new_marker zz_marker zz_unique")
      val viaPrepared = PreparedKnn.search(spark, idxDir, q2, 6)
      val viaRule = rulePathHits(idxDir, q2, 6)
      assert(viaPrepared.isDefined)
      assert(viaPrepared.get == viaRule)
      assert(viaPrepared.get.exists(_.code.contains("zz_brand_new_marker")),
        "prepared plans kept serving the dead index generation")
    } finally AnnCatalog.clear()
  }

  test("ChatPipeline.query prepared and rule lanes agree end-to-end") {
    val (_, idxDir) = buildIndex("e2e")
    AnnCatalog.register(spark, idxDir)
    try {
      for (question <- Seq("how does compute function work",
        "show the value function implementation")) {
        val fast = ChatPipeline.query(spark, idxDir, question, k = 3,
          rerank = true, prepared = true)
        val slow = ChatPipeline.query(spark, idxDir, question, k = 3,
          rerank = true, prepared = false)
        assert(fast.results == slow.results, s"lanes diverge for '$question'")
      }
    } finally AnnCatalog.clear()
  }

  test("payload-store lane and parquet payload lane return identical hits") {
    // round 15: the executor-resident PayloadStore replaces the
    // per-query parquet payload scan; correctness must never depend on
    // it — with the store dropped, the same search must fall back to
    // the prepared payload plan and return bit-identical rows
    val (_, idxDir) = buildIndex("store")
    AnnCatalog.register(spark, idxDir)
    try {
      val emb = new HashingEmbedder()
      for (question <- Seq("compute function value", "function 17 compute")) {
        // re-prepare so every iteration exercises a LIVE store first
        // (clear() below leaves the store absent until re-prepare)
        PreparedKnn.clear()
        val q = emb.embed(question)
        val withStore = PreparedKnn.search(spark, idxDir, q, 6)
        assert(withStore.isDefined && withStore.get.nonEmpty)
        graft.plans.PayloadStore.clear()
        val fallback = PreparedKnn.search(spark, idxDir, q, 6)
        assert(fallback.isDefined)
        assert(withStore.get == fallback.get, s"store/fallback diverge for '$question'")
        // and both equal the rule path (the standing parity bar)
        assert(withStore.get == rulePathHits(idxDir, q, 6))
      }
    } finally AnnCatalog.clear()
  }

  test("concurrent queries through the prepared executor equal their sequential answers") {
    // interactive serving is inherently concurrent: the TrieMap entry,
    // the single-flight (re)prepare, and per-query plan transforms must
    // tolerate racing callers. 8 threads x 6 distinct queries, every
    // result bit-equal to the sequential answer for the same vector.
    val (_, idxDir) = buildIndex("conc")
    AnnCatalog.register(spark, idxDir)
    try {
      val emb = new HashingEmbedder()
      val questions = (0 until 6).map(i => s"compute function value $i")
      val vecs = questions.map(emb.embed)
      val expected = vecs.map(v => PreparedKnn.search(spark, idxDir, v, 6).get)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val runs = Future.sequence((0 until 48).map { i =>
        Future {
          val j = i % vecs.length
          (j, PreparedKnn.search(spark, idxDir, vecs(j), 6).get)
        }
      })
      Await.result(runs, 120.seconds).foreach { case (j, got) =>
        assert(got == expected(j), s"concurrent result diverged for query $j")
      }
    } finally AnnCatalog.clear()
  }
}
