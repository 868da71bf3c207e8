package graft

import graft.chat.ChatPipeline

/** Index-freshness metadata + the check-index staleness verdict
  * (docs/proposals.md:3-74): the metadata round-trips through the
  * artifact, an edit to an indexed file flips staleness, an edit to a
  * gitignored artifact does not, and re-indexing restores freshness.
  */
class IndexFreshnessSpec extends SparkSpec {

  private def writeRepo(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir.resolve("src"))
    java.nio.file.Files.writeString(dir.resolve("src/main.rs"),
      "fn main() {\n    println!(\"hello\");\n}\n")
    java.nio.file.Files.writeString(dir.resolve("src/lib.rs"),
      "pub fn add(a: i32, b: i32) -> i32 {\n    a + b\n}\n")
    java.nio.file.Files.writeString(dir.resolve(".gitignore"), "target/\n")
    java.nio.file.Files.createDirectories(dir.resolve("target"))
    java.nio.file.Files.writeString(dir.resolve("target/build.log"), "log v1\n")
  }

  test("freshness lifecycle: fresh -> ignored-edit fresh -> source-edit stale -> reindex fresh") {
    val repo = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-repo")
    val idx = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-idx").toString
    writeRepo(repo)

    val n = ChatPipeline.index(spark, repo.toString, idx)
    assert(n > 0)

    // metadata round-trips and records the build
    val meta = ChatPipeline.readIndexMeta(idx).get
    assert(meta.nChunks == n)
    assert(meta.repoPath == repo.toAbsolutePath.toString)
    assert(meta.contentHash.matches("[0-9a-f]{32}"))
    assert(java.time.Instant.parse(meta.creationTimestamp) != null)
    // scratch dir is not a git checkout -> no commit hash, by contract
    assert(meta.sourceCommitHash.isEmpty)

    val fresh = ChatPipeline.checkIndex(idx).toOption.get
    assert(!fresh.stale, fresh.reason)

    // an edit to a gitignored artifact never flips staleness (the
    // content hash applies the chunker's own keep predicate)
    java.nio.file.Files.writeString(repo.resolve("target/build.log"), "log v2\n")
    assert(!ChatPipeline.checkIndex(idx).toOption.get.stale)

    // an edit to an indexed source file flips it
    java.nio.file.Files.writeString(repo.resolve("src/lib.rs"),
      "pub fn add(a: i32, b: i32) -> i32 {\n    a + b + 0\n}\n")
    val stale = ChatPipeline.checkIndex(idx).toOption.get
    assert(stale.stale)
    assert(stale.currentContentHash != stale.meta.contentHash)

    // re-indexing restores freshness and re-stamps the metadata
    ChatPipeline.index(spark, repo.toString, idx)
    val again = ChatPipeline.checkIndex(idx).toOption.get
    assert(!again.stale, again.reason)
    assert(again.meta.contentHash == again.currentContentHash)
  }

  test("incremental appends credit new files: stale -> drain -> fresh; modification stays stale") {
    val repo = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-inc-repo")
    val idx = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-inc-idx").toString
    writeRepo(repo)
    ChatPipeline.index(spark, repo.toString, idx)
    assert(!ChatPipeline.checkIndex(idx).toOption.get.stale)

    // a new source file lands AFTER the build: raw hash says stale, and
    // the diagnosis names it as new-unprocessed
    java.nio.file.Files.writeString(repo.resolve("src/extra.rs"),
      "pub fn extra() -> i32 {\n    41\n}\n")
    val before = ChatPipeline.checkIndex(idx).toOption.get
    assert(before.stale)
    assert(before.reason.contains("1 new unprocessed"), before.reason)

    // the incremental indexer processes it -> the index IS current for
    // it, and check-index credits the processed log instead of
    // reporting a false stale
    val q = graft.streaming.IncrementalIndex.start(spark, repo.toString, idx)
    try q.processAllAvailable() finally q.stop()
    val after = ChatPipeline.checkIndex(idx).toOption.get
    assert(!after.stale, after.reason)
    assert(after.reason.contains("covered by the incremental"), after.reason)

    // a MODIFIED pre-build file can never be credited: the append-only
    // incremental index cannot re-chunk it
    java.nio.file.Files.writeString(repo.resolve("src/lib.rs"),
      "pub fn add(a: i32, b: i32) -> i32 {\n    b + a\n}\n")
    val modified = ChatPipeline.checkIndex(idx).toOption.get
    assert(modified.stale)
    assert(modified.reason.contains("1 modified"), modified.reason)

    // a rebuild re-stamps manifest + clears the processed log
    ChatPipeline.index(spark, repo.toString, idx)
    assert(!ChatPipeline.checkIndex(idx).toOption.get.stale)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$idx/processed_files.log")))
  }

  test("refresh-index repairs without a full rebuild: purge + targeted re-embed -> fresh") {
    import org.apache.spark.sql.functions.col
    val repo = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-refresh-repo")
    val idx = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-refresh-idx").toString
    writeRepo(repo)
    ChatPipeline.index(spark, repo.toString, idx)

    // a fresh index refreshes as a no-op
    val noop = ChatPipeline.refreshIndex(spark, repo.toString, idx)
    assert(noop == ChatPipeline.RefreshStats(0L, 0L, 0L, 0L))

    // modify one file, delete another, add a third
    java.nio.file.Files.writeString(repo.resolve("src/lib.rs"),
      "pub fn add(a: i32, b: i32) -> i32 {\n    let refreshed_marker = 0;\n    a + b + refreshed_marker\n}\n")
    java.nio.file.Files.delete(repo.resolve("src/main.rs"))
    java.nio.file.Files.writeString(repo.resolve("src/extra.rs"),
      "pub fn extra() -> i32 {\n    41\n}\n")
    assert(ChatPipeline.checkIndex(idx).toOption.get.stale)

    val st = ChatPipeline.refreshIndex(spark, repo.toString, idx)
    // purged: modified lib.rs + deleted main.rs; re-embedded: lib + extra
    assert(st.purgedFiles == 2L, st)
    assert(st.purgedChunks > 0L, st)
    assert(st.reindexedFiles == 2L, st)
    assert(st.addedChunks > 0L, st)

    // the index is fresh again, with the repaired content and no ghosts
    val after = ChatPipeline.checkIndex(idx).toOption.get
    assert(!after.stale, after.reason)
    val chunks = graft.chat.AnnIndex.load(spark, idx)
    assert(chunks.filter(col("file") === "src/main.rs").count() == 0L)
    assert(chunks.filter(col("file") === "src/extra.rs").count() > 0L)
    val libCode = chunks.filter(col("file") === "src/lib.rs")
      .select("code").collect().map(_.getString(0)).mkString("\n")
    assert(libCode.contains("refreshed_marker"))
    // forest holds no purged ids: every forest chunk_id still exists
    val forestIds = spark.read.parquet(s"$idx/forest")
      .select("chunk_id").distinct()
    val liveIds = chunks.select("chunk_id").distinct()
    assert(forestIds.exceptAll(liveIds).count() == 0L,
      "forest references purged (ghost) chunk ids")
    // metadata re-stamped to the live chunk count
    assert(ChatPipeline.readIndexMeta(idx).get.nChunks == chunks.count())
  }

  test("query warns (and only warns) on a stale index — proposals.md automatic check") {
    val repo = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-warn-repo")
    val idx = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-warn-idx").toString
    writeRepo(repo)
    ChatPipeline.index(spark, repo.toString, idx)
    // exact per-query detection for this test: the serving TTL
    // legitimately delays the warn by up to its window
    val savedTtl = ChatPipeline.checkSketchTtlMs
    ChatPipeline.checkSketchTtlMs = 0L

    def queryCapturing(): (String, ChatPipeline.QueryOutput) = {
      val buf = new java.io.ByteArrayOutputStream()
      val out = Console.withOut(new java.io.PrintStream(buf)) {
        ChatPipeline.query(spark, idx, "how does add work", 1)
      }
      (buf.toString, out)
    }
    val (freshOut, r1) = queryCapturing()
    assert(!freshOut.contains("WARN: index may be stale"), freshOut)
    assert(r1.results.nonEmpty)

    java.nio.file.Files.writeString(repo.resolve("src/lib.rs"),
      "pub fn add(a: i32, b: i32) -> i32 {\n    b + a\n}\n")
    val (staleOut, r2) = queryCapturing()
    assert(staleOut.contains("WARN: index may be stale"), staleOut)
    // warn, never block: the query still answers from the stale index
    assert(r2.results.nonEmpty)
    ChatPipeline.checkSketchTtlMs = savedTtl
  }

  test("check-index on a real git checkout records the commit hash") {
    // the build repo itself is a git checkout; only the hash lookup is
    // exercised here (no full index build over the repo)
    val h = ChatPipeline.gitCommitHash("/root/repo")
    assert(h.exists(_.matches("[0-9a-f]{40}")))
    assert(ChatPipeline.gitCommitHash("/tmp").isEmpty ||
      ChatPipeline.gitCommitHash("/tmp").exists(_.matches("[0-9a-f]{40}")))
  }

  test("checkIndex is Left on a metadata-less index and on a vanished repo") {
    val empty = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-empty").toString
    assert(ChatPipeline.checkIndex(empty).isLeft)

    val repo = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-gone")
    ChatPipeline.writeIndexMeta(ChatPipeline.IndexMeta(
      java.time.Instant.now().toString, repo.resolve("nope").toString,
      None, "0" * 32, 1L), empty)
    assert(ChatPipeline.checkIndex(empty).isLeft)
  }

  test("expired window serves the cached verdict and refreshes OFF the serving path (round-12 serve knee)") {
    // At ServeBench's 512x corpus the stat walk (320k repo files) takes
    // longer than the TTL window, so the old in-path re-walk ran on
    // EVERY query — p50 1.9 s. The contract now: once a verdict exists,
    // the serving path never walks; an expired window returns the
    // cached verdict and triggers one single-flight background refresh.
    val repo = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-async-repo")
    val idx = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamScratch.root, "fresh-async-idx").toString
    writeRepo(repo)
    ChatPipeline.index(spark, repo.toString, idx)
    val savedTtl = ChatPipeline.checkSketchTtlMs
    try {
      ChatPipeline.checkSketchTtlMs = 40L
      // first check is synchronous (nothing to serve yet) and arms the clock
      assert(!ChatPipeline.checkIndexCached(idx).toOption.get.stale)
      // edit the repo, then let the window lapse
      java.nio.file.Files.writeString(repo.resolve("src/lib.rs"),
        "pub fn add(a: i32, b: i32) -> i32 {\n    b + a\n}\n")
      Thread.sleep(90)
      // the expired-window call must return the PRE-edit verdict (the
      // cached one, read before any refresh could land) — i.e. it did
      // not walk in-path
      val served = ChatPipeline.checkIndexCached(idx).toOption.get
      assert(!served.stale,
        "expired-window call must serve the cached (pre-edit) verdict, not block on a walk")
      // ...and the background refresh detects the edit without any
      // further serving-path walk: poll the cache until it flips
      val deadline = System.currentTimeMillis() + 10000
      var cur = served
      while (System.currentTimeMillis() < deadline && !cur.stale) {
        Thread.sleep(25)
        cur = ChatPipeline.checkIndexCached(idx).toOption.get
      }
      assert(cur.stale, "background refresh must detect the edit eventually")
    } finally ChatPipeline.checkSketchTtlMs = savedTtl
  }
}
