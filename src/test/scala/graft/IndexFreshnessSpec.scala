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
}
