package graft

import graft.chat._
import org.apache.spark.sql.functions.col

/** Opt-in validation against a REAL published sentence-transformer
  * checkpoint — the one structural gap a zero-egress sandbox cannot
  * close (embedding.rs:22-35 / rerank.rs:7-14 run actual Jina/Qwen
  * weights; everything here runs synthetic checkpoints with the same
  * graph shapes). Gate: set `GRAFT_REAL_ONNX_MODEL` to a downloaded
  * `.onnx` whose tokenizer vocabulary ships beside it (`vocab.txt` for
  * WordPiece or `vocab.json` + `merges.txt` for BPE — the same
  * auto-detection the embedder applies to the reference's artifact
  * layout), optionally `GRAFT_REAL_ONNX_DIM` to pin the 512/1024
  * family check. Unset, every test cancels cleanly (`assume`), so
  * offline runs stay green without pretending this was validated.
  *
  *   GRAFT_REAL_ONNX_MODEL=/models/all-MiniLM-L6-v2/model.onnx \
  *     sbt "testOnly graft.RealCheckpointSpec"
  *
  * What it checks when the artifact is present: the checkpoint loads
  * through the proto parser, the shipped vocabulary resolves to a real
  * tokenizer (not the hash fallback), embeddings satisfy every
  * invariant the pipeline assumes of ANY embedder (unit norm,
  * determinism, batch/single equality, text sensitivity), semantic
  * recall beats the lexical floor on paraphrase fixtures, and the full
  * index->query pipeline retrieves with the real weights exactly as it
  * does with the hashing embedder.
  */
class RealCheckpointSpec extends SparkSpec {

  private def modelPath: Option[String] =
    sys.env.get("GRAFT_REAL_ONNX_MODEL").filter(p =>
      java.nio.file.Files.isReadable(java.nio.file.Paths.get(p)))

  private def realEmbedder(): OnnxEmbedder =
    new OnnxEmbedder(modelPath.get,
      expectDim = sys.env.get("GRAFT_REAL_ONNX_DIM").map(_.toInt))

  private def cos(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum

  test("real checkpoint loads and its shipped vocabulary drives tokenization") {
    assume(modelPath.isDefined, "GRAFT_REAL_ONNX_MODEL not set; skipping")
    val p = modelPath.get
    assume(ModelTokenizer.forModel(p).isDefined,
      s"no vocab.txt / vocab.json+merges.txt beside $p; real-tokenizer " +
        "validation needs the checkpoint's own vocabulary")
    val e = realEmbedder()
    assert(e.dim > 0)
    sys.env.get("GRAFT_REAL_ONNX_DIM").foreach(d => assert(e.dim == d.toInt))
  }

  test("real embeddings satisfy the pipeline's embedder invariants") {
    assume(modelPath.isDefined, "GRAFT_REAL_ONNX_MODEL not set; skipping")
    val e = realEmbedder()
    val texts = Seq(
      "fn parse_config reads the yaml settings file",
      "async fn fetch_page retries on transient http errors",
      "SELECT doc_id FROM documents WHERE lang = 'en'")
    val vecs = e.embedBatch(texts)
    // unit norm (cosine distance downstream assumes normalized vectors)
    vecs.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x.toDouble * x.toDouble).sum) - 1.0) < 1e-3)
    }
    // deterministic and batch == single (E2 batches, query embeds singly;
    // the two paths MUST agree or index and query live in different spaces)
    texts.zip(vecs).foreach { case (t, v) =>
      assert(e.embed(t).toSeq == v.toSeq)
    }
    // distinct texts -> distinct vectors
    assert(vecs.map(_.toSeq).distinct.size == texts.size)
  }

  test("real checkpoint clears the semantic-recall bar on paraphrase fixtures") {
    assume(modelPath.isDefined, "GRAFT_REAL_ONNX_MODEL not set; skipping")
    val e = realEmbedder()
    // paraphrase pairs share almost no tokens, so the HASHING embedder
    // scores them near zero — real weights must score the paraphrase
    // above the unrelated text for every anchor (the reason to run
    // real weights at all)
    val fixtures = Seq(
      ("how do I retry a failed download",
        "re-attempt fetching when the transfer errors out",
        "the cat sat quietly on the warm windowsill"),
      ("function that sorts a list of numbers",
        "routine ordering numeric values ascending",
        "recipe for chocolate layer cake with frosting"))
    fixtures.foreach { case (anchor, paraphrase, unrelated) =>
      val Seq(a, p, u) = e.embedBatch(Seq(anchor, paraphrase, unrelated))
      assert(cos(a, p) > cos(a, u),
        s"'$anchor': paraphrase ${cos(a, p)} must beat unrelated ${cos(a, u)}")
    }
  }

  test("index->query e2e runs on real weights with the hashing pipeline's behavior") {
    assume(modelPath.isDefined, "GRAFT_REAL_ONNX_MODEL not set; skipping")
    val e = realEmbedder()
    val repo = java.nio.file.Files.createTempDirectory("graft_real_repo")
    java.nio.file.Files.writeString(repo.resolve("retry.rs"),
      "fn retry_with_backoff(attempts: u32) { /* exponential backoff on failure */ }")
    java.nio.file.Files.writeString(repo.resolve("parser.rs"),
      "fn parse_manifest(path: &str) -> Manifest { /* toml parsing */ }")
    java.nio.file.Files.writeString(repo.resolve("README.md"),
      "# demo\nA demo crate.")
    val outReal = java.nio.file.Files.createTempDirectory("graft_real_ix").toString
    val n = ChatPipeline.index(spark, repo.toString, outReal, embedder = e)
    assert(n > 0)
    val out = ChatPipeline.query(spark, outReal,
      "how does the retry logic back off", k = 2, embedder = e)
    assert(out.results.nonEmpty)
    // the file whose content answers the question must surface, and
    // ranking must be by ascending distance (F10) exactly as with the
    // hashing embedder
    assert(out.results.map(_.file).exists(_.endsWith("retry.rs")))
    assert(out.results.map(_.distance) == out.results.map(_.distance).sorted)
  }
}
