package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import graft.chat.{BpeTokenizer, Embed, OnnxEmbedder, OnnxLiteModel, WordPieceTokenizer}
import graft.chat.Schemas.CodeChunk

/** E1 specs: a tiny ONNX model file is GENERATED here (protobuf wire
  * format per the public onnx.proto3 spec, seeded weights), then loaded
  * and executed by OnnxLiteModel / OnnxEmbedder — covering the model
  * load, batch inference, dim validation, and executor-session reuse
  * architecture of reference src/embedding.rs:63-94. */
class OnnxSpec extends SparkSpec {

  // ----- minimal protobuf writer -----
  private def varint(v0: Long): Array[Byte] = {
    var v = v0
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    do {
      val b = (v & 0x7f).toInt
      v >>>= 7
      out += (if (v != 0) (b | 0x80).toByte else b.toByte)
    } while (v != 0)
    out.toArray
  }
  private def ld(num: Int, payload: Array[Byte]): Array[Byte] =
    varint((num << 3) | 2) ++ varint(payload.length) ++ payload
  private def vint(num: Int, v: Long): Array[Byte] = varint((num << 3) | 0) ++ varint(v)
  private def str(num: Int, s: String): Array[Byte] =
    ld(num, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private def raw(fs: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(fs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    fs.foreach(bb.putFloat); bb.array()
  }
  private def tensor(name: String, dims: Seq[Int], data: Array[Float]): Array[Byte] =
    dims.toArray.flatMap(d => vint(1, d.toLong)) ++ vint(2, 1L) ++
      str(8, name) ++ ld(9, raw(data))
  private def node(op: String, ins: Seq[String], out: String,
                   attrs: Array[Byte] = Array.empty): Array[Byte] =
    ins.toArray.flatMap(str(1, _)) ++ str(2, out) ++ str(4, op) ++ attrs
  // AttributeProto: name=1, f=2 (fixed32), ints=8, type=20 (FLOAT=1, INTS=7)
  private def attrF(name: String, v: Float): Array[Byte] = {
    val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN); bb.putFloat(v)
    ld(5, str(1, name) ++ (varint((2 << 3) | 5) ++ bb.array()) ++ vint(20, 1L))
  }
  private def attrInts(name: String, vs: Seq[Long]): Array[Byte] =
    ld(5, str(1, name) ++ vs.toArray.flatMap(vint(8, _)) ++ vint(20, 7L))

  private val rng = new scala.util.Random(7)
  private val InDim = 8; private val Hidden = 16; private val OutDim = 512
  private val w1 = Array.fill(InDim * Hidden)((rng.nextDouble() * 0.5 - 0.25).toFloat)
  private val b1 = Array.fill(Hidden)((rng.nextDouble() * 0.1).toFloat)
  private val w2 = Array.fill(Hidden * OutDim)((rng.nextDouble() * 0.5 - 0.25).toFloat)

  private lazy val modelPath: String = {
    val graph =
      ld(1, node("MatMul", Seq("x", "W1"), "h1")) ++
      ld(1, node("Add", Seq("h1", "b1"), "h2")) ++
      ld(1, node("Tanh", Seq("h2"), "h3")) ++
      ld(1, node("MatMul", Seq("h3", "W2"), "emb")) ++
      ld(5, tensor("W1", Seq(InDim, Hidden), w1)) ++
      ld(5, tensor("b1", Seq(Hidden), b1)) ++
      ld(5, tensor("W2", Seq(Hidden, OutDim), w2)) ++
      ld(11, str(1, "x")) ++
      ld(12, str(1, "emb"))
    val model = ld(7, graph)
    val f = Files.createTempFile("graft_model", ".onnx")
    Files.write(f, model)
    f.toString
  }

  test("ONNX loader reads proto3 PACKED repeated fields (what real exporters emit)") {
    // packed dims: ONE length-delimited occurrence holding both varints
    def packedTensor(name: String, dims: Seq[Int], data: Array[Float]): Array[Byte] =
      ld(1, dims.toArray.flatMap(varint(_))) ++ vint(2, 1L) ++
        str(8, name) ++ ld(9, raw(data))
    val graph =
      ld(1, node("MatMul", Seq("x", "W"), "emb")) ++
      ld(5, packedTensor("W", Seq(4, 3), Array.tabulate(12)(_.toFloat))) ++
      ld(11, str(1, "x")) ++ ld(12, str(1, "emb"))
    val f = Files.createTempFile("graft_packed", ".onnx")
    Files.write(f, ld(7, graph))
    val m = OnnxLiteModel.load(f.toString)
    assert(m.inputDim == 4 && m.outputDim == 3)
    val out = m.run(Array(Array(1f, 0f, 0f, 0f)))(0)
    assert(out.toSeq == Seq(0f, 1f, 2f)) // first row of W
  }

  test("ONNX loader recovers graph structure and dimensions") {
    val m = OnnxLiteModel.load(modelPath)
    assert(m.inputName == "x" && m.outputName == "emb")
    assert(m.inputDim == InDim && m.outputDim == OutDim)
    assert(m.nodes.map(_._1) == Seq("MatMul", "Add", "Tanh", "MatMul"))
  }

  test("graph evaluation matches a hand-computed forward pass") {
    val m = OnnxLiteModel.load(modelPath)
    val x = Array.tabulate(InDim)(i => (i + 1) * 0.1f)
    val out = m.run(Array(x))(0)
    // same arithmetic, computed independently
    val h = Array.tabulate(Hidden) { j =>
      var s = 0f
      for (i <- 0 until InDim) s += x(i) * w1(i * Hidden + j)
      math.tanh((s + b1(j)).toDouble).toFloat
    }
    val expect = Array.tabulate(OutDim) { j =>
      var s = 0f
      for (i <- 0 until Hidden) s += h(i) * w2(i * OutDim + j)
      s
    }
    assert(out.length == OutDim)
    out.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < 1e-5f) }
  }

  test("OnnxEmbedder validates the expected dimension like the reference's 512/1024 check") {
    val ok = new OnnxEmbedder(modelPath, expectDim = Some(OutDim))
    assert(ok.dim == OutDim)
    val bad = new OnnxEmbedder(modelPath, expectDim = Some(1024))
    intercept[IllegalArgumentException](bad.dim)
  }

  test("embeddings are deterministic, normalized, and batch-invariant") {
    val e = new OnnxEmbedder(modelPath)
    val v1 = e.embed("fn cosine_similarity(a, b)")
    val v2 = e.embed("fn cosine_similarity(a, b)")
    assert(v1.toSeq == v2.toSeq)
    val n = math.sqrt(v1.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    // batching does not change per-text results
    val batch = e.embedBatch(Seq("fn cosine_similarity(a, b)", "def other(): pass"))
    assert(batch.head.toSeq == v1.toSeq)
  }

  // ----- one-layer attention encoder (the transformer op subset:
  // Gather token lookup, Q·Kᵀ attention with Softmax, residual Add,
  // LayerNormalization, ReduceMean pooling — embedding.rs:22-94's
  // model shape at toy scale) -----
  private val V = 32; private val D = 8
  private val emb = Array.fill(V * D)((rng.nextDouble() * 0.8 - 0.4).toFloat)
  private val wq = Array.fill(D * D)((rng.nextDouble() * 0.5 - 0.25).toFloat)
  private val wk = Array.fill(D * D)((rng.nextDouble() * 0.5 - 0.25).toFloat)
  private val wv = Array.fill(D * D)((rng.nextDouble() * 0.5 - 0.25).toFloat)
  private val gamma = Array.fill(D)(1f + (rng.nextDouble() * 0.2 - 0.1).toFloat)
  private val beta = Array.fill(D)((rng.nextDouble() * 0.1).toFloat)

  private lazy val attnModelPath: String = {
    val graph =
      ld(1, node("Gather", Seq("E", "ids"), "x")) ++
      ld(1, node("MatMul", Seq("x", "Wq"), "q")) ++
      ld(1, node("MatMul", Seq("x", "Wk"), "k")) ++
      ld(1, node("MatMul", Seq("x", "Wv"), "v")) ++
      ld(1, node("Transpose", Seq("k"), "kt")) ++
      ld(1, node("MatMul", Seq("q", "kt"), "scores")) ++
      ld(1, node("Mul", Seq("scores", "scale"), "scaled")) ++
      ld(1, node("Softmax", Seq("scaled"), "p")) ++
      ld(1, node("MatMul", Seq("p", "v"), "ctx")) ++
      ld(1, node("Add", Seq("ctx", "x"), "res")) ++
      ld(1, node("LayerNormalization", Seq("res", "gamma", "beta"), "ln",
        attrF("epsilon", 1e-5f))) ++
      ld(1, node("ReduceMean", Seq("ln"), "emb", attrInts("axes", Seq(0L)))) ++
      ld(5, tensor("E", Seq(V, D), emb)) ++
      ld(5, tensor("Wq", Seq(D, D), wq)) ++
      ld(5, tensor("Wk", Seq(D, D), wk)) ++
      ld(5, tensor("Wv", Seq(D, D), wv)) ++
      ld(5, tensor("scale", Seq(1), Array((1.0 / math.sqrt(D)).toFloat))) ++
      ld(5, tensor("gamma", Seq(D), gamma)) ++
      ld(5, tensor("beta", Seq(D), beta)) ++
      ld(11, str(1, "ids")) ++
      ld(12, str(1, "emb"))
    val f = Files.createTempFile("graft_attn", ".onnx")
    Files.write(f, ld(7, graph))
    f.toString
  }

  test("attention model loads as a token model with the right vocab and dim") {
    val m = OnnxLiteModel.load(attnModelPath)
    assert(m.tokenInput)
    assert(m.vocabSize == V)
    assert(m.outputDim == D)
  }

  test("attention evaluation matches a hand-computed encoder pass") {
    val m = OnnxLiteModel.load(attnModelPath)
    val ids = Array(3, 7, 7, 1)
    val out = m.runTokens(ids)
    // independent forward pass (doubles, straightforward formulation)
    val t = ids.length
    val x = ids.map(id => Array.tabulate(D)(j => emb(id * D + j).toDouble))
    def proj(w: Array[Float]) = x.map(row =>
      Array.tabulate(D)(j => (0 until D).map(i => row(i) * w(i * D + j)).sum))
    val q = proj(wq); val k = proj(wk); val v = proj(wv)
    val scale = 1.0 / math.sqrt(D)
    val p = Array.tabulate(t) { i =>
      val s = Array.tabulate(t)(j => (0 until D).map(d => q(i)(d) * k(j)(d)).sum * scale)
      val mx = s.max
      val e = s.map(z => math.exp(z - mx))
      val sum = e.sum
      e.map(_ / sum)
    }
    val res = Array.tabulate(t, D) { (i, j) =>
      (0 until t).map(z => p(i)(z) * v(z)(j)).sum + x(i)(j)
    }
    val ln = res.map { row =>
      val mean = row.sum / D
      val va = row.map(z => (z - mean) * (z - mean)).sum / D
      val inv = 1.0 / math.sqrt(va + 1e-5)
      Array.tabulate(D)(j => (row(j) - mean) * inv * gamma(j) + beta(j))
    }
    val expect = Array.tabulate(D)(j => (0 until t).map(i => ln(i)(j)).sum / t)
    assert(out.length == D)
    out.zip(expect).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-4, s"$a vs $b")
    }
  }

  test("attention model embeds deterministically through the Embedder front end") {
    val e = new OnnxEmbedder(attnModelPath, expectDim = Some(D))
    assert(e.dim == D)
    val v1 = e.embed("fn cosine_similarity(a, b)")
    assert(v1.toSeq == e.embed("fn cosine_similarity(a, b)").toSeq)
    val n = math.sqrt(v1.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    // different texts produce different vectors; empty text still embeds
    assert(e.embed("def other(): pass").toSeq != v1.toSeq)
    assert(e.embed("").length == D)
  }

  // ----- real tokenizers: vocab artifacts + checkpoint e2e (E1) -----

  test("WordPiece: greedy longest match, ## continuation, punctuation split, case folding, [UNK]") {
    val vocab = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##aff", "##able",
      "runn", "##ing", ",", "fn").zipWithIndex.toMap
    val tk = new WordPieceTokenizer(vocab)
    assert(tk.encode("unaffable", 16).toSeq == Seq(2, 4, 5, 6, 3))
    assert(tk.encode("UNAFFABLE", 16).toSeq == Seq(2, 4, 5, 6, 3))
    // BasicTokenizer rule: trailing punctuation is its own token
    assert(tk.encode("running,", 16).toSeq == Seq(2, 7, 8, 9, 3))
    // a word with no piece cover collapses to ONE [UNK]
    assert(tk.encode("xyzzy fn", 16).toSeq == Seq(2, 1, 10, 3))
    // the token budget includes the [CLS]/[SEP] wrapping
    assert(tk.encode("unaffable unaffable", 5).toSeq == Seq(2, 4, 5, 6, 3))
  }

  test("BPE: priority merge order (later merge exposes an earlier-rank pair) and space markers") {
    val G = BpeTokenizer.SpaceMarker
    val vocab = Seq("<unk>", "a", "b", "c", "ab", "abc", G + "ab").zipWithIndex.toMap
    // rank 0 = (ab, c), rank 1 = (a, b): PRIORITY application merges
    // (a, b) first, which exposes the rank-0 pair — a one-pass-per-merge
    // scheme (Bpe.encode's training-order rule) would stop at [ab, c]
    val merges = Seq(("ab", "c"), ("a", "b"), (G, "ab"))
    val tk = new BpeTokenizer(vocab, merges)
    assert(tk.encode("abc", 16).toSeq == Seq(vocab("abc")))
    // non-initial words carry the GPT-2 space marker
    assert(tk.encode("c ab", 16).toSeq == Seq(vocab("c"), vocab(G + "ab")))
    // unmapped symbol -> <unk>
    assert(tk.encode("z", 16).toSeq == Seq(0))
  }

  test("WordPiece cross-encoder pair: one CLS, SEP-separated halves, never a mid-sequence CLS") {
    val vocab = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "b").zipWithIndex.toMap
    val tk = new WordPieceTokenizer(vocab)
    // [CLS] a [SEP] b [SEP] — the BERT trained pair format
    assert(tk.encodePair("a", "b", 16).toSeq == Seq(2, 4, 3, 5, 3))
    // doc fills what the query leaves; a long query keeps half the window
    val pair = tk.encodePair("a a a a a a a a a a", "b b b b b b", 8)
    assert(pair.length <= 8)
    assert(pair.count(_ == 2) == 1, "exactly one [CLS]")
    assert(pair.count(_ == 3) == 2, "exactly two [SEP]s")
  }

  test("BPE merges: '#'-leading rules are real merges; only the #version header is skipped") {
    val dir = Files.createTempDirectory("graft_bpe_hash")
    Files.write(dir.resolve("vocab.json"),
      """{"<unk>": 0, "#": 1, "##": 2}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.write(dir.resolve("merges.txt"),
      "#version: 0.2\n# #\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val tk = BpeTokenizer.fromFiles(s"$dir/vocab.json", s"$dir/merges.txt")
    // the "# #" rule survives loading, so '##' merges to its vocab token
    assert(tk.encode("##", 8).toSeq == Seq(2))
  }

  test("BPE artifacts load from vocab.json + merges.txt") {
    val dir = Files.createTempDirectory("graft_bpe_artifacts")
    val G = BpeTokenizer.SpaceMarker
    Files.write(dir.resolve("vocab.json"),
      s"""{"<unk>": 0, "a": 1, "b": 2, "ab": 3, "\\u0120a": 4}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.write(dir.resolve("merges.txt"),
      s"#version: 0.2\na b\n$G a\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val tk = BpeTokenizer.fromFiles(s"$dir/vocab.json", s"$dir/merges.txt")
    assert(tk.vocabSize == 5)
    assert(tk.encode("ab", 8).toSeq == Seq(3))
    assert(tk.encode("b a", 8).toSeq == Seq(2, 4))
  }

  /** A model DIRECTORY the way real checkpoints ship: the .onnx next
    * to its vocab.txt. Vocab ids stay under the embedding table's
    * V=32 rows. */
  private lazy val realModelDir: String = {
    val dir = Files.createTempDirectory("graft_real_model")
    Files.copy(java.nio.file.Paths.get(attnModelPath), dir.resolve("model.onnx"))
    val vocab = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "fn", "cosine",
      "similar", "##ity", "def", "other", "pass")
    Files.write(dir.resolve("vocab.txt"),
      vocab.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir.toString
  }

  test("E1 e2e: checkpoint + shipped vocabulary reproduce hand-tokenized embeddings") {
    val e = new OnnxEmbedder(s"$realModelDir/model.onnx", expectDim = Some(D))
    val got = e.embed("fn cosine similarity")
    // tokenization pinned by hand against the vocab above:
    // [CLS] fn cosine similar ##ity [SEP]
    val ids = Array(2, 4, 5, 6, 7, 3)
    val m = OnnxLiteModel.load(attnModelPath)
    val raw = m.runTokens(ids)
    val n = math.sqrt(raw.map(x => x.toDouble * x.toDouble).sum)
    val expect = raw.map(x => (x / n).toFloat)
    assert(got.toSeq == expect.toSeq,
      "embedder must produce exactly the checkpoint's output for the hand-derived ids")
    // the real tokenizer changes results vs the hash fallback: same
    // model without the vocab tokenizes differently
    val fallback = new OnnxEmbedder(attnModelPath, expectDim = Some(D))
    assert(fallback.embed("fn cosine similarity").toSeq != got.toSeq)
    // distinct text -> distinct tokens -> distinct vector; determinism
    assert(e.embed("def other pass").toSeq != got.toSeq)
    assert(e.embed("fn cosine similarity").toSeq == got.toSeq)
  }

  test("E1+E2 e2e: the vocab-backed checkpoint embeds chunks executor-side") {
    import spark.implicits._
    val chunks = spark.createDataset(
      (1 to 24).map(i => CodeChunk(s"f$i.py", s"def other pass $i", Some("Python"), Some("py"))))
    val rows = Embed.embedChunks(spark, chunks,
      new OnnxEmbedder(s"$realModelDir/model.onnx")).collect()
    assert(rows.length == 24)
    assert(rows.forall(_.vector.length == D))
    // driver-side single-text path agrees with the executor batch path
    val e = new OnnxEmbedder(s"$realModelDir/model.onnx")
    rows.foreach { r => assert(r.vector.toSeq == e.embed(r.code).toSeq) }
  }

  // ----- cross-encoder: the same attention block plus a [D, 1] scalar
  // head — rerank.rs:7-19's interaction shape at toy scale -----
  private lazy val rerankModelPath: String = {
    val head = Array.fill(D)((rng.nextDouble() * 0.5 - 0.25).toFloat)
    val graph =
      ld(1, node("Gather", Seq("E", "ids"), "x")) ++
      ld(1, node("MatMul", Seq("x", "Wq"), "q")) ++
      ld(1, node("MatMul", Seq("x", "Wk"), "k")) ++
      ld(1, node("MatMul", Seq("x", "Wv"), "v")) ++
      ld(1, node("Transpose", Seq("k"), "kt")) ++
      ld(1, node("MatMul", Seq("q", "kt"), "scores")) ++
      ld(1, node("Mul", Seq("scores", "scale"), "scaled")) ++
      ld(1, node("Softmax", Seq("scaled"), "p")) ++
      ld(1, node("MatMul", Seq("p", "v"), "ctx")) ++
      ld(1, node("Add", Seq("ctx", "x"), "res")) ++
      ld(1, node("LayerNormalization", Seq("res", "gamma", "beta"), "ln",
        attrF("epsilon", 1e-5f))) ++
      ld(1, node("ReduceMean", Seq("ln"), "pooled", attrInts("axes", Seq(0L)))) ++
      ld(1, node("MatMul", Seq("pooled", "Whead"), "score")) ++
      ld(5, tensor("E", Seq(V, D), emb)) ++
      ld(5, tensor("Wq", Seq(D, D), wq)) ++
      ld(5, tensor("Wk", Seq(D, D), wk)) ++
      ld(5, tensor("Wv", Seq(D, D), wv)) ++
      ld(5, tensor("scale", Seq(1), Array((1.0 / math.sqrt(D)).toFloat))) ++
      ld(5, tensor("gamma", Seq(D), gamma)) ++
      ld(5, tensor("beta", Seq(D), beta)) ++
      ld(5, tensor("Whead", Seq(D, 1), head)) ++
      ld(11, str(1, "ids")) ++
      ld(12, str(1, "score"))
    val f = Files.createTempFile("graft_rerank", ".onnx")
    Files.write(f, ld(7, graph))
    f.toString
  }

  test("ONNX cross-encoder scores (query, doc) pairs deterministically") {
    val rr = new graft.chat.OnnxReranker(rerankModelPath)
    val docs = Seq("fn cosine_similarity(a, b) -> f32", "use std::fs::File;", "")
    val s1 = rr.rerank("cosine similarity search", docs)
    val s2 = rr.rerank("cosine similarity search", docs)
    assert(s1 == s2)
    assert(s1.size == docs.size)
    // the score is an interaction: changing the QUERY moves the scores
    val s3 = rr.rerank("open a file handle", docs)
    assert(s1 != s3)
    // a non-cross-encoder model (wide output) is rejected loudly
    intercept[IllegalArgumentException] {
      new graft.chat.OnnxReranker(attnModelPath).rerank("q", Seq("d"))
    }
  }

  test("crossRerank engages the ONNX cross-encoder over the candidate window") {
    import spark.implicits._
    val window = Seq(
      ("a.rs", "fn cosine_similarity(a, b) -> f32", 0.10),
      ("b.rs", "use std::fs::File;", 0.20),
      ("c.rs", "fn main() { println!(\"hi\") }", 0.30)
    ).toDF("path", "code", "distance")
    val out = graft.chat.Retrieval.crossRerank(
      window, "cosine similarity search", new graft.chat.OnnxReranker(rerankModelPath))
      .collect()
    assert(out.length == 3)
    // R2 contract: sorted by the cross-encoder score, descending
    val scores = out.map(_.getAs[Double]("rerank_score")).toSeq
    assert(scores == scores.sorted.reverse)
    assert(out.map(_.getAs[String]("path")).toSet == Set("a.rs", "b.rs", "c.rs"))
  }

  test("Rerankers.fromEnv gates on the model-path variable") {
    assert(graft.chat.Rerankers.fromEnv(Map.empty)
      .isInstanceOf[graft.chat.TfidfReranker])
    assert(graft.chat.Rerankers.fromEnv(Map("GRAFT_RERANK_ONNX" -> rerankModelPath))
      .isInstanceOf[graft.chat.OnnxReranker])
  }

  test("crossRerank refuses a corpus-sized input (F1 window guard)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val big = spark.range(0, graft.chat.Retrieval.MaxRerankWindow + 1L)
      .select(col("id").cast("string").as("path"), col("id").cast("string").as("code"),
        col("id").cast("double").as("distance"))
    intercept[IllegalArgumentException] {
      graft.chat.Retrieval.crossRerank(big, "query")
    }
  }

  test("embedChunks runs the attention encoder executor-side (E2 path)") {
    import spark.implicits._
    val chunks = spark.createDataset(
      (1 to 40).map(i => CodeChunk(s"f$i.py", s"def code_$i(): return $i", Some("Python"), Some("py"))))
    val rows = Embed.embedChunks(spark, chunks, new OnnxEmbedder(attnModelPath)).collect()
    assert(rows.length == 40)
    assert(rows.forall(_.vector.length == D))
    val byContent = rows.groupBy(_.code).map { case (_, rs) => rs.map(_.vector.toSeq).distinct.size }
    assert(byContent.forall(_ == 1))
  }

  test("embedChunks runs the ONNX session executor-side in batches") {
    import spark.implicits._
    val chunks = spark.createDataset(
      (1 to 70).map(i => CodeChunk(s"f$i.rs", s"fn code_$i() {}", Some("Rust"), Some("rs"))))
    val rows = Embed.embedChunks(spark, chunks, new OnnxEmbedder(modelPath)).collect()
    assert(rows.length == 70)
    assert(rows.forall(_.vector.length == OutDim))
    // stable ids 0..n-1 and content-determined vectors
    assert(rows.map(_.chunk_id).sorted.toSeq == (0L until 70L))
    val byContent = rows.groupBy(_.code).map { case (_, rs) => rs.map(_.vector.toSeq).distinct.size }
    assert(byContent.forall(_ == 1))
  }
}
