package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import graft.chat.{Embed, OnnxEmbedder, OnnxLiteModel}
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
  private def node(op: String, ins: Seq[String], out: String): Array[Byte] =
    ins.toArray.flatMap(str(1, _)) ++ str(2, out) ++ str(4, op)

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
