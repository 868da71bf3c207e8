package graft.chat

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.concurrent.TrieMap

/** E1: real-model embedding sessions (reference:
  * /root/reference/src/embedding.rs:63-94 — resolve a local ONNX model,
  * load it once, embed in batches, validate the output dimension
  * against the model family, 512 Jina / 1024 Qwen3).
  *
  * No ONNX runtime ships in this environment, so this is a
  * self-contained reader/evaluator for the ONNX FORMAT itself (the
  * protobuf wire format and op semantics are public spec): enough of
  * ModelProto to load initializer tensors and the node graph, and an
  * evaluator for the MLP op subset (MatMul / Add / Tanh / Relu /
  * Identity). The session-lifecycle architecture is the real thing —
  * one parsed model per executor JVM (lazy, keyed by path), batched
  * inference inside mapPartitions, dimension validation at load — so a
  * full onnxruntime binding would replace only the `run` internals.
  */
object ProtoReader {

  /** One decoded protobuf field occurrence. */
  final case class Field(num: Int, varint: Long, bytes: Array[Byte])

  /** Decode a serialized message into its field occurrences (in order).
    * Wire types: 0 varint, 1 fixed64, 2 length-delimited, 5 fixed32. */
  def fields(buf: Array[Byte], from: Int = 0, until: Int = -1): Seq[Field] = {
    val end = if (until < 0) buf.length else until
    val out = scala.collection.mutable.ArrayBuffer.empty[Field]
    var pos = from
    def varint(): Long = {
      var shift = 0; var v = 0L
      var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    while (pos < end) {
      val tag = varint()
      val num = (tag >> 3).toInt
      (tag & 7) match {
        case 0 => out += Field(num, varint(), null)
        case 1 => out += Field(num, 0L, buf.slice(pos, pos + 8)); pos += 8
        case 2 =>
          val len = varint().toInt
          out += Field(num, 0L, buf.slice(pos, pos + len)); pos += len
        case 5 => out += Field(num, 0L, buf.slice(pos, pos + 4)); pos += 4
        case w => throw new IllegalArgumentException(s"unsupported wire type $w")
      }
    }
    out.toSeq
  }

  def utf8(b: Array[Byte]): String = new String(b, java.nio.charset.StandardCharsets.UTF_8)

  /** Packed little-endian float32 payload. */
  def floats(b: Array[Byte]): Array[Float] = {
    val fb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    val out = new Array[Float](fb.remaining()); fb.get(out); out
  }

  /** Packed varint payload (proto3 packs repeated scalar fields into
    * ONE length-delimited occurrence — every real ONNX exporter writes
    * `dims` this way; unpacked per-element varints remain legal and
    * must also parse). */
  def packedVarints(b: Array[Byte]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 0
    while (pos < b.length) {
      var shift = 0; var v = 0L; var byte = 0
      do {
        byte = b(pos) & 0xff; pos += 1
        v |= (byte & 0x7fL) << shift; shift += 7
      } while ((byte & 0x80) != 0)
      out += v
    }
    out.toSeq
  }
}

/** A loaded ONNX graph restricted to the MLP subset. Tensors are
  * row-major (rows, cols, data); 1-D tensors have rows = 1. */
final class OnnxLiteModel(
    val inputName: String,
    val outputName: String,
    val nodes: Seq[(String, Seq[String], String)], // (opType, inputs, output)
    val tensors: Map[String, (Int, Int, Array[Float])]) extends Serializable {

  /** Input feature width expected by the first MatMul. */
  val inputDim: Int =
    nodes.collectFirst { case ("MatMul", ins, _) if ins.head == inputName =>
      tensors(ins(1))._1
    }.getOrElse(throw new IllegalArgumentException("graph has no MatMul on the input"))

  /** Output embedding width (cols of the value feeding the output). */
  val outputDim: Int = {
    val dims = scala.collection.mutable.Map[String, Int](inputName -> inputDim)
    nodes.foreach {
      case ("MatMul", ins, out) => dims(out) = tensors(ins(1))._2
      case (_, ins, out)        => dims(out) = dims.getOrElse(ins.head, -1)
    }
    dims.getOrElse(outputName,
      throw new IllegalArgumentException(s"output $outputName not produced by the graph"))
  }

  /** Evaluate the graph for a batch of input rows ([B, inputDim]). */
  def run(batch: Array[Array[Float]]): Array[Array[Float]] = {
    require(batch.forall(_.length == inputDim),
      s"input rows must have dim $inputDim")
    val values = scala.collection.mutable.Map[String, Array[Array[Float]]](
      inputName -> batch)
    def tensorRows(name: String): Array[Array[Float]] =
      values.getOrElse(name, {
        val (r, c, d) = tensors(name)
        Array.tabulate(math.max(r, 1))(i => d.slice(i * c, (i + 1) * c))
      })
    nodes.foreach { case (op, ins, out) =>
      val a = tensorRows(ins.head)
      values(out) = op match {
        case "MatMul" =>
          val (k, m, w) = tensors(ins(1))
          a.map { row =>
            require(row.length == k, s"MatMul dim mismatch: ${row.length} vs $k")
            val o = new Array[Float](m)
            var i = 0
            while (i < k) {
              val x = row(i)
              if (x != 0f) {
                var j = 0
                while (j < m) { o(j) += x * w(i * m + j); j += 1 }
              }
              i += 1
            }
            o
          }
        case "Add" =>
          val b = tensorRows(ins(1))
          a.zipWithIndex.map { case (row, r) =>
            val bias = if (b.length == 1) b(0) else b(r)
            Array.tabulate(row.length)(j => row(j) + bias(j))
          }
        case "Tanh"     => a.map(_.map(x => math.tanh(x.toDouble).toFloat))
        case "Relu"     => a.map(_.map(x => math.max(0f, x)))
        case "Identity" => a
        case other => throw new IllegalArgumentException(s"unsupported op $other")
      }
    }
    values(outputName)
  }
}

object OnnxLiteModel {
  import ProtoReader._

  // onnx.proto3 field numbers (public ONNX spec)
  private val ModelGraph = 7
  private val GraphNode = 1; private val GraphInit = 5
  private val GraphInput = 11; private val GraphOutput = 12
  private val NodeInput = 1; private val NodeOutput = 2; private val NodeOp = 4
  private val TDims = 1; private val TDataType = 2; private val TFloatData = 4
  private val TName = 8; private val TRawData = 9
  private val ValueName = 1

  def load(path: String): OnnxLiteModel = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val graph = fields(bytes).collectFirst { case Field(ModelGraph, _, b) => b }
      .getOrElse(throw new IllegalArgumentException(s"$path: no graph in ModelProto"))
    val gf = fields(graph)
    val tensors = gf.collect { case Field(GraphInit, _, b) =>
      val tf = fields(b)
      val name = tf.collectFirst { case Field(TName, _, nb) => utf8(nb) }.getOrElse("")
      // dims: packed (single length-delimited field — what real ONNX
      // exporters emit) or unpacked (one varint per element)
      val dims = tf.flatMap {
        case Field(TDims, v, null) => Seq(v.toInt)
        case Field(TDims, _, pb)   => packedVarints(pb).map(_.toInt)
        case _ => Seq.empty
      }
      val dtype = tf.collectFirst { case Field(TDataType, v, null) => v }.getOrElse(1L)
      require(dtype == 1L, s"tensor $name: only float32 supported, got $dtype")
      // float_data may likewise be packed (one occurrence) or unpacked
      // (one fixed32 per element) — concatenating occurrences handles both
      val floatData = tf.collect { case Field(TFloatData, _, fb) => fb }
      val data = tf.collectFirst { case Field(TRawData, _, rb) => floats(rb) }
        .orElse(if (floatData.isEmpty) None
                else Some(floats(floatData.reduce(_ ++ _))))
        .getOrElse(Array.empty[Float])
      val (r, c) = dims match {
        case Seq(n)    => (1, n)
        case Seq(a, b2) => (a, b2)
        case other     => throw new IllegalArgumentException(
          s"tensor $name: rank ${other.size} unsupported")
      }
      name -> (r, c, data)
    }.toMap
    val nodes = gf.collect { case Field(GraphNode, _, b) =>
      val nf = fields(b)
      val op = nf.collectFirst { case Field(NodeOp, _, ob) => utf8(ob) }.getOrElse("")
      val ins = nf.collect { case Field(NodeInput, _, ib) => utf8(ib) }
      val out = nf.collectFirst { case Field(NodeOutput, _, ob) => utf8(ob) }.getOrElse("")
      (op, ins, out)
    }
    def valueName(fieldNum: Int): String =
      gf.collectFirst { case Field(`fieldNum`, _, b) =>
        fields(b).collectFirst { case Field(ValueName, _, nb) => utf8(nb) }.getOrElse("")
      }.getOrElse("")
    new OnnxLiteModel(valueName(GraphInput), valueName(GraphOutput), nodes, tensors)
  }

  /** Executor-side session cache: one parsed model per JVM per path
    * (the mapPartitions tasks share it; tasks serialize only the
    * path). */
  private val sessions = TrieMap.empty[String, OnnxLiteModel]
  def session(path: String): OnnxLiteModel =
    sessions.getOrElseUpdate(path, load(path))
}

/** Embedder backed by an ONNX model file. Featurization is the
  * deterministic hashed-bag front end (same md5 bucket scheme as
  * HashingEmbedder, at the model's input width); the model then maps
  * features to the embedding space and the result is L2-normalized —
  * the reference's embed shape with the model swapped in behind the
  * same trait.
  *
  * `expectDim` mirrors the reference's dimension validation
  * (main.rs:554-565 512-then-1024 fallback): loading fails fast if the
  * model's output width differs. */
class OnnxEmbedder(modelPath: String, expectDim: Option[Int] = None) extends Embedder {

  @transient private lazy val model = {
    val m = OnnxLiteModel.session(modelPath)
    expectDim.foreach(d => require(m.outputDim == d,
      s"model $modelPath produces dim ${m.outputDim}, expected $d"))
    m
  }

  override def dim: Int = model.outputDim

  private def features(text: String): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val v = new Array[Float](model.inputDim)
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
      val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val bucket = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % model.inputDim
      v(bucket) += 1f
    }
    val n = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    if (n > 0) v.map(x => (x / n).toFloat) else v
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    model.run(texts.map(features).toArray).toSeq.map { e =>
      val n = math.sqrt(e.map(x => x.toDouble * x.toDouble).sum)
      if (n > 0) e.map(x => (x / n).toFloat) else e
    }
}
