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
  * ModelProto to load initializer tensors, node attributes, and the
  * graph, and an evaluator for two model families —
  *
  *  - MLP feature models: MatMul / Add / Tanh / Relu / Identity over a
  *    hashed-bag feature vector (the round-1 path);
  *  - transformer encoders: Gather (token-embedding lookup), general
  *    MatMul over COMPUTED operands (Q·Kᵀ, P·V), Transpose, scalar
  *    Mul/Div, Softmax, LayerNormalization, residual Add, ReduceMean
  *    pooling — i.e. a real single/multi-layer attention encoder
  *    evaluated per token sequence.
  *
  * The session-lifecycle architecture is the real thing — one parsed
  * model per executor JVM (lazy, keyed by path), batched inference
  * inside mapPartitions, dimension validation at load — so a full
  * onnxruntime binding would replace only the evaluation internals.
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

  def float32(b: Array[Byte]): Float =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getFloat()

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

/** Parsed node attributes (the subset transformer graphs carry):
  * `epsilon` (float), `axis`/`to` (int), `perm`/`axes` (ints). */
final case class OnnxAttr(f: Option[Float], i: Option[Long], ints: Seq[Long])
  extends Serializable

/** A loaded ONNX graph. Values are row-major matrices (rows, cols,
  * data); 1-D tensors have rows = 1. Transformer models are evaluated
  * one token SEQUENCE at a time with the sequence as the row axis —
  * [T, D] activations — which keeps every op rank-2 without losing the
  * encoder semantics (batch-of-one inference, exactly what the
  * reference's embed loop does per chunk batch entry). */
final class OnnxLiteModel(
    val inputName: String,
    val outputName: String,
    val nodes: Seq[(String, Seq[String], String)], // (opType, inputs, output)
    val tensors: Map[String, (Int, Int, Array[Float])],
    val attrs: Seq[Map[String, OnnxAttr]] = Seq.empty) extends Serializable {

  private def attr(idx: Int, name: String): Option[OnnxAttr] =
    attrs.lift(idx).flatMap(_.get(name))

  /** True when the graph input is the INDICES operand of a Gather —
    * i.e. the model expects token ids, not a feature vector. */
  val tokenInput: Boolean = nodes.exists {
    case ("Gather", ins, _) => ins.length > 1 && ins(1) == inputName
    case _                  => false
  }

  /** Vocabulary size for token models (rows of the embedding table the
    * graph input indexes into). */
  val vocabSize: Int =
    nodes.collectFirst { case ("Gather", ins, _) if ins(1) == inputName =>
      tensors(ins.head)._1
    }.getOrElse(-1)

  /** Input feature width expected by the first MatMul (feature models
    * only; token models consume a variable-length id sequence). */
  val inputDim: Int =
    if (tokenInput) -1
    else nodes.collectFirst { case ("MatMul", ins, _) if ins.head == inputName =>
      tensors(ins(1))._1
    }.getOrElse(throw new IllegalArgumentException("graph has no MatMul on the input"))

  private final case class Mat(rows: Int, cols: Int, data: Array[Float])

  private def eval(input: Mat): Mat = {
    val values = scala.collection.mutable.Map[String, Mat](inputName -> input)
    def get(name: String): Mat =
      values.getOrElse(name, {
        val (r, c, d) = tensors.getOrElse(name,
          throw new IllegalArgumentException(s"unknown value $name"))
        Mat(math.max(r, 1), c, d)
      })
    nodes.zipWithIndex.foreach { case ((op, ins, out), idx) =>
      val a = get(ins.head)
      values(out) = op match {
        case "MatMul" =>
          val b = get(ins(1))
          require(a.cols == b.rows, s"MatMul dim mismatch: ${a.cols} vs ${b.rows}")
          val o = new Array[Float](a.rows * b.cols)
          var i = 0
          while (i < a.rows) {
            var p = 0
            while (p < a.cols) {
              val x = a.data(i * a.cols + p)
              if (x != 0f) {
                var j = 0
                while (j < b.cols) { o(i * b.cols + j) += x * b.data(p * b.cols + j); j += 1 }
              }
              p += 1
            }
            i += 1
          }
          Mat(a.rows, b.cols, o)
        case "Add" | "Mul" | "Div" | "Sub" =>
          val b = get(ins(1))
          val f: (Float, Float) => Float = op match {
            case "Add" => _ + _
            case "Mul" => _ * _
            case "Div" => _ / _
            case _     => _ - _
          }
          val o = new Array[Float](a.rows * a.cols)
          if (b.rows * b.cols == 1) { // scalar broadcast (attention scale)
            val s = b.data(0)
            var i = 0; while (i < o.length) { o(i) = f(a.data(i), s); i += 1 }
          } else if (b.rows == 1 && b.cols == a.cols) { // row broadcast (bias)
            var i = 0
            while (i < a.rows) {
              var j = 0
              while (j < a.cols) { o(i * a.cols + j) = f(a.data(i * a.cols + j), b.data(j)); j += 1 }
              i += 1
            }
          } else { // elementwise (residual add)
            require(b.rows == a.rows && b.cols == a.cols,
              s"$op shape mismatch: ${a.rows}x${a.cols} vs ${b.rows}x${b.cols}")
            var i = 0; while (i < o.length) { o(i) = f(a.data(i), b.data(i)); i += 1 }
          }
          Mat(a.rows, a.cols, o)
        case "Gather" =>
          // ONNX Gather(data, indices) on axis 0: the token-embedding
          // lookup. Indices arrive as the float-encoded id sequence.
          val idx = get(ins(1))
          val table = a
          val t = idx.rows * idx.cols
          val o = new Array[Float](t * table.cols)
          var i = 0
          while (i < t) {
            val id = idx.data(i).toInt
            require(id >= 0 && id < table.rows, s"Gather index $id out of [0, ${table.rows})")
            System.arraycopy(table.data, id * table.cols, o, i * table.cols, table.cols)
            i += 1
          }
          Mat(t, table.cols, o)
        case "Transpose" =>
          // rank-2: perm [0, 1] is the identity (some exporters leave
          // it behind), [1, 0] — or the ONNX default, which reverses
          // the axes — swaps; anything else would silently corrupt the
          // tensor, so reject loudly like unsupported ops
          val perm = attr(idx, "perm").map(_.ints)
          require(perm.forall(p => p == Seq(1L, 0L) || p == Seq(0L, 1L)),
            s"Transpose perm ${perm.get} unsupported at rank 2")
          if (perm.contains(Seq(0L, 1L))) a
          else {
            val o = new Array[Float](a.rows * a.cols)
            var i = 0
            while (i < a.rows) {
              var j = 0
              while (j < a.cols) { o(j * a.rows + i) = a.data(i * a.cols + j); j += 1 }
              i += 1
            }
            Mat(a.cols, a.rows, o)
          }
        case "Softmax" =>
          // last axis (the opset-13 default), max-subtracted for
          // stability; any other axis would softmax the wrong way
          attr(idx, "axis").flatMap(_.i).foreach(ax => require(ax == -1 || ax == 1,
            s"Softmax axis $ax unsupported at rank 2"))
          val o = new Array[Float](a.rows * a.cols)
          var i = 0
          while (i < a.rows) {
            var mx = Float.NegativeInfinity
            var j = 0
            while (j < a.cols) { mx = math.max(mx, a.data(i * a.cols + j)); j += 1 }
            var s = 0.0
            j = 0
            while (j < a.cols) {
              val e = math.exp((a.data(i * a.cols + j) - mx).toDouble)
              o(i * a.cols + j) = e.toFloat; s += e; j += 1
            }
            j = 0
            while (j < a.cols) { o(i * a.cols + j) = (o(i * a.cols + j) / s).toFloat; j += 1 }
            i += 1
          }
          Mat(a.rows, a.cols, o)
        case "LayerNormalization" =>
          // per-row over the last axis: (x - mean) / sqrt(var + eps) * scale + bias
          attr(idx, "axis").flatMap(_.i).foreach(ax => require(ax == -1 || ax == 1,
            s"LayerNormalization axis $ax unsupported at rank 2"))
          val eps = attr(idx, "epsilon").flatMap(_.f).getOrElse(1e-5f).toDouble
          val scale = get(ins(1))
          val bias = if (ins.length > 2) Some(get(ins(2))) else None
          val o = new Array[Float](a.rows * a.cols)
          var i = 0
          while (i < a.rows) {
            var mean = 0.0
            var j = 0
            while (j < a.cols) { mean += a.data(i * a.cols + j); j += 1 }
            mean /= a.cols
            var v = 0.0
            j = 0
            while (j < a.cols) { val d = a.data(i * a.cols + j) - mean; v += d * d; j += 1 }
            val inv = 1.0 / math.sqrt(v / a.cols + eps)
            j = 0
            while (j < a.cols) {
              val n = (a.data(i * a.cols + j) - mean) * inv * scale.data(j) +
                bias.map(_.data(j).toDouble).getOrElse(0.0)
              o(i * a.cols + j) = n.toFloat; j += 1
            }
            i += 1
          }
          Mat(a.rows, a.cols, o)
        case "ReduceMean" =>
          // axes from the attribute (opset <= 13) or a second
          // initializer input (opset 18+); the pooling use is axes=[0].
          // The ONNX no-axes default means reduce ALL axes — not
          // expressible here, so its absence is an error, not a guess.
          val axesRaw = attr(idx, "axes").map(_.ints)
            .orElse(if (ins.length > 1) Some(tensors(ins(1))._3.map(_.toLong).toSeq) else None)
            .getOrElse(throw new IllegalArgumentException(
              "ReduceMean without axes (reduce-all) is unsupported"))
          val axes = axesRaw.map(x => if (x < 0) x + 2 else x)
          if (axes == Seq(0L)) { // mean over the sequence axis -> [1, D]
            val o = new Array[Float](a.cols)
            var i = 0
            while (i < a.rows) {
              var j = 0
              while (j < a.cols) { o(j) += a.data(i * a.cols + j); j += 1 }
              i += 1
            }
            var j = 0
            while (j < a.cols) { o(j) /= a.rows; j += 1 }
            Mat(1, a.cols, o)
          } else { // mean over the feature axis -> [T, 1]
            require(axes == Seq(1L), s"ReduceMean axes $axes unsupported")
            val o = new Array[Float](a.rows)
            var i = 0
            while (i < a.rows) {
              var s = 0f
              var j = 0
              while (j < a.cols) { s += a.data(i * a.cols + j); j += 1 }
              o(i) = s / a.cols; i += 1
            }
            Mat(a.rows, 1, o)
          }
        case "Tanh"     => Mat(a.rows, a.cols, a.data.map(x => math.tanh(x.toDouble).toFloat))
        case "Relu"     => Mat(a.rows, a.cols, a.data.map(x => math.max(0f, x)))
        case "Sqrt"     => Mat(a.rows, a.cols, a.data.map(x => math.sqrt(x.toDouble).toFloat))
        case "Identity" => a
        case other => throw new IllegalArgumentException(s"unsupported op $other")
      }
    }
    values.getOrElse(outputName,
      throw new IllegalArgumentException(s"output $outputName not produced by the graph"))
  }

  /** Output embedding width, established by a dry forward pass (static
    * shape propagation cannot see through Transpose/Gather chains; one
    * tiny inference at load time can). */
  val outputDim: Int =
    if (tokenInput) runTokens(Array(0)).length
    else eval(Mat(1, inputDim, new Array[Float](inputDim))).cols

  /** Evaluate a feature-model graph for a batch of input rows
    * ([B, inputDim]). */
  def run(batch: Array[Array[Float]]): Array[Array[Float]] = {
    require(!tokenInput, "token models take runTokens(ids), not feature rows")
    require(batch.forall(_.length == inputDim), s"input rows must have dim $inputDim")
    val out = eval(Mat(batch.length, inputDim, batch.flatten))
    Array.tabulate(out.rows)(i => out.data.slice(i * out.cols, (i + 1) * out.cols))
  }

  /** Evaluate a transformer graph for one token-id sequence; returns
    * the pooled sentence vector (graphs that emit [T, D] token states
    * are mean-pooled here, matching sentence-transformer pooling). */
  def runTokens(ids: Array[Int]): Array[Float] = {
    require(tokenInput, "feature models take run(batch), not token ids")
    require(ids.nonEmpty, "empty token sequence")
    val out = eval(Mat(ids.length, 1, ids.map(_.toFloat)))
    if (out.rows == 1) out.data
    else {
      val o = new Array[Float](out.cols)
      var i = 0
      while (i < out.rows) {
        var j = 0
        while (j < out.cols) { o(j) += out.data(i * out.cols + j); j += 1 }
        i += 1
      }
      var j = 0
      while (j < out.cols) { o(j) /= out.rows; j += 1 }
      o
    }
  }
}

object OnnxLiteModel {
  import ProtoReader._

  // onnx.proto3 field numbers (public ONNX spec)
  private val ModelGraph = 7
  private val GraphNode = 1; private val GraphInit = 5
  private val GraphInput = 11; private val GraphOutput = 12
  private val NodeInput = 1; private val NodeOutput = 2; private val NodeOp = 4
  private val NodeAttr = 5
  private val AttrName = 1; private val AttrF = 2; private val AttrI = 3
  private val AttrInts = 8
  private val TDims = 1; private val TDataType = 2; private val TFloatData = 4
  private val TInt64Data = 7
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
      // float32 tensors carry weights; int64 tensors carry axes/ids
      // (e.g. a ReduceMean axes input) and are widened to float
      require(dtype == 1L || dtype == 7L,
        s"tensor $name: only float32/int64 supported, got $dtype")
      val floatData = tf.collect { case Field(TFloatData, _, fb) => fb }
      val intData = tf.flatMap {
        case Field(TInt64Data, v, null) => Seq(v)
        case Field(TInt64Data, _, pb)   => packedVarints(pb)
        case _ => Seq.empty
      }
      val data = tf.collectFirst { case Field(TRawData, _, rb) =>
          if (dtype == 7L) { // raw little-endian int64s
            val lb = ByteBuffer.wrap(rb).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer()
            val out = new Array[Long](lb.remaining()); lb.get(out); out.map(_.toFloat)
          } else floats(rb)
        }
        .orElse(if (intData.nonEmpty) Some(intData.map(_.toFloat).toArray) else None)
        .orElse(if (floatData.isEmpty) None else Some(floats(floatData.reduce(_ ++ _))))
        .getOrElse(Array.empty[Float])
      val (r, c) = dims match {
        case Seq(n)    => (1, n)
        case Seq(a, b2) => (a, b2)
        case other     => throw new IllegalArgumentException(
          s"tensor $name: rank ${other.size} unsupported")
      }
      name -> (r, c, data)
    }.toMap
    val nodesWithAttrs = gf.collect { case Field(GraphNode, _, b) =>
      val nf = fields(b)
      val op = nf.collectFirst { case Field(NodeOp, _, ob) => utf8(ob) }.getOrElse("")
      val ins = nf.collect { case Field(NodeInput, _, ib) => utf8(ib) }
      val out = nf.collectFirst { case Field(NodeOutput, _, ob) => utf8(ob) }.getOrElse("")
      val at = nf.collect { case Field(NodeAttr, _, ab) =>
        val af = fields(ab)
        val name = af.collectFirst { case Field(AttrName, _, nb) => utf8(nb) }.getOrElse("")
        name -> OnnxAttr(
          af.collectFirst { case Field(AttrF, _, fb) => float32(fb) },
          af.collectFirst { case Field(AttrI, v, null) => v },
          af.flatMap {
            case Field(AttrInts, v, null) => Seq(v)
            case Field(AttrInts, _, pb)   => packedVarints(pb)
            case _ => Seq.empty
          })
      }.toMap
      ((op, ins, out), at)
    }
    def valueName(fieldNum: Int): String =
      gf.collectFirst { case Field(`fieldNum`, _, b) =>
        fields(b).collectFirst { case Field(ValueName, _, nb) => utf8(nb) }.getOrElse("")
      }.getOrElse("")
    new OnnxLiteModel(valueName(GraphInput), valueName(GraphOutput),
      nodesWithAttrs.map(_._1), tensors, nodesWithAttrs.map(_._2))
  }

  /** Executor-side session cache: one parsed model per JVM per path
    * (the mapPartitions tasks share it; tasks serialize only the
    * path). */
  private val sessions = TrieMap.empty[String, OnnxLiteModel]
  def session(path: String): OnnxLiteModel =
    sessions.getOrElseUpdate(path, load(path))
}

/** Embedder backed by an ONNX model file. Two front ends, picked by the
  * model's own input contract:
  *
  *  - feature models: the deterministic hashed-bag featurizer (same md5
  *    bucket scheme as HashingEmbedder, at the model's input width);
  *  - token models (graph input feeds a Gather): a whitespace
  *    tokenizer with md5-bucketed ids into the model's OWN vocabulary,
  *    truncated at [[OnnxEmbedder.MaxTokens]] — the trivial stand-in
  *    for the reference models' BPE tokenizer (embedding.rs:22-94),
  *    with the same shape: text -> ids -> encoder -> pooled vector.
  *
  * Either way the result is L2-normalized — the reference's embed
  * contract with the model swapped in behind the same trait.
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

  /** The checkpoint's OWN tokenizer, when its vocabulary ships next to
    * the .onnx (vocab.txt -> WordPiece, vocab.json+merges.txt -> BPE;
    * see ModelTokenizer.forModel) — the reference models' real
    * tokenization path (embedding.rs:22-35). Without a shipped
    * vocabulary the hash-bucketed OnnxTokens fallback applies.
    * Resolved lazily beside the model so executor-side singletons see
    * the same artifact directory they load the checkpoint from. */
  @transient private lazy val tokenizer: Option[ModelTokenizer] = {
    val t = ModelTokenizer.forModel(modelPath)
    t.foreach { tk =>
      require(tk.vocabSize <= model.vocabSize,
        s"vocabulary (${tk.vocabSize} ids) exceeds the checkpoint's " +
          s"embedding table (${model.vocabSize} rows)")
    }
    t
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

  private def tokenIds(text: String): Array[Int] = tokenizer match {
    case Some(tk) => tk.encode(text, OnnxTokens.MaxTokens)
    case None =>
      val ids = OnnxTokens.ids(text, model.vocabSize).take(OnnxTokens.MaxTokens)
      if (ids.isEmpty) Array(OnnxTokens.PadId) else ids
  }

  private def normalize(e: Array[Float]): Array[Float] = {
    val n = math.sqrt(e.map(x => x.toDouble * x.toDouble).sum)
    if (n > 0) e.map(x => (x / n).toFloat) else e
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    if (model.tokenInput) texts.map(t => normalize(model.runTokens(tokenIds(t))))
    else model.run(texts.map(features).toArray).toSeq.map(normalize)
}

object OnnxEmbedder {
  /** Sequence truncation bound, mirroring the reference models'
    * max-length tokenization window. */
  val MaxTokens = OnnxTokens.MaxTokens
}

/** The trivial whitespace tokenizer shared by the token-model embedder
  * and the cross-encoder reranker: lowercase, whitespace-split, each
  * token md5-bucketed into the model's own vocabulary. Ids 0 and 1 are
  * reserved (pad/empty and pair separator) the way real vocabularies
  * reserve special tokens, so hashed ids start at 2. */
object OnnxTokens {
  val MaxTokens = 128
  val PadId = 0
  val SepId = 1
  private val Reserved = 2

  def ids(text: String, vocabSize: Int): Array[Int] = {
    require(vocabSize > Reserved, s"vocab must exceed the $Reserved reserved ids")
    val md = java.security.MessageDigest.getInstance("MD5")
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).map { tok =>
      val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Reserved + math.floorMod(((d(0) & 0xff) << 8) | (d(1) & 0xff), vocabSize - Reserved)
    }
  }
}
