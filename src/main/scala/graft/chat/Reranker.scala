package graft.chat

/** R1/R2: reranker behind a trait, mirroring the reference's
  * cross-encoder contract (/root/reference/src/rerank.rs:7-19 — load
  * once, then rerank(query, documents) -> one score per document, the
  * model seeing each (query, doc) PAIR).
  *
  * The offline stand-in is a char-3-gram TF-IDF cosine: a genuine
  * interaction-model shape — the score depends on the (query, doc)
  * pair AND on the statistics of the scored batch (idf), not on either
  * text alone — while staying fully deterministic (no weights to
  * download in this sandbox). A real cross-encoder (e.g. an ONNX
  * jina-reranker session) slots in behind the same trait.
  */
trait Reranker extends Serializable {

  /** Score the documents against the query; higher = more relevant.
    * One call scores the whole candidate window, matching
    * rerank.rs:16-19 where rerank() receives the full retrieve window
    * and returns parallel scores. */
  def rerank(query: String, docs: Seq[String]): Seq[Double]
}

/** Cross-encoder reranker over an OnnxLite token model — the real
  * interaction shape of rerank.rs:7-19 (jina-reranker-v2 @ F16, one
  * score per (query, doc) pair): query and document tokens are joined
  * by the reserved separator id into ONE sequence, the encoder attends
  * across the pair, and a scalar head (outputDim 1) emits the
  * relevance score. TfidfReranker remains the deterministic fallback
  * when no model file is configured (no weights ship in this sandbox;
  * the spec generates a toy attention+head model).
  */
class OnnxReranker(modelPath: String) extends Reranker {

  @transient private lazy val model = {
    val m = OnnxLiteModel.session(modelPath)
    require(m.tokenInput, s"$modelPath: a cross-encoder must take token ids")
    require(m.outputDim == 1,
      s"$modelPath: cross-encoder head must emit one score, got dim ${m.outputDim}")
    m
  }

  /** The checkpoint's own tokenizer when its vocabulary ships beside
    * the .onnx (same artifact-directory resolution as OnnxEmbedder) —
    * with it, a real cross-encoder's shipped weights score exactly the
    * token pairs they were trained on. Hash-bucketed OnnxTokens stays
    * the vocab-less fallback. */
  @transient private lazy val tokenizer: Option[ModelTokenizer] = {
    val tk = ModelTokenizer.forModel(modelPath)
    tk.foreach { t =>
      // same fail-fast contract as OnnxEmbedder: ids must fit the
      // checkpoint's embedding table or scoring is executor-side UB
      require(t.vocabSize <= model.vocabSize,
        s"vocabulary (${t.vocabSize} ids) exceeds the checkpoint's " +
          s"embedding table (${model.vocabSize} rows)")
    }
    tk
  }

  override def rerank(query: String, docs: Seq[String]): Seq[Double] = {
    // the query may take at most half the window: an over-long query
    // (pasted stack trace) must not starve the document out of the
    // pair, or every doc would score identically and the rerank would
    // silently become a no-op. With a shipped tokenizer the pair is
    // built in the family's TRAINED format (encodePair — one [CLS],
    // [SEP]-separated halves), never a concatenation of standalone
    // encodings; the hash fallback keeps the reserved-separator join.
    docs.map { doc =>
      val seq = tokenizer match {
        case Some(tk) => tk.encodePair(query, doc, OnnxTokens.MaxTokens)
        case None =>
          val q = OnnxTokens.ids(query, model.vocabSize).take(OnnxTokens.MaxTokens / 2)
          ((q :+ OnnxTokens.SepId) ++ OnnxTokens.ids(doc, model.vocabSize))
            .take(OnnxTokens.MaxTokens)
      }
      model.runTokens(if (seq.isEmpty) Array(OnnxTokens.PadId) else seq)(0).toDouble
    }
  }
}

object Rerankers {

  /** Env-gated reranker selection, mirroring the embedder routing:
    * GRAFT_RERANK_ONNX points at a cross-encoder .onnx (token input,
    * scalar head); unset, the deterministic TF-IDF scorer runs — so
    * `--rerank` always works offline and upgrades to the model when
    * one is configured (rerank.rs:7-19's role). */
  def fromEnv(env: Map[String, String] = sys.env): Reranker =
    env.get("GRAFT_RERANK_ONNX") match {
      case Some(path) => new OnnxReranker(path)
      case None       => new TfidfReranker()
    }
}

/** Deterministic char-n-gram TF-IDF cosine cross-scorer. All
  * accumulations iterate grams in sorted order so the IEEE double
  * results are reproducible run-to-run. */
class TfidfReranker(n: Int = 3) extends Reranker {

  private[chat] def grams(s: String): Map[String, Int] = {
    val t = s.toLowerCase
    if (t.length < n) Map.empty
    else t.sliding(n).toSeq.groupBy(identity).map { case (g, xs) => (g, xs.size) }
  }

  override def rerank(query: String, docs: Seq[String]): Seq[Double] = {
    val dg = docs.map(grams)
    val nDocs = docs.size.toDouble
    val dfCounts = dg.flatMap(_.keySet).groupBy(identity)
      .map { case (g, xs) => (g, xs.size) }
    def idf(g: String): Double =
      math.log(1.0 + nDocs / dfCounts.getOrElse(g, 1).toDouble)
    def norm(m: Map[String, Int]): Double =
      math.sqrt(m.toSeq.sortBy(_._1).iterator
        .map { case (g, c) => val w = c * idf(g); w * w }.sum)
    val qg = grams(query)
    val qn = norm(qg)
    dg.map { d =>
      val dn = norm(d)
      if (qn == 0.0 || dn == 0.0) 0.0
      else {
        val dot = qg.toSeq.sortBy(_._1).iterator
          .collect { case (g, c) if d.contains(g) =>
            (c * idf(g)) * (d(g) * idf(g))
          }.sum
        dot / (qn * dn)
      }
    }
  }
}
