package graft

import graft.chat.{Chunker, HashingEmbedder}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5 pyramid level 2): chunker round-trip
  * and bounds, embedder determinism/normalization, distance symmetry —
  * driver-side pure functions, no Spark session needed. */
class PropertySpec extends AnyFunSuite {

  /** Seeded exhaustive-ish sampler (no scalatest-scalacheck bridge in
    * the offline cache): 100 deterministic samples per property. */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until 100).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(for { a <- ga; b <- gb } yield (a, b)) { case (a, b) => f(a, b) }

  // ------------------------------------------------------------ round-6 kernels

  /** The q145 equivalence THEOREM the operator's gram-island
    * formulation rests on: two sequences share a maximal verbatim run
    * of length L >= n iff they share L-n+1 n-grams at consecutive
    * positions on one alignment diagonal. Checked by computing maximal
    * runs both ways — LCS dynamic programming over raw token equality
    * vs diagonal islands over gram matches — on random small-alphabet
    * sequences (small alphabet forces dense accidental overlaps, the
    * hard case). */
  test("q145 theorem: gram-diagonal islands == LCS-DP maximal runs on random sequences") {
    val n = graft.ops.Dedup.DupSpanN
    val tokGen = Gen.chooseNum(n, 50).flatMap(len =>
      Gen.listOfN(len, Gen.chooseNum(0, 5).map(i => s"w$i")).map(_.toArray))
    def dpMaxRuns(a: Array[String], b: Array[String], minRun: Int): Seq[Int] = {
      val runs = scala.collection.mutable.ListBuffer.empty[Int]
      val prev = new Array[Int](b.length + 1)
      val cur = new Array[Int](b.length + 1)
      for (i <- a.indices) {
        for (j <- b.indices) {
          cur(j + 1) = if (a(i) == b(j)) prev(j) + 1 else 0
          if (cur(j + 1) >= minRun &&
            (i == a.length - 1 || j == b.length - 1 || a(i + 1) != b(j + 1)))
            runs += cur(j + 1)
        }
        System.arraycopy(cur, 0, prev, 0, cur.length)
        java.util.Arrays.fill(cur, 0)
      }
      runs.toSeq.sorted
    }
    def islandRuns(a: Array[String], b: Array[String], minRun: Int): Seq[Int] = {
      def grams(t: Array[String]) =
        (0 to t.length - n).map(i => (t.slice(i, i + n).mkString(" "), i))
      val byGram = grams(b).groupBy(_._1)
      val matches = grams(a).flatMap { case (g, pa) =>
        byGram.getOrElse(g, Nil).map { case (_, pb) => (pa - pb, pa) }
      }
      matches.groupBy(_._1).toSeq.flatMap { case (_, ms) =>
        val ps = ms.map(_._2).sorted
        // islands of consecutive positions
        val islands = ps.foldLeft(List.empty[List[Int]]) {
          case (Nil, p) => List(List(p))
          case (h :: t, p) if p == h.head + 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }
        islands.map(_.length + n - 1).filter(_ >= minRun)
      }.sorted
    }
    forAll(for { a <- tokGen; b <- tokGen } yield (a, b)) { case (a, b) =>
      for (minRun <- Seq(n, n + 3, 12)) {
        assert(islandRuns(a, b, minRun) == dpMaxRuns(a, b, minRun),
          s"minRun=$minRun a=${a.mkString(" ")} b=${b.mkString(" ")}")
      }
    }
  }

  /** The q151 invariance THEOREM (Haitsma & Kalker 2002): the sign of
    * adjacent-window energy differences is invariant under any exact
    * positive integer gain — k·a > k·b iff a > b. */
  test("q151 theorem: envelope fingerprint is invariant under exact integer gain") {
    val envGen = Gen.listOfN(graft.ops.Multimodal.AudioWindows,
      Gen.chooseNum(0L, 100000L)).map(_.toArray)
    forAll(for { e <- envGen; k <- Gen.oneOf(2L, 3L, 7L, 1000L) } yield (e, k)) {
      case (e, k) =>
        assert(graft.ops.Multimodal.envelopeSigOf(e.map(_ * k)) ==
          graft.ops.Multimodal.envelopeSigOf(e))
    }
  }

  /** The q128/q163 winnowing GUARANTEE (Schleimer et al. 2003 thm): any
    * shared token run of length >= w+n-1 yields at least one shared
    * fingerprint, whatever the surrounding context — checked with the
    * shared run planted at random offsets inside random contexts. */
  test("q128 theorem: a w+n-1-token shared run always shares a fingerprint") {
    val n = graft.ops.Dedup.WinnowGramN; val w = graft.ops.Dedup.WinnowWindow
    val md = java.security.MessageDigest.getInstance("MD5")
    def fps(t: Array[String]): Set[Long] = {
      val m = t.length - n + 1
      if (m <= 0) Set.empty
      else {
        val h = (0 until m).map { i =>
          val d = md.digest(t.slice(i, i + n).mkString(" ")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
            ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        }.toArray
        (0 to math.max(0, m - w)).map(s => h.slice(s, math.min(s + w, m)).min).toSet
      }
    }
    val ctxGen = Gen.chooseNum(0, 20).flatMap(len =>
      Gen.listOfN(len, Gen.identifier.map(_.take(8))).map(_.toArray))
    val runGen = Gen.listOfN(w + n - 1, Gen.identifier.map("r" + _.take(8))).map(_.toArray)
    forAll(for { c1 <- ctxGen; c2 <- ctxGen; c3 <- ctxGen; c4 <- ctxGen; r <- runGen }
      yield (c1, c2, c3, c4, r)) { case (c1, c2, c3, c4, r) =>
      val a = c1 ++ r ++ c2
      val b = c3 ++ r ++ c4
      assert((fps(a) & fps(b)).nonEmpty,
        s"a ${a.length} toks, b ${b.length} toks must share a fingerprint")
    }
  }

  private val textGen: Gen[String] = Gen.chooseNum(0, 50).flatMap { n =>
    Gen.listOfN(n,
      Gen.oneOf(
        Gen.alphaNumStr.map(_.take(30)),
        Gen.const("\n"),
        Gen.const(" "),
        Gen.listOfN(120, Gen.alphaChar).map(_.mkString))
    ).map(_.mkString)
  }

  test("chunker: every chunk within budget and concatenation round-trips") {
    forAll(textGen, Gen.chooseNum(8, 64)) { (text: String, max: Int) =>
      val chunks = Chunker.splitContent(text, max)
      assert(chunks.forall(_.length <= max))
      assert(chunks.mkString("") == text)
      assert(chunks.forall(_.nonEmpty))
    }
  }

  test("structured chunker: budget + round-trip for brace, indent, and heading modes") {
    forAll(textGen, Gen.chooseNum(8, 64)) { (text: String, max: Int) =>
      for (lang <- Seq(Some("Rust"), Some("Python"), Some("Markdown"), None)) {
        val chunks = Chunker.splitStructured(text, lang, max)
        assert(chunks.forall(_.length <= max))
        assert(chunks.mkString("") == text)
        assert(chunks.forall(_.nonEmpty))
      }
    }
  }

  // The behavioral contract of chunker.rs:89-116: a unit (def + body,
  // heading section) that FITS the budget is never split across chunks.
  test("structured chunker never splits a def/heading unit that fits the budget") {
    // Python: decorated defs with indented bodies, each unit <= budget
    val pyUnits = (1 to 6).map { i =>
      s"@deco$i\ndef f$i(x):\n    y = x + $i\n    return y\n"
    }
    val py = pyUnits.mkString
    val max = pyUnits.map(_.length).max + 4
    val pyChunks = Chunker.splitStructured(py, Some("Python"), max)
    assert(pyChunks.mkString("") == py)
    pyUnits.foreach { u =>
      assert(pyChunks.count(_.contains(u)) == 1,
        s"unit split across chunks:\n$u\n-> ${pyChunks.mkString("|")}")
    }
    // every chunk STARTS at a unit boundary (a decorator, never a body line)
    pyChunks.foreach(c => assert(c.startsWith("@deco"), c))

    // Markdown: heading sections, with a fenced block whose '#' line
    // must NOT open a section boundary
    val mdUnits = Seq(
      "# Title\nIntro paragraph text.\n",
      "## Usage\nSome usage notes here.\n```sh\n# comment inside fence\nrun it\n```\nAfter fence.\n",
      "## License\nMIT licensed.\n")
    val md = mdUnits.mkString
    val mdMax = mdUnits.map(_.length).max + 4
    val mdChunks = Chunker.splitStructured(md, Some("Markdown"), mdMax)
    assert(mdChunks.mkString("") == md)
    mdUnits.foreach { u =>
      assert(mdChunks.count(_.contains(u)) == 1,
        s"section split across chunks:\n$u\n-> ${mdChunks.mkString("|")}")
    }
    mdChunks.foreach(c => assert(c.startsWith("#"), c))
  }

  test("structured chunker aligns boundaries with top-level declarations") {
    val rust =
      """fn first() {
        |    let a = 1;
        |}
        |fn second() {
        |    let b = 2;
        |}
        |""".stripMargin
    // budget fits one function but not both -> the split lands exactly
    // between the two top-level blocks
    val chunks = Chunker.splitStructured(rust, Some("Rust"), maxSize = 40)
    assert(chunks.mkString("") == rust)
    assert(chunks.head.trim.endsWith("}"), s"chunk 0 should close first fn: ${chunks.head}")
    assert(chunks(1).startsWith("fn second"), s"chunk 1 should start second fn: ${chunks(1)}")

    val py =
      """def first():
        |    return 1
        |def second():
        |    return 2
        |""".stripMargin
    val pyChunks = Chunker.splitStructured(py, Some("Python"), maxSize = 30)
    assert(pyChunks.mkString("") == py)
    assert(pyChunks(1).startsWith("def second"), pyChunks.mkString("|"))
    // a single unit larger than the budget falls back to line splitting
    val big = "fn huge() {\n" + ("    xxxxxxxx;\n" * 20) + "}\n"
    val bigChunks = Chunker.splitStructured(big, Some("Rust"), maxSize = 50)
    assert(bigChunks.forall(_.length <= 50))
    assert(bigChunks.mkString("") == big)
  }

  // ADVICE r13 (medium): an oversized unit of ONLY blank lines (indent
  // modes never flush blank-only runs) used to crash splitIndentUnit on
  // an empty .min — one degenerate whitespace file must not kill the
  // chunking job
  test("structured chunker survives an oversized all-blank unit (indent + ruby)") {
    for (lang <- Seq(Some("Python"), Some("Ruby"))) {
      for (blank <- Seq("\n" * 60, ("   \n" * 40) + "  ")) {
        val chunks = Chunker.splitStructured(blank, lang, maxSize = 50)
        assert(chunks.forall(_.length <= 50))
        assert(chunks.mkString("") == blank, s"round-trip failed for $lang")
      }
      // blank run larger than budget INSIDE otherwise-normal code
      val mixed = "def f():\n    return 1\n" + ("\n" * 60) + "def g():\n    return 2\n"
      val mixedChunks = Chunker.splitStructured(mixed, lang, maxSize = 50)
      assert(mixedChunks.mkString("") == mixed)
      assert(mixedChunks.forall(_.length <= 50))
    }
  }

  // ADVICE r13 (low): a stray '(' in a top-level comment must not glue
  // the following declarations into one unit — the tracker resets on
  // the next depth-0 statement-ending line
  test("brace mode: unbalanced paren in a comment does not glue later declarations") {
    val src =
      """// see note (unbalanced
        |int a = 1;
        |fn first() {
        |    let x = 1;
        |}
        |fn second() {
        |    let y = 2;
        |}
        |""".stripMargin
    // budget fits one function but not both: with the stray '(' reset on
    // `int a = 1;`, the split still lands between the two fns
    val chunks = Chunker.splitStructured(src, Some("Rust"), maxSize = 60)
    assert(chunks.mkString("") == src)
    assert(chunks.exists(_.startsWith("fn second")),
      s"declarations glued past the stray paren: ${chunks.mkString("|")}")
    // a stray '(' in a comment INSIDE a block resets on the closing '}'
    val src2 =
      """fn holder() {
        |    // math (see docs
        |    let x = 1;
        |}
        |fn after() {
        |    let y = 2;
        |}
        |""".stripMargin
    val chunks2 = Chunker.splitStructured(src2, Some("Rust"), maxSize = 50)
    assert(chunks2.mkString("") == src2)
    assert(chunks2.exists(_.startsWith("fn after")),
      s"block-comment paren glued the next fn: ${chunks2.mkString("|")}")
  }

  // ADVICE r14 (low): a depth-0 multi-line call whose block-lambda
  // argument line ends '}' must NOT trip the stray-paren reset — the
  // closing `));` line belongs to the same statement, so a chunk
  // boundary may never land between the lambda body and the `));`
  test("brace mode: block-lambda argument inside a multi-line call stays one unit") {
    val call =
      """register(handler(
        |    |x| {
        |        go();
        |    }
        |));
        |""".stripMargin
    val src = call + "fn later() {\n    let z = 3;\n}\n"
    // budget fits the call alone: the boundary must land AFTER `));`
    val chunks = Chunker.splitStructured(src, Some("Rust"), maxSize = call.length + 5)
    assert(chunks.mkString("") == src)
    assert(chunks.exists(_.startsWith("fn later")),
      s"boundary did not land between statements: ${chunks.mkString("|")}")
    assert(!chunks.exists(_.startsWith("));")),
      s"`));` split off its own statement: ${chunks.mkString("|")}")
  }

  test("stripLiterals: comments and string bodies do not reach the delimiter counts") {
    // line comment dropped entirely
    assert(Chunker.stripLiterals("int a = 1; // note (unbalanced", false)._1 == "int a = 1; ")
    // string body consumed, quotes and code kept out
    assert(Chunker.stripLiterals("""s = "ab{c(" + x;""", false)._1 == "s =  + x;")
    // escaped quote inside a string does not end it
    assert(Chunker.stripLiterals("""t = "a\"b(";""", false)._1 == "t = ;")
    // block comment opens and threads state across lines
    val (l1, b1) = Chunker.stripLiterals("x = 1; /* prose (", false)
    assert(l1 == "x = 1; " && b1)
    val (l2, b2) = Chunker.stripLiterals("still prose ( */ y = 2;", b1)
    assert(l2 == " y = 2;" && !b2)
    // char literal consumed; a Rust lifetime's lone quote survives
    assert(Chunker.stripLiterals("c = '('; d = ')';", false)._1 == "c = ; d = ;")
    assert(Chunker.stripLiterals("fn f<'a>(x: &'a str)", false)._1 == "fn f<'a>(x: &'a str)")
  }

  test("embedder: deterministic, L2-normalized, order-insensitive to batching") {
    val emb = new HashingEmbedder()
    forAll(Gen.listOfN(5, Gen.alphaStr.suchThat(_.nonEmpty))) { words =>
      val text = words.mkString(" ")
      val v1 = emb.embed(text)
      val v2 = emb.embed(text)
      assert(v1.toSeq == v2.toSeq)
      val norm = math.sqrt(v1.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
      // batching does not change individual vectors
      val batched = emb.embedBatch(Seq(text, "other words", text))
      assert(batched(0).toSeq == v1.toSeq && batched(2).toSeq == v1.toSeq)
    }
  }

  test("cosine distance: symmetric, zero on self, within [0, 2]") {
    val emb = new HashingEmbedder()
    def dist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    forAll(Gen.alphaStr.suchThat(_.trim.nonEmpty), Gen.alphaStr.suchThat(_.trim.nonEmpty)) {
      (s1: String, s2: String) =>
        val a = emb.embed(s1); val b = emb.embed(s2)
        assert(math.abs(dist(a, b) - dist(b, a)) < 1e-12)
        assert(dist(a, a) < 1e-9)
        val d = dist(a, b)
        assert(d >= -1e-9 && d <= 2.0 + 1e-9)
    }
  }

  private val wordsGen: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)))

  test("WordPiece encode/encodePair honor the window and the special-token contract") {
    val vocab = (Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++
      ('a' to 'z').map(_.toString) ++ ('a' to 'z').map(c => s"##$c")).zipWithIndex.toMap
    val tk = new graft.chat.WordPieceTokenizer(vocab)
    val cls = vocab("[CLS]"); val sep = vocab("[SEP]")
    forAll(wordsGen, Gen.chooseNum(3, 48)) { (ws: List[String], m: Int) =>
      val enc = tk.encode(ws.mkString(" "), m)
      assert(enc.length <= m && enc.head == cls && enc.last == sep)
      val pair = tk.encodePair(ws.mkString(" "), ws.reverse.mkString(" "), m)
      assert(pair.length <= m, s"pair ${pair.length} > window $m")
      assert(pair.head == cls && pair.count(_ == cls) == 1, "exactly one leading [CLS]")
      assert(pair.count(_ == sep) == 2 && pair.last == sep, "two [SEP]s, one trailing")
    }
  }

  test("byte-level BPE mapping is injective (distinct strings never collide)") {
    forAll(Gen.alphaNumStr.map(_.take(20)), Gen.alphaNumStr.map(_.take(20))) { (a, b) =>
      val ma = graft.chat.BpeTokenizer.toByteLevel(a)
      val mb = graft.chat.BpeTokenizer.toByteLevel(b)
      assert((ma == mb) == (a == b), s"'$a'/'$b' -> '$ma'/'$mb'")
    }
  }

  test("simhash16: token-order insensitive and invariant under corpus doubling") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def sig(text: String): Long =
      graft.functions.SimHash16(Literal(UTF8String.fromString(text),
        org.apache.spark.sql.types.StringType)).eval(null).asInstanceOf[Long]
    forAll(wordsGen) { ws =>
      val text = ws.mkString(" ")
      // votes are sums over tokens: any permutation signs identically
      val perm = ws.reverse.mkString(" ")
      assert(sig(text) == sig(perm))
      // doubling every token doubles every vote: signs cannot flip
      assert(sig(text) == sig((ws ++ ws).mkString(" ")))
      assert(sig(text) >= 0L && sig(text) < (1L << 16))
    }
  }

  test("minhash linear permutations stay within [0, p)") {
    import graft.core.Consts
    forAll(Gen.chooseNum(0L, (1L << 32) - 1)) { hv: Long =>
      Consts.MinhashParams.foreach { case (a, b) =>
        val v = (hv * a + b) % Consts.MinhashPrime
        assert(v >= 0 && v < Consts.MinhashPrime)
      }
    }
  }

  test("span corruption kernel: round-trips for arbitrary docs (unicode, empties, long runs)") {
    import graft.ops.TextAnalytics
    val tokenGen = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12)),
      Gen.oneOf("你好", "éèê", "Ωμέγα", "токен", "🙂x"),
      Gen.const("a"))
    val docGen = for {
      n <- Gen.chooseNum(0, 80)
      toks <- Gen.listOfN(n, tokenGen)
      sep <- Gen.oneOf(" ", "  ", " \t ")
    } yield toks.mkString(sep)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sentinel = "<extra_id_(\\d+)>".r
    forAll(docGen, Gen.chooseNum(0L, 1L << 40)) { (text: String, id: Long) =>
      val (_, nTok, nMasked, nSpans, input, target) =
        TextAnalytics.corruptDoc(id, text, md)
      val orig = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      assert(nTok == orig.length.toLong)
      // parse spans, check ids are dense, rebuild the document
      val spans = scala.collection.mutable.Map.empty[Int, List[String]]
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach {
        case sentinel(k) => cur = k.toInt; spans(cur) = Nil
        case tok => spans(cur) = spans(cur) :+ tok
      }
      assert(spans.keySet == (0 until nSpans.toInt).toSet)
      assert(spans.values.map(_.length.toLong).sum == nMasked)
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap {
        case sentinel(k) => spans(k.toInt)
        case tok => Seq(tok)
      }.toSeq
      assert(rebuilt == orig, s"round-trip failed for id=$id text=${text.take(80)}")
      // determinism: the mask depends only on (id, position)
      val again = TextAnalytics.corruptDoc(id, text, md)
      assert(again == ((id, nTok, nMasked, nSpans, input, target)))
    }
  }

  // ------------------------------------------------------------ round-11 kernels

  /** The q176 emission kernel vs brute-force i<j(<k) enumeration on
    * random SMALL-ALPHABET sequences — the adversarial case for the
    * greedy first-occurrence rule (dense repeats, many accidental
    * orderings the sf corpus may never contain). Also pins the SET
    * property: each supported pattern emitted exactly once. */
  test("q176 kernel: greedy first-occurrence emission == brute subsequence containment") {
    val seqGen = Gen.chooseNum(0, 14).flatMap(len =>
      Gen.listOfN(len, Gen.chooseNum(0, 3).map(i => s"e$i")).map(_.toArray))
    forAll(seqGen) { s =>
      val brute = scala.collection.mutable.Set.empty[(String, String, String)]
      for (i <- s.indices; j <- (i + 1) until s.length) {
        brute += ((s(i), s(j), null))
        for (k <- (j + 1) until s.length) brute += ((s(i), s(j), s(k)))
      }
      val got = graft.ops.Events.supportedPatterns(s)
      assert(got.toSet == brute.toSet, s"seq=${s.mkString(",")}")
      assert(got.size == got.toSet.size,
        s"a pattern emitted twice (support would double-count): ${s.mkString(",")}")
    }
  }

  /** The q174/q175/q178/q182 log kernel: FixedLog2.q16 is monotone and
    * EXACT on doubling — log2(2v) = log2(v) + 1 holds bit-for-bit on
    * the 2^-16 grid (e increments, the mantissa chain is identical),
    * which is what makes A-Res keys and the Heaps/PMI/KN ratios
    * engine-portable integers rather than approximations. */
  test("q174 kernel: FixedLog2.q16 monotone; doubling adds exactly 65536") {
    val vGen = Gen.chooseNum(1L, (1L << 40) - 1)
    forAll(vGen, vGen) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      assert(graft.functions.FixedLog2.q16(lo) <= graft.functions.FixedLog2.q16(hi))
      assert(graft.functions.FixedLog2.q16(2 * a) == graft.functions.FixedLog2.q16(a) + 65536L)
    }
  }
}
