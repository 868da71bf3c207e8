package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal column plumbing: image/audio/video as opaque BINARY
  * columns with typed metadata, processed by batched executor-side
  * workers (the Scala analog of mapInPandas batching: mapPartitions +
  * grouped(batch), one decoder instance per partition).
  *
  * The DECODE step is a deliberate STUB — no image/audio codecs exist
  * in this container — but everything around it is real and tested:
  * the schema (binary payload + typed meta struct), partition-local
  * batch shape, deterministic feature extraction over raw bytes, and
  * frame sampling that explodes one media row into frame rows.
  *
  * At scale: payloads never shuffle — features/frames are computed at
  * the scan and only the (small) derived columns move. Media tables
  * should be written with payloads in their own parquet column chunk so
  * metadata-only queries never read bytes (columnar pruning is free).
  *
  * The synthetic media table derives payload = utf8(text) from the
  * documents table (ASCII-only), which makes the byte-level outputs
  * SQL-oracle-checkable via ascii()/substring in DuckDB.
  */
object Multimodal {

  val FeatureBatch = 16
  val FrameSize = 64 // bytes per synthetic "frame"

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      format: String, duration_ms: Long)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           distinct_bytes: Long, mean_byte: Double)
  case class Frame(media_id: Long, frame_idx: Long, frame_len: Long, frame_hash: String)

  /** STUB decoder boundary. A real deployment plugs an actual codec in
    * here (per-partition instance, batch-at-a-time); the fake returns
    * deterministic byte-level "features" so the plumbing is testable. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Byte]]
  }

  /** ??? in spirit: identity "decode" — the bytes ARE the fake frames. */
  class StubDecoder extends MediaDecoder {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Byte]] = payloads
  }

  // -------------------------------------------------------------------
  // REAL decode for the formats the JDK itself can read — no external
  // codec libraries needed: javax.imageio (PNG/JPEG/BMP/GIF) and
  // javax.sound.sampled (RIFF/WAV PCM) ship with java.desktop. The
  // heavier codecs (video, mp3, webp, ...) remain the documented stub
  // boundary; these two prove the decode seam with actual bytes.
  // -------------------------------------------------------------------

  case class ImageInfo(media_id: Long, width: Int, height: Int, mean_luma: Double)
  case class AudioInfo(media_id: Long, channels: Int, sample_rate: Int,
                       n_samples: Long, duration_ms: Long, rms: Double)

  /** Decode real images (PNG/JPEG/BMP/...) with the JDK's ImageIO:
    * batched per partition, payloads never shuffle, only the tiny info
    * rows move. mean_luma = average of the ITU-R 601 luma over all
    * pixels. */
  def imageInfo(images: Dataset[(Long, Array[Byte])]): Dataset[ImageInfo] = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      it.grouped(FeatureBatch).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          // ImageIO.read returns null when no reader claims the bytes
          // but THROWS on recognized-yet-corrupt payloads — one bad
          // image must skip, not kill the 100 TB job (4 task retries
          // then abort)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) None
          else {
            var sum = 0.0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
                sum += 0.299 * r + 0.587 * g + 0.114 * b
                x += 1
              }
              y += 1
            }
            Some(ImageInfo(id, img.getWidth, img.getHeight,
              sum / (img.getWidth.toLong * img.getHeight)))
          }
        }
      }
    }
  }

  /** Resize real images executor-side (Graphics2D bilinear), returning
    * re-encoded PNG bytes — the shape of a preprocessing stage that
    * normalizes a 100 TB image corpus to a model's input size. */
  def resizeImages(images: Dataset[(Long, Array[Byte])], w: Int, h: Int): Dataset[(Long, Array[Byte])] = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      it.grouped(FeatureBatch).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) None
          else {
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Some((id, bos.toByteArray))
          }
        }
      }
    }
  }

  /** Decode real WAV (RIFF PCM) audio with the JDK's sound API:
    * header-derived channel/rate metadata plus a full-signal RMS over
    * the 16-bit samples. */
  def audioInfo(audio: Dataset[(Long, Array[Byte])]): Dataset[AudioInfo] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { it =>
      it.grouped(FeatureBatch).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = in.getFormat
            val data = in.readAllBytes()
            val bytesPerSample = fmt.getSampleSizeInBits / 8
            val nSamples = data.length.toLong / (bytesPerSample * fmt.getChannels)
            var sumSq = 0.0
            if (fmt.getSampleSizeInBits == 16) {
              val bb = java.nio.ByteBuffer.wrap(data).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              while (bb.remaining() >= 2) { val s = bb.getShort.toDouble; sumSq += s * s }
            }
            val total = data.length / bytesPerSample
            Some(AudioInfo(id, fmt.getChannels, fmt.getSampleRate.toInt, nSamples,
              (nSamples * 1000L) / fmt.getSampleRate.toLong,
              if (total == 0) 0.0 else math.sqrt(sumSq / total)))
          } catch { case _: Exception => None }
        }
      }
    }
  }

  /** Deterministic media table derived from documents: payload is the
    * utf8 text, kind cycles image/audio/video by doc_id. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        lit("raw").as("format"),
        (col("n_chars") * 10).as("duration_ms"))
      .as[MediaRow]
  }

  /** Batched feature extraction over the binary payload: one decoder
    * per partition, grouped(16) batches — the real inference shape. */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val decoder: MediaDecoder = new StubDecoder
    mediaTable(spark, sfDir)
      .mapPartitions { it =>
        it.grouped(FeatureBatch).flatMap { batch =>
          val decoded = decoder.decodeBatch(batch.map(_.payload))
          batch.zip(decoded).map { case (m, bytes) =>
            val n = bytes.length.toLong
            val distinct = bytes.toSet.size.toLong
            val mean = if (n == 0) 0.0
              else bytes.map(b => (b & 0xff).toLong).sum.toDouble / n.toDouble
            MediaFeatures(m.media_id, m.kind, n, distinct, mean)
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  def mediaFeaturesSql: String =
    """SELECT media_id, kind,
      |  cast(length(text) as bigint) AS n_bytes,
      |  cast(len(list_distinct([substring(text, i+1, 1) for i in range(length(text))])) as bigint) AS distinct_bytes,
      |  cast(list_sum([ascii(substring(text, i+1, 1)) for i in range(length(text))]) as double) / cast(length(text) as double) AS mean_byte
      |FROM (SELECT doc_id AS media_id,
      |        ['image','audio','video'][cast(doc_id % 3 + 1 as int)] AS kind, text
      |      FROM documents)
      |ORDER BY media_id""".stripMargin

  /** Frame sampling: video payloads exploded into fixed-size frames
    * (1 media row -> N frame rows), hashed for downstream dedup. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val decoder: MediaDecoder = new StubDecoder
    mediaTable(spark, sfDir)
      .filter(col("kind") === "video").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(FeatureBatch).flatMap { batch =>
          val decoded = decoder.decodeBatch(batch.map(_.payload))
          batch.zip(decoded).flatMap { case (m, bytes) =>
            bytes.grouped(FrameSize).zipWithIndex.map { case (frame, idx) =>
              val md = java.security.MessageDigest.getInstance("MD5").digest(frame)
              Frame(m.media_id, idx.toLong, frame.length.toLong,
                md.map("%02x".format(_)).mkString)
            }
          }
        }
      }
      .toDF()
      .orderBy("media_id", "frame_idx")
  }

  def frameSampleSql: String =
    s"""SELECT media_id, cast(i as bigint) AS frame_idx,
       |  cast(length(substring(text, i*$FrameSize + 1, $FrameSize)) as bigint) AS frame_len,
       |  md5(substring(text, i*$FrameSize + 1, $FrameSize)) AS frame_hash
       |FROM (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2),
       |  unnest(range(cast(floor((length(text)-1)/$FrameSize) as bigint) + 1)) AS t(i)
       |ORDER BY media_id, frame_idx""".stripMargin

  // -------------------------------------------------------------------
  // Perceptual dHash near-duplicate detection — the image-side analog
  // of the text dedup family: a 64-bit difference hash (9×8 grayscale
  // grid, bit = "is this pixel darker than its right neighbor") that
  // is stable under re-encoding, mild brightness shift, and resizing —
  // the transformations that defeat byte-level exact dedup on a 100 TB
  // image crawl. Decode→downsample→hash runs per-partition batch-wise
  // like every media stage; the REAL decode path (ImageIO + bilinear
  // downsample) is exercised by spec with actual PNG bytes, while the
  // oracle-checked query rides the documented stub-decoder seam
  // (payload bytes ARE the grayscale grid) so the full banding/pairing
  // plumbing is cross-engine-pinned without codecs in the oracle.
  // -------------------------------------------------------------------

  /** dHash grid: 9 columns × 8 rows of grayscale, 8 comparisons/row. */
  val DHashCols = 9
  val DHashRows = 8
  /** pairs at or below this Hamming distance are near-dups. */
  val DHashMaxHamming = 6
  /** 8 bands × 8 bits: pigeonhole-EXACT for Hamming ≤ 7 ≥ the
    * threshold — a qualifying pair always agrees on ≥1 whole band. */
  val DHashBands = 8

  /** The shared hash kernel: 72 grayscale values (row-major 9×8) → 64
    * bits, bit r·8+c set iff g[r][c] < g[r][c+1]. Bit 63 lands in the
    * sign bit — the i64 value is the same "sum of distinct powers of
    * two" on both engines (the oracle adds −2⁶³ for bit 63). */
  private[ops] def dhashOfGrid(g: Array[Int]): Long = {
    var h = 0L
    var r = 0
    while (r < DHashRows) {
      var c = 0
      while (c < DHashCols - 1) {
        if (g(r * DHashCols + c) < g(r * DHashCols + c + 1))
          h |= 1L << (r * (DHashCols - 1) + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Stub-decode grid: first 72 payload bytes as grayscale (unsigned),
    * zero-padded — the documented codec seam, byte-mirrorable in SQL. */
  private def stubGrid(bytes: Array[Byte]): Array[Int] = {
    val g = new Array[Int](DHashCols * DHashRows)
    var i = 0
    while (i < g.length) {
      g(i) = if (i < bytes.length) bytes(i) & 0xff else 0
      i += 1
    }
    g
  }

  /** (media_id, dhash) over the image-kind media rows via the stub
    * decoder — scan-local per-partition batches, payloads never
    * shuffle, only the 8-byte hashes move. */
  def imageDHashes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val decoder: MediaDecoder = new StubDecoder
    mediaTable(spark, sfDir)
      .filter(col("kind") === "image").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(FeatureBatch).flatMap { batch =>
          val decoded = decoder.decodeBatch(batch.map(_.payload))
          batch.zip(decoded).map { case (m, bytes) =>
            (m.media_id, dhashOfGrid(stubGrid(bytes)))
          }
        }
      }
      .toDF("media_id", "dhash")
  }

  /** REAL dHash: ImageIO decode + bilinear 9×8 grayscale downsample +
    * the same bit kernel — the production path, spec-exercised with
    * actual PNG bytes (undecodable payloads drop, the imageInfo
    * convention). */
  def imageDHash(images: Dataset[(Long, Array[Byte])]): Dataset[(Long, Long)] = {
    import images.sparkSession.implicits._
    images.mapPartitions { it =>
      it.grouped(FeatureBatch).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) None
          else {
            val small = new java.awt.image.BufferedImage(DHashCols, DHashRows,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val gr = small.createGraphics()
            gr.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            gr.drawImage(img, 0, 0, DHashCols, DHashRows, null)
            gr.dispose()
            val g = new Array[Int](DHashCols * DHashRows)
            var i = 0
            while (i < g.length) {
              val rgb = small.getRGB(i % DHashCols, i / DHashCols)
              // ITU-R 601 luma in integer arithmetic
              g(i) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              i += 1
            }
            Some((id, dhashOfGrid(g)))
          }
        }
      }
    }
  }

  /** q131: near-duplicate image pairs at Hamming ≤ [[DHashMaxHamming]].
    *
    * Scale shape: the q17 SimHash discipline at 64 bits — signatures
    * band into [[DHashBands]] 8-bit keys inside the scan projection and
    * candidates come from ONE self-equi-join on (band_idx, band_val)
    * (union of band joins expressed as one exploded join, exchange
    * reused), exact by pigeonhole at the threshold; the verify step is
    * a codegen'd bit_count(xor) on the candidate rows only. An
    * all-pairs join never happens, so a billion-image corpus pairs at
    * banded-join cost, not n². */
  def dhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = imageDHashes(spark, sfDir)
    val banded = sigs.select(col("media_id"), col("dhash"),
      explode(array((0 until DHashBands).map(b =>
        struct(lit(b).as("band_idx"),
          shiftrightunsigned(col("dhash"), b * 8).bitwiseAND(lit(0xffL)).as("band_val"))): _*))
        .as("band"))
      .select(col("media_id"), col("dhash"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
    val a = banded.select(col("media_id").as("media_a"), col("dhash").as("ha"),
      col("band_idx"), col("band_val"))
    val b = banded.select(col("media_id").as("media_b"), col("dhash").as("hb"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "ha", "hb").distinct()
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= DHashMaxHamming)
      .select("media_a", "media_b", "hamming")
      .orderBy("media_a", "media_b")
  }

  /** (media_id, source, dhash) over an arbitrary documents-shaped
    * frame's image rows — the seam batch q134 and its streaming twin
    * share, so stream and batch signatures cannot drift (the
    * shingleRowsOf discipline applied to media). */
  private[graft] def dhashSigsOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("media_id"), col("source"),
        col("text").cast("binary").as("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val decoder: MediaDecoder = new StubDecoder
        it.grouped(FeatureBatch).flatMap { batch =>
          val decoded = decoder.decodeBatch(batch.map(_._3))
          batch.zip(decoded).map { case ((id, src, _), bytes) =>
            (id, src, dhashOfGrid(stubGrid(bytes)))
          }
        }
      }
      .toDF("media_id", "source", "dhash")
  }

  /** Frozen banded corpus reference for dHash admission: every
    * non-incremental image's (band_idx, band_val, corpus_id,
    * corpus_hash) rows, lineage-truncated so each serving join hits
    * materialized rows (the q102 freeze discipline). */
  private[graft] def dhashCorpusRef(spark: SparkSession, sfDir: String): DataFrame = {
    val corp = dhashSigsOf(
        Tables.documents(spark, sfDir).select("doc_id", "source", "text"))
      .filter(col("source") =!= Dedup.IncrementalSource)
    corp.select(col("media_id").as("corpus_id"), col("dhash").as("corpus_hash"),
        explode(array((0 until DHashBands).map(b =>
          struct(lit(b).as("band_idx"),
            shiftrightunsigned(col("dhash"), b * 8).bitwiseAND(lit(0xffL)).as("band_val"))): _*))
          .as("band"))
      .select(col("corpus_id"), col("corpus_hash"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
      .localCheckpoint()
  }

  /** Admission verdicts for a batch of incoming images against the
    * frozen reference: is_dup = some corpus image within Hamming ≤
    * [[DHashMaxHamming]] (EXACT — the banded probe sees every
    * qualifying pair by pigeonhole), match = the (hamming, corpus_id)-
    * lexicographic best. Non-dups report the −1 sentinels, NOT the
    * true corpus-wide minimum distance — banding cannot see beyond the
    * threshold, and the verdict contract doesn't need it. */
  private[graft] def dhashAdmissionVerdicts(batch: DataFrame,
                                            ref: DataFrame): DataFrame = {
    val sigs = dhashSigsOf(batch)
      .filter(col("source") === Dedup.IncrementalSource)
      .select("media_id", "dhash")
    val probes = sigs.select(col("media_id"), col("dhash"),
        explode(array((0 until DHashBands).map(b =>
          struct(lit(b).as("band_idx"),
            shiftrightunsigned(col("dhash"), b * 8).bitwiseAND(lit(0xffL)).as("band_val"))): _*))
          .as("band"))
      .select(col("media_id"), col("dhash"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
    val best = probes.join(ref, Seq("band_idx", "band_val"))
      .withColumn("hamming",
        bit_count(col("dhash").bitwiseXOR(col("corpus_hash"))).cast("long"))
      .filter(col("hamming") <= DHashMaxHamming)
      .groupBy("media_id")
      .agg(min(struct(col("hamming"), col("corpus_id"))).as("b"))
      .select(col("media_id"), col("b.hamming").as("h"), col("b.corpus_id").as("m"))
    sigs.join(best, Seq("media_id"), "left")
      .select(col("media_id"),
        col("h").isNotNull.as("is_dup"),
        coalesce(col("m"), lit(-1L)).as("match_id"),
        coalesce(col("h"), lit(-1L)).as("hamming"))
      .orderBy("media_id")
  }

  /** q134 batch twin: incoming (src0) images admitted against the
    * frozen rest-of-corpus dHash reference — the image-side q99.
    * The registered query is the STREAMING replay (DedupStream
    * .dhashStream), which runs this exact core per micro-batch against
    * the same frozen reference and is therefore row-identical; this
    * batch form is what the oracle mirrors. */
  def dhashAdmission(spark: SparkSession, sfDir: String): DataFrame =
    dhashAdmissionVerdicts(
      Tables.documents(spark, sfDir).select("doc_id", "source", "text"),
      dhashCorpusRef(spark, sfDir))

  def dhashAdmissionSql: String = {
    s"""WITH sig AS (
       |  SELECT doc_id AS media_id, source,
       |    ($dhashBitsSql) AS dhash
       |  FROM documents WHERE doc_id % 3 = 0),
       |inc AS (SELECT media_id, dhash FROM sig WHERE source = '${Dedup.IncrementalSource}'),
       |corp AS (SELECT media_id AS cid, dhash AS ch FROM sig WHERE source != '${Dedup.IncrementalSource}'),
       |cand AS (
       |  SELECT i.media_id, c.cid, cast(bit_count(xor(i.dhash, c.ch)) as bigint) AS h
       |  FROM inc i JOIN corp c ON bit_count(xor(i.dhash, c.ch)) <= $DHashMaxHamming),
       |best AS (
       |  SELECT media_id, cid, h FROM (
       |    SELECT media_id, cid, h,
       |      row_number() OVER (PARTITION BY media_id ORDER BY h, cid) AS rn
       |    FROM cand) WHERE rn = 1)
       |SELECT i.media_id, b.cid IS NOT NULL AS is_dup,
       |  coalesce(b.cid, -1) AS match_id,
       |  coalesce(b.h, -1) AS hamming
       |FROM inc i LEFT JOIN best b USING (media_id)
       |ORDER BY media_id""".stripMargin
  }

  /** The dHash bit expression over a `text` column — shared between
    * q131's and q134's oracles. */
  private def dhashBitsSql: String = {
    def byteAt(p: Int) =
      s"CASE WHEN $p < length(text) THEN ascii(substring(text, ${p + 1}, 1)) ELSE 0 END"
    (for {
      r <- 0 until DHashRows
      c <- 0 until DHashCols - 1
    } yield {
      val k = r * (DHashCols - 1) + c
      val w = if (k == 63) "-9223372036854775807 - 1" else (1L << k).toString
      s"CASE WHEN ${byteAt(r * DHashCols + c)} < ${byteAt(r * DHashCols + c + 1)} THEN $w ELSE 0 END"
    }).mkString("\n      + ")
  }

  def dhashPairsSql: String = {
    s"""WITH sig AS (
       |  SELECT doc_id AS media_id,
       |    ($dhashBitsSql) AS dhash
       |  FROM documents WHERE doc_id % 3 = 0)
       |SELECT a.media_id AS media_a, b.media_id AS media_b,
       |  cast(bit_count(xor(a.dhash, b.dhash)) as bigint) AS hamming
       |FROM sig a JOIN sig b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= $DHashMaxHamming
       |ORDER BY media_a, media_b""".stripMargin
  }

  // -------------------------------------------------------------------
  // q151: audio energy-envelope fingerprint pairs — the audio member of
  // the perceptual dedup family (text: q14/q65; image: q131/q134),
  // after Haitsma & Kalker 2002's robust audio hashing: the SIGN of
  // the energy difference between adjacent windows is the feature, and
  // that sign pattern is invariant to uniform gain — turning the
  // volume up or re-normalizing loudness, the audio-side analog of the
  // brightness shift q131's dHash survives, flips no bit. Byte-exact
  // re-uploads, re-encoded-at-different-gain copies, and
  // padded/trimmed-silence twins all defeat exact hashing but keep
  // their envelope shape.
  // -------------------------------------------------------------------

  /** 17 windows → 16 adjacent-difference bits. */
  val AudioWindows = 17
  /** pairs at or below this Hamming distance are near-dups. */
  val AudioMaxHamming = 3
  /** 4 bands × 4 bits: pigeonhole-EXACT at Hamming ≤ 3 < 4 bands. */
  val AudioBands = 4

  /** The shared bit kernel: [[AudioWindows]] window energies → 16 bits,
    * bit k set iff e(k+1) > e(k). Any per-sample uniform gain scales
    * every energy by the same factor and preserves each comparison —
    * the Haitsma-Kalker invariance, shared verbatim by the stub and
    * real-PCM paths so they cannot drift. */
  private[graft] def envelopeSigOf(e: Array[Long]): Long = {
    var h = 0L
    var k = 0
    while (k < AudioWindows - 1) {
      if (e(k + 1) > e(k)) h |= 1L << k
      k += 1
    }
    h
  }

  /** Stub-decode energies: payload bytes split into [[AudioWindows]]
    * equal spans (boundaries floor(w·L/17)), energy = unsigned byte
    * mean (integer div) — the documented codec seam, byte-mirrorable
    * in SQL exactly like q131's stub grid. */
  private def stubEnergies(bytes: Array[Byte]): Array[Long] = {
    val L = bytes.length
    Array.tabulate(AudioWindows) { w =>
      val lo = w * L / AudioWindows
      val hi = (w + 1) * L / AudioWindows
      if (hi <= lo) 0L
      else {
        var s = 0L; var i = lo
        while (i < hi) { s += bytes(i) & 0xff; i += 1 }
        s / (hi - lo)
      }
    }
  }

  /** (media_id, window energies) over the audio-kind media rows via the
    * stub seam — the shared front half of the fingerprint (q151) and
    * constellation (q184) paths: scan-local batches, payloads never
    * shuffle, only the 17-long energy array moves. */
  private[graft] def audioEnergyRows(spark: SparkSession, sfDir: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Long])] = {
    import spark.implicits._
    val decoder: MediaDecoder = new StubDecoder
    mediaTable(spark, sfDir)
      .filter(col("kind") === "audio").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(FeatureBatch).flatMap { batch =>
          val decoded = decoder.decodeBatch(batch.map(_.payload))
          batch.zip(decoded).map { case (m, bytes) =>
            (m.media_id, stubEnergies(bytes))
          }
        }
      }
  }

  /** (media_id, fp) — q151's front half. */
  def audioFingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    audioEnergyRows(spark, sfDir)
      .map { case (id, e) => (id, envelopeSigOf(e)) }
      .toDF("media_id", "fp")
  }

  /** REAL fingerprint: javax.sound WAV decode → 16-bit samples → mean
    * |sample| per window → the same bit kernel. The production path,
    * spec-exercised with synthesized PCM (gain-scaled copies must map
    * to the identical fingerprint; undecodable payloads drop, the
    * audioInfo convention). */
  def audioFingerprint(audio: Dataset[(Long, Array[Byte])]): Dataset[(Long, Long)] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { it =>
      it.grouped(FeatureBatch).flatMap { batch =>
        batch.flatMap { case (id, bytes) =>
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = in.getFormat
            val data = in.readAllBytes()
            if (fmt.getSampleSizeInBits != 16) None
            else {
              val bb = java.nio.ByteBuffer.wrap(data).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              val n = data.length / 2
              val s = new Array[Long](n)
              var i = 0
              while (i < n) { s(i) = math.abs(bb.getShort.toLong); i += 1 }
              val e = Array.tabulate(AudioWindows) { w =>
                val lo = w * n / AudioWindows
                val hi = (w + 1) * n / AudioWindows
                if (hi <= lo) 0L
                else { var t = 0L; var j = lo; while (j < hi) { t += s(j); j += 1 }; t / (hi - lo) }
              }
              Some((id, envelopeSigOf(e)))
            }
          } catch { case _: Exception => None }
        }
      }
    }
  }

  /** q151: near-duplicate audio pairs at Hamming ≤ [[AudioMaxHamming]]
    * over the 16-bit envelope fingerprint.
    *
    * 16-bit caveat (q17's documented bound, same here): once the
    * corpus far exceeds 2^16 items, chance fingerprint collisions make
    * the PAIR list quadratic by the birthday bound — a workload
    * property, not a plan property. The scale path is the same as the
    * SimHash family's: group by signature first (exact-dup envelopes
    * collapse), or widen the envelope (more windows) before pairing.
    *
    * Scale shape: the q131/q17 discipline — fingerprints band into
    * [[AudioBands]] 4-bit keys inside the scan projection, ONE exploded
    * self-equi-join on (band_idx, band_val) generates candidates
    * (pigeonhole-exact at the threshold: 3 differing bits cannot touch
    * all 4 bands), and the verify is a codegen'd bit_count(xor) over
    * candidate rows only. Payloads never shuffle; an all-pairs join
    * never happens. */
  def audioEnvelopePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = audioFingerprints(spark, sfDir)
    val banded = sigs.select(col("media_id"), col("fp"),
      explode(array((0 until AudioBands).map(b =>
        struct(lit(b).as("band_idx"),
          shiftrightunsigned(col("fp"), b * 4).bitwiseAND(lit(0xfL)).as("band_val"))): _*))
        .as("band"))
      .select(col("media_id"), col("fp"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
    val a = banded.select(col("media_id").as("media_a"), col("fp").as("fa"),
      col("band_idx"), col("band_val"))
    val b = banded.select(col("media_id").as("media_b"), col("fp").as("fb"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "fa", "fb").distinct()
      .withColumn("hamming",
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
      .filter(col("hamming") <= AudioMaxHamming)
      .select("media_a", "media_b", "hamming")
      .orderBy("media_a", "media_b")
  }

  /** The au + env CTE text shared by q151's and q184's oracles — ONE
    * DuckDB spelling of the stub-decode energy grid. */
  private def sqlAudioEnvCtes: String =
    s"""au AS (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1),
       |env AS (
       |  SELECT media_id,
       |    [ CASE WHEN ((w+1)*length(text))//$AudioWindows > (w*length(text))//$AudioWindows
       |        THEN list_sum([ascii(substring(text, i+1, 1)) for i in range((w*length(text))//$AudioWindows, ((w+1)*length(text))//$AudioWindows)])
       |             // (((w+1)*length(text))//$AudioWindows - (w*length(text))//$AudioWindows)
       |        ELSE 0 END
       |      for w in range($AudioWindows) ] AS e
       |  FROM au)""".stripMargin

  def audioEnvelopePairsSql: String =
    s"""WITH $sqlAudioEnvCtes,
       |sig AS (
       |  SELECT media_id,
       |    cast(list_sum([CASE WHEN e[k+2] > e[k+1] THEN 1<<k ELSE 0 END for k in range(${AudioWindows - 1})]) as bigint) AS fp
       |  FROM env)
       |SELECT a.media_id AS media_a, b.media_id AS media_b,
       |  cast(bit_count(xor(a.fp, b.fp)) as bigint) AS hamming
       |FROM sig a JOIN sig b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $AudioMaxHamming
       |ORDER BY media_a, media_b""".stripMargin

  // -------------------------------------------------------------------
  // Audio constellation match (q184): Wang (ISMIR 2003) — the Shazam
  // landmark scheme, the production shape for "which clips share
  // time-aligned audio structure": hash (energy-band of peak 1,
  // energy-band of peak 2, Δt) for every peak pair inside a target
  // zone, match by EQUI-JOIN on the hash, and let an OFFSET-HISTOGRAM
  // vote decide — true matches pile their hash hits at ONE relative
  // offset, chance collisions scatter. Complements q151: the envelope
  // fingerprint answers "same clip?", the constellation answers "same
  // material, possibly time-shifted?" (re-intros, padded edits,
  // samples) and reports WHERE it aligns.
  //
  // Semantics on the stub seam: peaks are interior local maxima of the
  // 17-window energy envelope (strict left, >= right — the tie rule);
  // hashes pair peaks w1 < w2 <= w1 + ConstellationZone with energies
  // quantized to ConstellationQuant bands; a pair reports its
  // best-voted offset (ties: smallest offset) when votes reach
  // ConstellationMinVotes.
  //
  // Scale shape: hashes are EMITTED scan-local (<= ~C(peaks,2) rows per
  // clip, payloads never shuffle); candidate generation is ONE
  // hash-keyed equi-join — never cross-correlation, never all-pairs —
  // and the vote is a keyed count with map-side combine. The hash
  // space (q1, q2, Δt) must grow with the corpus (finer quantization,
  // more windows) or chance collisions go quadratic by the birthday
  // bound — the q17/q151 documented workload property; the shape is
  // unchanged.
  // -------------------------------------------------------------------

  /** energy-band size for constellation hashing. */
  val ConstellationQuant = 16L
  /** a peak pairs with peaks at most this many windows ahead. */
  val ConstellationZone = 4
  /** minimum aligned votes for a reported match (post-cap histogram:
    * 903/867/37 reported pairs at sf0.001/0.01/0.1). */
  val ConstellationMinVotes = 2L
  /** stop-hash drop: a hash present in more clips than this carries no
    * discrimination and only quadratic candidates (the dedup family's
    * dfCap discipline — measured: the stub corpus's hottest hash sits
    * in 850 of sf0.1's 1.7k clips and single-handedly made the
    * candidate join pair-quadratic, 2.6 s -> ~0.6 s once dropped). At
    * corpus scale the honest fix is a BIGGER hash space (finer bands,
    * more windows), which re-rarefies hashes; the cap is the guard
    * rail, not the design. */
  val ConstellationHashDfCap = 64L

  /** One clip's constellation hashes: (w1, q1, q2, dt) per in-zone peak
    * pair. Pure function, shared nowhere else — kept small and testable. */
  private[graft] def constellationHashes(e: Array[Long]): Seq[(Int, Long, Long, Int)] = {
    val peaks = (1 until AudioWindows - 1).filter(w => e(w) > e(w - 1) && e(w) >= e(w + 1))
    for {
      i <- peaks.indices
      j <- (i + 1) until peaks.length
      if peaks(j) - peaks(i) <= ConstellationZone
    } yield (peaks(i), e(peaks(i)) / ConstellationQuant,
      e(peaks(j)) / ConstellationQuant, peaks(j) - peaks(i))
  }

  def audioConstellation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the hash table is ~|peak pairs| rows per clip (tiny relative to
    // payloads) and has THREE consumers (the df cap and both probe
    // sides of the match join) — materialize it so the decode scan runs
    // once (typed-lambda subtrees defeat exchange reuse, the q175
    // lesson; the plan audit pins the single scan)
    val hashes0 = Materialize.shared(spark, audioEnergyRows(spark, sfDir)
      .flatMap { case (id, e) =>
        constellationHashes(e).map { case (w1, q1, q2, dt) => (id, w1, q1, q2, dt) }
      }
      .toDF("media_id", "w1", "q1", "q2", "dt"))
    // stop-hash drop (see ConstellationHashDfCap): the surviving hash
    // table is tiny (tens of rows), so it broadcasts into both probe
    // sides and the megahub candidates never materialize
    val keep = broadcast(hashes0.groupBy("q1", "q2", "dt")
      .agg(countDistinct(col("media_id")).as("df"))
      .filter(col("df") <= ConstellationHashDfCap)
      .select("q1", "q2", "dt"))
    val hashes = hashes0.join(keep, Seq("q1", "q2", "dt"))
    val a = hashes.select(col("media_id").as("media_a"), col("w1").as("wa"),
      col("q1"), col("q2"), col("dt"))
    val b = hashes.select(col("media_id").as("media_b"), col("w1").as("wb"),
      col("q1"), col("q2"), col("dt"))
    val votes = a.join(b, Seq("q1", "q2", "dt"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        (col("wa") - col("wb")).cast("long").as("offset"))
      .groupBy("media_a", "media_b", "offset")
      .agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_a", "media_b")
      .orderBy(col("votes").desc, col("offset").asc)
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("votes") >= ConstellationMinVotes)
      .select("media_a", "media_b", "offset", "votes")
      .orderBy("media_a", "media_b")
  }

  def audioConstellationSql: String =
    s"""WITH $sqlAudioEnvCtes,
       |pk AS (
       |  SELECT media_id, unnest([w for w in range(1, ${AudioWindows - 1}) if e[w+1] > e[w] AND e[w+1] >= e[w+2]]) AS w, e
       |  FROM env),
       |hs0 AS (
       |  SELECT a.media_id, a.w AS w1,
       |    a.e[a.w+1] // $ConstellationQuant AS q1,
       |    b.e[b.w+1] // $ConstellationQuant AS q2,
       |    b.w - a.w AS dt
       |  FROM pk a JOIN pk b ON a.media_id = b.media_id
       |    AND b.w > a.w AND b.w <= a.w + $ConstellationZone),
       |hdf AS (
       |  SELECT q1, q2, dt, count(DISTINCT media_id) AS df
       |  FROM hs0 GROUP BY q1, q2, dt),
       |hs AS (
       |  SELECT hs0.* FROM hs0 JOIN hdf USING (q1, q2, dt)
       |  WHERE df <= $ConstellationHashDfCap),
       |cand AS (
       |  SELECT x.media_id AS media_a, y.media_id AS media_b,
       |    cast(x.w1 - y.w1 as bigint) AS "offset"
       |  FROM hs x JOIN hs y ON x.q1 = y.q1 AND x.q2 = y.q2 AND x.dt = y.dt
       |    AND x.media_id < y.media_id),
       |vt AS (
       |  SELECT media_a, media_b, "offset", cast(count(*) as bigint) AS votes
       |  FROM cand GROUP BY media_a, media_b, "offset"),
       |best AS (
       |  SELECT media_a, media_b, "offset", votes,
       |    row_number() OVER (PARTITION BY media_a, media_b
       |      ORDER BY votes DESC, "offset" ASC) AS rn
       |  FROM vt)
       |SELECT media_a, media_b, "offset", votes FROM best
       |WHERE rn = 1 AND votes >= $ConstellationMinVotes
       |ORDER BY media_a, media_b""".stripMargin
}
