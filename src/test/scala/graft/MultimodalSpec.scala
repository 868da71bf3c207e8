package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table has binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf0001).toDF()
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and byte-accurate") {
    val f1 = Multimodal.mediaFeatures(spark, sf0001).collect()
    val f2 = Multimodal.mediaFeatures(spark, sf0001).collect()
    assert(f1.toSeq == f2.toSeq)
    // n_bytes equals the document length (ASCII text payloads)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    f1.foreach { r =>
      assert(r.getAs[Long]("n_bytes") == docs(r.getAs[Long]("media_id")))
    }
  }

  test("frame sampling explodes video rows into <=64-byte frames that reassemble") {
    val frames = Multimodal.frameSample(spark, sf0001)
    assert(frames.filter(col("frame_len") > Multimodal.FrameSize).count() == 0)
    // total frame bytes == total video payload bytes
    val totalFrameBytes = frames.agg(sum("frame_len")).collect()(0).getLong(0)
    val videoBytes = Multimodal.mediaTable(spark, sf0001).toDF()
      .filter(col("kind") === "video")
      .agg(sum(length(col("payload")))).collect()(0).getLong(0)
    assert(totalFrameBytes == videoBytes)
    // frame indices are contiguous from 0 per media
    val bad = frames.groupBy("media_id")
      .agg(min("frame_idx").as("mn"), max("frame_idx").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
      .count()
    assert(bad == 0)
  }

  // ---------------------------------------------------------------
  // REAL decode paths (JDK codecs): generated PNG and WAV payloads.
  // ---------------------------------------------------------------

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(sampleRate: Int, nSamples: Int, amplitude: Short): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until nSamples).foreach(i =>
      bb.putShort(if (i % 2 == 0) amplitude else (-amplitude).toShort))
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real PNG decode: dimensions and luma recovered from actual image bytes") {
    import spark.implicits._
    // pure gray (128,128,128): luma = 128 exactly, any size
    val images = spark.createDataset(Seq(
      (1L, pngBytes(8, 6, 0x808080)),
      (2L, pngBytes(3, 5, 0xffffff)),
      (3L, pngBytes(4, 4, 0x000000)),
      (4L, "not an image".getBytes)))
    val info = Multimodal.imageInfo(images).collect().sortBy(_.media_id)
    assert(info.map(_.media_id).toSeq == Seq(1L, 2L, 3L)) // bad bytes skipped
    assert(info(0).width == 8 && info(0).height == 6 &&
      math.abs(info(0).mean_luma - 128.0) < 0.5)
    assert(math.abs(info(1).mean_luma - 255.0) < 0.5)
    assert(info(2).mean_luma == 0.0)
  }

  test("real image resize: output decodes at the target size") {
    import spark.implicits._
    val images = spark.createDataset(Seq((7L, pngBytes(16, 12, 0x336699))))
    val resized = Multimodal.resizeImages(images, 4, 3).collect()
    assert(resized.length == 1)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.head._2))
    assert(back.getWidth == 4 && back.getHeight == 3)
  }

  test("real WAV decode: header metadata and RMS from actual PCM bytes") {
    import spark.implicits._
    val amp: Short = 1000
    val audio = spark.createDataset(Seq(
      (1L, wavBytes(8000, 8000, amp)),   // 1 second
      (2L, wavBytes(16000, 4000, amp)),  // 250 ms
      (3L, Array[Byte](1, 2, 3))))       // not audio
    val info = Multimodal.audioInfo(audio).collect().sortBy(_.media_id)
    assert(info.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(info(0).sample_rate == 8000 && info(0).channels == 1)
    assert(info(0).duration_ms == 1000 && info(1).duration_ms == 250)
    // constant-magnitude square wave: RMS == amplitude
    assert(math.abs(info(0).rms - amp.toDouble) < 1.0)
  }
}
