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
}
