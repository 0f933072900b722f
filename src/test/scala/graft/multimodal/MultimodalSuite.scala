package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

class MultimodalSuite extends SparkTestBase {

  private def media = Multimodal.mediaFrom(
    spark, QueryPack.t(spark, sf(), "documents").limit(50), "doc_id", "text", "video")

  test("schema contract: binary payload + typed metadata struct") {
    val df = media
    assert(df.schema("bytes").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    assert(df.count() == 50)
  }

  test("batched feature extraction is deterministic and batch-size invariant") {
    val f1 = Multimodal.extractFeatures(media, batchSize = 7)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(media, batchSize = 64)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2) // decode result must not depend on batching
    assert(f1.values.forall(_.length == Multimodal.FeatureDim))
    assert(f1.values.exists(_.exists(_ != 0f)))
  }

  test("frame sampling explodes video rows with timestamps") {
    val frames = Multimodal.sampleFrames(media, framesPerVideo = 4)
    assert(frames.count() == 50 * 4)
    val ts = frames.filter(col("media_id") === 0).select("frame_index", "frame_ts_ms")
      .orderBy("frame_index").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(ts.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(ts.map(_._2).toSeq.sliding(2).forall(p => p.head <= p.last)) // monotone
  }

  test("resize updates image metadata only") {
    val imgs = media.withColumn("modality", lit("image"))
    val resized = Multimodal.resizeImages(imgs, 224, 224)
    val m = resized.select("meta.width", "meta.height").head()
    assert(m.getInt(0) == 224 && m.getInt(1) == 224)
    val vids = Multimodal.resizeImages(media, 224, 224) // modality=video: untouched
    assert(vids.select("meta.width").head().isNullAt(0))
  }
}
