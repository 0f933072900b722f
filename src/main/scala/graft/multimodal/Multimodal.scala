package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * as opaque binary columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample as BATCHED partition-local transforms.
  *
  * The real decoders (libjpeg/ffmpeg bindings) are not in this container, so
  * the decode kernels are STUBBED with deterministic byte-hash-derived
  * outputs, clearly marked below. Everything Spark-side is real and tested:
  * the schema contract, the mapPartitions batching shape (the Scala
  * equivalent of Python's `mapInPandas` — batch in, batch out, no per-row
  * overhead), partition sizing, and the explode of per-frame rows.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),       // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType))))))

  val FeatureDim = 16

  /** STUB decode kernel: a real implementation calls the native decoder per
    * batch; this derives a deterministic FeatureDim-vector from the content
    * bytes so the pipeline is testable end-to-end offline.
    */
  private[multimodal] def fakeDecodeBatch(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var j = 0
    while (j < FeatureDim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      out(j) = ((h & 0xffff).toFloat / 0xffff.toFloat) * 2f - 1f
      j += 1
    }
    out
  }

  /** Batched feature extraction over the binary column: mapPartitions with an
    * explicit batch size — rows are decoded `batchSize` at a time (matching
    * how a native decoder amortizes setup), output is one feature vector per
    * row. The iterator never materializes the partition.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = media.schema
      .add("features", ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one "decoder call" per batch (stubbed)
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val feats = if (bytes == null) new Array[Float](FeatureDim) else fakeDecodeBatch(bytes)
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(enc)
  }

  /** STUB resize: contract only — emits the target dims + original bytes
    * (real kernel re-encodes). Shows the metadata-update shape.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      when(col("modality") === "image",
        struct(lit(w).as("width"), lit(h).as("height"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.sample_rate").as("sample_rate")))
        .otherwise(col("meta")))

  /** Frame sampling for video rows: emits `framesPerVideo` rows per input,
    * each with a deterministic pseudo-frame payload (STUB decode) and a
    * frame index + timestamp. Non-video rows pass through with frame 0.
    */
  def sampleFrames(media: DataFrame, framesPerVideo: Int = 4): DataFrame = {
    val frameIdx = when(col("modality") === "video",
      sequence(lit(0), lit(framesPerVideo - 1))).otherwise(array(lit(0)))
    media
      .withColumn("frame_index", explode(frameIdx))
      .withColumn("frame_ts_ms",
        when(col("modality") === "video",
          ((col("meta.duration_ms") * col("frame_index")) / framesPerVideo).cast("long"))
          .otherwise(lit(0L)))
      // STUB: real kernel decodes the frame; we tag the payload with the index
      .withColumn("frame_bytes",
        when(col("modality") === "video",
          concat(col("bytes"), encode(col("frame_index").cast("string"), "UTF-8")))
          .otherwise(col("bytes")))
  }

  /** Build a media DataFrame from any table with an id and a binary-ish
    * column (test/bootstrap helper; text bytes stand in for real media).
    */
  def mediaFrom(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      encode(col(payloadCol).cast("string"), "UTF-8").as("bytes"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        (length(col(payloadCol)) * 40L).as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))
}
