package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * as opaque binary columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample as BATCHED partition-local transforms.
  *
  * REAL decode paths (pure-JVM, no native libs): images via ImageIO, WAV
  * PCM-16 via byte parsing, FLAC via the dependency-free [[FlacDecode]],
  * MP3 via [[Mp3Decode]]. Only the codecs that genuinely need native
  * bindings (ffmpeg-class video, Opus) are STUBBED with deterministic
  * byte-hash-derived outputs, clearly marked below. Everything Spark-side is real and tested:
  * the schema contract, the mapPartitions batching shape (the Scala
  * equivalent of Python's `mapInPandas` — batch in, batch out, no per-row
  * overhead), partition sizing, and the explode of per-frame rows.
  *
  * MP3 decodes for REAL since r14 ([[Mp3Decode]]): MPEG-1/2 Layer III with
  * a VALIDATED-SUBSET posture — only Huffman tables whose transcription
  * passes Kraft+prefix structural validation ship; frames selecting the
  * unvalidatable ESC families reject cleanly rather than decode wrong.
  * The r13 refusal rationale that stood here (no offline ground truth)
  * was superseded by three validation legs that do not require one: the
  * structural table checks, the per-granule bit-exact part2_3_length
  * landing, and one real LAME stream found in the container — see the
  * Mp3Decode header for the full argument and the documented residue.
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

  /** REAL image decode (JDK ImageIO — no native libs needed): features are a
    * 4x4 average-luminance grid in [-1, 1], the classic tiny visual
    * descriptor. Returns None when the bytes aren't a decodable image.
    */
  private[multimodal] def imageFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val g = 4 // g*g == FeatureDim
        val out = new Array[Float](FeatureDim)
        val cw = math.max(1, img.getWidth / g)
        val ch = math.max(1, img.getHeight / g)
        var cy = 0
        while (cy < g) {
          var cx = 0
          while (cx < g) {
            var sum = 0.0; var n = 0
            var y = cy * ch
            val yEnd = if (cy == g - 1) img.getHeight else math.min((cy + 1) * ch, img.getHeight)
            val xEnd = if (cx == g - 1) img.getWidth else math.min((cx + 1) * cw, img.getWidth)
            while (y < yEnd) {
              var x = cx * cw
              while (x < xEnd) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                n += 1; x += 1
              }
              y += 1
            }
            out(cy * g + cx) = if (n == 0) 0f else ((sum / n) / 127.5 - 1.0).toFloat
            cx += 1
          }
          cy += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** REAL audio decode for RIFF/WAVE PCM-16 payloads (pure byte parsing, no
    * codec libs): (sample_rate, channels, bits, duration) from the fmt/data
    * chunks, features = RMS energy over FeatureDim equal windows of the PCM
    * stream, mapped to [-1, 1]. Returns None for non-WAV / non-PCM16 bytes.
    */
  private[graft] def wavInfo(bytes: Array[Byte]): Option[(Int, Int, Int, Long, Int, Int)] = try {
    def u16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int) = ((bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)).toInt
    def tag(o: Int) = if (o + 4 > bytes.length) "" else new String(bytes, o, 4, "ISO-8859-1")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // Long cursor: a crafted ~2 GB chunk size would wrap an Int cursor
    // negative and index out of bounds (and this probe, like the others,
    // must never throw on untrusted bytes — hence the belt-and-braces try)
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, size)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val o = off.toInt
      val id = tag(o); val size = u32(o + 4)
      if (size < 0) return None // crafted >2GB/negative chunk size: bail out
      if (id == "fmt " && off + 24 <= bytes.length && u16(o + 8) == 1) // PCM only
        fmt = Some((u16(o + 10), u32(o + 12), u16(o + 22)))
      else if (id == "data") data = Some((o + 8, math.min(size, bytes.length - o - 8)))
      off += 8L + size + (size & 1) // chunks are word-aligned
    }
    for ((ch, rate, bits) <- fmt; (dOff, dSize) <- data if bits == 16 && ch >= 1 && rate > 0)
      yield {
        val durMs = dSize.toLong * 1000L / (rate.toLong * ch * 2)
        (rate, ch, bits, durMs, dOff, dSize)
      }
  } catch { case _: Exception => None }

  /** RMS energy over FeatureDim equal windows of [0, nSamples), samples in
    * [-1, 1] via `sampleAt` — shared by the WAV and FLAC real-decode paths
    * so identical PCM yields identical features regardless of container.
    */
  private def rmsWindows(nSamples: Int, sampleAt: Int => Double): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (nSamples == 0) return out
    val win = math.max(1, nSamples / FeatureDim)
    var w = 0
    while (w < FeatureDim) {
      var sum = 0.0; var n = 0
      var s = w * win
      val end = if (w == FeatureDim - 1) nSamples else math.min((w + 1) * win, nSamples)
      while (s < end) {
        val v = sampleAt(s)
        sum += v * v; n += 1; s += 1
      }
      out(w) = if (n == 0) -1f else (math.sqrt(sum / n) * 2.0 - 1.0).toFloat
      w += 1
    }
    out
  }

  private[graft] def wavFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    wavInfo(bytes).map { case (_, _, _, _, dOff, dSize) =>
      rmsWindows(dSize / 2, { s =>
        val o = dOff + s * 2
        ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort.toDouble / 32768.0
      })
    }

  /** REAL audio decode for FLAC payloads via [[FlacDecode]] — the feature
    * path now matches the metadata path ([[flacInfo]]): same RMS windowing
    * as WAV over the decoded interleaved PCM, normalized by the stream's
    * bit depth. None for non-FLAC / undecodable bytes.
    */
  private[graft] def flacFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    FlacDecode.decode(bytes).map { pcm =>
      val scale = (1L << (pcm.bits - 1)).toDouble
      rmsWindows(pcm.samples.length, s => pcm.samples(s) / scale)
    }

  /** REAL audio decode for MP3 payloads via [[Mp3Decode]] (MPEG-1/2 Layer
    * III; see that file's validation posture) — same RMS windowing over the
    * decoded 16-bit-range PCM. None for non-MP3 / undecodable bytes.
    */
  private[graft] def mp3Features(bytes: Array[Byte]): Option[Array[Float]] =
    Mp3Decode.decode(bytes).filter(_.samples.nonEmpty).map { pcm =>
      rmsWindows(pcm.samples.length, s => pcm.samples(s) / 32768.0)
    }

  /** Batched feature extraction over the binary column: mapPartitions with an
    * explicit batch size — rows are decoded `batchSize` at a time (matching
    * how a native decoder amortizes setup), output is one feature vector per
    * row. The iterator never materializes the partition. Image rows decode
    * for REAL (ImageIO luminance grid), audio rows for REAL when they are
    * RIFF/WAVE PCM-16, FLAC ([[FlacDecode]]) or MP3 ([[Mp3Decode]]; RMS
    * energy windows either way); video and other payloads fall back to the
    * deterministic stub kernel (those codecs aren't in this container).
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = media.schema
      .add("features", ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one "decoder call" per batch
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val feats =
            if (bytes == null) new Array[Float](FeatureDim)
            else r.getAs[String]("modality") match {
              case "image" => imageFeatures(bytes).getOrElse(fakeDecodeBatch(bytes))
              case "audio" => wavFeatures(bytes).orElse(flacFeatures(bytes))
                .orElse(mp3Features(bytes))
                .getOrElse(fakeDecodeBatch(bytes))
              case _ => fakeDecodeBatch(bytes)
            }
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(enc)
  }

  /** FLAC STREAMINFO probe (the mandatory first metadata block after the
    * `fLaC` magic): (sample_rate_hz, duration_ms) from the packed 20-bit
    * rate and 36-bit total-sample count. Public byte layout (RFC 9639);
    * never throws on untrusted bytes. This is the metadata probe; full
    * FLAC PCM decode (the feature path) lives in [[graft.multimodal.FlacDecode]].
    */
  private[graft] def flacInfo(bytes: Array[Byte]): Option[(Int, Long)] =
    try {
      if (bytes.length < 42 || bytes(0) != 'f' || bytes(1) != 'L' ||
          bytes(2) != 'a' || bytes(3) != 'C') return None
      if ((bytes(4) & 0x7f) != 0) return None // STREAMINFO must be first
      val si = 8
      def b(i: Int) = bytes(si + i) & 0xffL
      val rate = ((b(10) << 12) | (b(11) << 4) | (b(12) >> 4)).toInt
      val totalSamples = ((b(13) & 0x0fL) << 32) | (b(14) << 24) | (b(15) << 16) |
        (b(16) << 8) | b(17)
      if (rate <= 0) None else Some((rate, totalSamples * 1000L / rate))
    } catch { case _: Exception => None }

  /** MPEG-1/2/2.5 Layer III frame-header probe: skips an ID3v2 tag
    * (syncsafe size), finds the first 0xFFEx sync, reads the version /
    * bitrate / sample-rate indexes, and derives duration from the Xing/
    * Info/VBRI frame count when the first frame carries one (exact for
    * VBR and LAME-tagged CBR), falling back to payload_bytes * 8 /
    * bitrate (exact for plain CBR, an estimate otherwise). Public byte
    * layouts (ISO 11172-3; LAME/Fraunhofer VBR tags); never throws.
    */
  private[graft] def mp3Info(bytes: Array[Byte]): Option[(Int, Long)] =
    try {
      if (bytes.length < 4) return None
      var off = 0
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
        val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        off = 10 + sz
        if (off < 0 || off >= bytes.length) return None
      }
      var i = off
      while (i + 4 <= bytes.length &&
        !((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xe0) == 0xe0)) i += 1
      if (i + 4 > bytes.length) return None
      val h1 = bytes(i + 1) & 0xff; val h2 = bytes(i + 2) & 0xff
      val verBits = (h1 >> 3) & 3   // 0=V2.5, 2=V2, 3=V1 (1 reserved)
      val layerBits = (h1 >> 1) & 3 // 1 = Layer III
      if (verBits == 1 || layerBits != 1) return None
      val brIdx = (h2 >> 4) & 0xf; val srIdx = (h2 >> 2) & 3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val rate = (verBits match {
        case 3 => Array(44100, 48000, 32000)
        case 2 => Array(22050, 24000, 16000)
        case _ => Array(11025, 12000, 8000)
      })(srIdx)
      val kbps = (if (verBits == 3) Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
                  else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))(brIdx)
      // VBR: a Xing/Info (or VBRI) header in the first frame's payload
      // carries the exact frame count — duration from it is exact for VBR
      // files where the CBR payload estimate can be off by 2x. Xing sits
      // after the side info (version/channel dependent), VBRI at a fixed
      // +32. Public layouts (LAME/Fraunhofer, widely documented).
      def u32be(o: Int): Long =
        ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
          ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      def tagAt(o: Int): String =
        if (o + 4 <= bytes.length)
          new String(bytes, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
        else ""
      val mono = ((bytes(i + 3) >> 6) & 3) == 3
      val spf = if (verBits == 3) 1152 else 576 // Layer III samples per frame
      val side = if (verBits == 3) { if (mono) 17 else 32 } else { if (mono) 9 else 17 }
      // protection bit 0 = a CRC-16 sits between header and side info
      val crc = if ((bytes(i + 1) & 1) == 0) 2 else 0
      val xOff = i + 4 + crc + side
      val vOff = i + 4 + 32
      val vbrFrames: Option[Long] = tagAt(xOff) match {
        case "Xing" | "Info" if xOff + 12 <= bytes.length && (u32be(xOff + 4) & 1L) != 0 =>
          Some(u32be(xOff + 8))
        case _ if tagAt(vOff) == "VBRI" && vOff + 18 <= bytes.length =>
          Some(u32be(vOff + 14)) // frames at +14: ver(2) delay(2) quality(2) bytes(4)
        case _ => None
      }
      val durMs = vbrFrames.filter(_ > 0) match {
        case Some(frames) => frames * spf * 1000L / rate
        case None => (bytes.length - i).toLong * 8L / kbps // CBR estimate: kbps == bits/ms
      }
      Some((rate, durMs))
    } catch { case _: Exception => None }

  /** OGG container probe: identification header from the first page
    * ("OpusHead" -> 48 kHz output rate per RFC 7845; "vorbis" -> the
    * id header's sample rate), duration from the LAST page's granule
    * position (PCM sample count at the stream's granule rate: 48 kHz for
    * Opus regardless of input rate, the id-header rate for Vorbis). Public
    * byte layouts (RFC 3533/7845, Vorbis I spec); never throws.
    */
  private[graft] def oggInfo(bytes: Array[Byte]): Option[(Int, Long)] =
    try {
      if (bytes.length < 58 || bytes(0) != 'O' || bytes(1) != 'g' ||
          bytes(2) != 'g' || bytes(3) != 'S') return None
      def str(off: Int, n: Int): String =
        if (off + n > bytes.length) ""
        else new String(bytes, off, n, java.nio.charset.StandardCharsets.ISO_8859_1)
      def u32le(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      // first page payload starts after the 27-byte header + segment table
      val nSegs0 = bytes(26) & 0xff
      val p0 = 27 + nSegs0
      val (granuleRate, sampleRate, preSkip) =
        if (str(p0, 8) == "OpusHead") {
          val inputRate = if (p0 + 16 <= bytes.length) u32le(p0 + 12).toInt else 48000
          // RFC 7845 §5.1: pre-skip (u16 LE at offset 10) is decoder priming
          // samples to discard; audible duration excludes it.
          val skip = if (p0 + 12 <= bytes.length)
            (bytes(p0 + 10) & 0xff) | ((bytes(p0 + 11) & 0xff) << 8) else 0
          (48000, if (inputRate > 0) inputRate else 48000, skip.toLong) // granules always 48 kHz
        } else if (bytes(p0) == 1 && str(p0 + 1, 6) == "vorbis") {
          // Vorbis I id packet: type byte 0x01 + "vorbis" + version(4) +
          // channels(1) + rate (u32 LE at +12 from the type byte); the
          // explicit type-byte check replaces an invisible \u0001 that used
          // to live inside the string literal
          val rate = if (p0 + 16 <= bytes.length) u32le(p0 + 12).toInt else 0
          if (rate <= 0) return None
          (rate, rate, 0L)
        } else return None
      // Walk page-by-page (RFC 3533: next page = 27-byte header + segment
      // table + lacing sum) so an 'OggS' occurring inside a packet payload is
      // never mistaken for a page header while the stream is well-formed.
      // After a malformed page (corruption, or the junk between chained/
      // concatenated streams) the walk RESYNCHRONIZES on the next capture
      // pattern instead of truncating the duration at the damage point —
      // best-effort recovery, only ever engaged once the strict walk has
      // already failed.
      def nextCapture(from: Int): Int = {
        var p = math.max(from, 0)
        while (p + 4 <= bytes.length) {
          if (bytes(p) == 'O' && bytes(p + 1) == 'g' && bytes(p + 2) == 'g' && bytes(p + 3) == 'S')
            return p
          p += 1
        }
        -1
      }
      var lastGranule = -1L
      var i = 0
      while (i >= 0 && i + 27 <= bytes.length) {
        if (bytes(i) != 'O' || bytes(i + 1) != 'g' || bytes(i + 2) != 'g' || bytes(i + 3) != 'S') {
          i = nextCapture(i + 1)
        } else if ((bytes(i + 4) & 0xff) != 0 || (bytes(i + 5) & 0xff) >= 8) {
          // capture pattern with an invalid stream_structure_version (must be
          // 0) or undefined header_type flag bits (only 3 defined): a payload
          // decoy hit during resync, not a page — skip past it, or a garbage
          // granule here could inflate duration by years
          i = nextCapture(i + 1)
        } else {
          var g = 0L
          var j = 7
          while (j >= 0) { g = (g << 8) | (bytes(i + 6 + j) & 0xffL); j -= 1 }
          if (g >= 0 && g > lastGranule) lastGranule = g
          val nSegs = bytes(i + 26) & 0xff
          if (i + 27 + nSegs > bytes.length) i = -1 // truncated tail: stop
          else {
            var lace = 0; var s = 0
            while (s < nSegs) { lace += bytes(i + 27 + s) & 0xff; s += 1 }
            i += 27 + nSegs + lace
          }
        }
      }
      val samples = math.max(0L, lastGranule - preSkip)
      val dur = if (samples > 0) samples * 1000L / granuleRate else 0L
      Some((sampleRate, dur))
    } catch { case _: Exception => None }

  /** (sample_rate, duration_ms) across the supported audio containers:
    * WAV (full PCM parse), FLAC (STREAMINFO), OGG Opus/Vorbis (granule
    * positions), MP3 (frame header + CBR duration estimate).
    */
  private[graft] def audioInfo(bytes: Array[Byte]): Option[(Int, Long)] =
    wavInfo(bytes).map { case (rate, _, _, durMs, _, _) => (rate, durMs) }
      .orElse(flacInfo(bytes))
      .orElse(oggInfo(bytes))
      .orElse(mp3Info(bytes))

  /** Fill the audio rows' metadata (sample_rate, duration_ms) from WAV,
    * FLAC, OGG (Opus/Vorbis) or MP3 headers — the audio twin of the video
    * container probes; unrecognized audio keeps its existing metadata.
    * The probe only evaluates on audio rows: image/video payloads would
    * pay a full-byte MP3 sync scan for nothing and needlessly widen the
    * untrusted-parse surface.
    */
  def withAudioMeta(media: DataFrame): DataFrame = {
    val probe = udf { bytes: Array[Byte] =>
      if (bytes == null) (None: Option[Int], None: Option[Long])
      else audioInfo(bytes) match {
        case Some((rate, durMs)) => (Some(rate), Some(durMs))
        case None => (None, None)
      }
    }
    media
      .withColumn("__a",
        when(col("modality") === "audio", probe(col("bytes")))
          .otherwise(lit(null).cast("struct<_1:int,_2:bigint>")))
      .withColumn("meta",
        when(col("modality") === "audio" && col("__a._1").isNotNull,
          struct(col("meta.width").as("width"), col("meta.height").as("height"),
            col("__a._2").as("duration_ms"), col("__a._1").as("sample_rate")))
          .otherwise(col("meta")))
      .drop("__a")
  }

  /** Image resize: REAL for decodable images (java.awt scaling + PNG
    * re-encode, same JDK-only kernel as the unstructured thumbnails);
    * non-decodable payloads keep their bytes and only update the metadata
    * contract (the prior stub behavior, kept as the fallback).
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val resize = udf { bytes: Array[Byte] =>
      if (bytes == null) null
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) bytes
        else {
          val scaled = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val gfx = scaled.createGraphics()
          gfx.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
          gfx.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", out)
          out.toByteArray
        }
      } catch { case _: Exception => bytes }
    }
    media
      .withColumn("bytes",
        when(col("modality") === "image", resize(col("bytes"))).otherwise(col("bytes")))
      .withColumn("meta",
        when(col("modality") === "image",
          struct(lit(w).as("width"), lit(h).as("height"),
            col("meta.duration_ms").as("duration_ms"),
            col("meta.sample_rate").as("sample_rate")))
          .otherwise(col("meta")))
  }

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

  // ---- perceptual audio fingerprinting (real WAV/FLAC PCM decode) ----

  /** 64-bit audio fingerprint from the energy CONTOUR: 65 RMS windows over
    * the PCM, one bit per consecutive-window comparison (E[i+1] > E[i]).
    * Comparisons make it invariant to uniform gain (scaling every sample
    * scales every window energy, preserving the order relation) — the same
    * trick dHash uses for brightness. WAV (PCM-16) and FLAC payloads
    * decode for real; anything else is None.
    */
  private[graft] def audioFingerprint64(bytes: Array[Byte]): Option[Long] = {
    val wins = 65
    def contour(nSamples: Int, sampleAt: Int => Double): Option[Long] = {
      if (nSamples < wins) return None
      val e = new Array[Double](wins)
      val win = nSamples / wins
      var w = 0
      while (w < wins) {
        var sum = 0.0
        var s = w * win
        val end = if (w == wins - 1) nSamples else (w + 1) * win
        while (s < end) { val v = sampleAt(s); sum += v * v; s += 1 }
        e(w) = sum / (end - w * win)
        w += 1
      }
      var hash = 0L
      var i = 0
      while (i < 64) {
        if (e(i + 1) > e(i)) hash |= (1L << i)
        i += 1
      }
      Some(hash)
    }
    wavInfo(bytes) match {
      case Some((_, _, _, _, dOff, dSize)) =>
        contour(dSize / 2, { s =>
          val o = dOff + s * 2
          ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort.toDouble / 32768.0
        })
      case None => FlacDecode.decode(bytes).flatMap { pcm =>
        val scale = (1L << (pcm.bits - 1)).toDouble
        contour(pcm.samples.length, s => pcm.samples(s) / scale)
      }.orElse(Mp3Decode.decode(bytes).flatMap { pcm =>
        contour(pcm.samples.length, s => pcm.samples(s) / 32768.0)
      })
    }
  }

  /** Near-duplicate audio pairs by fingerprint Hamming distance — the same
    * pigeonhole banding as [[imageNearDuplicates]] on the 64-bit energy
    * contour. Decode is map-side; only (band, bits, id) rows shuffle.
    *
    * @return (id_a, id_b, hamming) with id_a < id_b
    */
  def audioNearDuplicates(media: DataFrame, idCol: String, contentCol: String,
      maxDistance: Int = 4): DataFrame = {
    require(maxDistance >= 0 && maxDistance < 32)
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = media.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => audioFingerprint64(bytes).map(h => (id, h)) }
      .toDF("id", "fp")
    hammingPairs(hashes, "fp", maxDistance)
  }

  /** Incremental media ingest dedup: new batch vs an EXISTING hash index
    * (`corpusIndex`: (id, hash) — persist [[imageHashes]]' output once,
    * reuse per batch), no corpus re-decode and no corpus self-join. The
    * asymmetric shape of `Dedup.incrementalDedup` on a 64-bit visual/audio
    * hash: batch rows band against the index's banded copy, exact Hamming
    * verifies candidates. Per-batch cost tracks the batch.
    *
    * @return (batch_id, corpus_id, hamming)
    */
  def mediaIngestNearDuplicates(corpusIndex: DataFrame, batchHashes: DataFrame,
      maxDistance: Int = 3): DataFrame = {
    require(maxDistance >= 0 && maxDistance < 32)
    val bands = maxDistance + 1
    val width = (64 + bands - 1) / bands
    def banded(df: DataFrame, side: String) =
      df.select(col("id").as(s"${side}_id"), col("hash").as(s"__h_$side"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("hash"), b * width)
              .bitwiseAND(lit((1L << math.min(width, 63)) - 1)).as("bits"))
        }: _*)).as("bb"))
        .select(col(s"${side}_id"), col(s"__h_$side"),
          col("bb.band").as(s"band_$side"), col("bb.bits").as(s"bits_$side"))
    banded(batchHashes.toDF("id", "hash"), "batch")
      .join(banded(corpusIndex.toDF("id", "hash"), "corpus"),
        col("band_batch") === col("band_corpus") && col("bits_batch") === col("bits_corpus"))
      // one row per pair WITHOUT a distinct shuffle: keep only the hit on
      // the FIRST band the two hashes agree on (computable from the hashes
      // alone, so this also keeps the plan stateless for streaming use)
      .where(col("band_batch") === firstAgreeingBand(
        col("__h_batch"), col("__h_corpus"), bands, width))
      .select(col("batch_id"), col("corpus_id"),
        bit_count(col("__h_batch").bitwiseXOR(col("__h_corpus"))).cast("int").as("hamming"))
      .where(col("hamming") <= maxDistance)
  }

  /** The smallest band index on which two 64-bit hashes agree (-1 = none);
    * a pure column expression, evaluated per joined row.
    */
  private def firstAgreeingBand(h1: org.apache.spark.sql.Column,
      h2: org.apache.spark.sql.Column, bands: Int, width: Int): org.apache.spark.sql.Column =
    (bands - 1 to 0 by -1).foldLeft(lit(-1)) { (acc, b) =>
      val mask = (1L << math.min(width, 63)) - 1
      when(shiftright(h1, b * width).bitwiseAND(lit(mask)) ===
        shiftright(h2, b * width).bitwiseAND(lit(mask)), lit(b)).otherwise(acc)
    }

  /** Banded Hamming pair join over a 64-bit hash column: `maxDistance + 1`
    * bands, bucket-join, exact verify; multi-band duplicate hits resolve
    * via the first-agreeing-band filter (no distinct shuffle).
    */
  private def hammingPairs(hashes: DataFrame, hashCol: String,
      maxDistance: Int): DataFrame = {
    val bands = maxDistance + 1
    val width = (64 + bands - 1) / bands
    val banded = hashes.select(col("id"), col(hashCol).as("__h"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col(hashCol), b * width)
            .bitwiseAND(lit((1L << math.min(width, 63)) - 1)).as("bits"))
      }: _*)).as("bb"))
      .select(col("id"), col("__h"), col("bb.band"), col("bb.bits"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.id") < col("b.id"))
      .where(col("a.band") === firstAgreeingBand(col("a.__h"), col("b.__h"), bands, width))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.__h").bitwiseXOR(col("b.__h"))).cast("int").as("hamming"))
      .where(col("hamming") <= maxDistance)
  }

  // ---- perceptual image hashing (REAL ImageIO decode, pure JVM) ----

  /** Nearest-neighbor grayscale downsample to w x h — integer arithmetic
    * only, so the grid (and every hash built on it) is bit-deterministic.
    */
  private def graySample(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x * img.getWidth / w, y * img.getHeight / h)
        out(y * w + x) =
          (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)) / 1000
        x += 1
      }
      y += 1
    }
    out
  }

  /** dHash: 9x8 grayscale grid, one bit per horizontal gradient sign —
    * the classic difference hash. A localized pixel edit flips at most a
    * couple of gradient bits, so near-duplicates sit within a small
    * Hamming distance while unrelated images scatter.
    */
  private[graft] def dHash64(bytes: Array[Byte]): Option[Long] = try {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null || img.getWidth == 0 || img.getHeight == 0) None
    else {
      val g = graySample(img, 9, 8)
      var hash = 0L; var bit = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (g(y * 9 + x) < g(y * 9 + x + 1)) hash |= (1L << bit)
          bit += 1; x += 1
        }
        y += 1
      }
      Some(hash)
    }
  } catch { case _: Exception => None }

  /** pHash: 32x32 grayscale, 2D DCT-II, the low-frequency 8x8 block
    * thresholded at its own median (DC term excluded from the median so a
    * uniform brightness shift cannot flip the whole hash).
    */
  private[graft] def pHash64(bytes: Array[Byte]): Option[Long] = try {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null || img.getWidth == 0 || img.getHeight == 0) None
    else {
      val n = 32
      val g = graySample(img, n, n).map(_.toDouble)
      // separable DCT-II, low 8x8 only: 8*32 + 8*8 inner products
      val cosT = Array.tabulate(8, n)((u, i) => math.cos((2 * i + 1) * u * math.Pi / (2.0 * n)))
      val rows = Array.tabulate(8, n) { (u, y) =>
        var s = 0.0; var x = 0
        while (x < n) { s += g(y * n + x) * cosT(u)(x); x += 1 }
        s
      }
      val coef = Array.tabulate(8, 8) { (v, u) =>
        var s = 0.0; var y = 0
        while (y < n) { s += rows(u)(y) * cosT(v)(y); y += 1 }
        s
      }
      val flat = (for (v <- 0 until 8; u <- 0 until 8 if v != 0 || u != 0) yield coef(v)(u)).toArray
      val sorted = flat.sorted
      val median = (sorted(30) + sorted(31)) / 2.0
      var hash = 0L; var bit = 0
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          if ((v != 0 || u != 0) && coef(v)(u) > median) hash |= (1L << bit)
          bit += 1; u += 1
        }
        v += 1
      }
      Some(hash)
    }
  } catch { case _: Exception => None }

  /** (id, dhash, phash) for every decodable image row; undecodable rows
    * drop (they cannot participate in visual dedup). Pure map-side.
    */
  def imageHashes(media: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        for (d <- dHash64(bytes); p <- pHash64(bytes)) yield (id, d, p)
      }
      .toDF("id", "dhash", "phash")
  }

  /** Near-duplicate image pairs by dHash Hamming distance, the SimHash
    * banding shape on a 64-bit visual hash: split into `maxDistance + 1`
    * bands (pigeonhole: any pair within the distance agrees on >= 1 whole
    * band), bucket-join per band, verify EXACT Hamming on the candidates,
    * dedup multi-band hits. One keyed shuffle of (band, bits, id) — image
    * bytes decode map-side once and never shuffle.
    *
    * @return (id_a, id_b, hamming) with id_a < id_b
    */
  def imageNearDuplicates(media: DataFrame, idCol: String, contentCol: String,
      maxDistance: Int = 3): DataFrame = {
    require(maxDistance >= 0 && maxDistance < 32)
    hammingPairs(imageHashes(media, idCol, contentCol).select("id", "dhash"),
      "dhash", maxDistance)
  }
}
