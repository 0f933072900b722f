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

  /** 8x8 PNG, left half black, right half white. */
  private def halfPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("image rows decode for real: luminance grid reflects pixel content") {
    import spark.implicits._
    val df = Seq((1L, halfPng())).toDF("media_id", "bytes")
      .withColumn("modality", lit("image"))
      .withColumn("meta", struct(lit(8).as("width"), lit(8).as("height"),
        lit(null).cast("long").as("duration_ms"), lit(null).cast("int").as("sample_rate")))
    val feats = Multimodal.extractFeatures(df).select("features")
      .head().getSeq[Float](0)
    // grid cells are row-major 4x4: columns 0-1 black (-1), columns 2-3 white (+1)
    for (row <- 0 until 4) {
      assert(feats(row * 4) < -0.9f && feats(row * 4 + 1) < -0.9f, s"row $row left must be dark")
      assert(feats(row * 4 + 2) > 0.9f && feats(row * 4 + 3) > 0.9f, s"row $row right must be bright")
    }
  }

  /** 1-second 8kHz mono PCM-16 WAV: first half silent, second half loud. */
  private def halfWav(): Array[Byte] = {
    val rate = 8000
    val n = rate // 1 second
    val data = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val v: Short = if (i % 2 == 0) 20000 else -20000
      data(i * 2) = (v & 0xFF).toByte
      data(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(data.length).put(data)
    bb.array()
  }

  test("audio rows decode for real: WAV meta and RMS-energy features") {
    import spark.implicits._
    val df = Seq((1L, halfWav())).toDF("media_id", "bytes")
      .withColumn("modality", lit("audio"))
      .withColumn("meta", struct(lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"), lit(null).cast("int").as("sample_rate")))
    val m = Multimodal.withAudioMeta(df).select("meta.sample_rate", "meta.duration_ms").head()
    assert(m.getInt(0) == 8000 && m.getLong(1) == 1000L)
    val feats = Multimodal.extractFeatures(df).select("features").head().getSeq[Float](0)
    // first 8 windows silent (RMS 0 -> -1), last 8 loud (RMS ~0.61 -> ~0.22)
    assert(feats.take(8).forall(_ < -0.95f), s"silent half must be low-energy: $feats")
    assert(feats.drop(8).forall(_ > 0f), s"loud half must be high-energy: $feats")
  }

  test("flac and mp3 header probes recover sample rate and duration") {
    // FLAC: fLaC magic + STREAMINFO (type 0, 34 bytes): rate 44100 Hz,
    // 441000 total samples -> 10 s
    val flac = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes); out.write(0); out.write(0); out.write(0); out.write(34)
      val si = new Array[Byte](34)
      // bytes 10-12: 20-bit rate 44100 = 0x0AC44 -> packed <<4
      si(10) = 0x0A.toByte; si(11) = 0xC4.toByte; si(12) = 0x40.toByte
      // bits 4..0 of byte 12 + byte 13 high nibble: channels/bps (ignored)
      // bytes 13(low nibble)-17: 36-bit total samples = 441000 = 0x6BAA8
      si(13) = 0x00; si(14) = 0x00; si(15) = 0x06; si(16) = 0xBA.toByte; si(17) = 0xA8.toByte
      out.write(si)
      out.toByteArray
    }
    assert(Multimodal.flacInfo(flac).contains((44100, 10000L)))

    // MP3: ID3v2 tag (10-byte header, 20-byte body) + V1 Layer III frame
    // header (bitrate idx 9 = 128 kbps, rate idx 0 = 44100) + payload.
    // 1600 bytes after the sync at 128 kbps -> 1600*8/128 = 100 ms
    val mp3 = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("ID3".getBytes); out.write(Array[Byte](3, 0, 0, 0, 0, 0, 20))
      out.write(new Array[Byte](20))
      out.write(Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte)) // sync+V1L3, 128kbps/44100
      out.write(new Array[Byte](1596))
      out.toByteArray
    }
    assert(Multimodal.mp3Info(mp3).contains((44100, 100L)))

    // VBR: a Xing header (MPEG1 stereo -> offset 4+32 into the frame) with
    // frame count 100 overrides the CBR estimate: 100*1152*1000/44100 = 2612
    val vbr = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte))
      out.write(new Array[Byte](32)) // side info
      out.write("Xing".getBytes)
      out.write(Array[Byte](0, 0, 0, 1)) // flags: frames present
      out.write(Array[Byte](0, 0, 0, 100)) // 100 frames
      out.write(new Array[Byte](500))
      out.toByteArray
    }
    assert(Multimodal.mp3Info(vbr).contains((44100, 2612L)))
    // VBRI variant (fixed +32, frames at +14)
    val vbri = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte))
      out.write(new Array[Byte](32))
      out.write("VBRI".getBytes)
      out.write(new Array[Byte](10)) // ver(2) delay(2) quality(2) bytes(4)
      out.write(Array[Byte](0, 0, 0, 50)) // 50 frames
      out.write(new Array[Byte](500))
      out.toByteArray
    }
    assert(Multimodal.mp3Info(vbri).contains((44100, 50L * 1152 * 1000 / 44100)))
    // dispatcher picks the right probe per container
    assert(Multimodal.audioInfo(flac).contains((44100, 10000L)))
    assert(Multimodal.audioInfo(mp3).contains((44100, 100L)))
    assert(Multimodal.audioInfo(halfWav()).contains((8000, 1000L)))
    // OGG/Opus: identification page (OpusHead, input rate 16 kHz) + a final
    // page with granule position 96000 -> 96000/48000 Hz = 2000 ms
    val ogg = {
      val out = new java.io.ByteArrayOutputStream()
      def page(granule: Long, payload: Array[Byte]): Unit = {
        out.write("OggS".getBytes); out.write(0); out.write(0)
        var g = granule
        for (_ <- 0 until 8) { out.write((g & 0xff).toInt); g >>= 8 }
        out.write(new Array[Byte](12)) // serial, seq, checksum
        out.write(1); out.write(payload.length) // one segment
        out.write(payload)
      }
      val opusHead = "OpusHead".getBytes ++ Array[Byte](1, 2, 0, 0) ++
        Array[Byte](0x80.toByte, 0x3E, 0, 0) ++ Array[Byte](0, 0, 0) // 16000 Hz le
      page(0L, opusHead)
      // payload containing a decoy 'OggS' + 0xFF garbage granule: the
      // page-by-page walk must skip it via the lacing table, not match it
      page(48000L, "xxOggS".getBytes ++ Array.fill[Byte](8)(0xFF.toByte))
      page(96000L, Array[Byte](0))
      out.toByteArray
    }
    val o = Multimodal.oggInfo(ogg)
    assert(o.contains((16000, 2000L)), s"ogg probe: $o")
    assert(Multimodal.audioInfo(ogg).contains((16000, 2000L)))
    // nonzero Opus pre-skip (312 samples, the codec default) is subtracted:
    // (96000 - 312) / 48 = 1993 ms
    val oggSkip = {
      val bytes = ogg.clone()
      val p0 = 27 + 1 // first page payload offset (one lacing segment)
      bytes(p0 + 10) = 0x38; bytes(p0 + 11) = 0x01
      bytes
    }
    assert(Multimodal.oggInfo(oggSkip).contains((16000, 1993L)))
    // garbage and truncation never throw
    val rnd = new java.util.Random(5)
    for (_ <- 0 until 50) {
      val b = new Array[Byte](128); rnd.nextBytes(b)
      Multimodal.audioInfo(b)
    }
    Multimodal.audioInfo("fLaC".getBytes)
    Multimodal.audioInfo("ID3".getBytes)
    Multimodal.audioInfo("OggS".getBytes)
    Multimodal.audioInfo(("OggS" + "x" * 60).getBytes)
    Multimodal.audioInfo(Array(0xFF.toByte, 0xE0.toByte))
  }

  test("vorbis id header, CRC-protected Xing frame, and crafted WAV sizes") {
    // Ogg/Vorbis: id packet = type byte 0x01 + "vorbis" + version(4) +
    // channels(1) + rate u32le (22050); final granule 44100 -> 2000 ms at
    // the id-header rate (granule rate == sample rate for Vorbis)
    val ogg = {
      val out = new java.io.ByteArrayOutputStream()
      def page(granule: Long, payload: Array[Byte]): Unit = {
        out.write("OggS".getBytes); out.write(0); out.write(0)
        var g = granule
        for (_ <- 0 until 8) { out.write((g & 0xff).toInt); g >>= 8 }
        out.write(new Array[Byte](12))
        out.write(1); out.write(payload.length)
        out.write(payload)
      }
      val vorbisId = Array[Byte](1) ++ "vorbis".getBytes ++
        new Array[Byte](4) ++ Array[Byte](2) ++          // version, channels
        Array[Byte](0x22, 0x56, 0, 0)                    // 22050 Hz LE
      page(0L, vorbisId)
      page(44100L, Array[Byte](0))
      out.toByteArray
    }
    assert(Multimodal.oggInfo(ogg).contains((22050, 2000L)))

    // CRC-protected frame (0xFFFA: protection bit 0): a 2-byte CRC sits
    // between header and side info, so Xing lives at 4 + 2 + 32
    val vbrCrc = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0xFF, 0xFA, 0x90, 0x00).map(_.toByte))
      out.write(new Array[Byte](2))  // CRC-16
      out.write(new Array[Byte](32)) // side info (MPEG1 stereo)
      out.write("Xing".getBytes)
      out.write(Array[Byte](0, 0, 0, 1))
      out.write(Array[Byte](0, 0, 0, 100)) // 100 frames -> 2612 ms
      out.write(new Array[Byte](500))
      out.toByteArray
    }
    assert(Multimodal.mp3Info(vbrCrc).contains((44100, 2612L)),
      s"CRC offset missed the Xing tag: ${Multimodal.mp3Info(vbrCrc)}")

    // a claimed ~2 GB chunk size must return None (Long cursor), not wrap
    // an Int offset negative and throw out of the probe
    val evilWav = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes); out.write(Array[Byte](0, 0, 0, 0))
      out.write("WAVE".getBytes)
      out.write("JUNK".getBytes)
      out.write(Array(0xF0, 0xFF, 0xFF, 0x7F).map(_.toByte)) // 0x7FFFFFF0 LE
      out.write(new Array[Byte](40))
      out.toByteArray
    }
    assert(Multimodal.wavInfo(evilWav).isEmpty)
    assert(Multimodal.audioInfo(evilWav).isEmpty)
  }

  test("ogg walk resynchronizes after a malformed page instead of truncating") {
    def page(granule: Long, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("OggS".getBytes); out.write(0); out.write(0)
      var g = granule
      for (_ <- 0 until 8) { out.write((g & 0xff).toInt); g >>= 8 }
      out.write(new Array[Byte](12))
      out.write(1); out.write(payload.length)
      out.write(payload)
      out.toByteArray
    }
    val opusHead = "OpusHead".getBytes ++ Array[Byte](1, 2, 0, 0) ++
      Array[Byte](0x80.toByte, 0x3E, 0, 0) ++ Array[Byte](0, 0, 0) // 16 kHz input
    // well-formed prefix, then inter-stream junk (chained/corrupt), then a
    // later valid page: the old strict walk stopped at the junk (1000 ms);
    // resync must recover the 144000-granule page -> 3000 ms
    val chained = page(0L, opusHead) ++ page(48000L, Array[Byte](7)) ++
      "JUNK not a page".getBytes ++ page(144000L, Array[Byte](0))
    assert(Multimodal.oggInfo(chained).contains((16000, 3000L)),
      s"resync: ${Multimodal.oggInfo(chained)}")
    // decoy 'OggS' inside a payload still never engages resync on a
    // well-formed stream (the lacing walk steps over it)
    val clean = page(0L, opusHead) ++
      page(48000L, "xxOggS".getBytes ++ Array.fill[Byte](8)(0xFF.toByte)) ++
      page(96000L, Array[Byte](0))
    assert(Multimodal.oggInfo(clean).contains((16000, 2000L)))
    // resync landing on a payload decoy must REJECT it via the version/flags
    // check: 'OggS' + version 1 + huge positive granule would otherwise
    // report a duration of years; the true later page still recovers
    val falseSync = page(0L, opusHead) ++ "JUNK".getBytes ++
      ("OggS".getBytes ++ Array[Byte](1, 0) ++
        Array.fill[Byte](8)(0x7F.toByte) ++ new Array[Byte](14)) ++
      page(144000L, Array[Byte](0))
    assert(Multimodal.oggInfo(falseSync).contains((16000, 3000L)),
      s"false sync accepted: ${Multimodal.oggInfo(falseSync)}")
  }

  test("image resize re-encodes to the target dimensions for real") {
    import spark.implicits._
    val df = Seq((1L, halfPng())).toDF("media_id", "bytes")
      .withColumn("modality", lit("image"))
      .withColumn("meta", struct(lit(8).as("width"), lit(8).as("height"),
        lit(null).cast("long").as("duration_ms"), lit(null).cast("int").as("sample_rate")))
    val outBytes = Multimodal.resizeImages(df, 3, 5).select("bytes")
      .head().getAs[Array[Byte]](0)
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(outBytes))
    assert(decoded.getWidth == 3 && decoded.getHeight == 5)
  }

  // ---- FLAC real decode: test-side encoder written independently from the
  // RFC 9639 text (bit writer + explicit packing, nothing shared with
  // FlacDecode) so decode(encode(pcm)) == pcm cross-checks both readings ----

  private class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def w(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nb += 1
        if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def sw(v: Int, n: Int): Unit = w(v.toLong & ((1L << n) - 1), n)
    def align(): Unit = while (nb != 0) w(0, 1)
    def bytes: Array[Byte] = { align(); buf.toByteArray }
  }

  /** channels x samples PCM -> FLAC. subframe: "verbatim" | "constant-or-verbatim"
    * | "fixed1"; chMode: "independent" | "midside".
    */
  private def encodeFlac(rate: Int, bps: Int, pcm: Array[Array[Int]], blockSize: Int,
      subframe: String, chMode: String): Array[Byte] = {
    val channels = pcm.length
    val total = pcm(0).length
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes)
    out.write(0x80); out.write(0); out.write(0); out.write(34) // last block, STREAMINFO
    val bw0 = new BitWriter
    bw0.w(blockSize, 16); bw0.w(blockSize, 16) // min/max block size
    bw0.w(0, 24); bw0.w(0, 24)                 // min/max frame size (unknown)
    bw0.w(rate, 20); bw0.w(channels - 1, 3); bw0.w(bps - 1, 5)
    bw0.w(total, 36)
    val si = bw0.bytes
    out.write(si); out.write(new Array[Byte](34 - si.length)) // md5 zeros
    def rice(bw: BitWriter, e: Int, param: Int): Unit = {
      val folded = (e.toLong << 1) ^ (e.toLong >> 63)
      val q = (folded >>> param).toInt
      var i = 0
      while (i < q) { bw.w(0, 1); i += 1 }
      bw.w(1, 1)
      if (param > 0) bw.w(folded & ((1L << param) - 1), param)
    }
    // residual for `res`, partition order `po`; param 15 = escape with raw bits
    def residual(bw: BitWriter, res: Seq[Int], order: Int, blockLen: Int, po: Int,
        param: Int, rawBits: Int = 17): Unit = {
      bw.w(0, 2) // method 0: 4-bit rice params
      bw.w(po, 4)
      val parts = 1 << po
      var idx = 0
      for (p <- 0 until parts) {
        val count = (blockLen >> po) - (if (p == 0) order else 0)
        bw.w(param, 4)
        if (param == 15) { // escape: raw n-bit residuals
          bw.w(rawBits, 5)
          for (_ <- 0 until count) { bw.sw(res(idx), rawBits); idx += 1 }
        } else for (_ <- 0 until count) { rice(bw, res(idx), param); idx += 1 }
      }
    }
    def writeSubframe(bw: BitWriter, s: Array[Int], sbps: Int): Unit = subframe match {
      case "verbatim" =>
        bw.w(0, 1); bw.w(1, 6); bw.w(0, 1)
        s.foreach(v => bw.sw(v, sbps))
      case "verbatim-wasted2" => // samples all multiples of 4: 2 wasted bits
        bw.w(0, 1); bw.w(1, 6)
        bw.w(1, 1) // wasted flag
        bw.w(0, 1); bw.w(1, 1) // unary 1 -> wasted = 2
        s.foreach(v => bw.sw(v >> 2, sbps - 2))
      case "constant-or-verbatim" =>
        if (s.forall(_ == s(0))) { bw.w(0, 1); bw.w(0, 6); bw.w(0, 1); bw.sw(s(0), sbps) }
        else { bw.w(0, 1); bw.w(1, 6); bw.w(0, 1); s.foreach(v => bw.sw(v, sbps)) }
      case "fixed1" | "fixed1-p2" | "fixed1-escape" =>
        bw.w(0, 1); bw.w(9, 6); bw.w(0, 1) // FIXED order 1
        bw.sw(s(0), sbps) // warmup
        val res = (1 until s.length).map(i => s(i) - s(i - 1))
        subframe match {
          case "fixed1-p2" => residual(bw, res, 1, s.length, po = 2, param = 4)
          case "fixed1-escape" => residual(bw, res, 1, s.length, po = 0, param = 15)
          case _ => residual(bw, res, 1, s.length, po = 0, param = 4)
        }
      case "fixed4" =>
        bw.w(0, 1); bw.w(12, 6); bw.w(0, 1) // FIXED order 4
        (0 until 4).foreach(i => bw.sw(s(i), sbps))
        val res = (4 until s.length).map(i =>
          s(i) - (4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)))
        residual(bw, res, 4, s.length, po = 0, param = 15) // escape: deltas can be wide
      case "lpc2" =>
        bw.w(0, 1); bw.w(32 + 1, 6); bw.w(0, 1) // LPC order 2 (type 100001)
        bw.sw(s(0), sbps); bw.sw(s(1), sbps) // warmup
        val (c0, c1, shift) = (3, -1, 1) // s[j] ~ (3*s[j-1] - s[j-2]) >> 1
        bw.w(12 - 1, 4) // precision 12
        bw.sw(shift, 5)
        bw.sw(c0, 12); bw.sw(c1, 12)
        val res = (2 until s.length).map { j =>
          val pred = ((c0.toLong * s(j - 1) + c1.toLong * s(j - 2)) >> shift).toInt
          s(j) - pred
        }
        residual(bw, res, 2, s.length, po = 0, param = 15)
    }
    var start = 0
    var frameNo = 0
    while (start < total) {
      val n = math.min(blockSize, total - start)
      val bw = new BitWriter
      bw.w(0x3ffe, 14); bw.w(0, 1); bw.w(0, 1)
      bw.w(7, 4) // block size: 16-bit value - 1 follows
      bw.w(0, 4) // sample rate: from STREAMINFO
      bw.w(if (chMode == "midside") 10 else channels - 1, 4)
      bw.w(bps match { case 8 => 1; case 16 => 4; case 24 => 6; case _ => 0 }, 3)
      bw.w(0, 1)
      require(frameNo < 128) // single-byte UTF-8 frame number
      bw.w(frameNo, 8)
      bw.w(n - 1, 16)
      bw.w(0, 8) // header CRC-8 (decoder is tolerant by design)
      if (chMode == "midside") {
        val l = pcm(0).slice(start, start + n)
        val r = pcm(1).slice(start, start + n)
        val mid = Array.tabulate(n)(i => (l(i) + r(i)) >> 1)
        val side = Array.tabulate(n)(i => l(i) - r(i))
        writeSubframe(bw, mid, bps)
        writeSubframe(bw, side, bps + 1)
      } else {
        pcm.foreach(ch => writeSubframe(bw, ch.slice(start, start + n), bps))
      }
      bw.align()
      bw.w(0, 16) // frame CRC-16 (not verified)
      out.write(bw.bytes)
      start += n
      frameNo += 1
    }
    out.toByteArray
  }

  test("flac decode: verbatim mono round-trips the exact PCM") {
    val pcm = Array(Array.tabulate(1000)(i => (math.sin(i / 10.0) * 12000).toInt))
    val bytes = encodeFlac(8000, 16, pcm, blockSize = 256, "verbatim", "independent")
    val d = FlacDecode.decode(bytes).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.bits == 16)
    assert(d.samples.toSeq == pcm(0).toSeq)
  }

  test("flac decode: fixed-order-1 rice residuals and constant subframes round-trip") {
    // a ramp (constant order-1 residual, rice-friendly) + a constant block
    val ramp = Array.tabulate(600)(i => i % 3000)
    val flat = Array.fill(200)(-42)
    val pcm = Array(ramp ++ flat)
    val fx = encodeFlac(16000, 16, Array(ramp), blockSize = 200, "fixed1", "independent")
    val dfx = FlacDecode.decode(fx).get
    assert(dfx.samples.toSeq == ramp.toSeq, "fixed-1 rice residuals must reconstruct")
    val cv = encodeFlac(16000, 16, pcm, blockSize = 200, "constant-or-verbatim", "independent")
    val dcv = FlacDecode.decode(cv).get
    assert(dcv.samples.toSeq == (ramp ++ flat).toSeq)
  }

  test("flac decode: lpc, fixed-4, escape partitions, multi-partition rice, wasted bits") {
    val signal = Array.tabulate(512)(i => (math.sin(i / 9.0) * 11000 + i % 37).toInt)
    // LPC order 2 (quantized coefficients + shift, escape residuals)
    val lpc = FlacDecode.decode(
      encodeFlac(8000, 16, Array(signal), 256, "lpc2", "independent")).get
    assert(lpc.samples.toSeq == signal.toSeq, "LPC reconstruction must be bit-exact")
    // FIXED order 4 with escape (raw 17-bit) residuals
    val f4 = FlacDecode.decode(
      encodeFlac(8000, 16, Array(signal), 256, "fixed4", "independent")).get
    assert(f4.samples.toSeq == signal.toSeq, "fixed-4 + escape residuals")
    // partition order 2: four rice partitions per subframe
    val p2 = FlacDecode.decode(
      encodeFlac(8000, 16, Array(signal), 256, "fixed1-p2", "independent")).get
    assert(p2.samples.toSeq == signal.toSeq, "4-partition rice residuals")
    // escape partition on fixed-1
    val esc = FlacDecode.decode(
      encodeFlac(8000, 16, Array(signal), 256, "fixed1-escape", "independent")).get
    assert(esc.samples.toSeq == signal.toSeq, "escape partition residuals")
    // wasted bits: all samples multiples of 4, subframe stores bps-2
    val coarse = signal.map(v => (v >> 2) << 2)
    val w2 = FlacDecode.decode(
      encodeFlac(8000, 16, Array(coarse), 256, "verbatim-wasted2", "independent")).get
    assert(w2.samples.toSeq == coarse.toSeq, "wasted-bits shift must restore samples")
  }

  test("flac decode: mid/side stereo undecorrelates to the exact channels") {
    val l = Array.tabulate(500)(i => (math.sin(i / 7.0) * 9000).toInt)
    val r = Array.tabulate(500)(i => (math.cos(i / 11.0) * 7000).toInt)
    val bytes = encodeFlac(44100, 16, Array(l, r), blockSize = 250, "verbatim", "midside")
    val d = FlacDecode.decode(bytes).get
    assert(d.channels == 2)
    val left = d.samples.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v }
    val right = d.samples.zipWithIndex.collect { case (v, i) if i % 2 == 1 => v }
    assert(left.toSeq == l.toSeq && right.toSeq == r.toSeq)
  }

  test("flac rows take the real feature branch and match the WAV of the same PCM") {
    import spark.implicits._
    // same PCM as halfWav(): silent first half, loud square second half
    val rate = 8000
    val pcm = Array(Array.tabulate(rate)(i =>
      if (i < rate / 2) 0 else if (i % 2 == 0) 20000 else -20000))
    val flacBytes = encodeFlac(rate, 16, pcm, blockSize = 400, "verbatim", "independent")
    val df = Seq((1L, flacBytes)).toDF("media_id", "bytes")
      .withColumn("modality", lit("audio"))
      .withColumn("meta", struct(lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"), lit(null).cast("int").as("sample_rate")))
    // metadata path (header probe) and feature path (full decode) agree
    val m = Multimodal.withAudioMeta(df).select("meta.sample_rate", "meta.duration_ms").head()
    assert(m.getInt(0) == rate && m.getLong(1) == 1000L)
    val feats = Multimodal.extractFeatures(df).select("features").head().getSeq[Float](0)
    val wavFeats = Multimodal.extractFeatures(
      Seq((1L, halfWav())).toDF("media_id", "bytes")
        .withColumn("modality", lit("audio"))
        .withColumn("meta", struct(lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms"), lit(null).cast("int").as("sample_rate"))))
      .select("features").head().getSeq[Float](0)
    assert(feats == wavFeats, "identical PCM must yield identical features across containers")
  }

  test("flac decode: 32-bps safety — independent round-trips, mid/side rejects, ch-mismatch rejects") {
    // independent 32-bps: full Int range samples survive (s(32) path)
    val wide = Array(Array(Int.MaxValue - 3, Int.MinValue + 5, 0, -1, 123456789,
      -987654321, 1 << 30, -(1 << 30)) ++ Array.tabulate(120)(i => i * 1000003))
    val ind = FlacDecode.decode(
      encodeFlac(8000, 32, wide, 128, "verbatim", "independent")).get
    assert(ind.bits == 32 && ind.samples.toSeq == wide(0).toSeq)
    // mid/side at bps 32 must reject (side needs 33 bits), never wrong PCM
    val l = Array.fill(64)(1500000000)
    val r = Array.fill(64)(1500000000)
    assert(FlacDecode.decode(
      encodeFlac(8000, 32, Array(l, r), 64, "verbatim", "midside")).isEmpty)
    // mid/side at bps 24 with large values exercises the Long reconstruction
    val l24 = Array.tabulate(64)(i => 8388607 - i) // near +2^23
    val r24 = Array.tabulate(64)(i => -8388608 + i)
    val ms24 = FlacDecode.decode(
      encodeFlac(8000, 24, Array(l24, r24), 64, "verbatim", "midside")).get
    val left = ms24.samples.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v }
    val right = ms24.samples.zipWithIndex.collect { case (v, i) if i % 2 == 1 => v }
    assert(left.toSeq == l24.toSeq && right.toSeq == r24.toSeq)
    // a frame whose channel mode contradicts STREAMINFO must reject: flip
    // the STREAMINFO channel count (byte 20, bits 3-1) from 2 to 1
    val stereo = encodeFlac(8000, 16, Array(l24, r24), 64, "verbatim", "midside")
    val mono = stereo.clone()
    mono(20) = (mono(20) & ~0x0E | ((1 - 1) << 1)).toByte
    assert(FlacDecode.decode(mono).isEmpty,
      "stereo-decorrelated frame against mono STREAMINFO must not decode")
  }

  test("flac decode: garbage and truncation never throw") {
    assert(FlacDecode.decode("not flac at all".getBytes).isEmpty)
    val pcm = Array(Array.tabulate(800)(i => i - 400))
    val good = encodeFlac(8000, 16, pcm, blockSize = 200, "verbatim", "independent")
    // truncating mid-stream keeps the decodable prefix instead of throwing
    val cut = FlacDecode.decode(good.take(good.length / 2))
    assert(cut.forall(_.samples.length <= 800))
    // corrupting a frame sync ends decode cleanly at that frame
    val mangled = good.clone()
    val frameStart = 4 + 4 + 34
    mangled(frameStart) = 0x00
    assert(FlacDecode.decode(mangled).isEmpty) // first frame dead -> no samples
  }

  // deterministic 64x64 noise image keyed by k; optional single-pixel edit
  // at (14, 16) — a coordinate BOTH hash grids sample
  private def noisePng(k: Long, perturb: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      var z = k * 0x9E3779B97F4A7C15L + x * 0xBF58476D1CE4E5B9L + y * 0x94D049BB133111EBL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      val v = ((z >>> 40) & 0xFF).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    if (perturb) img.setRGB(14, 16, 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("dHash: single-pixel edits stay within 2 bits; distinct noise fields scatter far") {
    def d(b: Array[Byte]) = Multimodal.dHash64(b).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (k <- 0L until 10L) {
      assert(ham(d(noisePng(k, false)), d(noisePng(k, true))) <= 2,
        s"perturbed copy of $k drifted")
    }
    val hashes = (0L until 20L).map(k => d(noisePng(k, false)))
    for (i <- hashes.indices; j <- hashes.indices if i < j)
      assert(ham(hashes(i), hashes(j)) > 10, s"patterns $i/$j collide")
  }

  test("pHash survives a uniform brightness shift that flips many dHash-irrelevant bits") {
    def brightened(k: Long): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(noisePng(k, false)))
      for (y <- 0 until 64; x <- 0 until 64) {
        val v0 = img.getRGB(x, y) & 0xFF
        val v = math.min(255, v0 + 30)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (k <- 0L until 5L) {
      val p0 = Multimodal.pHash64(noisePng(k, false)).get
      val p1 = Multimodal.pHash64(brightened(k)).get
      // DC is excluded from the median, so the shift barely moves the hash
      // (saturation at 255 perturbs a few AC terms)
      assert(ham(p0, p1) <= 8, s"pHash of $k not brightness-stable: ${ham(p0, p1)}")
    }
  }

  // deterministic amplitude-modulated tone keyed by k; `gain` scales every
  // sample uniformly, `glitch` zeroes one window's worth of samples
  private def toneWav(k: Long, gain: Double = 1.0, glitch: Boolean = false): Array[Byte] = {
    val rate = 8000
    val n = rate
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      // the energy ENVELOPE varies with window index and k: each of the 65
      // fingerprint windows gets a pseudo-random amplitude
      val w = i * 65 / n
      var z = k * 0x9E3779B97F4A7C15L + w * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      val amp = 0.1 + 0.8 * ((z >>> 40) & 0xFF) / 255.0
      val base = amp * gain * math.sin(2 * math.Pi * 440 * i / rate)
      val v0 = if (glitch && w == 30) 0.0 else base
      val v = math.max(-1.0, math.min(1.0, v0))
      val s = (v * 20000).toShort
      data(i * 2) = (s & 0xFF).toByte
      data(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(data.length).put(data)
    bb.array()
  }

  test("audio fingerprint: gain-invariant, glitch-local, distinct envelopes scatter") {
    def fp(b: Array[Byte]) = Multimodal.audioFingerprint64(b).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (k <- 0L until 8L) {
      // uniform gain scales every window energy equally: contour unchanged
      assert(fp(toneWav(k)) == fp(toneWav(k, gain = 0.5)), s"gain broke contour of $k")
      // a one-window dropout flips only the comparisons touching it
      assert(ham(fp(toneWav(k)), fp(toneWav(k, glitch = true))) <= 3,
        s"glitch of $k drifted too far")
    }
    val fps = (0L until 12L).map(k => fp(toneWav(k)))
    for (i <- fps.indices; j <- fps.indices if i < j)
      assert(ham(fps(i), fps(j)) > 8, s"envelopes $i/$j collide: ${ham(fps(i), fps(j))}")
    assert(Multimodal.audioFingerprint64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("audioNearDuplicates pairs glitched copies, not distinct tracks") {
    import spark.implicits._
    val rows = (0L until 8L).map(k => (k, toneWav(k))) ++
      Seq(2L, 5L).map(k => (k + 100L, toneWav(k, gain = 0.7, glitch = true)))
    val pairs = Multimodal.audioNearDuplicates(rows.toDF("id", "bytes"), "id", "bytes",
        maxDistance = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(pairs == Seq((2L, 102L), (5L, 105L)))
  }

  test("mediaIngestNearDuplicates: batch vs persisted hash index, no corpus re-decode") {
    import spark.implicits._
    val corpus = (0L until 12L).map(k => (k, noisePng(k, false))).toDF("id", "bytes")
    val index = Multimodal.imageHashes(corpus, "id", "bytes").select("id", "dhash")
    val dir = java.nio.file.Files.createTempDirectory("graft-mediaidx").toString
    index.write.mode("overwrite").parquet(dir)
    val rehydrated = spark.read.parquet(dir)
    // batch: a near-dup of corpus image 4, a fresh image, and junk bytes
    val batch = Seq(
      (200L, noisePng(4L, true)),
      (201L, noisePng(99L, false)),
      (202L, Array[Byte](9, 9, 9))).toDF("id", "bytes")
    val batchHashes = Multimodal.imageHashes(batch, "id", "bytes").select("id", "dhash")
    val hits = Multimodal.mediaIngestNearDuplicates(rehydrated, batchHashes, maxDistance = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(hits.map(t => (t._1, t._2)) == Seq((200L, 4L)))
    assert(hits.head._3 <= 2)
  }

  test("mediaIngestStream equals its batch twin (stateless stream-static join)") {
    import spark.implicits._
    val corpus = (0L until 10L).map(k => (k, noisePng(k, false))).toDF("id", "bytes")
    val index = Multimodal.imageHashes(corpus, "id", "bytes").select("id", "dhash")
      .localCheckpoint(true)
    val batch = Seq((300L, noisePng(3L, true)), (301L, noisePng(77L, false)))
      .toDF("id", "bytes")
    val expected = Multimodal.mediaIngestNearDuplicates(index,
        Multimodal.imageHashes(batch, "id", "bytes").select("id", "dhash"), 6)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-mediastream").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val got = graft.streaming.Streaming.runToMemory(
        graft.streaming.Streaming.mediaIngestStream(index, stream, "id", "bytes", 6),
        "media_ingest_stream")
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("imageNearDuplicates finds exactly the planted pairs; banding is complete at the cut") {
    import spark.implicits._
    val rows = (0L until 15L).map(k => (k, noisePng(k, false))) ++
      Seq(3L, 7L, 11L).map(k => (k + 100L, noisePng(k, true)))
    val media = rows.toDF("id", "bytes").repartition(5)
    val pairs = Multimodal.imageNearDuplicates(media, "id", "bytes", maxDistance = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(pairs.map(t => (t._1, t._2)).toSeq == Seq((3L, 103L), (7L, 107L), (11L, 111L)))
    assert(pairs.forall(_._3 <= 2))
    // undecodable rows drop rather than poison the join
    val withJunk = rows ++ Seq((999L, Array[Byte](1, 2, 3)))
    assert(Multimodal.imageNearDuplicates(withJunk.toDF("id", "bytes"), "id", "bytes",
      maxDistance = 6).count() == 3)
  }
}
