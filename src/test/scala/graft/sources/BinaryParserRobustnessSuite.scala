package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.sources.unstructured.{Mp4Meta, PdfText, VideoContainers}

/** The three dependency-free binary parsers consume UNTRUSTED file content
  * at scale; a crafted or truncated file must never throw out of the
  * operator (that would fail the whole Spark task). Deterministic fuzz:
  * truncations of valid files, random bytes, adversarial length fields.
  */
class BinaryParserRobustnessSuite extends AnyFunSuite {

  private def rndBytes(seed: Long, n: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  test("pdf extractor never throws on garbage, truncation, or hostile sizes") {
    for (seed <- 0L until 50L) PdfText.extract(rndBytes(seed, 256))
    // keyword present but structure broken
    PdfText.extract("stream".getBytes)
    PdfText.extract("endstream".getBytes)
    PdfText.extract("<< /Filter /FlateDecode >> stream\nnot-deflate\nendstream".getBytes)
    PdfText.extract("(unclosed paren \\".getBytes)
    PdfText.extract(Array.empty[Byte])
    // deflate bomb guard: highly compressible stream stays bounded
    val big = {
      val d = new java.util.zip.Deflater()
      d.setInput(new Array[Byte](64 * 1024 * 1024)); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    val doc = ("<< /Filter /FlateDecode >>\nstream\n".getBytes.toSeq ++ big.toSeq ++
      "\nendstream".getBytes.toSeq).toArray
    val t0 = System.nanoTime()
    PdfText.extract(doc) // must respect the MaxInflated cap, not allocate 64 MB+ per row unbounded
    assert((System.nanoTime() - t0) / 1e9 < 10.0)
    // ObjStm walker: garbage payloads, non-deflate bodies, and a deflate
    // bomb behind the /ObjStm recursion must all stay bounded and non-throwing
    PdfText.extract("<< /Type /ObjStm /Filter /FlateDecode >> stream\nnot-deflate\nendstream".getBytes)
    for (seed <- 50L until 60L)
      PdfText.extract(("<< /Type /ObjStm >> stream\n".getBytes.toSeq ++
        rndBytes(seed, 512).toSeq ++ "\nendstream".getBytes.toSeq).toArray)
    val objStmBomb = ("<< /Type /ObjStm /Filter /FlateDecode >>\nstream\n".getBytes.toSeq ++
      big.toSeq ++ "\nendstream".getBytes.toSeq).toArray
    val t1 = System.nanoTime()
    PdfText.extract(objStmBomb)
    assert((System.nanoTime() - t1) / 1e9 < 10.0)
  }

  test("stream-filter decoders never throw on garbage and respect output caps") {
    for (seed <- 0L until 50L) {
      val junk = rndBytes(seed, 512)
      PdfText.lzwDecode(junk)      // corrupt codes -> None, never a throw
      PdfText.ascii85Decode(junk)
      PdfText.asciiHexDecode(junk)
    }
    // truncated mid-code / mid-group inputs
    PdfText.lzwDecode(Array(0x80.toByte))
    PdfText.ascii85Decode("abc".getBytes)
    PdfText.asciiHexDecode("f".getBytes)
    PdfText.lzwDecode(Array.empty[Byte])
    PdfText.ascii85Decode(Array.empty[Byte])
    // LZW bomb guard: a clear-free repetitive stream must stay under MaxInflated
    val bomb = {
      // encode 32 MB of zeros with the test encoder shape: emit growing runs
      val sb = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L; var bitCnt = 0; var width = 9
      def emit(code: Int): Unit = {
        bitBuf = (bitBuf << width) | code; bitCnt += width
        while (bitCnt >= 8) { sb.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
      }
      emit(256)
      emit(0)
      var next = 258
      // repeatedly reference the just-created run code: output grows quadratically
      var c = 258
      while (next < 4095) { emit(c - 1 max 0); if (c > 258) emit(c - 1); next += 1; c += 1
        if (width < 12 && next >= (1 << width)) width += 1 }
      if (bitCnt > 0) sb.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
      sb.toByteArray
    }
    val t0 = System.nanoTime()
    PdfText.lzwDecode(bomb) // may return None (corrupt) but must stay bounded
    assert((System.nanoTime() - t0) / 1e9 < 10.0)
  }

  test("avi/mkv probes never throw on garbage, truncation, or hostile sizes") {
    for (seed <- 0L until 50L) VideoContainers.parse(rndBytes(seed, 256))
    VideoContainers.parse(Array.empty[Byte])
    VideoContainers.parse(null)
    // valid magics with broken bodies
    VideoContainers.parse("RIFF\u0000\u0000\u0000\u0000AVI ".getBytes)
    VideoContainers.parse(("RIFF" + "ÿÿÿ" + "AVI LIST").getBytes)
    VideoContainers.parse(Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte)) // bare EBML magic
    VideoContainerFuzz.deepNesting()
  }

  private object VideoContainerFuzz {
    // a pathological EBML file: thousands of nested unknown-size containers
    // must hit the depth guard, not a stack overflow
    def deepNesting(): Unit = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x1A, 0x45, 0xDF, 0xA3, 0x80).map(_.toByte))
      for (_ <- 0 until 5000) out.write(Array(0x18, 0x53, 0x80, 0x67, 0xFF).map(_.toByte))
      VideoContainers.parse(out.toByteArray)
    }
  }

  test("mp4 parser never throws on garbage, truncation, or hostile box sizes") {
    for (seed <- 0L until 50L) Mp4Meta.parse(rndBytes(seed, 256))
    Mp4Meta.parse(Array.empty[Byte])
    Mp4Meta.parse("ftyp".getBytes)
    // size-0 box (extends to EOF), size-1 with truncated largesize, negative size
    val hdr = Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes ++ Array[Byte](0, 0, 0, 0)
    Mp4Meta.parse(hdr ++ Array[Byte](0, 0, 0, 0) ++ "moov".getBytes)
    Mp4Meta.parse(hdr ++ Array[Byte](0, 0, 0, 1) ++ "moov".getBytes)
    Mp4Meta.parse(hdr ++ Array[Byte](-1, -1, -1, -1) ++ "mvhd".getBytes)
    // mvhd claiming space beyond EOF
    Mp4Meta.parse(hdr ++ Array[Byte](0, 0, 1, 0) ++ "mvhd".getBytes ++ Array[Byte](1))
  }

  test("wav parser never throws on garbage, truncation, or hostile chunk sizes") {
    for (seed <- 0L until 50L) Multimodal.wavInfo(rndBytes(seed, 128))
    assert(Multimodal.wavInfo(Array.empty[Byte]).isEmpty)
    assert(Multimodal.wavInfo("RIFF".getBytes).isEmpty)
    val riff = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes
    assert(Multimodal.wavInfo((riff ++ "fmt ".getBytes ++ Array[Byte](-1, -1, -1, -1)) ++ new Array[Byte](30)).isEmpty)
    // negative chunk size whose advance would be zero (size = -9): must
    // terminate, not loop forever
    assert(Multimodal.wavInfo(
      (riff ++ "junk".getBytes ++ Array[Byte](-9, -1, -1, -1)) ++ new Array[Byte](30)).isEmpty)
    // fmt claims PCM but data chunk missing
    val fmtOnly = riff ++ "fmt ".getBytes ++ Array[Byte](16, 0, 0, 0) ++
      Array[Byte](1, 0, 1, 0, 0x40, 0x1F, 0, 0, -128, 62, 0, 0, 2, 0, 16, 0) ++ new Array[Byte](8)
    Multimodal.wavInfo(fmtOnly)
    Multimodal.wavFeatures(fmtOnly)
  }

  test("flac decoder never throws on garbage, truncation, or hostile fields") {
    import graft.multimodal.FlacDecode
    for (seed <- 0L until 100L) FlacDecode.decode(rndBytes(seed, 512))
    FlacDecode.decode(Array.empty[Byte])
    FlacDecode.decode("fLaC".getBytes)
    // valid magic + STREAMINFO header, garbage frames
    def withFrames(frames: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes)
      out.write(0x80); out.write(0); out.write(0); out.write(34)
      val si = new Array[Byte](34)
      si(10) = 0x0A; si(11) = 0xC4.toByte; si(12) = 0x40.toByte // 44100 Hz
      si(13) = 0xF0.toByte // mono, 16-bit: ch-1=0 (bits 3-1 of 12 are 0), bps-1=15
      out.write(si)
      out.write(frames)
      out.toByteArray
    }
    for (seed <- 100L until 200L) FlacDecode.decode(withFrames(rndBytes(seed, 256)))
    // hostile metadata block length: points past the end
    val badMeta = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes)
      out.write(0); out.write(0x7F); out.write(0xFF); out.write(0xFF) // 8 MB block, absent
      out.toByteArray
    }
    assert(FlacDecode.decode(badMeta).isEmpty)
    // sync-looking frame with runaway unary residual must terminate quickly
    val unaryBomb = withFrames(
      Array[Byte](0xFF.toByte, 0xF8.toByte, 0x69, 0x08, 0x00) ++ new Array[Byte](1 << 16))
    val t0 = System.nanoTime()
    FlacDecode.decode(unaryBomb)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "hostile frame must not spin")
    // truncations of a valid multi-frame file at every byte boundary of the
    // first 200 bytes plus a sweep of later cuts: never a throw
    val pcm = Array(Array.tabulate(600)(i => (math.sin(i / 5.0) * 5000).toInt))
    val bw = new java.io.ByteArrayOutputStream()
    // reuse the decoder's own accepted layout via a tiny verbatim writer:
    // magic + STREAMINFO + one frame is enough surface for cut fuzzing
    bw.write(withFrames(Array.empty))
    val valid = bw.toByteArray
    for (cut <- 0 until valid.length) FlacDecode.decode(valid.take(cut))
  }

  test("jbig2 decoder never throws on garbage, truncation, or hostile headers") {
    import graft.sources.unstructured.Jbig2Decode
    for (seed <- 0L until 100L) {
      val junk = rndBytes(seed, 512)
      Jbig2Decode.decodePage(junk) // None or a decode, never a throw
      Jbig2Decode.dims(junk)
    }
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def seg(num: Long, t: Int, data: Array[Byte]): Array[Byte] =
      be32(num) ++ Array(t.toByte, 0.toByte, 1.toByte) ++
        be32(data.length.toLong) ++ data
    // hostile region headers: giant dims, zero dims, negative-ish values
    for (w <- Seq(0L, 0xffffffffL, 1L << 20); h <- Seq(0L, 0x7fffffffL)) {
      val region = be32(w) ++ be32(h) ++ be32(0) ++ be32(0) ++
        Array(0.toByte, 0.toByte) ++ rndBytes(w + h, 64)
      val t0 = System.nanoTime()
      Jbig2Decode.decodePage(seg(0, 48, be32(w) ++ be32(h) ++ be32(0) ++ be32(0) ++
        Array(0.toByte, 0.toByte, 0.toByte)) ++ seg(1, 38, region))
      assert((System.nanoTime() - t0) / 1e9 < 5.0, s"hostile ${w}x$h must not spin")
    }
    // symbol dictionary with hostile counts + random MQ payload, and a
    // text region whose payload is entropy noise: bounded, no throw
    for (seed <- 100L until 130L) {
      val dict = Array(0.toByte, 0.toByte) ++ // flags: arithmetic template 0
        Array.fill[Byte](8)(3) ++ // AT
        be32(1L << 30) ++ be32(1L << 30) ++ rndBytes(seed, 128)
      assert(Jbig2Decode.decodeSymbolDict(dict, 0, dict.length, Nil).isEmpty)
      val tr = Array(0.toByte, 0x10.toByte) ++ be32(4) ++ rndBytes(seed, 128)
      Jbig2Decode.decodeTextRegion(tr, 0, tr.length, 32, 32,
        Seq(Jbig2Decode.Bitmap(2, 2, Array[Byte](1, 0, 0, 1)))) // any result, no throw
    }
    // truncations of a VALID stream at every byte boundary
    val bits = Array.tabulate[Byte](24 * 10)(i => (i % 3 min 1).toByte)
    val gray = bits.map(b => if (b != 0) 0x00.toByte else 0xff.toByte)
    val coded = graft.sources.unstructured.CcittDecode.encodeG4(gray, 24, 10)
    val region = be32(24) ++ be32(10) ++ be32(0) ++ be32(0) ++
      Array(0.toByte, 1.toByte) ++ coded
    val stream = seg(0, 48, be32(24) ++ be32(10) ++ be32(0) ++ be32(0) ++
      Array(0.toByte, 0.toByte, 0.toByte)) ++ seg(1, 38, region)
    assert(Jbig2Decode.decodePage(stream).isDefined)
    for (cut <- 0 until stream.length) {
      Jbig2Decode.decodePage(stream.take(cut))
      Jbig2Decode.dims(stream.take(cut))
    }
  }

  test("jpx decoder never throws on garbage, truncation, or mutation") {
    import graft.sources.unstructured.{JpxDecode, JpxEncode}
    for (seed <- 0L until 100L) JpxDecode.decode(rndBytes(seed, 512))
    // SOC+SIZ prefix followed by entropy noise: header parses, body is junk
    val rnd = new scala.util.Random(7)
    val px = Array(Array.tabulate(40 * 24)(_ => rnd.nextInt(256)))
    val valid = JpxEncode.encode(px, 40, 24, 8, 2)
    assert(JpxDecode.decode(valid).isDefined)
    // truncations of a VALID codestream at every byte boundary
    for (cut <- 0 until valid.length) JpxDecode.decode(valid.take(cut))
    // single-byte mutations across the header and first packets: decode or
    // None, never a throw, and bounded time (no quadratic rescan)
    for (pos <- 0 until math.min(valid.length, 200); b <- Seq(0x00, 0xff, 0x7f)) {
      val mut = valid.clone(); mut(pos) = b.toByte
      val t0 = System.nanoTime()
      JpxDecode.decode(mut)
      assert((System.nanoTime() - t0) / 1e9 < 5.0, s"mutation at $pos must not spin")
    }
  }
}
