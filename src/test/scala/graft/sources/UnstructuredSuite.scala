package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import graft.SparkTestBase

/** Unstructured text/image family over generated fixtures (covers the shape
  * of the reference's RegisterPdfDataSourceTestSuite /
  * RegisterImageDataSourceTestSuite / text suites).
  */
class UnstructuredSuite extends SparkTestBase {

  private var dir: String = _
  private var imgDir: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    dir = Files.createTempDirectory("graft-unstructured").toString
    Files.writeString(Paths.get(dir, "a.txt"), "hello graft one")
    Files.writeString(Paths.get(dir, "b.txt"), "second file with more words inside")
    Files.writeString(Paths.get(dir, "b.txt.tag"), """{"author": "ada", "stars": 5}""")
    Files.createDirectory(Paths.get(dir, "sub"))
    Files.writeString(Paths.get(dir, "sub", "c.txt"), "nested")
    // tiny 2x3 png via imageio
    imgDir = Files.createTempDirectory("graft-images").toString
    val img = new java.awt.image.BufferedImage(2, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000)
    javax.imageio.ImageIO.write(img, "png", new java.io.File(s"$imgDir/pic.png"))

    spark.sql(
      s"""REGISTER TEXT DATASOURCE notes OPTIONS (path '$dir') NAMESPACE graft.datasource.un
         |TAG (author string, stars int)""".stripMargin)
    spark.sql(
      s"REGISTER OR REPLACE IMAGE DATASOURCE pics OPTIONS (path '$imgDir') NAMESPACE graft.datasource.un")
  }

  test("text metadata table: schema, preview, tag sidecars") {
    val df = spark.sql(
      "SELECT path, filetype, sizeinbytes, preview, author, stars FROM graft.datasource.un.notes.notes ORDER BY path")
    val rows = df.collect()
    assert(rows.length == 2) // file_scan: top-level only, sidecar excluded
    val a = rows.find(_.getString(0).endsWith("a.txt")).get
    assert(a.getString(1) == "text")
    assert(a.getString(3) == "hello graft one")
    assert(a.isNullAt(4) && a.isNullAt(5)) // no sidecar -> null tags
    val b = rows.find(_.getString(0).endsWith("b.txt")).get
    assert(b.getString(4) == "ada" && b.getInt(5) == 5)
  }

  test("recursive_scan adds subdir column and finds nested files") {
    spark.sql(
      s"""REGISTER OR REPLACE TEXT DATASOURCE rnotes OPTIONS (path '$dir', scanType 'recursive_scan')
         |NAMESPACE graft.datasource.un""".stripMargin)
    val rows = spark.sql(
      "SELECT path, subdir FROM graft.datasource.un.rnotes.rnotes WHERE path LIKE '%.txt' ORDER BY path")
      .collect()
    assert(rows.length == 3)
    assert(rows.exists(r => r.getString(0).endsWith("c.txt") && r.getString(1) == "sub"))
  }

  test("content sub-table exposes full text") {
    val rows = spark.sql(
      "SELECT path, textcontent FROM graft.datasource.un.notes.content WHERE path LIKE '%b.txt' ")
      .collect()
    assert(rows.head.getString(1) == "second file with more words inside")
  }

  private def minimalPdf(contentStream: String, flate: Boolean): Array[Byte] = {
    val payload =
      if (flate) {
        val raw = contentStream.getBytes(StandardCharsets.ISO_8859_1)
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      } else contentStream.getBytes(StandardCharsets.ISO_8859_1)
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val head = s"%PDF-1.4\n4 0 obj << /Length ${payload.length}$filter >>\nstream\n"
      .getBytes(StandardCharsets.ISO_8859_1)
    val tail = "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
      .getBytes(StandardCharsets.ISO_8859_1)
    head ++ payload ++ tail
  }

  test("pdf text extraction: uncompressed and FlateDecode content streams") {
    val pdfDir = Files.createTempDirectory("graft-pdf").toString
    val cs = "BT /F1 12 Tf 72 720 Td (Hello graft) Tj 0 -14 Td (second \\(escaped\\) line) Tj ET"
    Files.write(Paths.get(pdfDir, "plain.pdf"), minimalPdf(cs, flate = false))
    Files.write(Paths.get(pdfDir, "flate.pdf"), minimalPdf(cs, flate = true))
    spark.sql(
      s"REGISTER OR REPLACE PDF DATASOURCE pdfs OPTIONS (path '$pdfDir') NAMESPACE graft.datasource.un")
    val rows = spark.sql(
      "SELECT path, textcontent FROM graft.datasource.un.pdfs.content ORDER BY path")
      .collect().map(r => r.getString(0).split('/').last -> r.getString(1)).toMap
    for (f <- Seq("plain.pdf", "flate.pdf")) {
      assert(rows(f).contains("Hello graft"), s"$f: ${rows(f)}")
      assert(rows(f).contains("second (escaped) line"), s"$f: ${rows(f)}")
      // Td broke the line between the two strings
      assert(rows(f).linesIterator.size >= 2, s"$f: ${rows(f)}")
      // structured extraction, not the ASCII-run fallback (which would leak
      // PDF syntax like "obj <<" into the text)
      assert(!rows(f).contains("obj"), s"$f fell back to heuristic: ${rows(f)}")
    }
  }

  test("pdf DCT (JPEG) image streams yield dimensions; text extraction unpolluted") {
    import graft.sources.unstructured.PdfText
    // a real JPEG via the JDK encoder
    val img = new java.awt.image.BufferedImage(37, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(5, 5, 0xff8040)
    val jbaos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jbaos))
    val jpeg = jbaos.toByteArray
    val cs = "BT (with an image) Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val pdf =
      s"%PDF-1.4\n4 0 obj << /Length ${cs.length} >>\nstream\n"
        .getBytes(StandardCharsets.ISO_8859_1) ++ cs ++
      "\nendstream\nendobj\n".getBytes(StandardCharsets.ISO_8859_1) ++
      (s"5 0 obj << /Type /XObject /Subtype /Image /Width 37 /Height 23 " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode " +
        s"/Length ${jpeg.length} >>\nstream\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ jpeg ++
      "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
        .getBytes(StandardCharsets.ISO_8859_1)
    // unit surface: the JPEG decodes to its true dimensions
    assert(PdfText.extractImageDims(pdf) == Seq((37, 23)))
    // the image bytes never pollute the text walk
    assert(PdfText.extract(pdf) == "with an image")
    // undecodable payload falls back to the dict's declared dimensions
    val broken =
      ("5 0 obj << /Subtype /Image /Width 640 /Height 480 /Filter /DCTDecode " +
        "/Length 4 >>\nstream\nÿØzz\nendstream\nendobj\n")
        .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extractImageDims(
      "%PDF-1.4\n".getBytes(StandardCharsets.ISO_8859_1) ++ broken) ==
      Seq((640, 480)))
    // SQL surface: the content sub-table carries imagedims
    val pdfDir = Files.createTempDirectory("graft-pdf-dct").toString
    Files.write(Paths.get(pdfDir, "img.pdf"), pdf)
    Files.write(Paths.get(pdfDir, "textonly.pdf"),
      minimalPdf("BT (no pictures) Tj ET", flate = false))
    spark.sql(
      s"REGISTER OR REPLACE PDF DATASOURCE pdfd OPTIONS (path '$pdfDir') NAMESPACE graft.datasource.un")
    val rows = spark.sql(
      "SELECT path, textcontent, imagedims FROM graft.datasource.un.pdfd.content ORDER BY path")
      .collect().map(r => r.getString(0).split('/').last ->
        (r.getString(1), r.getSeq[org.apache.spark.sql.Row](2))).toMap
    assert(rows("img.pdf")._2.map(r => (r.getInt(0), r.getInt(1))) == Seq((37, 23)))
    assert(rows("textonly.pdf")._2.isEmpty)
    assert(rows("img.pdf")._1 == "with an image")
  }

  test("pdf JBIG2 dims parse from segment headers; a lying dict loses to the bitstream") {
    import graft.sources.unstructured.PdfText
    // an EMBEDDED JBIG2 stream (no file header): page-information segment
    // (type 48, ISO/IEC 14492 §7.4.8) + an immediate generic region (38)
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def segment(num: Long, segType: Int, data: Array[Byte]): Array[Byte] =
      be32(num) ++ Array(segType.toByte, 0.toByte /* rt count 0 */ ,
        1.toByte /* page assoc */ ) ++ be32(data.length.toLong) ++ data
    val pageInfo = be32(123) ++ be32(45) ++ be32(0) ++ be32(0) ++
      Array(0.toByte) ++ Array(0.toByte, 0.toByte) // W H xres yres flags striping
    val regionInfo = be32(123) ++ be32(45) ++ be32(0) ++ be32(0) ++
      Array(0.toByte) ++ Array(0.toByte) // region info + generic flags stub
    val jbig2 = segment(0, 48, pageInfo) ++ segment(1, 38, regionInfo)
    assert(PdfText.jbig2Dims(jbig2) == Some((123, 45)))
    // striped page (height unknown = 0xffffffff): the region's height wins
    val striped = be32(123) ++ be32(0xffffffffL) ++ be32(0) ++ be32(0) ++
      Array(0.toByte) ++ Array(0x80.toByte, 0.toByte)
    assert(PdfText.jbig2Dims(segment(0, 48, striped) ++ segment(1, 38, regionInfo)) ==
      Some((123, 45)))
    // truncated garbage stays None (dict fallback handles it upstream)
    assert(PdfText.jbig2Dims(Array[Byte](1, 2, 3)) == None)
    // PDF surface: the dict DECLARES 999x999, the bitstream says 123x45 —
    // the bitstream wins (dims parity is no longer dict-trust)
    val pdf =
      (s"%PDF-1.4\n5 0 obj << /Type /XObject /Subtype /Image /Width 999 " +
        s"/Height 999 /BitsPerComponent 1 /Filter /JBIG2Decode " +
        s"/Length ${jbig2.length} >>\nstream\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ jbig2 ++
      "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
        .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extractImageDims(pdf) == Seq((123, 45)))
    // and a JBIG2 stream whose segments are unreadable still surfaces the
    // dict's declaration (conservative fallback, same as CMYK JPEG)
    val optOut =
      (s"%PDF-1.4\n5 0 obj << /Subtype /Image /Width 640 /Height 480 " +
        s"/Filter /JBIG2Decode /Length 3 >>\nstream\nzzz\nendstream\nendobj\n")
        .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extractImageDims(optOut) == Seq((640, 480)))
  }

  test("pdf JPX dims parse from the payload: JP2 ihdr box and raw codestream SIZ") {
    import graft.sources.unstructured.PdfText
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    // JP2 container: signature box + ftyp + jp2h(ihdr)
    val ihdr = be32(22) ++ "ihdr".getBytes ++ be32(77) /* height */ ++
      be32(123) /* width */ ++ Array[Byte](0, 1, 7, 0, 0, 0)
    val jp2h = be32(8 + ihdr.length) ++ "jp2h".getBytes ++ ihdr
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "jp2 ".getBytes ++ be32(0)
    val jp2 = be32(12) ++ "jP  ".getBytes ++ Array[Byte](0x0d, 0x0a, 0x87.toByte, 0x0a) ++
      ftyp ++ jp2h
    assert(PdfText.jpxDims(jp2) == Some((123, 77)))
    // raw codestream: SOC + SIZ with offsets (Xsiz 500, XOsiz 10 -> 490)
    val siz = Array[Byte](0xff.toByte, 0x4f.toByte, 0xff.toByte, 0x51.toByte,
      0, 41, 0, 0) ++ be32(500) ++ be32(300) ++ be32(10) ++ be32(20) ++
      be32(500) ++ be32(300) ++ be32(0) ++ be32(0)
    assert(PdfText.jpxDims(siz) == Some((490, 280)))
    assert(PdfText.jpxDims(Array[Byte](1, 2, 3)) == None)
    // PDF surface: the payload's geometry wins over a lying dict
    val pdf =
      (s"%PDF-1.4\n5 0 obj << /Subtype /Image /Width 999 /Height 999 " +
        s"/Filter /JPXDecode /Length ${jp2.length} >>\nstream\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ jp2 ++
      "\nendstream\nendobj\n%%EOF\n".getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extractImageDims(pdf) == Seq((123, 77)))
    // unreadable payload still falls back to the dict
    val bad =
      ("%PDF-1.4\n5 0 obj << /Subtype /Image /Width 64 /Height 32 " +
        "/Filter /JPXDecode /Length 3 >>\nstream\nzzz\nendstream\nendobj\n")
        .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extractImageDims(bad) == Seq((64, 32)))
  }

  test("pdf CCITT/raster image streams: dict dims, raster->PNG extraction roundtrip") {
    import graft.sources.unstructured.PdfText
    // CCITT (G4 fax) payload: no JDK codec — dims surface from the dict,
    // text walk unpolluted, extractImages skips it
    val ccitt =
      ("%PDF-1.4\n7 0 obj << /Subtype /Image /Width 1728 /Height 1100 " +
        "/BitsPerComponent 1 /Filter /CCITTFaxDecode /Length 4 >>\n" +
        "stream\n\nendstream\nendobj\n" +
        "trailer << /Root 1 0 R >>\n%%EOF\n")
        .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extractImageDims(ccitt) == Seq((1728, 1100)))
    assert(PdfText.extract(ccitt) == "")
    assert(PdfText.extractImages(ccitt).isEmpty)
    // Flate raster (lossless-image spelling): exact RGB samples roundtrip
    // through the PNG re-encode — scanned pages become real image bytes
    val (w, h) = (5, 3)
    val samples = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(samples); d.finish()
      val buf = new Array[Byte](1024)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    val raster =
      (s"%PDF-1.4\n8 0 obj << /Subtype /Image /Width $w /Height $h " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode " +
        s"/Length ${deflated.length} >>\nstream\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ deflated ++
      "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
        .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extractImageDims(raster) == Seq((w, h)))
    val pngs = PdfText.extractImages(raster)
    assert(pngs.size == 1)
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pngs.head))
    assert(decoded.getWidth == w && decoded.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val expect = ((samples(i) & 0xFF) << 16) | ((samples(i + 1) & 0xFF) << 8) |
        (samples(i + 2) & 0xFF)
      assert((decoded.getRGB(x, y) & 0xFFFFFF) == expect,
        s"pixel ($x,$y) must survive the PDF->PNG roundtrip exactly")
    }
    // DeviceGray single-component rasters widen to gray RGB
    val gray = Array.tabulate(4 * 2)(i => (i * 30).toByte)
    val grayPdf =
      (s"%PDF-1.4\n9 0 obj << /Subtype /Image /Width 4 /Height 2 " +
        s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length ${gray.length} >>\nstream\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ gray ++
      "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
        .getBytes(StandardCharsets.ISO_8859_1)
    val gpng = PdfText.extractImages(grayPdf)
    assert(gpng.size == 1)
    val gimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gpng.head))
    assert((gimg.getRGB(1, 0) & 0xFF) == 30 && ((gimg.getRGB(1, 0) >> 8) & 0xFF) == 30)
    // geometry contradiction (truncated samples) -> no image, no throw
    val torn =
      (s"%PDF-1.4\n9 0 obj << /Subtype /Image /Width 40 /Height 20 " +
        s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length ${gray.length} >>\nstream\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ gray ++
      "\nendstream\nendobj\n%%EOF\n".getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extractImages(torn).isEmpty)
    assert(PdfText.extractImageDims(torn) == Seq((40, 20)), "dims still dict-served")
    // SQL surface: the content sub-table's `images` column carries
    // ImageIO-decodable bytes
    val pdfDir = Files.createTempDirectory("graft-pdf-raster").toString
    Files.write(Paths.get(pdfDir, "scan.pdf"), raster)
    spark.sql(
      s"REGISTER OR REPLACE PDF DATASOURCE pdfr OPTIONS (path '$pdfDir') NAMESPACE graft.datasource.un")
    val row = spark.sql(
      "SELECT images FROM graft.datasource.un.pdfr.content").collect().head
    val bytes = row.getSeq[Array[Byte]](0)
    assert(bytes.size == 1 &&
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes.head)).getWidth == w)
  }

  test("audio scan: samplerate/duration metadata from WAV headers (beyond-ref)") {
    val audioDir = Files.createTempDirectory("graft-audio").toString
    val rate = 8000
    val data = new Array[Byte](rate) // half a second of PCM-16 silence
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(data.length).put(data)
    Files.write(Paths.get(audioDir, "a.wav"), bb.array())
    Files.write(Paths.get(audioDir, "junk.bin"), "not audio".getBytes)
    spark.sql(
      s"REGISTER OR REPLACE AUDIO DATASOURCE tunes OPTIONS (path '$audioDir') NAMESPACE graft.datasource.un")
    val rows = spark.sql(
      "SELECT path, samplerate, duration FROM graft.datasource.un.tunes ORDER BY path")
      .collect().map(r => r.getString(0).split('/').last ->
        ((if (r.isNullAt(1)) -1 else r.getInt(1)), (if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(rows("a.wav") == ((8000, 500L)), rows.toString)
    assert(rows("junk.bin") == ((-1, -1L)), rows.toString) // unrecognized -> nulls
    // content sub-table serves the raw bytes
    val bin = spark.sql(
      "SELECT bincontent FROM graft.datasource.un.tunes.content WHERE path LIKE '%a.wav'")
      .head().getAs[Array[Byte]](0)
    assert(bin.length == 44 + data.length)
  }

  test("webp dimensions: VP8 lossy, VP8L lossless, VP8X extended (beyond ImageIO)") {
    import graft.sources.unstructured.ContentExtractor
    def riff(chunkId: String, payload: Array[Byte]): Array[Byte] = {
      val size = 4 + 8 + payload.length
      val bb = java.nio.ByteBuffer.allocate(12 + 8 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(size).put("WEBP".getBytes)
      bb.put(chunkId.getBytes).putInt(payload.length).put(payload)
      bb.array()
    }
    // VP8 lossy: 3-byte frame tag, 9D 01 2A start code, 14-bit dims
    val vp8 = riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      0x40, 0x01, 0xf0.toByte, 0x00)) // w=320, h=240
    assert(ContentExtractor.webpDims(vp8).contains((320, 240)))
    // VP8L lossless: 0x2F signature, packed 14-bit dims (w=17, h=9)
    val vp8l = riff("VP8L", Array[Byte](0x2f, 0x10, 0x00, 0x02, 0x00))
    assert(ContentExtractor.webpDims(vp8l).contains((17, 9)))
    // VP8X extended: 4 flag/reserved bytes then 24-bit LE canvas dims - 1
    val vp8x = riff("VP8X", Array[Byte](0, 0, 0, 0,
      0x2b, 0x01, 0x00, 0xc7.toByte, 0x00, 0x00)) // w=300, h=200
    assert(ContentExtractor.webpDims(vp8x).contains((300, 200)))
    // garbage / truncation never throws
    assert(ContentExtractor.webpDims("RIFFxxxxWEBP".getBytes).isEmpty)
    assert(ContentExtractor.webpDims(Array[Byte](1, 2, 3)).isEmpty)
    val rnd = new java.util.Random(11)
    for (_ <- 0 until 30) {
      val b = new Array[Byte](64); rnd.nextBytes(b)
      ContentExtractor.webpDims(b)
    }
    // HEIC/AVIF: ftyp brand + validated 20-byte ispe box
    def heif(brand: String, w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64) // big-endian by default
      bb.putInt(16).put("ftyp".getBytes).put(brand.getBytes).putInt(0)
      bb.putInt(20).put("ispe".getBytes).putInt(0).putInt(w).putInt(h)
      bb.array()
    }
    assert(ContentExtractor.heifDims(heif("heic", 640, 480)).contains((640, 480)))
    assert(ContentExtractor.heifDims(heif("avif", 12, 34)).contains((12, 34)))
    // wrong brand, decoy 'ispe' without a valid size field, garbage
    assert(ContentExtractor.heifDims(heif("mp42", 1, 1)).isEmpty)
    val decoy = "xxxxftypheic0000 payload ispe then junk".getBytes
    assert(ContentExtractor.heifDims(decoy).isEmpty)
    for (_ <- 0 until 30) {
      val b = new Array[Byte](64); rnd.nextBytes(b)
      ContentExtractor.heifDims(b)
    }
    // scan-level: a .webp in an IMAGE datasource reports width/height
    val webpDir = Files.createTempDirectory("graft-webp").toString
    Files.write(Paths.get(webpDir, "w.webp"), vp8)
    spark.sql(
      s"REGISTER OR REPLACE IMAGE DATASOURCE webps OPTIONS (path '$webpDir') NAMESPACE graft.datasource.un")
    val row = spark.sql(
      "SELECT width, height FROM graft.datasource.un.webps WHERE path LIKE '%w.webp'").head()
    assert(row.getInt(0) == 320 && row.getInt(1) == 240, row.toString)
  }

  test("ogv metadata: theora id header dims + granule-walk duration") {
    import graft.sources.unstructured.VideoContainers
    def page(granule: Long, payload: Array[Byte], serial: Int = 0): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("OggS".getBytes); out.write(0); out.write(0)
      var g = granule
      for (_ <- 0 until 8) { out.write((g & 0xff).toInt); g >>= 8 }
      var sr = serial
      for (_ <- 0 until 4) { out.write(sr & 0xff); sr >>= 8 }
      out.write(new Array[Byte](8)) // seq, checksum
      out.write(1); out.write(payload.length)
      out.write(payload)
      out.toByteArray
    }
    val id = java.nio.ByteBuffer.allocate(42) // big-endian
      .put(0x80.toByte).put("theora".getBytes)
      .put(3.toByte).put(2.toByte).put(1.toByte)         // VMAJ VMIN VREV
      .putShort(20).putShort(15)                          // FMBW FMBH (x16)
      .put(Array[Byte](0, 1, 64)).put(Array[Byte](0, 0, 240.toByte)) // PICW=320 PICH=240
      .put(0.toByte).put(0.toByte)                        // PICX PICY
      .putInt(30).putInt(1)                               // FRN FRD -> 30 fps
      .put(new Array[Byte](6))                            // PARN PARD
      .put(0.toByte).put(new Array[Byte](3))              // CS NOMBR
      .put(0.toByte).put(0xC0.toByte)                     // QUAL/KFGSHIFT=6/PF
      .array()
    // granule at kfgshift 6: 60 keyframes << 6 | 30 delta = 90 frames -> 3000 ms
    val ogv = page(0L, id) ++ page((60L << 6) | 30L, Array[Byte](0))
    val info = VideoContainers.parse(ogv)
    assert(info.width.contains(320) && info.height.contains(240), info.toString)
    assert(info.durationMs.contains(3000L), info.toString)
    // real OGVs mux audio: a Vorbis-ish stream (different serial) with a
    // HUGE sample-count granule must not pollute the Theora duration, and a
    // Skeleton-style non-Theora BOS page FIRST must not hide the id packet
    val muxed = page(0L, "fishead junk".getBytes, serial = 7) ++
      page(0L, id, serial = 1) ++
      page(441000L, "vorbisdata".getBytes, serial = 7) ++
      page((60L << 6) | 30L, Array[Byte](0), serial = 1)
    val mInfo = VideoContainers.parse(muxed)
    assert(mInfo.width.contains(320) && mInfo.durationMs.contains(3000L), mInfo.toString)
    // an Ogg AUDIO stream is not video: probe yields empty info, never throws
    val opusHead = "OpusHead".getBytes ++ new Array[Byte](11)
    assert(VideoContainers.parse(page(0L, opusHead)) == graft.sources.unstructured.Mp4Meta.Info(None, None, None))
    val rnd2 = new java.util.Random(13)
    for (_ <- 0 until 30) {
      val b = new Array[Byte](80); rnd2.nextBytes(b); b(0) = 'O'; b(1) = 'g'; b(2) = 'g'; b(3) = 'S'
      VideoContainers.parse(b)
    }
  }

  test("pdf inline images and dictionaries skip cleanly, surrounding text survives") {
    val pdfDir = Files.createTempDirectory("graft-pdf-bi").toString
    // the image binary carries every operator look-alike: '(' '<', an
    // EI-lookalike without a trailing delimiter (EIX), and the BI params
    // carry an "ID" substring inside a name (/XIDZ) that must NOT start the
    // binary scan early; the inline dict carries a literal and a hex string
    // (<4865...> decodes to "Hello") that must never reach the page text
    val cs = "BT (before image) Tj " +
      "BI /W 2 /H 2 /N /XIDZ /BPC 8 ID (<EIX EI (after image) Tj " +
      "<< /Deco (paren inside) /Hex <48656c6c6f> >> (tail text) Tj ET"
    Files.write(Paths.get(pdfDir, "bi.pdf"), minimalPdf(cs, flate = false))
    // malformed-but-hostile: BI butted straight against '(' — the skip must
    // still trigger from the '(' branch and resume after the true EI
    val cs2 = "BT (keep me) Tj BI(ID junk ( < EI (tail kept) Tj ET"
    Files.write(Paths.get(pdfDir, "bi2.pdf"), minimalPdf(cs2, flate = false))
    spark.sql(
      s"REGISTER OR REPLACE PDF DATASOURCE pdfbi OPTIONS (path '$pdfDir') NAMESPACE graft.datasource.un")
    val rows = spark.sql(
      "SELECT path, textcontent FROM graft.datasource.un.pdfbi.content ORDER BY path")
      .collect().map(r => r.getString(0).split('/').last -> r.getString(1)).toMap
    assert(rows("bi.pdf").contains("before image"), rows("bi.pdf"))
    assert(rows("bi.pdf").contains("after image"), rows("bi.pdf"))
    assert(rows("bi.pdf").contains("tail text"), rows("bi.pdf"))
    for (leak <- Seq("EIX", "paren inside", "Hello"))
      assert(!rows("bi.pdf").contains(leak), s"leaked '$leak': ${rows("bi.pdf")}")
    assert(rows("bi2.pdf").contains("keep me"), rows("bi2.pdf"))
    assert(rows("bi2.pdf").contains("tail kept"), rows("bi2.pdf"))
    assert(!rows("bi2.pdf").contains("junk"), rows("bi2.pdf"))
  }

  test("pdf 1.5 object streams: packed content round-trips, conforming bodies never leak") {
    import graft.sources.unstructured.PdfText
    def deflate(d: Array[Byte]): Array[Byte] = {
      val df = new java.util.zip.Deflater(); df.setInput(d); df.finish()
      val out = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](4096)
      while (!df.finished()) out.write(buf, 0, df.deflate(buf))
      out.toByteArray
    }
    def objStmPdf(body: String, extra: String = ""): Array[Byte] = {
      val packed = deflate(body.getBytes(StandardCharsets.ISO_8859_1))
      (s"%PDF-1.5\n5 0 obj << /Type /ObjStm /N 1 /First 4 /Length ${packed.length}" +
        " /Filter /FlateDecode >>\nstream\n").getBytes(StandardCharsets.ISO_8859_1) ++
        packed ++
        s"\nendstream\nendobj\n$extra\ntrailer << /Root 1 0 R >>\n%%EOF\n"
          .getBytes(StandardCharsets.ISO_8859_1)
    }
    // nonconforming writers pack whole stream objects inside an ObjStm: the
    // recursive re-scan must surface the inner content stream's text
    val inner = "BT (packed in objstm) Tj ET"
    val packed = objStmPdf(s"6 0\n6 0 obj << /Length ${inner.length} >> stream\n$inner\nendstream endobj")
    assert(PdfText.extract(packed).contains("packed in objstm"))
    // a CONFORMING ObjStm body is non-stream objects only — dictionary string
    // values there are metadata, not page text, and must not leak into the
    // extraction while a sibling top-level content stream still extracts
    val conforming = objStmPdf("7 0 8 24\n<< /Title (secret metadata) >>\n<< /Author (hidden) >>",
      extra = "4 0 obj << /Length 22 >>\nstream\nBT (real page text) Tj ET\nendstream\nendobj")
    val text = PdfText.extract(conforming)
    assert(text.contains("real page text"), text)
    assert(!text.contains("secret metadata") && !text.contains("hidden"), text)
    // ObjStm nested in ObjStm: depth cap holds, inner-inner text still found
    val level1 = s"6 0\n6 0 obj << /Length ${inner.length} >> stream\n$inner\nendstream endobj"
    val level1Packed = deflate(level1.getBytes(StandardCharsets.ISO_8859_1))
    val level2 = ("5 0\n5 0 obj << /Type /ObjStm /N 1 /First 4 /Filter /FlateDecode " +
      s"/Length ${level1Packed.length} >> stream\n").getBytes(StandardCharsets.ISO_8859_1) ++
      level1Packed ++ "\nendstream endobj".getBytes(StandardCharsets.ISO_8859_1)
    val nestedDoc = ("%PDF-1.5\n9 0 obj << /Type /ObjStm /N 1 /First 4 /Filter /FlateDecode " +
      s"/Length ${deflate(level2).length} >> stream\n").getBytes(StandardCharsets.ISO_8859_1) ++
      deflate(level2) ++ "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
        .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(nestedDoc).contains("packed in objstm"))
  }

  test("encrypted pdf (empty user password): RC4 and AES-128 streams decrypt, wrong key falls back") {
    import graft.sources.unstructured.PdfText
    // test-side encryptor implementing ISO 32000-1 Algorithm 2 + per-object
    // keys from the published spec. This proves decrypt(encrypt(x)) == x for
    // the same spec reading — a documented limitation: offline there are no
    // third-party encrypted fixtures to cross-check against.
    def md5(parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(d.update); d.digest()
    }
    val pad = Array(0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
      0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
      0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)
    val o = Array.tabulate[Byte](32)(_.toByte)
    val id1 = Array.tabulate[Byte](16)(i => (0xA0 + i).toByte)
    val p = -44
    val pLe = Array[Byte]((p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    def fileKey(n: Int, r: Int): Array[Byte] = {
      var key = md5(pad, o, pLe, id1)
      if (r >= 3) for (_ <- 0 until 50) key = md5(key.take(n))
      key.take(n)
    }
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    def objKey(fk: Array[Byte], on: Int, aes: Boolean): Array[Byte] = {
      val ob = Array[Byte]((on & 0xff).toByte, ((on >> 8) & 0xff).toByte,
        ((on >> 16) & 0xff).toByte, 0, 0)
      val salt = if (aes) "sAlT".getBytes else Array.empty[Byte]
      md5(fk, ob, salt).take(math.min(fk.length + 5, 16))
    }
    val cs = "BT (vaulted text) Tj ET".getBytes(StandardCharsets.ISO_8859_1)

    def doc(encDict: String, payload: Array[Byte]): Array[Byte] =
      (s"%PDF-1.4\n4 0 obj << /Length ${payload.length} >>\nstream\n"
        .getBytes(StandardCharsets.ISO_8859_1) ++ payload ++
        ("\nendstream\nendobj\n9 0 obj " + encDict + " endobj\n" +
          s"trailer << /Root 1 0 R /Encrypt 9 0 R /ID [<${hex(id1)}> <${hex(id1)}>] >>\n%%EOF\n")
          .getBytes(StandardCharsets.ISO_8859_1))

    // RC4, R3, 128-bit
    val fkRc4 = fileKey(16, 3)
    val rc4Doc = doc(
      s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $p /O <${hex(o)}> /U <${hex(o)}> >>",
      PdfText.StandardDecrypt.rc4(objKey(fkRc4, 4, aes = false), cs))
    assert(PdfText.extract(rc4Doc).contains("vaulted text"), PdfText.extract(rc4Doc))

    // AES-128 (V4 /AESV2): IV + CBC/PKCS5 ciphertext
    val fkAes = fileKey(16, 4)
    val iv = Array.tabulate[Byte](16)(i => (0x10 + i).toByte)
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(objKey(fkAes, 4, aes = true), "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    val aesDoc = doc(
      s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $p /O <${hex(o)}> /U <${hex(o)}> " +
        "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF >>",
      iv ++ cipher.doFinal(cs))
    assert(PdfText.extract(aesDoc).contains("vaulted text"), PdfText.extract(aesDoc))

    // wrong key material (different /O): decryption yields garbage, the
    // extractor must fall back without throwing and never leak plaintext
    val wrongDoc = doc(
      s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $p /O <${hex(id1 ++ id1)}> /U <${hex(o)}> >>",
      PdfText.StandardDecrypt.rc4(objKey(fkRc4, 4, aes = false), cs))
    assert(!PdfText.extract(wrongDoc).contains("vaulted text"))

    // AES-256 R6 (PDF 2.0 /AESV3): file key from /UE via the Algorithm 2.B
    // intermediate; R5 via plain SHA-256. File key encrypts objects directly.
    for (r6 <- Seq(5, 6)) {
      val fileKey = Array.tabulate[Byte](32)(i => (i * 7 + 3).toByte)
      val keySalt = Array.tabulate[Byte](8)(i => (0x50 + i).toByte)
      val valSalt = Array.tabulate[Byte](8)(i => (0x60 + i).toByte)
      val intermediate =
        if (r6 == 5) java.security.MessageDigest.getInstance("SHA-256").digest(keySalt)
        else PdfText.StandardDecrypt.hash2B(Array.empty, keySalt, Array.empty)
      val enc = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      enc.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(intermediate, "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      val ue = enc.doFinal(fileKey)
      val u = Array.fill[Byte](32)(0x11) ++ valSalt ++ keySalt // validation hash unchecked
      val iv2 = Array.tabulate[Byte](16)(i => (0x30 + i).toByte)
      val body = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      body.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(fileKey, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv2))
      val v5Doc = doc(
        s"<< /Filter /Standard /V 5 /R $r6 /Length 256 /P $p /O <${hex(o ++ o.take(16))}> " +
          s"/U <${hex(u)}> /UE <${hex(ue)}> /CF << /StdCF << /CFM /AESV3 >> >> /StmF /StdCF >>",
        iv2 ++ body.doFinal(cs))
      assert(PdfText.extract(v5Doc).contains("vaulted text"), s"R$r6: ${PdfText.extract(v5Doc)}")
    }

    // USER-password documents: Algorithm 2 pads the password into the key
    // material; without the password extraction yields nothing, with it the
    // text round-trips — including through the scan-level `password` option
    val pwd = "hunter2".getBytes(StandardCharsets.UTF_8)
    val fkPwd = {
      var key = md5((pwd ++ pad).take(32), o, pLe, id1)
      for (_ <- 0 until 50) key = md5(key.take(16))
      key.take(16)
    }
    val pwdDoc = doc(
      s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $p /O <${hex(o)}> /U <${hex(o)}> >>",
      PdfText.StandardDecrypt.rc4(objKey(fkPwd, 4, aes = false), cs))
    assert(!PdfText.extract(pwdDoc).contains("vaulted text"))
    assert(PdfText.extract(pwdDoc, password = pwd).contains("vaulted text"),
      PdfText.extract(pwdDoc, password = pwd))
    val pwdDir = Files.createTempDirectory("graft-pdf-pwd").toString
    Files.write(Paths.get(pwdDir, "locked.pdf"), pwdDoc)
    spark.sql("REGISTER OR REPLACE PDF DATASOURCE lockedpdf OPTIONS " +
      s"(path '$pwdDir', password 'hunter2') NAMESPACE graft.datasource.un")
    val viaScan = spark.sql(
      "SELECT textcontent FROM graft.datasource.un.lockedpdf.content").head().getString(0)
    assert(viaScan.contains("vaulted text"), viaScan)

    // Acrobat serializes /CF (whose nested /Length 16 is in BYTES) before
    // the top-level /Length 128 — key derivation must read the TOP-LEVEL
    // entry or the file key truncates to 5 bytes and AES init throws
    val fkAes2 = fileKey(16, 4)
    val enc2 = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    enc2.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(objKey(fkAes2, 4, aes = true), "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    val acrobatDoc = doc(
      s"<< /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /Filter /Standard /Length 128 " +
        s"/O <${hex(o)}> /P $p /R 4 /StmF /StdCF /U <${hex(o)}> /V 4 >>",
      iv ++ enc2.doFinal(cs))
    assert(PdfText.extract(acrobatDoc).contains("vaulted text"),
      s"nested /Length must not shadow: ${PdfText.extract(acrobatDoc)}")

    // /StmF /Identity routes streams AROUND encryption: plaintext streams
    // must extract untouched, not be garbled by a needless decrypt
    val identityDoc = doc(
      s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $p /O <${hex(o)}> " +
        s"/U <${hex(o)}> /StmF /Identity /CF << /StdCF << /CFM /AESV2 >> >> >>",
      cs)
    assert(PdfText.extract(identityDoc).contains("vaulted text"),
      s"Identity streams garbled: ${PdfText.extract(identityDoc)}")

    // whitespace-robust /EncryptMetadata: a newline separator must still
    // flip the key-derivation salt (same derivation on both sides -> text)
    val fkMeta = {
      var key = md5(pad, o, pLe, id1,
        Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))
      for (_ <- 0 until 50) key = md5(key.take(16))
      key.take(16)
    }
    val metaDoc = doc(
      s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $p /O <${hex(o)}> /U <${hex(o)}> " +
        "/CF << /StdCF << /CFM /V2 >> >> /StmF /StdCF /EncryptMetadata\nfalse >>",
      PdfText.StandardDecrypt.rc4(objKey(fkMeta, 4, aes = false), cs))
    assert(PdfText.extract(metaDoc).contains("vaulted text"),
      s"EncryptMetadata newline: ${PdfText.extract(metaDoc)}")

    // hostile /Encrypt dicts never throw
    PdfText.extract("%PDF\n/Encrypt << /Filter /Standard /R 3 >>\ntrailer".getBytes)
    PdfText.extract("%PDF\n/Encrypt 5 0 R\ntrailer".getBytes)
    PdfText.extract(("%PDF\n/Encrypt << /Filter /Standard /R 3 /P 1 /O <00> >> " +
      "4 0 obj << /Length 3 >>\nstream\nabc\nendstream").getBytes)
    PdfText.extract(("%PDF\n/Encrypt << /Filter /Standard /R 6 /U <0011> /UE <22> >>\n" +
      "4 0 obj << /Length 3 >>\nstream\nabc\nendstream").getBytes)

    // OWNER password (Algorithms 3/7): /O wraps the padded USER password
    // under the owner-derived RC4 key; /U is computed per Algorithm 5 so
    // both password interpretations can validate. The SAME document must
    // open with the user password, with the owner password, and not with a
    // wrong one (wrong -> heuristic fallback, no "vaulted text").
    {
      val ownerPwd = "own3r".getBytes(StandardCharsets.UTF_8)
      val userPwd = "us3r".getBytes(StandardCharsets.UTF_8)
      val okey = {
        var k = md5((ownerPwd ++ pad).take(32))
        for (_ <- 0 until 50) k = md5(k.take(16))
        k.take(16)
      }
      var oEnc = (userPwd ++ pad).take(32)
      for (i <- 0 to 19) oEnc = PdfText.StandardDecrypt.rc4(okey.map(b => (b ^ i).toByte), oEnc)
      val fkU = {
        var key = md5((userPwd ++ pad).take(32), oEnc, pLe, id1)
        for (_ <- 0 until 50) key = md5(key.take(16))
        key.take(16)
      }
      val uVal = {
        var e = PdfText.StandardDecrypt.rc4(fkU, md5(pad, id1))
        for (i <- 1 to 19) e = PdfText.StandardDecrypt.rc4(fkU.map(b => (b ^ i).toByte), e)
        e.take(16) ++ new Array[Byte](16) // Algorithm 5: 16 validation + 16 arbitrary
      }
      val ownerDoc = doc(
        s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $p /O <${hex(oEnc)}> /U <${hex(uVal)}> >>",
        PdfText.StandardDecrypt.rc4(objKey(fkU, 4, aes = false), cs))
      assert(PdfText.extract(ownerDoc, password = userPwd).contains("vaulted text"),
        s"user pwd: ${PdfText.extract(ownerDoc, password = userPwd)}")
      assert(PdfText.extract(ownerDoc, password = ownerPwd).contains("vaulted text"),
        s"owner pwd: ${PdfText.extract(ownerDoc, password = ownerPwd)}")
      assert(!PdfText.extract(ownerDoc, password = "wrong".getBytes).contains("vaulted text"))
    }

    // OWNER password, AES-256 R6 (Algorithm 2.A): /O's validation hash is
    // keyed over the 48-byte /U; the owner key salt unwraps /OE into the
    // file key. /U and /UE are junk, so ONLY the owner path can open it.
    {
      val ownerPwd = "r6owner".getBytes(StandardCharsets.UTF_8)
      val fileKey = Array.tabulate[Byte](32)(i => (i * 11 + 5).toByte)
      val u48 = Array.fill[Byte](32)(0x22) ++ Array.tabulate[Byte](16)(i => (0x70 + i).toByte)
      val oValidSalt = Array.tabulate[Byte](8)(i => (0x40 + i).toByte)
      val oKeySalt = Array.tabulate[Byte](8)(i => (0x48 + i).toByte)
      val oVal = PdfText.StandardDecrypt.hash2B(ownerPwd, oValidSalt, u48)
      val o48 = oVal.take(32) ++ oValidSalt ++ oKeySalt
      val interO = PdfText.StandardDecrypt.hash2B(ownerPwd, oKeySalt, u48)
      val encO = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      encO.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(interO, "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      val oe = encO.doFinal(fileKey)
      val iv6 = Array.tabulate[Byte](16)(i => (0x60 + i).toByte)
      val body6 = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      body6.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(fileKey, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv6))
      val r6Doc = doc(
        s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P $p /O <${hex(o48)}> /OE <${hex(oe)}> " +
          s"/U <${hex(u48)}> /UE <${hex(Array.fill[Byte](32)(0x33))}> " +
          "/CF << /StdCF << /CFM /AESV3 >> >> /StmF /StdCF >>",
        iv6 ++ body6.doFinal(cs))
      assert(PdfText.extract(r6Doc, password = ownerPwd).contains("vaulted text"),
        s"R6 owner: ${PdfText.extract(r6Doc, password = ownerPwd)}")
      assert(!PdfText.extract(r6Doc, password = "nope".getBytes).contains("vaulted text"))
    }

    // unsigned /P serialization (some writers emit the 32-bit two's
    // complement as unsigned, e.g. 4294967252 for -44): must round-trip to
    // the signed permissions word the key derivation needs — a
    // NumberFormatException here used to silently disable decryption
    val unsignedP = p.toLong & 0xFFFFFFFFL
    val unsignedDoc = doc(
      s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $unsignedP /O <${hex(o)}> /U <${hex(o)}> >>",
      PdfText.StandardDecrypt.rc4(objKey(fkRc4, 4, aes = false), cs))
    assert(PdfText.extract(unsignedDoc).contains("vaulted text"),
      s"unsigned /P: ${PdfText.extract(unsignedDoc)}")

    // a /EncryptMetadata occurrence AFTER the trailer's /Encrypt entry must
    // not hijack encryption detection (token-boundary + backward scan):
    // without the boundary check the doc is treated as unencrypted and the
    // RC4 payload degrades to garbage
    val decoyTail = "\n% incremental update junk: /EncryptMetadata false\n"
      .getBytes(StandardCharsets.ISO_8859_1)
    val decoyDoc = rc4Doc ++ decoyTail
    assert(PdfText.extract(decoyDoc).contains("vaulted text"),
      s"/EncryptMetadata decoy hijacked detection: ${PdfText.extract(decoyDoc)}")
  }

  test("hash2B matches a structurally independent re-implementation of Algorithm 2.B") {
    import graft.sources.unstructured.PdfText
    // Offline there is no third-party fixture to fetch, so the cross-check
    // is a second implementation written directly from the published
    // ISO 32000-2 7.6.4.3.4 text with deliberately different structure:
    // K1 via Array.fill/flatten (not arraycopy), the mod-3 selector via
    // BigInteger over the first 16 bytes of E (not the byte-sum congruence),
    // and the termination condition tracked in an explicit lastE variable.
    // Agreement across inputs rules out transcription slips in either
    // reading of the spec that a round-trip test could never see.
    def independent(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
      def digest(alg: String, parts: Array[Byte]*) = {
        val d = java.security.MessageDigest.getInstance(alg)
        parts.foreach(d.update); d.digest()
      }
      var k = digest("SHA-256", pwd, salt, udata)
      var rounds = 0
      var lastE = Int.MaxValue
      while (rounds < 64 || lastE > rounds - 32) {
        val k1 = Array.fill(64)(pwd ++ k ++ udata).flatten
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
          new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
        val e = c.doFinal(k1)
        val mod = new java.math.BigInteger(1, e.take(16))
          .mod(java.math.BigInteger.valueOf(3)).intValue()
        k = digest(Seq("SHA-256", "SHA-384", "SHA-512")(mod), e)
        lastE = e.last & 0xff
        rounds += 1
      }
      k.take(32)
    }
    val cases = Seq(
      (Array.empty[Byte], Array.tabulate[Byte](8)(i => (0x50 + i).toByte), Array.empty[Byte]),
      ("hunter2".getBytes(StandardCharsets.UTF_8),
        Array.tabulate[Byte](8)(_.toByte), Array.empty[Byte]),
      ("pässwörd".getBytes(StandardCharsets.UTF_8),
        Array.tabulate[Byte](8)(i => (0xF0 + i).toByte),
        Array.tabulate[Byte](48)(i => (i * 5).toByte)))
    for ((pwd, salt, udata) <- cases)
      assert(PdfText.StandardDecrypt.hash2B(pwd, salt, udata)
        .sameElements(independent(pwd, salt, udata)),
        s"hash2B diverges for pwd=${new String(pwd, StandardCharsets.UTF_8)}")
  }

  test("dictInt parses unsigned 32-bit serializations and rejects wider garbage") {
    import graft.sources.unstructured.PdfText
    assert(PdfText.dictPermissions("<< /P -3904 >>") == Some(-3904))
    assert(PdfText.dictPermissions("<< /P 4294963392 >>") == Some(-3904))
    assert(PdfText.dictPermissions("<< /P 99999999999999999999999 >>").isEmpty)
    assert(PdfText.dictPermissions("<< /P 4294967296 >>").isEmpty) // 2^32: out of range
    // the unsigned leniency must NOT leak to other keys: a malformed wide
    // /R yields None (clean skip), never a truncated plausible value
    assert(PdfText.dictInt("<< /R 4294967302 >>", "/R").isEmpty)
    assert(PdfText.dictInt("<< /R 6 >>", "/R") == Some(6))
  }

  test("pdf DecodeParms predictors: PNG Up/Sub/Paeth and TIFF-2 round-trip") {
    import graft.sources.unstructured.PdfText
    def deflate(d: Array[Byte]): Array[Byte] = {
      val df = new java.util.zip.Deflater(); df.setInput(d); df.finish()
      val out = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](4096)
      while (!df.finished()) out.write(buf, 0, df.deflate(buf))
      out.toByteArray
    }
    val cs = "BT (predicted text flows) Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val cols = 8
    // test-side PNG ENCODER (the inverse walk): rows of `cols` bytes, pad the
    // tail row with spaces, per-row tag
    def pngEncode(data: Array[Byte], tag: Int): Array[Byte] = {
      val padded = data ++ Array.fill[Byte]((cols - data.length % cols) % cols)(' ')
      val out = new java.io.ByteArrayOutputStream()
      val prev = new Array[Byte](cols)
      padded.grouped(cols).foreach { row =>
        out.write(tag)
        var i = 0
        while (i < cols) {
          val left = if (i >= 1) row(i - 1) & 0xff else 0
          val up = prev(i) & 0xff
          val ul = if (i >= 1) prev(i - 1) & 0xff else 0
          val pred = tag match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 =>
              val pa = math.abs(up - ul); val pb = math.abs(left - ul)
              val pc = math.abs(left + up - 2 * ul)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          }
          out.write((row(i) - pred) & 0xff)
          i += 1
        }
        System.arraycopy(row, 0, prev, 0, cols)
      }
      out.toByteArray
    }
    for (tag <- Seq(0, 1, 2, 3, 4)) {
      val payload = deflate(pngEncode(cs, tag))
      val doc = (s"%PDF-1.4\n4 0 obj << /Length ${payload.length} /Filter /FlateDecode " +
        s"/DecodeParms << /Predictor ${10 + tag} /Columns $cols >> >>\nstream\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ payload ++
        "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n".getBytes(StandardCharsets.ISO_8859_1)
      assert(PdfText.extract(doc).contains("predicted text flows"), s"tag $tag: ${PdfText.extract(doc)}")
    }
    // TIFF predictor 2: byte-wise horizontal differencing per row
    val tiffEnc = {
      val padded = cs ++ Array.fill[Byte]((cols - cs.length % cols) % cols)(' ')
      padded.grouped(cols).flatMap { row =>
        row.zipWithIndex.map { case (b, i) => if (i == 0) b else ((b - row(i - 1)) & 0xff).toByte }
      }.toArray
    }
    val tiffPayload = deflate(tiffEnc)
    val tiffDoc = (s"%PDF-1.4\n4 0 obj << /Length ${tiffPayload.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 2 /Columns $cols >> >>\nstream\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ tiffPayload ++
      "\nendstream\n%%EOF\n".getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(tiffDoc).contains("predicted text flows"), PdfText.extract(tiffDoc))
    // hostile: bad tags / truncated rows / absurd params never throw
    PdfText.applyPredictor(Array[Byte](9, 1, 2, 3), 10, cols, 1, 8)
    PdfText.applyPredictor(Array[Byte](2), 12, 1 << 30, 1, 8)
    PdfText.applyPredictor(Array.empty[Byte], 15, 4, 3, 8)
    PdfText.applyPredictor(Array[Byte](1, 2, 3), 2, 4, 1, 16)
  }

  // ---- LZW / ASCII85 / chained filters (round-3: public-spec decoders) ----

  private def pdfWith(payload: Array[Byte], filter: String): Array[Byte] = {
    val head = s"%PDF-1.4\n4 0 obj << /Length ${payload.length}$filter >>\nstream\n"
      .getBytes(StandardCharsets.ISO_8859_1)
    val tail = "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
      .getBytes(StandardCharsets.ISO_8859_1)
    head ++ payload ++ tail
  }

  /** Test-side TIFF/PDF LZW encoder (early change), the inverse twin of
    * PdfText.lzwDecode — round-trips below prove the pair agree bit-for-bit.
    */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    (0 until 256).foreach(i => dict(Seq(i.toByte)) = i)
    var next = 258
    emit(256) // leading clear, as PDF encoders emit
    var cur = Vector.empty[Byte]
    for (b <- data) {
      val cand = cur :+ b
      if (dict.contains(cand)) cur = cand
      else {
        emit(dict(cur))
        if (next < 4096) { dict(cand) = next; next += 1 }
        if (width < 12 && next >= (1 << width)) width += 1 // early change
        cur = Vector(b)
      }
    }
    if (cur.nonEmpty) emit(dict(cur))
    emit(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  private def a85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= data.length) {
      var v = 0L
      for (j <- 0 until 4) v = (v << 8) | (data(i + j) & 0xffL)
      if (v == 0) sb.append('z')
      else {
        val g = new Array[Char](5)
        var x = v
        for (j <- 4 to 0 by -1) { g(j) = ('!' + (x % 85)).toChar; x /= 85 }
        sb.appendAll(g)
      }
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var v = 0L
      for (j <- 0 until 4) v = (v << 8) | (if (i + j < data.length) data(i + j) & 0xffL else 0L)
      val g = new Array[Char](5)
      var x = v
      for (j <- 4 to 0 by -1) { g(j) = ('!' + (x % 85)).toChar; x /= 85 }
      sb.appendAll(g.take(rem + 1))
    }
    sb.append("~>")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  test("lzw decoder matches the PDF spec worked example") {
    // ISO 32000-1 §7.4.4.2: encoding of (decimal) 45 45 45 45 45 65 45 45 45 66
    val encoded = Array(0x80, 0x0b, 0x60, 0x50, 0x22, 0x0c, 0x0c, 0x85, 0x01).map(_.toByte)
    val expected = Array[Byte](45, 45, 45, 45, 45, 65, 45, 45, 45, 66)
    assert(graft.sources.unstructured.PdfText.lzwDecode(encoded).get.toSeq == expected.toSeq)
  }

  test("lzw and ascii85 round-trip arbitrary data") {
    import graft.sources.unstructured.PdfText
    val rnd = new scala.util.Random(11)
    val cases = Seq(
      Array.empty[Byte],
      "a tiny text".getBytes,
      Array.fill(5000)(('a' + rnd.nextInt(4)).toByte), // repetitive -> deep LZW table
      Array.fill(3000)(rnd.nextInt(256).toByte),        // incompressible
      Array.fill(700)(0.toByte))                        // zeros -> a85 'z' groups
    for (c <- cases) {
      assert(PdfText.lzwDecode(lzwEncode(c)).get.toSeq == c.toSeq, s"lzw len=${c.length}")
      assert(PdfText.ascii85Decode(a85Encode(c)).get.toSeq == c.toSeq, s"a85 len=${c.length}")
    }
    // table-growth stress across the 9->10->11 bit boundaries (many unique pairs)
    val big = (0 until 3000).flatMap(i => Seq((i % 251).toByte, (i * 7 % 241).toByte)).toArray
    assert(PdfText.lzwDecode(lzwEncode(big)).get.toSeq == big.toSeq)
  }

  test("pdf extraction through LZW, ASCII85 and chained filters") {
    import graft.sources.unstructured.PdfText
    val cs = "BT (LZW and friends speak) Tj 0 -14 Td (two lines) Tj ET"
    val raw = cs.getBytes(StandardCharsets.ISO_8859_1)
    def deflate(d: Array[Byte]): Array[Byte] = {
      val df = new java.util.zip.Deflater(); df.setInput(d); df.finish()
      val out = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](4096)
      while (!df.finished()) out.write(buf, 0, df.deflate(buf))
      out.toByteArray
    }
    val fixtures = Seq(
      "lzw.pdf" -> pdfWith(lzwEncode(raw), " /Filter /LZWDecode"),
      "a85.pdf" -> pdfWith(a85Encode(raw), " /Filter /ASCII85Decode"),
      "hex.pdf" -> pdfWith((raw.map(b => f"${b & 0xff}%02x").mkString + ">")
        .getBytes(StandardCharsets.ISO_8859_1), " /Filter /ASCIIHexDecode"),
      // chain: decode order is array order, so encode applies them in reverse
      "chain.pdf" -> pdfWith(a85Encode(deflate(raw)),
        " /Filter [/ASCII85Decode /FlateDecode]"),
      "chain2.pdf" -> pdfWith(a85Encode(lzwEncode(raw)),
        " /Filter [/ASCII85Decode /LZWDecode]"))
    for ((name, bytes) <- fixtures) {
      val text = PdfText.extract(bytes)
      assert(text.contains("LZW and friends speak"), s"$name: '$text'")
      assert(text.contains("two lines"), s"$name: '$text'")
    }
    // and through the SQL scan path
    val pdfDir = Files.createTempDirectory("graft-pdf-filters").toString
    fixtures.foreach { case (name, bytes) => Files.write(Paths.get(pdfDir, name), bytes) }
    spark.sql(
      s"REGISTER OR REPLACE PDF DATASOURCE pdff OPTIONS (path '$pdfDir') NAMESPACE graft.datasource.un")
    val rows = spark.sql(
      "SELECT path, textcontent FROM graft.datasource.un.pdff.content")
      .collect().map(r => r.getString(0).split('/').last -> r.getString(1)).toMap
    for (name <- fixtures.map(_._1)) {
      assert(rows(name).contains("LZW and friends speak"), s"$name: ${rows(name)}")
      assert(!rows(name).contains("obj"), s"$name fell back to heuristic")
    }
  }

  test("pdf hex strings decode: simple fonts and CID via ToUnicode CMap") {
    import graft.sources.unstructured.PdfText
    // 1. single-byte hex string, no CMap -> Latin-1
    val simple = pdfWith("BT <48656C6C6F20686578> Tj ET".getBytes(StandardCharsets.ISO_8859_1), "")
    assert(PdfText.extract(simple).contains("Hello hex"))

    // 2. CID font: 2-byte codes resolved through an embedded ToUnicode CMap
    //    (bfchar singles, a bfrange run, and a multi-char ligature target)
    val cmapBody =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |3 beginbfchar
        |<0001> <0048>
        |<0002> <0065>
        |<0003> <00660066>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <006C>
        |endbfrange
        |endcmap
        |endcmap CMapName currentdict /CMap defineresource pop end end""".stripMargin
    val content = "BT <00010002001000100012> Tj 0 -14 Td <0003> Tj ET"
    val doc = {
      val cmapStream = (s"5 0 obj << /Length ${cmapBody.length} >>\nstream\n" + cmapBody +
        "\nendstream\nendobj\n").getBytes(StandardCharsets.ISO_8859_1)
      val page = pdfWith(content.getBytes(StandardCharsets.ISO_8859_1), "")
      // splice the CMap object before the page stream object
      val head = "%PDF-1.4\n".getBytes(StandardCharsets.ISO_8859_1)
      head ++ cmapStream ++ page.drop(head.length)
    }
    val text = PdfText.extract(doc)
    assert(text.contains("Helln"), s"CID decode failed: '$text'") // H e l l n
    assert(text.contains("ff"), s"ligature target failed: '$text'")
    // CMap syntax must not leak into the extracted text
    assert(!text.contains("bfchar") && !text.contains("begincmap"), s"leak: '$text'")
  }

  test("per-font ToUnicode binding: conflicting CMaps resolve by the active Tf font") {
    import graft.sources.unstructured.PdfText
    // two fonts whose ToUnicode maps CONFLICT on code 0x41 (F1: X, F2: Y);
    // 0x42 -> Z exists only in F1, so the document-wide merge keeps it for
    // the pre-Tf fallback and for unbound font names
    def cmapObj(num: Int, entries: String): String = {
      val body = s"begincmap\n${entries}\nendcmap"
      s"$num 0 obj << /Length ${body.length} >>\nstream\n$body\nendstream\nendobj\n"
    }
    val c5 = cmapObj(5, "2 beginbfchar\n<41> <0058>\n<42> <005A>\nendbfchar")
    val c6 = cmapObj(6, "1 beginbfchar\n<41> <0059>\nendbfchar")
    val fonts =
      "7 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 5 0 R >> endobj\n" +
      "8 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >> endobj\n"
    val page = "3 0 obj << /Resources << /Font << /F1 7 0 R /F2 8 0 R >> >> >> endobj\n"
    // pre-Tf <42> uses the merge (Z); then F1 makes <41> X; F2 makes it Y;
    // unbound /F9 falls back to the merge, where <42> is still Z
    val content = "BT <42> Tj /F1 12 Tf <41> Tj /F2 12 Tf <41> Tj /F9 9 Tf <42> Tj ET"
    val doc = ("%PDF-1.4\n" + page + c5 + c6 + fonts +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val text = PdfText.extract(doc)
    assert(text == "ZXYZ", s"per-font dispatch failed: '$text'")
  }

  test("per-font binding resolves font dicts packed inside an ObjStm") {
    import graft.sources.unstructured.PdfText
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    val cbody = "begincmap\n1 beginbfchar\n<41> <0057>\nendbfchar\nendcmap" // 0x41 -> W
    val c5 = s"5 0 obj << /Length ${cbody.length} >>\nstream\n$cbody\nendstream\nendobj\n"
    // the FONT DICT lives packed in an object stream (PDF 1.5 style)
    val packedBody = "7 0\n<< /Type /Font /ToUnicode 5 0 R >>"
    val packed = deflate(packedBody.getBytes(StandardCharsets.ISO_8859_1))
    val objStm = (s"9 0 obj << /Type /ObjStm /N 1 /First 4 /Filter /FlateDecode " +
      s"/Length ${packed.length} >>\nstream\n").getBytes(StandardCharsets.ISO_8859_1) ++
      packed ++ "\nendstream endobj\n".getBytes(StandardCharsets.ISO_8859_1)
    val page = "3 0 obj << /Resources << /Font << /F1 7 0 R >> >> >> endobj\n"
    val content = "BT /F1 12 Tf <41> Tj ET"
    val doc = ("%PDF-1.5\n" + page + c5).getBytes(StandardCharsets.ISO_8859_1) ++ objStm ++
      (s"4 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
        "trailer << /Root 1 0 R >>\n%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val text = PdfText.extract(doc)
    assert(text == "W", s"ObjStm-packed font binding failed: '$text'")
  }

  test("parseCMap handles bfchar, bfrange and array destinations") {
    import graft.sources.unstructured.PdfText
    val m = PdfText.parseCMap(
      """2 beginbfchar
        |<01> <0041>
        |<0102> <0042>
        |endbfchar
        |1 beginbfrange
        |<0200> <0202> [<0058> <0059> <005A>]
        |endbfrange""".stripMargin)
    assert(m.one(0x01) == "A")
    assert(m.two(0x0102) == "B")
    assert(m.two(0x0200) == "X" && m.two(0x0201) == "Y" && m.two(0x0202) == "Z")
  }

  test("maxBytes option caps per-file content reads") {
    val capDir = Files.createTempDirectory("graft-cap").toString
    Files.writeString(Paths.get(capDir, "big.txt"), "0123456789" * 100) // 1000 bytes
    Files.writeString(Paths.get(capDir, "small.txt"), "tiny")
    spark.sql(
      s"REGISTER OR REPLACE TEXT DATASOURCE capped OPTIONS (path '$capDir', maxBytes '16') NAMESPACE graft.datasource.un")
    val rows = spark.sql(
      "SELECT path, textcontent FROM graft.datasource.un.capped.content ORDER BY path")
      .collect().map(r => r.getString(0).split('/').last -> r.getString(1)).toMap
    assert(rows("big.txt") == "0123456789012345") // first 16 bytes only
    assert(rows("small.txt") == "tiny") // under the cap: full content
    // metadata still reports the true on-disk size
    val size = spark.sql(
      "SELECT sizeinbytes FROM graft.datasource.un.capped.capped WHERE path LIKE '%big.txt'")
      .head().getLong(0)
    assert(size == 1000L)
  }

  /** Minimal ISO-BMFF file: ftyp + moov(mvhd v0 + trak(tkhd v0)). */
  private def minimalMp4(timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val size = payload.length + 8
      val out = java.nio.ByteBuffer.allocate(size)
      out.putInt(size).put(typ.getBytes(StandardCharsets.ISO_8859_1)).put(payload)
      out.array()
    }
    val mvhd = new Array[Byte](100)
    java.nio.ByteBuffer.wrap(mvhd).putInt(12, timescale).putInt(16, duration)
    val tkhd = new Array[Byte](84)
    java.nio.ByteBuffer.wrap(tkhd).putInt(76, w << 16).putInt(80, h << 16)
    box("ftyp", "isom".getBytes ++ new Array[Byte](4)) ++
      box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
  }

  test("video metadata: mp4 duration and dimensions from box parsing") {
    val vidDir = Files.createTempDirectory("graft-video").toString
    Files.write(Paths.get(vidDir, "clip.mp4"), minimalMp4(1000, 5000, 640, 360))
    Files.write(Paths.get(vidDir, "junk.avi"), "not an mp4 at all".getBytes)
    spark.sql(
      s"REGISTER OR REPLACE VIDEO DATASOURCE vids OPTIONS (path '$vidDir') NAMESPACE graft.datasource.un")
    val rows = spark.sql(
      "SELECT path, format, duration, width, height FROM graft.datasource.un.vids.vids ORDER BY path")
      .collect()
    val mp4 = rows.find(_.getString(0).endsWith("clip.mp4")).get
    assert(mp4.getString(1) == "MP4")
    assert(mp4.getLong(2) == 5000L) // 5000 ticks / 1000 ticks-per-sec = 5000 ms
    assert(mp4.getInt(3) == 640 && mp4.getInt(4) == 360)
    val avi = rows.find(_.getString(0).endsWith("junk.avi")).get
    assert(avi.getString(1) == "AVI")
    assert(avi.isNullAt(2) && avi.isNullAt(3) && avi.isNullAt(4)) // unparseable -> nulls
  }

  // ---- AVI / MKV header probes (round-3) ----

  private def minimalAvi(usPerFrame: Long, frames: Long, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = { out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt) }
    def cc(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    // avih payload: 56 bytes (MainAVIHeader)
    val avih = new java.io.ByteArrayOutputStream()
    def avLe32(v: Long): Unit = { avih.write((v & 0xff).toInt); avih.write(((v >> 8) & 0xff).toInt)
      avih.write(((v >> 16) & 0xff).toInt); avih.write(((v >> 24) & 0xff).toInt) }
    avLe32(usPerFrame); avLe32(0); avLe32(0); avLe32(0)
    avLe32(frames); avLe32(0); avLe32(1); avLe32(0)
    avLe32(w); avLe32(h); avLe32(0); avLe32(0); avLe32(0); avLe32(0)
    val avihBytes = avih.toByteArray
    val hdrlSize = 4 + 8 + avihBytes.length // "hdrl" + avih chunk header + payload
    val riffSize = 4 + 8 + hdrlSize         // "AVI " + LIST header + list body
    cc("RIFF"); le32(riffSize); cc("AVI ")
    cc("LIST"); le32(hdrlSize); cc("hdrl")
    cc("avih"); le32(avihBytes.length); out.write(avihBytes)
    out.toByteArray
  }

  private def minimalMkv(durationTicks: Float, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
    def f32(v: Float): Unit = { val bits = java.lang.Float.floatToIntBits(v)
      b(bits >>> 24, bits >>> 16, bits >>> 8, bits) }
    // EBML header (empty body)
    b(0x1A, 0x45, 0xDF, 0xA3, 0x80)
    // build Segment body first to know its size
    val seg = new java.io.ByteArrayOutputStream()
    def sb(vs: Int*): Unit = vs.foreach(v => seg.write(v & 0xff))
    // Info { TimestampScale = 1000000 (3-byte uint), Duration = float32 }
    val tsBytes = Seq(0x0F, 0x42, 0x40) // 1,000,000
    val infoBody = 3 + 1 + tsBytes.length + 2 + 1 + 4 // 2AD7B1 sz ts + 4489 sz f32
    sb(0x15, 0x49, 0xA9, 0x66, 0x80 | infoBody)
    sb(0x2A, 0xD7, 0xB1, 0x80 | tsBytes.length); tsBytes.foreach(v => seg.write(v))
    sb(0x44, 0x89, 0x80 | 4)
    val durBits = java.lang.Float.floatToIntBits(durationTicks)
    sb(durBits >>> 24, durBits >>> 16, durBits >>> 8, durBits)
    // Tracks { TrackEntry { Video { PixelWidth, PixelHeight } } }, 2-byte uints
    def u16(v: Int): Seq[Int] = Seq((v >> 8) & 0xff, v & 0xff)
    val vB = Seq(0xB0, 0x80 | 2) ++ u16(w) ++ Seq(0xBA, 0x80 | 2) ++ u16(h)
    val teB = Seq(0xE0, 0x80 | vB.length) ++ vB
    val trB = Seq(0xAE, 0x80 | teB.length) ++ teB
    sb(0x16, 0x54, 0xAE, 0x6B, 0x80 | trB.length); trB.foreach(v => seg.write(v))
    val segBytes = seg.toByteArray
    // Segment with unknown size (streamed shape: 0xFF = all-ones 1-byte size)
    b(0x18, 0x53, 0x80, 0x67, 0xFF)
    out.write(segBytes)
    out.toByteArray
  }

  test("video metadata: avi and mkv/webm header probes") {
    import graft.sources.unstructured.VideoContainers
    val avi = VideoContainers.parse(minimalAvi(40000L, 250L, 720, 480))
    assert(avi.durationMs.contains(10000L)) // 250 frames at 25 fps
    assert(avi.width.contains(720) && avi.height.contains(480))
    val mkv = VideoContainers.parse(minimalMkv(12345.0f, 1920, 1080))
    assert(mkv.durationMs.contains(12345L)) // ticks at 1ms scale
    assert(mkv.width.contains(1920) && mkv.height.contains(1080))
    // and through the SQL scan path
    val vidDir = Files.createTempDirectory("graft-video3").toString
    Files.write(Paths.get(vidDir, "a.avi"), minimalAvi(40000L, 250L, 720, 480))
    Files.write(Paths.get(vidDir, "b.mkv"), minimalMkv(60000.0f, 1280, 720))
    spark.sql(
      s"REGISTER OR REPLACE VIDEO DATASOURCE vids3 OPTIONS (path '$vidDir') NAMESPACE graft.datasource.un")
    val rows = spark.sql(
      "SELECT path, format, duration, width, height FROM graft.datasource.un.vids3.vids3 ORDER BY path")
      .collect().map(r => r.getString(0).split('/').last -> r).toMap
    assert(rows("a.avi").getLong(2) == 10000L && rows("a.avi").getInt(3) == 720)
    assert(rows("b.mkv").getLong(2) == 60000L && rows("b.mkv").getInt(4) == 720)
  }

  test("image metadata: dimensions + png thumbnail") {
    val r = spark.sql(
      "SELECT width, height, imagethumbnail FROM graft.datasource.un.pics.pics WHERE path LIKE '%pic.png'")
      .head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 3)
    val thumb = r.getAs[Array[Byte]](2)
    assert(thumb != null && thumb.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
  }

  test("write sink: INSERT-equivalent file write + image auto-thumbnail") {
    import graft.sources.unstructured.UnstructuredWrite
    val outDir = Files.createTempDirectory("graft-un-write").toString
    val content = spark.sql("SELECT path, textcontent AS content FROM graft.datasource.un.notes.content")
    UnstructuredWrite.writeFiles(content, outDir)
    assert(Files.readString(Paths.get(outDir, "a.txt")) == "hello graft one")
    assert(Files.readString(Paths.get(outDir, "b.txt")) == "second file with more words inside")
    // image write produces a _thumbnail sibling (reference: BinOutputWriter.scala:79-116)
    val pics = spark.sql("SELECT path, imagecontent AS content FROM graft.datasource.un.pics.content")
    UnstructuredWrite.writeFiles(pics, outDir, thumbnails = true)
    assert(Files.exists(Paths.get(outDir, "pic.png")))
    assert(Files.exists(Paths.get(outDir, "pic_thumbnail.png")))
  }

  test("SQL INSERT INTO content table writes files to the datasource dir") {
    val sinkDir = Files.createTempDirectory("graft-un-insert").toString
    spark.sql(
      s"REGISTER OR REPLACE TEXT DATASOURCE sink OPTIONS (path '$sinkDir') NAMESPACE graft.datasource.un")
    spark.sql(
      """INSERT INTO graft.datasource.un.sink.content
        |SELECT 'gen1.txt' AS path, 'generated one' AS textcontent
        |UNION ALL SELECT 'gen2.txt', 'generated two'""".stripMargin)
    assert(Files.readString(Paths.get(sinkDir, "gen1.txt")) == "generated one")
    assert(Files.readString(Paths.get(sinkDir, "gen2.txt")) == "generated two")
    // and the files are immediately readable back through the same table
    val n = spark.sql("SELECT COUNT(*) FROM graft.datasource.un.sink.sink").head().getLong(0)
    assert(n == 2)
  }

  test("tag sidecar update round-trips through the metadata table") {
    import graft.sources.unstructured.UnstructuredWrite
    import org.apache.spark.sql.functions.{col, lit}
    val tags = spark.sql("SELECT path FROM graft.datasource.un.notes.notes WHERE path LIKE '%a.txt'")
      .select(col("path"), lit("turing").as("author"), lit(3).as("stars"))
    UnstructuredWrite.writeTagSidecars(tags)
    val r = spark.sql(
      "SELECT author, stars FROM graft.datasource.un.notes.notes WHERE path LIKE '%a.txt'").head()
    assert(r.getString(0) == "turing" && r.getInt(1) == 3)
  }

  test("time travel rejects non-iceberg datasources with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.datasource.un.notes.notes VERSION AS OF 1").collect()
    }
    assert(e.getMessage.contains("Iceberg") || e.getMessage.contains("time travel"),
      s"unexpected: ${e.getMessage}")
  }

  test("filter on metadata does not require reading content") {
    val df = spark.sql(
      "SELECT path FROM graft.datasource.un.notes.notes WHERE sizeinbytes > 20")
    assert(df.collect().map(_.getString(0)).exists(_.endsWith("b.txt")))
  }

  test("projection pruning skips thumbnail decode entirely") {
    import graft.sources.unstructured.ContentExtractor
    val before = ContentExtractor.decodeCalls.get()
    // path-only projection: the thumbnail/dims UDF columns are pruned from
    // the inner program before execution
    spark.sql("SELECT path, sizeinbytes FROM graft.datasource.un.pics.pics").collect()
    assert(ContentExtractor.decodeCalls.get() == before,
      "thumbnail decode ran for a metadata-only projection")
    spark.sql("SELECT imagethumbnail FROM graft.datasource.un.pics.pics").collect()
    assert(ContentExtractor.decodeCalls.get() > before)
  }

  test("parts_scan: hive-style partition dirs become columns") {
    val pdir = Files.createTempDirectory("graft-parts").toString
    Files.createDirectories(Paths.get(pdir, "ct=news"))
    Files.createDirectories(Paths.get(pdir, "ct=blog"))
    Files.writeString(Paths.get(pdir, "ct=news", "n1.txt"), "breaking story")
    Files.writeString(Paths.get(pdir, "ct=blog", "b1.txt"), "opinion piece")
    spark.sql(
      s"""REGISTER OR REPLACE TEXT DATASOURCE parts OPTIONS (path '$pdir', scanType 'parts_scan')
         |NAMESPACE graft.datasource.un""".stripMargin)
    val rows = spark.sql(
      "SELECT path, ct FROM graft.datasource.un.parts.parts ORDER BY path").collect()
    assert(rows.length == 2)
    assert(rows.exists(r => r.getString(0).endsWith("n1.txt") && r.getString(1) == "news"))
    assert(rows.exists(r => r.getString(0).endsWith("b1.txt") && r.getString(1) == "blog"))
    // partition pruning: filter on the partition column
    val pruned = spark.sql(
      "SELECT path FROM graft.datasource.un.parts.parts WHERE ct = 'news'").collect()
    assert(pruned.length == 1 && pruned.head.getString(0).endsWith("n1.txt"))
  }
}
