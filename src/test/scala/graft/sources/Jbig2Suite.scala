package graft.sources.unstructured

import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 generic-region decoding, pinned by a structurally independent MQ
  * ENCODER written from T.88 Annex E's encoder-side flowcharts (the
  * decoder implements only the decoder-side ones): random and structured
  * bitmaps roundtrip through every template, with and without TPGDON,
  * with nominal and moved adaptive pixels, and through the MMR (T.6)
  * coding option via [[CcittDecode.encodeG4]]. Page composition (origin
  * placement, OR combination, default pixel value) is asserted on
  * multi-segment streams.
  */
class Jbig2Suite extends AnyFunSuite {

  // ---- test-side MQ encoder (T.88 E.3.5-E.3.9, software conventions) ----
  private final class MqEncoder {
    private val buf = scala.collection.mutable.ArrayBuffer[Int](0) // sentinel
    private var bp = 0
    private var c = 0L
    private var a = 0x8000
    private var ct = 12

    private def append(v: Int): Unit = { buf += (v & 0xff); bp = buf.length - 1 }

    private def byteOut(): Unit = {
      if (buf(bp) == 0xff) {
        append((c >>> 20).toInt); c &= 0xfffff; ct = 7
      } else if (c >= 0x8000000L) {
        buf(bp) += 1
        if (buf(bp) == 0xff) { c &= 0x7ffffff; append((c >>> 20).toInt); c &= 0xfffff; ct = 7 }
        else { append((c >>> 19).toInt); c &= 0x7ffff; ct = 8 }
      } else { append((c >>> 19).toInt); c &= 0x7ffff; ct = 8 }
    }

    private def renorm(): Unit = {
      while ({
        if (ct == 0) byteOut()
        a <<= 1; c = (c << 1) & 0xfffffffL; ct -= 1
        (a & 0x8000) == 0
      }) ()
    }

    def encode(cxs: Array[Int], label: Int, bit: Int): Unit = {
      var i = cxs(label) >>> 1
      var mps = cxs(label) & 1
      val qe = Jbig2Decode.Qe(i)
      if (bit == mps) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          i = Jbig2Decode.Nmps(i)
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Jbig2Decode.SwitchFlag(i) == 1) mps = 1 - mps
        i = Jbig2Decode.Nlps(i)
        renorm()
      }
      cxs(label) = (i << 1) | mps
    }

    def flush(): Array[Byte] = {
      // SETBITS: largest C with trailing 1s still below C + A
      val lim = c + a
      c |= 0xffff
      if (c >= lim) c -= 0x8000
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      if (buf(bp) != 0xff) append(0xff)
      append(0xac)
      (if (buf.head == 0) buf.drop(1) else buf.toSeq).map(_.toByte).toArray
    }
  }

  /** Encoder twin of [[Jbig2Decode.genericInto]]: shared encoder + contexts. */
  private def encodeGenericInto(enc: MqEncoder, cxs: Array[Int], bits: Array[Byte],
      w: Int, h: Int, template: Int, tpgdon: Boolean, at: Array[(Int, Int)]): Unit = {
    val slots = Jbig2Decode.templateSlots(template, at)
    var ltp = false
    var y = 0
    while (y < h) {
      val sameAsPrev = y > 0 &&
        (0 until w).forall(x => bits(y * w + x) == bits((y - 1) * w + x))
      if (tpgdon) {
        val want = sameAsPrev // copy rows whenever possible
        val sltp = if (want != ltp) 1 else 0
        enc.encode(cxs, Jbig2Decode.TpgdContext(template), sltp)
        if (sltp == 1) ltp = !ltp
      }
      if (!(tpgdon && ltp)) {
        var x = 0
        while (x < w) {
          var label = 0
          slots.foreach { case (dx, dy) =>
            val xx = x + dx; val yy = y + dy
            val bit = if (xx < 0 || xx >= w || yy < 0) 0 else bits(yy * w + xx).toInt
            label = (label << 1) | bit
          }
          enc.encode(cxs, label, bits(y * w + x).toInt)
          x += 1
        }
      }
      y += 1
    }
  }

  private def encodeGenericMq(bits: Array[Byte], w: Int, h: Int, template: Int,
      tpgdon: Boolean, at: Array[(Int, Int)]): Array[Byte] = {
    val cxs = new Array[Int](1 << Jbig2Decode.templateSlots(template, at).length)
    val enc = new MqEncoder
    encodeGenericInto(enc, cxs, bits, w, h, template, tpgdon, at)
    enc.flush()
  }

  // ---- encoder twins of Annex A integer / IAID decoding ----
  private def encInt(enc: MqEncoder, ctx: Jbig2Decode.IntCtx, value: Int): Unit = {
    var prev = 1
    def bit(b: Int): Unit = {
      enc.encode(ctx.cx, prev, b)
      prev = if (prev < 256) (prev << 1) | b else ((((prev << 1) | b) & 511) | 256)
    }
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >>> i) & 1); i -= 1 }
    }
    bit(if (value < 0) 1 else 0)
    val v = math.abs(value)
    if (v < 4) { bit(0); write(v, 2) }
    else if (v < 20) { bit(1); bit(0); write(v - 4, 4) }
    else if (v < 84) { bit(1); bit(1); bit(0); write(v - 20, 6) }
    else if (v < 340) { bit(1); bit(1); bit(1); bit(0); write(v - 84, 8) }
    else if (v < 4436) { bit(1); bit(1); bit(1); bit(1); bit(0); write(v - 340, 12) }
    else { (1 to 5).foreach(_ => bit(1)); write(v - 4436, 32) }
  }

  private def encOob(enc: MqEncoder, ctx: Jbig2Decode.IntCtx): Unit = {
    var prev = 1
    def bit(b: Int): Unit = {
      enc.encode(ctx.cx, prev, b)
      prev = if (prev < 256) (prev << 1) | b else ((((prev << 1) | b) & 511) | 256)
    }
    bit(1); bit(0); bit(0); bit(0) // S=1, 2-bit bucket, V=0 -> OOB
  }

  private def encIaid(enc: MqEncoder, cx: Array[Int], codeLen: Int, id: Int): Unit = {
    var prev = 1
    var i = codeLen - 1
    val v = id | (1 << codeLen)
    while (i >= 0) {
      val b = (v >>> i) & 1
      enc.encode(cx, prev, b)
      prev = (prev << 1) | b
      i -= 1
    }
  }

  /** Symbol-dictionary segment DATA (arithmetic, no refinement): symbols
    * MUST arrive sorted by ascending height; all new symbols export.
    */
  private def encodeSymbolDict(syms: Seq[Jbig2Decode.Bitmap], template: Int): Array[Byte] = {
    val at = Jbig2Decode.nominalAt(template)
    val enc = new MqEncoder
    val iadh = new Jbig2Decode.IntCtx
    val iadw = new Jbig2Decode.IntCtx
    val iaex = new Jbig2Decode.IntCtx
    val genCx = new Array[Int](1 << Jbig2Decode.templateSlots(template, at).length)
    var hcHeight = 0
    syms.groupBy(_.h).toSeq.sortBy(_._1).foreach { case (h, group) =>
      encInt(enc, iadh, h - hcHeight); hcHeight = h
      var symWidth = 0
      group.foreach { bm =>
        encInt(enc, iadw, bm.w - symWidth); symWidth = bm.w
        encodeGenericInto(enc, genCx, bm.bits, bm.w, bm.h, template, tpgdon = false, at)
      }
      encOob(enc, iadw)
    }
    encInt(enc, iaex, 0) // skip-run 0
    encInt(enc, iaex, syms.size) // export every new symbol
    val body = enc.flush()
    val flags = template << 10
    val nAt = if (template == 0) 4 else 1
    Array(((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++
      (0 until nAt).flatMap(k => Seq(at(k)._1.toByte, at(k)._2.toByte)) ++
      be32(syms.size.toLong) ++ be32(syms.size.toLong) ++ body
  }

  /** Text-region segment DATA (after the 17-byte region info): SBSTRIPS=1,
    * instances = (s, t, symbol id) placed with `refCorner`, optional
    * transposition, OR composition.
    */
  private def encodeTextRegion(instances: Seq[(Int, Int, Int)],
      syms: Seq[Jbig2Decode.Bitmap], refCorner: Int,
      transposed: Boolean = false): Array[Byte] = {
    val enc = new MqEncoder
    val iadt = new Jbig2Decode.IntCtx
    val iafs = new Jbig2Decode.IntCtx
    val iads = new Jbig2Decode.IntCtx
    val codeLen = Jbig2Decode.symCodeLen(syms.size)
    val iaid = new Array[Int](1 << (codeLen + 1))
    encInt(enc, iadt, 0) // STRIPT starts at 0
    var stripT = 0
    var firstS = 0
    instances.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (t, insts) =>
      encInt(enc, iadt, t - stripT); stripT = t
      var curS = 0
      var first = true
      insts.sortBy(_._1).foreach { case (s, _, id) =>
        if (first) { encInt(enc, iafs, s - firstS); firstS = s; curS = s; first = false }
        else { encInt(enc, iads, s - curS); curS = s }
        encIaid(enc, iaid, codeLen, id)
        curS += (if (transposed) syms(id).h else syms(id).w) - 1
      }
      encOob(enc, iads)
    }
    val body = enc.flush()
    val flags = (refCorner << 4) | (if (transposed) 1 << 6 else 0)
    Array(((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++
      be32(instances.size.toLong) ++ body
  }

  private def structured(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      b(y * w + x) =
        (if ((x / 4 + y / 3) % 2 == 0 || x == y) 1 else 0).toByte
    b
  }

  private def noisy(w: Int, h: Int, seed: Int, density: Double): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(w * h)((if (rnd.nextDouble() < density) 1 else 0).toByte)
  }

  test("MQ generic regions roundtrip: all templates, TPGDON on/off, moved AT pixels") {
    val cases = Seq(
      (structured(37, 23), 37, 23),
      (noisy(64, 16, 7, 0.5), 64, 16),
      (noisy(33, 40, 11, 0.05), 33, 40), // sparse: long MPS runs
      (Array.fill[Byte](20 * 9)(1), 20, 9), // solid black
      (new Array[Byte](20 * 9), 20, 9)) // solid white
    for ((bits, w, h) <- cases; template <- 0 to 3; tpgdon <- Seq(false, true)) {
      val at = Jbig2Decode.nominalAt(template)
      val coded = encodeGenericMq(bits, w, h, template, tpgdon, at)
      val got = Jbig2Decode.decodeGenericMq(coded, 0, coded.length, w, h,
        template, tpgdon, at)
      assert(java.util.Arrays.equals(got, bits),
        s"roundtrip template=$template tpgdon=$tpgdon ${w}x$h")
    }
    // non-nominal adaptive pixels keep their figure SLOT, so both sides
    // must agree on the label layout with moved ATs too
    val bits = structured(31, 17)
    val movedT0 = Array((5, -1), (-5, -1), (4, -2), (-4, -2))
    val c0 = encodeGenericMq(bits, 31, 17, 0, false, movedT0)
    assert(java.util.Arrays.equals(
      Jbig2Decode.decodeGenericMq(c0, 0, c0.length, 31, 17, 0, false, movedT0), bits))
    val movedT2 = Array((-4, -1))
    val c2 = encodeGenericMq(bits, 31, 17, 2, true, movedT2)
    assert(java.util.Arrays.equals(
      Jbig2Decode.decodeGenericMq(c2, 0, c2.length, 31, 17, 2, true, movedT2), bits))
  }

  // ---- embedded-stream builders ----
  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def segment(num: Long, segType: Int, data: Array[Byte]): Array[Byte] =
    be32(num) ++ Array(segType.toByte, 0.toByte, 1.toByte) ++
      be32(data.length.toLong) ++ data

  private def pageInfo(w: Int, h: Int, defPixel: Int = 0): Array[Byte] =
    be32(w) ++ be32(h) ++ be32(0) ++ be32(0) ++
      Array(((defPixel & 1) << 2).toByte, 0.toByte, 0.toByte)

  private def genericRegion(x: Int, y: Int, w: Int, h: Int, bits: Array[Byte],
      template: Int = 0, tpgdon: Boolean = false, mmr: Boolean = false): Array[Byte] = {
    val info = be32(w) ++ be32(h) ++ be32(x) ++ be32(y) ++ Array(0.toByte) // OR
    val flags = ((if (mmr) 1 else 0) | (template << 1) |
      (if (tpgdon) 8 else 0)).toByte
    val at = Jbig2Decode.nominalAt(template)
    val atBytes =
      if (mmr) Array.empty[Byte]
      else at.flatMap { case (dx, dy) => Array(dx.toByte, dy.toByte) }
    val coded =
      if (mmr) CcittDecode.encodeG4(
        bits.map(b => if (b != 0) 0x00.toByte else 0xff.toByte), w, h)
      else encodeGenericMq(bits, w, h, template, tpgdon, at)
    info ++ Array(flags) ++ atBytes ++ coded
  }

  test("embedded stream: page composition with two OR'd regions at offsets") {
    val r1 = structured(12, 8)
    val r2 = Array.fill[Byte](6 * 5)(1)
    val stream = segment(0, 48, pageInfo(20, 14)) ++
      segment(1, 38, genericRegion(2, 1, 12, 8, r1)) ++
      segment(2, 39, genericRegion(10, 7, 6, 5, r2, template = 2, tpgdon = true))
    val (gray, w, h) = Jbig2Decode.decodePage(stream).get
    assert(w == 20 && h == 14)
    // r1 black pixels land at +(2,1); r2 solid block at +(10,7); elsewhere white
    for (y <- 0 until h; x <- 0 until w) {
      val inR1 = x >= 2 && x < 14 && y >= 1 && y < 9 && r1((y - 1) * 12 + (x - 2)) != 0
      val inR2 = x >= 10 && x < 16 && y >= 7 && y < 12
      val expected: Byte = if (inR1 || inR2) 0x00 else 0xff.toByte
      assert(gray(y * w + x) == expected, s"pixel ($x,$y)")
    }
    // header-only dims agree with the decoded raster
    assert(Jbig2Decode.dims(stream) == Some((20, 14)))
  }

  test("MMR-coded generic regions decode through the T.6 engine") {
    val bits = structured(24, 10)
    val stream = segment(0, 48, pageInfo(24, 10)) ++
      segment(1, 38, genericRegion(0, 0, 24, 10, bits, mmr = true))
    val (gray, w, h) = Jbig2Decode.decodePage(stream).get
    assert(w == 24 && h == 10)
    for (i <- bits.indices)
      assert((gray(i) == 0x00) == (bits(i) != 0), s"pixel $i")
  }

  test("dictionary-less text regions and garbage stay None (dims fallback handles them upstream)") {
    // a text-region segment (type 6) with no referred symbol dictionary is
    // malformed — no symbols to place
    val textRegion = be32(10) ++ be32(10) ++ be32(0) ++ be32(0) ++
      Array(0.toByte) ++ Array.fill[Byte](8)(0)
    val stream = segment(0, 48, pageInfo(10, 10)) ++ segment(1, 6, textRegion)
    assert(Jbig2Decode.decodePage(stream).isEmpty)
    assert(Jbig2Decode.dims(stream) == Some((10, 10))) // dims still surface
    assert(Jbig2Decode.decodePage(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jbig2Decode.decodePage(Array.empty[Byte]).isEmpty)
    // a lying page header cannot allocate unbounded memory
    val lying = segment(0, 48, pageInfo(Int.MaxValue, Int.MaxValue)) ++
      segment(1, 38, genericRegion(0, 0, 4, 4, new Array[Byte](16)))
    assert(Jbig2Decode.decodePage(lying).isEmpty)
  }

  private def segmentR(num: Long, segType: Int, refs: Seq[Long],
      data: Array[Byte]): Array[Byte] =
    be32(num) ++ Array(segType.toByte, ((refs.size << 5) & 0xff).toByte) ++
      refs.map(_.toByte).toArray ++ Array(1.toByte) ++
      be32(data.length.toLong) ++ data

  private def glyph(rows: String*): Jbig2Decode.Bitmap = {
    val h = rows.size; val w = rows.head.length
    val bits = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) if (rows(y)(x) == '#') bits(y * w + x) = 1
    Jbig2Decode.Bitmap(w, h, bits)
  }

  private def render(w: Int, h: Int, syms: Seq[Jbig2Decode.Bitmap],
      insts: Seq[(Int, Int, Int)], refCorner: Int,
      transposed: Boolean = false): Array[Byte] = {
    val page = new Array[Byte](w * h)
    insts.foreach { case (s, t, id) =>
      val bm = syms(id)
      val (x0, y0) =
        if (!transposed) (s, if (refCorner == 0 || refCorner == 2) t - bm.h + 1 else t)
        else (if (refCorner == 0 || refCorner == 1) t else t - bm.w + 1, s)
      for (yy <- 0 until bm.h; xx <- 0 until bm.w; if bm.bits(yy * bm.w + xx) != 0) {
        val px = x0 + xx; val py = y0 + yy
        if (px >= 0 && px < w && py >= 0 && py < h) page(py * w + px) = 1
      }
    }
    page
  }

  // glyphs sorted by ascending height: decode order = input order = symbol id
  private val glyphs = Seq(
    glyph("####",
          "#..#",
          "#..#",
          "####"),
    glyph("#....",
          "#....",
          "#....",
          "#....",
          "#....",
          "#....",
          "#####"),
    glyph("#####",
          "..#..",
          "..#..",
          "..#..",
          "..#..",
          "..#..",
          "..#.."))

  test("symbol dictionary roundtrips: height classes, width deltas, export runs") {
    for (template <- Seq(0, 2)) {
      val dictData = encodeSymbolDict(glyphs, template)
      val decoded = Jbig2Decode.decodeSymbolDict(dictData, 0, dictData.length, Nil).get
      assert(decoded.size == glyphs.size)
      decoded.zip(glyphs).foreach { case (got, want) =>
        assert(got.w == want.w && got.h == want.h)
        assert(java.util.Arrays.equals(got.bits, want.bits))
      }
    }
  }

  test("text region places dictionary symbols: corners, transposition, strips") {
    val insts = Seq((2, 6, 1), (9, 6, 2), (16, 9, 0), (3, 15, 2))
    for (refCorner <- 0 to 3) {
      val trData = encodeTextRegion(insts, glyphs, refCorner)
      val got = Jbig2Decode.decodeTextRegion(trData, 0, trData.length, 30, 22, glyphs).get
      assert(java.util.Arrays.equals(got, render(30, 22, glyphs, insts, refCorner)),
        s"refCorner=$refCorner")
    }
    val trT = encodeTextRegion(insts, glyphs, 1, transposed = true)
    val gotT = Jbig2Decode.decodeTextRegion(trT, 0, trT.length, 30, 25, glyphs).get
    assert(java.util.Arrays.equals(gotT,
      render(30, 25, glyphs, insts, 1, transposed = true)), "transposed")
  }

  test("embedded stream: symbol dict + text region compose onto the page via refs") {
    val dictData = encodeSymbolDict(glyphs, 0)
    val insts = Seq((2, 3, 1), (9, 3, 2), (16, 5, 0))
    val trData = encodeTextRegion(insts, glyphs, refCorner = 1)
    val regionInfo = be32(26) ++ be32(14) ++ be32(2) ++ be32(1) ++ Array(0.toByte)
    val stream = segment(0, 48, pageInfo(30, 18)) ++
      segmentR(1, 0, Nil, dictData) ++
      segmentR(2, 6, Seq(1L), regionInfo ++ trData)
    val (gray, w, h) = Jbig2Decode.decodePage(stream).get
    assert(w == 30 && h == 18)
    val region = render(26, 14, glyphs, insts, 1)
    for (y <- 0 until h; x <- 0 until w) {
      val inRegion = x >= 2 && x < 28 && y >= 1 && y < 15 &&
        region((y - 1) * 26 + (x - 2)) != 0
      assert((gray(y * w + x) == 0x00) == inRegion, s"pixel ($x,$y)")
    }
    // a text region whose dictionary reference is missing stays None
    val orphan = segment(0, 48, pageInfo(30, 18)) ++
      segmentR(2, 6, Seq(9L), regionInfo ++ trData)
    assert(Jbig2Decode.decodePage(orphan).isEmpty)
  }

  // ---- encoder twin of generic refinement (T.88 6.3.5) ----
  private def encodeRefineInto(enc: MqEncoder, cxs: Array[Int],
      target: Array[Byte], w: Int, h: Int, template: Int, tpgron: Boolean,
      at: Array[(Int, Int)], ref: Array[Byte], refW: Int, refH: Int,
      dx: Int, dy: Int): Unit = {
    val coding =
      if (template == 0) Jbig2Decode.RefineCoding(0) :+ at(0)
      else Jbig2Decode.RefineCoding(template)
    val reference =
      if (template == 0) Jbig2Decode.RefineReference(0) :+ at(1)
      else Jbig2Decode.RefineReference(template)
    def refAt(x: Int, y: Int): Int =
      if (x < 0 || x >= refW || y < 0 || y >= refH) 0 else ref(y * refW + x).toInt
    def tgtAt(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0) 0 else target(y * w + x).toInt
    def uniform(x: Int, y: Int): Int = { // -1 = mixed, else the value
      var sum = 0
      for (j <- -1 to 1; i <- -1 to 1) sum += refAt(x - dx + i, y - dy + j)
      if (sum == 0) 0 else if (sum == 9) 1 else -1
    }
    var ltp = false
    for (y <- 0 until h) {
      if (tpgron) {
        // a row may run "typical" only when every uniform-reference pixel
        // already equals its neighbourhood value (the decoder forces them)
        val want = (0 until w).forall { x =>
          val u = uniform(x, y); u < 0 || u == target(y * w + x)
        }
        val sltp = if (want != ltp) 1 else 0
        enc.encode(cxs, Jbig2Decode.TpgrContext(template), sltp)
        if (sltp == 1) ltp = !ltp
      }
      for (x <- 0 until w; if !(ltp && uniform(x, y) >= 0)) {
        var label = 0
        coding.foreach { case (cdx, cdy) =>
          label = (label << 1) | tgtAt(x + cdx, y + cdy)
        }
        reference.foreach { case (rdx2, rdy2) =>
          label = (label << 1) | refAt(x - dx + rdx2, y - dy + rdy2)
        }
        enc.encode(cxs, label, target(y * w + x).toInt)
      }
    }
  }

  /** Immediate refinement region segment DATA (type 42): region info with
    * REPLACE, refinement flags, GRAT for template 0, MQ body refining the
    * page content under the rectangle into `target`.
    */
  private def refinementRegion(x: Int, y: Int, w: Int, h: Int,
      target: Array[Byte], ref: Array[Byte], template: Int,
      tpgron: Boolean): Array[Byte] = {
    val info = be32(w) ++ be32(h) ++ be32(x) ++ be32(y) ++ Array(4.toByte)
    val flags = (template | (if (tpgron) 2 else 0)).toByte
    val at = Array((-1, -1), (-1, -1))
    val atBytes =
      if (template == 0) at.flatMap { case (a, b) => Array(a.toByte, b.toByte) }
      else Array.empty[Byte]
    val enc = new MqEncoder
    encodeRefineInto(enc, new Array[Int](1 << 13), target, w, h, template,
      tpgron, at, ref, w, h, 0, 0)
    info ++ Array(flags) ++ atBytes ++ enc.flush()
  }

  test("immediate refinement regions refine the page: both templates, TPGRON, offset rect") {
    val (w, h) = (22, 13)
    val base = structured(w, h)
    for (template <- Seq(0, 1); tpgron <- Seq(false, true)) {
      val target = base.clone()
      Seq((3, 2), (10, 7), (21, 12), (0, 0), (15, 4)).foreach { case (x, y) =>
        target(y * w + x) = (1 - target(y * w + x)).toByte
      }
      val stream = segment(0, 48, pageInfo(w, h)) ++
        segment(1, 38, genericRegion(0, 0, w, h, base)) ++
        segment(2, 42, refinementRegion(0, 0, w, h, target, base, template, tpgron))
      val (gray, gw, gh) = Jbig2Decode.decodePage(stream).get
      assert(gw == w && gh == h)
      assert(gray.map(g => if (g == 0x00) 1 else 0).toSeq == target.map(_.toInt).toSeq,
        s"template=$template tpgron=$tpgron")
    }
    // refinement of a SUB-rectangle: the reference is the page content
    // under (x0, y0, rw, rh) produced by the earlier region
    val (x0, y0, rw, rh) = (5, 3, 9, 6)
    val sub = Array.tabulate[Byte](rw * rh)(i =>
      base((y0 + i / rw) * w + (x0 + i % rw)))
    val subT = sub.clone()
    Seq((0, 0), (4, 2), (8, 5)).foreach { case (x, y) =>
      subT(y * rw + x) = (1 - subT(y * rw + x)).toByte
    }
    val stream2 = segment(0, 48, pageInfo(w, h)) ++
      segment(1, 38, genericRegion(0, 0, w, h, base)) ++
      segment(2, 43, refinementRegion(x0, y0, rw, rh, subT, sub, 0, tpgron = true))
    val (gray2, _, _) = Jbig2Decode.decodePage(stream2).get
    for (y <- 0 until h; x <- 0 until w) {
      val expect =
        if (x >= x0 && x < x0 + rw && y >= y0 && y < y0 + rh)
          subT((y - y0) * rw + (x - x0)).toInt
        else base(y * w + x).toInt
      assert((gray2(y * w + x) == 0x00) == (expect != 0), s"pixel ($x,$y)")
    }
  }

  test("intermediate regions chain as refinement references, never composite directly") {
    val (w, h) = (18, 11)
    val base = structured(w, h)
    def flip(bits: Array[Byte], pts: (Int, Int)*): Array[Byte] = {
      val b = bits.clone()
      pts.foreach { case (x, y) => b(y * w + x) = (1 - b(y * w + x)).toByte }
      b
    }
    val step1 = flip(base, (2, 2), (9, 9))
    val step2 = flip(step1, (0, 0), (17, 10))
    // seg1: INTERMEDIATE generic (36) = base — must NOT reach the page;
    // seg2: INTERMEDIATE refinement (40) refs seg1 → step1, stored only;
    // seg3: immediate refinement (42) refs seg2 → step2, composited
    val stream = segment(0, 48, pageInfo(w, h)) ++
      segmentR(1, 36, Nil, genericRegion(0, 0, w, h, base)) ++
      segmentR(2, 40, Seq(1L),
        refinementRegion(0, 0, w, h, step1, base, 0, tpgron = false)) ++
      segmentR(3, 42, Seq(2L),
        refinementRegion(0, 0, w, h, step2, step1, 1, tpgron = true))
    val got = Jbig2Decode.decodePage(stream)
    assert(got.isDefined, "intermediate-region chain must decode")
    val (gray, gw, gh) = got.get
    assert(gw == w && gh == h)
    assert(gray.map(g => if (g == 0x00) 1 else 0).toSeq == step2.map(_.toInt).toSeq,
      "page must show ONLY the final refinement result")
  }

  /** Refinement/aggregation symbol dictionary DATA (SDREFAGG=1,
    * single-instance): each new symbol refines `refId` (over inputs ++
    * earlier new symbols) at offset (rdx, rdy).
    */
  private def encodeSymbolDictRefAgg(inputSyms: Seq[Jbig2Decode.Bitmap],
      newSyms: Seq[(Jbig2Decode.Bitmap, Int, Int, Int)],
      rtemplate: Int): Array[Byte] = {
    val template = 0
    val at = Jbig2Decode.nominalAt(template)
    val rAt = Array((-1, -1), (-1, -1))
    val enc = new MqEncoder
    val iadh = new Jbig2Decode.IntCtx
    val iadw = new Jbig2Decode.IntCtx
    val iaex = new Jbig2Decode.IntCtx
    val iaai = new Jbig2Decode.IntCtx
    val iardx = new Jbig2Decode.IntCtx
    val iardy = new Jbig2Decode.IntCtx
    val idLen = Jbig2Decode.symCodeLen(inputSyms.size + newSyms.size)
    val iaidCx = new Array[Int](1 << (idLen + 1))
    val refCx = new Array[Int](1 << 13)
    val decodedOrder = scala.collection.mutable.ArrayBuffer.empty[Jbig2Decode.Bitmap]
    var hcHeight = 0
    newSyms.groupBy(_._1.h).toSeq.sortBy(_._1).foreach { case (hh, group) =>
      encInt(enc, iadh, hh - hcHeight); hcHeight = hh
      var symWidth = 0
      group.foreach { case (bm, refId, rdx, rdy) =>
        encInt(enc, iadw, bm.w - symWidth); symWidth = bm.w
        encInt(enc, iaai, 1)
        encIaid(enc, iaidCx, idLen, refId)
        encInt(enc, iardx, rdx)
        encInt(enc, iardy, rdy)
        val ref =
          if (refId < inputSyms.size) inputSyms(refId)
          else decodedOrder(refId - inputSyms.size)
        encodeRefineInto(enc, refCx, bm.bits, bm.w, bm.h, rtemplate,
          tpgron = false, rAt, ref.bits, ref.w, ref.h, rdx, rdy)
        decodedOrder += bm
      }
      encOob(enc, iadw)
    }
    encInt(enc, iaex, inputSyms.size) // skip the inputs
    encInt(enc, iaex, newSyms.size) // export every refined symbol
    val body = enc.flush()
    val flags = (1 << 1) | (template << 10) | (rtemplate << 12)
    Array(((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++
      at.flatMap { case (a, b) => Array(a.toByte, b.toByte) } ++
      (if (rtemplate == 0)
        rAt.flatMap { case (a, b) => Array(a.toByte, b.toByte) }
      else Array.empty[Byte]) ++
      be32(newSyms.size.toLong) ++ be32(newSyms.size.toLong) ++ body
  }

  test("refinement-aggregation symbol dict: refined glyphs flow to the text region") {
    // base dictionary: two glyphs; refagg dictionary: variants refined
    // from them (one chained off an earlier NEW symbol, one sampled at a
    // nonzero (rdx, rdy)), both refinement templates
    val baseA = glyph(
      "..##..",
      ".#..#.",
      "#....#",
      "######",
      "#....#",
      "#....#")
    val baseB = glyph(
      "#####.",
      "#....#",
      "#####.",
      "#....#",
      "#....#",
      "#####.")
    def flip(bm: Jbig2Decode.Bitmap, pts: (Int, Int)*): Jbig2Decode.Bitmap = {
      val b = bm.bits.clone()
      pts.foreach { case (x, y) => b(y * bm.w + x) = (1 - b(y * bm.w + x)).toByte }
      Jbig2Decode.Bitmap(bm.w, bm.h, b)
    }
    for (rtemplate <- Seq(0, 1)) {
      val varA = flip(baseA, (0, 0), (5, 5))
      val varB = flip(baseB, (2, 3))
      val varA2 = flip(varA, (3, 1)) // refines NEW symbol varA (id = 2)
      val refined = Seq(
        (varA, 0, 0, 0),
        (varB, 1, 1, -1), // nonzero reference offset
        (varA2, 2, 0, 0))
      val dict1 = encodeSymbolDict(Seq(baseA, baseB), 0)
      val dict2 = encodeSymbolDictRefAgg(Seq(baseA, baseB), refined, rtemplate)
      val syms = Seq(varA, varB, varA2)
      val insts = Seq((1, 7, 0), (9, 7, 1), (17, 7, 2))
      val trData = encodeTextRegion(insts, syms, refCorner = 1)
      val regionInfo = be32(24) ++ be32(10) ++ be32(0) ++ be32(0) ++ Array(0.toByte)
      val stream = segment(0, 48, pageInfo(24, 10)) ++
        segmentR(1, 0, Nil, dict1) ++
        segmentR(2, 0, Seq(1L), dict2) ++
        segmentR(3, 6, Seq(2L), regionInfo ++ trData)
      val (gray, w, h) = Jbig2Decode.decodePage(stream).get
      assert(w == 24 && h == 10)
      val expect = render(24, 10, syms, insts, 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((gray(y * w + x) == 0x00) == (expect(y * w + x) != 0),
          s"rtemplate=$rtemplate pixel ($x,$y)")
    }
  }

  /** Refagg dictionary DATA whose single new symbol is a MULTI-INSTANCE
    * aggregate (w x h, SBSTRIPS=1 TOPLEFT nested text region): instances
    * (s, t, id, refinedOpt) over `inputSyms`. The final strip's OOB is NOT
    * emitted — the decoder stops at the instance count, and the shared MQ
    * stream continues with the height-class OOB and export runs.
    */
  private def encodeSymbolDictAggregate(inputSyms: Seq[Jbig2Decode.Bitmap],
      w: Int, h: Int,
      insts: Seq[(Int, Int, Int, Option[(Jbig2Decode.Bitmap, Int, Int)])],
      rtemplate: Int): Array[Byte] = {
    val template = 0
    val at = Jbig2Decode.nominalAt(template)
    val rAt = Array((-1, -1), (-1, -1))
    val enc = new MqEncoder
    val iadh = new Jbig2Decode.IntCtx
    val iadw = new Jbig2Decode.IntCtx
    val iaex = new Jbig2Decode.IntCtx
    val iaai = new Jbig2Decode.IntCtx
    val iardx = new Jbig2Decode.IntCtx
    val iardy = new Jbig2Decode.IntCtx
    val idLen = Jbig2Decode.symCodeLen(inputSyms.size + 1)
    val iaidCx = new Array[Int](1 << (idLen + 1))
    val refCx = new Array[Int](1 << 13)
    val aggIadt = new Jbig2Decode.IntCtx
    val aggIafs = new Jbig2Decode.IntCtx
    val aggIads = new Jbig2Decode.IntCtx
    val aggIari = new Jbig2Decode.IntCtx
    val aggIardw = new Jbig2Decode.IntCtx
    val aggIardh = new Jbig2Decode.IntCtx
    encInt(enc, iadh, h)
    encInt(enc, iadw, w)
    encInt(enc, iaai, insts.size)
    encInt(enc, aggIadt, 0)
    var stripT = 0
    var firstS = 0
    var emitted = 0
    val groups = insts.groupBy(_._2).toSeq.sortBy(_._1)
    groups.foreach { case (t, group) =>
      encInt(enc, aggIadt, t - stripT); stripT = t
      var curS = 0
      var first = true
      group.sortBy(_._1).foreach { case (s, _, id, refOpt) =>
        if (first) { encInt(enc, aggIafs, s - firstS); firstS = s; curS = s; first = false }
        else { encInt(enc, aggIads, s - curS); curS = s }
        encIaid(enc, iaidCx, idLen, id)
        val bm = refOpt match {
          case None => encInt(enc, aggIari, 0); inputSyms(id)
          case Some((inst, rdx, rdy)) =>
            encInt(enc, aggIari, 1)
            val rdw = inst.w - inputSyms(id).w; val rdh = inst.h - inputSyms(id).h
            encInt(enc, aggIardw, rdw); encInt(enc, aggIardh, rdh)
            encInt(enc, iardx, rdx); encInt(enc, iardy, rdy)
            encodeRefineInto(enc, refCx, inst.bits, inst.w, inst.h, rtemplate,
              tpgron = false, rAt, inputSyms(id).bits, inputSyms(id).w,
              inputSyms(id).h, (rdw >> 1) + rdx, (rdh >> 1) + rdy)
            inst
        }
        curS += bm.w - 1
        emitted += 1
      }
      if (emitted < insts.size) encOob(enc, aggIads)
    }
    encOob(enc, iadw) // end of the height class
    encInt(enc, iaex, inputSyms.size)
    encInt(enc, iaex, 1)
    val body = enc.flush()
    val flags = (1 << 1) | (template << 10) | (rtemplate << 12)
    Array(((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++
      at.flatMap { case (a, b) => Array(a.toByte, b.toByte) } ++
      (if (rtemplate == 0)
        rAt.flatMap { case (a, b) => Array(a.toByte, b.toByte) }
      else Array.empty[Byte]) ++
      be32(1L) ++ be32(1L) ++ body
  }

  test("multi-instance refagg: an aggregate symbol composes instances, then serves a text region") {
    def flip(bm: Jbig2Decode.Bitmap, pts: (Int, Int)*): Jbig2Decode.Bitmap = {
      val b = bm.bits.clone()
      pts.foreach { case (x, y) => b(y * bm.w + x) = (1 - b(y * bm.w + x)).toByte }
      Jbig2Decode.Bitmap(bm.w, bm.h, b)
    }
    val baseA = glyph("..##..", ".#..#.", "#....#", "######", "#....#", "#....#")
    val baseB = glyph("#####.", "#....#", "#####.", "#....#", "#....#", "#####.")
    for (rtemplate <- Seq(0, 1)) {
      // the aggregate: 14x6 "AB" ligature, B refined with flipped pixels
      val insts = Seq(
        (0, 0, 0, None),
        (7, 0, 1, Some((flip(baseB, (2, 3)), 0, 0))))
      val dict = encodeSymbolDictAggregate(Seq(baseA, baseB), 14, 6, insts, rtemplate)
      val got = Jbig2Decode.decodeSymbolDict(dict, 0, dict.length, Seq(baseA, baseB))
      assert(got.isDefined && got.get.size == 1,
        s"aggregate dict must export one symbol, rtemplate=$rtemplate")
      val agg = got.get.head
      assert(agg.w == 14 && agg.h == 6)
      val expect = render(14, 6,
        Seq(baseA, flip(baseB, (2, 3))), Seq((0, 0, 0), (7, 0, 1)), refCorner = 1)
      assert(java.util.Arrays.equals(agg.bits, expect),
        s"aggregate raster rtemplate=$rtemplate")
    }
  }

  /** Text-region DATA with SBREFINE (arithmetic): instances
    * (s, t, id, refined) where refined = Some((instanceBitmap, rdx, rdy))
    * replaces symbol `id` by a refinement (size delta = bitmap vs symbol).
    */
  private def encodeTextRegionRefine(
      instances: Seq[(Int, Int, Int, Option[(Jbig2Decode.Bitmap, Int, Int)])],
      syms: Seq[Jbig2Decode.Bitmap], refCorner: Int,
      rtemplate: Int): Array[Byte] = {
    val enc = new MqEncoder
    val iadt = new Jbig2Decode.IntCtx
    val iafs = new Jbig2Decode.IntCtx
    val iads = new Jbig2Decode.IntCtx
    val iari = new Jbig2Decode.IntCtx
    val iardw = new Jbig2Decode.IntCtx
    val iardh = new Jbig2Decode.IntCtx
    val iardx = new Jbig2Decode.IntCtx
    val iardy = new Jbig2Decode.IntCtx
    val refCx = new Array[Int](1 << 13)
    val rAt = Array((-1, -1), (-1, -1))
    val codeLen = Jbig2Decode.symCodeLen(syms.size)
    val iaid = new Array[Int](1 << (codeLen + 1))
    encInt(enc, iadt, 0)
    var stripT = 0
    var firstS = 0
    instances.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (t, insts) =>
      encInt(enc, iadt, t - stripT); stripT = t
      var curS = 0
      var first = true
      insts.sortBy(_._1).foreach { case (s, _, id, refOpt) =>
        if (first) { encInt(enc, iafs, s - firstS); firstS = s; curS = s; first = false }
        else { encInt(enc, iads, s - curS); curS = s }
        encIaid(enc, iaid, codeLen, id)
        val bm = refOpt match {
          case None => encInt(enc, iari, 0); syms(id)
          case Some((inst, rdx, rdy)) =>
            encInt(enc, iari, 1)
            val rdw = inst.w - syms(id).w; val rdh = inst.h - syms(id).h
            encInt(enc, iardw, rdw); encInt(enc, iardh, rdh)
            encInt(enc, iardx, rdx); encInt(enc, iardy, rdy)
            encodeRefineInto(enc, refCx, inst.bits, inst.w, inst.h, rtemplate,
              tpgron = false, rAt, syms(id).bits, syms(id).w, syms(id).h,
              (rdw >> 1) + rdx, (rdh >> 1) + rdy)
            inst
        }
        curS += bm.w - 1
      }
      encOob(enc, iads)
    }
    val body = enc.flush()
    val flags = (1 << 1) | (refCorner << 4) | (rtemplate << 15)
    Array(((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++
      (if (rtemplate == 0)
        rAt.flatMap { case (a, b) => Array(a.toByte, b.toByte) }
      else Array.empty[Byte]) ++
      be32(instances.size.toLong) ++ body
  }

  test("SBREFINE text region: refined instances place with their own geometry") {
    // one plain instance, one same-size refinement (pixels flipped), one
    // RESIZED refinement (+1 wider, +1 taller), one with nonzero rdx/rdy —
    // both refinement templates
    def flip(bm: Jbig2Decode.Bitmap, pts: (Int, Int)*): Jbig2Decode.Bitmap = {
      val b = bm.bits.clone()
      pts.foreach { case (x, y) => b(y * bm.w + x) = (1 - b(y * bm.w + x)).toByte }
      Jbig2Decode.Bitmap(bm.w, bm.h, b)
    }
    val g0 = glyph("..##..", ".#..#.", "#....#", "######", "#....#", "#....#")
    val g1 = glyph("#####.", "#....#", "#####.", "#....#", "#....#", "#####.")
    val syms = Seq(g0, g1)
    // resized variant of g1: 7x7 with the original in the top-left
    val big = {
      val b = new Array[Byte](7 * 7)
      for (y <- 0 until 6; x <- 0 until 6) b(y * 7 + x) = g1.bits(y * 6 + x)
      b(6 * 7 + 6) = 1
      Jbig2Decode.Bitmap(7, 7, b)
    }
    for (rtemplate <- Seq(0, 1)) {
      val insts = Seq(
        (1, 7, 0, None),
        (9, 7, 1, Some((flip(g1, (0, 0), (5, 5)), 0, 0))),
        (17, 8, 1, Some((big, 0, 0))),
        (26, 7, 0, Some((flip(g0, (3, 3)), 1, -1))))
      val trData = encodeTextRegionRefine(insts, syms, refCorner = 1, rtemplate)
      val got = Jbig2Decode.decodeTextRegion(trData, 0, trData.length, 36, 18, syms)
      assert(got.isDefined, s"SBREFINE decode failed rtemplate=$rtemplate")
      // expected: render each instance's EFFECTIVE bitmap
      val effSyms = insts.map { case (_, _, id, r) => r.map(_._1).getOrElse(syms(id)) }
      val effInsts = insts.zipWithIndex.map { case ((s, t, _, _), ix) => (s, t, ix) }
      val expect = render(36, 18, effSyms, effInsts, refCorner = 1)
      assert(java.util.Arrays.equals(got.get, expect), s"raster rtemplate=$rtemplate")
    }
  }

  // ---- encoder twins of halftone coding (T.88 6.6 / 6.7) ----
  private def patternDict(patterns: Seq[Jbig2Decode.Bitmap],
      template: Int): Array[Byte] = {
    val pw = patterns.head.w; val ph = patterns.head.h
    val cw = patterns.size * pw
    val coll = new Array[Byte](cw * ph)
    for ((p, i) <- patterns.zipWithIndex; y <- 0 until ph)
      System.arraycopy(p.bits, y * pw, coll, y * cw + i * pw, pw)
    val at = Array((-pw, 0), (-3, -1), (2, -2), (-2, -2))
    val coded = encodeGenericMq(coll, cw, ph, template, tpgdon = false, at)
    Array(((template << 1) & 0xff).toByte, pw.toByte, ph.toByte) ++
      be32((patterns.size - 1).toLong) ++ coded
  }

  /** Halftone region segment DATA: region info + flags + grid geometry +
    * gray-code planes (MSB first, XOR-chained) in one MQ codeword.
    */
  private def halftoneRegion(x: Int, y: Int, w: Int, h: Int,
      gray: Array[Int], hgw: Int, hgh: Int, nPats: Int, template: Int,
      hgx: Int, hgy: Int, hrx: Int, hry: Int): Array[Byte] = {
    val info = be32(w) ++ be32(h) ++ be32(x) ++ be32(y) ++ Array(0.toByte)
    val nBits = Jbig2Decode.symCodeLen(nPats)
    val at = Array((if (template <= 1) 3 else 2, -1), (-3, -1), (2, -2), (-2, -2))
    val cxs = new Array[Int](1 << Jbig2Decode.templateSlots(template, at).length)
    val enc = new MqEncoder
    val prev = new Array[Byte](hgw * hgh)
    for (j <- nBits - 1 to 0 by -1) {
      val plane = new Array[Byte](hgw * hgh)
      for (i <- plane.indices) {
        val bit = ((gray(i) >> j) & 1).toByte
        plane(i) = (bit ^ prev(i)).toByte
        prev(i) = bit
      }
      encodeGenericInto(enc, cxs, plane, hgw, hgh, template, tpgdon = false, at)
    }
    val flags = ((template & 3) << 1) // OR comb op, defPixel 0, no skip
    info ++ Array(flags.toByte) ++ be32(hgw.toLong) ++ be32(hgh.toLong) ++
      be32(hgx.toLong & 0xffffffffL) ++ be32(hgy.toLong & 0xffffffffL) ++
      Array(((hrx >> 8) & 0xff).toByte, (hrx & 0xff).toByte,
        ((hry >> 8) & 0xff).toByte, (hry & 0xff).toByte) ++ enc.flush()
  }

  test("pattern dict + halftone region: gray-code planes stamp patterns on the grid") {
    val pw = 4
    val patterns = Seq(
      glyph("....", "....", "....", "...."),
      glyph("....", ".#..", "....", "...."),
      glyph("#..#", "....", "....", "#..#"),
      glyph("####", "####", "####", "####"))
    val (hgw, hgh) = (7, 5)
    val rnd = new scala.util.Random(31)
    val gray = Array.fill(hgw * hgh)(rnd.nextInt(patterns.size))
    val (w, h) = (hgw * pw, hgh * pw)
    for (template <- Seq(0, 2)) {
      val stream = segment(0, 48, pageInfo(w, h)) ++
        segmentR(1, 16, Nil, patternDict(patterns, template)) ++
        segmentR(2, 22, Seq(1L),
          halftoneRegion(0, 0, w, h, gray, hgw, hgh, patterns.size, template,
            hgx = 0, hgy = 0, hrx = pw << 8, hry = 0))
      val got = Jbig2Decode.decodePage(stream)
      assert(got.isDefined, s"halftone decode failed template=$template")
      val (grayPage, gw, gh) = got.get
      assert(gw == w && gh == h)
      for (mg <- 0 until hgh; ng <- 0 until hgw; yy <- 0 until pw; xx <- 0 until pw) {
        val expect = patterns(gray(mg * hgw + ng)).bits(yy * pw + xx) != 0
        val gotPx = grayPage((mg * pw + yy) * w + (ng * pw + xx)) == 0x00
        assert(gotPx == expect, s"template=$template grid($mg,$ng) px($xx,$yy)")
      }
    }
    // unsupported halftone shapes reject to None, never garbage
    val mmrFlags = halftoneRegion(0, 0, w, h, gray, hgw, hgh, patterns.size, 0,
      0, 0, pw << 8, 0)
    mmrFlags(17) = (mmrFlags(17) | 1).toByte // HMMR on
    val bad = segment(0, 48, pageInfo(w, h)) ++
      segmentR(1, 16, Nil, patternDict(patterns, 0)) ++
      segmentR(2, 22, Seq(1L), mmrFlags)
    assert(Jbig2Decode.decodePage(bad).isEmpty)
  }

  test("a fax-sized page (1728x1100) decodes in bounded time") {
    // the per-pixel context loop must stay practical at real scan
    // geometry: ~1.9M pixels, template 0 TPGDON (blank rows collapse)
    val w = 1728; val h = 1100
    val bits = new Array[Byte](w * h)
    for (y <- 200 until 900 by 40; x <- 100 until 1600)
      bits(y * w + x) = 1 // horizontal rules
    for (y <- 0 until h; x <- 300 until 1400 by 90)
      bits(y * w + x) = 1 // vertical rules
    val at = Jbig2Decode.nominalAt(0)
    val coded = encodeGenericMq(bits, w, h, 0, tpgdon = true, at)
    val t0 = System.nanoTime()
    val got = Jbig2Decode.decodeGenericMq(coded, 0, coded.length, w, h, 0,
      tpgdon = true, at)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(java.util.Arrays.equals(got, bits))
    assert(secs < 20.0, f"fax-page decode took $secs%.1f s — the context loop regressed")
  }

  // ---- huffman fixture encoder: independent Annex B transcription plus
  // its own re-derivation of the B.3 canonical code assignment, so the
  // decoder's tables and assignment are pinned from both sides ----

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); n += 1
      if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
    }
    def bits(v: Long, w: Int): Unit = {
      var i = w - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    def align(): Unit = while (n != 0) bit(0)
    def raw(bytes: Array[Byte]): Unit = { require(n == 0); buf ++= bytes }
    def result(): Array[Byte] = { align(); buf.toArray }
  }

  /** kind: 0 normal, 1 lower (32-bit downward), 2 upper (32-bit), 3 OOB */
  private case class EL(prefLen: Int, rangeLen: Int, rangeLow: Int, kind: Int = 0)

  private final class HEnc(lines: Seq[EL]) {
    val codes: Seq[Int] = { // B.3 canonical assignment, re-derived
      val maxLen = lines.map(_.prefLen).max
      val cnt = new Array[Int](maxLen + 1)
      lines.foreach(l => if (l.prefLen > 0) cnt(l.prefLen) += 1)
      val first = new Array[Int](maxLen + 1)
      var l = 2
      first(1) = 0
      while (l <= maxLen) { first(l) = (first(l - 1) + cnt(l - 1)) << 1; l += 1 }
      val next = first.clone()
      lines.map(ln =>
        if (ln.prefLen == 0) -1
        else { val c = next(ln.prefLen); next(ln.prefLen) += 1; c })
    }
    def enc(bw: BitWriter, v: Int): Unit = {
      val ix = lines.indexWhere(l => l.kind == 0 &&
        v >= l.rangeLow && (v.toLong - l.rangeLow) < (1L << l.rangeLen))
      val use = if (ix >= 0) ix else lines.indexWhere(l =>
        (l.kind == 2 && v >= l.rangeLow) || (l.kind == 1 && v <= l.rangeLow))
      require(use >= 0, s"no huffman line encodes $v")
      val l = lines(use)
      bw.bits(codes(use).toLong, l.prefLen)
      if (l.kind == 2) bw.bits(v.toLong - l.rangeLow, 32)
      else if (l.kind == 1) bw.bits(l.rangeLow.toLong - v, 32)
      else bw.bits(v.toLong - l.rangeLow, l.rangeLen)
    }
    def encOob(bw: BitWriter): Unit = {
      val ix = lines.indexWhere(_.kind == 3)
      require(ix >= 0, "table has no OOB line")
      bw.bits(codes(ix).toLong, lines(ix).prefLen)
    }
  }

  private val B1e = new HEnc(Seq(EL(1, 4, 0), EL(2, 8, 16), EL(3, 16, 272),
    EL(3, 32, 65808, 2)))
  private val B2e = new HEnc(Seq(EL(1, 0, 0), EL(2, 0, 1), EL(3, 0, 2),
    EL(4, 3, 3), EL(5, 6, 11), EL(6, 32, 75, 2), EL(6, 0, 0, 3)))
  private val B4e = new HEnc(Seq(EL(1, 0, 1), EL(2, 0, 2), EL(3, 0, 3),
    EL(4, 3, 4), EL(5, 6, 12), EL(5, 32, 76, 2)))
  private val B6e = new HEnc(Seq(EL(5, 10, -2048), EL(4, 9, -1024), EL(4, 8, -512),
    EL(4, 7, -256), EL(5, 6, -128), EL(5, 5, -64), EL(4, 5, -32), EL(2, 7, 0),
    EL(3, 7, 128), EL(3, 8, 256), EL(4, 9, 512), EL(4, 10, 1024),
    EL(6, 32, -2049, 1), EL(6, 32, 2048, 2)))
  private val B8e = new HEnc(Seq(EL(8, 3, -15), EL(9, 1, -7), EL(8, 1, -5),
    EL(9, 0, -3), EL(7, 0, -2), EL(4, 0, -1), EL(2, 1, 0), EL(5, 0, 2),
    EL(6, 0, 3), EL(3, 4, 4), EL(6, 1, 20), EL(4, 4, 22), EL(4, 5, 38),
    EL(5, 6, 70), EL(5, 7, 134), EL(6, 7, 262), EL(7, 8, 390), EL(6, 10, 646),
    EL(9, 32, -16, 1), EL(9, 32, 1670, 2), EL(2, 0, 0, 3)))
  private val B11e = new HEnc(Seq(EL(1, 0, 1), EL(2, 1, 2), EL(4, 0, 4),
    EL(4, 1, 5), EL(5, 1, 7), EL(5, 2, 9), EL(6, 2, 13), EL(7, 2, 17),
    EL(7, 3, 21), EL(7, 4, 29), EL(7, 5, 45), EL(7, 6, 77), EL(7, 32, 141, 2)))

  /** Huffman symbol dictionary segment DATA (SDHUFF=1, standard tables
    * unless `dhCustom`): symbols sorted by ascending height, widths
    * non-decreasing within a class; every symbol exports. `mmr` selects
    * the collective-bitmap coding.
    */
  private def encodeSymbolDictHuff(syms: Seq[Jbig2Decode.Bitmap], mmr: Boolean,
      dhCustom: Option[HEnc] = None): Array[Byte] = {
    val bw = new BitWriter
    val dhT = dhCustom.getOrElse(B4e)
    var hcHeight = 0
    syms.groupBy(_.h).toSeq.sortBy(_._1).foreach { case (h, group) =>
      dhT.enc(bw, h - hcHeight); hcHeight = h
      var symWidth = 0
      group.foreach { bm => B2e.enc(bw, bm.w - symWidth); symWidth = bm.w }
      B2e.encOob(bw)
      val tw = group.map(_.w).sum
      val coll = new Array[Byte](tw * h)
      var x0 = 0
      group.foreach { bm =>
        (0 until h).foreach(y =>
          System.arraycopy(bm.bits, y * bm.w, coll, y * tw + x0, bm.w))
        x0 += bm.w
      }
      if (mmr) {
        val coded = CcittDecode.encodeG4(
          coll.map(b => if (b != 0) 0x00.toByte else 0xff.toByte), tw, h)
        B1e.enc(bw, coded.length)
        bw.align()
        bw.raw(coded)
      } else {
        B1e.enc(bw, 0) // uncompressed collective bitmap
        bw.align()
        val stride = (tw + 7) / 8
        val rows = new Array[Byte](stride * h)
        for (y <- 0 until h; x <- 0 until tw; if coll(y * tw + x) != 0)
          rows(y * stride + (x >> 3)) =
            (rows(y * stride + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
        bw.raw(rows)
      }
    }
    B1e.enc(bw, 0)         // skip-run 0
    B1e.enc(bw, syms.size) // export every new symbol
    val flags = 1 | (if (dhCustom.isDefined) 3 << 2 else 0) // SDHUFF [+ DH custom]
    Array(((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++
      be32(syms.size.toLong) ++ be32(syms.size.toLong) ++ bw.result()
  }

  /** Huffman text region DATA (SBHUFF=1, SBSTRIPS=1, FS=B.6 DS=B.8
    * DT=B.11): symbol ID codes are fixed-length, carried by a runcode
    * table with a single 1-bit code for the literal length.
    */
  private def encodeTextRegionHuff(instances: Seq[(Int, Int, Int)],
      syms: Seq[Jbig2Decode.Bitmap], refCorner: Int): Array[Byte] = {
    val bw = new BitWriter
    val idLen = Jbig2Decode.symCodeLen(syms.size)
    (0 until 35).foreach(i => bw.bits(if (i == idLen) 1L else 0L, 4))
    syms.indices.foreach(_ => bw.bit(0)) // every symbol: the 1-bit runcode
    bw.align()
    B11e.enc(bw, 1) // STRIPT init: -1 (B.11 has no zero)
    var stripT = -1
    var firstS = 0
    instances.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (t, insts) =>
      B11e.enc(bw, t - stripT); stripT = t
      var curS = 0
      var first = true
      insts.sortBy(_._1).foreach { case (s, _, id) =>
        if (first) { B6e.enc(bw, s - firstS); firstS = s; curS = s; first = false }
        else { B8e.enc(bw, s - curS); curS = s }
        bw.bits(id.toLong, idLen) // canonical fixed-length code = the id
        curS += syms(id).w - 1
      }
      B8e.encOob(bw)
    }
    val flags = 1 | (refCorner << 4) // SBHUFF
    Array(((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte,
      0.toByte, 0.toByte) ++ // huffman flags: all standard selections
      be32(instances.size.toLong) ++ bw.result()
  }

  test("Annex B standard tables are Kraft-complete and decode hand-built codewords") {
    Jbig2Decode.StdTables.foreach { case (n, t) =>
      assert(t.kraftNumerator == (1L << 32),
        s"standard table B.$n is not a complete prefix code — transcription error")
    }
    // B.1, value 5: length-1 code '0' + 4 offset bits 0101 -> 0b00101_000
    val b1 = new Jbig2Decode.BitReader(Array(0x28.toByte), 0, 1)
    assert(Jbig2Decode.StdTables(1).decode(b1) == 5)
    // B.2 OOB: canonical '111111'
    val b2 = new Jbig2Decode.BitReader(Array(0xfc.toByte), 0, 1)
    assert(Jbig2Decode.StdTables(2).decode(b2) == Jbig2Decode.OOB)
    // B.4, value 76 (upper range, code '11111' + 32-bit 0)
    val b4 = new Jbig2Decode.BitReader(
      Array(0xf8.toByte, 0, 0, 0, 0), 0, 5)
    assert(Jbig2Decode.StdTables(4).decode(b4) == 76)
    // encoder/decoder roundtrip across every supported table's range
    for ((enc, dec, vals) <- Seq(
      (B1e, Jbig2Decode.StdTables(1), Seq(0, 7, 16, 271, 272, 65807, 65808, 70000)),
      (B2e, Jbig2Decode.StdTables(2), Seq(0, 1, 2, 3, 10, 11, 74, 75, 100000)),
      (B4e, Jbig2Decode.StdTables(4), Seq(1, 2, 3, 4, 11, 12, 75, 76, 99)),
      (B6e, Jbig2Decode.StdTables(6), Seq(-3000, -2049, -2048, -1, 0, 127, 128, 2047, 2048, 50000)),
      (B8e, Jbig2Decode.StdTables(8), Seq(-100, -16, -15, -3, -1, 0, 1, 2, 4, 19, 22, 645, 646, 1669, 1670, 90000)),
      (B11e, Jbig2Decode.StdTables(11), Seq(1, 2, 3, 4, 76, 77, 140, 141, 500)))) {
      vals.foreach { v =>
        val bw = new BitWriter
        enc.enc(bw, v)
        val bytes = bw.result()
        assert(dec.decode(new Jbig2Decode.BitReader(bytes, 0, bytes.length)) == v,
          s"value $v did not roundtrip")
      }
    }
  }

  test("huffman symbol dict + text region decode to the arithmetic twin's raster") {
    val insts = Seq((2, 3, 1), (9, 3, 2), (16, 5, 0), (3, 14, 2))
    val regionInfo = be32(26) ++ be32(16) ++ be32(2) ++ be32(1) ++ Array(0.toByte)
    def stream(dict: Array[Byte], tr: Array[Byte]): Array[Byte] =
      segment(0, 48, pageInfo(30, 20)) ++
        segmentR(1, 0, Nil, dict) ++
        segmentR(2, 6, Seq(1L), regionInfo ++ tr)
    val arith = Jbig2Decode.decodePage(
      stream(encodeSymbolDict(glyphs, 0), encodeTextRegion(insts, glyphs, 1))).get
    // both collective-bitmap codings: MMR through the T.6 engine and
    // byte-aligned uncompressed rows
    for (mmr <- Seq(true, false)) {
      val huff = Jbig2Decode.decodePage(
        stream(encodeSymbolDictHuff(glyphs, mmr),
          encodeTextRegionHuff(insts, glyphs, 1))).get
      assert(huff._2 == arith._2 && huff._3 == arith._3)
      assert(java.util.Arrays.equals(huff._1, arith._1),
        s"huffman (mmr=$mmr) raster must equal the arithmetic twin")
    }
  }

  test("custom huffman table segment (type 53) replaces a standard selection") {
    // custom DH table: values 1..8 as 4-bit codes, 2-bit lower/upper —
    // Kraft-complete; canonical codes: lower=00, upper=01, values 8..15
    val custom = new HEnc(Seq(
      EL(4, 0, 1), EL(4, 0, 2), EL(4, 0, 3), EL(4, 0, 4),
      EL(4, 0, 5), EL(4, 0, 6), EL(4, 0, 7), EL(4, 0, 8),
      EL(2, 32, 0, 1), EL(2, 32, 9, 2)))
    // the segment's B.2 assembly of that table: HTPS=4 HTRS=1,
    // HTLOW=1 HTHIGH=9, eight (preflen=4, rangelen=0) pairs, then the
    // lower and upper prefix lengths
    val tw = new BitWriter
    (1 to 8).foreach { _ => tw.bits(4L, 4); tw.bits(0L, 1) }
    tw.bits(2L, 4); tw.bits(2L, 4)
    val tableData = Array((((4 - 1) << 1) | ((1 - 1) << 4)).toByte) ++
      be32(1) ++ be32(9) ++ tw.result()
    val insts = Seq((2, 3, 1), (9, 3, 2), (16, 5, 0))
    val regionInfo = be32(26) ++ be32(14) ++ be32(2) ++ be32(1) ++ Array(0.toByte)
    val stream = segment(0, 48, pageInfo(30, 18)) ++
      segmentR(5, 53, Nil, tableData) ++
      segmentR(1, 0, Seq(5L), encodeSymbolDictHuff(glyphs, mmr = false,
        dhCustom = Some(custom))) ++
      segmentR(2, 6, Seq(1L), regionInfo ++ encodeTextRegionHuff(insts, glyphs, 1))
    val got = Jbig2Decode.decodePage(stream).get
    val want = Jbig2Decode.decodePage(
      segment(0, 48, pageInfo(30, 18)) ++
        segmentR(1, 0, Nil, encodeSymbolDict(glyphs, 0)) ++
        segmentR(2, 6, Seq(1L), regionInfo ++ encodeTextRegion(insts, glyphs, 1))).get
    assert(got._2 == want._2 && got._3 == want._3)
    assert(java.util.Arrays.equals(got._1, want._1),
      "custom-table huffman raster must equal the arithmetic baseline")
  }

  test("hostile headers: >Int.MaxValue dims rejected, truncated symbol dict is None") {
    // page-info width in (Int.MaxValue, 2^32) must not surface as a
    // negative width through .toInt — the stream reports no geometry
    val badPage = segment(0, 48,
      be32(0x80000001L) ++ be32(100) ++ be32(0) ++ be32(0) ++
        Array(0.toByte, 0.toByte, 0.toByte))
    assert(Jbig2Decode.dims(badPage).isEmpty, "oversized page width must be rejected")
    // the region fallback gets the same bound on height
    val badRegion = segment(0, 38,
      be32(100) ++ be32(0xfffffff0L) ++ be32(0) ++ be32(0) ++ Array(0.toByte))
    assert(Jbig2Decode.dims(badRegion).isEmpty, "oversized region height must be rejected")
    // a template-0 symbol dictionary needs 2 flags + 8 AT + 8 count bytes:
    // truncated inside that header it must return None, never read past the
    // segment end (AIOOBE on a short array, garbage on a full one)
    val full = encodeSymbolDict(Seq(glyph("11", "11")), 0)
    assert(Jbig2Decode.decodeSymbolDict(full.take(14), 0, 14, Nil).isEmpty,
      "truncated symbol-dict header must be rejected, not read out of bounds")
    assert(Jbig2Decode.decodeSymbolDict(full, 0, 14, Nil).isEmpty,
      "a segment boundary inside the header must be honored even when later bytes exist")
  }

  test("pdf surface: a JBIG2 scanned page feeds extractImages as a PNG") {
    import java.nio.charset.StandardCharsets
    val bits = structured(40, 30)
    val jb = segment(0, 48, pageInfo(40, 30)) ++
      segment(1, 38, genericRegion(0, 0, 40, 30, bits, template = 1))
    val pdf =
      (s"%PDF-1.4\n5 0 obj << /Type /XObject /Subtype /Image /Width 40 " +
        s"/Height 30 /BitsPerComponent 1 /Filter /JBIG2Decode " +
        s"/Length ${jb.length} >>\nstream\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ jb ++
      "\nendstream\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
        .getBytes(StandardCharsets.ISO_8859_1)
    val imgs = PdfText.extractImages(pdf)
    assert(imgs.size == 1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(imgs.head))
    assert(img.getWidth == 40 && img.getHeight == 30)
    for (y <- 0 until 30; x <- 0 until 40) {
      val black = (img.getRGB(x, y) & 0xff) < 128
      assert(black == (bits(y * 40 + x) != 0), s"pixel ($x,$y)")
    }
    assert(PdfText.extractImageDims(pdf) == Seq((40, 30)))
  }
}
