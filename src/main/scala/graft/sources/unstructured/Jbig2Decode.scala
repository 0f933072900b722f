package graft.sources.unstructured

/** JBIG2 decoder (ITU-T T.88 / ISO-IEC 14492) for embedded PDF streams:
  *
  *  - GENERIC regions — MQ-arithmetic coded (templates 0-3, adaptive
  *    pixels, TPGDON typical prediction) or MMR coded (ITU-T T.6, routed
  *    through [[CcittDecode]]'s existing G4 engine) — the
  *    `jbig2enc -generic` scanned-page shape;
  *  - SYMBOL DICTIONARIES + TEXT regions (the symbol-mode shape real
  *    JBIG2 encoders emit by default): Annex A arithmetic integer
  *    decoding (IADH/IADW/IAEX/IADT/IAFS/IADS/IAIT prefix trees, IAID
  *    symbol codes), height-class symbol decoding sharing one MQ decoder
  *    and context set per dictionary, export runs, cross-segment symbol
  *    references, and strip-wise instance placement with all four
  *    reference corners, transposition, and S-offset;
  *  - HUFFMAN-coded symbol dictionaries + text regions (SDHUFF/SBHUFF —
  *    the shape older fax/scanner encoders emit): Annex B standard
  *    tables (B.1-B.6, B.8, B.9, B.11-B.13, each pinned to exact Kraft
  *    completeness in the suite), custom table segments (type 53, the
  *    B.2 assembly), runcode-compressed symbol ID code tables, and
  *    collective height-class bitmaps both MMR-coded (via the T.6
  *    engine) and uncompressed.
  *
  * r13 adds generic REFINEMENT — refinement regions (types 40/42/43,
  * both templates, TPGRON typical rows) refining the page content or a
  * referred INTERMEDIATE generic/refinement region (types 36/40, stored
  * as references, never composited) — refinement/aggregation symbol
  * dictionaries (SDREFAGG=1, single-instance refinement AND
  * multi-instance aggregates as nested text regions) — text regions with
  * SBREFINE (per-instance refinement incl. resized instances,
  * arithmetic) — and HALFTONE coding: pattern dictionaries (type 16) and
  * immediate halftone regions (types 22/23) with gray-code bitplanes and
  * sheared pattern grids, arithmetic-coded.
  *
  * Out of the supported subset (huffman refagg, intermediate TEXT and
  * halftone regions, MMR/skip-enabled halftones, imported bitmap-coding
  * contexts, the untranscribed standard tables B.7/B.10 — a custom-table
  * stream covers those selections): decodePage returns None and the
  * caller falls back to header-derived dimensions only.
  *
  * The MQ decoder implements Annex E's software conventions; the context
  * bit order is the spec figures' raster order with each adaptive pixel
  * occupying its figure slot (A4 | 3 fixed | A3 / A2 | 5 fixed | A1 /
  * 4 fixed for template 0), which sorted-nominal implementations
  * reproduce. A structurally independent MQ ENCODER lives in the test
  * suite and roundtrips all four templates, so the state machine is
  * pinned from both sides.
  *
  * Reference equivalent: the reference delegates all of JBIG2 to PDFBox's
  * jbig2-imageio (datasources/v2/pdf/PdfReaderFactory.scala:52-67).
  */
private[graft] object Jbig2Decode {

  // ---- MQ-coder probability state machine (T.88 Table E.1) ----
  private[unstructured] val Qe: Array[Int] = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private[unstructured] val Nmps: Array[Int] = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private[unstructured] val Nlps: Array[Int] = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private[unstructured] val SwitchFlag: Array[Int] = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** MQ arithmetic DECODER (T.88 E.3, software conventions). Context
    * states are caller-held packed ints `(state << 1) | mps` so one
    * array serves a whole region decode.
    */
  private[unstructured] final class MqDecoder(data: Array[Byte], from: Int, until: Int) {
    private var bp = from
    private var c = 0L
    private var a = 0
    private var ct = 0
    // reads past the segment end behave as 0xFF padding (the spec's
    // marker-terminated convention): decoding simply runs out of entropy
    private def byteAt(i: Int): Int = if (i >= from && i < until) data(i) & 0xff else 0xff

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    // INITDEC
    c = byteAt(bp).toLong << 16
    byteIn()
    c = (c << 7) & 0xffffffffL
    ct -= 7
    a = 0x8000

    def decode(cxs: Array[Int], label: Int): Int = {
      var i = cxs(label) >>> 1
      var mps = cxs(label) & 1
      val qe = Qe(i)
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xffff) < qe) {
        if (a < qe) { d = mps; i = Nmps(i) }
        else {
          d = 1 - mps
          if (SwitchFlag(i) == 1) mps = 1 - mps
          i = Nlps(i)
        }
        a = qe
        do { if (ct == 0) byteIn(); a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1 }
        while ((a & 0x8000) == 0)
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) == 0) {
          if (a < qe) {
            d = 1 - mps
            if (SwitchFlag(i) == 1) mps = 1 - mps
            i = Nlps(i)
          } else { d = mps; i = Nmps(i) }
          do { if (ct == 0) byteIn(); a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1 }
          while ((a & 0x8000) == 0)
        } else d = mps
      }
      cxs(label) = (i << 1) | mps
      d
    }
  }

  // ---- generic region templates (T.88 6.2.5.3 figures, raster order,
  // adaptive pixels in their figure slots; MSB = first slot) ----

  /** (dx, dy) slot list for a template given its adaptive pixels. */
  private[unstructured] def templateSlots(template: Int,
      at: Array[(Int, Int)]): Array[(Int, Int)] = template match {
    case 0 => Array(
      at(3), (-1, -2), (0, -2), (1, -2), at(2),
      at(1), (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), at(0),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0))
    case 1 => Array(
      (-1, -2), (0, -2), (1, -2), (2, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), at(0),
      (-3, 0), (-2, 0), (-1, 0))
    case 2 => Array(
      (-1, -2), (0, -2), (1, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), at(0),
      (-2, 0), (-1, 0))
    case 3 => Array(
      (-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), at(0),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0))
    case t => throw new IllegalArgumentException(s"GBTEMPLATE $t")
  }

  /** Nominal adaptive-pixel positions per template (A1..A4). */
  private[unstructured] def nominalAt(template: Int): Array[(Int, Int)] =
    if (template == 0) Array((3, -1), (-3, -1), (2, -2), (-2, -2))
    else Array((if (template == 1) 3 else 2, -1))

  /** TPGDON pseudo-pixel context per template (T.88 6.2.5.7). */
  private[unstructured] val TpgdContext: Array[Int] =
    Array(0x9B25, 0x0795, 0x00E5, 0x0195)

  /** Decode one generic bitmap from an ALREADY-RUNNING MQ decoder with a
    * caller-held context array — the form symbol dictionaries need, where
    * every symbol of a dictionary shares one decoder and one context set.
    */
  private[unstructured] def genericInto(mq: MqDecoder, cxs: Array[Int],
      w: Int, h: Int, template: Int, tpgdon: Boolean,
      at: Array[(Int, Int)]): Array[Byte] = {
    val slots = templateSlots(template, at)
    val dxs = slots.map(_._1)
    val dys = slots.map(_._2)
    val n = slots.length
    val out = new Array[Byte](w * h)
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon && mq.decode(cxs, TpgdContext(template)) == 1) ltp = !ltp
      if (tpgdon && ltp) {
        if (y > 0) System.arraycopy(out, (y - 1) * w, out, y * w, w)
      } else {
        var x = 0
        while (x < w) {
          var label = 0
          var s = 0
          while (s < n) {
            val xx = x + dxs(s); val yy = y + dys(s)
            val bit = if (xx < 0 || xx >= w || yy < 0) 0 else out(yy * w + xx).toInt
            label = (label << 1) | bit
            s += 1
          }
          out(y * w + x) = mq.decode(cxs, label).toByte
          x += 1
        }
      }
      y += 1
    }
    out
  }

  // ---- generic REFINEMENT region templates (T.88 6.3.5.3, figures
  // 12/13): the context mixes pixels of the bitmap being decoded with
  // pixels of the REFERENCE bitmap shifted by (GRREFERENCEDX, DY).
  // Template 0 is 13 bits (3 coding + A1, 8 reference + A2), template 1
  // is 10 bits (4 coding, 6 reference); MSB = first slot, coding slots
  // before reference slots.

  private[unstructured] val RefineCoding: Array[Array[(Int, Int)]] = Array(
    Array((0, -1), (1, -1), (-1, 0)),
    Array((-1, -1), (0, -1), (1, -1), (-1, 0)))
  private[unstructured] val RefineReference: Array[Array[(Int, Int)]] = Array(
    Array((0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)),
    Array((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)))

  /** TPGRON pseudo-pixel context per refinement template (6.3.5.6). */
  private[unstructured] val TpgrContext: Array[Int] = Array(0x0020, 0x0008)

  /** Decode one generic refinement bitmap from an already-running MQ
    * decoder with caller-held contexts (8192 entries covers template 0).
    * `ref` is the reference bitmap (refW x refH, one byte per pixel);
    * reference pixel for output (x, y) offset slot (rx, ry) is
    * (x - dx + rx, y - dy + ry), out-of-bounds reading 0. Template 0
    * appends adaptive pixels A1 (coding side) and A2 (reference side).
    * With TPGRON, rows flagged "typical" copy pixels whose 3x3 reference
    * neighbourhood is uniform and decode only the rest.
    */
  private[unstructured] def genericRefineInto(mq: MqDecoder, cxs: Array[Int],
      w: Int, h: Int, template: Int, tpgron: Boolean, at: Array[(Int, Int)],
      ref: Array[Byte], refW: Int, refH: Int, dx: Int, dy: Int): Array[Byte] = {
    val coding =
      if (template == 0) RefineCoding(0) :+ at(0) else RefineCoding(template)
    val reference =
      if (template == 0) RefineReference(0) :+ at(1) else RefineReference(template)
    val out = new Array[Byte](w * h)
    @inline def refAt(x: Int, y: Int): Int =
      if (x < 0 || x >= refW || y < 0 || y >= refH) 0 else ref(y * refW + x).toInt
    @inline def outAt(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0) 0 else out(y * w + x).toInt
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgron && mq.decode(cxs, TpgrContext(template)) == 1) ltp = !ltp
      var x = 0
      while (x < w) {
        var set = false
        if (ltp) {
          // typical prediction: a uniform 3x3 reference neighbourhood
          // fixes the pixel without a decision (6.3.5.6)
          val rx = x - dx; val ry = y - dy
          var sum = 0
          var j = -1
          while (j <= 1) {
            var i = -1
            while (i <= 1) { sum += refAt(rx + i, ry + j); i += 1 }
            j += 1
          }
          if (sum == 0) { out(y * w + x) = 0; set = true }
          else if (sum == 9) { out(y * w + x) = 1; set = true }
        }
        if (!set) {
          var label = 0
          var s = 0
          while (s < coding.length) {
            label = (label << 1) | outAt(x + coding(s)._1, y + coding(s)._2)
            s += 1
          }
          s = 0
          while (s < reference.length) {
            label = (label << 1) |
              refAt(x - dx + reference(s)._1, y - dy + reference(s)._2)
            s += 1
          }
          out(y * w + x) = mq.decode(cxs, label).toByte
        }
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- halftone coding (T.88 6.6 / 6.7): pattern dictionaries carry
  // GRAYMAX+1 fixed-size patterns as ONE collective generic bitmap;
  // halftone regions decode a gray-code image (one generic bitplane per
  // bit, MSB first, XOR-chained per C.5, all planes sharing one MQ
  // decoder and context set) and stamp pattern(gray) at each sheared
  // grid position. Arithmetic coding only (the common emitted shape);
  // MMR halftones and HENABLESKIP reject to the metadata fallback. ----

  /** Pattern dictionary segment decode (7.4.4): returns the HNUMPATS
    * patterns, each HDPW x HDPH, or None for unsupported/malformed.
    */
  private[graft] def decodePatternDict(data: Array[Byte], from: Int,
      until: Int): Option[Seq[Bitmap]] = {
    if (until - from < 7) return None
    val flags = data(from) & 0xff
    if ((flags & 1) != 0) return None // HDMMR: out of scope
    val template = (flags >> 1) & 3
    val hdpw = data(from + 1) & 0xff
    val hdph = data(from + 2) & 0xff
    val grayMax = be32(data, from + 3).toInt
    if (hdpw <= 0 || hdph <= 0 || grayMax < 0 || grayMax > 0xffff) return None
    val cw = (grayMax + 1) * hdpw
    if (cw.toLong * hdph > MaxPixels) return None
    // collective bitmap: adaptive pixels pinned by the spec (6.7.5)
    val at = Array((-hdpw, 0), (-3, -1), (2, -2), (-2, -2))
    val coll = decodeGenericMq(data, from + 7, until, cw, hdph, template,
      tpgdon = false, at)
    Some((0 to grayMax).map { i =>
      val bits = new Array[Byte](hdpw * hdph)
      var y = 0
      while (y < hdph) {
        System.arraycopy(coll, y * cw + i * hdpw, bits, y * hdpw, hdpw)
        y += 1
      }
      Bitmap(hdpw, hdph, bits)
    })
  }

  /** Halftone region decode (6.6): gray-code image over the referred
    * pattern dictionary, patterns stamped at the sheared grid positions
    * x = (HGX + mg*HRY + ng*HRX) >> 8, y = (HGY + mg*HRX - ng*HRY) >> 8.
    */
  private[graft] def decodeHalftoneRegion(data: Array[Byte], from: Int,
      until: Int, w: Int, h: Int, patterns: Seq[Bitmap]): Option[Array[Byte]] = {
    if (until - from < 21 || patterns.isEmpty) return None
    val flags = data(from) & 0xff
    if ((flags & 1) != 0) return None // HMMR
    val template = (flags >> 1) & 3
    if (((flags >> 3) & 1) != 0) return None // HENABLESKIP
    val combOp = (flags >> 4) & 7
    val defPixel = (flags >> 7) & 1
    val hgw = be32(data, from + 1).toInt
    val hgh = be32(data, from + 5).toInt
    val hgx = be32(data, from + 9).toInt // signed
    val hgy = be32(data, from + 13).toInt
    val hrx = ((data(from + 17) & 0xff) << 8) | (data(from + 18) & 0xff)
    val hry = ((data(from + 19) & 0xff) << 8) | (data(from + 20) & 0xff)
    if (hgw <= 0 || hgh <= 0 || hgw.toLong * hgh > MaxPixels) return None
    val nBits = symCodeLen(patterns.size)
    val at = Array((if (template <= 1) 3 else 2, -1), (-3, -1), (2, -2), (-2, -2))
    val cxs = new Array[Int](1 << templateSlots(template, at).length)
    val mq = new MqDecoder(data, from + 21, until)
    // planes MSB first, gray-code chained (C.5): bit_j = plane_j XOR bit_{j+1}
    val gray = new Array[Int](hgw * hgh)
    val prev = new Array[Byte](hgw * hgh)
    var j = nBits - 1
    while (j >= 0) {
      val plane = genericInto(mq, cxs, hgw, hgh, template, tpgdon = false, at)
      var i = 0
      while (i < plane.length) {
        val bit = (plane(i) ^ prev(i)).toByte
        prev(i) = bit
        gray(i) |= bit.toInt << j
        i += 1
      }
      j -= 1
    }
    val out = Array.fill[Byte](w * h)(defPixel.toByte)
    val pw = patterns.head.w; val ph = patterns.head.h
    var mg = 0
    while (mg < hgh) {
      var ng = 0
      while (ng < hgw) {
        val gi = math.min(gray(mg * hgw + ng), patterns.size - 1)
        val pat = patterns(gi)
        val x0 = (hgx + mg * hry + ng * hrx) >> 8
        val y0 = (hgy + mg * hrx - ng * hry) >> 8
        var yy = 0
        while (yy < ph) {
          val py = y0 + yy
          if (py >= 0 && py < h) {
            var xx = 0
            while (xx < pw) {
              val px = x0 + xx
              if (px >= 0 && px < w) {
                val v = pat.bits(yy * pw + xx)
                val o = py * w + px
                out(o) = (combOp match {
                  case 0 => out(o) | v
                  case 1 => out(o) & v
                  case 2 => out(o) ^ v
                  case 3 => ((out(o) ^ v) ^ 1) & 1
                  case _ => v.toInt
                }).toByte
              }
              xx += 1
            }
          }
          yy += 1
        }
        ng += 1
      }
      mg += 1
    }
    Some(out)
  }

  /** Decode one MQ-coded generic region to one-byte-per-pixel (1 = black). */
  private[unstructured] def decodeGenericMq(data: Array[Byte], from: Int, until: Int,
      w: Int, h: Int, template: Int, tpgdon: Boolean,
      at: Array[(Int, Int)]): Array[Byte] = {
    val slots = templateSlots(template, at)
    val cxs = new Array[Int](1 << slots.length)
    genericInto(new MqDecoder(data, from, until), cxs, w, h, template, tpgdon, at)
  }

  // ---- arithmetic integer decoding (T.88 Annex A) ----

  /** One IAx integer decoding procedure's adaptive contexts (A.2/A.3):
    * a 512-entry prefix tree the PREV register walks.
    */
  private[unstructured] final class IntCtx { val cx = new Array[Int](512) }

  private[unstructured] val OOB = Int.MinValue

  // ---- Huffman coding (T.88 Annex B) — the shape older fax/scanner
  // encoders emit (SDHUFF/SBHUFF symbol dictionaries + text regions with
  // Annex B standard tables or custom table segments). Generic regions
  // never use huffman (they are MQ or MMR), so this completes the
  // non-refinement scanned-document matrix. ----

  /** MSB-first bit reader over a segment window. Throws past `until` —
    * decodePage's catch turns malformed streams into None.
    */
  private[unstructured] final class BitReader(val data: Array[Byte], var pos: Int,
      val until: Int) {
    private var bitPos = 0
    def bit(): Int = {
      if (pos >= until) throw new IllegalStateException("bit read past segment end")
      val b = (data(pos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      b
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def bits32(): Long = {
      var v = 0L; var i = 0
      while (i < 32) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = if (bitPos != 0) { bitPos = 0; pos += 1 }
  }

  /** One huffman table line. `rangeLen == 32` marks the unbounded
    * lower/upper range lines; `oob` lines carry no value.
    */
  private[unstructured] final case class HLine(prefLen: Int, rangeLen: Int,
      rangeLow: Int, lower: Boolean = false, oob: Boolean = false)

  /** An assembled table: canonical prefix codes per B.3 (first code of
    * each length = (firstcode + count of previous length) << 1, assigned
    * in table order within a length), decoded bit-serially.
    */
  private[unstructured] final class HTable(lines0: Seq[HLine]) {
    private val lines: Array[HLine] = lines0.filter(_.prefLen > 0).toArray
    private val byLenCode: Map[(Int, Int), HLine] = {
      val maxLen = if (lines.isEmpty) 0 else lines.map(_.prefLen).max
      val cnt = new Array[Int](maxLen + 2)
      lines.foreach(l => cnt(l.prefLen) += 1)
      val firstCode = new Array[Int](maxLen + 2)
      var len = 1
      while (len <= maxLen) {
        firstCode(len) = (firstCode(len - 1) + cnt(len - 1)) << 1
        len += 1
      }
      val next = firstCode.clone()
      lines.iterator.map { l =>
        val code = next(l.prefLen)
        next(l.prefLen) += 1
        (l.prefLen, code) -> l
      }.toMap
    }

    /** Kraft sum numerator over 2^-32 — exactly 2^32 for a complete code.
      * The suite pins every standard table to exact completeness, which a
      * mis-transcribed Annex B line would almost surely break.
      */
    def kraftNumerator: Long =
      lines.foldLeft(0L)((a, l) => a + (1L << (32 - l.prefLen)))

    /** Decode one value; [[OOB]] for an OOB line; throws on an unassigned
      * code or exhausted input (caller's catch → None).
      */
    def decode(br: BitReader): Int = {
      var len = 0; var code = 0
      while (len < 32) {
        code = (code << 1) | br.bit()
        len += 1
        byLenCode.get((len, code)) match {
          case Some(l) if l.oob => return OOB
          case Some(l) if l.rangeLen == 32 =>
            val off = br.bits32()
            if (off > Int.MaxValue) throw new IllegalStateException("huffman offset overflow")
            return if (l.lower) l.rangeLow - off.toInt else l.rangeLow + off.toInt
          case Some(l) => return l.rangeLow + br.bits(l.rangeLen)
          case None => ()
        }
      }
      throw new IllegalStateException("unassigned huffman code")
    }
  }

  /** Annex B standard tables. B.1-B.6, B.8, B.9, B.11-B.13 — every
    * non-refinement selection except FS alternate B.7 and DS alternate
    * B.10; those selections return None (custom table segments cover any
    * stream that needs them). B.14/B.15 are refinement-only (RDW/RDH/
    * RDX/RDY), out of the supported subset with refinement itself.
    */
  private[unstructured] val StdTables: Map[Int, HTable] = Map(
    1 -> new HTable(Seq(HLine(1, 4, 0), HLine(2, 8, 16), HLine(3, 16, 272),
      HLine(3, 32, 65808))),
    2 -> new HTable(Seq(HLine(1, 0, 0), HLine(2, 0, 1), HLine(3, 0, 2),
      HLine(4, 3, 3), HLine(5, 6, 11), HLine(6, 32, 75), HLine(6, 0, 0, oob = true))),
    3 -> new HTable(Seq(HLine(8, 8, -256), HLine(1, 0, 0), HLine(2, 0, 1),
      HLine(3, 0, 2), HLine(4, 3, 3), HLine(5, 6, 11),
      HLine(8, 32, -257, lower = true), HLine(7, 32, 75), HLine(6, 0, 0, oob = true))),
    4 -> new HTable(Seq(HLine(1, 0, 1), HLine(2, 0, 2), HLine(3, 0, 3),
      HLine(4, 3, 4), HLine(5, 6, 12), HLine(5, 32, 76))),
    5 -> new HTable(Seq(HLine(7, 8, -255), HLine(1, 0, 1), HLine(2, 0, 2),
      HLine(3, 0, 3), HLine(4, 3, 4), HLine(5, 6, 12),
      HLine(7, 32, -256, lower = true), HLine(6, 32, 76))),
    6 -> new HTable(Seq(HLine(5, 10, -2048), HLine(4, 9, -1024), HLine(4, 8, -512),
      HLine(4, 7, -256), HLine(5, 6, -128), HLine(5, 5, -64), HLine(4, 5, -32),
      HLine(2, 7, 0), HLine(3, 7, 128), HLine(3, 8, 256), HLine(4, 9, 512),
      HLine(4, 10, 1024), HLine(6, 32, -2049, lower = true), HLine(6, 32, 2048))),
    8 -> new HTable(Seq(HLine(8, 3, -15), HLine(9, 1, -7), HLine(8, 1, -5),
      HLine(9, 0, -3), HLine(7, 0, -2), HLine(4, 0, -1), HLine(2, 1, 0),
      HLine(5, 0, 2), HLine(6, 0, 3), HLine(3, 4, 4), HLine(6, 1, 20),
      HLine(4, 4, 22), HLine(4, 5, 38), HLine(5, 6, 70), HLine(5, 7, 134),
      HLine(6, 7, 262), HLine(7, 8, 390), HLine(6, 10, 646),
      HLine(9, 32, -16, lower = true), HLine(9, 32, 1670), HLine(2, 0, 0, oob = true))),
    9 -> new HTable(Seq(HLine(8, 4, -31), HLine(9, 2, -15), HLine(8, 2, -11),
      HLine(9, 1, -7), HLine(7, 1, -5), HLine(4, 1, -3), HLine(3, 1, -1),
      HLine(3, 1, 1), HLine(5, 1, 3), HLine(6, 1, 5), HLine(3, 5, 7),
      HLine(6, 2, 39), HLine(4, 5, 43), HLine(4, 6, 75), HLine(5, 7, 139),
      HLine(5, 8, 267), HLine(6, 8, 523), HLine(7, 9, 779), HLine(6, 11, 1291),
      HLine(9, 32, -32, lower = true), HLine(9, 32, 3339), HLine(2, 0, 0, oob = true))),
    11 -> new HTable(Seq(HLine(1, 0, 1), HLine(2, 1, 2), HLine(4, 0, 4),
      HLine(4, 1, 5), HLine(5, 1, 7), HLine(5, 2, 9), HLine(6, 2, 13),
      HLine(7, 2, 17), HLine(7, 3, 21), HLine(7, 4, 29), HLine(7, 5, 45),
      HLine(7, 6, 77), HLine(7, 32, 141))),
    12 -> new HTable(Seq(HLine(1, 0, 1), HLine(2, 0, 2), HLine(3, 1, 3),
      HLine(5, 0, 5), HLine(5, 1, 6), HLine(6, 1, 8), HLine(7, 0, 10),
      HLine(7, 1, 11), HLine(7, 2, 13), HLine(7, 3, 17), HLine(7, 4, 25),
      HLine(8, 5, 41), HLine(8, 32, 73))),
    13 -> new HTable(Seq(HLine(1, 0, 1), HLine(3, 0, 2), HLine(4, 0, 3),
      HLine(5, 0, 4), HLine(4, 1, 5), HLine(3, 3, 7), HLine(6, 1, 15),
      HLine(6, 2, 17), HLine(6, 3, 21), HLine(6, 4, 29), HLine(6, 5, 45),
      HLine(7, 6, 77), HLine(7, 32, 141))))

  /** Custom huffman table segment (type 53, B.2 assembly): flags byte
    * (HTOOB, HTPS-1, HTRS-1), signed HTLOW/HTHIGH, then bit-packed
    * (PREFLEN, RANGELEN) pairs covering [HTLOW, HTHIGH), the lower/upper
    * range prefix lengths, and the OOB prefix length when flagged.
    */
  private[unstructured] def parseTableSegment(data: Array[Byte], from: Int,
      until: Int): Option[HTable] = try {
    if (until - from < 9) return None
    val flags = data(from) & 0xff
    val oob = (flags & 1) == 1
    val htps = ((flags >> 1) & 7) + 1
    val htrs = ((flags >> 4) & 7) + 1
    val low = be32(data, from + 1).toInt // signed by bit pattern
    val high = be32(data, from + 5).toInt
    if (high <= low) return None
    val br = new BitReader(data, from + 9, until)
    val lines = Seq.newBuilder[HLine]
    var cur = low.toLong
    while (cur < high) {
      val pl = br.bits(htps)
      val rl = br.bits(htrs)
      if (rl > 31) return None
      lines += HLine(pl, rl, cur.toInt)
      cur += 1L << rl
    }
    lines += HLine(br.bits(htps), 32, low - 1, lower = true)
    lines += HLine(br.bits(htps), 32, high)
    if (oob) lines += HLine(br.bits(htps), 0, 0, oob = true)
    Some(new HTable(lines.result()))
  } catch { case _: Exception => None }

  /** A.2 IAx decode: returns the signed value, or [[OOB]]. */
  private[unstructured] def decodeInt(mq: MqDecoder, ctx: IntCtx): Int = {
    var prev = 1
    def bit(): Int = {
      val b = mq.decode(ctx.cx, prev)
      prev = if (prev < 256) (prev << 1) | b else ((((prev << 1) | b) & 511) | 256)
      b
    }
    def read(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    val s = bit()
    val v =
      if (bit() == 0) read(2)
      else if (bit() == 0) read(4) + 4
      else if (bit() == 0) read(6) + 20
      else if (bit() == 0) read(8) + 84
      else if (bit() == 0) read(12) + 340
      else read(32) + 4436
    if (s == 1 && v == 0) OOB else if (s == 1) -v else v
  }

  /** A.3 IAID decode: `codeLen` fixed bits through a prefix-tree context. */
  private[unstructured] def decodeIaid(mq: MqDecoder, cx: Array[Int], codeLen: Int): Int = {
    var prev = 1
    var i = 0
    while (i < codeLen) { prev = (prev << 1) | mq.decode(cx, prev); i += 1 }
    prev - (1 << codeLen)
  }

  /** log2 symbol-code length: max(1, ceil(log2(n))) per the spec erratum. */
  private[unstructured] def symCodeLen(n: Int): Int = {
    var len = 0
    while ((1 << len) < n) len += 1
    math.max(1, len)
  }

  private[graft] final case class Bitmap(w: Int, h: Int, bits: Array[Byte])

  /** Symbol dictionary decode (T.88 6.5): arithmetic (the `jbig2enc`
    * symbol-mode shape) or huffman-coded (SDHUFF — older fax/scanner
    * encoders), no refinement/aggregation. Returns the EXPORTED symbols;
    * None when the dictionary needs an unsupported feature. `tables` =
    * the referred custom table segments, in reference order.
    */
  private[graft] def decodeSymbolDict(data: Array[Byte], from: Int, until: Int,
      inputSymbols: Seq[Bitmap], tables: Seq[HTable] = Nil): Option[Seq[Bitmap]] = {
    if (until - from < 2) return None
    val flags = ((data(from) & 0xff) << 8) | (data(from + 1) & 0xff)
    val sdhuff = (flags & 1) == 1
    val sdrefagg = ((flags >> 1) & 1) == 1
    val ctxUsed = ((flags >> 8) & 1) == 1
    val template = (flags >> 10) & 3
    val rtemplate = (flags >> 12) & 1
    if (ctxUsed) return None // retained-context sharing: out of scope
    if (sdhuff && sdrefagg) return None // huffman refagg: out of scope
    if (sdhuff) return decodeSymbolDictHuff(data, from, until, inputSymbols, tables, flags)
    var p = from + 2
    val nAt = if (template == 0) 4 else 1
    val nRAt = if (sdrefagg && rtemplate == 0) 2 else 0
    // template-dependent header size: flags + AT pixels (+ SDRAT under
    // refinement with template 0) + the two 32-bit counts — a short
    // segment must not read AT/count bytes past `until` into the next
    // segment's data
    if (until - from < 2 + 2 * nAt + 2 * nRAt + 8) return None
    val at = (0 until nAt).map(k =>
      (data(p + 2 * k).toInt, data(p + 2 * k + 1).toInt)).toArray
    p += 2 * nAt
    val rAt = (0 until nRAt).map(k =>
      (data(p + 2 * k).toInt, data(p + 2 * k + 1).toInt)).toArray
    p += 2 * nRAt
    val numEx = be32(data, p).toInt; val numNew = be32(data, p + 4).toInt
    p += 8
    if (numNew < 0 || numNew > (1 << 16) || numEx < 0) return None
    val mq = new MqDecoder(data, p, until)
    val iadh = new IntCtx; val iadw = new IntCtx
    val iaex = new IntCtx
    // refinement/aggregation state (6.5.8.2): instance count, reference
    // id and offsets, plus the shared refinement contexts
    val iaai = new IntCtx; val iardx = new IntCtx; val iardy = new IntCtx
    val idLen = symCodeLen(inputSymbols.size + numNew)
    val iaidCx = if (sdrefagg) new Array[Int](1 << (idLen + 1)) else null
    val refCx = if (sdrefagg) new Array[Int](1 << 13) else null
    // aggregate (REFAGGNINST > 1) text-region contexts, shared across the
    // dictionary's aggregates like every other context here (6.5.8.2.1)
    val aggCtx: Array[IntCtx] =
      if (sdrefagg) Array.fill(6)(new IntCtx) else null
    val genCx = new Array[Int](1 << templateSlots(template, at).length)
    val newSyms = scala.collection.mutable.ArrayBuffer.empty[Bitmap]
    var decoded = 0
    var hcHeight = 0
    while (decoded < numNew) {
      val dh = decodeInt(mq, iadh)
      if (dh == OOB) return None
      hcHeight += dh
      if (hcHeight <= 0 || hcHeight > (1 << 14)) return None
      var symWidth = 0
      var endOfClass = false
      // every height class reads widths UNTIL OOB — the terminator is part
      // of the stream even when the symbol count is already reached, and
      // skipping it would desync the shared MQ decoder before export runs
      while (!endOfClass) {
        val dw = decodeInt(mq, iadw)
        if (dw == OOB) endOfClass = true
        else {
          if (decoded >= numNew) return None // excess symbol: malformed
          symWidth += dw
          if (symWidth <= 0 || symWidth > (1 << 14)) return None
          if (!sdrefagg) {
            newSyms += Bitmap(symWidth, hcHeight,
              genericInto(mq, genCx, symWidth, hcHeight, template, tpgdon = false, at))
          } else {
            // refinement/aggregation (6.5.8.2): one instance refines a
            // referred symbol in place; several instances decode as a
            // nested SBSTRIPS=1 TOPLEFT text region over the symbols so
            // far, sharing this dictionary's decoder and contexts
            val nInst = decodeInt(mq, iaai)
            if (nInst == OOB || nInst <= 0 || nInst > (1 << 10)) return None
            if (nInst == 1) {
              val id = decodeIaid(mq, iaidCx, idLen)
              val rdx = decodeInt(mq, iardx)
              val rdy = decodeInt(mq, iardy)
              if (rdx == OOB || rdy == OOB) return None
              if (id < 0 || id >= inputSymbols.size + newSyms.length) return None
              val refSym =
                if (id < inputSymbols.size) inputSymbols(id)
                else newSyms(id - inputSymbols.size)
              newSyms += Bitmap(symWidth, hcHeight,
                genericRefineInto(mq, refCx, symWidth, hcHeight, rtemplate,
                  tpgron = false, rAt, refSym.bits, refSym.w, refSym.h, rdx, rdy))
            } else {
              val all = (inputSymbols ++ newSyms).toIndexedSeq
              val bits = aggregateText(mq, symWidth, hcHeight, nInst, all,
                idLen, iaidCx, aggCtx, iardx, iardy, rtemplate, rAt, refCx)
                .getOrElse(return None)
              newSyms += Bitmap(symWidth, hcHeight, bits)
            }
          }
          decoded += 1
        }
      }
    }
    val all = inputSymbols ++ newSyms
    // export runs (6.5.10): alternating skip/export run lengths via IAEX
    val exported = Seq.newBuilder[Bitmap]
    var exIndex = 0
    var exFlag = false
    var taken = 0
    while (exIndex < all.size && taken < numEx) {
      val run = decodeInt(mq, iaex)
      if (run == OOB || run < 0) return None
      if (exFlag) {
        val upTo = math.min(exIndex + run, all.size)
        (exIndex until upTo).foreach { i =>
          if (taken < numEx) { exported += all(i); taken += 1 }
        }
      }
      exIndex += run
      exFlag = !exFlag
    }
    Some(exported.result())
  }

  /** The symbol dictionary's multi-instance aggregate (6.5.8.2.1): a
    * minimal text region — SBSTRIPS=1, TOPLEFT corner, no transposition,
    * zero DS offset, OR composition, SBREFINE=1 — decoded from the
    * dictionary's OWN running MQ decoder with per-dictionary contexts
    * (`aggCtx` = IADT, IAFS, IADS, IARI, IARDW, IARDH; IAID/IARDX/IARDY
    * and the refinement contexts are the dictionary-wide ones).
    */
  private def aggregateText(mq: MqDecoder, w: Int, h: Int, nInst: Int,
      syms: IndexedSeq[Bitmap], idLen: Int, iaidCx: Array[Int],
      aggCtx: Array[IntCtx], iardx: IntCtx, iardy: IntCtx,
      rtemplate: Int, rAt: Array[(Int, Int)],
      refCx: Array[Int]): Option[Array[Byte]] = {
    val Array(iadt, iafs, iads, iari, iardw, iardh) = aggCtx
    val out = new Array[Byte](w * h)
    def draw(bm: Bitmap, x0: Int, y0: Int): Unit = {
      var yy = 0
      while (yy < bm.h) {
        val py = y0 + yy
        if (py >= 0 && py < h) {
          var xx = 0
          while (xx < bm.w) {
            val px = x0 + xx
            if (px >= 0 && px < w)
              out(py * w + px) = (out(py * w + px) | bm.bits(yy * bm.w + xx)).toByte
            xx += 1
          }
        }
        yy += 1
      }
    }
    val dt0 = decodeInt(mq, iadt)
    if (dt0 == OOB) return None
    var stripT = -dt0
    var firstS = 0
    var n = 0
    while (n < nInst) {
      val dt = decodeInt(mq, iadt)
      if (dt == OOB) return None
      stripT += dt
      var curS = 0
      var first = true
      var end = false
      while (!end && n < nInst) {
        if (first) {
          val dfs = decodeInt(mq, iafs)
          if (dfs == OOB) return None
          firstS += dfs; curS = firstS; first = false
        } else {
          val ids = decodeInt(mq, iads)
          if (ids == OOB) end = true else curS += ids
        }
        if (!end) {
          val id = decodeIaid(mq, iaidCx, idLen)
          if (id < 0 || id >= syms.size) return None
          val sym = syms(id)
          val ri = decodeInt(mq, iari)
          if (ri == OOB) return None
          val bm =
            if (ri == 0) sym
            else {
              val rdw = decodeInt(mq, iardw); val rdh = decodeInt(mq, iardh)
              val rdx = decodeInt(mq, iardx); val rdy = decodeInt(mq, iardy)
              if (rdw == OOB || rdh == OOB || rdx == OOB || rdy == OOB)
                return None
              val wi = sym.w.toLong + rdw; val hi = sym.h.toLong + rdh
              if (wi <= 0 || hi <= 0 || wi * hi > MaxPixels) return None
              Bitmap(wi.toInt, hi.toInt, genericRefineInto(mq, refCx,
                wi.toInt, hi.toInt, rtemplate, tpgron = false, rAt,
                sym.bits, sym.w, sym.h, (rdw >> 1) + rdx, (rdh >> 1) + rdy))
            }
          draw(bm, curS, stripT) // TOPLEFT, non-transposed
          curS += bm.w - 1
          n += 1
        }
      }
    }
    Some(out)
  }

  /** Huffman symbol dictionary (6.5 with SDHUFF=1, SDREFAGG=0): height
    * classes carry DH/DW deltas through the selected Annex B tables, and
    * each class's symbols arrive as ONE collective bitmap — MMR-coded
    * (BMSIZE > 0, routed through the T.6 engine) or byte-aligned
    * uncompressed rows (BMSIZE == 0) — split by the accumulated widths.
    * Export runs use Table B.1. Custom tables consume from `tables` in
    * the spec's DH, DW, BMSIZE, AGG assignment order.
    */
  private def decodeSymbolDictHuff(data: Array[Byte], from: Int, until: Int,
      inputSymbols: Seq[Bitmap], tables: Seq[HTable], flags: Int): Option[Seq[Bitmap]] = try {
    val dhSel = (flags >> 2) & 3
    val dwSel = (flags >> 4) & 3
    val bmSel = (flags >> 6) & 1
    val aggSel = (flags >> 7) & 1
    var customIx = 0
    def custom(): Option[HTable] = {
      val t = tables.lift(customIx); customIx += 1; t
    }
    val dhT = dhSel match {
      case 0 => StdTables(4); case 1 => StdTables(5)
      case 3 => custom().getOrElse(return None); case _ => return None
    }
    val dwT = dwSel match {
      case 0 => StdTables(2); case 1 => StdTables(3)
      case 3 => custom().getOrElse(return None); case _ => return None
    }
    val bmT = if (bmSel == 0) StdTables(1) else custom().getOrElse(return None)
    // AGG is only read under refinement/aggregation (off here), but a
    // custom selection still consumes its referred table slot
    if (aggSel == 1) custom(): Unit
    // SDHUFF=1 has NO AT pixels: header = flags + numEx + numNew
    if (until - from < 10) return None
    val numEx = be32(data, from + 2).toInt
    val numNew = be32(data, from + 6).toInt
    if (numNew < 0 || numNew > (1 << 16) || numEx < 0) return None
    val br = new BitReader(data, from + 10, until)
    val newSyms = Seq.newBuilder[Bitmap]
    var decoded = 0
    var hcHeight = 0
    while (decoded < numNew) {
      val dh = dhT.decode(br)
      if (dh == OOB) return None
      hcHeight += dh
      if (hcHeight <= 0 || hcHeight > (1 << 14)) return None
      var symWidth = 0
      var totWidth = 0L
      val hcWidths = Seq.newBuilder[Int]
      var endOfClass = false
      while (!endOfClass) {
        val dw = dwT.decode(br)
        if (dw == OOB) endOfClass = true
        else {
          if (decoded >= numNew) return None // excess symbol: malformed
          symWidth += dw
          if (symWidth <= 0 || symWidth > (1 << 14)) return None
          totWidth += symWidth
          hcWidths += symWidth
          decoded += 1
        }
      }
      val widths = hcWidths.result()
      if (widths.nonEmpty) {
        if (totWidth * hcHeight > MaxPixels) return None
        val tw = totWidth.toInt
        val bmSize = bmT.decode(br)
        if (bmSize == OOB || bmSize < 0) return None
        br.align()
        val coll = new Array[Byte](tw * hcHeight)
        if (bmSize == 0) {
          // uncompressed: hcHeight byte-aligned rows, MSB-first, 1 = black
          val stride = (tw + 7) / 8
          if (br.pos + hcHeight.toLong * stride > until) return None
          var y = 0
          while (y < hcHeight) {
            var x = 0
            while (x < tw) {
              val b = data(br.pos + y * stride + (x >> 3))
              coll(y * tw + x) = ((b >> (7 - (x & 7))) & 1).toByte
              x += 1
            }
            y += 1
          }
          br.pos += hcHeight * stride
        } else {
          // MMR-coded collective bitmap through the T.6 engine
          if (br.pos + bmSize.toLong > until) return None
          val slice = java.util.Arrays.copyOfRange(data, br.pos, br.pos + bmSize)
          val (gray, gotH) = CcittDecode.decode(slice,
            CcittDecode.Params(columns = tw, rows = hcHeight, k = -1)).getOrElse(return None)
          if (gotH < hcHeight) return None
          var i = 0
          while (i < tw * hcHeight) {
            coll(i) = (if (gray(i) == 0) 1 else 0).toByte
            i += 1
          }
          br.pos += bmSize
        }
        // split the collective bitmap into the class's symbols by width
        var x0 = 0
        widths.foreach { wd =>
          val bits = new Array[Byte](wd * hcHeight)
          var y = 0
          while (y < hcHeight) {
            System.arraycopy(coll, y * tw + x0, bits, y * wd, wd)
            y += 1
          }
          newSyms += Bitmap(wd, hcHeight, bits)
          x0 += wd
        }
      }
    }
    val all = inputSymbols ++ newSyms.result()
    // export runs (6.5.10): runlengths via Table B.1 in huffman mode
    val exT = StdTables(1)
    val exported = Seq.newBuilder[Bitmap]
    var exIndex = 0
    var exFlag = false
    var taken = 0
    while (exIndex < all.size && taken < numEx) {
      val run = exT.decode(br)
      if (run == OOB || run < 0) return None
      if (exFlag) {
        val upTo = math.min(exIndex + run, all.size)
        (exIndex until upTo).foreach { i =>
          if (taken < numEx) { exported += all(i); taken += 1 }
        }
      }
      exIndex += run
      exFlag = !exFlag
    }
    Some(exported.result())
  } catch { case _: Exception => None }

  /** Text region decode (T.88 6.4): arithmetic or huffman-coded (SBHUFF),
    * no refinement. Places referred-dictionary symbols onto the region
    * bitmap; None when unsupported features appear. `tables` = referred
    * custom table segments, in reference order.
    */
  private[graft] def decodeTextRegion(data: Array[Byte], from: Int, until: Int,
      w: Int, h: Int, symbols: Seq[Bitmap],
      tables: Seq[HTable] = Nil): Option[Array[Byte]] = try {
    if (until - from < 6 || symbols.isEmpty) return None
    val flags = ((data(from) & 0xff) << 8) | (data(from + 1) & 0xff)
    val sbhuff = (flags & 1) == 1
    val refine = ((flags >> 1) & 1) == 1
    val logStrips = (flags >> 2) & 3
    val refCorner = (flags >> 4) & 3
    val transposed = ((flags >> 6) & 1) == 1
    val combOp = (flags >> 7) & 3
    val defPixel = (flags >> 9) & 1
    var dsOffset = (flags >> 10) & 0x1f
    if (dsOffset > 15) dsOffset -= 32 // 5-bit signed
    val rtemplate = (flags >> 15) & 1
    if (refine && sbhuff) return None // huffman-coded refinement: out of scope
    val strips = 1 << logStrips
    var p = from + 2
    // SBRAT rides between the flags and the instance count (7.4.4.1.4)
    val rAt: Array[(Int, Int)] =
      if (refine && rtemplate == 0) {
        if (until - p < 4) return None
        val a = Array((data(p).toInt, data(p + 1).toInt),
          (data(p + 2).toInt, data(p + 3).toInt))
        p += 4
        a
      } else Array.empty

    // per-coding-mode decode callbacks feeding the shared strip loop
    var decDt: () => Int = null
    var decFs: () => Int = null
    var decDs: () => Int = null
    var decIt: () => Int = null
    var decId: () => Int = null
    // refinement (SBREFINE, arithmetic only): per-instance RI flag and
    // RDW/RDH/RDX/RDY through the shared MQ decoder, plus the refinement
    // contexts shared across instances
    var decRi: () => Int = null
    var decRd: Array[() => Int] = null
    var refineInst: (Bitmap, Int, Int, Int, Int) => Bitmap = null
    var numInstances = 0
    if (!sbhuff) {
      numInstances = be32(data, p).toInt; p += 4
      if (numInstances < 0 || numInstances > (1 << 20)) return None
      val mq = new MqDecoder(data, p, until)
      val iadt = new IntCtx; val iafs = new IntCtx
      val iads = new IntCtx; val iait = new IntCtx
      val codeLen = symCodeLen(symbols.size)
      val iaid = new Array[Int](1 << (codeLen + 1))
      decDt = () => decodeInt(mq, iadt)
      decFs = () => decodeInt(mq, iafs)
      decDs = () => decodeInt(mq, iads)
      decIt = () => if (strips == 1) 0 else decodeInt(mq, iait)
      decId = () => decodeIaid(mq, iaid, codeLen)
      if (refine) {
        val iari = new IntCtx
        val iardw = new IntCtx; val iardh = new IntCtx
        val iardx = new IntCtx; val iardy = new IntCtx
        val refCx = new Array[Int](1 << 13)
        decRi = () => decodeInt(mq, iari)
        decRd = Array(() => decodeInt(mq, iardw), () => decodeInt(mq, iardh),
          () => decodeInt(mq, iardx), () => decodeInt(mq, iardy))
        refineInst = (ref, rdw, rdh, rdx, rdy) => {
          val wi = ref.w + rdw; val hi = ref.h + rdh
          Bitmap(wi, hi, genericRefineInto(mq, refCx, wi, hi, rtemplate,
            tpgron = false, rAt, ref.bits, ref.w, ref.h,
            (rdw >> 1) + rdx, (rdh >> 1) + rdy))
        }
      }
    } else {
      // huffman flags (7.4.4.1.2): FS/DS/DT selections plus the
      // refinement-table selections, which still consume referred custom
      // table slots in the spec's assignment order even with REFINE off
      if (until - p < 2) return None
      val hf = ((data(p) & 0xff) << 8) | (data(p + 1) & 0xff); p += 2
      var customIx = 0
      def custom(): Option[HTable] = {
        val t = tables.lift(customIx); customIx += 1; t
      }
      val fsT = (hf & 3) match {
        case 0 => StdTables(6)
        case 3 => custom().getOrElse(return None)
        case _ => return None // B.7 selection: not in the transcribed set
      }
      val dsT = ((hf >> 2) & 3) match {
        case 0 => StdTables(8); case 1 => StdTables(9)
        case 3 => custom().getOrElse(return None)
        case _ => return None // B.10 selection: not in the transcribed set
      }
      val dtT = ((hf >> 4) & 3) match {
        case 0 => StdTables(11); case 1 => StdTables(12); case 2 => StdTables(13)
        case _ => custom().getOrElse(return None)
      }
      Seq((hf >> 6) & 3, (hf >> 8) & 3, (hf >> 10) & 3, (hf >> 12) & 3)
        .foreach(sel => if (sel == 3) custom(): Unit)
      if (((hf >> 14) & 1) == 1) custom(): Unit
      numInstances = be32(data, p).toInt; p += 4
      if (numInstances < 0 || numInstances > (1 << 20)) return None
      val br = new BitReader(data, p, until)
      // symbol ID code table (7.4.3.1.7): 35 4-bit runcode lengths, then
      // runcode-compressed symbol code lengths, byte-aligned at the end
      val runT = new HTable((0 until 35).map(i => HLine(br.bits(4), 0, i)))
      val symLens = new Array[Int](symbols.size)
      var i = 0
      var prevLen = 0
      while (i < symbols.size) {
        val c = runT.decode(br)
        if (c == OOB || c < 0 || c > 34) return None
        if (c < 32) { symLens(i) = c; prevLen = c; i += 1 }
        else {
          val (rep, len) = c match {
            case 32 => (3 + br.bits(2), prevLen)
            case 33 => (3 + br.bits(3), 0)
            case _ => (11 + br.bits(7), 0)
          }
          var j = 0
          while (j < rep) {
            if (i >= symbols.size) return None // run past the symbol count
            symLens(i) = len; i += 1; j += 1
          }
        }
      }
      br.align()
      val idT = new HTable(symLens.zipWithIndex.map { case (l, ix) => HLine(l, 0, ix) })
      decDt = () => dtT.decode(br)
      decFs = () => fsT.decode(br)
      decDs = () => dsT.decode(br)
      decIt = () => if (strips == 1) 0 else br.bits(logStrips)
      decId = () => idT.decode(br)
    }
    val out = if (defPixel == 1) Array.fill[Byte](w * h)(1) else new Array[Byte](w * h)
    def draw(bm: Bitmap, x0: Int, y0: Int): Unit = {
      var yy = 0
      while (yy < bm.h) {
        val py = y0 + yy
        if (py >= 0 && py < h) {
          var xx = 0
          while (xx < bm.w) {
            val px = x0 + xx
            if (px >= 0 && px < w) {
              val v = bm.bits(yy * bm.w + xx)
              val o = py * w + px
              out(o) = (combOp match {
                case 0 => out(o) | v
                case 1 => out(o) & v
                case 2 => out(o) ^ v
                case _ => ((out(o) ^ v) ^ 1) & 1
              }).toByte
            }
            xx += 1
          }
        }
        yy += 1
      }
    }
    val dt0 = decDt()
    if (dt0 == OOB) return None
    var stripT = -dt0 * strips
    var firstS = 0
    var n = 0
    while (n < numInstances) {
      val dt = decDt()
      if (dt == OOB) return None
      stripT += dt * strips
      var curS = 0
      var first = true
      var endOfStrip = false
      while (!endOfStrip && n < numInstances) {
        if (first) {
          val dfs = decFs()
          if (dfs == OOB) return None
          firstS += dfs; curS = firstS; first = false
        } else {
          val ids = decDs()
          if (ids == OOB) endOfStrip = true
          else curS += ids + dsOffset
        }
        if (!endOfStrip) {
          val curT = decIt()
          if (curT == OOB) return None
          val t = stripT + curT
          val id = decId()
          if (id < 0 || id >= symbols.size) return None
          val sym = symbols(id)
          // SBREFINE: an instance may arrive as a refinement of its
          // dictionary symbol, possibly resized (6.4.11) — placement and
          // the S advance then use the INSTANCE dimensions
          val bm =
            if (!refine) sym
            else {
              val ri = decRi()
              if (ri == OOB) return None
              if (ri == 0) sym
              else {
                val rdw = decRd(0)(); val rdh = decRd(1)()
                val rdx = decRd(2)(); val rdy = decRd(3)()
                if (rdw == OOB || rdh == OOB || rdx == OOB || rdy == OOB)
                  return None
                val wi = sym.w.toLong + rdw; val hi = sym.h.toLong + rdh
                if (wi <= 0 || hi <= 0 || wi * hi > MaxPixels) return None
                refineInst(sym, rdw, rdh, rdx, rdy)
              }
            }
          if (!transposed) {
            val y0 = if (refCorner == 0 || refCorner == 2) t - bm.h + 1 else t
            draw(bm, curS, y0)
            curS += bm.w - 1
          } else {
            val x0 = if (refCorner == 0 || refCorner == 1) t else t - bm.w + 1
            draw(bm, x0, curS)
            curS += bm.h - 1
          }
          n += 1
        }
      }
    }
    Some(out)
  } catch { case _: Exception => None }

  // ---- segment structure (T.88 7.2; embedded = no file header) ----

  private[unstructured] final case class Seg(num: Long, segType: Int,
      dataOff: Int, dataLen: Int, refs: Seq[Long] = Nil)

  private def be32(data: Array[Byte], o: Int): Long =
    ((data(o) & 0xffL) << 24) | ((data(o + 1) & 0xffL) << 16) |
      ((data(o + 2) & 0xffL) << 8) | (data(o + 3) & 0xffL)

  /** Walk the embedded stream's segment headers; stops cleanly at
    * truncation or an unknown-length segment.
    */
  private[unstructured] def segments(data: Array[Byte]): Seq[Seg] = {
    val out = Seq.newBuilder[Seg]
    var off = 0
    try {
      var stop = false
      while (!stop && off + 11 <= data.length) {
        val segNum = be32(data, off)
        val flags = data(off + 4) & 0xff
        val segType = flags & 0x3f
        var p = off + 5
        val rtByte = data(p) & 0xff
        val rtCount =
          if ((rtByte >>> 5) == 7) {
            val c = (be32(data, p) & 0x1fffffffL).toInt
            p += 4 + ((c + 8) / 8)
            c
          } else { p += 1; rtByte >>> 5 }
        val refSize = if (segNum <= 256) 1 else if (segNum <= 65536) 2 else 4
        val refs = (0 until rtCount).map { k =>
          val o = p + k * refSize
          refSize match {
            case 1 => (data(o) & 0xffL)
            case 2 => ((data(o) & 0xffL) << 8) | (data(o + 1) & 0xffL)
            case _ => be32(data, o)
          }
        }
        p += rtCount * refSize
        p += (if ((flags & 0x40) != 0) 4 else 1)
        val dataLen = be32(data, p); p += 4
        if (dataLen == 0xffffffffL || p + dataLen > data.length) stop = true
        else {
          out += Seg(segNum, segType, p, dataLen.toInt, refs)
          off = p + dataLen.toInt
        }
      }
    } catch { case _: Exception => () }
    out.result()
  }

  private val RegionTypes = Set(4, 6, 7, 20, 22, 23, 36, 38, 39, 40, 42, 43)
  private val GenericRegionTypes = Set(36, 38, 39)

  /** (width, height) from segment headers only — page info preferred,
    * any region's geometry as the fallback. No payload decode.
    */
  def dims(data: Array[Byte]): Option[(Int, Int)] = {
    var page: Option[(Int, Int)] = None
    var region: Option[(Int, Int)] = None
    segments(data).foreach { s =>
      if (s.dataLen >= 8) {
        val w = be32(data, s.dataOff); val h = be32(data, s.dataOff + 4)
        // both axes must fit an Int BEFORE .toInt: a hostile header with a
        // dimension in (Int.MaxValue, 2^32) would otherwise surface as a
        // negative width/height (decodePage has the MaxPixels guard; the
        // header-only path needs its own bound)
        val sane = w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue
        if (s.segType == 48 && page.isEmpty && sane)
          page = Some((w.toInt, h.toInt))
        else if (RegionTypes.contains(s.segType) && region.isEmpty && sane)
          region = Some((w.toInt, h.toInt))
      }
    }
    page.orElse(region)
  }

  private val MaxPixels = 64 << 20 // 64 Mpx cap: a lying header cannot OOM

  /** A decoded region, or (refinement) a deferred decode that needs the
    * page content under its rectangle as the reference bitmap — composition
    * is sequential in segment order, so the reference is exactly the page
    * state all earlier regions produced (T.88 6.3.2).
    */
  private final case class Region(x: Int, y: Int, w: Int, h: Int,
      bits: Array[Byte], combOp: Int,
      refiner: Array[Byte] => Array[Byte] = null)

  /** Decode the whole embedded stream into a gray page raster (black =
    * 0x00, white = 0xFF) — generic regions only; None when the stream
    * needs symbol/text/halftone/refinement decoding or is malformed.
    */
  def decodePage(data: Array[Byte]): Option[(Array[Byte], Int, Int)] = try {
    val segs = segments(data)
    if (segs.isEmpty) return None
    var pw = -1L; var ph = -1L; var defPixel = 0
    val regions = Seq.newBuilder[Region]
    var nRegions = 0
    // exported symbols per symbol-dictionary segment, consumed by text
    // regions through their referred-segment lists
    val symbolsBySeg = scala.collection.mutable.Map.empty[Long, Seq[Bitmap]]
    // custom huffman tables (type 53), consumed by huffman-coded
    // dictionaries and text regions in referred order
    val tablesBySeg = scala.collection.mutable.Map.empty[Long, HTable]
    // pattern dictionaries (type 16), consumed by halftone regions
    val patternsBySeg = scala.collection.mutable.Map.empty[Long, Seq[Bitmap]]
    // intermediate regions (type 36/40), consumed as refinement references
    val intermediateBySeg = scala.collection.mutable.Map.empty[Long, Bitmap]
    segs.foreach { s =>
      s.segType match {
        case 48 if s.dataLen >= 17 => // page information (7.4.8)
          pw = be32(data, s.dataOff)
          ph = be32(data, s.dataOff + 4) // 0xffffffff = striped/unknown
          defPixel = (data(s.dataOff + 16) >> 2) & 1
        case 0 => // symbol dictionary (7.4.3)
          val inputs = s.refs.flatMap(symbolsBySeg.getOrElse(_, Nil))
          symbolsBySeg(s.num) = decodeSymbolDict(data, s.dataOff,
            s.dataOff + s.dataLen, inputs,
            s.refs.flatMap(tablesBySeg.get)).getOrElse(return None)
        case 53 => // custom huffman table (7.4.13 / B.2)
          tablesBySeg(s.num) = parseTableSegment(data, s.dataOff,
            s.dataOff + s.dataLen).getOrElse(return None)
        case 6 | 7 => // immediate (lossless) text region (7.4.4)
          if (s.dataLen < 19) return None
          val o = s.dataOff
          val w = be32(data, o).toInt; val h = be32(data, o + 4).toInt
          val x = be32(data, o + 8).toInt; val y = be32(data, o + 12).toInt
          val combOp = data(o + 16) & 0x7
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
          val syms = s.refs.flatMap(symbolsBySeg.getOrElse(_, Nil))
          val bits = decodeTextRegion(data, o + 17, o + s.dataLen, w, h, syms,
            s.refs.flatMap(tablesBySeg.get)).getOrElse(return None)
          regions += Region(x, y, w, h, bits, combOp)
          nRegions += 1
        case t if GenericRegionTypes.contains(t) =>
          // region segment info (7.4.1): W H X Y extCombOp
          if (s.dataLen < 18) return None
          val o = s.dataOff
          val w = be32(data, o).toInt; val h = be32(data, o + 4).toInt
          val x = be32(data, o + 8).toInt; val y = be32(data, o + 12).toInt
          val combOp = data(o + 16) & 0x7
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
          // generic region segment flags (7.4.6.2)
          val gf = data(o + 17) & 0xff
          val mmr = (gf & 1) == 1
          val template = (gf >> 1) & 3
          val tpgdon = ((gf >> 3) & 1) == 1
          var p = o + 18
          val at: Array[(Int, Int)] =
            if (mmr) Array.empty
            else {
              val nAt = if (template == 0) 4 else 1
              val a = (0 until nAt).map(k =>
                (data(p + 2 * k).toInt, data(p + 2 * k + 1).toInt)).toArray
              p += 2 * nAt
              a
            }
          val bits: Array[Byte] =
            if (mmr) {
              // T.6-coded: reuse the CCITT G4 engine (k < 0 = pure 2D)
              val slice = java.util.Arrays.copyOfRange(data, p, s.dataOff + s.dataLen)
              val (gray, gotH) = CcittDecode.decode(slice,
                CcittDecode.Params(columns = w, rows = h, k = -1)).getOrElse(return None)
              if (gotH < h) return None
              gray.take(w * h).map(g => if (g == 0) 1.toByte else 0.toByte)
            } else decodeGenericMq(data, p, s.dataOff + s.dataLen, w, h,
              template, tpgdon, at)
          if (s.segType == 36) {
            // INTERMEDIATE region (6.8.1): not composited — it exists only
            // as a reference for a later refinement region
            intermediateBySeg(s.num) = Bitmap(w, h, bits)
          } else {
            regions += Region(x, y, w, h, bits, combOp)
            nRegions += 1
          }
        case 16 => // pattern dictionary (7.4.4)
          patternsBySeg(s.num) = decodePatternDict(data, s.dataOff,
            s.dataOff + s.dataLen).getOrElse(return None)
        case 22 | 23 => // immediate (lossless) halftone region (7.4.5)
          if (s.dataLen < 18) return None
          val o = s.dataOff
          val w = be32(data, o).toInt; val h = be32(data, o + 4).toInt
          val x = be32(data, o + 8).toInt; val y = be32(data, o + 12).toInt
          val combOp = data(o + 16) & 0x7
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
          val pats = s.refs.flatMap(patternsBySeg.getOrElse(_, Nil))
          val bits = decodeHalftoneRegion(data, o + 17, s.dataOff + s.dataLen,
            w, h, pats).getOrElse(return None)
          regions += Region(x, y, w, h, bits, combOp)
          nRegions += 1
        case 40 | 42 | 43 => // generic refinement region (7.4.7)
          if (s.dataLen < 18) return None
          val o = s.dataOff
          val w = be32(data, o).toInt; val h = be32(data, o + 4).toInt
          val x = be32(data, o + 8).toInt; val y = be32(data, o + 12).toInt
          val combOp = data(o + 16) & 0x7
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
          // refinement region segment flags (7.4.7.2)
          val rf = data(o + 17) & 0xff
          val template = rf & 1
          val tpgron = ((rf >> 1) & 1) == 1
          var p = o + 18
          val at: Array[(Int, Int)] =
            if (template != 0) Array.empty
            else {
              // template 0 carries 4 GRAT bytes after the flags (7.4.7.3):
              // reject short segments instead of consuming the next
              // segment's bytes (same guard as the symbol-dict header)
              if (s.dataLen < 22) return None
              val a = (0 until 2).map(k =>
                (data(p + 2 * k).toInt, data(p + 2 * k + 1).toInt)).toArray
              p += 4
              a
            }
          val dataEnd = s.dataOff + s.dataLen
          val p0 = p
          def refineNow(ref: Bitmap): Array[Byte] =
            genericRefineInto(new MqDecoder(data, p0, dataEnd),
              new Array[Int](1 << 13), w, h, template, tpgron, at,
              ref.bits, ref.w, ref.h, 0, 0)
          // a referred INTERMEDIATE region is the reference (6.3.2);
          // without one, the reference is the page under (x,y,w,h) at
          // composition time (deferred through Region.refiner)
          val interRef = s.refs.flatMap(intermediateBySeg.get).headOption
          if (s.segType == 40) { // intermediate: store, never composite
            val ref = interRef.getOrElse(return None)
            intermediateBySeg(s.num) = Bitmap(w, h, refineNow(ref))
          } else {
            interRef match {
              case Some(ref) =>
                regions += Region(x, y, w, h, refineNow(ref), combOp)
              case None =>
                regions += Region(x, y, w, h, null, combOp,
                  refiner = pageRef => genericRefineInto(
                    new MqDecoder(data, p0, dataEnd),
                    new Array[Int](1 << 13), w, h, template, tpgron, at,
                    pageRef, w, h, 0, 0))
            }
            nRegions += 1
          }
        case t if RegionTypes.contains(t) =>
          return None // intermediate text/halftone regions: out of scope
        case _ => () // page end, end-of-stripe, extensions: structural only
      }
    }
    if (nRegions == 0) return None
    val rs = regions.result()
    val w = (if (pw > 0) pw else rs.map(r => (r.x + r.w).toLong).max).toInt
    val h = (if (ph > 0 && ph < 0xffffffffL) ph
      else rs.map(r => (r.y + r.h).toLong).max).toInt
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    val page = Array.fill[Byte](w * h)(defPixel.toByte)
    rs.foreach { r =>
      val bits =
        if (r.refiner == null) r.bits
        else {
          // materialize the reference: current page content under the
          // region rectangle (out-of-page reads as the default pixel)
          val ref = new Array[Byte](r.w * r.h)
          var yy = 0
          while (yy < r.h) {
            val py = r.y + yy
            var xx = 0
            while (xx < r.w) {
              val px = r.x + xx
              ref(yy * r.w + xx) =
                if (px >= 0 && px < w && py >= 0 && py < h) page(py * w + px)
                else defPixel.toByte
              xx += 1
            }
            yy += 1
          }
          r.refiner(ref)
        }
      var yy = 0
      while (yy < r.h) {
        val py = r.y + yy
        if (py >= 0 && py < h) {
          var xx = 0
          while (xx < r.w) {
            val px = r.x + xx
            if (px >= 0 && px < w) {
              val v = bits(yy * r.w + xx)
              val o = py * w + px
              page(o) = (r.combOp match {
                case 0 => page(o) | v // OR
                case 1 => page(o) & v // AND
                case 2 => page(o) ^ v // XOR
                case 3 => ((page(o) ^ v) ^ 1) & 1 // XNOR
                case _ => v.toInt // REPLACE
              }).toByte
            }
            xx += 1
          }
        }
        yy += 1
      }
    }
    Some((page.map(b => if (b != 0) 0x00.toByte else 0xff.toByte), w, h))
  } catch { case _: Exception => None }
}
