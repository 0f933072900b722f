package graft.sources.unstructured

import Jbig2Decode.MqDecoder

/** Native JPEG2000 Part 1 (ISO/IEC 15444-1 / ITU-T T.800) DECODER for the
  * `/JPXDecode` streams scanned PDFs embed — the pixel path the reference
  * gets from PDFBox + its JPEG2000 plugin
  * (reference: datasources/v2/pdf/PdfReaderFactory.scala:52-67). Geometry
  * parsing (ihdr / SIZ) has been native since r11 ([[PdfText.jpxDims]]);
  * this adds the raster so JPX pages feed perceptual dedup like
  * DCT/CCITT/JBIG2 pages already do.
  *
  * Supported subset (the shape PDF encoders emit by default):
  *  - JP2 box container or raw codestream; multiple tiles + tile-parts;
  *  - COD/COC/QCD/QCC main- and tile-header overrides; all five
  *    progression orders (packet sequence materialized via sort keys);
  *    SOP/EPH markers; explicit or default precincts;
  *  - EBCOT Tier-1 with the standard three-pass schedule, run-length and
  *    segmentation-symbol modes, and the FULL code-block style matrix:
  *    selective arithmetic coding BYPASS (lazy mode, raw SP/MR segments
  *    on the 10/2/1 schedule with per-segment packet-header lengths),
  *    RESET (contexts re-initialized every pass), TERMALL (one terminated
  *    segment per pass), VCAUSAL (stripe-causal context formation), and
  *    predictable termination (decoder no-op);
  *  - 5/3 reversible (bit-exact) and 9/7 irreversible inverse DWT;
  *    RCT / ICT; reversible no-quant and scalar derived/expounded
  *    dequantization; multiple quality layers; PPM / PPT packed packet
  *    headers (headers from the marker-segment stream, bodies from the
  *    bitstream); POC progression-order changes (packet sequence follows
  *    the POC entry list, A.6.6).
  *
  * Remaining residue is Part-2 (ISO/IEC 15444-2) extensions only
  * (arbitrary MCT, non-standard wavelets), which mainstream PDF encoders
  * do not emit; such codestreams reject to None (metadata fallback).
  *
  * The MQ coder is the same T.88 engine JBIG2 uses ([[Jbig2Decode.MqDecoder]],
  * pinned from both sides in Jbig2Suite); JPEG2000 differs only in context
  * count (19) and initial states (T.800 Table D.7).
  */
private[graft] object JpxDecode {

  private val MaxPixels = 64L * 1024 * 1024

  // ---- geometry helpers ----
  private def ceilDiv(a: Int, b: Int): Int = Math.floorDiv(a + b - 1, b)
  private def ceilShift(a: Int, s: Int): Int = ceilDiv(a, 1 << s)

  private[unstructured] final case class Comp(depth: Int, signed: Boolean, dx: Int, dy: Int)
  private[unstructured] final case class Siz(xsiz: Int, ysiz: Int, x0: Int, y0: Int,
      xt: Int, yt: Int, xt0: Int, yt0: Int, comps: Array[Comp])
  /** precincts(r) = PPx | PPy<<4 (15/15 when not explicitly signalled). */
  private[unstructured] final case class Cod(progression: Int, layers: Int, mct: Int,
      levels: Int, cbw: Int, cbh: Int, cbStyle: Int, transform: Int,
      precincts: Array[Int], sop: Boolean, eph: Boolean)
  /** One POC (progression order change) entry: packets of res [rs, re) x
    * comp [cs, ce) x layer [0, lye) follow progression `ppoc` (A.6.6).
    */
  private[unstructured] final case class Poc(rs: Int, cs: Int, lye: Int,
      re: Int, ce: Int, ppoc: Int)
  private[unstructured] final case class Qcd(style: Int, guard: Int,
      exps: Array[Int], mants: Array[Int])

  // ---- tag tree (T.800 B.10.2) ----
  private[unstructured] final class TagTree(w: Int, h: Int) {
    private val dims = {
      val b = Seq.newBuilder[(Int, Int)]
      var (cw, ch) = (w, h)
      b += ((cw, ch))
      while (cw > 1 || ch > 1) { cw = ceilDiv(cw, 2); ch = ceilDiv(ch, 2); b += ((cw, ch)) }
      b.result()
    }
    private val off = dims.scanLeft(0)((acc, d) => acc + d._1 * d._2)
    private val n = off.last
    val value = Array.fill(n)(Int.MaxValue) // unknown
    val low = new Array[Int](n)

    private def nodeAt(level: Int, i: Int, j: Int): Int =
      off(level) + j * dims(level)._1 + i

    /** Decodes towards leaf (i,j) with `threshold`; returns true iff the
      * leaf's value is known to be < threshold. `readBit` supplies header
      * bits. Mirrors the standard's procedure: a 1-bit pins the node's
      * value at its current lower bound; a 0-bit raises the bound.
      */
    def decode(i: Int, j: Int, threshold: Int, readBit: () => Int): Boolean = {
      val path = new Array[Int](dims.length)
      var (ci, cj) = (i, j)
      var lvl = 0
      while (lvl < dims.length) {
        path(lvl) = nodeAt(lvl, ci, cj); ci >>= 1; cj >>= 1; lvl += 1
      }
      var lo = 0
      lvl = dims.length - 1
      while (lvl >= 0) {
        val nd = path(lvl)
        if (lo > low(nd)) low(nd) = lo else lo = low(nd)
        while (lo < threshold && lo < value(nd)) {
          if (readBit() == 1) value(nd) = lo else lo += 1
        }
        low(nd) = lo
        lvl -= 1
      }
      value(path(0)) < threshold
    }
  }

  // ---- packet-header bit reader with 0xFF stuffing (B.10.1) ----
  private[unstructured] final class HdrReader(data: Array[Byte], var pos: Int, val end: Int) {
    private var cur = 0
    private var bits = 0
    def bit(): Int = {
      if (bits == 0) {
        val stuffed = cur == 0xff
        if (pos >= end) throw new IllegalStateException("jpx: header overrun")
        cur = data(pos) & 0xff; pos += 1
        bits = if (stuffed) 7 else 8
      }
      bits -= 1
      (cur >>> bits) & 1
    }
    def read(n: Int): Int = { var v = 0; var k = 0; while (k < n) { v = (v << 1) | bit(); k += 1 }; v }
    /** Byte-aligns after the last header bit; a header ending in a full
      * 0xFF byte owns the following stuffed byte too.
      */
    def align(): Unit = { bits = 0; if (cur == 0xff) { if (pos < end) pos += 1; cur = 0 } }
  }

  private def numPasses(h: HdrReader): Int = {
    if (h.bit() == 0) return 1
    if (h.bit() == 0) return 2
    val n = h.read(2)
    if (n != 3) return 3 + n
    val m = h.read(5)
    if (m != 31) return 6 + m
    37 + h.read(7)
  }

  // ---- per-tile structures ----
  private final class Cblk(val x0: Int, val y0: Int, val x1: Int, val y1: Int) {
    var included = false
    var missing = 0
    var passes = 0
    var lblock = 3
    /** Codeword segments in arrival order. Without BYPASS there is exactly
      * one unbounded MQ segment; with BYPASS (T.800 D.4 lazy mode) the
      * schedule is 10 MQ passes, then alternating raw (SP+MR, 2 passes)
      * and MQ (cleanup, 1 pass) terminated segments.
      */
    val segs = scala.collection.mutable.ArrayBuffer.empty[CbSeg]
    def nextSeg(bypass: Boolean, termall: Boolean): CbSeg = {
      if (segs.nonEmpty && segs.last.passes < segs.last.maxPasses) segs.last
      else {
        val ix = segs.length
        val s =
          if (termall) {
            // every pass its own terminated segment; raw-ness follows the
            // lazy-mode pass schedule when BYPASS rides along
            val assigned = segs.iterator.map(_.passes).sum
            new CbSeg(raw = bypass && isRawPass(assigned), 1)
          }
          else if (!bypass) new CbSeg(raw = false, Int.MaxValue)
          else if (ix == 0) new CbSeg(raw = false, 10)
          else if (ix % 2 == 1) new CbSeg(raw = true, 2)
          else new CbSeg(raw = false, 1)
        segs += s
        s
      }
    }
  }

  /** Is absolute pass `k` (0-based) raw under lazy mode? SP/MR from the
    * 11th pass onward (T.800 D.4: the first 10 passes stay MQ-coded).
    */
  private[unstructured] def isRawPass(k: Int): Boolean =
    k >= 10 && (k - 10) % 3 <= 1
  private final class CbSeg(val raw: Boolean, val maxPasses: Int) {
    var passes = 0
    val chunks = Seq.newBuilder[(Int, Int)] // (offset, len) into tile stream
  }

  /** Raw (arithmetic-bypass) bit reader for lazy-mode SP/MR passes — MSB
    * first with the T.800 stuffing rule: a byte following 0xFF carries only
    * 7 data bits, and a marker-range byte (> 0x8F) after 0xFF, or running
    * off the segment, yields all-ones filler.
    */
  private final class RawDecoder(data: Array[Byte], from: Int, until: Int) {
    private var bp = from
    private var c = 0
    private var ct = 0
    def bit(): Int = {
      if (ct == 0) {
        if (c == 0xff) {
          if (bp >= until || (data(bp) & 0xff) > 0x8f) { c = 0xff; ct = 8 }
          else { c = data(bp) & 0xff; bp += 1; ct = 7 }
        } else if (bp < until) { c = data(bp) & 0xff; bp += 1; ct = 8 }
        else { c = 0xff; ct = 8 }
      }
      ct -= 1
      (c >>> ct) & 1
    }
  }
  private final class Band(val orient: Int, val x0: Int, val y0: Int,
      val x1: Int, val y1: Int, val cbExpX: Int, val cbExpY: Int) {
    var data: Array[Int] = null // sign-magnitude per sample after T1
    def w: Int = x1 - x0
    def h: Int = y1 - y0
  }
  private final class Prec(val bands: Array[(Band, Array[Cblk], TagTree, TagTree, Int, Int)])
  // bands entry: (band, cblks raster, inclTree, zeroTree, cbCols, cbRows)

  private final class Res(val r: Int, val x0: Int, val y0: Int, val x1: Int, val y1: Int,
      val ppx: Int, val ppy: Int, val numpw: Int, val numph: Int,
      val bands: Array[Band], val precs: Array[Prec])

  // ---- marker segment parsing ----
  private final class Reader(val data: Array[Byte]) {
    var pos = 0
    def u8: Int = { val v = data(pos) & 0xff; pos += 1; v }
    def u16: Int = { val v = ((data(pos) & 0xff) << 8) | (data(pos + 1) & 0xff); pos += 2; v }
    def u32: Long = { val v = ((data(pos) & 0xffL) << 24) | ((data(pos + 1) & 0xffL) << 16) |
      ((data(pos + 2) & 0xffL) << 8) | (data(pos + 3) & 0xffL); pos += 4; v }
    def remaining: Int = data.length - pos
  }

  private def u32Int(v: Long): Int = {
    if (v > Int.MaxValue) throw new IllegalStateException("jpx: dim overflow"); v.toInt
  }

  /** Locates the raw codestream: JP2 signature box → walk to `jp2c`, else
    * the payload must start with SOC.
    */
  private[unstructured] def codestream(data: Array[Byte]): Option[(Int, Int)] = {
    if (data.length >= 4 && (data(0) & 0xff) == 0xff && (data(1) & 0xff) == 0x4f)
      return Some((0, data.length))
    var p = 0
    while (p + 8 <= data.length) {
      val len = ((data(p) & 0xffL) << 24) | ((data(p + 1) & 0xffL) << 16) |
        ((data(p + 2) & 0xffL) << 8) | (data(p + 3) & 0xffL)
      val typ = ((data(p + 4) & 0xffL) << 24) | ((data(p + 5) & 0xffL) << 16) |
        ((data(p + 6) & 0xffL) << 8) | (data(p + 7) & 0xffL)
      var body = p + 8
      var next = if (len == 0) data.length.toLong else p + len
      if (len == 1) { // XLbox
        if (p + 16 > data.length) return None
        var xl = 0L
        var i = p + 8
        while (i < p + 16) { xl = (xl << 8) | (data(i) & 0xff); i += 1 }
        body = p + 16; next = p + xl
      }
      if (next > data.length || next <= p) return None
      if (typ == 0x6a703263L) return Some((body, next.toInt)) // jp2c
      p = next.toInt
    }
    None
  }

  private def parseCod(r: Reader, len: Int): Cod = {
    val end = r.pos + len - 2
    val scod = r.u8
    val prog = r.u8
    val layers = r.u16
    val mct = r.u8
    val levels = r.u8
    val cbw = (r.u8 & 0x0f) + 2
    val cbh = (r.u8 & 0x0f) + 2
    val style = r.u8
    val transform = r.u8
    val precincts = Array.fill(levels + 1)(0xff) // 15|15<<4
    if ((scod & 1) != 0) {
      var i = 0
      while (i <= levels && r.pos < end) { precincts(i) = r.u8; i += 1 }
    }
    r.pos = end
    Cod(prog, layers, mct, levels, cbw, cbh, style, transform, precincts,
      (scod & 2) != 0, (scod & 4) != 0)
  }

  private def parseQcd(r: Reader, len: Int, levels: Int): Qcd = {
    val end = r.pos + len - 2
    val s = r.u8
    val style = s & 0x1f
    val guard = (s >>> 5) & 7
    val nb = 3 * levels + 1
    val exps = new Array[Int](nb)
    val mants = new Array[Int](nb)
    style match {
      case 0 => // no quantization: one byte per subband present
        var i = 0
        while (i < nb) {
          val v = if (r.pos < end) r.u8 else exps(math.max(0, i - 1)) << 3
          exps(i) = v >>> 3; i += 1
        }
      case 1 => // derived: single (exp, mant)
        val v = r.u16; exps(0) = v >>> 11; mants(0) = v & 0x7ff
      case _ => // expounded
        var i = 0
        while (i < nb) {
          val v = if (r.pos + 1 < end + 1 && r.pos + 2 <= end) r.u16
            else ((exps(math.max(0, i - 1)) << 11) | mants(math.max(0, i - 1)))
          exps(i) = v >>> 11; mants(i) = v & 0x7ff; i += 1
        }
    }
    r.pos = end
    Qcd(style, guard, exps, mants)
  }

  /** (εb, μb, Rb-gain-log) for band `orient` at decomposition such that the
    * band sits `nb` levels down; bandIdx indexes QCD's subband order
    * (LL, then per resolution HL, LH, HH).
    */
  private def bandQuant(q: Qcd, bandIdx: Int, nb: Int): (Int, Int) = q.style match {
    case 1 => (q.exps(0) - nb + 1, q.mants(0)) // derived (E.1.1: ε0 − NL + nb)
    case _ => (q.exps(math.min(bandIdx, q.exps.length - 1)),
      q.mants(math.min(bandIdx, q.mants.length - 1)))
  }

  // =================== Tier-1: EBCOT block decoder ===================

  private val SIG = 1
  private val VISIT = 2
  private val REF = 4
  private val NEG = 8

  /** ZC context (T.800 Table D.1). orient: 0=LL, 1=HL, 2=LH, 3=HH. */
  private[unstructured] def zcCtx(orient: Int, h0: Int, v0: Int, d: Int): Int = {
    // HL is the transpose of LL/LH
    val (h, v) = if (orient == 1) (v0, h0) else (h0, v0)
    if (orient == 3) {
      if (d >= 3) 8
      else if (d == 2) { if (h + v >= 1) 7 else 6 }
      else if (d == 1) { if (h + v >= 2) 5 else if (h + v == 1) 4 else 3 }
      else { if (h + v >= 2) 2 else if (h + v == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (d >= 1) 6 else 5 }
      else { // h == 0
        if (v == 2) 4 else if (v == 1) 3
        else if (d >= 2) 2 else if (d == 1) 1 else 0
      }
    }
  }

  /** Sign context + xor bit (Table D.3): hc/vc in [-1,1]. */
  private[unstructured] def scCtx(hc: Int, vc: Int): (Int, Int) = (hc: @unchecked) match {
    case 1 => vc match { case 1 => (13, 0); case 0 => (12, 0); case _ => (11, 0) }
    case 0 => vc match { case 1 => (10, 0); case 0 => (9, 0); case _ => (10, 1) }
    case -1 => vc match { case 1 => (11, 1); case 0 => (12, 1); case _ => (13, 1) }
  }

  private val CtxRL = 17
  private val CtxUNI = 18

  private def freshCtx(): Array[Int] = {
    val cx = new Array[Int](19)
    cx(CtxUNI) = 46 << 1
    cx(CtxRL) = 3 << 1
    cx(0) = 4 << 1
    cx
  }

  /** Decodes one code block into sign-magnitude ints (NEG flag folded into
    * the returned array's sign). `mb` = Mb total bitplanes, `missing` =
    * zero bitplanes, `passes` = coding passes present. Single-MQ-segment
    * convenience over [[t1DecodeSegs]] (the no-BYPASS shape).
    */
  private[unstructured] def t1Decode(data: Array[Byte], from: Int, until: Int,
      w: Int, h: Int, orient: Int, mb: Int, missing: Int, passes0: Int,
      segSym: Boolean): Array[Int] = {
    val buf = java.util.Arrays.copyOfRange(data, from, until)
    t1DecodeSegs(Array((buf, false, passes0)), w, h, orient, mb, missing,
      passes0, if (segSym) 0x20 else 0)
  }

  /** Segment-aware Tier-1: `segs` = (bytes, isRaw, passes) per codeword
    * segment in pass order; `cbStyle` is the COD code-block style byte.
    * MQ segments re-init the MQ decoder at their boundary while the 19
    * contexts persist (T.800 D.4.1) — unless RESET (0x02), which
    * re-initializes the contexts at EVERY pass boundary; raw segments
    * (lazy-mode SP/MR pairs) read stuffed raw bits — significance and
    * refinement bits uncoded, sign as a plain bit with no prediction.
    * VCAUSAL (0x08) caps context formation at the current stripe's last
    * row (D.6); segmentation symbols (0x20) close each cleanup pass.
    */
  private[unstructured] def t1DecodeSegs(segs: Array[(Array[Byte], Boolean, Int)],
      w: Int, h: Int, orient: Int, mb: Int, missing: Int, passes0: Int,
      cbStyle: Int): Array[Int] = {
    val segSym = (cbStyle & 0x20) != 0
    val resetCtx = (cbStyle & 0x02) != 0
    val vcausal = (cbStyle & 0x08) != 0
    val flags = new Array[Int](w * h)
    val mag = new Array[Int](w * h)
    val cx = freshCtx()
    var mq: MqDecoder = null
    var raw: RawDecoder = null
    var isRaw = false
    var segIx = -1
    var segPassLeft = 0
    // advance to the segment holding the next pass; re-init its reader
    def beginPass(): Unit = {
      while (segPassLeft == 0 && segIx + 1 < segs.length) {
        segIx += 1
        val (buf, r, np) = segs(segIx)
        segPassLeft = np
        if (np > 0) {
          isRaw = r
          if (r) { raw = new RawDecoder(buf, 0, buf.length); mq = null }
          else { mq = new MqDecoder(buf, 0, buf.length); raw = null }
        }
      }
      segPassLeft -= 1
    }

    // VCAUSAL: context formation must not reach past the current stripe's
    // last row; the stripe loops keep this cap current
    var causalCap = Int.MaxValue
    @inline def at(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h || y >= causalCap) 0
      else flags(y * w + x)
    @inline def sigN(x: Int, y: Int): (Int, Int, Int) = {
      var hh = 0; var vv = 0; var dd = 0
      if ((at(x - 1, y) & SIG) != 0) hh += 1
      if ((at(x + 1, y) & SIG) != 0) hh += 1
      if ((at(x, y - 1) & SIG) != 0) vv += 1
      if ((at(x, y + 1) & SIG) != 0) vv += 1
      if ((at(x - 1, y - 1) & SIG) != 0) dd += 1
      if ((at(x + 1, y - 1) & SIG) != 0) dd += 1
      if ((at(x - 1, y + 1) & SIG) != 0) dd += 1
      if ((at(x + 1, y + 1) & SIG) != 0) dd += 1
      (hh, vv, dd)
    }
    @inline def contrib(f: Int): Int =
      if ((f & SIG) == 0) 0 else if ((f & NEG) != 0) -1 else 1
    def decodeSign(x: Int, y: Int): Unit = {
      val hc = math.max(-1, math.min(1, contrib(at(x - 1, y)) + contrib(at(x + 1, y))))
      val vc = math.max(-1, math.min(1, contrib(at(x, y - 1)) + contrib(at(x, y + 1))))
      val (c, xor) = scCtx(hc, vc)
      if ((mq.decode(cx, c) ^ xor) == 1) flags(y * w + x) |= NEG
    }
    @inline def stripeStart(k: Int): Unit =
      if (vcausal) causalCap = k + 4

    var bp = mb - 1 - missing
    var pass = 0 // 0 = cleanup (first plane), then cycles sigprop(1)/magref(2)/cleanup(0)
    var left = passes0
    var first = true
    while (left > 0 && bp >= 0) {
      val kind = if (first) 2 else pass
      beginPass()
      if (resetCtx) System.arraycopy(freshCtx(), 0, cx, 0, cx.length)
      kind match {
        case 0 => // significance propagation
          var k = 0
          while (k < h) {
            stripeStart(k)
            var x = 0
            while (x < w) {
              var y = k
              while (y < math.min(k + 4, h)) {
                val i = y * w + x
                if ((flags(i) & SIG) == 0) {
                  val (hh, vv, dd) = sigN(x, y)
                  if (hh + vv + dd > 0) {
                    if (isRaw) {
                      // lazy mode: significance then sign as plain bits
                      if (raw.bit() == 1) {
                        flags(i) |= SIG; mag(i) |= 1 << bp
                        if (raw.bit() == 1) flags(i) |= NEG
                      }
                    } else if (mq.decode(cx, zcCtx(orient, hh, vv, dd)) == 1) {
                      flags(i) |= SIG; mag(i) |= 1 << bp; decodeSign(x, y)
                    }
                    flags(i) |= VISIT
                  }
                }
                y += 1
              }
              x += 1
            }
            k += 4
          }
        case 1 => // magnitude refinement
          var k = 0
          while (k < h) {
            stripeStart(k)
            var x = 0
            while (x < w) {
              var y = k
              while (y < math.min(k + 4, h)) {
                val i = y * w + x
                if ((flags(i) & SIG) != 0 && (flags(i) & VISIT) == 0) {
                  if (isRaw) {
                    if (raw.bit() == 1) mag(i) |= 1 << bp
                  } else {
                    val c = if ((flags(i) & REF) != 0) 16 else {
                      val (hh, vv, dd) = sigN(x, y)
                      if (hh + vv + dd > 0) 15 else 14
                    }
                    if (mq.decode(cx, c) == 1) mag(i) |= 1 << bp
                  }
                  flags(i) |= REF
                }
                y += 1
              }
              x += 1
            }
            k += 4
          }
        case 2 => // cleanup
          var k = 0
          while (k < h) {
            stripeStart(k)
            var x = 0
            while (x < w) {
              var y = k
              // run-length mode: full stripe, all insignificant/unvisited,
              // no significant neighbours anywhere in the column
              var rl = k + 3 < h
              if (rl) {
                var yy = k
                while (rl && yy < k + 4) {
                  val i = yy * w + x
                  if ((flags(i) & (SIG | VISIT)) != 0) rl = false
                  else {
                    val (hh, vv, dd) = sigN(x, yy)
                    if (hh + vv + dd > 0) rl = false
                  }
                  yy += 1
                }
              }
              if (rl) {
                if (mq.decode(cx, CtxRL) == 0) y = k + 4 // whole column stays zero
                else {
                  val r = (mq.decode(cx, CtxUNI) << 1) | mq.decode(cx, CtxUNI)
                  y = k + r
                  val i = y * w + x
                  flags(i) |= SIG; mag(i) |= 1 << bp; decodeSign(x, y)
                  y += 1
                }
              }
              while (y < math.min(k + 4, h)) {
                val i = y * w + x
                if ((flags(i) & (SIG | VISIT)) == 0) {
                  val (hh, vv, dd) = sigN(x, y)
                  if (mq.decode(cx, zcCtx(orient, hh, vv, dd)) == 1) {
                    flags(i) |= SIG; mag(i) |= 1 << bp; decodeSign(x, y)
                  }
                }
                y += 1
              }
              x += 1
            }
            k += 4
          }
          if (segSym) { // 1010, tolerated on mismatch
            var s = 0
            var i = 0
            while (i < 4) { s = (s << 1) | mq.decode(cx, CtxUNI); i += 1 }
          }
          var i = 0
          while (i < flags.length) { flags(i) &= ~VISIT; i += 1 }
      }
      if (first) { first = false; pass = 0; bp -= 1 }
      else if (kind == 2) { pass = 0; bp -= 1 }
      else pass += 1
      left -= 1
    }
    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = if ((flags(i) & NEG) != 0) -mag(i) else mag(i)
      i += 1
    }
    out
  }

  // =================== inverse DWT ===================

  /** Mirror (period-symmetric) reflection of k into [a, b-1]. */
  @inline private def refl(k: Int, a: Int, b: Int): Int = {
    val n = b - 1 - a
    if (n == 0) return a
    var t = (k - a) % (2 * n)
    if (t < 0) t += 2 * n
    if (t > n) t = 2 * n - t
    a + t
  }

  /** 5/3 reversible 1D synthesis over absolute coords [i0, i1).
    * `y(k - i0)` holds the interleaved signal; result written back.
    */
  private[unstructured] def sr53(y: Array[Int], i0: Int, i1: Int): Unit = {
    val n = i1 - i0
    if (n <= 0) return
    if (n == 1) { if ((i0 & 1) == 1) y(0) = y(0) >> 1; return }
    val ext = new Array[Int](n + 4) // [i0-2, i1+2)
    var k = i0 - 2
    while (k < i1 + 2) { ext(k - (i0 - 2)) = y(refl(k, i0, i1) - i0); k += 1 }
    @inline def e(k: Int): Int = ext(k - (i0 - 2))
    val x = new Array[Int](n + 4)
    @inline def xs(k: Int, v: Int): Unit = x(k - (i0 - 2)) = v
    @inline def xg(k: Int): Int = x(k - (i0 - 2))
    // evens over [i0-1, i1]: every even neighbour an in-range odd step needs
    k = i0 - 1
    while (k <= i1) {
      if ((k & 1) == 0) xs(k, e(k) - ((e(k - 1) + e(k + 1) + 2) >> 2))
      k += 1
    }
    k = i0
    while (k < i1) {
      if ((k & 1) == 1) xs(k, e(k) + ((xg(k - 1) + xg(k + 1)) >> 1))
      k += 1
    }
    k = i0
    while (k < i1) { y(k - i0) = xg(k); k += 1 }
  }

  private val K97 = 1.230174104914001
  private val A97 = -1.586134342059924
  private val B97 = -0.052980118572961
  private val G97 = 0.882911075530934
  private val D97 = 0.443506852043971

  /** 9/7 irreversible 1D synthesis over absolute coords [i0, i1).
    * Scaling: low × K, high × 2/K (the pair the synthesis-filter DC /
    * Nyquist gains of T.800 Table F.9 imply; JpxSuite pins both).
    */
  private[unstructured] def sr97(y: Array[Double], i0: Int, i1: Int): Unit = {
    val n = i1 - i0
    if (n <= 0) return
    if (n == 1) { if ((i0 & 1) == 1) y(0) = y(0) / 2; return }
    val m = 4
    val ext = new Array[Double](n + 2 * m)
    var k = i0 - m
    while (k < i1 + m) { ext(k - (i0 - m)) = y(refl(k, i0, i1) - i0); k += 1 }
    @inline def idx(k: Int): Int = k - (i0 - m)
    // scale
    k = i0 - m
    while (k < i1 + m) {
      ext(idx(k)) *= (if ((k & 1) == 0) K97 else 2.0 / K97)
      k += 1
    }
    // undo step 4 (even -= δ·odds) over [i0-3, i1+3)
    k = i0 - m + 1
    while (k < i1 + m - 1) {
      if ((k & 1) == 0) ext(idx(k)) -= D97 * (ext(idx(k - 1)) + ext(idx(k + 1)))
      k += 1
    }
    // undo step 3 (odd -= γ·evens)
    k = i0 - m + 2
    while (k < i1 + m - 2) {
      if ((k & 1) == 1) ext(idx(k)) -= G97 * (ext(idx(k - 1)) + ext(idx(k + 1)))
      k += 1
    }
    // undo step 2 (even -= β·odds)
    k = i0 - m + 3
    while (k < i1 + m - 3) {
      if ((k & 1) == 0) ext(idx(k)) -= B97 * (ext(idx(k - 1)) + ext(idx(k + 1)))
      k += 1
    }
    // undo step 1 (odd -= α·evens)
    k = i0
    while (k < i1) {
      if ((k & 1) == 1) ext(idx(k)) -= A97 * (ext(idx(k - 1)) + ext(idx(k + 1)))
      k += 1
    }
    k = i0
    while (k < i1) { y(k - i0) = ext(idx(k)); k += 1 }
  }

  // =================== whole-image decode ===================

  /** Decodes a JPX payload (JP2 container or raw codestream) to an 8-bit
    * raster. None on any unsupported feature or malformed input.
    */
  def decode(data: Array[Byte]): Option[java.awt.image.BufferedImage] = try {
    val (cs0, cs1) = codestream(data).getOrElse(return None)
    val r = new Reader(java.util.Arrays.copyOfRange(data, cs0, cs1))
    if (r.u16 != 0xff4f) return None // SOC
    if (r.u16 != 0xff51) return None // SIZ immediately follows
    val lsiz = r.u16
    r.u16 // Rsiz
    val xsiz = u32Int(r.u32); val ysiz = u32Int(r.u32)
    val x0 = u32Int(r.u32); val y0 = u32Int(r.u32)
    val xt = u32Int(r.u32); val yt = u32Int(r.u32)
    val xt0 = u32Int(r.u32); val yt0 = u32Int(r.u32)
    val nc = r.u16
    if (nc <= 0 || nc > 16) return None
    val comps = Array.fill(nc) {
      val s = r.u8
      Comp((s & 0x7f) + 1, (s & 0x80) != 0, r.u8, r.u8)
    }
    if (lsiz != 38 + 3 * nc) return None
    if (xsiz <= x0 || ysiz <= y0 || xt <= 0 || yt <= 0) return None
    if (comps.exists(c => c.dx <= 0 || c.dy <= 0 || c.depth > 16)) return None
    if ((xsiz - x0).toLong * (ysiz - y0) > MaxPixels) return None
    val siz = Siz(xsiz, ysiz, x0, y0, xt, yt, xt0, yt0, comps)

    // main-header defaults + per-component overrides
    var mainCod: Cod = null
    var mainQcd: Qcd = null
    val mainCoc = new Array[Cod](nc)
    val mainQcc = new Array[Qcd](nc)
    val ppmSegs = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    val mainPoc = scala.collection.mutable.ArrayBuffer.empty[Poc]
    var marker = r.u16
    while (marker != 0xff90) { // until first SOT
      val len = r.u16
      val segEnd = r.pos + len - 2
      marker match {
        case 0xff52 => mainCod = parseCod(r, len)
        case 0xff5c => mainQcd = parseQcd(r, len,
          if (mainCod != null) mainCod.levels else 32)
        case 0xff53 => // COC
          val c = if (nc < 257) r.u8 else r.u16
          val scoc = r.u8
          val base = if (mainCod != null) mainCod else return None
          val prog = base.progression; val layers = base.layers; val mct = base.mct
          val levels = r.u8
          val cbw = (r.u8 & 0x0f) + 2; val cbh = (r.u8 & 0x0f) + 2
          val style = r.u8; val transform = r.u8
          val precincts = Array.fill(levels + 1)(0xff)
          if ((scoc & 1) != 0) { var i = 0; while (i <= levels && r.pos < segEnd) { precincts(i) = r.u8; i += 1 } }
          mainCoc(c) = Cod(prog, layers, mct, levels, cbw, cbh, style, transform,
            precincts, base.sop, base.eph)
          r.pos = segEnd
        case 0xff5d => // QCC
          val c = if (nc < 257) r.u8 else r.u16
          mainQcc(c) = parseQcd(r, len - (if (nc < 257) 1 else 2),
            if (mainCoc(c) != null) mainCoc(c).levels
            else if (mainCod != null) mainCod.levels else 32)
        case 0xff60 => // PPM: packed packet headers, main header (A.7.4)
          val z = r.u8
          val bytes = java.util.Arrays.copyOfRange(r.data, r.pos, segEnd)
          ppmSegs += ((z, bytes))
          r.pos = segEnd
        case 0xff5f => // POC: progression order changes (A.6.6)
          while (r.pos < segEnd) {
            val rs = r.u8
            val cs = if (nc < 257) r.u8 else r.u16
            val lye = r.u16
            val re = r.u8
            val ce = if (nc < 257) r.u8 else r.u16
            val pp = r.u8
            mainPoc += Poc(rs, cs, lye, re, math.min(ce, nc), pp)
          }
          r.pos = segEnd
        case _ => r.pos = segEnd // COM, TLM, CRG, ...
      }
      if (r.pos != segEnd) r.pos = segEnd
      marker = r.u16
    }
    if (mainCod == null || mainQcd == null) return None
    // PPM stream: segments concatenated by Zppm, then split per TILE-PART
    // in codestream order as [Nppm u32][Nppm header bytes] runs
    val ppmStream: Array[Byte] =
      if (ppmSegs.isEmpty) null
      else ppmSegs.sortBy(_._1).iterator.map(_._2)
        .foldLeft(Array.empty[Byte])(_ ++ _)

    val ntx = ceilDiv(xsiz - xt0, xt)
    val nty = ceilDiv(ysiz - yt0, yt)
    if (ntx.toLong * nty > 65535) return None

    // gather tile-parts: per tile ordered data chunks + tile-header overrides
    final class TileHdr {
      var cod: Cod = mainCod
      var qcd: Qcd = mainQcd
      val coc = mainCoc.clone()
      val qcc = mainQcc.clone()
      val chunks = Seq.newBuilder[(Int, Int)]
      val pptSegs = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      val poc = scala.collection.mutable.ArrayBuffer.empty[Poc]
    }
    val tiles = Array.fill(ntx * nty)(new TileHdr)
    val tpOrder = Seq.newBuilder[Int] // tile index per tile-part (PPM split)
    var atMarker = marker
    while (atMarker == 0xff90) {
      val lsot = r.u16
      if (lsot != 10) return None
      val isot = r.u16
      val psotL = r.u32
      val tpsot = r.u8
      r.u8 // TNsot
      if (isot >= tiles.length) return None
      val th = tiles(isot)
      val sotStart = r.pos - 12
      val psot = if (psotL == 0) r.data.length - sotStart else u32Int(psotL)
      val tpEnd = sotStart + psot
      if (tpEnd > r.data.length) return None
      // tile-part header markers until SOD
      var m2 = r.u16
      while (m2 != 0xff93) {
        val len = r.u16
        val segEnd = r.pos + len - 2
        m2 match {
          case 0xff52 => if (tpsot == 0) th.cod = parseCod(r, len) else r.pos = segEnd
          case 0xff5c => if (tpsot == 0) th.qcd = parseQcd(r, len, th.cod.levels) else r.pos = segEnd
          case 0xff53 =>
            if (tpsot == 0) {
              val c = if (nc < 257) r.u8 else r.u16
              val scoc = r.u8
              val levels = r.u8
              val cbw = (r.u8 & 0x0f) + 2; val cbh = (r.u8 & 0x0f) + 2
              val style = r.u8; val transform = r.u8
              val precincts = Array.fill(levels + 1)(0xff)
              if ((scoc & 1) != 0) { var i = 0; while (i <= levels && r.pos < segEnd) { precincts(i) = r.u8; i += 1 } }
              th.coc(c) = Cod(th.cod.progression, th.cod.layers, th.cod.mct, levels,
                cbw, cbh, style, transform, precincts, th.cod.sop, th.cod.eph)
            }
            r.pos = segEnd
          case 0xff5d =>
            if (tpsot == 0) {
              val c = if (nc < 257) r.u8 else r.u16
              th.qcc(c) = parseQcd(r, len - (if (nc < 257) 1 else 2),
                if (th.coc(c) != null) th.coc(c).levels else th.cod.levels)
            }
            r.pos = segEnd
          case 0xff61 => // PPT: packed packet headers, tile-part (A.7.5)
            val z = r.u8
            th.pptSegs += ((z, java.util.Arrays.copyOfRange(r.data, r.pos, segEnd)))
            r.pos = segEnd
          case 0xff5f => // tile-header POC overrides the main header's
            if (tpsot == 0) {
              th.poc.clear()
              while (r.pos < segEnd) {
                val rs = r.u8
                val cs = if (nc < 257) r.u8 else r.u16
                val lye = r.u16
                val re = r.u8
                val ce = if (nc < 257) r.u8 else r.u16
                val pp = r.u8
                th.poc += Poc(rs, cs, lye, re, math.min(ce, nc), pp)
              }
            }
            r.pos = segEnd
          case _ => r.pos = segEnd
        }
        if (r.pos != segEnd) r.pos = segEnd
        m2 = r.u16
      }
      th.chunks += ((r.pos, tpEnd - r.pos))
      tpOrder += isot
      r.pos = tpEnd
      atMarker = if (r.remaining >= 2) r.u16 else 0xffd9
    }
    if (atMarker != 0xffd9) return None // EOC

    // packed packet headers per tile: PPM (main, per-tile-part Nppm runs)
    // wins over PPT (per-tile Zppt concatenation); null = inline headers
    val packedOf: Array[Array[Byte]] = {
      val out = new Array[Array[Byte]](tiles.length)
      if (ppmStream != null) {
        val bufs = Array.fill(tiles.length)(new java.io.ByteArrayOutputStream())
        var p = 0
        tpOrder.result().foreach { tIdx =>
          if (p + 4 > ppmStream.length) return None
          val n = (((ppmStream(p) & 0xff) << 24) | ((ppmStream(p + 1) & 0xff) << 16) |
            ((ppmStream(p + 2) & 0xff) << 8) | (ppmStream(p + 3) & 0xff))
          p += 4
          if (n < 0 || p + n > ppmStream.length) return None
          bufs(tIdx).write(ppmStream, p, n)
          p += n
        }
        var i = 0
        while (i < out.length) { out(i) = bufs(i).toByteArray; i += 1 }
      } else {
        var i = 0
        while (i < out.length) {
          val th = tiles(i)
          if (th.pptSegs.nonEmpty)
            out(i) = th.pptSegs.sortBy(_._1).iterator.map(_._2)
              .foldLeft(Array.empty[Byte])(_ ++ _)
          i += 1
        }
      }
      out
    }

    // image-grid output buffers per component
    val iw = xsiz - x0
    val ih = ysiz - y0
    val outComps = comps.map { c =>
      new Array[Int](ceilDiv(xsiz, c.dx) - ceilDiv(x0, c.dx) match {
        case w => w * (ceilDiv(ysiz, c.dy) - ceilDiv(y0, c.dy))
      })
    }
    val compW = comps.map(c => ceilDiv(xsiz, c.dx) - ceilDiv(x0, c.dx))
    val compX0 = comps.map(c => ceilDiv(x0, c.dx))
    val compY0 = comps.map(c => ceilDiv(y0, c.dy))

    var ty = 0
    while (ty < nty) {
      var tx = 0
      while (tx < ntx) {
        val th = tiles(ty * ntx + tx)
        val tx0 = math.max(xt0 + tx * xt, x0); val tx1 = math.min(xt0 + (tx + 1) * xt, xsiz)
        val ty0 = math.max(yt0 + ty * yt, y0); val ty1 = math.min(yt0 + (ty + 1) * yt, ysiz)
        if (tx1 > tx0 && ty1 > ty0) {
          if (!decodeTile(r.data, th.chunks.result(), siz, th.cod, th.qcd, th.coc, th.qcc,
            tx0, ty0, tx1, ty1, outComps, compW, compX0, compY0,
            packedOf(ty * ntx + tx),
            if (th.poc.nonEmpty) th.poc.toSeq else mainPoc.toSeq)) return None
        }
        tx += 1
      }
      ty += 1
    }

    // color transform / DC shift handled in decodeTile; assemble 8-bit image
    val img = new java.awt.image.BufferedImage(iw, ih,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val useRgb = nc >= 3
    var yy = 0
    while (yy < ih) {
      var xx = 0
      while (xx < iw) {
        def sample(c: Int): Int = {
          // floor-division owner sample, clamped into the component's
          // buffer: with a nonzero grid origin the component starts at
          // ceilDiv(x0, dx), so the first image column's floor-mapped
          // index can be -1 — clamp to the nearest existing sample
          // instead of failing the whole decode (B.3 reference grid)
          val ch = outComps(c).length / compW(c)
          val sx = math.min(compW(c) - 1,
            math.max(0, (x0 + xx) / comps(c).dx - compX0(c)))
          val sy = math.min(ch - 1,
            math.max(0, (y0 + yy) / comps(c).dy - compY0(c)))
          val v = outComps(c)(sy * compW(c) + sx)
          val d = comps(c).depth
          if (d == 8) v
          else if (d > 8) v >> (d - 8)
          else (v * 255) / ((1 << d) - 1)
        }
        val rgb =
          if (useRgb) (sample(0) << 16) | (sample(1) << 8) | sample(2)
          else { val v = sample(0); (v << 16) | (v << 8) | v }
        img.setRGB(xx, yy, rgb)
        xx += 1
      }
      yy += 1
    }
    Some(img)
  } catch { case _: Exception => None }

  /** Decodes one tile in place into the per-component image buffers.
    * Returns false on unsupported/malformed content.
    */
  /** `packedHdr` (nullable): PPM/PPT packed packet headers for this tile —
    * headers read sequentially from it while bodies stay in the tile
    * bitstream (EPH lives in the header stream, SOP in the body stream).
    */
  private def decodeTile(data: Array[Byte], chunks: Seq[(Int, Int)], siz: Siz,
      cod0: Cod, qcd0: Qcd, coc: Array[Cod], qcc: Array[Qcd],
      tx0: Int, ty0: Int, tx1: Int, ty1: Int,
      outComps: Array[Array[Int]], compW: Array[Int],
      compX0: Array[Int], compY0: Array[Int],
      packedHdr: Array[Byte] = null,
      poc: Seq[Poc] = Nil): Boolean = {
    val nc = siz.comps.length
    // concatenated tile stream
    var total = 0
    chunks.foreach(total += _._2)
    val stream = new Array[Byte](total)
    var sp = 0
    chunks.foreach { case (off, len) =>
      System.arraycopy(data, off, stream, sp, len); sp += len
    }

    val codOf = Array.tabulate(nc)(c => if (coc(c) != null) coc(c) else cod0)
    val qcdOf = Array.tabulate(nc)(c => if (qcc(c) != null) qcc(c) else qcd0)
    // every defined code-block style decodes natively: BYPASS (0x01),
    // RESET (0x02), TERMALL (0x04), VCAUSAL (0x08), predictable
    // termination (0x10, a decoder no-op), segmentation symbols (0x20)
    if (cod0.layers <= 0 || cod0.layers > 65535) return false

    // build resolution/band/precinct/cblk structures per component
    val resOf = new Array[Array[Res]](nc)
    var c = 0
    while (c < nc) {
      val cd = codOf(c)
      val comp = siz.comps(c)
      val tcx0 = ceilDiv(tx0, comp.dx); val tcx1 = ceilDiv(tx1, comp.dx)
      val tcy0 = ceilDiv(ty0, comp.dy); val tcy1 = ceilDiv(ty1, comp.dy)
      if (cd.levels > 32) return false
      resOf(c) = Array.tabulate(cd.levels + 1) { rr =>
        val sh = cd.levels - rr
        val rx0 = ceilShift(tcx0, sh); val rx1 = ceilShift(tcx1, sh)
        val ry0 = ceilShift(tcy0, sh); val ry1 = ceilShift(tcy1, sh)
        val ppx = cd.precincts(rr) & 0x0f
        val ppy = (cd.precincts(rr) >>> 4) & 0x0f
        val numpw = if (rx1 > rx0) ceilShift(rx1, ppx) - (rx0 >> ppx) else 0
        val numph = if (ry1 > ry0) ceilShift(ry1, ppy) - (ry0 >> ppy) else 0
        val bands: Array[Band] =
          if (rr == 0) {
            val cbx = math.min(cd.cbw, ppx); val cby = math.min(cd.cbh, ppy)
            Array(new Band(0, rx0, ry0, rx1, ry1, cbx, cby))
          } else {
            val den = 1 << (sh + 1)
            val half = den >> 1
            val cbx = math.min(cd.cbw, ppx - 1); val cby = math.min(cd.cbh, ppy - 1)
            def bandRect(xob: Int, yob: Int, orient: Int): Band = new Band(orient,
              ceilDiv(tcx0 - half * xob, den), ceilDiv(tcy0 - half * yob, den),
              ceilDiv(tcx1 - half * xob, den), ceilDiv(tcy1 - half * yob, den),
              cbx, cby)
            Array(bandRect(1, 0, 1), bandRect(0, 1, 2), bandRect(1, 1, 3))
          }
        // precincts: indexed over the resolution-level grid
        val precs = new Array[Prec](math.max(numpw * numph, 0))
        val pi0 = rx0 >> ppx
        val pj0 = ry0 >> ppy
        var pj = 0
        while (pj < numph) {
          var pi = 0
          while (pi < numpw) {
            val entries = bands.map { b =>
              // precinct rect in band coordinates
              val pw = if (rr == 0) ppx else ppx - 1
              val ph = if (rr == 0) ppy else ppy - 1
              val bx0 = math.max((pi0 + pi) << pw, b.x0)
              val bx1 = math.min((pi0 + pi + 1) << pw, b.x1)
              val by0 = math.max((pj0 + pj) << ph, b.y0)
              val by1 = math.min((pj0 + pj + 1) << ph, b.y1)
              if (bx1 <= bx0 || by1 <= by0)
                (b, new Array[Cblk](0), new TagTree(1, 1), new TagTree(1, 1), 0, 0)
              else {
                val ci0 = bx0 >> b.cbExpX; val ci1 = ceilShift(bx1, b.cbExpX)
                val cj0 = by0 >> b.cbExpY; val cj1 = ceilShift(by1, b.cbExpY)
                val cols = ci1 - ci0; val rows = cj1 - cj0
                val cbs = new Array[Cblk](cols * rows)
                var j = 0
                while (j < rows) {
                  var i2 = 0
                  while (i2 < cols) {
                    val cx0 = math.max((ci0 + i2) << b.cbExpX, bx0)
                    val cx1 = math.min((ci0 + i2 + 1) << b.cbExpX, bx1)
                    val cy0 = math.max((cj0 + j) << b.cbExpY, by0)
                    val cy1 = math.min((cj0 + j + 1) << b.cbExpY, by1)
                    cbs(j * cols + i2) = new Cblk(cx0, cy0, cx1, cy1)
                    i2 += 1
                  }
                  j += 1
                }
                (b, cbs, new TagTree(cols, rows), new TagTree(cols, rows), cols, rows)
              }
            }
            precs(pj * numpw + pi) = new Prec(entries)
            pi += 1
          }
          pj += 1
        }
        new Res(rr, rx0, ry0, rx1, ry1, ppx, ppy, numpw, numph, bands, precs)
      }
      c += 1
    }

    // ---- packet sequence (all progressions via sort keys) ----
    final case class Pk(l: Int, c: Int, r: Int, p: Int, xr: Int, yr: Int, seq: Int)
    val pks = Seq.newBuilder[Pk]
    var seq = 0
    c = 0
    while (c < nc) {
      val cd = codOf(c)
      var rr = 0
      while (rr <= cd.levels) {
        val res = resOf(c)(rr)
        val np = res.numpw * res.numph
        var p = 0
        while (p < np) {
          val pi = p % math.max(res.numpw, 1); val pj = p / math.max(res.numpw, 1)
          // precinct origin projected to the reference grid (positional orders)
          val sh = cd.levels - rr
          val xr = siz.comps(c).dx * (math.max(((res.x0 >> res.ppx) + pi) << res.ppx, res.x0) << sh)
          val yr = siz.comps(c).dy * (math.max(((res.y0 >> res.ppy) + pj) << res.ppy, res.y0) << sh)
          var l = 0
          while (l < cd.layers) {
            pks += Pk(l, c, rr, p, xr, yr, seq); seq += 1
            l += 1
          }
          p += 1
        }
        rr += 1
      }
      c += 1
    }
    def sortByProg(ks: Seq[Pk], prog: Int): Seq[Pk] = prog match {
      case 0 => ks.sortBy(k => (k.l, k.r, k.c, k.p, k.seq)) // LRCP
      case 1 => ks.sortBy(k => (k.r, k.l, k.c, k.p, k.seq)) // RLCP
      case 2 => ks.sortBy(k => (k.r, k.yr, k.xr, k.c, k.l, k.seq)) // RPCL
      case 3 => ks.sortBy(k => (k.yr, k.xr, k.c, k.r, k.l, k.seq)) // PCRL
      case 4 => ks.sortBy(k => (k.c, k.yr, k.xr, k.r, k.l, k.seq)) // CPRL
      case _ => null
    }
    val all = pks.result()
    val ordered =
      if (poc.isEmpty) {
        val o = sortByProg(all, cod0.progression)
        if (o == null) return false
        o
      } else {
        // POC (A.6.6): each entry emits, in its own progression, the
        // not-yet-emitted packets of its (res, comp, layer-bound) volume;
        // anything a malformed list leaves over follows the COD default
        val emitted = scala.collection.mutable.BitSet.empty
        val out = Seq.newBuilder[Pk]
        for (e <- poc) {
          val vol = all.filter(k => !emitted.contains(k.seq) &&
            k.r >= e.rs && k.r < e.re && k.c >= e.cs && k.c < e.ce &&
            k.l < e.lye)
          val o = sortByProg(vol, e.ppoc)
          if (o == null) return false
          o.foreach { k => emitted.add(k.seq); out += k }
        }
        val rest = all.filter(k => !emitted.contains(k.seq))
        if (rest.nonEmpty) {
          val o = sortByProg(rest, cod0.progression)
          if (o == null) return false
          out ++= o
        }
        out.result()
      }

    // ---- parse packets sequentially from the tile stream ----
    var pos = 0
    var hpos = 0 // position in the packed header stream, when present
    val bypassOf = codOf.map(cdd => (cdd.cbStyle & 0x01) != 0)
    val termallOf = codOf.map(cdd => (cdd.cbStyle & 0x04) != 0)
    for (pk <- ordered) {
      val cd = codOf(pk.c)
      val res = resOf(pk.c)(pk.r)
      if (res.numpw * res.numph > 0) {
        if (cd.sop) { // FF91 len=4 Nsop — tolerate absence
          if (pos + 6 <= stream.length && (stream(pos) & 0xff) == 0xff &&
            (stream(pos + 1) & 0xff) == 0x91) pos += 6
        }
        val hdr =
          if (packedHdr != null) new HdrReader(packedHdr, hpos, packedHdr.length)
          else new HdrReader(stream, pos, stream.length)
        val prec = res.precs(pk.p)
        val body = Seq.newBuilder[(CbSeg, Int)]
        if (hdr.bit() == 1) {
          for ((band, cbs, inclT, zeroT, cols, rows) <- prec.bands if cbs.nonEmpty) {
            var j = 0
            while (j < rows) {
              var i2 = 0
              while (i2 < cols) {
                val cb = cbs(j * cols + i2)
                val incl =
                  if (!cb.included) inclT.decode(i2, j, pk.l + 1, () => hdr.bit())
                  else hdr.bit() == 1
                if (incl) {
                  if (!cb.included) {
                    var t = 1
                    while (!zeroT.decode(i2, j, t, () => hdr.bit())) t += 1
                    cb.missing = t - 1
                    cb.included = true
                  }
                  val nnp = numPasses(hdr)
                  while (hdr.bit() == 1) cb.lblock += 1
                  // distribute the new passes over codeword segments
                  // (T.800 B.10.7.2): one length field per segment
                  // receiving passes in this packet, each coded with
                  // lblock + floor(log2(passes of that segment here))
                  var rem = nnp
                  while (rem > 0) {
                    val seg = cb.nextSeg(bypassOf(pk.c), termallOf(pk.c))
                    val take = math.min(rem, seg.maxPasses - seg.passes)
                    val bits = cb.lblock + (31 - Integer.numberOfLeadingZeros(take))
                    val len = hdr.read(bits)
                    seg.passes += take
                    rem -= take
                    body += ((seg, len))
                  }
                  cb.passes += nnp
                }
                i2 += 1
              }
              j += 1
            }
          }
        }
        hdr.align()
        if (packedHdr != null) {
          hpos = hdr.pos
          if (cd.eph) { // EPH rides the packed header stream (A.7.4/A.7.5)
            if (hpos + 2 <= packedHdr.length && (packedHdr(hpos) & 0xff) == 0xff &&
              (packedHdr(hpos + 1) & 0xff) == 0x92) hpos += 2
          }
        } else {
          pos = hdr.pos
          if (cd.eph) {
            if (pos + 2 <= stream.length && (stream(pos) & 0xff) == 0xff &&
              (stream(pos + 1) & 0xff) == 0x92) pos += 2
          }
        }
        for ((seg, len) <- body.result()) {
          if (pos + len > stream.length) return false
          seg.chunks += ((pos, len))
          pos += len
        }
      }
    }

    // ---- Tier-1 decode + dequant + DWT per component ----
    c = 0
    while (c < nc) {
      val cd = codOf(c)
      val q = qcdOf(c)
      val comp = siz.comps(c)
      val reversible = cd.transform == 1
      // a 5/3-reversible codestream with a scalar quantization style is
      // malformed (A.6.4: transform 1 pairs with no-quantization only);
      // routing its coefficients through the 9/7 synthesis would produce
      // silently wrong pixels — reject to the metadata fallback instead
      if (reversible && q.style != 0) return false
      val tcx0 = ceilDiv(tx0, comp.dx); val tcx1 = ceilDiv(tx1, comp.dx)
      val tcy0 = ceilDiv(ty0, comp.dy); val tcy1 = ceilDiv(ty1, comp.dy)
      val tw = tcx1 - tcx0; val thh = tcy1 - tcy0
      if (tw <= 0 || thh <= 0) { c += 1 } else {
        if (tw.toLong * thh > MaxPixels) return false
        // decode blocks into band buffers
        var rr = 0
        while (rr <= cd.levels) {
          val res = resOf(c)(rr)
          for (band <- res.bands) band.data = new Array[Int](math.max(band.w * band.h, 0))
          for (prec <- res.precs; (band, cbs, _, _, _, _) <- prec.bands; cb <- cbs) {
            if (cb.included && cb.passes > 0) {
              // one contiguous buffer per codeword segment (a segment's
              // bytes may arrive in chunks across layers)
              val segBufs = cb.segs.toArray.map { s =>
                val cs = s.chunks.result()
                var clen = 0
                cs.foreach(clen += _._2)
                val b = new Array[Byte](clen)
                var bp2 = 0
                cs.foreach { case (off, len) =>
                  System.arraycopy(stream, off, b, bp2, len); bp2 += len
                }
                (b, s.raw, s.passes)
              }
              val bandIdx = if (rr == 0) 0 else 3 * (rr - 1) + 1 + band.orient - 1
              val nbLev = if (rr == 0) cd.levels else cd.levels - rr + 1
              val (eps, _) = bandQuant(q, bandIdx, nbLev)
              val mb = eps + q.guard - 1
              if (mb <= 0 || mb > 31 || cb.missing >= mb) {
                // nothing decodable; leave zeros
              } else {
                val cw = cb.x1 - cb.x0; val ch = cb.y1 - cb.y0
                val vals = t1DecodeSegs(segBufs, cw, ch, band.orient,
                  mb, cb.missing, cb.passes, cd.cbStyle)
                var yy = 0
                while (yy < ch) {
                  var xx = 0
                  while (xx < cw) {
                    band.data((cb.y0 - band.y0 + yy) * band.w + (cb.x0 - band.x0 + xx)) =
                      vals(yy * cw + xx)
                    xx += 1
                  }
                  yy += 1
                }
              }
            }
          }
          rr += 1
        }

        // dequantize + synthesize
        if (reversible && q.style == 0) {
          var cur: Array[Int] = resOf(c)(0).bands(0).data
          var cx0 = resOf(c)(0).x0; var cx1 = resOf(c)(0).x1
          var cy0 = resOf(c)(0).y0; var cy1 = resOf(c)(0).y1
          var rr2 = 1
          while (rr2 <= cd.levels) {
            val res = resOf(c)(rr2)
            val w = res.x1 - res.x0; val h = res.y1 - res.y0
            val y2 = new Array[Int](w * h)
            // interleave
            interleaveInt(y2, res.x0, res.y0, res.x1, res.y1,
              cur, cx0, cy0, cx1, cy1, res.bands)
            // horizontal then vertical synthesis
            val row = new Array[Int](w)
            var j = 0
            while (j < h) {
              System.arraycopy(y2, j * w, row, 0, w)
              sr53(row, res.x0, res.x1)
              System.arraycopy(row, 0, y2, j * w, w)
              j += 1
            }
            val colB = new Array[Int](h)
            var i2 = 0
            while (i2 < w) {
              var j2 = 0
              while (j2 < h) { colB(j2) = y2(j2 * w + i2); j2 += 1 }
              sr53(colB, res.y0, res.y1)
              j2 = 0
              while (j2 < h) { y2(j2 * w + i2) = colB(j2); j2 += 1 }
              i2 += 1
            }
            cur = y2; cx0 = res.x0; cx1 = res.x1; cy0 = res.y0; cy1 = res.y1
            rr2 += 1
          }
          storeComp(c, cur, null, tcx0, tcy0, tw, thh, siz, cd, qcdOf, codOf,
            outComps, compW, compX0, compY0, resOf)
        } else {
          // irreversible: floats
          var cur: Array[Double] = null
          var cx0 = 0; var cx1 = 0; var cy0 = 0; var cy1 = 0
          var rr2 = 0
          while (rr2 <= cd.levels) {
            val res = resOf(c)(rr2)
            // dequantize each band of this resolution
            val deq = res.bands.map { band =>
              val bandIdx = if (rr2 == 0) 0 else 3 * (rr2 - 1) + 1 + band.orient - 1
              val nbLev = if (rr2 == 0) cd.levels else cd.levels - rr2 + 1
              val (eps, mant) = bandQuant(q, bandIdx, nbLev)
              val gainLog = band.orient match { case 0 => 0; case 1 | 2 => 1; case _ => 2 }
              val rb = comp.depth + gainLog
              val delta = math.pow(2.0, rb - eps) * (1.0 + mant / 2048.0)
              val out = new Array[Double](math.max(band.w * band.h, 0))
              var i3 = 0
              while (i3 < out.length) {
                val v = band.data(i3)
                out(i3) = if (v == 0) 0.0
                  else if (v > 0) (v + 0.5) * delta
                  else (v - 0.5) * delta
                i3 += 1
              }
              (band, out)
            }
            if (rr2 == 0) {
              cur = deq(0)._2
              cx0 = res.x0; cx1 = res.x1; cy0 = res.y0; cy1 = res.y1
            } else {
              val w = res.x1 - res.x0; val h = res.y1 - res.y0
              val y2 = new Array[Double](w * h)
              interleaveDouble(y2, res.x0, res.y0, res.x1, res.y1,
                cur, cx0, cy0, cx1, cy1, deq)
              val row = new Array[Double](w)
              var j = 0
              while (j < h) {
                System.arraycopy(y2, j * w, row, 0, w)
                sr97(row, res.x0, res.x1)
                System.arraycopy(row, 0, y2, j * w, w)
                j += 1
              }
              val colB = new Array[Double](h)
              var i2 = 0
              while (i2 < w) {
                var j2 = 0
                while (j2 < h) { colB(j2) = y2(j2 * w + i2); j2 += 1 }
                sr97(colB, res.y0, res.y1)
                j2 = 0
                while (j2 < h) { y2(j2 * w + i2) = colB(j2); j2 += 1 }
                i2 += 1
              }
              cur = y2; cx0 = res.x0; cx1 = res.x1; cy0 = res.y0; cy1 = res.y1
            }
            rr2 += 1
          }
          storeComp(c, null, cur, tcx0, tcy0, tw, thh, siz, cd, qcdOf, codOf,
            outComps, compW, compX0, compY0, resOf)
        }
        c += 1
      }
    }

    // ---- inverse MCT + DC shift over this tile's region ----
    finishTile(siz, cod0, tx0, ty0, tx1, ty1, outComps, compW, compX0, compY0)
    true
  }

  /** Stage a decoded tile-component into its image-grid buffer (pre-MCT). */
  private def storeComp(c: Int, ints: Array[Int], dbls: Array[Double],
      tcx0: Int, tcy0: Int, tw: Int, th: Int, siz: Siz, cd: Cod,
      qcdOf: Array[Qcd], codOf: Array[Cod],
      outComps: Array[Array[Int]], compW: Array[Int],
      compX0: Array[Int], compY0: Array[Int],
      resOf: Array[Array[Res]]): Unit = {
    var j = 0
    while (j < th) {
      var i = 0
      while (i < tw) {
        val v = if (ints != null) ints(j * tw + i)
          else math.round(dbls(j * tw + i)).toInt
        outComps(c)((tcy0 - compY0(c) + j) * compW(c) + (tcx0 - compX0(c) + i)) = v
        i += 1
      }
      j += 1
    }
  }

  /** Inverse component transform + DC level shift + clamp on a tile region. */
  private def finishTile(siz: Siz, cod: Cod, tx0: Int, ty0: Int, tx1: Int, ty1: Int,
      outComps: Array[Array[Int]], compW: Array[Int],
      compX0: Array[Int], compY0: Array[Int]): Unit = {
    val nc = siz.comps.length
    val mct = cod.mct == 1 && nc >= 3 &&
      (0 until 3).forall(c => siz.comps(c).dx == siz.comps(0).dx &&
        siz.comps(c).dy == siz.comps(0).dy)
    if (mct) {
      val dx = siz.comps(0).dx; val dy = siz.comps(0).dy
      val cx0 = ceilDiv(tx0, dx); val cx1 = ceilDiv(tx1, dx)
      val cy0 = ceilDiv(ty0, dy); val cy1 = ceilDiv(ty1, dy)
      val rev = cod.transform == 1
      var y = cy0
      while (y < cy1) {
        var x = cx0
        while (x < cx1) {
          val i0 = (y - compY0(0)) * compW(0) + (x - compX0(0))
          val i1 = (y - compY0(1)) * compW(1) + (x - compX0(1))
          val i2 = (y - compY0(2)) * compW(2) + (x - compX0(2))
          val a = outComps(0)(i0); val b = outComps(1)(i1); val cc = outComps(2)(i2)
          if (rev) { // RCT inverse
            val g = a - ((b + cc) >> 2)
            outComps(0)(i0) = cc + g // R = Vr + G
            outComps(1)(i1) = g
            outComps(2)(i2) = b + g // B = Ur + G
          } else { // ICT inverse
            outComps(0)(i0) = math.round(a + 1.402 * cc).toInt
            outComps(1)(i1) = math.round(a - 0.344136 * b - 0.714136 * cc).toInt
            outComps(2)(i2) = math.round(a + 1.772 * b).toInt
          }
          x += 1
        }
        y += 1
      }
    }
    var c = 0
    while (c < nc) {
      val comp = siz.comps(c)
      val shift = if (comp.signed) 0 else 1 << (comp.depth - 1)
      val maxV = (1 << comp.depth) - 1
      val cx0 = ceilDiv(tx0, comp.dx); val cx1 = ceilDiv(tx1, comp.dx)
      val cy0 = ceilDiv(ty0, comp.dy); val cy1 = ceilDiv(ty1, comp.dy)
      var y = cy0
      while (y < cy1) {
        var x = cx0
        while (x < cx1) {
          val i = (y - compY0(c)) * compW(c) + (x - compX0(c))
          val v = outComps(c)(i) + shift
          outComps(c)(i) = math.max(0, math.min(maxV, v))
          x += 1
        }
        y += 1
      }
      c += 1
    }
  }

  /** 2D interleave (F.3.2): LL from the previous resolution + this
    * resolution's HL/LH/HH into the combined grid.
    */
  private def interleaveInt(y2: Array[Int], x0: Int, y0: Int, x1: Int, y1: Int,
      ll: Array[Int], lx0: Int, ly0: Int, lx1: Int, ly1: Int,
      bands: Array[Band]): Unit = {
    val w = x1 - x0
    val hl = bands(0); val lh = bands(1); val hh = bands(2)
    var v = y0
    while (v < y1) {
      var u = x0
      while (u < x1) {
        val dst = (v - y0) * w + (u - x0)
        y2(dst) =
          if ((u & 1) == 0 && (v & 1) == 0) ll((v / 2 - ly0) * (lx1 - lx0) + (u / 2 - lx0))
          else if ((u & 1) == 1 && (v & 1) == 0) {
            val bx = u >> 1; val by = v >> 1
            if (bx < hl.x0 || bx >= hl.x1 || by < hl.y0 || by >= hl.y1) 0
            else hl.data((by - hl.y0) * hl.w + (bx - hl.x0))
          } else if ((u & 1) == 0) {
            val bx = u >> 1; val by = v >> 1
            if (bx < lh.x0 || bx >= lh.x1 || by < lh.y0 || by >= lh.y1) 0
            else lh.data((by - lh.y0) * lh.w + (bx - lh.x0))
          } else {
            val bx = u >> 1; val by = v >> 1
            if (bx < hh.x0 || bx >= hh.x1 || by < hh.y0 || by >= hh.y1) 0
            else hh.data((by - hh.y0) * hh.w + (bx - hh.x0))
          }
        u += 1
      }
      v += 1
    }
  }

  private def interleaveDouble(y2: Array[Double], x0: Int, y0: Int, x1: Int, y1: Int,
      ll: Array[Double], lx0: Int, ly0: Int, lx1: Int, ly1: Int,
      deq: Array[(Band, Array[Double])]): Unit = {
    val w = x1 - x0
    val (hlB, hl) = deq(0); val (lhB, lh) = deq(1); val (hhB, hh) = deq(2)
    var v = y0
    while (v < y1) {
      var u = x0
      while (u < x1) {
        val dst = (v - y0) * w + (u - x0)
        y2(dst) =
          if ((u & 1) == 0 && (v & 1) == 0) ll((v / 2 - ly0) * (lx1 - lx0) + (u / 2 - lx0))
          else if ((u & 1) == 1 && (v & 1) == 0) {
            val bx = u >> 1; val by = v >> 1
            if (bx < hlB.x0 || bx >= hlB.x1 || by < hlB.y0 || by >= hlB.y1) 0.0
            else hl((by - hlB.y0) * hlB.w + (bx - hlB.x0))
          } else if ((u & 1) == 0) {
            val bx = u >> 1; val by = v >> 1
            if (bx < lhB.x0 || bx >= lhB.x1 || by < lhB.y0 || by >= lhB.y1) 0.0
            else lh((by - lhB.y0) * lhB.w + (bx - lhB.x0))
          } else {
            val bx = u >> 1; val by = v >> 1
            if (bx < hhB.x0 || bx >= hhB.x1 || by < hhB.y0 || by >= hhB.y1) 0.0
            else hh((by - hhB.y0) * hhB.w + (bx - hhB.x0))
          }
        u += 1
      }
      v += 1
    }
  }
}
