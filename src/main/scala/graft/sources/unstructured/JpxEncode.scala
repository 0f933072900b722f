package graft.sources.unstructured

/** Minimal LOSSLESS JPEG2000 Part 1 encoder: 5/3 reversible DWT, RCT for
  * 3-component input, single tile at the origin, one quality layer, LRCP,
  * default precincts, 64×64 code blocks, full coding passes — the exact
  * subset [[JpxDecode]] round-trips bit-exactly. Exists for the same reason
  * [[CcittDecode.encodeG4]] does: verify-gate fixtures plant JPX-bearing
  * PDFs whose decoded rasters have a closed-form oracle, and the suite
  * pins encoder→decoder losslessness across geometries.
  *
  * The MQ encoder is the T.88 procedure (E.3.5-E.3.9, software
  * conventions); its decoder twin is pinned against independent test
  * vectors in Jbig2Suite.
  */
private[graft] object JpxEncode {

  // ---- T.88 MQ encoder ----
  private[unstructured] final class MqEncoder {
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
      if (bit == mps) {
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          i = Jbig2Decode.Nmps(i)
          renorm()
        } else c += qe
      } else {
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Jbig2Decode.SwitchFlag(i) == 1) mps = 1 - mps
        i = Jbig2Decode.Nlps(i)
        renorm()
      }
      cxs(label) = (i << 1) | mps
    }

    def flush(): Array[Byte] = {
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

  // ---- packet-header bit writer with 0xFF stuffing ----
  private[unstructured] final class HdrWriter {
    private val out = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    private var lastFull = 0
    private def cap: Int = if (lastFull == 0xff) 7 else 8
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nbits += 1
      if (nbits == cap) { out += cur.toByte; lastFull = cur; cur = 0; nbits = 0 }
    }
    def write(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit((v >>> k) & 1); k -= 1 }
    }
    /** Pads to a byte boundary; a header whose final byte is 0xFF carries
      * one stuffed 0x00 (the reader's align consumes it).
      */
    def align(): Unit = {
      if (nbits > 0) {
        cur <<= (cap - nbits)
        out += cur.toByte; lastFull = cur; cur = 0; nbits = 0
      }
      if (lastFull == 0xff) { out += 0.toByte; lastFull = 0 }
    }
    def bytes: Array[Byte] = out.toArray
  }

  /** Raw (arithmetic-bypass) bit writer for lazy-mode SP/MR segments — MSB
    * first, with the byte-after-0xFF-carries-7-bits stuffing rule the
    * decoder's RawDecoder mirrors. flush() zero-pads the partial byte and
    * detaches a trailing 0xFF (a terminated segment must not end on one).
    */
  private[unstructured] final class RawWriter {
    private val out = scala.collection.mutable.ArrayBuffer[Byte]()
    private var c = 0
    private var ct = 8
    def bit(d: Int): Unit = {
      ct -= 1
      c |= (d & 1) << ct
      if (ct == 0) {
        out += c.toByte
        ct = if (c == 0xff) 7 else 8
        c = 0
      }
    }
    def flush(): Array[Byte] = {
      val fresh = if (out.nonEmpty && (out.last & 0xff) == 0xff) 7 else 8
      if (ct < fresh) out += c.toByte
      if (out.nonEmpty && (out.last & 0xff) == 0xff) out += 0.toByte
      out.toArray
    }
  }

  // ---- encoder-side tag tree ----
  private[unstructured] final class TagTreeEnc(w: Int, h: Int, leaves: Array[Int]) {
    private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b
    private val dims = {
      val b = Seq.newBuilder[(Int, Int)]
      var (cw, ch) = (w, h)
      b += ((cw, ch))
      while (cw > 1 || ch > 1) { cw = ceilDiv(cw, 2); ch = ceilDiv(ch, 2); b += ((cw, ch)) }
      b.result()
    }
    private val off = dims.scanLeft(0)((acc, d) => acc + d._1 * d._2)
    private val value = new Array[Int](off.last)
    private val low = new Array[Int](off.last)
    private val known = new Array[Boolean](off.last)
    locally {
      System.arraycopy(leaves, 0, value, 0, w * h)
      var lvl = 1
      while (lvl < dims.length) {
        val (pw, ph) = dims(lvl)
        val (cw, ch) = dims(lvl - 1)
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            var mn = Int.MaxValue
            var dj = 0
            while (dj < 2) {
              var di = 0
              while (di < 2) {
                val ci = 2 * i + di; val cj = 2 * j + dj
                if (ci < cw && cj < ch) mn = math.min(mn, value(off(lvl - 1) + cj * cw + ci))
                di += 1
              }
              dj += 1
            }
            value(off(lvl) + j * pw + i) = mn
            i += 1
          }
          j += 1
        }
        lvl += 1
      }
    }
    def encode(i: Int, j: Int, threshold: Int, w2: HdrWriter): Unit = {
      val path = new Array[Int](dims.length)
      var (ci, cj) = (i, j)
      var lvl = 0
      while (lvl < dims.length) {
        path(lvl) = off(lvl) + cj * dims(lvl)._1 + ci; ci >>= 1; cj >>= 1; lvl += 1
      }
      var lo = 0
      lvl = dims.length - 1
      while (lvl >= 0) {
        val nd = path(lvl)
        if (lo > low(nd)) low(nd) = lo else lo = low(nd)
        var done = false
        while (!done && lo < threshold) {
          if (lo < value(nd)) { w2.bit(0); lo += 1 }
          else { if (!known(nd)) { w2.bit(1); known(nd) = true }; done = true }
        }
        low(nd) = lo
        lvl -= 1
      }
    }
  }

  // ---- forward 5/3 DWT (mirrors JpxDecode.sr53's conventions) ----
  private def refl(k: Int, a: Int, b: Int): Int = {
    val n = b - 1 - a
    if (n == 0) return a
    var t = (k - a) % (2 * n)
    if (t < 0) t += 2 * n
    if (t > n) t = 2 * n - t
    a + t
  }

  /** 5/3 reversible 1D analysis over absolute coords [i0, i1) in place. */
  private[unstructured] def sd53(x: Array[Int], i0: Int, i1: Int): Unit = {
    val n = i1 - i0
    if (n <= 0) return
    if (n == 1) { if ((i0 & 1) == 1) x(0) = x(0) << 1; return }
    val ext = new Array[Int](n + 4)
    var k = i0 - 2
    while (k < i1 + 2) { ext(k - (i0 - 2)) = x(refl(k, i0, i1) - i0); k += 1 }
    @inline def e(k: Int): Int = ext(k - (i0 - 2))
    val y = new Array[Int](n + 4)
    @inline def ys(k: Int, v: Int): Unit = y(k - (i0 - 2)) = v
    @inline def yg(k: Int): Int = y(k - (i0 - 2))
    // odds over [i0-1, i1]: every odd neighbour an in-range even step needs
    k = i0 - 1
    while (k <= i1) {
      if ((k & 1) == 1) ys(k, e(k) - ((e(k - 1) + e(k + 1)) >> 1))
      k += 1
    }
    k = i0
    while (k < i1) {
      if ((k & 1) == 0) ys(k, e(k) + ((yg(k - 1) + yg(k + 1) + 2) >> 2))
      k += 1
    }
    k = i0
    while (k < i1) { x(k - i0) = yg(k); k += 1 }
  }

  // ---- Tier-1 encoder (exact mirror of JpxDecode.t1Decode) ----
  private val SIG = 1
  private val VISIT = 2
  private val REF = 4
  private val NEG = 8

  private def freshCtx(): Array[Int] = {
    val cx = new Array[Int](19)
    cx(18) = 46 << 1
    cx(17) = 3 << 1
    cx(0) = 4 << 1
    cx
  }

  /** Encodes one code block (signed coefficients) with `mb` bitplanes of
    * which `missing` lead zeros; all 3·(mb−missing)−2 passes, one MQ
    * codeword segment (the no-BYPASS shape).
    */
  private[unstructured] def t1Encode(vals: Array[Int], w: Int, h: Int,
      orient: Int, mb: Int, missing: Int): Array[Byte] =
    t1EncodeSegs(vals, w, h, orient, mb, missing, cbStyle = 0).head._1

  /** Segment-emitting Tier-1: returns (bytes, passes) per codeword
    * segment, honoring the COD code-block style byte. BYPASS (0x01, lazy
    * mode): the MQ coder terminates after the 10th pass and SP/MR pairs of
    * every lower bit-plane emit as raw terminated segments alternating
    * with single-cleanup MQ segments — contexts persisting across MQ
    * segments, exactly what the decoder's 10/2/1 schedule expects. RESET
    * (0x02): contexts re-initialize at every pass. TERMALL (0x04): every
    * pass flushes its own terminated segment. VCAUSAL (0x08):
    * stripe-causal context formation.
    */
  private[unstructured] def t1EncodeSegs(vals: Array[Int], w: Int, h: Int,
      orient: Int, mb: Int, missing: Int,
      cbStyle: Int): Seq[(Array[Byte], Int)] = {
    val bypass = (cbStyle & 0x01) != 0
    val resetCtx = (cbStyle & 0x02) != 0
    val termall = (cbStyle & 0x04) != 0
    val vcausal = (cbStyle & 0x08) != 0
    val flags = new Array[Int](w * h)
    val mag = new Array[Int](w * h)
    var i = 0
    while (i < vals.length) {
      mag(i) = math.abs(vals(i))
      if (vals(i) < 0) flags(i) |= NEG
      i += 1
    }
    var enc = new MqEncoder
    var rawW: RawWriter = null
    var inRaw = false
    var segPasses = 0
    var passIdx = 0
    val segsOut = Seq.newBuilder[(Array[Byte], Int)]
    val cx = freshCtx()

    var causalCap = Int.MaxValue // VCAUSAL: stripe loops keep this current
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
    @inline def stripeStart(k: Int): Unit =
      if (vcausal) causalCap = k + 4
    @inline def contrib(f: Int): Int =
      if ((f & SIG) == 0) 0 else if ((f & NEG) != 0) -1 else 1
    def encodeSign(x: Int, y: Int): Unit = {
      val hc = math.max(-1, math.min(1, contrib(at(x - 1, y)) + contrib(at(x + 1, y))))
      val vc = math.max(-1, math.min(1, contrib(at(x, y - 1)) + contrib(at(x, y + 1))))
      val (c, xor) = JpxDecode.scCtx(hc, vc)
      val s = if ((flags(y * w + x) & NEG) != 0) 1 else 0
      enc.encode(cx, c, s ^ xor)
    }

    val nb = mb - missing
    val passes = 3 * nb - 2
    var bp = mb - 1 - missing
    var pass = 0
    var left = passes
    var first = true
    while (left > 0 && bp >= 0) {
      val kind = if (first) 2 else pass
      if (segPasses == 0) {
        // new codeword segment: raw for lazy-mode SP/MR (pass 10 onward),
        // otherwise a fresh MQ coder — contexts (cx) persist throughout
        // (unless RESET re-initializes them each pass, below)
        inRaw = bypass && JpxDecode.isRawPass(passIdx)
        if (inRaw) rawW = new RawWriter
        else if (passIdx > 0) enc = new MqEncoder
      }
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
                val i2 = y * w + x
                if ((flags(i2) & SIG) == 0) {
                  val (hh, vv, dd) = sigN(x, y)
                  if (hh + vv + dd > 0) {
                    val bit = (mag(i2) >>> bp) & 1
                    if (inRaw) {
                      rawW.bit(bit)
                      if (bit == 1) {
                        flags(i2) |= SIG
                        rawW.bit(if ((flags(i2) & NEG) != 0) 1 else 0)
                      }
                    } else {
                      enc.encode(cx, JpxDecode.zcCtx(orient, hh, vv, dd), bit)
                      if (bit == 1) { flags(i2) |= SIG; encodeSign(x, y) }
                    }
                    flags(i2) |= VISIT
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
                val i2 = y * w + x
                if ((flags(i2) & SIG) != 0 && (flags(i2) & VISIT) == 0) {
                  if (inRaw) rawW.bit((mag(i2) >>> bp) & 1)
                  else {
                    val c = if ((flags(i2) & REF) != 0) 16 else {
                      val (hh, vv, dd) = sigN(x, y)
                      if (hh + vv + dd > 0) 15 else 14
                    }
                    enc.encode(cx, c, (mag(i2) >>> bp) & 1)
                  }
                  flags(i2) |= REF
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
              var rl = k + 3 < h
              if (rl) {
                var yy = k
                while (rl && yy < k + 4) {
                  val i2 = yy * w + x
                  if ((flags(i2) & (SIG | VISIT)) != 0) rl = false
                  else {
                    val (hh, vv, dd) = sigN(x, yy)
                    if (hh + vv + dd > 0) rl = false
                  }
                  yy += 1
                }
              }
              if (rl) {
                var firstSig = -1
                var yy = k
                while (firstSig < 0 && yy < k + 4) {
                  if (((mag(yy * w + x) >>> bp) & 1) == 1) firstSig = yy
                  yy += 1
                }
                if (firstSig < 0) { enc.encode(cx, 17, 0); y = k + 4 }
                else {
                  enc.encode(cx, 17, 1)
                  val r = firstSig - k
                  enc.encode(cx, 18, (r >>> 1) & 1)
                  enc.encode(cx, 18, r & 1)
                  y = firstSig
                  val i2 = y * w + x
                  flags(i2) |= SIG; encodeSign(x, y)
                  y += 1
                }
              }
              while (y < math.min(k + 4, h)) {
                val i2 = y * w + x
                if ((flags(i2) & (SIG | VISIT)) == 0) {
                  val (hh, vv, dd) = sigN(x, y)
                  val bit = (mag(i2) >>> bp) & 1
                  enc.encode(cx, JpxDecode.zcCtx(orient, hh, vv, dd), bit)
                  if (bit == 1) { flags(i2) |= SIG; encodeSign(x, y) }
                }
                y += 1
              }
              x += 1
            }
            k += 4
          }
          if ((cbStyle & 0x20) != 0) { // segmentation symbol 1010 (D.5)
            enc.encode(cx, 18, 1); enc.encode(cx, 18, 0)
            enc.encode(cx, 18, 1); enc.encode(cx, 18, 0)
          }
          var i2 = 0
          while (i2 < flags.length) { flags(i2) &= ~VISIT; i2 += 1 }
      }
      if (first) { first = false; pass = 0; bp -= 1 }
      else if (kind == 2) { pass = 0; bp -= 1 }
      else pass += 1
      left -= 1
      segPasses += 1
      // termination points: every pass under TERMALL; under lazy mode,
      // after the 10th pass, after every raw SP+MR pair, and after every
      // subsequent cleanup (T.800 D.4.1)
      val term = termall || (bypass &&
        (passIdx == 9 || (passIdx >= 10 && (passIdx - 10) % 3 >= 1)))
      passIdx += 1
      if (term) {
        segsOut += ((if (inRaw) rawW.flush() else enc.flush(), segPasses))
        segPasses = 0
      }
    }
    if (segPasses > 0)
      segsOut += ((if (inRaw) rawW.flush() else enc.flush(), segPasses))
    segsOut.result()
  }

  private def numPassesBits(w: HdrWriter, n: Int): Unit = {
    if (n == 1) w.bit(0)
    else if (n == 2) { w.bit(1); w.bit(0) }
    else if (n <= 5) { w.write(3, 2); w.write(n - 3, 2) }
    else if (n <= 36) { w.write(0xf, 4); w.write(n - 6, 5) }
    else { w.write(0x1ff, 9); w.write(n - 37, 7) }
  }

  // ---- whole-codestream assembly ----

  private final case class EncBand(orient: Int, w: Int, h: Int, data: Array[Int])

  /** Encodes 1 (gray) or 3 (RGB, RCT) components of unsigned `depth`-bit
    * samples (row-major, length w·h each) as a raw lossless codestream.
    */
  def encode(comps: Array[Array[Int]], w: Int, h: Int, depth: Int,
      levels: Int): Array[Byte] = encode(comps, w, h, depth, levels, 0)

  /** As [[encode]]; `bypass = true` emits lazy-mode (selective arithmetic
    * coding bypass, COD code-block style 0x01) codestreams — the common
    * "fast mode" high-resolution scanners produce.
    */
  def encode(comps: Array[Array[Int]], w: Int, h: Int, depth: Int,
      levels: Int, bypass: Boolean): Array[Byte] =
    encode(comps, w, h, depth, levels, if (bypass) 1 else 0)

  /** As [[encode]] with an explicit COD code-block style byte (any
    * combination of BYPASS 0x01 / RESET 0x02 / TERMALL 0x04 /
    * VCAUSAL 0x08).
    */
  def encode(comps: Array[Array[Int]], w: Int, h: Int, depth: Int,
      levels: Int, cbStyle: Int): Array[Byte] =
    encode(comps, w, h, depth, levels, cbStyle, layers = 1)

  /** As [[encode]] with `layers` quality layers (LRCP): each code block's
    * passes spread over the layers it participates in, code blocks
    * alternating their FIRST-inclusion layer so the inclusion tag trees
    * exercise thresholds past 1, and codeword-segment bytes riding the
    * contribution that completes the segment (earlier contributions of a
    * spanning segment signal explicit zero lengths — decoders concatenate
    * chunks per segment, so the split point is free).
    */
  def encode(comps: Array[Array[Int]], w: Int, h: Int, depth: Int,
      levels: Int, cbStyle: Int, layers: Int): Array[Byte] =
    encode(comps, w, h, depth, levels, cbStyle, layers, packed = 0)

  /** As [[encode]]; `packed` moves the packet headers out of the
    * bitstream: 1 = PPT marker segments in the tile-part header, 2 = a
    * PPM marker segment in the main header (one Nppm run — single
    * tile-part).
    */
  def encode(comps: Array[Array[Int]], w: Int, h: Int, depth: Int,
      levels: Int, cbStyle: Int, layers: Int, packed: Int): Array[Byte] =
    encode(comps, w, h, depth, levels, cbStyle, layers, packed, Nil)

  /** As [[encode]]; `poc` entries (rs, cs, lye, re, ce, ppoc) emit a main-
    * header POC marker and reorder the packets accordingly (A.6.6).
    */
  def encode(comps: Array[Array[Int]], w: Int, h: Int, depth: Int,
      levels: Int, cbStyle: Int, layers: Int, packed: Int,
      poc: Seq[(Int, Int, Int, Int, Int, Int)]): Array[Byte] = {
    require(layers >= 1 && layers <= 65535 && packed >= 0 && packed <= 2)
    require(comps.length == 1 || comps.length == 3, "1 or 3 components")
    require(w > 0 && h > 0 && depth >= 1 && depth <= 15 && levels >= 0 && levels <= 10)
    val nc = comps.length
    val shift = 1 << (depth - 1)
    val planes = comps.map(_.map(_ - shift))
    if (nc == 3) { // forward RCT
      var i = 0
      while (i < w * h) {
        val r = planes(0)(i); val g = planes(1)(i); val b = planes(2)(i)
        planes(0)(i) = (r + 2 * g + b) >> 2
        planes(1)(i) = b - g
        planes(2)(i) = r - g
        i += 1
      }
    }

    val guard = 2
    val cbExp = 6 // 64×64
    // per component: DWT → bands per resolution (res 0: LL; r: HL,LH,HH)
    val bandsOf = planes.map { plane =>
      var cur = plane.clone()
      var cw = w; var ch = h
      val perRes = new Array[Array[EncBand]](levels + 1)
      var lev = levels
      while (lev >= 1) {
        // vertical then horizontal analysis (decoder synthesis is H then V)
        val col = new Array[Int](ch)
        var x = 0
        while (x < cw) {
          var y = 0
          while (y < ch) { col(y) = cur(y * cw + x); y += 1 }
          sd53(col, 0, ch)
          y = 0
          while (y < ch) { cur(y * cw + x) = col(y); y += 1 }
          x += 1
        }
        val row = new Array[Int](cw)
        var y = 0
        while (y < ch) {
          System.arraycopy(cur, y * cw, row, 0, cw)
          sd53(row, 0, cw)
          System.arraycopy(row, 0, cur, y * cw, cw)
          y += 1
        }
        // deinterleave
        val lw = (cw + 1) / 2; val lh = (ch + 1) / 2
        val hw = cw / 2; val hh2 = ch / 2
        val ll = new Array[Int](lw * lh)
        val hl = new Array[Int](hw * lh)
        val lhB = new Array[Int](lw * hh2)
        val hhB = new Array[Int](hw * hh2)
        y = 0
        while (y < ch) {
          var x2 = 0
          while (x2 < cw) {
            val v = cur(y * cw + x2)
            if ((x2 & 1) == 0 && (y & 1) == 0) ll((y >> 1) * lw + (x2 >> 1)) = v
            else if ((x2 & 1) == 1 && (y & 1) == 0) hl((y >> 1) * hw + (x2 >> 1)) = v
            else if ((x2 & 1) == 0) lhB((y >> 1) * lw + (x2 >> 1)) = v
            else hhB((y >> 1) * hw + (x2 >> 1)) = v
            x2 += 1
          }
          y += 1
        }
        val rr = levels - lev + 1
        perRes(rr) = Array(EncBand(1, hw, lh, hl), EncBand(2, lw, hh2, lhB),
          EncBand(3, hw, hh2, hhB))
        cur = ll; cw = lw; ch = lh
        lev -= 1
      }
      perRes(0) = Array(EncBand(0, cw, ch, cur))
      // resolution index: perRes(r) currently keyed by "levels - lev + 1"
      // with lev descending — reorder so index r matches the decoder
      val ordered = new Array[Array[EncBand]](levels + 1)
      ordered(0) = perRes(0)
      var r2 = 1
      while (r2 <= levels) { ordered(r2) = perRes(levels - r2 + 1); r2 += 1 }
      ordered
    }

    // per-band epsilon from the actual coefficient range: Mb = eps+guard-1
    val epsOf = bandsOf.map(_.map(_.map { b =>
      var mx = 0
      b.data.foreach(v => mx = math.max(mx, math.abs(v)))
      val bits = 32 - Integer.numberOfLeadingZeros(mx)
      math.max(1, math.min(31, bits - guard + 1))
    }))

    val bo = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bo.write(v & 0xff)
    def u16(v: Int): Unit = { bo.write((v >>> 8) & 0xff); bo.write(v & 0xff) }
    def u32(v: Long): Unit = {
      bo.write(((v >>> 24) & 0xff).toInt); bo.write(((v >>> 16) & 0xff).toInt)
      bo.write(((v >>> 8) & 0xff).toInt); bo.write((v & 0xff).toInt)
    }
    u16(0xff4f) // SOC
    u16(0xff51); u16(38 + 3 * nc); u16(0) // SIZ
    u32(w); u32(h); u32(0); u32(0); u32(w); u32(h); u32(0); u32(0)
    u16(nc)
    var c = 0
    while (c < nc) { u8(depth - 1); u8(1); u8(1); c += 1 }
    u16(0xff52); u16(12) // COD, Scod=0
    u8(0); u8(0) // Scod, LRCP
    u16(layers)
    u8(if (nc == 3) 1 else 0) // MCT
    u8(levels); u8(cbExp - 2); u8(cbExp - 2); u8(cbStyle & 0x3f); u8(1)
    // per-component QCC would be needed if ranges differ; emit QCD for c0
    // and QCC for the others
    def writeQuant(marker: Int, comp: Int): Unit = {
      val nb = 3 * levels + 1
      if (marker == 0xff5c) { u16(0xff5c); u16(3 + nb) }
      else { u16(0xff5d); u16(4 + nb); u8(comp) }
      u8(guard << 5)
      // subband order: LL, then per res HL, LH, HH
      u8(epsOf(comp)(0)(0) << 3)
      var r2 = 1
      while (r2 <= levels) {
        var b2 = 0
        while (b2 < 3) { u8(epsOf(comp)(r2)(b2) << 3); b2 += 1 }
        r2 += 1
      }
    }
    writeQuant(0xff5c, 0)
    c = 1
    while (c < nc) { writeQuant(0xff5d, c); c += 1 }
    if (poc.nonEmpty) { // POC marker (A.6.6), nc < 257 form
      u16(0xff5f); u16(2 + 7 * poc.size)
      poc.foreach { case (rs, cs, lye, re, ce, pp) =>
        u8(rs); u8(cs); u16(lye); u8(re); u8(ce); u8(pp)
      }
    }

    // ---- tile body: packets LRCP (single precinct per resolution) ----
    // per-code-block mutable state carried across layers
    final class CbState(val segList: Seq[(Array[Byte], Int)], val missing: Int,
        val np: Int, val passesPerLayer: Array[Int]) {
      var included = false
      var lblock = 3
      var segIdx = 0
      var segPassDone = 0
    }
    var cbCounter = 0
    // precompute bands, tag trees, and per-layer pass splits once
    val resComp = (0 to levels).map { r2 =>
      (0 until nc).map { c2 =>
        val bands = bandsOf(c2)(r2)
        bands.zipWithIndex.map { case (b, bi) =>
          val cols = math.max((b.w + (1 << cbExp) - 1) >> cbExp, 0)
          val rows = math.max((b.h + (1 << cbExp) - 1) >> cbExp, 0)
          val mb = epsOf(c2)(r2)(bi) + guard - 1
          val states = new Array[CbState](cols * rows)
          val inclLeaves = new Array[Int](cols * rows)
          val zeroLeaves = new Array[Int](cols * rows)
          for (j <- 0 until rows; i2 <- 0 until cols) {
            val x0 = i2 << cbExp; val x1 = math.min((i2 + 1) << cbExp, b.w)
            val y0 = j << cbExp; val y1 = math.min((j + 1) << cbExp, b.h)
            val cw2 = x1 - x0; val ch2 = y1 - y0
            val vals = new Array[Int](cw2 * ch2)
            var yy = 0
            while (yy < ch2) {
              var xx = 0
              while (xx < cw2) {
                vals(yy * cw2 + xx) = b.data((y0 + yy) * b.w + (x0 + xx))
                xx += 1
              }
              yy += 1
            }
            var mx = 0
            vals.foreach(v => mx = math.max(mx, math.abs(v)))
            val bits = 32 - Integer.numberOfLeadingZeros(mx)
            if (bits == 0) { // all-zero block: never included
              inclLeaves(j * cols + i2) = layers
              states(j * cols + i2) = null
            } else {
              val missing = mb - bits
              val np = 3 * bits - 2
              val segList = t1EncodeSegs(vals, cw2, ch2, b.orient,
                missing + bits, missing, cbStyle)
              // alternate first-inclusion layers so multi-layer streams
              // exercise inclusion thresholds past 1
              val firstLayer = if (layers == 1) 0 else cbCounter % layers
              cbCounter += 1
              val split = new Array[Int](layers)
              val span = layers - firstLayer
              val base = np / span; val extra = np % span
              var l = 0
              while (l < span) {
                split(firstLayer + l) = base + (if (l < extra) 1 else 0)
                l += 1
              }
              inclLeaves(j * cols + i2) = firstLayer
              zeroLeaves(j * cols + i2) = missing
              states(j * cols + i2) = new CbState(segList, missing, np, split)
            }
          }
          (b, cols, rows, new TagTreeEnc(cols, rows, inclLeaves),
            new TagTreeEnc(cols, rows, zeroLeaves), states)
        }
      }
    }
    val body = new java.io.ByteArrayOutputStream()
    // packed mode: packet headers accumulate here instead of the bitstream
    val hdrOut = new java.io.ByteArrayOutputStream()
    // packet order: COD default (LRCP), or the POC schedule — each entry
    // emits its not-yet-emitted (layer, res, comp) volume in its own
    // progression, mirroring the decoder's A.6.6 walk (LRCP/RLCP only in
    // this twin; per-(r,c) layer order stays ascending either way)
    val defaultOrder = for (l <- 0 until layers; r2 <- 0 to levels;
      c2 <- 0 until nc) yield (l, r2, c2)
    val order: Seq[(Int, Int, Int)] =
      if (poc.isEmpty) defaultOrder
      else {
        val emitted = scala.collection.mutable.Set.empty[(Int, Int, Int)]
        val out = Seq.newBuilder[(Int, Int, Int)]
        for ((rs, cs, lye, re, ce, pp) <- poc) {
          require(pp == 0 || pp == 1, "twin supports LRCP/RLCP POC entries")
          val vol = defaultOrder.filter { case (l, r2, c2) =>
            !emitted.contains((l, r2, c2)) && r2 >= rs && r2 < re &&
              c2 >= cs && c2 < ce && l < lye
          }
          val sorted =
            if (pp == 0) vol.sortBy { case (l, r2, c2) => (l, r2, c2) }
            else vol.sortBy { case (l, r2, c2) => (r2, l, c2) }
          sorted.foreach { k => emitted += k; out += k }
        }
        out ++= defaultOrder.filterNot(emitted.contains)
        out.result()
      }
    for ((l, r2, c2) <- order) {
      {
        {
          val perBand = resComp(r2)(c2)
          val hw2 = new HdrWriter
          val segs = Seq.newBuilder[Array[Byte]]
          val any = perBand.exists(_._6.exists(st =>
            st != null && st.passesPerLayer(l) > 0))
          hw2.bit(if (any) 1 else 0)
          if (any) {
            for ((_, cols, rows, inclT, zeroT, states) <- perBand if cols * rows > 0) {
              var j = 0
              while (j < rows) {
                var i2 = 0
                while (i2 < cols) {
                  val st = states(j * cols + i2)
                  val n = if (st == null) 0 else st.passesPerLayer(l)
                  var emit = false
                  if (st == null || !st.included) {
                    inclT.encode(i2, j, l + 1, hw2)
                    if (n > 0) {
                      var t = 1
                      while (t <= st.missing) { zeroT.encode(i2, j, t, hw2); t += 1 }
                      zeroT.encode(i2, j, st.missing + 1, hw2)
                      st.included = true
                      emit = true
                    }
                  } else {
                    hw2.bit(if (n > 0) 1 else 0)
                    emit = n > 0
                  }
                  if (emit) {
                    numPassesBits(hw2, n)
                    // walk this contribution's segment pieces: bytes ride
                    // the piece completing a segment; earlier pieces of a
                    // spanning segment signal explicit zero lengths
                    var rem = n
                    val pieces = Seq.newBuilder[(Array[Byte], Int)]
                    while (rem > 0) {
                      val (sb, snp) = st.segList(st.segIdx)
                      val take = math.min(rem, snp - st.segPassDone)
                      st.segPassDone += take
                      if (st.segPassDone == snp) {
                        pieces += ((sb, take))
                        st.segIdx += 1; st.segPassDone = 0
                      } else pieces += ((Array.empty[Byte], take))
                      rem -= take
                    }
                    val ps = pieces.result()
                    // Lblock signalling: one length per piece, each coded
                    // with lblock + floor(log2(piece passes)) bits —
                    // lblock raised until EVERY piece's length fits
                    var extra = 0
                    for ((sb, snp) <- ps) {
                      val lenBitsNeeded = math.max(1,
                        32 - Integer.numberOfLeadingZeros(math.max(sb.length, 1)))
                      val autoBits = 31 - Integer.numberOfLeadingZeros(snp)
                      while (st.lblock + extra + autoBits < lenBitsNeeded) extra += 1
                    }
                    var k2 = 0
                    while (k2 < extra) { hw2.bit(1); k2 += 1 }
                    hw2.bit(0)
                    st.lblock += extra
                    for ((sb, snp) <- ps) {
                      val autoBits = 31 - Integer.numberOfLeadingZeros(snp)
                      hw2.write(sb.length, st.lblock + autoBits)
                    }
                    ps.foreach { case (sb, _) => if (sb.nonEmpty) segs += sb }
                  }
                  i2 += 1
                }
                j += 1
              }
            }
          }
          hw2.align()
          if (packed == 0) body.write(hw2.bytes) else hdrOut.write(hw2.bytes)
          segs.result().foreach(body.write)
        }
      }
    }

    val tileData = body.toByteArray
    val hdrData = hdrOut.toByteArray
    // packed headers: chunk into <= 60000-byte marker segments (Lppm/Lppt
    // is 16-bit), index byte Z ascending — decoders concatenate by Z
    def packedSegs(marker: Int, prefixNppm: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val payload =
        if (!prefixNppm) hdrData
        else {
          val p = new java.io.ByteArrayOutputStream()
          p.write((hdrData.length >>> 24) & 0xff); p.write((hdrData.length >>> 16) & 0xff)
          p.write((hdrData.length >>> 8) & 0xff); p.write(hdrData.length & 0xff)
          p.write(hdrData)
          p.toByteArray
        }
      var off = 0
      var z = 0
      while (off < payload.length) {
        val n = math.min(60000, payload.length - off)
        out.write((marker >>> 8) & 0xff); out.write(marker & 0xff)
        out.write(((3 + n) >>> 8) & 0xff); out.write((3 + n) & 0xff)
        out.write(z)
        out.write(payload, off, n)
        off += n; z += 1
      }
      out.toByteArray
    }
    if (packed == 2) bo.write(packedSegs(0xff60, prefixNppm = true)) // PPM (main header)
    val ppt = if (packed == 1) packedSegs(0xff61, prefixNppm = false)
      else Array.empty[Byte]
    u16(0xff90); u16(10); u16(0) // SOT, tile 0
    u32(12 + ppt.length + 2 + tileData.length) // Psot: SOT + PPT + SOD + data
    u8(0); u8(1)
    bo.write(ppt)
    u16(0xff93) // SOD
    bo.write(tileData)
    u16(0xffd9) // EOC
    bo.toByteArray
  }
}
