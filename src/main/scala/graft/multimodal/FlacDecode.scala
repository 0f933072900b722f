package graft.multimodal

/** Dependency-free FLAC decoder (RFC 9639) for the multimodal feature path.
  *
  * Scope: everything a conforming encoder emits for integer PCM — CONSTANT /
  * VERBATIM / FIXED(0-4) / LPC(1-32) subframes, both rice residual methods
  * (4- and 5-bit parameters) with escape partitions, wasted bits, and the
  * three stereo decorrelation modes (left/side, right/side, mid/side).
  * One documented exception: mid/side frames at bps 32 are rejected (None,
  * never wrong PCM) — their side channel needs true 33-bit samples, which
  * the Int-based pipeline cannot carry and whose wrap the shift-based
  * mid/side reconstruction (unlike the mod-2^32-congruent +/- of the other
  * two modes) cannot absorb.
  * Deliberately tolerant: frame and header CRCs are parsed but NOT verified
  * (feature extraction wants the samples, not an integrity gate), and decode
  * stops cleanly at the first malformed frame, returning what it has.
  *
  * The byte layout is the published one (RFC 9639 §9; the same layout the
  * reference's PDFBox-style dependencies would wrap) — no reference code
  * involved. Correctness is pinned by MultimodalSuite against a test-side
  * encoder written independently from the same RFC text.
  */
object FlacDecode {

  /** Interleaved integer PCM as decoded, plus the stream parameters. */
  final case class Pcm(sampleRate: Int, channels: Int, bits: Int, samples: Array[Int])

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    var bit = 0
    def bitsLeft: Long = (bytes.length.toLong - pos) * 8 - bit
    def u(n: Int): Long = {
      var out = 0L
      var left = n
      while (left > 0) {
        if (pos >= bytes.length) throw new ArrayIndexOutOfBoundsException(pos)
        val avail = 8 - bit
        val take = math.min(avail, left)
        val cur = (bytes(pos) >> (avail - take)) & ((1 << take) - 1)
        out = (out << take) | (cur & 0xffL)
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        left -= take
      }
      out
    }
    def s(n: Int): Int = {
      val v = u(n)
      // sign-extend n-bit value
      (v << (64 - n) >> (64 - n)).toInt
    }
    def unary(): Int = {
      var q = 0
      while (u(1) == 0L) {
        q += 1
        if (q > (1 << 24)) throw new IllegalStateException("runaway unary")
      }
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  /** Decode up to `maxSamples` interleaved samples (whole frames; the cap
    * bounds work on a multi-hour file the way the WAV path is bounded by
    * its data chunk). None when the bytes are not a decodable FLAC stream.
    */
  def decode(bytes: Array[Byte], maxSamples: Int = 1 << 24): Option[Pcm] =
    try {
      if (bytes.length < 42 || bytes(0) != 'f' || bytes(1) != 'L' ||
          bytes(2) != 'a' || bytes(3) != 'C') return None
      // STREAMINFO is mandatory and first (same layout flacInfo probes)
      if ((bytes(4) & 0x7f) != 0) return None
      def b(i: Int) = bytes(8 + i) & 0xffL
      val rate = ((b(10) << 12) | (b(11) << 4) | (b(12) >> 4)).toInt
      val channels = (((b(12) >> 1) & 0x7) + 1).toInt
      val bps = ((((b(12) & 0x1) << 4) | (b(13) >> 4)) + 1).toInt
      val totalSamples = ((b(13) & 0x0fL) << 32) | (b(14) << 24) | (b(15) << 16) |
        (b(16) << 8) | b(17)
      if (rate <= 0 || bps < 4 || bps > 32) return None
      // skip metadata blocks to the first frame
      var off = 4
      var last = false
      while (!last) {
        if (off + 4 > bytes.length) return None
        last = (bytes(off) & 0x80) != 0
        val len = ((bytes(off + 1) & 0xff) << 16) | ((bytes(off + 2) & 0xff) << 8) |
          (bytes(off + 3) & 0xff)
        off += 4 + len
      }
      val sink = new scala.collection.mutable.ArrayBuilder.ofInt // one buffer, doubling growth
      val want = if (totalSamples > 0) math.min(totalSamples, maxSamples.toLong)
        else maxSamples.toLong
      if (want < maxSamples) sink.sizeHint((want * channels).toInt)
      val r = new BitReader(bytes, off)
      var decoded = 0L
      var ok = true
      while (ok && decoded < want && r.bitsLeft >= 32) {
        frame(r, rate, channels, bps) match {
          case Some(block) =>
            val n = block(0).length
            var i = 0
            while (i < n && decoded < want) {
              var c = 0
              while (c < block.length) { sink += block(c)(i); c += 1 }
              decoded += 1; i += 1
            }
          case None => ok = false // stop at first malformed frame, keep prefix
        }
      }
      if (decoded == 0) return None
      Some(Pcm(rate, channels, bps, sink.result()))
    } catch { case _: Exception => None }

  /** One frame -> per-channel sample arrays (after stereo undecorrelation). */
  private def frame(r: BitReader, siRate: Int, siChannels: Int, siBps: Int): Option[Array[Array[Int]]] =
    try {
      r.align()
      if (r.u(14) != 0x3ffe) return None // sync code 11111111111110
      r.u(1) // reserved
      r.u(1) // blocking strategy
      val bsCode = r.u(4).toInt
      val srCode = r.u(4).toInt
      val chCode = r.u(4).toInt
      val ssCode = r.u(3).toInt
      r.u(1) // reserved
      // UTF-8-style coded frame/sample number: leading byte tells the width
      val lead = r.u(8).toInt
      var follow = 0
      var mask = 0x80
      while ((lead & mask) != 0) { follow += 1; mask >>= 1 }
      if (follow == 1 || follow > 7) return None
      var k = math.max(0, follow - 1)
      while (k > 0) { if ((r.u(8).toInt & 0xc0) != 0x80) return None; k -= 1 }
      val blockSize = bsCode match {
        case 0 => return None // reserved
        case 1 => 192
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case 6 => r.u(8).toInt + 1
        case 7 => r.u(16).toInt + 1
        case n => 256 << (n - 8)
      }
      srCode match { // consume inline sample-rate bytes; STREAMINFO wins
        case 12 => r.u(8)
        case 13 | 14 => r.u(16)
        case _ =>
      }
      val bps = ssCode match {
        case 0 => siBps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => return None
      }
      r.u(8) // header CRC-8 (parsed, not verified — tolerant by design)
      val (nCh, stereoMode) = chCode match {
        case c if c <= 7 => (c + 1, -1)
        case 8 => (2, 0) // left/side
        case 9 => (2, 1) // right/side
        case 10 => (2, 2) // mid/side
        case _ => return None
      }
      // every mode must agree with STREAMINFO, or the interleave contract
      // of the flat samples array breaks mid-stream
      if (nCh != siChannels) return None
      // mid/side needs the TRUE 33-bit side value: at bps 32 the side
      // subframe exceeds Int and the shift-based reconstruction (unlike the
      // mod-2^32-congruent +/- of left/side and right/side) cannot absorb
      // the wrap — reject rather than return wrong PCM
      if (stereoMode == 2 && bps > 31) return None
      val chans = new Array[Array[Int]](nCh)
      var c = 0
      while (c < nCh) {
        // side channels carry one extra bit of range
        val extra = stereoMode match {
          case 0 if c == 1 => 1
          case 1 if c == 0 => 1
          case 2 if c == 1 => 1
          case _ => 0
        }
        chans(c) = subframe(r, blockSize, bps + extra) match {
          case Some(s) => s
          case None => return None
        }
        c += 1
      }
      r.align()
      r.u(16) // frame CRC-16 (parsed, not verified)
      // undo stereo decorrelation
      stereoMode match {
        case 0 => // left/side: right = left - side
          var i = 0
          while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
        case 1 => // right/side: left = right + side  (order: side, right)
          var i = 0
          while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
        case 2 => // mid/side — Long intermediates: mid << 1 overflows Int at bps >= 31
          var i = 0
          while (i < blockSize) {
            val side = chans(1)(i).toLong
            val mid = (chans(0)(i).toLong << 1) | (side & 1L)
            chans(0)(i) = ((mid + side) >> 1).toInt
            chans(1)(i) = ((mid - side) >> 1).toInt
            i += 1
          }
        case _ =>
      }
      Some(chans)
    } catch { case _: Exception => None }

  private def subframe(r: BitReader, blockSize: Int, bps: Int): Option[Array[Int]] = {
    if (r.u(1) != 0) return None // padding bit
    val typ = r.u(6).toInt
    val wasted =
      if (r.u(1) == 1L) r.unary() + 1
      else 0
    val effBps = bps - wasted
    val out: Option[Array[Int]] = typ match {
      case 0 => // CONSTANT
        val v = r.s(effBps)
        Some(Array.fill(blockSize)(v))
      case 1 => // VERBATIM
        val a = new Array[Int](blockSize)
        var i = 0
        while (i < blockSize) { a(i) = r.s(effBps); i += 1 }
        Some(a)
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        fixedSubframe(r, blockSize, effBps, t - 8)
      case t if t >= 32 => // LPC order 1-32
        lpcSubframe(r, blockSize, effBps, t - 31)
      case _ => None // reserved
    }
    out.map { a =>
      if (wasted > 0) { var i = 0; while (i < a.length) { a(i) = a(i) << wasted; i += 1 } }
      a
    }
  }

  private def fixedSubframe(r: BitReader, blockSize: Int, bps: Int, order: Int): Option[Array[Int]] = {
    val s = new Array[Int](blockSize)
    var i = 0
    while (i < order) { s(i) = r.s(bps); i += 1 }
    if (!residual(r, s, blockSize, order)) return None
    // fixed predictors, RFC 9639 §9.2.5
    order match {
      case 0 =>
      case 1 => var j = 1; while (j < blockSize) { s(j) += s(j - 1); j += 1 }
      case 2 => var j = 2; while (j < blockSize) { s(j) += 2 * s(j - 1) - s(j - 2); j += 1 }
      case 3 => var j = 3; while (j < blockSize) { s(j) += 3 * s(j - 1) - 3 * s(j - 2) + s(j - 3); j += 1 }
      case 4 => var j = 4; while (j < blockSize) { s(j) += 4 * s(j - 1) - 6 * s(j - 2) + 4 * s(j - 3) - s(j - 4); j += 1 }
      case _ => return None
    }
    Some(s)
  }

  private def lpcSubframe(r: BitReader, blockSize: Int, bps: Int, order: Int): Option[Array[Int]] = {
    val s = new Array[Int](blockSize)
    var i = 0
    while (i < order) { s(i) = r.s(bps); i += 1 }
    val precision = r.u(4).toInt + 1
    if (precision == 16) return None // 1111 is invalid
    val shift = r.s(5)
    if (shift < 0) return None
    val coefs = new Array[Int](order)
    i = 0
    while (i < order) { coefs(i) = r.s(precision); i += 1 }
    if (!residual(r, s, blockSize, order)) return None
    var j = order
    while (j < blockSize) {
      var acc = 0L
      var t = 0
      while (t < order) { acc += coefs(t).toLong * s(j - 1 - t); t += 1 }
      s(j) += (acc >> shift).toInt
      j += 1
    }
    Some(s)
  }

  /** Rice-coded residual into s(order until blockSize); true on success. */
  private def residual(r: BitReader, s: Array[Int], blockSize: Int, order: Int): Boolean = {
    val method = r.u(2).toInt
    if (method > 1) return false
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.u(4).toInt
    val parts = 1 << partOrder
    if (blockSize % parts != 0) return false
    var idx = order
    var p = 0
    while (p < parts) {
      val count = (blockSize >> partOrder) - (if (p == 0) order else 0)
      if (count < 0) return false
      val param = r.u(paramBits).toInt
      if (param == escape) {
        val raw = r.u(5).toInt
        var i = 0
        while (i < count) { s(idx) = if (raw == 0) 0 else r.s(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val rem = if (param == 0) 0L else r.u(param)
          val folded = (q.toLong << param) | rem
          // zigzag: even -> n/2, odd -> -(n+1)/2
          s(idx) = (if ((folded & 1) == 0) folded >>> 1 else -((folded + 1) >>> 1)).toInt
          idx += 1; i += 1
        }
      }
      p += 1
    }
    true
  }
}
