package graft.multimodal

/** Minimal Layer III encoder — the fixture twin of [[Mp3Decode]],
  * existing for the same reason `JpxEncode` does: verify-gate fixtures
  * plant MP3 payloads whose dedup outcome has a relational oracle, and
  * Mp3Suite pins encoder -> decoder round trips (SNR-bounded — Layer III
  * is lossy) plus the bit-exact part2_3_length landing the decoder
  * enforces per granule.
  *
  * Scope: MPEG-1 at 48/32 kHz (320 kbps), MPEG-2 LSF at 24/16 kHz and
  * MPEG-2.5 at 12/8 kHz (144 kbps, one granule per frame) — the
  * rate/bitrate pairs where frames divide into whole bytes (no padding
  * logic); mono or stereo (optionally MS), long blocks or all-short
  * blocks, zero scalefactors, no bit reservoir (main_data_begin = 0), and
  * only the VALIDATED Huffman table subset (big values via table 9,
  * |is| <= 5; count1 tails via the fixed table B). Every choice is a legal
  * stream a conforming decoder accepts; the restrictions exist because
  * only the validated tables may be exercised (see Mp3Decode's header).
  */
private[graft] object Mp3Encode {

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    var bits = 0L
    def w(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nb += 1; bits += 1
        if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def pad(): Unit = while (nb != 0) w(0, 1)
    def bytes: Array[Byte] = { pad(); buf.toByteArray }
  }

  private val synthM = Array.tabulate(32, 64) { (i, j) =>
    math.cos((2 * i + 1) * (j - 16) * math.Pi / 64.0)
  }

  /** ISO analysis filterbank (C window from [[SynthesisWindow]]). */
  private[multimodal] final class Analysis {
    private val x = new Array[Double](512)
    def accept(seg: Array[Double]): Array[Double] = {
      System.arraycopy(x, 0, x, 32, 480)
      var i = 0
      while (i < 32) { x(31 - i) = seg(i); i += 1 }
      val y = new Array[Double](64)
      var n = 0
      while (n < 512) { y(n & 63) += x(n) * SynthesisWindow.c(n); n += 1 }
      Array.tabulate(32) { k =>
        var acc = 0.0
        var j = 0
        while (j < 64) { acc += synthM(k)(j) * y(j); j += 1 }
        acc
      }
    }
  }

  private val aliasCi =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  private val aliasCs = aliasCi.map(ci => 1.0 / math.sqrt(1.0 + ci * ci))
  private val aliasCa = aliasCi.zip(aliasCs).map { case (ci, cs) => ci * cs }

  private def mdct36(z: Array[Double]): Array[Double] = {
    val win = Array.tabulate(36)(i => math.sin(math.Pi / 36.0 * (i + 0.5)))
    Array.tabulate(18) { k =>
      var acc = 0.0
      var i = 0
      while (i < 36) {
        acc += z(i) * win(i) * math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
        i += 1
      }
      acc * 4.0 / 36.0 // Princen-Bradley scale: the decoder IMDCT carries none
    }
  }

  private case class EncGranule(is: Array[Int], globalGain: Int,
      bigValues: Int, tableSel: Int, count1Lines: Int, blockType: Int,
      sfc: Int = 0, sfBits: Seq[(Int, Int)] = Nil) // (value, width) part2 bits

  /** global_gain keeping |is| <= cap (validated tables carry at most 5). */
  private def quantize(xr: Array[Double], cap: Int): (Array[Int], Int) = {
    val maxAbs = xr.map(math.abs).max
    if (maxAbs == 0.0) return (new Array[Int](576), 210)
    val step = maxAbs / math.pow(cap + 0.4, 4.0 / 3.0)
    val gg = math.max(0, math.min(255,
      210 + math.ceil(4.0 * math.log(step) / math.log(2.0)).toInt))
    val s = math.pow(2.0, 0.25 * (gg - 210))
    val is = xr.map { v =>
      val q = math.round(math.pow(math.abs(v) / s, 0.75)).toInt
      math.signum(v).toInt * math.min(q, cap)
    }
    (is, gg)
  }

  private def packGranule(bw: BitWriter, g: EncGranule): Unit = {
    val t = Mp3Decode.bigValueTables(g.tableSel)
    var line = 0
    while (line < g.bigValues * 2) {
      val x = g.is(line); val y = g.is(line + 1)
      val (l, c) = t((math.abs(x) << 4) | math.abs(y))
      bw.w(c, l)
      if (x != 0) bw.w(if (x < 0) 1 else 0, 1)
      if (y != 0) bw.w(if (y < 0) 1 else 0, 1)
      line += 2
    }
    var q = 0
    while (q < g.count1Lines / 4) {
      val base = g.bigValues * 2 + q * 4
      var pattern = 0
      var k = 0
      while (k < 4) { if (g.is(base + k) != 0) pattern |= 1 << (3 - k); k += 1 }
      bw.w(15 - pattern, 4) // count1 table B
      k = 0
      while (k < 4) {
        if (g.is(base + k) != 0) bw.w(if (g.is(base + k) < 0) 1 else 0, 1)
        k += 1
      }
      q += 1
    }
  }

  /** Twin rates: MPEG-1 at 320 kbps, LSF/MPEG-2.5 at 144 kbps — the
    * combinations where the frame divides into whole bytes (no padding
    * logic). 11025 Hz never divides (rate has a factor 49), but it shares
    * its band tables with 12000, so the 12000 twin covers them.
    */
  private def rateInfo(sampleRate: Int): (Boolean, Boolean, Int, Int) =
    sampleRate match {
      //          (mpeg1, mpeg25, srBits, frameLen)
      case 48000 => (true,  false, 1, 960)
      case 32000 => (true,  false, 2, 1440)
      case 24000 => (false, false, 1, 432)
      case 16000 => (false, false, 2, 648)
      case 12000 => (false, true,  1, 864)
      case 8000  => (false, true,  2, 1296)
      case r => throw new IllegalArgumentException(s"unsupported twin rate $r")
    }

  /** sfb-table row in Mp3Decode's (M1 | M2) arrays for a twin rate. */
  private[multimodal] def sfbIdx(sampleRate: Int): Int = sampleRate match {
    case 48000 => 1; case 32000 => 2         // sfbLongM1 rows
    case 24000 => 1; case 16000 => 2         // sfbLongM2 LSF rows
    case 12000 => 4; case 8000  => 5         // sfbLongM2 MPEG-2.5 rows
    case r => throw new IllegalArgumentException(s"unsupported twin rate $r")
  }

  private def frame(sampleRate: Int, mono: Boolean, modeExt: Int,
      grs: Array[Array[EncGranule]]): Array[Byte] = {
    val channels = if (mono) 1 else 2
    val (mpeg1, mpeg25, srBits, frameLen) = rateInfo(sampleRate)
    val out = new java.io.ByteArrayOutputStream()
    // header: sync(3) ver(2: 11 M1, 10 LSF, 00 2.5) layer(01) prot(1)
    out.write(0xFF)
    out.write(if (mpeg1) 0xFB else if (mpeg25) 0xE3 else 0xF3)
    // bitrate idx 14 = 320 kbps (M1) / idx 13 = 144 kbps (LSF/2.5)
    out.write((if (mpeg1) 0xE0 else 0xD0) | (srBits << 2))
    out.write(if (mono) 0xC0 else 0x40 | (modeExt << 4))
    val side = new BitWriter
    side.w(0, if (mpeg1) 9 else 8) // main_data_begin: no reservoir
    side.w(0, if (mpeg1) { if (mono) 5 else 3 } else { if (mono) 1 else 2 })
    if (mpeg1) for (_ <- 0 until channels * 4) side.w(0, 1) // scfsi
    val nGr = if (mpeg1) 2 else 1
    val main = new BitWriter
    for (gr <- 0 until nGr; ch <- 0 until channels) {
      val g = grs(gr)(ch)
      val before = main.bits
      g.sfBits.foreach { case (v, w) => main.w(v, w) } // part2: scalefactors
      packGranule(main, g)
      val part23 = (main.bits - before).toInt
      side.w(part23, 12)
      side.w(g.bigValues, 9)
      side.w(g.globalGain, 8)
      // scalefac_compress 0 (the default): M1 slen (0,0), LSF slen
      // (0,0,0,0) — zero scalefactors either way (and LSF preflag =
      // sfc >= 500 stays off). The LSF intensity channel carries its own
      // sfc + explicit is_pos bits via sfBits.
      side.w(g.sfc, if (mpeg1) 4 else 9)
      if (g.blockType == 2) {
        side.w(1, 1); side.w(2, 2); side.w(0, 1) // switching, short, not mixed
        side.w(g.tableSel, 5); side.w(g.tableSel, 5)
        side.w(0, 9) // subblock gains
      } else {
        side.w(0, 1)
        side.w(g.tableSel, 5); side.w(g.tableSel, 5); side.w(g.tableSel, 5)
        side.w(7, 4); side.w(7, 3) // region counts
      }
      if (mpeg1) side.w(0, 1) // preflag (side-info bit in MPEG-1 only)
      side.w(0, 1) // scalefac_scale
      side.w(1, 1) // count1 table B
    }
    val sideBytes = side.bytes
    require(sideBytes.length == (if (mpeg1) { if (mono) 17 else 32 }
                                 else { if (mono) 9 else 17 }))
    out.write(sideBytes)
    val mainBytes = main.bytes
    val room = frameLen - 4 - sideBytes.length
    require(mainBytes.length <= room,
      s"main data ${mainBytes.length} exceeds frame room $room")
    out.write(mainBytes)
    out.write(new Array[Byte](room - mainBytes.length)) // stuffing
    out.toByteArray
  }

  /** PCM (per-channel arrays, [-1,1] doubles) -> Layer III bytes.
    * Trailing samples that do not fill a whole frame (2 granules) drop.
    */
  /** @param intensity LSF/MPEG-2.5 only, mono input: emit a joint-stereo
    *                   INTENSITY frame — ch0 carries the spectrum, ch1 is
    *                   an is_pos-only stub (sfc = 86·2+scale → slens 2,2,2;
    *                   zero spectrum, so rzero = 0 and every band pans).
    *                   `isPos` 0-2 are legal positions, 3 is the ILLEGAL
    *                   marker for 2-bit fields (no panning).
    */
  def encode(pcm: Array[Array[Double]], sampleRate: Int = 48000,
      shortBlocks: Boolean = false, ms: Boolean = false,
      count1Tail: Int = 0, intensity: Boolean = false,
      isPos: Int = 1, intensityScale: Int = 0): Array[Byte] = {
    val channels = pcm.length
    val (isMpeg1, _, _, _) = rateInfo(sampleRate)
    require(!intensity || (!isMpeg1 && channels == 1 && !ms && !shortBlocks),
      "intensity twin: LSF/2.5 rate, mono source, long blocks")
    require(isPos >= 0 && isPos <= 3, s"is_pos out of the 2-bit field: $isPos")
    val gPerFrame = if (isMpeg1) 2 else 1 // LSF/2.5 frames carry one granule
    val nGranules = pcm(0).length / 576
    val analysis = Array.fill(channels)(new Analysis)
    val sub = Array.ofDim[Double](channels, nGranules, 32, 18)
    for (c <- 0 until channels; g <- 0 until nGranules; t <- 0 until 18) {
      val s = analysis(c).accept(pcm(c).slice(g * 576 + t * 32, g * 576 + t * 32 + 32))
      for (sb <- 0 until 32) sub(c)(g)(sb)(t) = s(sb)
    }
    // frequency inversion — the encoder mirror of the decoder's step
    for (c <- 0 until channels; g <- 0 until nGranules; sb <- 0 until 32 if (sb & 1) == 1;
         t <- 0 until 18 if (t & 1) == 1)
      sub(c)(g)(sb)(t) = -sub(c)(g)(sb)(t)
    val prev = Array.ofDim[Double](channels, 32, 18)
    val xrStash = Array.ofDim[Array[Double]](gPerFrame, channels)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var g = 0
    while (g + gPerFrame <= nGranules) {
      val encGrs = Array.ofDim[EncGranule](gPerFrame, if (intensity) 2 else channels)
      for (fg <- 0 until gPerFrame; c <- 0 until channels) {
        val xr = new Array[Double](576)
        for (sb <- 0 until 32) {
          val z = new Array[Double](36)
          var i = 0
          while (i < 18) {
            z(i) = prev(c)(sb)(i); z(18 + i) = sub(c)(g + fg)(sb)(i); i += 1
          }
          System.arraycopy(sub(c)(g + fg)(sb), 0, prev(c)(sb), 0, 18)
          if (shortBlocks) {
            val winS = Array.tabulate(12)(i => math.sin(math.Pi / 12.0 * (i + 0.5)))
            for (w <- 0 until 3; k <- 0 until 6) {
              var acc = 0.0
              for (i <- 0 until 12)
                acc += z(6 + 6 * w + i) * winS(i) *
                  math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))
              xr(sb * 18 + w * 6 + k) = acc * 4.0 / 12.0
            }
          } else {
            val m = mdct36(z)
            System.arraycopy(m, 0, xr, sb * 18, 18)
          }
        }
        if (!shortBlocks) {
          // inverse alias butterflies (the decoder applies the forward ones)
          for (sb <- 0 until 31; i <- 0 until 8) {
            val lo = sb * 18 + 17 - i
            val hi = sb * 18 + 18 + i
            val a = xr(lo); val b = xr(hi)
            xr(lo) = a * aliasCs(i) + b * aliasCa(i)
            xr(hi) = b * aliasCs(i) - a * aliasCa(i)
          }
        }
        xrStash(fg)(c) = xr
      }
      for (fg <- 0 until gPerFrame) {
        if (ms && channels == 2) {
          val l = xrStash(fg)(0); val r = xrStash(fg)(1)
          var i = 0
          while (i < 576) {
            val m = (l(i) + r(i)) / math.sqrt(2.0)
            val s = (l(i) - r(i)) / math.sqrt(2.0)
            l(i) = m; r(i) = s; i += 1
          }
        }
        for (c <- 0 until channels) {
          val xr = xrStash(fg)(c)
          val (is, gg) = quantize(xr, 5)
          val coded = if (!shortBlocks) is else {
            // inverse of the decoder's reorderShort: (subband, window, line)
            // natural order back to coded (band, window, line-in-band)
            val sfbShort =
              if (isMpeg1) Mp3Decode.sfbShortM1(sfbIdx(sampleRate))
              else Mp3Decode.sfbShortM2(sfbIdx(sampleRate))
            val outv = new Array[Int](576)
            for (band <- 0 until 13; win <- 0 until 3) {
              val s0 = sfbShort(band)
              val w = sfbShort(band + 1) - s0
              for (i <- 0 until w) {
                val line = s0 + i
                outv(s0 * 3 + win * w + i) = is((line / 6) * 18 + win * 6 + (line % 6))
              }
            }
            outv
          }
          var lastNz = 575
          while (lastNz >= 0 && coded(lastNz) == 0) lastNz -= 1
          var bigLines = (lastNz + 2) / 2 * 2
          var count1Lines = 0
          if (count1Tail > 0) {
            val c1 = math.min(count1Tail, lastNz + 1) / 4 * 4
            val rawBig = lastNz + 1 - c1
            bigLines = (rawBig + 1) / 2 * 2
            count1Lines = (c1 - (bigLines - rawBig)) / 4 * 4
            var i = bigLines
            while (i < bigLines + count1Lines) {
              if (coded(i) > 1) coded(i) = 1
              if (coded(i) < -1) coded(i) = -1
              i += 1
            }
          }
          encGrs(fg)(c) = EncGranule(coded, gg, bigLines / 2, 9,
            count1Lines, if (shortBlocks) 2 else 0)
        }
      }
      if (intensity) {
        // ch1: intensity stub — no spectrum (rzero = 0 at decode), is_pos
        // per band in the isfc=86 layout (3 partitions x 7 bands, slen 2)
        for (fg <- 0 until gPerFrame)
          encGrs(fg)(1) = EncGranule(new Array[Int](576), 210, 0, 9, 0, 0,
            sfc = (86 << 1) | (intensityScale & 1),
            sfBits = Seq.fill(21)((isPos, 2)))
      }
      frames += frame(sampleRate, channels == 1 && !intensity,
        if (intensity) 1 else if (ms) 2 else 0, encGrs)
      g += gPerFrame
    }
    frames.flatten.toArray
  }
}
