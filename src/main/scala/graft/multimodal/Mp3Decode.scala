package graft.multimodal

/** Dependency-free MPEG audio Layer III (MP3) decoder for the multimodal
  * feature path: MPEG-1 (ISO/IEC 11172-3), MPEG-2 LSF (ISO/IEC 13818-3),
  * and MPEG-2.5 (the Fraunhofer de-facto low-rate extension: header
  * version bits 00, sample rates 11025/12000/8000) Layer III, mono and
  * stereo (LR / MS / MPEG-1 intensity), long, short, start/stop and MPEG-1
  * mixed blocks, with the bit reservoir honored across frames.
  *
  * VALIDATION POSTURE (the honest version of the r13 "MP3 stays a stub"
  * doc, which this file supersedes): the container has no reference MP3
  * decoder, encoder, or known-good fixture beyond one LAME-encoded silent
  * stream, so correctness rests on three legs —
  *
  *  1. **Structural self-checks on transcribed spec tables.** Every
  *     Huffman table shipped here passes Kraft equality (codeword lengths
  *     sum to exactly 1) and pairwise prefix-freeness (suite-pinned);
  *     every scalefactor-band table sums to exactly 576 (long) / 192
  *     (short) lines. A mis-transcribed length or boundary fails loudly.
  *     Tables whose transcription could NOT be validated this way are NOT
  *     shipped: big-value tables 8, 10-15 and the ESC families 16-23 /
  *     24-31 are rejected cleanly (frame skipped, never wrong PCM) and
  *     recorded as residue below. The shipped set — tables 0-3, 5-7, 9
  *     and both count1 tables — covers |value| <= 5 per spectral line,
  *     i.e. low-energy / coarsely-quantized material.
  *  2. **Bit-exact landing.** Layer III Huffman data must consume exactly
  *     part2_3_length bits per granule; the decoder enforces the landing
  *     (after the spec's one-quadruple count1 overshoot tolerance) and
  *     rejects the frame otherwise. Against real encoder output a wrong
  *     table desynchronizes the bitstream within a few symbols, so clean
  *     landings across a stream are strong evidence the exercised tables
  *     are right.
  *  3. **External + twin fixtures.** MultimodalSuite pins this decoder
  *     against the one real LAME stream in the container (MPEG-2 LSF
  *     22.05 kHz mono: frame walk, side info, silence PCM) and against a
  *     test-side MPEG-1 encoder twin (sine round-trips with SNR bounds,
  *     long + short + MS shapes) built independently from the same spec
  *     text, plus closed-form IMDCT/TDAC identities that do not depend on
  *     the twin.
  *
  * The synthesis filterbank uses the exact ISO cosine matrixing; its
  * 512-tap prototype window is a Kaiser-designed near-perfect-
  * reconstruction substitute (the ISO window is committee-designed
  * tabulated data with no closed form and no offline source — a garbled
  * transcription would be unverifiable, a designed one has a measurable
  * contract). Reconstruction error of the analysis+synthesis chain is
  * pinned in the suite; ISO conformance itself is RMS-bounded
  * (ISO/IEC 11172-4), not bit-exact, so decoders legitimately differ at
  * this magnitude. Swap in the ISO table if a validated source appears.
  *
  * Residue (all reject to None / frame skip, never wrong samples):
  * Layer I/II, free-format streams, LSF mixed blocks, intensity stereo on
  * short blocks (any layer), and frames selecting the unvalidated Huffman
  * tables listed above. LSF/2.5 intensity on long blocks decodes
  * (ISO 13818-3 is_pos semantics with per-band illegal positions; the io
  * polarity — 2^(-1/2) when intensity_scale is set, 2^(-1/4) otherwise —
  * follows the common open-implementation reading of the spec and is
  * twin-validated; a swapped polarity would be a bounded per-band gain
  * error, within the feature-grade contract documented in EXAMPLES.md).
  *
  * Why the ESC/high-energy Huffman tables stay out (the honest blocker,
  * recorded after an exhaustive container search): tables 8, 10-15 and the
  * ESC families 16-31 are 36-to-256-entry committee data with NO offline
  * source in this environment — no decoder source tree, no conformance
  * stream, and the one external fixture (a LAME LSF silence stream) never
  * selects them. The structural checks (Kraft equality, prefix-freeness)
  * can validate that a transcription IS a prefix code but cannot
  * distinguish the ISO assignment from a permuted one, and for tables this
  * size a from-memory transcription would be guesswork that the encoder
  * twin — built from the same guess — could not falsify. A wrong-but-valid
  * table whose codeword LENGTHS match the spec decodes real streams to
  * confidently wrong PCM with clean bit-landings, which is exactly the
  * failure mode this file's contract forbids. They ship the day a
  * validated source (spec text, reference decoder, or a conformance
  * bitstream to constraint-solve against) is available.
  *
  * Reference parity note: zetaris/lightning-metastore reads audio through
  * external jars; this path has no reference counterpart (same posture as
  * [[FlacDecode]], `JpxDecode`, `Jbig2Decode`).
  */
object Mp3Decode {

  /** Interleaved 16-bit-range PCM plus stream parameters. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Int])

  // ------------------------------------------------------------------
  // Huffman tables (ISO 11172-3 Annex B, Table B.7) — validated subset.
  //
  // Each big-value table maps (x, y) -> (hlen, hcod). The suite asserts
  // Kraft equality and prefix-freeness for every table below; that check
  // is why ONLY these ship (see header). Table 4 and 14 are unused by the
  // spec itself; table 0 codes the all-zero region (no bits).
  // ------------------------------------------------------------------

  /** (x, y) -> (hlen, hcod), packed as ((x<<4|y), (hlen<<16|hcod)). */
  private def tab(entries: (Int, Int, Int, Int)*): Map[Int, (Int, Int)] =
    entries.map { case (x, y, l, c) => ((x << 4) | y, (l, c)) }.toMap

  private[multimodal] val bigValueTables: Map[Int, Map[Int, (Int, Int)]] = Map(
    1 -> tab((0,0,1,1),(0,1,3,1),(1,0,2,1),(1,1,3,0)),
    2 -> tab((0,0,1,1),(0,1,3,2),(0,2,6,1),(1,0,3,3),(1,1,3,1),(1,2,5,1),
             (2,0,5,3),(2,1,5,2),(2,2,6,0)),
    3 -> tab((0,0,2,3),(0,1,2,2),(0,2,6,1),(1,0,3,1),(1,1,2,1),(1,2,5,1),
             (2,0,5,3),(2,1,5,2),(2,2,6,0)),
    5 -> tab((0,0,1,1),(0,1,3,2),(0,2,6,6),(0,3,7,5),
             (1,0,3,3),(1,1,3,1),(1,2,6,4),(1,3,7,4),
             (2,0,6,7),(2,1,6,5),(2,2,7,7),(2,3,8,1),
             (3,0,7,6),(3,1,6,1),(3,2,7,1),(3,3,8,0)),
    6 -> tab((0,0,3,7),(0,1,3,3),(0,2,5,5),(0,3,7,1),
             (1,0,3,6),(1,1,2,2),(1,2,4,3),(1,3,5,2),
             (2,0,4,5),(2,1,4,4),(2,2,5,4),(2,3,6,1),
             (3,0,6,3),(3,1,5,3),(3,2,6,2),(3,3,7,0)),
    7 -> tab((0,0,1,1),(0,1,3,2),(0,2,6,10),(0,3,8,19),(0,4,8,16),(0,5,9,10),
             (1,0,3,3),(1,1,4,3),(1,2,6,7),(1,3,7,10),(1,4,7,5),(1,5,8,3),
             (2,0,6,11),(2,1,5,4),(2,2,7,13),(2,3,8,17),(2,4,8,8),(2,5,9,4),
             (3,0,7,12),(3,1,7,11),(3,2,8,18),(3,3,9,15),(3,4,9,11),(3,5,9,2),
             (4,0,7,7),(4,1,7,6),(4,2,8,9),(4,3,9,14),(4,4,9,3),(4,5,10,1),
             (5,0,8,6),(5,1,8,4),(5,2,9,5),(5,3,10,3),(5,4,10,2),(5,5,10,0)),
    9 -> tab((0,0,3,7),(0,1,3,5),(0,2,5,9),(0,3,6,14),(0,4,8,15),(0,5,9,7),
             (1,0,3,6),(1,1,3,4),(1,2,4,5),(1,3,5,5),(1,4,6,6),(1,5,8,7),
             (2,0,4,7),(2,1,4,6),(2,2,5,8),(2,3,6,8),(2,4,7,8),(2,5,8,5),
             (3,0,6,15),(3,1,5,6),(3,2,6,9),(3,3,7,10),(3,4,7,5),(3,5,8,1),
             (4,0,7,11),(4,1,6,7),(4,2,7,9),(4,3,7,6),(4,4,8,4),(4,5,9,1),
             (5,0,8,14),(5,1,7,4),(5,2,8,6),(5,3,8,2),(5,4,9,6),(5,5,9,0)))

  /** Largest |x|/|y| each shipped table can carry (for the encoder twin
    * and the region/table legality check).
    */
  private[multimodal] val tableMax: Map[Int, Int] =
    Map(1 -> 1, 2 -> 2, 3 -> 2, 5 -> 3, 6 -> 3, 7 -> 5, 9 -> 5)

  /** count1 table A: (v,w,x,y) packed as a 4-bit int -> (hlen, hcod);
    * table B is the fixed 4-bit code hcod = 15 - value.
    */
  private[multimodal] val count1A: Array[(Int, Int)] = Array(
    (1,1),(4,5),(4,4),(5,5),(4,6),(6,5),(5,4),(6,4),
    (4,7),(5,3),(5,6),(6,0),(5,7),(6,3),(6,2),(6,1))

  /** Decode LUT: a two-level array indexed by codeword length then code
    * value, -1 = no code at that (len, code). Keeps the innermost decode
    * loop allocation-free — the previous boxed-Long HashMap allocated a
    * java.lang.Long on every bit step of every codeword (Long.valueOf
    * caches only -128..127). Full code width is addressable: ISO big-value
    * lengths reach 19 bits (ESC tables 16-23), so a 17-19-bit candidate
    * transcription under [[Mp3TableValidator]] still decodes exactly (a
    * 19-bit level costs a transient 2 MB; the shipped tables top out at 13
    * bits, ~32 KB total per table).
    */
  private final class HuffDecoder(pairs: Iterable[(Int, (Int, Int))]) {
    var maxLen = 0
    pairs.foreach { case (_, (l, _)) => if (l >= 1 && l <= 30 && l > maxLen) maxLen = l }
    private val byLen: Array[Array[Int]] = new Array[Array[Int]](maxLen + 1)
    pairs.foreach { case (v, (l, c)) =>
      // out-of-range entries are skipped, preserving the old map's semantics
      // (a 0-length or over-wide code could never win the shortest-match
      // scan below); packed values are non-negative, so -1 is a free sentinel
      if (l >= 1 && l <= maxLen && c >= 0 && c < (1 << l)) {
        if (byLen(l) == null) byLen(l) = Array.fill(1 << l)(-1)
        byLen(l)(c) = v
      }
    }
    /** Read one codeword from `br`; -1 when no code matches (invalid). */
    def next(br: BitReader): Int = {
      var code = 0; var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.u1()
        len += 1
        val tab = byLen(len)
        if (tab != null) {
          val hit = tab(code)
          if (hit >= 0) return hit
        }
      }
      -1
    }
  }

  private val bigDecoders: Map[Int, HuffDecoder] =
    bigValueTables.map { case (id, t) => id -> new HuffDecoder(t) }
  private val count1ADecoder: HuffDecoder =
    new HuffDecoder(count1A.zipWithIndex.map { case (lc, v) => (v, lc) })

  // ------------------------------------------------------------------
  // Scalefactor-band tables (ISO 11172-3 Table B.8, ISO 13818-3 Table B.2).
  // Stored as widths; cumulative index arrays derived. Every long table
  // sums to 576 and every short table to 192 (suite-pinned) — a garbled
  // width breaks the sum.
  // ------------------------------------------------------------------

  private def cum(widths: Array[Int]): Array[Int] = widths.scanLeft(0)(_ + _)

  // MPEG-1: index by sample-rate position 0=44100, 1=48000, 2=32000
  private[multimodal] val sfbLongM1: Array[Array[Int]] = Array(
    cum(Array(4,4,4,4,4,4,6,6,8,8,10,12,16,20,24,28,34,42,50,54,76,158)),
    cum(Array(4,4,4,4,4,4,6,6,6,8,10,12,16,18,22,28,34,40,46,54,54,192)),
    cum(Array(4,4,4,4,4,4,6,6,8,10,12,16,20,24,30,38,46,56,68,84,102,26)))
  private[multimodal] val sfbShortM1: Array[Array[Int]] = Array(
    cum(Array(4,4,4,4,6,8,10,12,14,18,22,30,56)),
    cum(Array(4,4,4,4,6,6,10,12,14,16,20,26,66)),
    cum(Array(4,4,4,4,6,8,12,16,20,26,34,42,12)))
  // MPEG-2 LSF: 0=22050, 1=24000, 2=16000 (16 kHz shares the 22.05 table)
  /** LSF scalefactor bands, rows 0-2 = MPEG-2 22050/24000/16000
    * (ISO 13818-3). Rows 3-5 = MPEG-2.5 11025/12000/8000 — MPEG-2.5 is the
    * Fraunhofer de-facto extension (no ISO text); its band tables are the
    * implementation-consensus assignment: 11025 and 12000 share the 22050
    * table, 8000 has its own (every width doubled up to band 16, then five
    * 2-wide tail bands). All six rows pass the suite's structural check
    * (monotone, sum exactly 576).
    */
  private[multimodal] val sfbLongM2: Array[Array[Int]] = Array(
    cum(Array(6,6,6,6,6,6,8,10,12,14,16,20,24,28,32,38,46,52,60,68,58,54)),
    cum(Array(6,6,6,6,6,6,8,10,12,14,16,18,22,26,32,38,46,54,62,70,76,36)),
    cum(Array(6,6,6,6,6,6,8,10,12,14,16,20,24,28,32,38,46,52,60,68,58,54)),
    cum(Array(6,6,6,6,6,6,8,10,12,14,16,20,24,28,32,38,46,52,60,68,58,54)),
    cum(Array(6,6,6,6,6,6,8,10,12,14,16,20,24,28,32,38,46,52,60,68,58,54)),
    cum(Array(12,12,12,12,12,12,16,20,24,28,32,40,48,56,64,76,90,2,2,2,2,2)))
  private[multimodal] val sfbShortM2: Array[Array[Int]] = Array(
    cum(Array(4,4,4,6,6,8,10,14,18,26,32,42,18)),
    cum(Array(4,4,4,6,8,10,12,14,18,24,32,44,12)),
    cum(Array(4,4,4,6,8,10,12,14,18,24,30,40,18)),
    cum(Array(4,4,4,6,6,8,10,14,18,26,32,42,18)),
    cum(Array(4,4,4,6,6,8,10,14,18,26,32,42,18)),
    cum(Array(8,8,8,12,16,20,24,28,36,2,2,2,26)))

  /** MPEG-1 scalefac_compress -> (slen1, slen2) (Table B.6). */
  private val slenM1: Array[(Int, Int)] = Array(
    (0,0),(0,1),(0,2),(0,3),(3,0),(1,1),(1,2),(1,3),
    (2,1),(2,2),(2,3),(3,1),(3,2),(3,3),(4,2),(4,3))

  /** pretab: the high-band emphasis added when preflag is set. */
  private val pretab: Array[Int] =
    Array(0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,2,2,3,3,3,2,0)

  // alias-reduction butterflies: ci from ISO 11172-3 2.4.3.4.10.1
  private val aliasCi =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  private val aliasCs = aliasCi.map(ci => 1.0 / math.sqrt(1.0 + ci * ci))
  private val aliasCa = aliasCi.zip(aliasCs).map { case (ci, cs) => ci * cs }

  // ------------------------------------------------------------------
  // IMDCT matrices and windows (closed-form; ISO 11172-3 2.4.3.4.12)
  // ------------------------------------------------------------------

  private val imdct36: Array[Array[Double]] = Array.tabulate(36, 18) { (i, k) =>
    math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
  }
  private val imdct12: Array[Array[Double]] = Array.tabulate(12, 6) { (i, k) =>
    math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))
  }
  private val winNormal: Array[Double] =
    Array.tabulate(36)(i => math.sin(math.Pi / 36.0 * (i + 0.5)))
  private val winStart: Array[Double] = Array.tabulate(36) { i =>
    if (i < 18) math.sin(math.Pi / 36.0 * (i + 0.5))
    else if (i < 24) 1.0
    else if (i < 30) math.sin(math.Pi / 12.0 * (i - 18 + 0.5))
    else 0.0
  }
  private val winStop: Array[Double] = Array.tabulate(36) { i =>
    if (i < 6) 0.0
    else if (i < 12) math.sin(math.Pi / 12.0 * (i - 6 + 0.5))
    else if (i < 18) 1.0
    else math.sin(math.Pi / 36.0 * (i + 0.5))
  }
  private val winShort: Array[Double] =
    Array.tabulate(12)(i => math.sin(math.Pi / 12.0 * (i + 0.5)))

  // ------------------------------------------------------------------
  // Synthesis filterbank (ISO 11172-3 Annex A figure A.2 structure).
  // N is the exact ISO matrix; the 512-tap window is the designed NPR
  // prototype documented in the header ([[SynthesisWindow.d]]).
  // ------------------------------------------------------------------

  private val synthN: Array[Array[Double]] = Array.tabulate(64, 32) { (i, k) =>
    // pi/64, NOT the pi/32 some references typo: the folding derivation in
    // SynthesisWindow requires cos((16+i)(2k+1)pi/64); with pi/32 a band-k
    // impulse reconstructs at band 2k (verified numerically at design time)
    math.cos((16 + i) * (2 * k + 1) * math.Pi / 64.0)
  }

  /** Per-stream synthesis state: the V FIFO (1024 doubles) per channel. */
  private final class Synth {
    val v = new Array[Double](1024)
    var off = 960 // write position walks backward by 64 per block, mod 1024
    /** 32 subband samples in, 32 PCM samples out. */
    def block(s: Array[Double], out: Array[Double], outOff: Int): Unit = {
      off = (off + 1024 - 64) % 1024
      var i = 0
      while (i < 64) {
        var acc = 0.0
        val row = synthN(i)
        var k = 0
        while (k < 32) { acc += row(k) * s(k); k += 1 }
        v((off + i) % 1024) = acc
        i += 1
      }
      val d = SynthesisWindow.d
      var j = 0
      while (j < 32) {
        var acc = 0.0
        var b = 0
        while (b < 8) {
          // U vector per ISO: u[b*64+j]   = v[(off + b*128 + j) % 1024]
          //                   u[b*64+32+j]= v[(off + b*128 + 96 + j) % 1024]
          acc += d(b * 64 + j) * v((off + b * 128 + j) % 1024)
          acc += d(b * 64 + 32 + j) * v((off + b * 128 + 96 + j) % 1024)
          b += 1
        }
        out(outOff + j) = acc
        j += 1
      }
    }
  }

  // ------------------------------------------------------------------
  // Bit reader (MSB-first over a byte array)
  // ------------------------------------------------------------------

  private[multimodal] final class BitReader(val bytes: Array[Byte], bitOff: Long) {
    var pos: Long = bitOff
    def u1(): Int = {
      val b = (bytes((pos >> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      b
    }
    def u(n: Int): Int = {
      var out = 0
      var i = 0
      while (i < n) { out = (out << 1) | u1(); i += 1 }
      out
    }
    def bitsLeft: Long = bytes.length.toLong * 8 - pos
  }

  // ------------------------------------------------------------------
  // Frame / side-info model
  // ------------------------------------------------------------------

  private final case class GranuleChannel(
    part23: Int, bigValues: Int, globalGain: Int, scalefacCompress: Int,
    windowSwitching: Boolean, blockType: Int, mixed: Boolean,
    tableSelect: Array[Int], subblockGain: Array[Int],
    region0: Int, region1: Int,
    preflag: Boolean, scalefacScale: Int, count1Table: Int)

  private final case class FrameInfo(
    mpeg1: Boolean,
    srIdx: Int, // sfb-TABLE index: header srIdx, +3 for MPEG-2.5 (rows 3-5)
    sampleRate: Int, channels: Int,
    mode: Int, modeExt: Int, mainDataBegin: Int,
    scfsi: Array[Array[Int]], // [ch][4], MPEG-1 only
    granules: Array[Array[GranuleChannel]], // [gr][ch]
    mainData: Array[Byte],
    preLen: Int) // header + CRC + side-info bytes (frame offset of mainData)

  private def parseSideInfo(br: BitReader, mpeg1: Boolean, channels: Int): Option[(Int, Array[Array[Int]], Array[Array[GranuleChannel]])] = {
    val mainDataBegin = br.u(if (mpeg1) 9 else 8)
    br.u(if (mpeg1) { if (channels == 1) 5 else 3 } else { if (channels == 1) 1 else 2 }) // private bits
    val scfsi = Array.ofDim[Int](channels, 4)
    if (mpeg1) {
      var ch = 0
      while (ch < channels) {
        var b = 0
        while (b < 4) { scfsi(ch)(b) = br.u1(); b += 1 }
        ch += 1
      }
    }
    val nGr = if (mpeg1) 2 else 1
    val grs = Array.ofDim[GranuleChannel](nGr, channels)
    var gr = 0
    while (gr < nGr) {
      var ch = 0
      while (ch < channels) {
        val part23 = br.u(12)
        val bigValues = br.u(9)
        val globalGain = br.u(8)
        val sfc = br.u(if (mpeg1) 4 else 9)
        val wsf = br.u1() == 1
        var blockType = 0
        var mixed = false
        val tables = new Array[Int](3)
        val sbg = new Array[Int](3)
        var region0 = 0
        var region1 = 0
        if (wsf) {
          blockType = br.u(2)
          mixed = br.u1() == 1
          tables(0) = br.u(5); tables(1) = br.u(5)
          sbg(0) = br.u(3); sbg(1) = br.u(3); sbg(2) = br.u(3)
          if (blockType == 0) return None // forbidden with switching flag
          region0 = if (blockType == 2 && !mixed) 8 else 7
          region1 = 20 // "the rest" — region2 never reached
        } else {
          tables(0) = br.u(5); tables(1) = br.u(5); tables(2) = br.u(5)
          region0 = br.u(4)
          region1 = br.u(3)
        }
        val preflag = if (mpeg1) br.u1() == 1 else sfc >= 500
        val sfScale = br.u1()
        val c1t = br.u1()
        if (bigValues > 288) return None
        grs(gr)(ch) = GranuleChannel(part23, bigValues, globalGain, sfc, wsf,
          blockType, mixed, tables, sbg, region0, region1, preflag, sfScale, c1t)
        ch += 1
      }
      gr += 1
    }
    Some((mainDataBegin, scfsi, grs))
  }

  /** Walk the byte stream and collect Layer III frames (header + side info
    * parsed, main data captured). Stops at the first unparsable region
    * after at least one good frame; skips ID3v2.
    */
  private def collectFrames(bytes: Array[Byte]): Seq[FrameInfo] = {
    var off = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      off = 10 + sz
      if (off < 0 || off >= bytes.length) return Nil
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[FrameInfo]
    var i = off
    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xe0) == 0xe0) {
        val h1 = bytes(i + 1) & 0xff; val h2 = bytes(i + 2) & 0xff; val h3 = bytes(i + 3) & 0xff
        val verBits = (h1 >> 3) & 3
        val layerBits = (h1 >> 1) & 3
        val prot = h1 & 1
        val brIdx = (h2 >> 4) & 0xf; val srIdx = (h2 >> 2) & 3; val pad = (h2 >> 1) & 1
        val mode = (h3 >> 6) & 3; val modeExt = (h3 >> 4) & 3
        // MPEG-1 (3), MPEG-2 LSF (2), or MPEG-2.5 (0) Layer III (1) only;
        // verBits == 1 is reserved; no free-format
        if (verBits != 1 && layerBits == 1 && brIdx != 0 && brIdx != 15 && srIdx != 3) {
          val mpeg1 = verBits == 3
          val mpeg25 = verBits == 0
          val rate = (if (mpeg1) Array(44100, 48000, 32000)
                      else if (mpeg25) Array(11025, 12000, 8000)
                      else Array(22050, 24000, 16000))(srIdx)
          val kbps = (if (mpeg1) Array(0,32,40,48,56,64,80,96,112,128,160,192,224,256,320)
                      else Array(0,8,16,24,32,40,48,56,64,80,96,112,128,144,160))(brIdx)
          val frameLen = (if (mpeg1) 144 else 72) * kbps * 1000 / rate + pad
          val channels = if (mode == 3) 1 else 2
          val crcLen = if (prot == 0) 2 else 0
          val sideLen = if (mpeg1) { if (channels == 1) 17 else 32 }
                        else { if (channels == 1) 9 else 17 }
          if (i + frameLen <= bytes.length && frameLen > 4 + crcLen + sideLen) {
            val br = new BitReader(bytes, (i + 4 + crcLen).toLong * 8)
            parseSideInfo(br, mpeg1, channels) match {
              case Some((mdb, scfsi, grs)) =>
                val mdOff = i + 4 + crcLen + sideLen
                val md = java.util.Arrays.copyOfRange(bytes, mdOff, i + frameLen)
                out += FrameInfo(mpeg1, srIdx + (if (mpeg25) 3 else 0), rate,
                  channels, mode, modeExt, mdb, scfsi, grs, md,
                  4 + crcLen + sideLen)
                i += frameLen
              case None =>
                i += 1
            }
          } else if (out.nonEmpty) {
            return out.toSeq // truncated tail frame
          } else i += 1
        } else i += 1
      } else i += 1
    }
    out.toSeq
  }

  // ------------------------------------------------------------------
  // Main-data decode per granule/channel
  // ------------------------------------------------------------------

  private def pow43(v: Int): Double =
    if (v == 0) 0.0 else math.pow(v.toDouble, 4.0 / 3.0)

  /** Scalefactors: MPEG-1 layout (Table B.6 + scfsi sharing).
    * Returns (long[22], short[3][13], bitsRead).
    */
  private def scalefacsM1(br: BitReader, g: GranuleChannel,
      scfsi: Array[Int], prevLong: Array[Int]): (Array[Int], Array[Array[Int]]) = {
    val (slen1, slen2) = slenM1(g.scalefacCompress)
    val long = new Array[Int](22)
    val short = Array.ofDim[Int](3, 13)
    if (g.windowSwitching && g.blockType == 2) {
      if (g.mixed) {
        var b = 0
        while (b < 8) { long(b) = br.u(slen1); b += 1 }
        var sb = 3
        while (sb < 12) {
          val sl = if (sb < 6) slen1 else slen2
          var w = 0
          while (w < 3) { short(w)(sb) = br.u(sl); w += 1 }
          sb += 1
        }
      } else {
        var sb = 0
        while (sb < 12) {
          val sl = if (sb < 6) slen1 else slen2
          var w = 0
          while (w < 3) { short(w)(sb) = br.u(sl); w += 1 }
          sb += 1
        }
      }
    } else {
      // scfsi groups: 0-5, 6-10, 11-15, 16-20 (granule 1 may reuse gr 0)
      val groups = Array((0, 6), (6, 11), (11, 16), (16, 21))
      var gi = 0
      while (gi < 4) {
        val (from, until) = groups(gi)
        var b = from
        while (b < until) {
          if (scfsi(gi) == 1) long(b) = prevLong(b)
          else long(b) = br.u(if (b < 11) slen1 else slen2)
          b += 1
        }
        gi += 1
      }
    }
    (long, short)
  }

  /** Scalefactors: MPEG-2 LSF layout (ISO 13818-3 2.4.3.2), non-intensity
    * channels only (intensity channels reject upstream).
    */
  private def scalefacsM2(br: BitReader, g: GranuleChannel): Option[(Array[Int], Array[Array[Int]])] = {
    val sfc = g.scalefacCompress
    val isShort = g.windowSwitching && g.blockType == 2
    if (isShort && g.mixed) return None // LSF mixed: documented residue
    val (slen, nsfb) =
      if (sfc < 400)
        (Array((sfc >> 4) / 5, (sfc >> 4) % 5, (sfc & 15) >> 2, sfc & 3),
         if (isShort) Array(9, 9, 9, 9) else Array(6, 5, 5, 5))
      else if (sfc < 500)
        (Array(((sfc - 400) >> 2) / 5, ((sfc - 400) >> 2) % 5, (sfc - 400) & 3, 0),
         if (isShort) Array(9, 9, 12, 6) else Array(6, 5, 7, 3))
      else
        (Array((sfc - 500) / 3, (sfc - 500) % 3, 0, 0),
         if (isShort) Array(18, 18, 0, 0) else Array(11, 10, 0, 0))
    val long = new Array[Int](22)
    val short = Array.ofDim[Int](3, 13)
    var slot = 0
    var part = 0
    while (part < 4) {
      var k = 0
      while (k < nsfb(part)) {
        val v = if (slen(part) == 0) 0 else br.u(slen(part))
        if (isShort) { short(slot % 3)(slot / 3) = v }
        else long(slot) = v
        slot += 1
        k += 1
      }
      part += 1
    }
    Some((long, short))
  }

  /** LSF/MPEG-2.5 scalefactors for the INTENSITY channel (right of an
    * intensity pair; ISO 13818-3 2.4.3.2): int_scalefac_compress =
    * scalefac_compress >> 1 selects its OWN slen/partition tables
    * (partition counts sum to 21 long bands, structurally checked in
    * Mp3Suite), and the decoded values double as is_pos in the intensity
    * region. Returns (values[22], slenPerBand[22]) — the per-band slen
    * bounds the ILLEGAL is_pos, (1 << slen) - 1 (a band whose slen is 0
    * can transmit no position, so it never pans). Long blocks only:
    * short/mixed intensity layouts are documented residue (reject, never
    * wrong samples).
    */
  private def scalefacsM2Intensity(br: BitReader,
      g: GranuleChannel): Option[(Array[Int], Array[Int])] = {
    if (g.windowSwitching && (g.blockType == 2 || g.mixed)) return None
    val isfc = g.scalefacCompress >> 1
    val (slen, nsfb) =
      if (isfc < 180)
        (Array(isfc / 36, (isfc % 36) / 6, isfc % 6, 0), Array(7, 7, 7, 0))
      else if (isfc < 244)
        (Array(((isfc - 180) >> 4) & 3, ((isfc - 180) >> 2) & 3, (isfc - 180) & 3, 0),
         Array(6, 6, 6, 3))
      else // isfc is sfc >> 1 with sfc 9 bits, so 244..255 — all legal
        (Array((isfc - 244) / 3, (isfc - 244) % 3, 0, 0), Array(8, 8, 5, 0))
    val long = new Array[Int](22)
    val slens = new Array[Int](22)
    var slot = 0
    var part = 0
    while (part < 4) {
      var k = 0
      while (k < nsfb(part)) {
        long(slot) = if (slen(part) == 0) 0 else br.u(slen(part))
        slens(slot) = slen(part)
        slot += 1
        k += 1
      }
      part += 1
    }
    Some((long, slens))
  }

  /** Huffman-decode the spectral lines for one granule/channel into is[576].
    * Returns false when the frame must reject (unsupported table, bad code,
    * or a landing failure on part2_3_length).
    */
  /** `huffBits` is part2_3_length minus the scalefactor (part2) bits the
    * caller already consumed — the Huffman region's exact bit budget.
    */
  private def huffmanDecode(br: BitReader, g: GranuleChannel, mpeg1: Boolean,
      srIdx: Int, huffBits: Int, is: Array[Int],
      bigDec: Map[Int, HuffDecoder] = bigDecoders,
      linbitsOf: Int => Int = _ => 0): Boolean = {
    if (huffBits < 0) return false
    java.util.Arrays.fill(is, 0)
    val part2Start = br.pos
    val sfbLong = (if (mpeg1) sfbLongM1 else sfbLongM2)(srIdx)
    val sfbShort = (if (mpeg1) sfbShortM1 else sfbShortM2)(srIdx)
    // region boundaries: with window switching region0_count is implied
    // (7, or 8 short non-mixed) and region1 covers the rest
    val bigLines = g.bigValues * 2
    val (r1Start, r2Start) =
      if (g.windowSwitching)
        (if (g.blockType == 2 && !g.mixed) sfbShort(3) * 3 else sfbLong(8), 576)
      else {
        val a = sfbLong(math.min(g.region0 + 1, 22))
        val b = sfbLong(math.min(g.region0 + g.region1 + 2, 22))
        (a, b)
      }
    var line = 0
    while (line < bigLines && line < 576) {
      val region = if (line < r1Start) 0 else if (line < r2Start) 1 else 2
      val tSel = g.tableSelect(region)
      if (tSel == 0) {
        is(line) = 0; is(line + 1) = 0
        line += 2
      } else {
        val dec = bigDec.getOrElse(tSel, null)
        if (dec == null) return false // unvalidated table: documented residue
        val packed = dec.next(br)
        if (packed < 0) return false
        var x = packed >> 4
        var y = packed & 15
        // shipped tables have no linbits (ESC families not in the set);
        // candidate ESC transcriptions under validation supply theirs via
        // linbitsOf (ISO read order: x linbits, x sign, y linbits, y sign)
        val lb = linbitsOf(tSel)
        if (lb > 0 && x == 15) x += br.u(lb)
        if (x != 0 && br.u1() == 1) x = -x
        if (lb > 0 && y == 15) y += br.u(lb)
        if (y != 0 && br.u1() == 1) y = -y
        is(line) = x; is(line + 1) = y
        line += 2
      }
      if (br.pos - part2Start > huffBits) return false
    }
    // count1 region: quadruples until the bit budget is consumed
    var lastQuadStart = -1L
    var lastQuadLine = -1
    while (br.pos - part2Start < huffBits && line + 3 < 576) {
      lastQuadStart = br.pos; lastQuadLine = line
      var quad = 0
      if (g.count1Table == 1) quad = 15 - br.u(4)
      else {
        quad = count1ADecoder.next(br)
        if (quad < 0) return false
      }
      var k = 0
      while (k < 4) {
        val bit = (quad >> (3 - k)) & 1
        var v = bit
        if (bit == 1 && br.u1() == 1) v = -1
        is(line) = v
        line += 1
        k += 1
      }
    }
    // spec tolerance: the final quadruple may overshoot the budget — undo it
    if (br.pos - part2Start > huffBits && lastQuadStart >= 0) {
      var l = lastQuadLine
      while (l < lastQuadLine + 4 && l < 576) { is(l) = 0; l += 1 }
      br.pos = lastQuadStart
    }
    // bit-exact landing (validation leg #2 in the header)
    if (br.pos - part2Start != huffBits) {
      if (br.pos - part2Start < huffBits) {
        // trailing stuffing bits are legal; skip to the boundary
        br.pos = part2Start + huffBits
        true
      } else false
    } else true
  }

  /** Requantize is[576] -> xr[576] (ISO 2.4.3.4.7). */
  private def requantize(g: GranuleChannel, is: Array[Int],
      sfLong: Array[Int], sfShort: Array[Array[Int]],
      mpeg1: Boolean, srIdx: Int, xr: Array[Double]): Unit = {
    val sfbLong = (if (mpeg1) sfbLongM1 else sfbLongM2)(srIdx)
    val sfbShort = (if (mpeg1) sfbShortM1 else sfbShortM2)(srIdx)
    val gain = math.pow(2.0, 0.25 * (g.globalGain - 210))
    val sfMult = if (g.scalefacScale == 0) 0.5 else 1.0
    val isShort = g.windowSwitching && g.blockType == 2
    if (!isShort || g.mixed) {
      // long region: whole spectrum, or bands 0..7 when mixed
      val lastLine = if (!isShort) 576 else 36 // mixed: first two subbands long
      var band = 0
      while (band < 22 && sfbLong(band) < lastLine) {
        val pre = if (g.preflag) pretab(band) else 0
        val mult = gain * math.pow(2.0, -sfMult * (sfLong(band) + pre))
        var l = sfbLong(band)
        val end = math.min(sfbLong(band + 1), lastLine)
        while (l < end) {
          xr(l) = math.signum(is(l).toDouble) * pow43(math.abs(is(l))) * mult
          l += 1
        }
        band += 1
      }
    }
    if (isShort) {
      val firstBand = if (g.mixed) 3 else 0
      var band = firstBand
      while (band < 13 && sfbShort(band) < 192) {
        val w = sfbShort(band + 1) - sfbShort(band)
        var win = 0
        while (win < 3) {
          val mult = gain *
            math.pow(2.0, -2.0 * g.subblockGain(win)) *
            math.pow(2.0, -sfMult * sfShort(win)(band))
          var i = 0
          while (i < w) {
            val src = sfbShort(band) * 3 + win * w + i
            if (src < 576) {
              val v = is(src)
              xr(src) = math.signum(v.toDouble) * pow43(math.abs(v)) * mult
            }
            i += 1
          }
          win += 1
        }
        band += 1
      }
    }
  }

  /** Reorder short-block lines from (band, window, line) bitstream order to
    * (subband, window, line) IMDCT order — the PDMP3/mpg123 mapping.
    */
  private def reorderShort(g: GranuleChannel, mpeg1: Boolean, srIdx: Int,
      xr: Array[Double]): Unit = {
    if (!(g.windowSwitching && g.blockType == 2)) return
    val sfbShort = (if (mpeg1) sfbShortM1 else sfbShortM2)(srIdx)
    val tmp = new Array[Double](576)
    System.arraycopy(xr, 0, tmp, 0, 576)
    val firstBand = if (g.mixed) 3 else 0
    val startLine = if (g.mixed) 36 else 0
    var band = firstBand
    while (band < 13) {
      val s = sfbShort(band)
      val w = sfbShort(band + 1) - s
      var win = 0
      while (win < 3) {
        var i = 0
        while (i < w) {
          val src = s * 3 + win * w + i
          val line = s + i
          val dst = (line / 6) * 18 + win * 6 + (line % 6)
          if (src < 576 && dst < 576 && src >= startLine) xr(dst) = tmp(src)
          i += 1
        }
        win += 1
      }
      band += 1
    }
  }

  /** Alias-reduction butterflies across subband boundaries (long regions). */
  private def aliasReduce(g: GranuleChannel, xr: Array[Double]): Unit = {
    val isShort = g.windowSwitching && g.blockType == 2
    val sbLimit = if (isShort && !g.mixed) 0 else if (isShort) 1 else 31
    var sb = 0
    while (sb < sbLimit) {
      val base = sb * 18 + 17
      var i = 0
      while (i < 8) {
        val lo = base - i
        val hi = base + 1 + i
        val a = xr(lo); val b = xr(hi)
        xr(lo) = a * aliasCs(i) - b * aliasCa(i)
        xr(hi) = b * aliasCs(i) + a * aliasCa(i)
        i += 1
      }
      sb += 1
    }
  }

  /** IMDCT + windowing + overlap-add for one granule/channel.
    * `overlap` carries the previous granule's tail per subband (32×18).
    */
  private def imdctGranule(g: GranuleChannel, xr: Array[Double],
      overlap: Array[Array[Double]], out: Array[Double]): Unit = {
    val isShort = g.windowSwitching && g.blockType == 2
    var sb = 0
    while (sb < 32) {
      val useShort = isShort && (!g.mixed || sb >= 2)
      val res = new Array[Double](36)
      if (useShort) {
        var win = 0
        while (win < 3) {
          var i = 0
          while (i < 12) {
            var acc = 0.0
            var k = 0
            while (k < 6) { acc += xr(sb * 18 + win * 6 + k) * imdct12(i)(k); k += 1 }
            res(6 + win * 6 + i) += acc * winShort(i)
            i += 1
          }
          win += 1
        }
      } else {
        val w = if (!g.windowSwitching || g.blockType == 0) winNormal
          else if (g.blockType == 1) winStart
          else winStop
        var i = 0
        while (i < 36) {
          var acc = 0.0
          var k = 0
          while (k < 18) { acc += xr(sb * 18 + k) * imdct36(i)(k); k += 1 }
          res(i) = acc * w(i)
          i += 1
        }
      }
      // overlap-add: first half + previous tail; stash second half
      var i = 0
      while (i < 18) {
        out(sb * 18 + i) = res(i) + overlap(sb)(i)
        overlap(sb)(i) = res(18 + i)
        i += 1
      }
      // frequency inversion for odd subbands (every odd time sample)
      if ((sb & 1) == 1) {
        var t = 1
        while (t < 18) { out(sb * 18 + t) = -out(sb * 18 + t); t += 2 }
      }
      sb += 1
    }
  }

  // ------------------------------------------------------------------
  // Stereo
  // ------------------------------------------------------------------

  private val invSqrt2 = 1.0 / math.sqrt(2.0)

  private def applyMs(left: Array[Double], right: Array[Double]): Unit = {
    var i = 0
    while (i < 576) {
      val m = left(i); val s = right(i)
      left(i) = (m + s) * invSqrt2
      right(i) = (m - s) * invSqrt2
      i += 1
    }
  }

  /** MPEG-1 intensity stereo (ISO 2.4.3.4.9.3): bands at/above the right
    * channel's rzero (rounded up to an sfb boundary) pan from the left
    * channel by is_pos; bands BELOW that boundary decode as MS when
    * mode_ext = 3 (MS+intensity) or plain LR when mode_ext = 1. Returns
    * false for intensity+short frames — the per-window band structure is
    * documented residue, and the contract is reject, never wrong samples.
    */
  private def applyIntensityM1(g1: GranuleChannel, sfRight: Array[Int],
      sfShortRight: Array[Array[Int]], srIdx: Int, msAlso: Boolean,
      left: Array[Double], right: Array[Double]): Boolean = {
    val sfbLong = sfbLongM1(srIdx)
    // rzero boundary of the right channel
    var rzero = 576
    while (rzero > 0 && right(rzero - 1) == 0.0) rzero -= 1
    val isShort = g1.windowSwitching && g1.blockType == 2
    if (isShort) return false // intensity+short: documented residue
    if (msAlso) {
      // MS applies below the intensity region's first band (mode_ext = 3)
      var bound = 576
      var b = 0
      while (b < 22) {
        if (sfbLong(b) >= rzero) { bound = sfbLong(b); b = 22 } else b += 1
      }
      var i = 0
      while (i < bound) {
        val m = left(i); val s = right(i)
        left(i) = (m + s) * invSqrt2
        right(i) = (m - s) * invSqrt2
        i += 1
      }
    }
    var band = 0
    while (band < 22) {
      val start = sfbLong(band); val end = sfbLong(band + 1)
      if (start >= rzero) {
        val isPos = sfRight(math.min(band, 20))
        if (isPos != 7) {
          val ratio = math.tan(isPos * math.Pi / 12.0)
          var l = start
          while (l < end && l < 576) {
            val v = left(l)
            left(l) = v * (ratio / (1.0 + ratio))
            right(l) = v * (1.0 / (1.0 + ratio))
            l += 1
          }
        } else if (msAlso) {
          var l = start
          while (l < end && l < 576) {
            val m = left(l); val s = right(l)
            left(l) = (m + s) * invSqrt2; right(l) = (m - s) * invSqrt2
            l += 1
          }
        }
      }
      band += 1
    }
    true
  }

  private val invRoot4 = math.pow(2.0, -0.25)

  /** LSF/MPEG-2.5 intensity stereo (ISO 13818-3 2.4.3.2): bands at/above
    * the right channel's rzero pan by is_pos with
    * k = io^((is_pos+1)/2) — io = 2^(-1/2) when intensity_scale
    * (scalefac_compress bit 0) is set, 2^(-1/4) otherwise; odd is_pos
    * scales LEFT, even scales RIGHT, is_pos 0 copies to both. A band whose
    * is_pos equals its field's maximum ((1 << slen) - 1, incl. slen 0)
    * does not pan: MS when mode_ext = 3, untouched otherwise. Bands below
    * the boundary decode as MS/LR exactly as in [[applyIntensityM1]].
    * Short-block intensity is documented residue → false (reject).
    */
  private def applyIntensityLsf(g1: GranuleChannel, isPos: Array[Int],
      slens: Array[Int], srIdx: Int, msAlso: Boolean,
      left: Array[Double], right: Array[Double]): Boolean = {
    val sfbLong = sfbLongM2(srIdx)
    var rzero = 576
    while (rzero > 0 && right(rzero - 1) == 0.0) rzero -= 1
    if (g1.windowSwitching && g1.blockType == 2) return false
    val io = if ((g1.scalefacCompress & 1) == 1) invSqrt2 else invRoot4
    if (msAlso) {
      var bound = 576
      var b = 0
      while (b < 22) {
        if (sfbLong(b) >= rzero) { bound = sfbLong(b); b = 22 } else b += 1
      }
      var i = 0
      while (i < bound) {
        val m = left(i); val s = right(i)
        left(i) = (m + s) * invSqrt2
        right(i) = (m - s) * invSqrt2
        i += 1
      }
    }
    var band = 0
    while (band < 22) {
      val start = sfbLong(band); val end = sfbLong(band + 1)
      if (start >= rzero) {
        // 21 is_pos values are transmitted (slots 0..20); the top band
        // extends the last one, as in the M1 path
        val idx = math.min(band, 20)
        val sl = slens(idx); val pos = isPos(idx)
        if (sl == 0 || pos == (1 << sl) - 1) {
          if (msAlso) {
            var l = start
            while (l < end && l < 576) {
              val m = left(l); val s = right(l)
              left(l) = (m + s) * invSqrt2; right(l) = (m - s) * invSqrt2
              l += 1
            }
          }
        } else {
          val (kl, kr) =
            if ((pos & 1) == 1) (math.pow(io, (pos + 1) / 2), 1.0)
            else (1.0, math.pow(io, pos / 2))
          var l = start
          while (l < end && l < 576) {
            val v = left(l)
            left(l) = v * kl
            right(l) = v * kr
            l += 1
          }
        }
      }
      band += 1
    }
    true
  }

  // ------------------------------------------------------------------
  // Decode driver
  // ------------------------------------------------------------------

  /** Decode up to `maxSamples` interleaved samples. None when `bytes` is
    * not a decodable stream (or every frame hits documented residue).
    */
  def decode(bytes: Array[Byte], maxSamples: Int = 1 << 24): Option[Pcm] =
    decodeWith(bytes, maxSamples, Map.empty)

  /** [[decode]] with candidate Huffman-table transcriptions spliced over
    * (or added to) the validated set — the [[Mp3TableValidator]] hook, NOT
    * a public decode surface: a candidate table is only trusted after the
    * validator accepts it against a conformance stream. `overrides` maps
    * tableId -> (entries as in [[bigValueTables]], linbits) — linbits > 0
    * enables the ESC escape read (x/y == 15 extends by linbits bits) the
    * shipped tables never use.
    */
  private[multimodal] def decodeWith(bytes: Array[Byte], maxSamples: Int,
      overrides: Map[Int, (Map[Int, (Int, Int)], Int)]): Option[Pcm] = {
    val bigDec =
      if (overrides.isEmpty) bigDecoders
      else bigDecoders ++ overrides.map { case (id, (e, _)) => id -> new HuffDecoder(e) }
    val linbitsOf: Int => Int = id => overrides.get(id).map(_._2).getOrElse(0)
    try {
      val frames0 = collectFrames(bytes)
      // drop a leading Xing/Info/VBRI tag frame (LAME/Fraunhofer metadata,
      // not audio — its side info is all-zero so it would decode as one
      // spurious granule of silence)
      val frames = frames0 match {
        case head +: rest =>
          // exact spec offsets only — a real audio frame whose compressed
          // bytes happen to contain these ASCII sequences must NOT drop:
          // Xing/Info sits at main-data offset 0, VBRI at FRAME offset 36
          // (i.e. main-data offset 36 - header/CRC/side-info length)
          val md = head.mainData
          def tagAt(off: Int, s: String): Boolean =
            off >= 0 && off + s.length <= md.length &&
              (0 until s.length).forall(k => (md(off + k) & 0xff) == s.charAt(k).toInt)
          if (tagAt(0, "Xing") || tagAt(0, "Info") ||
              tagAt(36 - head.preLen, "VBRI")) rest
          else frames0
        case _ => frames0
      }
      if (frames.isEmpty) return None
      val f0 = frames.head
      val channels = f0.channels
      val sink = new scala.collection.mutable.ArrayBuilder.ofInt
      // bit reservoir: main data accumulates; frames address it backwards
      var reservoir = new Array[Byte](0)
      val overlap = Array.fill(channels)(Array.ofDim[Double](32, 18))
      val synth = Array.fill(channels)(new Synth)
      val prevSfLong = Array.fill(channels)(new Array[Int](22))
      val isSlenR = new Array[Int](22) // LSF intensity: ch1 per-band slen
      val is = new Array[Int](576)
      val xrCh = Array.ofDim[Double](channels, 576)
      val grOut = new Array[Double](576)
      val pcmBlock = new Array[Double](32)
      var produced = 0L
      var decodedAny = false
      for (f <- frames if produced < maxSamples &&
           f.channels == channels && f.sampleRate == f0.sampleRate) {
        val resBefore = reservoir.length
        reservoir = {
          val merged = new Array[Byte](resBefore + f.mainData.length)
          System.arraycopy(reservoir, 0, merged, 0, resBefore)
          System.arraycopy(f.mainData, 0, merged, resBefore, f.mainData.length)
          merged
        }
        val start = resBefore - f.mainDataBegin
        if (start >= 0) try {
          val br = new BitReader(reservoir, start.toLong * 8)
          val nGr = f.granules.length
          var frameOk = true
          val frameSamples = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
          var gr = 0
          while (gr < nGr && frameOk) {
            // per-channel spectra for this granule
            var ch = 0
            while (ch < channels && frameOk) {
              val lsfIntensityCh = !f.mpeg1 &&
                f.mode == 1 && (f.modeExt & 1) == 1 && ch == 1
              // LSF derives preflag from sfc >= 500, but on the intensity
              // channel sfc is reinterpreted as isfc = sfc >> 1 — preflag
              // does not exist there (libmad sets it only in the
              // non-intensity LSF branch). Without this, an intensity
              // channel with sfc in 500..511 would add pretab emphasis to
              // is_pos values during requantization: wrong samples.
              val g = {
                val g0 = f.granules(gr)(ch)
                if (lsfIntensityCh && g0.preflag) g0.copy(preflag = false) else g0
              }
              locally {
                val grStart = br.pos
                val sfs =
                  if (f.mpeg1)
                    Some(scalefacsM1(br, g,
                      if (gr == 1) f.scfsi(ch) else Array(0, 0, 0, 0),
                      prevSfLong(ch)))
                  else if (lsfIntensityCh)
                    // LSF intensity channel: its own scalefactor layout,
                    // values double as is_pos (slens stashed for the
                    // illegal-position check in the stereo stage)
                    scalefacsM2Intensity(br, g).map { case (long, slens) =>
                      System.arraycopy(slens, 0, isSlenR, 0, 22)
                      (long, Array.ofDim[Int](3, 13))
                    }
                  else scalefacsM2(br, g)
                sfs match {
                  case None => frameOk = false
                  case Some((sfLong, sfShort)) =>
                    System.arraycopy(sfLong, 0, prevSfLong(ch), 0, 22)
                    val huffBits = g.part23 - (br.pos - grStart).toInt
                    if (!huffmanDecode(br, g, f.mpeg1, f.srIdx, huffBits, is,
                        bigDec, linbitsOf))
                      frameOk = false
                    else {
                      java.util.Arrays.fill(xrCh(ch), 0.0)
                      requantize(g, is, sfLong, sfShort, f.mpeg1, f.srIdx, xrCh(ch))
                      reorderShort(g, f.mpeg1, f.srIdx, xrCh(ch))
                      // stash for stereo stage below via xrCh
                      if (ch == channels - 1) {
                        // stereo processing on the completed granule
                        if (channels == 2) {
                          val ms = (f.mode == 1) && (f.modeExt & 2) == 2
                          val intens = (f.mode == 1) && (f.modeExt & 1) == 1
                          if (intens && f.mpeg1) {
                            if (!applyIntensityM1(f.granules(gr)(1), sfLong, sfShort,
                                f.srIdx, ms, xrCh(0), xrCh(1)))
                              frameOk = false // intensity+short: reject frame
                          } else if (intens) {
                            // sfLong here is the ch1 read above = is_pos
                            if (!applyIntensityLsf(f.granules(gr)(1), sfLong,
                                isSlenR, f.srIdx, ms, xrCh(0), xrCh(1)))
                              frameOk = false // intensity+short: reject frame
                          } else if (ms) applyMs(xrCh(0), xrCh(1))
                        }
                        if (frameOk) {
                          var c = 0
                          while (c < channels) {
                            val gc = f.granules(gr)(c)
                            aliasReduce(gc, xrCh(c))
                            imdctGranule(gc, xrCh(c), overlap(c), grOut)
                            frameSamples += grOut.clone()
                            c += 1
                          }
                        }
                      }
                    }
                }
              }
              ch += 1
            }
            gr += 1
          }
          if (frameOk) {
            decodedAny = true
            // synthesis: frameSamples holds nGr × channels granule outputs
            // in (granule, channel) order, each 576 = 18 blocks × 32 bands
            var gi = 0
            while (gi < nGr) {
              val chOut = Array.ofDim[Double](channels, 576)
              var c = 0
              while (c < channels) {
                val gdata = frameSamples(gi * channels + c)
                var t = 0
                while (t < 18) {
                  var sb = 0
                  while (sb < 32) { pcmBlock(sb) = gdata(sb * 18 + t); sb += 1 }
                  synth(c).block(pcmBlock, chOut(c), t * 32)
                  t += 1
                }
                c += 1
              }
              // interleave + clip
              var sIdx = 0
              while (sIdx < 576 && produced < maxSamples) {
                var c = 0
                while (c < channels) {
                  val v = math.rint(chOut(c)(sIdx) * 32768.0)
                  sink += math.max(-32768, math.min(32767, v.toInt))
                  c += 1
                }
                produced += 1
                sIdx += 1
              }
              gi += 1
            }
          } else {
            // reset overlap state on a rejected frame to avoid smearing
            // stale history into the next good frame
            overlap.foreach(_.foreach(java.util.Arrays.fill(_, 0.0)))
          }
        } catch { case _: ArrayIndexOutOfBoundsException =>
          // truncated reservoir read on a corrupt frame: skip it
          overlap.foreach(_.foreach(java.util.Arrays.fill(_, 0.0)))
        }
        // bound the reservoir: frames address at most 511 bytes back
        if (reservoir.length > 4096)
          reservoir = java.util.Arrays.copyOfRange(
            reservoir, reservoir.length - 1024, reservoir.length)
      }
      if (!decodedAny) None
      else Some(Pcm(f0.sampleRate, channels, sink.result()))
    } catch { case _: Exception => None }
  }

  /** How often each big-value table id is SELECTED by a stream's side info
    * (granule × channel × region triples with a nonzero big-value span) —
    * the validator's evidence check: a candidate table a conformance stream
    * never selects is not validated by that stream decoding cleanly.
    */
  private[multimodal] def tableSelections(bytes: Array[Byte]): Map[Int, Int] = {
    val counts = scala.collection.mutable.Map.empty[Int, Int]
    try {
      collectFrames(bytes).foreach { f =>
        f.granules.foreach(_.foreach { g =>
          if (g != null && g.bigValues > 0) {
            val regions = if (g.windowSwitching) 2 else 3
            var r = 0
            while (r < regions) {
              if (g.tableSelect(r) != 0)
                counts(g.tableSelect(r)) = counts.getOrElse(g.tableSelect(r), 0) + 1
              r += 1
            }
          }
        })
      }
    } catch { case _: Exception => }
    counts.toMap
  }
}
