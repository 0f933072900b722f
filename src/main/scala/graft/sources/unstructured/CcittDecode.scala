package graft.sources.unstructured

/** Pure-JVM CCITT Group 3 / Group 4 fax decoder (ITU-T T.4 / T.6) for
  * `/CCITTFaxDecode` PDF image streams — the compression virtually every
  * scanned-fax PDF uses. The reference delegates this ground to PDFBox
  * (reference `datasources/v2/pdf/PdfReaderFactory.scala:52-67`); offline we
  * implement the codec directly so scanned pages surface as real rasters in
  * the pdf `.content` `images` column instead of dict-only metadata.
  *
  * Supported (the PDF parameter space, ISO 32000-1 7.4.6):
  *  - `K < 0`: pure 2D (Group 4 / MMR) — what PDF producers emit almost
  *    exclusively;
  *  - `K = 0`: 1D (Group 3 MH), EOLs optional as PDF allows;
  *  - `K > 0`: mixed 1D/2D (Group 3 2D), tag bit after each EOL (or at
  *    line start when the stream carries no EOLs);
  *  - `EncodedByteAlign` (each coded line starts on a byte boundary),
  *    `Columns` (default 1728), `Rows` (0/absent → decode until EOFB or
  *    data end), multi-makeup runs > 2560, extended makeups 1792–2560.
  *
  * Not supported (fail to `None`, never throw): the T.6 uncompressed-mode
  * extension (`0000001...`, requires `/UncompressedMode true` which PDF
  * writers do not use) and damaged streams whose coding walks out of bounds.
  *
  * Output is the SEMANTIC raster — one byte per pixel, 0x00 = black mark,
  * 0xFF = white background — independent of `/BlackIs1`, which only selects
  * the packed-bit polarity PDF renderers feed through `/Decode` (producers
  * pair the two so appearance is preserved; the semantic raster is the
  * invariant both spellings encode). Perceptual-dedup features hash this
  * raster, so polarity games in the container cannot split twin pages.
  *
  * The run-length Huffman tables below are Tables 2–4 of ITU-T T.4 (shared
  * verbatim by T.6); `CcittSuite` asserts each color's code set is
  * prefix-free and roundtrips the codec against an independently-written
  * test encoder over randomized bitmaps.
  */
private[graft] object CcittDecode {

  /** PDF CCITTFaxDecode parameters (defaults per ISO 32000-1 Table 11). */
  final case class Params(columns: Int = 1728, rows: Int = 0, k: Int = 0,
      byteAlign: Boolean = false)

  /** run -> (bitLength, code). Terminating codes 0..63, white. */
  private[unstructured] val WhiteTerm: Map[Int, (Int, Int)] = Map(
    0 -> (8, 0x35), 1 -> (6, 0x07), 2 -> (4, 0x07), 3 -> (4, 0x08),
    4 -> (4, 0x0B), 5 -> (4, 0x0C), 6 -> (4, 0x0E), 7 -> (4, 0x0F),
    8 -> (5, 0x13), 9 -> (5, 0x14), 10 -> (5, 0x07), 11 -> (5, 0x08),
    12 -> (6, 0x08), 13 -> (6, 0x03), 14 -> (6, 0x34), 15 -> (6, 0x35),
    16 -> (6, 0x2A), 17 -> (6, 0x2B), 18 -> (7, 0x27), 19 -> (7, 0x0C),
    20 -> (7, 0x08), 21 -> (7, 0x17), 22 -> (7, 0x03), 23 -> (7, 0x04),
    24 -> (7, 0x28), 25 -> (7, 0x2B), 26 -> (7, 0x13), 27 -> (7, 0x24),
    28 -> (7, 0x18), 29 -> (8, 0x02), 30 -> (8, 0x03), 31 -> (8, 0x1A),
    32 -> (8, 0x1B), 33 -> (8, 0x12), 34 -> (8, 0x13), 35 -> (8, 0x14),
    36 -> (8, 0x15), 37 -> (8, 0x16), 38 -> (8, 0x17), 39 -> (8, 0x28),
    40 -> (8, 0x29), 41 -> (8, 0x2A), 42 -> (8, 0x2B), 43 -> (8, 0x2C),
    44 -> (8, 0x2D), 45 -> (8, 0x04), 46 -> (8, 0x05), 47 -> (8, 0x0A),
    48 -> (8, 0x0B), 49 -> (8, 0x52), 50 -> (8, 0x53), 51 -> (8, 0x54),
    52 -> (8, 0x55), 53 -> (8, 0x24), 54 -> (8, 0x25), 55 -> (8, 0x58),
    56 -> (8, 0x59), 57 -> (8, 0x5A), 58 -> (8, 0x5B), 59 -> (8, 0x4A),
    60 -> (8, 0x4B), 61 -> (8, 0x32), 62 -> (8, 0x33), 63 -> (8, 0x34))

  /** Makeup codes 64..1728, white. */
  private[unstructured] val WhiteMakeup: Map[Int, (Int, Int)] = Map(
    64 -> (5, 0x1B), 128 -> (5, 0x12), 192 -> (6, 0x17), 256 -> (7, 0x37),
    320 -> (8, 0x36), 384 -> (8, 0x37), 448 -> (8, 0x64), 512 -> (8, 0x65),
    576 -> (8, 0x68), 640 -> (8, 0x67), 704 -> (9, 0xCC), 768 -> (9, 0xCD),
    832 -> (9, 0xD2), 896 -> (9, 0xD3), 960 -> (9, 0xD4), 1024 -> (9, 0xD5),
    1088 -> (9, 0xD6), 1152 -> (9, 0xD7), 1216 -> (9, 0xD8),
    1280 -> (9, 0xD9), 1344 -> (9, 0xDA), 1408 -> (9, 0xDB),
    1472 -> (9, 0x98), 1536 -> (9, 0x99), 1600 -> (9, 0x9A),
    1664 -> (6, 0x18), 1728 -> (9, 0x9B))

  /** Terminating codes 0..63, black. */
  private[unstructured] val BlackTerm: Map[Int, (Int, Int)] = Map(
    0 -> (10, 0x37), 1 -> (3, 0x02), 2 -> (2, 0x03), 3 -> (2, 0x02),
    4 -> (3, 0x03), 5 -> (4, 0x03), 6 -> (4, 0x02), 7 -> (5, 0x03),
    8 -> (6, 0x05), 9 -> (6, 0x04), 10 -> (7, 0x04), 11 -> (7, 0x05),
    12 -> (7, 0x07), 13 -> (8, 0x04), 14 -> (8, 0x07), 15 -> (9, 0x18),
    16 -> (10, 0x17), 17 -> (10, 0x18), 18 -> (10, 0x08), 19 -> (11, 0x67),
    20 -> (11, 0x68), 21 -> (11, 0x6C), 22 -> (11, 0x37), 23 -> (11, 0x28),
    24 -> (11, 0x17), 25 -> (11, 0x18), 26 -> (12, 0xCA), 27 -> (12, 0xCB),
    28 -> (12, 0xCC), 29 -> (12, 0xCD), 30 -> (12, 0x68), 31 -> (12, 0x69),
    32 -> (12, 0x6A), 33 -> (12, 0x6B), 34 -> (12, 0xD2), 35 -> (12, 0xD3),
    36 -> (12, 0xD4), 37 -> (12, 0xD5), 38 -> (12, 0xD6), 39 -> (12, 0xD7),
    40 -> (12, 0x6C), 41 -> (12, 0x6D), 42 -> (12, 0xDA), 43 -> (12, 0xDB),
    44 -> (12, 0x54), 45 -> (12, 0x55), 46 -> (12, 0x56), 47 -> (12, 0x57),
    48 -> (12, 0x64), 49 -> (12, 0x65), 50 -> (12, 0x52), 51 -> (12, 0x53),
    52 -> (12, 0x24), 53 -> (12, 0x37), 54 -> (12, 0x38), 55 -> (12, 0x27),
    56 -> (12, 0x28), 57 -> (12, 0x58), 58 -> (12, 0x59), 59 -> (12, 0x2B),
    60 -> (12, 0x2C), 61 -> (12, 0x5A), 62 -> (12, 0x66), 63 -> (12, 0x67))

  /** Makeup codes 64..1728, black. */
  private[unstructured] val BlackMakeup: Map[Int, (Int, Int)] = Map(
    64 -> (10, 0x0F), 128 -> (12, 0xC8), 192 -> (12, 0xC9),
    256 -> (12, 0x5B), 320 -> (12, 0x33), 384 -> (12, 0x34),
    448 -> (12, 0x35), 512 -> (13, 0x6C), 576 -> (13, 0x6D),
    640 -> (13, 0x4A), 704 -> (13, 0x4B), 768 -> (13, 0x4C),
    832 -> (13, 0x4D), 896 -> (13, 0x72), 960 -> (13, 0x73),
    1024 -> (13, 0x74), 1088 -> (13, 0x75), 1152 -> (13, 0x76),
    1216 -> (13, 0x77), 1280 -> (13, 0x52), 1344 -> (13, 0x53),
    1408 -> (13, 0x54), 1472 -> (13, 0x55), 1536 -> (13, 0x5A),
    1600 -> (13, 0x5B), 1664 -> (13, 0x64), 1728 -> (13, 0x65))

  /** Extended makeups 1792..2560 — shared by both colors (T.4 Table 4). */
  private[unstructured] val ExtMakeup: Map[Int, (Int, Int)] = Map(
    1792 -> (11, 0x08), 1856 -> (11, 0x0C), 1920 -> (11, 0x0D),
    1984 -> (12, 0x12), 2048 -> (12, 0x13), 2112 -> (12, 0x14),
    2176 -> (12, 0x15), 2240 -> (12, 0x16), 2304 -> (12, 0x17),
    2368 -> (12, 0x1C), 2432 -> (12, 0x1D), 2496 -> (12, 0x1E),
    2560 -> (12, 0x1F))

  private def reverse(m: Map[Int, (Int, Int)]): Map[(Int, Int), Int] =
    m.map { case (run, lc) => lc -> run }

  private val WhiteLookup = reverse(WhiteTerm) ++ reverse(WhiteMakeup) ++ reverse(ExtMakeup)
  private val BlackLookup = reverse(BlackTerm) ++ reverse(BlackMakeup) ++ reverse(ExtMakeup)
  private val WhiteLens = WhiteLookup.keys.map(_._1).toList.distinct.sorted
  private val BlackLens = BlackLookup.keys.map(_._1).toList.distinct.sorted

  /** MSB-first bit reader. `peek` returns -1 when fewer than n bits remain
    * (callers treat that as end of data).
    */
  private final class BitReader(data: Array[Byte]) {
    var pos = 0 // bit position
    val nbits: Int = data.length * 8
    def remaining: Int = nbits - pos
    def peek(n: Int): Int = {
      if (pos + n > nbits) return -1
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        v = (v << 1) | ((data(p >> 3) >> (7 - (p & 7))) & 1)
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = pos += n
    def read(n: Int): Int = { val v = peek(n); if (v >= 0) pos += n; v }
    def alignByte(): Unit = if ((pos & 7) != 0) pos = (pos & ~7) + 8
  }

  private val Eol = 0x001 // 000000000001, 12 bits

  private final class Bail extends RuntimeException

  /** One full run length of `white` color: zero or more makeup codes then a
    * terminating code (T.4 4.2.1.3: runs >= 2624 chain makeups).
    */
  private def readRun(r: BitReader, white: Boolean): Int = {
    val (lookup, lens) = if (white) (WhiteLookup, WhiteLens) else (BlackLookup, BlackLens)
    var total = 0
    var terminal = false
    while (!terminal) {
      var matched = -1
      val it = lens.iterator
      while (matched < 0 && it.hasNext) {
        val len = it.next()
        val v = r.peek(len)
        if (v >= 0) lookup.get((len, v)) match {
          case Some(run) =>
            r.skip(len); total += run; matched = run
          case None =>
        }
        else throw new Bail
      }
      if (matched < 0) throw new Bail
      if (matched < 64) terminal = true
    }
    total
  }

  /** b1: first changing element of `ref` strictly right of a0 whose
    * transition is to the color opposite the current color (even index =
    * white->black). b2 = the element after it. `columns` when absent.
    */
  private def b1b2(ref: Array[Int], refN: Int, a0: Int, white: Boolean,
      columns: Int): (Int, Int) = {
    var i = if (white) 0 else 1
    while (i < refN && ref(i) <= a0) i += 2
    if (i >= refN) (columns, columns)
    else (ref(i), if (i + 1 < refN) ref(i + 1) else columns)
  }

  /** Decode one 2D-coded line against `ref`; returns the change count
    * written into `cur`.
    */
  private def decode2DLine(r: BitReader, ref: Array[Int], refN: Int,
      cur: Array[Int], columns: Int): Int = {
    var a0 = -1
    var white = true
    var n = 0
    def put(p: Int): Unit = {
      if (n >= cur.length || p < 0 || p > columns) throw new Bail
      if (n > 0 && p < cur(n - 1)) throw new Bail
      cur(n) = p; n += 1
    }
    while (a0 < columns) {
      val (b1v, b2v) = b1b2(ref, refN, a0, white, columns)
      // longest mode code is 7 bits (VR3/VL3); probe short-to-long
      if (r.peek(1) == 1) { // V0
        r.skip(1); put(b1v); a0 = b1v; white = !white
      } else if (r.peek(3) == 1) { // 001 horizontal
        r.skip(3)
        val s = if (a0 < 0) 0 else a0
        val r1 = readRun(r, white)
        val r2 = readRun(r, !white)
        put(s + r1); put(s + r1 + r2)
        a0 = s + r1 + r2
      } else if (r.peek(3) == 3) { // 011 VR1
        r.skip(3); put(b1v + 1); a0 = b1v + 1; white = !white
      } else if (r.peek(3) == 2) { // 010 VL1
        r.skip(3); put(b1v - 1); a0 = b1v - 1; white = !white
      } else if (r.peek(4) == 1) { // 0001 pass
        r.skip(4); a0 = b2v
      } else if (r.peek(6) == 3) { // 000011 VR2
        r.skip(6); put(b1v + 2); a0 = b1v + 2; white = !white
      } else if (r.peek(6) == 2) { // 000010 VL2
        r.skip(6); put(b1v + -2); a0 = b1v - 2; white = !white
      } else if (r.peek(7) == 3) { // 0000011 VR3
        r.skip(7); put(b1v + 3); a0 = b1v + 3; white = !white
      } else if (r.peek(7) == 2) { // 0000010 VL3
        r.skip(7); put(b1v - 3); a0 = b1v - 3; white = !white
      } else throw new Bail // EOL mid-line, uncompressed extension, garbage
    }
    n
  }

  /** Decode one 1D (MH) line: alternating color runs starting white. */
  private def decode1DLine(r: BitReader, cur: Array[Int], columns: Int): Int = {
    var total = 0
    var white = true
    var n = 0
    while (total < columns) {
      val run = readRun(r, white)
      total += run
      if (total > columns) throw new Bail
      if (n >= cur.length) throw new Bail
      // a zero-length first black run is legal (line starting black)
      cur(n) = total; n += 1
      white = !white
    }
    n
  }

  /** Fill one output row (0x00 black / 0xFF white) from a change array. */
  private def renderRow(out: Array[Byte], off: Int, cur: Array[Int], n: Int,
      columns: Int): Unit = {
    var x = 0
    var white = true
    var ci = 0
    while (x < columns) {
      val next = if (ci < n) math.min(cur(ci), columns) else columns
      val v: Byte = if (white) -1 else 0
      while (x < next) { out(off + x) = v; x += 1 }
      white = !white
      ci += 1
      if (ci > n && x < columns) { // ran out of changes before the margin
        while (x < columns) { out(off + x) = -1; x += 1 }
      }
    }
  }

  /** Consume any fill bits + EOL(s) at a line boundary; returns true if at
    * least one EOL was consumed. An EOL is >= 11 zero bits then a 1 (T.4
    * 4.1.2: fill extends the zero prefix); no valid mode or run code starts
    * with 11 zeros, so the scan is unambiguous mid-stream.
    */
  private def skipEols(r: BitReader): Boolean = {
    var saw = false
    var more = true
    while (more) {
      more = false
      var z = 0
      while (z < 64 && r.peek(z + 1) == 0) z += 1
      if (z >= 11 && r.peek(z + 1) == 1) { r.skip(z + 1); saw = true; more = true }
    }
    saw
  }

  /** True when at most 64 bits remain and all of them are zero — the
    * trailing byte pad after EOFB / the final coded line, which can never
    * begin another line (every code word contains a 1 within 13 bits).
    */
  private def onlyZeroPad(r: BitReader): Boolean =
    r.remaining <= 64 && (r.remaining <= 0 || r.peek(r.remaining) == 0)

  /** Minimal Group 4 (pure-2D, `K < 0`) ENCODER over a semantic raster
    * (0x00 = black, anything else = white), row-major `w`×`h` — fixture and
    * test support for the decoder (gate fixtures plant CCITT streams with
    * it; `CcittSuite` additionally roundtrips the decoder against its own
    * independently-written encoder and fixed ITU bit vectors, so this pair
    * cannot hide a shared table error). Emits EOFB and byte-pads.
    */
  private[graft] def encodeG4(raster: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h >= 0 && raster.length == w * h, "raster geometry")
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0
    var nacc = 0
    def bits(len: Int, code: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nacc += 1
        if (nacc == 8) { out.write(acc); acc = 0; nacc = 0 }
        i -= 1
      }
    }
    def runCode(run0: Int, white: Boolean): Unit = {
      var run = run0
      while (run > 2623) { val (l, c) = ExtMakeup(2560); bits(l, c); run -= 2560 }
      if (run >= 64) {
        val mk = (run / 64) * 64
        val (l, c) =
          if (mk > 1728) ExtMakeup(mk)
          else if (white) WhiteMakeup(mk) else BlackMakeup(mk)
        bits(l, c)
        run -= mk
      }
      val (l, c) = if (white) WhiteTerm(run) else BlackTerm(run)
      bits(l, c)
    }
    // changing elements of row y: each x where the color differs from x-1
    // (x = 0 when the row starts black); colors alternate starting white
    def changes(y: Int): Array[Int] = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      var prevWhite = true
      var x = 0
      while (x < w) {
        val isWhite = raster(y * w + x) != 0
        if (isWhite != prevWhite) { b += x; prevWhite = isWhite }
        x += 1
      }
      b.toArray
    }
    var ref = Array.empty[Int] // imaginary all-white line above row 0
    var y = 0
    while (y < h) {
      val cur = changes(y)
      var a0 = -1
      var white = true
      var ci = 0
      while (a0 < w) {
        val a1 = if (ci < cur.length) cur(ci) else w
        val a2 = if (ci + 1 < cur.length) cur(ci + 1) else w
        val (b1, b2) = b1b2(ref, ref.length, a0, white, w)
        if (b2 < a1) { bits(4, 1); a0 = b2 } // pass
        else if (math.abs(a1 - b1) <= 3) { // vertical
          a1 - b1 match {
            case 0 => bits(1, 1)
            case 1 => bits(3, 3)
            case -1 => bits(3, 2)
            case 2 => bits(6, 3)
            case -2 => bits(6, 2)
            case 3 => bits(7, 3)
            case -3 => bits(7, 2)
          }
          a0 = a1; white = !white; ci += 1
        } else { // horizontal: two runs, color preserved
          bits(3, 1)
          val s = if (a0 < 0) 0 else a0
          runCode(a1 - s, white)
          runCode(a2 - a1, !white)
          a0 = a2; ci += 2
        }
      }
      ref = cur
      y += 1
    }
    bits(12, Eol); bits(12, Eol) // EOFB
    if (nacc > 0) out.write(acc << (8 - nacc))
    out.toByteArray
  }

  /** Decode `data` to (grayPixels rowMajor 0x00/0xFF, rowsDecoded).
    * `p.rows <= 0` decodes until EOFB / exhausted data. `None` on any
    * malformed or unsupported coding.
    */
  def decode(data: Array[Byte], p: Params): Option[(Array[Byte], Int)] = try {
    if (p.columns <= 0 || p.columns > (1 << 20) || data.isEmpty) return None
    val columns = p.columns
    val r = new BitReader(data)
    val maxChanges = columns + 4
    var ref = new Array[Int](maxChanges)
    var refN = 0 // imaginary all-white reference line
    var cur = new Array[Int](maxChanges)
    val rowsOut = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val maxRows = if (p.rows > 0) p.rows else 1 << 20
    var done = false
    while (!done && rowsOut.length < maxRows) {
      if (p.byteAlign) r.alignByte()
      val sawEol = skipEols(r)
      // EOFB = two consecutive EOLs (G4) / six EOLs (G3); skipEols ate them
      if (r.remaining < 1 || onlyZeroPad(r)) done = true
      else {
        val is2D =
          if (p.k < 0) true
          else if (p.k == 0) false
          else { // K > 0: tag bit follows the EOL (or leads the line)
            val tag = r.read(1)
            if (tag < 0) { done = true; true } else tag == 0
          }
        if (!done) {
          val n =
            if (is2D) decode2DLine(r, ref, refN, cur, columns)
            else decode1DLine(r, cur, columns)
          val row = new Array[Byte](columns)
          renderRow(row, 0, cur, n, columns)
          rowsOut += row
          val t = ref; ref = cur; cur = t; refN = n
          if (p.rows <= 0 && r.remaining < 2) done = true
        }
        // swallow a trailing partial byte of fill when rows are known
        if (p.rows > 0 && rowsOut.length >= maxRows) done = true
      }
      if (sawEol && r.remaining <= 0) done = true
    }
    if (rowsOut.isEmpty) None
    else {
      val h = rowsOut.length
      val out = new Array[Byte](columns * h)
      var y = 0
      while (y < h) { System.arraycopy(rowsOut(y), 0, out, y * columns, columns); y += 1 }
      Some((out, h))
    }
  } catch { case _: Bail | _: ArrayIndexOutOfBoundsException => None }
}
