package graft.sources.unstructured

/** Dependency-free header probes for the two non-BMFF video container
  * families (VERDICT r2 "what's missing" #3), closing most of the
  * null-metadata surface [[Mp4Meta]] left:
  *
  *  - RIFF/AVI: `RIFF....AVI ` chunks; `LIST hdrl` holds the `avih`
  *    MainAVIHeader with micro-sec-per-frame, total frames, width, height.
  *  - EBML (Matroska/WebM): varint-tagged element tree; `Segment > Info`
  *    carries TimestampScale + Duration, `Segment > Tracks > TrackEntry >
  *    Video` carries PixelWidth/PixelHeight.
  *
  * Both are public byte-layout specs (AVI: Microsoft RIFF docs; EBML:
  * RFC 8794 + the Matroska element registry). Same robustness contract as
  * [[Mp4Meta]]: never throw on untrusted bytes, tolerate truncation, stop on
  * corrupt sizes. Reference equivalent: VideoReaderFactory.scala:72-97
  * (metadata-extractor covers these containers for the reference).
  */
private[graft] object VideoContainers {

  /** Container-dispatching probe: MP4/ISO-BMFF, AVI, MKV/WebM, Ogg/Theora. */
  def parse(bytes: Array[Byte]): Mp4Meta.Info = {
    if (bytes == null || bytes.length < 12) return Mp4Meta.Info(None, None, None)
    if (RiffAvi.isAvi(bytes)) RiffAvi.parse(bytes)
    else if (Ebml.isEbml(bytes)) Ebml.parse(bytes)
    else if (OggTheora.isOgg(bytes)) OggTheora.parse(bytes)
    else Mp4Meta.parse(bytes) // ftyp check inside
  }

  /** Ogg/Theora (OGV): the identification header (0x80 "theora") carries the
    * picture dims (PICW/PICH, 24-bit BE; frame dims FMBW/FMBH x16 as the
    * fallback when the picture region is zero), the frame rate (FRN/FRD) and
    * KFGSHIFT — so the LAST page's granule position decomposes into
    * keyframe + delta frame counts and yields the duration, the video twin
    * of the Opus/Vorbis granule walk. Theora I spec §6.2 (public).
    */
  private[unstructured] object OggTheora {
    def isOgg(b: Array[Byte]): Boolean =
      b.length >= 4 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'

    def parse(bytes: Array[Byte]): Mp4Meta.Info = try {
      def u16be(o: Int) = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
      def u24be(o: Int) = ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
      def u32be(o: Int) = ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      def u32le(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      // ONE strict RFC 3533 lacing walk over all pages: locate the Theora ID
      // packet on ANY BOS page (real OGVs put a Skeleton fishead or an audio
      // BOS first), remember its stream serial, and take the last granule
      // ONLY from that serial's pages — muxed Vorbis/Opus granules are
      // sample counts and would decompose into garbage frame counts.
      var idP = -1
      var serial = 0L
      var lastGranule = -1L
      var i = 0
      var ok = true
      while (ok && i + 27 <= bytes.length) {
        if (bytes(i) != 'O' || bytes(i + 1) != 'g' || bytes(i + 2) != 'g' || bytes(i + 3) != 'S') ok = false
        else {
          val ns = bytes(i + 26) & 0xff
          if (i + 27 + ns > bytes.length) ok = false
          else {
            var lace = 0; var si = 0
            while (si < ns) { lace += bytes(i + 27 + si) & 0xff; si += 1 }
            val p = i + 27 + ns
            val ser = u32le(i + 14)
            if (idP < 0 && p + 42 <= bytes.length && (bytes(p) & 0xff) == 0x80 &&
                bytes(p + 1) == 't' && bytes(p + 2) == 'h' && bytes(p + 3) == 'e' &&
                bytes(p + 4) == 'o' && bytes(p + 5) == 'r' && bytes(p + 6) == 'a') {
              idP = p; serial = ser
            }
            if (idP >= 0 && ser == serial) {
              var g = 0L
              var j = 7
              while (j >= 0) { g = (g << 8) | (bytes(i + 6 + j) & 0xffL); j -= 1 }
              if (g > lastGranule) lastGranule = g
            }
            i = p + lace
          }
        }
      }
      if (idP < 0) return Mp4Meta.Info(None, None, None)
      val picW = u24be(idP + 14); val picH = u24be(idP + 17)
      val w = if (picW > 0) picW else u16be(idP + 10) * 16
      val h = if (picH > 0) picH else u16be(idP + 12) * 16
      val frn = u32be(idP + 22); val frd = u32be(idP + 26)
      val kfgShift = ((bytes(idP + 40) & 0x03) << 3) | ((bytes(idP + 41) & 0xff) >> 5)
      val dur =
        if (lastGranule > 0 && frn > 0 && frd > 0) {
          val frames = (lastGranule >> kfgShift) + (lastGranule & ((1L << kfgShift) - 1))
          Some(frames * 1000L * frd / frn)
        } else None
      Mp4Meta.Info(dur,
        if (w > 0) Some(w) else None,
        if (h > 0) Some(h) else None)
    } catch { case _: Exception => Mp4Meta.Info(None, None, None) }
  }

  private[unstructured] object RiffAvi {
    private def u32le(b: Array[Byte], off: Int): Long =
      if (off + 4 > b.length) -1L
      else (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
           ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      if (off + 4 > b.length) ""
      else new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

    def isAvi(b: Array[Byte]): Boolean =
      fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

    def parse(bytes: Array[Byte]): Mp4Meta.Info = {
      var usPerFrame = -1L; var totalFrames = -1L
      var width = -1L; var height = -1L
      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 8) return
        var off = start
        while (off + 8 <= end && (usPerFrame < 0 || width < 0)) {
          val id = fourcc(bytes, off)
          val size = u32le(bytes, off + 4)
          if (size < 0 || size > end - off - 8) return // truncated/corrupt
          val dataStart = off + 8
          val dataEnd = dataStart + size.toInt
          if (id == "LIST" && size >= 4) {
            // list type is the first 4 bytes of the payload; descend into the
            // header list (and RIFF's own top level is handled by the caller)
            walk(dataStart + 4, dataEnd, depth + 1)
          } else if (id == "avih" && size >= 40) {
            usPerFrame = u32le(bytes, dataStart)
            totalFrames = u32le(bytes, dataStart + 16)
            width = u32le(bytes, dataStart + 32)
            height = u32le(bytes, dataStart + 36)
          }
          off = dataEnd + (size.toInt & 1) // chunks pad to even
        }
      }
      try walk(12, bytes.length, 0) catch { case _: Exception => }
      val dur =
        if (usPerFrame > 0 && totalFrames >= 0) Some(usPerFrame * totalFrames / 1000L)
        else None
      Mp4Meta.Info(dur,
        if (width > 0) Some(width.toInt) else None,
        if (height > 0) Some(height.toInt) else None)
    }
  }

  private[unstructured] object Ebml {
    // element IDs (with marker bit, as they appear on the wire)
    private val Segment = 0x18538067L
    private val Info = 0x1549A966L
    private val TimestampScale = 0x2AD7B1L
    private val Duration = 0x4489L
    private val Tracks = 0x1654AE6BL
    private val TrackEntry = 0xAEL
    private val Video = 0xE0L
    private val PixelWidth = 0xB0L
    private val PixelHeight = 0xBAL
    private val Containers = Set(Segment, Info, Tracks, TrackEntry, Video)

    def isEbml(b: Array[Byte]): Boolean =
      b.length >= 4 && (b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
        (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3

    /** EBML varint at `off`: (value, lengthInBytes); id keeps the marker bit,
      * size strips it. Returns (-1, 0) on truncation/invalid.
      */
    private def varint(b: Array[Byte], off: Int, keepMarker: Boolean): (Long, Int) = {
      if (off >= b.length) return (-1L, 0)
      val first = b(off) & 0xFF
      if (first == 0) return (-1L, 0)
      val len = Integer.numberOfLeadingZeros(first) - 24 + 1 // leading zeros within the byte + 1
      if (len < 1 || len > 8 || off + len > b.length) return (-1L, 0)
      var v = if (keepMarker) first.toLong else (first & ((1 << (8 - len)) - 1)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
      (v, len)
    }

    private def uint(b: Array[Byte], off: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len && off + i < b.length) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
      v
    }

    private def float(b: Array[Byte], off: Int, len: Int): Double =
      if (len == 4) java.lang.Float.intBitsToFloat(uint(b, off, 4).toInt).toDouble
      else if (len == 8) java.lang.Double.longBitsToDouble(uint(b, off, 8))
      else -1.0

    def parse(bytes: Array[Byte]): Mp4Meta.Info = {
      var tsScale = 1000000L // default: 1 ms per timestamp tick
      var durationTicks = -1.0
      var width = -1L; var height = -1L

      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 12) return
        var off = start
        while (off < end) {
          val (id, idLen) = varint(bytes, off, keepMarker = true)
          if (idLen == 0) return
          val (size, szLen) = varint(bytes, off + idLen, keepMarker = false)
          if (szLen == 0) return
          val dataStart = off + idLen + szLen
          // all-ones size = unknown ("to end of parent"), common for Segment
          val unknownSize = size == (1L << (7 * szLen)) - 1
          val dataEnd =
            if (unknownSize) end
            else if (size < 0 || size > end - dataStart) return // corrupt
            else dataStart + size.toInt
          id match {
            case i if Containers.contains(i) => walk(dataStart, dataEnd, depth + 1)
            case TimestampScale => tsScale = uint(bytes, dataStart, (dataEnd - dataStart) min 8)
            case Duration => durationTicks = float(bytes, dataStart, dataEnd - dataStart)
            case PixelWidth if width < 0 => width = uint(bytes, dataStart, (dataEnd - dataStart) min 8)
            case PixelHeight if height < 0 => height = uint(bytes, dataStart, (dataEnd - dataStart) min 8)
            case _ =>
          }
          if (dataEnd <= off) return
          off = dataEnd
        }
      }
      try walk(0, bytes.length, 0) catch { case _: Exception => }
      val dur =
        if (durationTicks >= 0 && tsScale > 0)
          Some((durationTicks * tsScale / 1e6).toLong) // ns -> ms
        else None
      Mp4Meta.Info(dur,
        if (width > 0) Some(width.toInt) else None,
        if (height > 0) Some(height.toInt) else None)
    }
  }
}
