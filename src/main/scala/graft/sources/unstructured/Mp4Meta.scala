package graft.sources.unstructured

/** Minimal, dependency-free MP4 / ISO-BMFF metadata: duration from
  * `moov/mvhd`, presentation width/height from the first `moov/trak/tkhd`
  * with a non-zero size. Replaces the round-1 null stub for the dominant
  * container format; non-BMFF files (AVI, MKV, WebM...) still return nulls —
  * full codec coverage is metadata-extractor territory (jar absent offline).
  *
  * Box layout: [uint32 size][4cc type][payload]; `moov` and `trak` are pure
  * containers. mvhd v0: ver/flags(4) created(4) modified(4) timescale(4)
  * duration(4); v1 widens the times to 8 bytes. tkhd v0 carries width/height
  * as 16.16 fixed point at payload offsets 76/80 (v1: +12).
  *
  * Reference equivalent: VideoReaderFactory.scala:72-97.
  */
private[graft] object Mp4Meta {

  final case class Info(durationMs: Option[Long], width: Option[Int], height: Option[Int])

  private def u32(b: Array[Byte], off: Int): Long =
    if (off + 4 > b.length) -1L
    else ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
         ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def u64(b: Array[Byte], off: Int): Long =
    if (off + 8 > b.length) -1L else (u32(b, off) << 32) | u32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  def parse(bytes: Array[Byte]): Info = {
    if (bytes.length < 12 || fourcc(bytes, 4) != "ftyp") return Info(None, None, None)
    var durationMs: Option[Long] = None
    var width: Option[Int] = None
    var height: Option[Int] = None

    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size = u32(bytes, off)
        val typ = fourcc(bytes, off + 4)
        // size 1 = 64-bit size followed after type; size 0 = to end of file
        val (payload, boxEnd) =
          if (size == 1) (off + 16, math.min(end.toLong, off + u64(bytes, off + 8)).toInt)
          else if (size == 0) (off + 8, end)
          else (off + 8, math.min(end.toLong, off + size).toInt)
        if (boxEnd <= off) return // corrupt size: stop
        typ match {
          case "moov" | "trak" => walk(payload, boxEnd)
          case "mvhd" if durationMs.isEmpty =>
            val v = bytes(payload) & 0xFF
            val (ts, dur) =
              if (v == 1) (u32(bytes, payload + 20), u64(bytes, payload + 24))
              else (u32(bytes, payload + 12), u32(bytes, payload + 16))
            if (ts > 0 && dur >= 0) durationMs = Some(dur * 1000L / ts)
          case "tkhd" if width.isEmpty =>
            val v = bytes(payload) & 0xFF
            val base = if (v == 1) payload + 88 else payload + 76
            val w = (u32(bytes, base) >> 16).toInt
            val h = (u32(bytes, base + 4) >> 16).toInt
            if (w > 0 && h > 0) { width = Some(w); height = Some(h) }
          case _ =>
        }
        off = boxEnd
      }
    }
    try walk(0, bytes.length) catch { case _: Exception => }
    Info(durationMs, width, height)
  }
}
