package graft.sources.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Delta Lake deletion-vector codec, written from the PUBLIC protocol
  * (delta-io PROTOCOL.md "Deletion Vectors" + the RoaringFormatSpec
  * portable format the protocol references):
  *
  *  - serialized bitmap = "RoaringBitmapArray" portable form: magic
  *    1681511377 (int32 LE), number of 32-bit bitmaps (int64 LE), then each
  *    bitmap's standard portable serialization (cookie 12346/12347,
  *    descriptive headers, offsets, array/bitmap/run containers — all LE);
  *    a set 64-bit value v lives in bitmap (v >>> 32) at 32-bit position
  *    (v & 0xFFFFFFFF).
  *  - on-disk DV file = 1-byte format version (1), then per stored vector:
  *    int32 BIG-endian data size, the bitmap bytes, int32 BIG-endian CRC-32
  *    of the bitmap bytes; the descriptor's `offset` points at the size
  *    field and `sizeInBytes` is the bitmap length.
  *  - descriptor `pathOrInlineDv`: storageType "i" = Base85(bitmap bytes);
  *    "u" = optional random prefix + 20-char Base85 of the UUID, resolving
  *    to `<prefix>/deletion_vector_<uuid>.bin` under the table root;
  *    "p" = absolute path. Base85 uses the RFC 1924 alphabet.
  *
  * Decode supports all three container kinds (array, bitmap, run) and both
  * cookies; the fixture encoder emits the no-run form with array/bitmap
  * containers. Everything here is pure byte work — executors call
  * [[decodeBitmapArray]]/[[readDvData]] so bitmap decode scales with the
  * delete files, never the driver.
  */
object RoaringDv {

  // ---- RFC 1924 Base85 ----

  private val Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ!#$%&()*+-;<=>?@^_`{|}~"
  private val AlphaIndex: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Base85-encode whole 4-byte groups (Delta only encodes multiples of 4:
    * 16-byte UUIDs and bitmap buffers padded by the writer).
    */
  def base85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"base85 payload must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
      val chunk = new Array[Char](5)
      var k = 4
      while (k >= 0) { chunk(k) = Alphabet((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  def base85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"base85 text must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var k = 0
      while (k < 5) {
        val c = s.charAt(i + k)
        val d = if (c < 128) AlphaIndex(c.toInt) else -1
        require(d >= 0, s"invalid base85 character '$c'")
        v = v * 85 + d
        k += 1
      }
      val o = i / 5 * 4
      out(o) = ((v >>> 24) & 0xff).toByte
      out(o + 1) = ((v >>> 16) & 0xff).toByte
      out(o + 2) = ((v >>> 8) & 0xff).toByte
      out(o + 3) = (v & 0xff).toByte
      i += 5
    }
    out
  }

  def encodeUuid(uuid: java.util.UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    base85Encode(bb.array())
  }

  def decodeUuid(s: String): java.util.UUID = {
    val b = ByteBuffer.wrap(base85Decode(s))
    new java.util.UUID(b.getLong, b.getLong)
  }

  // ---- RoaringBitmapArray portable serialization ----

  private val MagicNumber = 1681511377

  /** Decode the portable RoaringBitmapArray into sorted 64-bit positions. */
  def decodeBitmapArray(bytes: Array[Byte]): Array[Long] = {
    val out = Array.newBuilder[Long]
    foreachPosition(bytes)(out += _)
    out.result()
  }

  /** Visit every position of a portable RoaringBitmapArray in sorted order
    * without materializing them — what incremental re-encoding wants.
    */
  def foreachPosition(bytes: Array[Byte])(f: Long => Unit): Unit = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == MagicNumber,
      s"not a portable RoaringBitmapArray (magic $magic, want $MagicNumber)")
    val nBitmaps = buf.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"implausible bitmap count $nBitmaps")
    var b = 0L
    while (b < nBitmaps) {
      val high = b << 32
      decodeRoaring32(buf, v32 => f(high | (v32 & 0xffffffffL)))
      b += 1
    }
  }

  /** One standard portable 32-bit RoaringBitmap, advancing `buf` past it. */
  private def decodeRoaring32(buf: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = buf.getInt
    val (hasRun, nContainers) =
      if ((cookie & 0xffff) == 12347) (true, (cookie >>> 16) + 1)
      else if (cookie == 12346) (false, buf.getInt)
      else throw new IllegalArgumentException(s"bad roaring cookie $cookie")
    require(nContainers >= 0 && nContainers <= 65536, s"bad container count $nContainers")
    val runBits =
      if (hasRun) { val a = new Array[Byte]((nContainers + 7) / 8); buf.get(a); a }
      else Array.empty[Byte]
    def isRun(i: Int) = hasRun && (runBits(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = buf.getShort & 0xffff
      cards(i) = (buf.getShort & 0xffff) + 1
      i += 1
    }
    // offset header: always for the no-run cookie; with runs only when >= 4
    if (!hasRun || nContainers >= 4) buf.position(buf.position() + 4 * nContainers)
    i = 0
    while (i < nContainers) {
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort & 0xffff
          val len = buf.getShort & 0xffff
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var c = 0
        while (c < cards(i)) { emit(base | (buf.getShort & 0xffff)); c += 1 }
      } else {
        var w = 0
        while (w < 1024) {
          val word = buf.getLong
          if (word != 0L) {
            var bit = 0
            while (bit < 64) {
              if ((word & (1L << bit)) != 0) emit(base | (w * 64 + bit))
              bit += 1
            }
          }
          w += 1
        }
      }
      i += 1
    }
  }

  /** Encode sorted-or-not 64-bit positions as a portable RoaringBitmapArray
    * (no-run form; array containers up to 4096 values, bitmap above).
    */
  def encodeBitmapArray(positions: Seq[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "negative position")
    val byBitmap = positions.distinct.sorted.groupBy(_ >>> 32)
    val nBitmaps = if (byBitmap.isEmpty) 0L else byBitmap.keys.max + 1
    val out = new java.io.ByteArrayOutputStream()
    def writeIntLE(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def writeShortLE(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    writeIntLE(MagicNumber)
    writeIntLE((nBitmaps & 0xffffffffL).toInt); writeIntLE((nBitmaps >>> 32).toInt)
    var b = 0L
    while (b < nBitmaps) {
      val vals = byBitmap.getOrElse(b, Nil).map(v => (v & 0xffffffffL).toInt)
      val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      writeIntLE(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
      writeIntLE(byKey.size)
      byKey.foreach { case (k, vs) => writeShortLE(k); writeShortLE(vs.size - 1) }
      // container offsets relative to the start of THIS bitmap's stream
      var off = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, vs) =>
        writeIntLE(off)
        off += (if (vs.size <= 4096) 2 * vs.size else 8192)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.size <= 4096) vs.foreach(v => writeShortLE(v & 0xffff))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v => val lo = v & 0xffff; words(lo / 64) |= (1L << (lo % 64)) }
          words.foreach { w =>
            var k = 0
            while (k < 8) { out.write(((w >>> (8 * k)) & 0xff).toInt); k += 1 }
          }
        }
      }
      b += 1
    }
    out.toByteArray
  }

  /** Growable buffer of 16-bit container values — the SPARSE container
    * state, mirroring roaring's own array container. `Char` is the JVM's
    * unsigned 16-bit type, so a plain sort orders values correctly.
    * Appends may duplicate transiently (merge concatenation); encoding
    * sorts + dedups.
    */
  private final class ShortBuf(var arr: Array[Char], var n: Int) {
    def this() = this(new Array[Char](8), 0)
    def add(v: Int): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(n) = v.toChar; n += 1
    }
    def copy(): ShortBuf = new ShortBuf(java.util.Arrays.copyOf(arr, n), n)
    /** Distinct values in ascending (unsigned) order. */
    def sortedDistinct(): Array[Char] = {
      val a = java.util.Arrays.copyOf(arr, n)
      java.util.Arrays.sort(a)
      var w = 0; var i = 0
      while (i < a.length) {
        if (w == 0 || a(w - 1) != a(i)) { a(w) = a(i); w += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(a, w)
    }
    def intoWords(words: Array[Long]): Unit = {
      var i = 0
      while (i < n) {
        val lo = arr(i).toInt
        words(lo >>> 6) |= (1L << (lo & 63)); i += 1
      }
    }
    def toWords(): Array[Long] = {
      val words = new Array[Long](1024); intoWords(words); words
    }
  }

  /** Past this many buffered values a sparse container promotes to the
    * 8 KiB word block — roaring's own array/bitmap split point (4096
    * values × 2 B = the break-even against 8 KiB).
    */
  private val ContainerPromote = 4096

  /** Incremental roaring-bitmap builder: positions land one at a time in
    * per-container buffers — a sorted-array form while sparse (2 B/value,
    * like roaring's array containers), promoted to an 8 KiB word block
    * past [[ContainerPromote]] values — merge is per-container union, and
    * [[result]] emits the same portable RoaringBitmapArray bytes
    * [[encodeBitmapArray]] produces — WITHOUT ever materializing an
    * all-positions array. This is the agg-buffer shape the distributed
    * position-delete pre-aggregation wants: a dense file's buffer is
    * bounded by its row-ordinal span (touched containers × 8 KiB) and a
    * sparse delete set (one row per distant container) costs ~2 B/value,
    * never the 1024× blow-up a block-only design pays. Serialization is a
    * custom compact form (container key + state byte + payload), so the
    * Aggregator's partial→final shuffle bytes are bitmap-sized, not
    * Java-object-graph-sized.
    */
  final class BitmapBuilder extends Serializable {
    // container key = position >>> 16: bitmap index in the upper 48 bits,
    // 16-bit container key in the low 16 — one flat map for the whole
    // 64-bit position space. Values are Array[Long](1024) (dense block)
    // or ShortBuf (sparse); @transient + custom read/writeObject below.
    @transient private var containers = new java.util.HashMap[java.lang.Long, AnyRef]()

    def add(pos: Long): Unit = {
      require(pos >= 0, s"negative position $pos")
      val key = java.lang.Long.valueOf(pos >>> 16)
      val lo = (pos & 0xffff).toInt
      containers.get(key) match {
        case null =>
          val b = new ShortBuf(); b.add(lo); containers.put(key, b)
        case words: Array[Long] =>
          words(lo >>> 6) |= (1L << (lo & 63))
        case buf: ShortBuf =>
          buf.add(lo)
          if (buf.n > ContainerPromote) containers.put(key, buf.toWords())
      }
    }

    def merge(o: BitmapBuilder): BitmapBuilder = {
      o.containers.forEach { (k, v) =>
        (containers.get(k), v) match {
          case (null, w: Array[Long]) => containers.put(k, w.clone())
          case (null, b: ShortBuf) => containers.put(k, b.copy())
          case (mine: Array[Long], w: Array[Long]) =>
            var i = 0; while (i < 1024) { mine(i) |= w(i); i += 1 }
          case (mine: Array[Long], b: ShortBuf) => b.intoWords(mine)
          case (mine: ShortBuf, w: Array[Long]) =>
            val nw = w.clone(); mine.intoWords(nw); containers.put(k, nw)
          case (mine: ShortBuf, b: ShortBuf) =>
            var i = 0; while (i < b.n) { mine.add(b.arr(i).toInt); i += 1 }
            if (mine.n > ContainerPromote) containers.put(k, mine.toWords())
          case _ => throw new IllegalStateException("unreachable container state")
        }
      }
      this
    }

    def isEmpty: Boolean = containers.isEmpty

    private def containerCard(v: AnyRef): Int = v match {
      case w: Array[Long] =>
        var c = 0; var i = 0
        while (i < 1024) { c += java.lang.Long.bitCount(w(i)); i += 1 }
        c
      case b: ShortBuf => b.sortedDistinct().length
    }

    def cardinality: Long = {
      var n = 0L
      containers.forEach { (_, v) => n += containerCard(v) }
      n
    }

    /** Compact serial form: count, then per container key + state byte +
      * (sorted distinct values | 1024 words). Shuffle bytes track the
      * bitmap's true size either way round.
      */
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      out.writeInt(containers.size)
      containers.forEach { (k, v) =>
        out.writeLong(k.longValue())
        v match {
          case w: Array[Long] =>
            out.writeByte(1)
            var i = 0; while (i < 1024) { out.writeLong(w(i)); i += 1 }
          case b: ShortBuf =>
            out.writeByte(0)
            val vals = b.sortedDistinct()
            out.writeInt(vals.length)
            vals.foreach(out.writeChar(_))
        }
      }
    }

    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      containers = new java.util.HashMap[java.lang.Long, AnyRef]()
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val k = java.lang.Long.valueOf(in.readLong())
        if (in.readByte() == 1) {
          val w = new Array[Long](1024)
          var j = 0; while (j < 1024) { w(j) = in.readLong(); j += 1 }
          containers.put(k, w)
        } else {
          val m = in.readInt()
          val b = new ShortBuf(new Array[Char](math.max(8, m)), m)
          var j = 0; while (j < m) { b.arr(j) = in.readChar(); j += 1 }
          containers.put(k, b)
        }
        i += 1
      }
    }

    /** Portable RoaringBitmapArray bytes — byte-identical to
      * [[encodeBitmapArray]] over the same position set (no-run form,
      * array containers up to 4096 values, bitmap above). The serialized
      * container form is chosen by TRUE cardinality, independent of the
      * in-memory state (a duplicate-heavy promoted block with ≤ 4096
      * distinct values still writes the array form).
      */
    def result(): Array[Byte] = {
      import scala.jdk.CollectionConverters._
      // normalize each container to (card, sorted values | null, words | null)
      val sorted = containers.asScala.toSeq.map { case (k, v) =>
        v match {
          case w: Array[Long] => (k.longValue(), containerCard(w), null: Array[Char], w)
          case sb: ShortBuf =>
            val vals = sb.sortedDistinct()
            (k.longValue(), vals.length, vals, null: Array[Long])
        }
      }.sortBy(_._1)
      val byBitmap = sorted.groupBy(_._1 >>> 16)
      val nBitmaps = if (byBitmap.isEmpty) 0L else byBitmap.keys.max + 1
      val out = new java.io.ByteArrayOutputStream()
      def writeIntLE(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >>> 8) & 0xff)
        out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
      }
      def writeShortLE(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      writeIntLE(MagicNumber)
      writeIntLE((nBitmaps & 0xffffffffL).toInt); writeIntLE((nBitmaps >>> 32).toInt)
      var b = 0L
      while (b < nBitmaps) {
        val conts = byBitmap.getOrElse(b, Nil).map { case (k, card, vals, w) =>
          ((k & 0xffff).toInt, card, vals, w)
        }
        writeIntLE(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
        writeIntLE(conts.size)
        conts.foreach { case (k, card, _, _) => writeShortLE(k); writeShortLE(card - 1) }
        var off = 4 + 4 + 4 * conts.size + 4 * conts.size
        conts.foreach { case (_, card, _, _) =>
          writeIntLE(off)
          off += (if (card <= 4096) 2 * card else 8192)
        }
        conts.foreach { case (_, card, vals, w) =>
          if (card <= 4096) {
            if (vals != null) vals.foreach(c => writeShortLE(c.toInt))
            else {
              var i = 0
              while (i < 1024) {
                var word = w(i)
                while (word != 0L) {
                  val bit = java.lang.Long.numberOfTrailingZeros(word)
                  writeShortLE(i * 64 + bit)
                  word &= word - 1
                }
                i += 1
              }
            }
          } else {
            // card > 4096 implies the promoted word-block state
            w.foreach { word =>
              var j = 0
              while (j < 8) { out.write(((word >>> (8 * j)) & 0xff).toInt); j += 1 }
            }
          }
        }
        b += 1
      }
      out.toByteArray
    }
  }

  /** Typed aggregate building one roaring bitmap per group incrementally —
    * the distributed form of "collect + sort + encode the positions",
    * minus the all-positions array in the agg buffer. Register with
    * `functions.udaf(new RoaringDv.BitmapAgg, Encoders.scalaLong)`.
    */
  final class BitmapAgg
      extends org.apache.spark.sql.expressions.Aggregator[Long, BitmapBuilder, Array[Byte]] {
    override def zero: BitmapBuilder = new BitmapBuilder
    override def reduce(b: BitmapBuilder, pos: Long): BitmapBuilder = { b.add(pos); b }
    override def merge(a: BitmapBuilder, b: BitmapBuilder): BitmapBuilder = a.merge(b)
    override def finish(b: BitmapBuilder): Array[Byte] = b.result()
    override def bufferEncoder: org.apache.spark.sql.Encoder[BitmapBuilder] =
      org.apache.spark.sql.Encoders.javaSerialization[BitmapBuilder]
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  // ---- on-disk DV file framing ----

  /** Append-style single-vector DV file: version byte, BE size, data, BE
    * CRC-32. Returns (offset of the size field, data length) for the add
    * action's descriptor.
    */
  def writeDvFile(conf: Configuration, file: Path, bitmap: Array[Byte]): (Long, Int) = {
    val fs = file.getFileSystem(conf)
    fs.mkdirs(file.getParent)
    val outS = fs.create(file, true)
    val dataOut = new java.io.DataOutputStream(outS)
    try {
      dataOut.writeByte(1) // DV file format version
      val offset = 1L
      dataOut.writeInt(bitmap.length)
      dataOut.write(bitmap)
      val crc = new CRC32(); crc.update(bitmap)
      dataOut.writeInt(crc.getValue.toInt)
      (offset, bitmap.length)
    } finally dataOut.close()
  }

  /** Read one stored vector's bitmap bytes; verifies the version byte, the
    * framed size against the descriptor, and the CRC-32.
    */
  def readDvData(conf: Configuration, file: Path, offset: Long, sizeInBytes: Int): Array[Byte] = {
    val fs = file.getFileSystem(conf)
    val in = fs.open(file)
    try {
      val version = in.readByte()
      require(version == 1, s"unsupported DV file format version $version in $file")
      in.seek(offset)
      val framed = in.readInt()
      require(framed == sizeInBytes,
        s"DV size mismatch in $file@$offset: framed $framed vs descriptor $sizeInBytes")
      val data = new Array[Byte](sizeInBytes)
      in.readFully(data)
      val stored = in.readInt()
      val crc = new CRC32(); crc.update(data)
      require(stored == crc.getValue.toInt, s"DV checksum mismatch in $file@$offset")
      data
    } finally in.close()
  }

  /** Resolve a descriptor's storage to the DV file path (None = inline). */
  def resolvePath(tableDir: Path, storageType: String, pathOrInlineDv: String): Option[Path] =
    storageType match {
      case "i" => None
      case "p" => Some(new Path(pathOrInlineDv))
      case "u" =>
        val prefix = pathOrInlineDv.dropRight(20)
        val uuid = decodeUuid(pathOrInlineDv.takeRight(20))
        val name = s"deletion_vector_$uuid.bin"
        Some(if (prefix.isEmpty) new Path(tableDir, name)
        else new Path(new Path(tableDir, prefix), name))
      case other =>
        throw new UnsupportedOperationException(s"DV storage type '$other' not supported")
    }
}
