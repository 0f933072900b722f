package graft.sources.lake

import org.apache.spark.sql.types._

/** Iceberg hidden-partition transforms, reader side: given a manifest's
  * TRANSFORMED partition value for a file (`day(ts) = 17486`,
  * `bucket[16](id) = 3`, `truncate[4](s) = "abcd"`), derive what that
  * proves about the SOURCE column's values inside the file — a [min, max]
  * window for the temporal/truncate transforms, an equality test for
  * bucket — so pushed data filters prune files at listing time exactly
  * like identity partitions, with zero IO (reference surface:
  * iceberg-core's residual evaluation, delegated to the jar by
  * `AbstractIcebergCatalogUnit.scala:28-67`; re-derived here from the
  * public spec's Partition Transforms table).
  *
  * Every derivation is conservative: an unrecognized transform, source
  * type, or value yields no constraint (the file is kept).
  */
object IcebergTransforms {

  /** One non-identity partition-spec field resolved against the current
    * schema: the manifest partition struct's field name, the transform
    * spelling, and the source column (top-level) with its Spark type.
    */
  final case class TransformField(specName: String, transform: String,
      sourceCol: String, sourceType: DataType)

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Murmur3 x86 32-bit, seed 0 — the spec's bucket hash (Appendix B:
    * 32-bit Hash Requirements). Implemented directly from the public
    * algorithm; the suite pins it to the spec's published test vectors
    * (int 34, long 34, "iceberg", date 17486, timestamp micros).
    */
  def murmur3(bytes: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed
    val nBlocks = bytes.length / 4
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      var k1 = (bytes(base) & 0xff) | ((bytes(base + 1) & 0xff) << 8) |
        ((bytes(base + 2) & 0xff) << 16) | ((bytes(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail (standard accumulate-then-mix — NOT byte-at-a-time)
    var k1 = 0
    val tail = nBlocks * 4
    (bytes.length & 3) match {
      case 3 =>
        k1 ^= (bytes(tail + 2) & 0xff) << 16
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
      case 2 =>
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
      case 1 =>
        k1 ^= bytes(tail) & 0xff
      case _ =>
    }
    if ((bytes.length & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= bytes.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  private def leLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  /** The spec's per-type hash input: int/long/date/time/timestamp widen to
    * long and hash its 8 little-endian bytes; strings hash their UTF-8
    * bytes. None = type not bucketable by this reader (keep the file).
    */
  def bucketHash(value: Any, dt: DataType): Option[Int] = (dt, value) match {
    case (IntegerType, v: Int) => Some(murmur3(leLong(v.toLong)))
    case (LongType, v: Long) => Some(murmur3(leLong(v)))
    case (ShortType, v: Short) => Some(murmur3(leLong(v.toLong)))
    case (ByteType, v: Byte) => Some(murmur3(leLong(v.toLong)))
    case (StringType, v: String) => Some(murmur3(v.getBytes("UTF-8")))
    // catalyst-internal representations (pruning literals arrive this way)
    case (StringType, v: org.apache.spark.unsafe.types.UTF8String) =>
      Some(murmur3(v.getBytes))
    case (DateType, v: Int) => Some(murmur3(leLong(v.toLong))) // internal: epoch days
    case (TimestampType, v: Long) => Some(murmur3(leLong(v))) // internal: micros
    case (DateType, v: java.time.LocalDate) => Some(murmur3(leLong(v.toEpochDay)))
    case (DateType, v: java.sql.Date) => Some(murmur3(leLong(v.toLocalDate.toEpochDay)))
    case (TimestampType, v: java.time.Instant) =>
      Some(murmur3(leLong(v.getEpochSecond * 1000000L + v.getNano / 1000L)))
    case (TimestampType, v: java.sql.Timestamp) =>
      Some(murmur3(leLong(v.toInstant.getEpochSecond * 1000000L +
        v.toInstant.getNano / 1000L)))
    case _ => None
  }

  def bucketValue(value: Any, dt: DataType, n: Int): Option[Int] =
    if (n <= 0) None // corrupted spec (`bucket[0]`): no proof, keep the file
    else bucketHash(value, dt).map(h => (h & Integer.MAX_VALUE) % n)

  /** Can a row with `source = lit` live in a file whose `transform(source)`
    * partition value is `tv`? Only bucket needs this equality-only form —
    * the range transforms express as [[bounds]]. Unknown = true (keep).
    */
  def bucketKeep(transform: String, sourceType: DataType, tv: Any)(lit: Any): Boolean =
    transform match {
      case BucketRe(n) => (tv, bucketValue(lit, sourceType, n.toInt)) match {
        case (fileBucket: Int, Some(litBucket)) => litBucket == fileBucket
        case _ => true
      }
      case _ => true
    }

  private val EpochDate = java.time.LocalDate.of(1970, 1, 1)
  private def utcInstant(d: java.time.LocalDateTime): java.time.Instant =
    d.toInstant(java.time.ZoneOffset.UTC)

  /** External-typed [min, max] (inclusive) for the source column's values
    * inside a file whose transform value is `tv`. None = no range proof
    * for this transform/type/value.
    */
  def bounds(transform: String, sourceType: DataType, tv: Any): Option[(Any, Any)] = {
    def num(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case _ => None
    }
    def dayWindow(days: Long): Option[(Any, Any)] = sourceType match {
      case DateType =>
        val d = EpochDate.plusDays(days)
        Some((d, d))
      case TimestampType | TimestampNTZType =>
        tsWindow(java.time.LocalDate.ofEpochDay(days).atStartOfDay(),
          java.time.LocalDate.ofEpochDay(days).plusDays(1).atStartOfDay())
      case _ => None
    }
    def tsWindow(from: java.time.LocalDateTime,
        until: java.time.LocalDateTime): Option[(Any, Any)] = sourceType match {
      case TimestampType =>
        Some((utcInstant(from), utcInstant(until).minusNanos(1000)))
      case TimestampNTZType =>
        Some((from, until.minusNanos(1000)))
      case _ => None
    }
    def monthWindow(months: Long): Option[(Any, Any)] = {
      val from = EpochDate.plusMonths(months)
      val until = from.plusMonths(1)
      sourceType match {
        case DateType => Some((from, until.minusDays(1)))
        case TimestampType | TimestampNTZType =>
          tsWindow(from.atStartOfDay(), until.atStartOfDay())
        case _ => None
      }
    }
    transform match {
      case "day" | "days" => num(tv).flatMap(dayWindow)
      case "hour" | "hours" => num(tv).flatMap { h =>
        val from = java.time.LocalDateTime.ofEpochSecond(h * 3600L, 0,
          java.time.ZoneOffset.UTC)
        tsWindow(from, from.plusHours(1))
      }
      case "month" | "months" => num(tv).flatMap(monthWindow)
      case "year" | "years" => num(tv).flatMap { y =>
        val from = EpochDate.plusYears(y)
        val until = from.plusYears(1)
        sourceType match {
          case DateType => Some((from, until.minusDays(1)))
          case TimestampType | TimestampNTZType =>
            tsWindow(from.atStartOfDay(), until.atStartOfDay())
          case _ => None
        }
      }
      case TruncateRe(w) => (sourceType, tv) match {
        // overflow drops the proof — a wrapped upper bound inverts the
        // window and wrong pruning is silently missing rows
        case (IntegerType, v: Int) if v <= Int.MaxValue - (w.toInt - 1) =>
          Some((v, v + w.toInt - 1))
        case (LongType, v: Long) if v <= Long.MaxValue - (w.toLong - 1) =>
          Some((v, v + w.toLong - 1))
        case (StringType, v: String) if v.nonEmpty =>
          // every value has prefix v: >= v, and < v with last char bumped.
          // The inclusive upper is conservative by one exact-match string;
          // a last char at the unbumpable top drops the proof instead.
          val last = v.charAt(v.length - 1)
          if (last >= 0xD7FF.toChar) None
          else Some((v, v.substring(0, v.length - 1) + (last + 1).toChar))
        case _ => None
      }
      case _ => None
    }
  }
}
