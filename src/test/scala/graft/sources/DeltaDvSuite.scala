package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

import java.nio.file.Files

/** Delta deletion vectors: the RoaringBitmapArray portable codec (all
  * container kinds), RFC 1924 Base85, DV file framing with CRC, and the
  * end-to-end DeltaLite read where vectors apply as a distributed
  * anti-join while DV-free files bypass the join entirely.
  */
class DeltaDvSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  test("base85 block coding matches an independent BigInt computation (RFC 1924 alphabet)") {
    // Delta's codec (unlike the RFC's single-big-number example) encodes
    // each 4-byte block MSB-first as 5 base-85 digits; cross-check against
    // a digit expansion computed independently with BigInt here
    val alphabet =
      "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ!#$%&()*+-;<=>?@^_`{|}~"
    def expected(bytes: Array[Byte]): String =
      bytes.grouped(4).map { g =>
        var v = BigInt(1, g)
        val digits = (0 until 5).map { _ => val d = (v % 85).toInt; v /= 85; d }.reverse
        digits.map(alphabet).mkString
      }.mkString
    val cases = Seq(
      Array.fill[Byte](16)(0),
      Array.fill[Byte](4)(-1), // 0xFFFFFFFF
      Array(0x10, 0x80, 0, 0, 0, 0, 0, 0, 0, 0x08, 0x08, 0, 0x20, 0x0C, 0x41, 0x7A).map(_.toByte),
      Array.tabulate[Byte](20)(i => (i * 37).toByte))
    for (c <- cases) {
      assert(RoaringDv.base85Encode(c) == expected(c))
      assert(RoaringDv.base85Decode(RoaringDv.base85Encode(c)).sameElements(c))
    }
    assert(RoaringDv.base85Encode(Array.fill[Byte](16)(0)) == "0" * 20)
    val u = java.util.UUID.fromString("12345678-9abc-def0-1234-56789abcdef0")
    assert(RoaringDv.encodeUuid(u).length == 20)
    assert(RoaringDv.decodeUuid(RoaringDv.encodeUuid(u)) == u)
  }

  test("roaring array round-trips across array/bitmap containers and 32-bit boundaries") {
    val cases = Seq(
      Seq.empty[Long],
      Seq(0L),
      Seq(1L, 3L, 5L, 65535L, 65536L, 131071L), // two keys, array containers
      (0L until 5000L).map(_ * 2), // one key crossing into a bitmap container
      Seq(7L, (1L << 32) | 9L, (3L << 32) | 123456L), // multiple 32-bit bitmaps
      (0L until 300L).map(i => i * 977L % 200000L).distinct)
    for (ps <- cases) {
      val decoded = RoaringDv.decodeBitmapArray(RoaringDv.encodeBitmapArray(ps)).toSeq
      assert(decoded == ps.distinct.sorted, s"round-trip failed for ${ps.take(10)}...")
    }
  }

  test("roaring decode handles run containers (decode-only path)") {
    // hand-built portable bitmap: cookie 12347, 1 container marked RUN with
    // runs [(10, len 2), (100, len 0)] -> values {10,11,12,100}
    val out = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def i16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    i32(1681511377); i32(1); i32(0) // array magic, one bitmap (count int64 LE)
    i32(12347 | (0 << 16)) // run cookie, containerCount-1 = 0
    out.write(1) // run bitset: container 0 is a run
    i16(0); i16(3) // key 0, cardinality-1 = 3
    // offsets omitted (< 4 containers with run cookie)
    i16(2) // numRuns
    i16(10); i16(2)
    i16(100); i16(0)
    val decoded = RoaringDv.decodeBitmapArray(out.toByteArray).toSeq
    assert(decoded == Seq(10L, 11L, 12L, 100L))
  }

  test("dv file framing round-trips and rejects corruption") {
    val dir = tmpDir("dvfile")
    val conf = spark.sparkContext.hadoopConfiguration
    val bitmap = RoaringDv.encodeBitmapArray(Seq(1L, 5L, 9L))
    val p = new Path(dir.toString, "deletion_vector_test.bin")
    val (offset, size) = RoaringDv.writeDvFile(conf, p, bitmap)
    val back = RoaringDv.readDvData(conf, p, offset, size)
    assert(back.sameElements(bitmap))
    // flip one payload byte -> CRC must catch it
    val local = java.nio.file.Paths.get(dir.toString, "deletion_vector_test.bin")
    val raw = java.nio.file.Files.readAllBytes(local)
    raw(6) = (raw(6) ^ 0x40).toByte
    java.nio.file.Files.write(local, raw)
    // drop hadoop's local-FS .crc sidecar so the DV-level CRC is what fires
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir.toString, ".deletion_vector_test.bin.crc"))
    val e = intercept[IllegalArgumentException] { RoaringDv.readDvData(conf, p, offset, size) }
    assert(e.getMessage.contains("checksum"))
  }

  /** Three-file table: A (ids 0..9) gets a file-storage DV masking {1,3,5};
    * B (ids 10..19) gets an INLINE DV masking its first two rows; C
    * (ids 20..24) has no DV. Commit 0 = adds, commit 1 = protocol upgrade +
    * DV attachment via re-add.
    */
  private def buildDvTable(dir: java.io.File): Unit = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    def write(rel: String, lo: Int, hi: Int): Long = {
      val d = (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("id", "name")
      LakeWrite.writeOneParquetFile(d.coalesce(1).sortWithinPartitions("id"), new Path(root, rel))
    }
    val (sa, sb, sc) = (write("a.parquet", 0, 10), write("b.parquet", 10, 20), write("c.parquet", 20, 25))
    val st = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    LakeWrite.deltaCommit(conf, root, 0, Seq(
      LakeWrite.deltaCommitInfo(1700000000000L),
      LakeWrite.deltaProtocol(),
      LakeWrite.deltaMetaData("dv-fixture", st, Nil),
      LakeWrite.deltaAdd("a.parquet", sa, 1700000000000L, Map.empty),
      LakeWrite.deltaAdd("b.parquet", sb, 1700000000000L, Map.empty),
      LakeWrite.deltaAdd("c.parquet", sc, 1700000000000L, Map.empty)))

    // file-storage DV for A ("u" with a random prefix)
    val uuid = java.util.UUID.fromString("0f0e0d0c-0b0a-0908-0706-050403020100")
    val dvRel = s"ab/deletion_vector_$uuid.bin"
    val bitmapA = RoaringDv.encodeBitmapArray(Seq(1L, 3L, 5L))
    val (offA, szA) = RoaringDv.writeDvFile(conf, new Path(root, dvRel), bitmapA)
    // inline DV for B
    val bitmapB = RoaringDv.encodeBitmapArray(Seq(0L, 1L))
    val padded = bitmapB ++ new Array[Byte]((4 - bitmapB.length % 4) % 4)
    LakeWrite.deltaCommit(conf, root, 1, Seq(
      LakeWrite.deltaCommitInfo(1700000100000L),
      LakeWrite.deltaProtocolWithFeatures(Seq("deletionVectors"), Seq("deletionVectors")),
      LakeWrite.deltaAddDv("a.parquet", sa, 1700000100000L, Map.empty,
        "u", "ab" + RoaringDv.encodeUuid(uuid), Some(offA), szA, 3L),
      LakeWrite.deltaAddDv("b.parquet", sb, 1700000100000L, Map.empty,
        "i", RoaringDv.base85Encode(padded), None, bitmapB.length, 2L)))
  }

  test("deletion vectors apply per file; DV-free files bypass the join; time travel pre-DV") {
    import spark.implicits._
    val dir = tmpDir("delta-dv")
    buildDvTable(dir)
    val root = new Path(dir.toString)
    val cur = DeltaLite.read(spark, root)
    assert(cur.schema.fieldNames.toSeq == Seq("id", "name"))
    val ids = cur.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 2L, 4L, 6L, 7L, 8L, 9L, 12L, 13L, 14L, 15L, 16L, 17L, 18L, 19L,
      20L, 21L, 22L, 23L, 24L))
    // payload alignment survived the anti-join
    assert(cur.where($"id" === 7L).select("name").head.getString(0) == "row-7")
    // version 0 predates the vectors: every row visible
    assert(DeltaLite.read(spark, root, version = Some(0L)).count() == 25L)
    // snapshot carries exactly the two descriptors
    val snap = DeltaLite.snapshot(spark, root)
    assert(snap.dvs.keySet == Set("a.parquet", "b.parquet"))
  }

  test("a DV-clearing re-add restores the file's rows") {
    val dir = tmpDir("delta-dv-clear")
    buildDvTable(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    val sa = new java.io.File(dir, "a.parquet").length()
    // commit 2: rewrite A without a deletionVector (OPTIMIZE-style)
    LakeWrite.deltaCommit(conf, root, 2, Seq(
      LakeWrite.deltaCommitInfo(1700000200000L),
      LakeWrite.deltaAdd("a.parquet", sa, 1700000200000L, Map.empty)))
    val ids = DeltaLite.read(spark, root).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == ((0L until 10L) ++ (12L until 25L)))
  }

  test("unknown DV storage types reject with a clear error") {
    val dir = tmpDir("delta-dv-bad")
    buildDvTable(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    val sa = new java.io.File(dir, "a.parquet").length()
    LakeWrite.deltaCommit(conf, root, 2, Seq(
      LakeWrite.deltaCommitInfo(1700000200000L),
      LakeWrite.deltaAddDv("a.parquet", sa, 1700000200000L, Map.empty,
        "x", "whatever", None, 4, 1L)))
    val e = intercept[UnsupportedOperationException] {
      DeltaLite.read(spark, root).collect()
    }
    assert(e.getMessage.contains("storage type"))
  }

  test("incremental BitmapBuilder is byte-identical to the array encoder") {
    val rnd = new scala.util.Random(42)
    val cases: Seq[Seq[Long]] = Seq(
      Seq.empty[Long],
      Seq(0L),
      Seq(65535L, 65536L, 65537L), // container boundary
      (0xFFFFFFF0L to 0x10000000FL), // 32-bit bitmap boundary
      Seq.fill(6000)(rnd.nextInt(10000).toLong), // dense -> bitmap container, dups
      Seq.fill(3000)(math.abs(rnd.nextLong()) % (1L << 40)), // sparse, multi-bitmap
      (100000L until 101000L) ++ Seq.fill(500)(rnd.nextInt(70000).toLong))
    for (c <- cases) {
      val expected = RoaringDv.encodeBitmapArray(c)
      val bld = new RoaringDv.BitmapBuilder
      rnd.shuffle(c).foreach(bld.add) // order-insensitive
      assert(java.util.Arrays.equals(bld.result(), expected),
        s"builder bytes must match encodeBitmapArray for ${c.take(5)}...")
      assert(bld.cardinality == c.distinct.size.toLong)
      // split-and-merge (the shuffle-combine path) reaches the same bytes
      val (l, r) = rnd.shuffle(c).splitAt(c.size / 2)
      val a = new RoaringDv.BitmapBuilder; l.foreach(a.add)
      val b = new RoaringDv.BitmapBuilder; r.foreach(b.add)
      assert(java.util.Arrays.equals(a.merge(b).result(), expected))
      // and the streaming visitor replays exactly the distinct sorted set
      if (c.nonEmpty) {
        val seen = Seq.newBuilder[Long]
        RoaringDv.foreachPosition(expected)(seen += _)
        assert(seen.result() == c.distinct.sorted)
      }
    }
  }

  test("BitmapBuilder serializes sparse sets compactly and roundtrips through Java serialization") {
    def roundtrip(b: RoaringDv.BitmapBuilder): (RoaringDv.BitmapBuilder, Int) = {
      val baos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(baos); oos.writeObject(b); oos.close()
      val in = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(baos.toByteArray))
      (in.readObject().asInstanceOf[RoaringDv.BitmapBuilder], baos.size())
    }
    // worst case for a block-only design: ONE deleted row per distant
    // container — 1000 containers. Array-container state costs ~2 B/value;
    // the 8 KiB-block design paid 1000 × 8 KiB ≈ 8 MB here.
    val sparse = (0 until 1000).map(i => i.toLong << 16)
    val sb = new RoaringDv.BitmapBuilder; sparse.foreach(sb.add)
    val (sr, sparseBytes) = roundtrip(sb)
    assert(sparseBytes < 64 * 1024,
      s"sparse agg buffer must serialize container-array-sized, got $sparseBytes B")
    assert(java.util.Arrays.equals(sr.result(), RoaringDv.encodeBitmapArray(sparse)))
    assert(sr.cardinality == 1000L)
    // a dense (promoted) container roundtrips too, and a restored builder
    // keeps accepting adds and merges across the two states
    val dense = (0L until 5000L) // > 4096 in one container -> word block
    val db = new RoaringDv.BitmapBuilder; dense.foreach(db.add)
    val (dr, _) = roundtrip(db)
    dr.add(70000L) // new sparse container post-restore
    val m = dr.merge(sr)
    assert(java.util.Arrays.equals(m.result(),
      RoaringDv.encodeBitmapArray((dense ++ Seq(70000L) ++ sparse).distinct)))
  }
}
