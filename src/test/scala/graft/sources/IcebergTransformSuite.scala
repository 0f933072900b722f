package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._

import graft.SparkTestBase

import java.nio.file.Files
import java.time.LocalDate

/** Hidden-partition transform pruning: the manifest's TRANSFORMED
  * partition values (day/hour/month/year windows, truncate prefixes,
  * bucket numbers) prune data files at listing time against pushed
  * filters on the SOURCE column. The bucket hash is pinned to the Iceberg
  * spec's published test vectors (Appendix B) — a wrong hash would prune
  * wrong files, which is silent data loss.
  */
class IcebergTransformSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  test("bucket hash matches the Iceberg spec's Appendix B vectors") {
    import IcebergTransforms._
    assert(bucketHash(34, IntegerType) == Some(2017239379))
    assert(bucketHash(34L, LongType) == Some(2017239379))
    assert(bucketHash("iceberg", StringType) == Some(1210000089))
    assert(bucketHash(LocalDate.of(2017, 11, 16), DateType) == Some(-653330422))
    // timestamp 2017-11-16T22:31:08 UTC, micros from epoch
    val micros = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toInstant(java.time.ZoneOffset.UTC)
    assert(bucketHash(micros, TimestampType) == Some(-2047944441))
    // catalyst-internal representations hash identically
    assert(bucketHash(LocalDate.of(2017, 11, 16).toEpochDay.toInt, DateType) ==
      Some(-653330422))
    assert(bucketHash(micros.getEpochSecond * 1000000L, TimestampType) ==
      Some(-2047944441))
    assert(bucketHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("iceberg"), StringType) ==
      Some(1210000089))
    // cross-check the raw murmur3 against Scala's standard implementation
    val probe = Array.tabulate[Byte](13)(i => (i * 31 + 7).toByte)
    assert(murmur3(probe) == scala.util.hashing.MurmurHash3.bytesHash(probe, 0))
  }

  test("range-transform windows: day, hour, month, year, truncate") {
    import IcebergTransforms._
    // day 17486 = 2017-11-16
    assert(bounds("day", DateType, 17486) ==
      Some((LocalDate.of(2017, 11, 16), LocalDate.of(2017, 11, 16))))
    val (dLo, dHi) = bounds("day", TimestampType, 17486).get
    assert(dLo == LocalDate.of(2017, 11, 16).atStartOfDay.toInstant(java.time.ZoneOffset.UTC))
    assert(dHi == LocalDate.of(2017, 11, 17).atStartOfDay
      .toInstant(java.time.ZoneOffset.UTC).minusNanos(1000))
    // hour window
    val (hLo, hHi) = bounds("hour", TimestampType, 419675).get
    assert(hLo == java.time.Instant.ofEpochSecond(419675L * 3600))
    assert(hHi == java.time.Instant.ofEpochSecond(419676L * 3600).minusNanos(1000))
    // month 574 = 2017-11
    assert(bounds("month", DateType, 574) ==
      Some((LocalDate.of(2017, 11, 1), LocalDate.of(2017, 11, 30))))
    // year 47 = 2017
    assert(bounds("year", DateType, 47) ==
      Some((LocalDate.of(2017, 1, 1), LocalDate.of(2017, 12, 31))))
    // truncate on ints: [v, v + W - 1]
    assert(bounds("truncate[10]", IntegerType, 20) == Some((20, 29)))
    assert(bounds("truncate[100]", LongType, 300L) == Some((300L, 399L)))
    // truncate on strings: prefix window via last-char bump
    assert(bounds("truncate[3]", StringType, "abc") == Some(("abc", "abd")))
    // unknown transforms prove nothing
    assert(bounds("void", IntegerType, 1).isEmpty)
    assert(bounds("zorder", IntegerType, 1).isEmpty)
    // overflowing truncate windows drop the proof (a wrapped upper bound
    // would invert the window and wrongly prune)
    assert(bounds("truncate[10]", IntegerType, Int.MaxValue - 2).isEmpty)
    assert(bounds("truncate[10]", LongType, Long.MaxValue - 2L).isEmpty)
    assert(bounds("truncate[10]", IntegerType, Int.MaxValue - 9) ==
      Some((Int.MaxValue - 9, Int.MaxValue)))
  }

  test("garbage transform partition values degrade to unpruned, never misread") {
    import spark.implicits._
    val dir = tmpDir("ice-garbage")
    // the manifest stores a STRING where the day transform expects the day
    // ordinal: derivation must contribute nothing (file kept, rows exact)
    val groups = Seq(
      ("not-a-day": Any, Seq((1, java.sql.Date.valueOf("1995-01-01"), "a")).toDF("k", "d", "s")),
      (null: Any, Seq((2, java.sql.Date.valueOf("1995-01-02"), "b")).toDF("k", "d", "s")))
    val root = buildTable(dir,
      org.json4s.JObject("name" -> org.json4s.JString("d_day"),
        "transform" -> org.json4s.JString("day"),
        "source-id" -> org.json4s.JInt(2), "field-id" -> org.json4s.JInt(1000)),
      groups,
      """{"type":"record","name":"r102","fields":[
        |{"name":"d_day","type":["null","string"],"default":null,"field-id":1000}]}"""
        .stripMargin.replaceAll("\n", ""))
    val out = IcebergLite.read(spark, root)
      .where(col("d") === java.sql.Date.valueOf("1995-01-02"))
      .select("k").collect().map(_.getInt(0)).toSeq
    assert(out == Seq(2), "garbage transform values must not lose rows")
  }

  test("manifests from a NON-default spec generation never prune on transforms") {
    import spark.implicits._
    import LakeWrite.{IcebergSnapshot, ManifestEntry, ManifestFile}
    val dir = tmpDir("ice-specgen")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    new java.io.File(dir, "metadata").mkdirs()
    // pick a key whose bucket[2] and bucket[8] ordinals DIFFER, so pruning
    // the old manifest with the new spec's transform would provably drop it
    val key = (1 to 100).find(k =>
      IcebergTransforms.bucketValue(k, IntegerType, 2).get !=
        IcebergTransforms.bucketValue(k, IntegerType, 8).get).get
    val oldBucket = IcebergTransforms.bucketValue(key, IntegerType, 2).get
    val df = Seq((key, "five"), (key + 1, "six")).toDF("k", "s")
    val size = LakeWrite.writeOneParquetFile(df.coalesce(1), new Path(root, "data/old.parquet"))
    val entrySchema = LakeWrite.manifestEntrySchema(
      """{"type":"record","name":"r102","fields":[
        |{"name":"k_bucket","type":["null","int"],"default":null,"field-id":1000}]}"""
        .stripMargin.replaceAll("\n", ""))
    val mLen = LakeWrite.icebergWriteManifest(new java.io.File(dir, "metadata/m1.avro"),
      Seq(ManifestEntry(1, "data/old.parquet", 2, size, 9001L,
        partition = Map("k_bucket" -> oldBucket), sequenceNumber = Some(1L))), entrySchema)
    // the manifest-list entry says SPEC 0; the table's DEFAULT spec is 1
    // (bucket[8] under the same field name — Iceberg's names are
    // width-independent)
    LakeWrite.icebergWriteManifestListEntries(new java.io.File(dir, "metadata/ml1.avro"),
      Seq(ManifestFile("metadata/m1.avro", mLen, 0, 1L, specId = 0)), 9001L)
    val metaJson =
      s"""{"format-version":2,"table-uuid":"00000000-0000-0000-0000-0000000000aa",
         |"location":"${root.toString}","last-sequence-number":1,
         |"last-updated-ms":1700000000000,"last-column-id":2,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |  {"id":1,"name":"k","required":false,"type":"int"},
         |  {"id":2,"name":"s","required":false,"type":"string"}]}],
         |"current-schema-id":0,
         |"partition-specs":[
         |  {"spec-id":0,"fields":[{"name":"k_bucket","transform":"bucket[2]",
         |    "source-id":1,"field-id":1000}]},
         |  {"spec-id":1,"fields":[{"name":"k_bucket","transform":"bucket[8]",
         |    "source-id":1,"field-id":1000}]}],
         |"default-spec-id":1,
         |"last-partition-id":1000,
         |"sort-orders":[{"order-id":0,"fields":[]}],"default-sort-order-id":0,
         |"properties":{},
         |"current-snapshot-id":9001,
         |"snapshots":[{"snapshot-id":9001,"sequence-number":1,
         |  "timestamp-ms":1700000000000,"manifest-list":"metadata/ml1.avro",
         |  "summary":{"operation":"append"},"schema-id":0}],
         |"snapshot-log":[],"metadata-log":[],
         |"refs":{"main":{"snapshot-id":9001,"type":"branch"}}}""".stripMargin
    java.nio.file.Files.write(new java.io.File(dir, "metadata/v1.metadata.json").toPath,
      metaJson.getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(dir, "metadata/version-hint.text").toPath,
      "1".getBytes("UTF-8"))

    // bucket[8](key) != the stored bucket[2] ordinal: evaluating the old
    // manifest with the DEFAULT spec's transform would wrongly prune the
    // file — the spec-id gate must keep it, and the row must come back
    val out = IcebergLite.read(spark, root).where(col("k") === key)
      .select("s").collect().map(_.getString(0)).toSeq
    assert(out == Seq("five"),
      "old-spec manifest pruned with the new spec's transform (missing rows)")
  }

  /** A hand-built transform-partitioned table: schema (k, d, s), one data
    * file per distinct transform value, the spec declaring the transform.
    */
  private def buildTable(dir: java.io.File, specField: JObject,
      groups: Seq[(Any, org.apache.spark.sql.DataFrame)],
      partitionTypeJson: String): Path = {
    import LakeWrite.{IcebergSnapshot, ManifestEntry}
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    new java.io.File(dir, "metadata").mkdirs()
    val specName = (specField \ "name").asInstanceOf[JString].s
    val entrySchema = LakeWrite.manifestEntrySchema(partitionTypeJson)
    val entries = groups.zipWithIndex.map { case ((tv, df), i) =>
      val rel = s"data/g$i.parquet"
      val size = LakeWrite.writeOneParquetFile(df, new Path(root, rel))
      ManifestEntry(1, rel, df.count(), size, 9001L,
        partition = Map(specName -> tv), sequenceNumber = Some(1L))
    }
    val mLen = LakeWrite.icebergWriteManifest(
      new java.io.File(dir, "metadata/m1.avro"), entries, entrySchema)
    LakeWrite.icebergWriteManifestList(new java.io.File(dir, "metadata/ml1.avro"),
      Seq("metadata/m1.avro" -> mLen), 9001L, 1L)
    LakeWrite.icebergWriteMetadata(conf, root, 1, groups.head._2.schema,
      Seq(IcebergSnapshot(9001L, 1700000000000L, "metadata/ml1.avro", 1L)),
      currentSnapshotId = 9001L, refs = Map("main" -> (9001L, "branch")),
      specFields = Seq(specField))
    root
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
  }

  test("day-partitioned table prunes files on date filters, rows exact") {
    import spark.implicits._
    val dir = tmpDir("ice-day")
    val base = LocalDate.of(1995, 1, 1)
    val groups = (0 until 5).map { g =>
      val d = base.plusDays(g)
      (d.toEpochDay.toInt: Any,
        (0 until 4).map(i => (g * 10 + i, java.sql.Date.valueOf(d), s"r$g-$i"))
          .toDF("k", "d", "s"))
    }
    val root = buildTable(dir,
      JObject("name" -> JString("d_day"), "transform" -> JString("day"),
        "source-id" -> JInt(2), "field-id" -> JInt(1000)),
      groups,
      """{"type":"record","name":"r102","fields":[
        |{"name":"d_day","type":["null","int"],"default":null,"field-id":1000}]}"""
        .stripMargin.replaceAll("\n", ""))

    // unfiltered: everything
    assert(IcebergLite.read(spark, root).count() == 20)
    // equality on the source date: exactly one of five files scans
    val one = IcebergLite.read(spark, root)
      .where(col("d") === java.sql.Date.valueOf(base.plusDays(2)))
    assert(scannedFiles(one) == 1, "day transform must prune to the matching day file")
    assert(one.select("k").collect().map(_.getInt(0)).sorted.toSeq == Seq(20, 21, 22, 23))
    // a range filter keeps exactly the overlapping days
    val range = IcebergLite.read(spark, root)
      .where(col("d") >= java.sql.Date.valueOf(base.plusDays(3)))
    assert(scannedFiles(range) == 2)
    assert(range.count() == 8)
    // no filter on d: no pruning, still correct
    val byK = IcebergLite.read(spark, root).where(col("k") === 31)
    assert(byK.select("s").collect().map(_.getString(0)).toSeq == Seq("r3-1"))
  }

  test("bucket-partitioned table prunes on equality, rows exact") {
    import spark.implicits._
    val dir = tmpDir("ice-bucket")
    val rows = (0 until 40).map(k => (k, s"v$k"))
    val byBucket = rows.groupBy { case (k, _) =>
      IcebergTransforms.bucketValue(k, IntegerType, 4).get
    }.toSeq.sortBy(_._1)
    assert(byBucket.size == 4, s"expected all 4 buckets populated, got ${byBucket.size}")
    val groups = byBucket.map { case (b, rs) =>
      (b: Any, rs.toDF("k", "s"))
    }
    val root = buildTable(dir,
      JObject("name" -> JString("k_bucket"), "transform" -> JString("bucket[4]"),
        "source-id" -> JInt(1), "field-id" -> JInt(1000)),
      groups,
      """{"type":"record","name":"r102","fields":[
        |{"name":"k_bucket","type":["null","int"],"default":null,"field-id":1000}]}"""
        .stripMargin.replaceAll("\n", ""))

    assert(IcebergLite.read(spark, root).count() == 40)
    val one = IcebergLite.read(spark, root).where(col("k") === 17)
    assert(scannedFiles(one) == 1, "bucket transform must prune to the literal's bucket")
    assert(one.select("s").collect().map(_.getString(0)).toSeq == Seq("v17"))
    // IN list keeps the union of the named buckets (<= 2 files, exact rows)
    val in = IcebergLite.read(spark, root).where(col("k").isin(3, 29))
    assert(scannedFiles(in) <= 2)
    assert(in.select("k").collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 29))
    // range predicates cannot use buckets: all files scan, rows exact
    val range = IcebergLite.read(spark, root).where(col("k") > 35)
    assert(range.count() == 4)
  }

  test("string bucket and truncate prune together") {
    import spark.implicits._
    val dir = tmpDir("ice-trunc")
    val words = Seq("apple", "apricot", "banana", "blueberry", "cherry", "citrus")
    val groups = words.groupBy(_.substring(0, 2)).toSeq.sortBy(_._1).map {
      case (prefix, ws) => (prefix: Any, ws.map(w => (w, w.length)).toDF("w", "len"))
    }
    val root = buildTable(dir,
      JObject("name" -> JString("w_trunc"), "transform" -> JString("truncate[2]"),
        "source-id" -> JInt(1), "field-id" -> JInt(1000)),
      groups,
      """{"type":"record","name":"r102","fields":[
        |{"name":"w_trunc","type":["null","string"],"default":null,"field-id":1000}]}"""
        .stripMargin.replaceAll("\n", ""))
    val one = IcebergLite.read(spark, root).where(col("w") === "banana")
    assert(scannedFiles(one) == 1, "truncate prefix must prune to the matching file")
    assert(one.select("len").collect().map(_.getInt(0)).toSeq == Seq(6))
    val ge = IcebergLite.read(spark, root).where(col("w") >= "ch")
    assert(scannedFiles(ge) == 2) // "ch" and "ci" prefix files; a/b pruned
    assert(ge.select("w").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("cherry", "citrus"))
  }
}
