package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

import java.nio.file.Files

/** Corruption robustness for the native lake readers: a damaged log or
  * metadata file must FAIL the read (any exception) — never silently
  * return wrong rows — and damage to metadata the read does not touch
  * must not affect it.
  */
class LakeFuzzSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  /** Raw overwrite that also drops the local FS's checksum sidecar, so the
    * reader sees the corrupted CONTENT instead of a ChecksumException.
    */
  private def rawWrite(f: java.io.File, bytes: Array[Byte]): Unit = {
    java.nio.file.Files.write(f.toPath, bytes)
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete(): Unit
  }

  private def mkDelta(ns: String): (String, Path) = {
    val base = tmpDir(s"fuzz-$ns")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE $ns OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.$ns")
    val fqn = s"graft.datasource.$ns.$ns.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(6)")
    (fqn, new Path(base.getPath, "t"))
  }

  test("truncated or garbaged Delta commit JSON fails the replay, never misreads") {
    val (_, dir) = mkDelta("fz1")
    val log = new java.io.File(dir.toString, "_delta_log")
    val commit = log.listFiles().filter(_.getName.endsWith(".json")).maxBy(_.getName)
    val bytes = java.nio.file.Files.readAllBytes(commit.toPath)
    val good = DeltaLite.read(spark, dir).count()
    assert(good == 6L)
    // truncate mid-JSON
    rawWrite(commit, bytes.take(bytes.length / 2))
    assert(scala.util.Try(DeltaLite.read(spark, dir).count()).isFailure,
      "truncated commit must not replay")
    // non-JSON garbage
    rawWrite(commit, "this is not a delta action\n".getBytes)
    assert(scala.util.Try(DeltaLite.read(spark, dir).count()).isFailure)
    // restore: replay recovers byte-exactly
    rawWrite(commit, bytes)
    assert(DeltaLite.read(spark, dir).count() == good)
  }

  test("a missing referenced data file fails the scan; the feed too") {
    val (_, dir) = mkDelta("fz2")
    val dataFile = new java.io.File(dir.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(dataFile.toPath)
    assert(dataFile.delete())
    assert(scala.util.Try(DeltaLite.read(spark, dir).collect()).isFailure)
    assert(scala.util.Try(DeltaLite.changes(spark, dir, 0L).collect()).isFailure)
    rawWrite(dataFile, bytes)
    assert(DeltaLite.read(spark, dir).count() == 6L)
  }

  test("corrupted Iceberg metadata/manifest fails controlled; stale hint falls through") {
    val base = tmpDir("fuzz-ice")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE fzi OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.fzi")
    val fqn = "graft.datasource.fzi.fzi.t"
    spark.sql(s"CREATE TABLE $fqn (id INT)")
    spark.sql(s"INSERT INTO $fqn SELECT CAST(id AS INT) FROM range(4)")
    val dir = new Path(base.getPath, "t")
    assert(IcebergLite.read(spark, dir).count() == 4L)
    val metaDir = new java.io.File(dir.toString, "metadata")
    // corrupt the current metadata json
    val metaFile = metaDir.listFiles().filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName)
    val metaBytes = java.nio.file.Files.readAllBytes(metaFile.toPath)
    rawWrite(metaFile, "{broken".getBytes)
    assert(scala.util.Try(IcebergLite.read(spark, dir).count()).isFailure)
    rawWrite(metaFile, metaBytes)
    // corrupt a manifest avro: snapshot construction must fail, not skip
    val manifest = metaDir.listFiles().filter(_.getName.endsWith(".avro")).head
    val mBytes = java.nio.file.Files.readAllBytes(manifest.toPath)
    rawWrite(manifest, mBytes.take(8))
    assert(scala.util.Try(IcebergLite.read(spark, dir).count()).isFailure)
    rawWrite(manifest, mBytes)
    assert(IcebergLite.read(spark, dir).count() == 4L)
    // a version hint pointing at a missing version falls back to listing
    val hint = new java.io.File(metaDir, "version-hint.text")
    rawWrite(hint, "999999".getBytes)
    assert(IcebergLite.read(spark, dir).count() == 4L)
  }

  test("a cleaned log without a covering checkpoint is rejected, never a silent subset") {
    val (_, dir) = mkDelta("fz4")
    spark.sql(s"INSERT INTO graft.datasource.fz4.fz4.t VALUES (100, 100)")
    val log = new java.io.File(dir.toString, "_delta_log")
    // delete version 0 (protocol+metaData+create): replay base is gone
    val v0 = log.listFiles().filter(_.getName.endsWith(".json")).minBy(_.getName)
    assert(v0.delete())
    val ex = intercept[IllegalArgumentException] {
      DeltaLite.read(spark, dir).count()
    }
    assert(ex.getMessage.contains("incomplete"))
  }

  test("v2 (UUID-named) checkpoints read through their sidecars") {
    val (fqn, dir) = mkDelta("fz5")
    spark.sql(s"INSERT INTO $fqn VALUES (100, 100)") // v2
    val expected = DeltaLite.read(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    val snap = DeltaLite.snapshot(spark, dir)
    // hand-build a v2 checkpoint at the current version: the main file
    // holds protocol/metaData/sidecar rows, the sidecar parquet holds adds
    val logDir = new java.io.File(dir.toString, "_delta_log")
    val sidecarDir = new java.io.File(logDir, "_sidecars")
    sidecarDir.mkdirs()
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types.StructType
    val addSchema = StructType.fromDDL(
      """add STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, size: BIGINT,
        |  modificationTime: BIGINT, dataChange: BOOLEAN>""".stripMargin)
    val addRows = snap.fileIds.zip(snap.files).map { case (id, f) =>
      R(R(id, Map.empty[String, String], f.size, f.modificationTime, true))
    }
    val sidecarName = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee.parquet"
    LakeWrite.writeOneParquetFile(
      spark.createDataFrame(new java.util.ArrayList(java.util.Arrays.asList(addRows: _*)),
        addSchema).coalesce(1),
      new Path(sidecarDir.getPath, sidecarName))
    val mainSchema = StructType.fromDDL(
      """metaData STRUCT<id: STRING, schemaString: STRING,
        |  partitionColumns: ARRAY<STRING>, configuration: MAP<STRING, STRING>>,
        |protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT>,
        |sidecar STRUCT<path: STRING, sizeInBytes: BIGINT>""".stripMargin)
    val mainRows = Seq(
      R(R(snap.metaId, snap.schema.json, Seq.empty[String], Map.empty[String, String]), null, null),
      R(null, R(1, 2), null),
      R(null, null, R(sidecarName, 1L)))
    val uuid = "12345678-9abc-def0-1234-56789abcdef0"
    LakeWrite.writeOneParquetFile(
      spark.createDataFrame(new java.util.ArrayList(java.util.Arrays.asList(mainRows: _*)),
        mainSchema).coalesce(1),
      new Path(logDir.getPath, f"${snap.version}%020d.checkpoint.$uuid.parquet"))
    // clean every JSON at or before the checkpoint: replay must come from
    // the v2 main + sidecar alone
    logDir.listFiles().filter { f =>
      f.getName.endsWith(".json") &&
        f.getName.stripSuffix(".json").toLong <= snap.version
    }.foreach(f => assert(f.delete()))
    val replayed = DeltaLite.read(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(replayed == expected)
    // and the table keeps accepting commits on the tail
    spark.sql(s"INSERT INTO $fqn VALUES (200, 200)")
    assert(DeltaLite.read(spark, dir).count() == expected.size + 1L)
  }

  test("a v2 checkpoint whose sidecar vanished fails loudly, never a silent subset") {
    val (fqn, dir) = mkDelta("fz6")
    spark.sql(s"INSERT INTO $fqn VALUES (100, 100)")
    spark.sql(s"INSERT INTO $fqn VALUES (200, 200)")
    // v2 checkpoints are feature-gated: declare it first (what the
    // CHECKPOINT ... V2 command does), then checkpoint the upgraded version
    LakeNativeWrite.deltaEnsureV2CheckpointProtocol(spark, dir)
    val snap = DeltaLite.snapshot(spark, dir)
    DeltaLite.writeCheckpoint(spark, dir, v2 = true)
    val logDir = new java.io.File(dir.toString, "_delta_log")
    // clean the JSON tail so replay depends entirely on the v2 base
    logDir.listFiles().filter { f =>
      f.getName.endsWith(".json") &&
        f.getName.stripSuffix(".json").toLong <= snap.version
    }.foreach(f => assert(f.delete()))
    assert(DeltaLite.read(spark, dir).count() == 8L) // sanity: v2 replay works
    // delete the sidecar (keep the main manifest): a reader that shrugged
    // this off would replay protocol/metaData with ZERO files — an empty
    // table masquerading as truth. It must throw instead.
    val sidecars = new java.io.File(logDir, "_sidecars").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(sidecars.nonEmpty)
    sidecars.foreach { f =>
      val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
      if (crc.exists()) crc.delete()
      assert(f.delete())
    }
    val ex = intercept[Exception] { DeltaLite.read(spark, dir).collect() }
    val msg = String.valueOf(ex.getMessage).toLowerCase
    assert(msg.contains("sidecar") || msg.contains("not exist") ||
      msg.contains("path does not exist") || msg.contains("not found"),
      s"sidecar loss must surface as a missing-file failure, got: ${ex.getMessage}")
  }

  test("CDF checkpoint file corruption is rejected, not treated as version 0") {
    val (_, dir) = mkDelta("fz3")
    val base = new java.io.File(dir.toString).getParentFile
    val ckpt = new Path(base.getPath, "_consumer/progress.json")
    val consumer = new graft.streaming.CdfConsumer(dir, ckpt)
    assert(consumer.process(spark)((_, _, _) => ()))
    val f = new java.io.File(ckpt.toString)
    rawWrite(f, "{\"garbage\": true}".getBytes)
    val ex = intercept[IllegalStateException] {
      consumer.poll(spark)
    }
    assert(ex.getMessage.contains("unreadable"))
  }
}
