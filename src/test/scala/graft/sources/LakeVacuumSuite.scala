package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

import java.nio.file.Files

/** VACUUM LAKE TABLE: retention maintenance over the native lake tables.
  * Delta deletes files no retained version references while the log stays;
  * Iceberg expires unretained snapshots from metadata AND removes orphan
  * data/manifest files. Current content must be byte-identical across a
  * vacuum; retained history must still read; vacuumed history must not.
  */
class LakeVacuumSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  private def filesUnder(root: java.io.File, skip: String): Seq[java.io.File] = {
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten.flatMap { f =>
        if (f.isDirectory) { if (f.getName == skip) Nil else walk(f) }
        else if (f.getName.startsWith(".") || f.getName.startsWith("_")) Nil
        else Seq(f)
      }
    walk(root)
  }

  test("delta: vacuum deletes only unreferenced files; current content survives") {
    import spark.implicits._
    val root = tmpDir("vac-delta")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE vacd OPTIONS (path '$root') " +
      "NAMESPACE graft.datasource.vac")
    spark.sql("CREATE TABLE graft.datasource.vac.vacd.t (id BIGINT, v STRING)")
    (0 until 3).foreach { k =>
      (0L until 10L).map(i => (k * 100L + i, s"v$k-$i")).toDF("id", "v")
        .createOrReplaceTempView(s"__vac_src_$k")
      spark.sql(s"INSERT INTO graft.datasource.vac.vacd.t SELECT * FROM __vac_src_$k")
    }
    // an UPDATE leaves commit-3 with rewritten files; commits 1-2's
    // originals become history-only
    spark.sql("UPDATE graft.datasource.vac.vacd.t SET v = concat(v, '!') WHERE id < 5")
    val dir = new Path(s"$root/t")
    val before = spark.table("graft.datasource.vac.vacd.t")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val filesBefore = filesUnder(new java.io.File(s"$root/t"), "_delta_log").size

    val res = spark.sql(
      "VACUUM LAKE TABLE graft.datasource.vac.vacd.t RETAIN 1 VERSIONS").head()
    assert(res.getLong(0) > 0, "the UPDATE's superseded files should be deleted")
    val filesAfter = filesUnder(new java.io.File(s"$root/t"), "_delta_log").size
    assert(filesAfter < filesBefore)
    // current content identical
    val after = spark.table("graft.datasource.vac.vacd.t")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(after == before)
    // the live snapshot's file set is exactly what's on disk
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.files.size == filesAfter)
    // vacuumed time travel now fails at data-read time (log still replays)
    val v1 = DeltaLite.read(spark, dir, version = Some(1L))
    intercept[Exception] { v1.count() }
    // idempotent: nothing left to delete
    assert(spark.sql(
      "VACUUM LAKE TABLE graft.datasource.vac.vacd.t RETAIN 1 VERSIONS").head().getLong(0) == 0L)
  }

  test("delta + iceberg: RETAIN n HOURS keeps the in-window versions, 0 keeps only current") {
    import spark.implicits._
    val root = tmpDir("vac-hours")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE vach OPTIONS (path '$root') " +
      "NAMESPACE graft.datasource.vach")
    spark.sql("CREATE TABLE graft.datasource.vach.vach.t (id BIGINT)")
    spark.sql("INSERT INTO graft.datasource.vach.vach.t SELECT id FROM range(5)")
    spark.sql("INSERT OVERWRITE graft.datasource.vach.vach.t SELECT id + 10 FROM range(5)")
    val dir = new Path(s"$root/t")
    // everything committed seconds ago: a 1000-hour window deletes nothing
    assert(spark.sql(
      "VACUUM LAKE TABLE graft.datasource.vach.vach.t RETAIN 1000 HOURS").head().getLong(0) == 0L)
    assert(DeltaLite.read(spark, dir, version = Some(1L)).count() == 5L)
    // a 0-hour window keeps only the current version: v1's files go
    assert(spark.sql(
      "VACUUM LAKE TABLE graft.datasource.vach.vach.t RETAIN 0 HOURS").head().getLong(0) > 0L)
    assert(spark.table("graft.datasource.vach.vach.t").count() == 5L)
    intercept[Exception] {
      DeltaLite.read(spark, dir, version = Some(1L)).count()
    }

    // Iceberg: same surface through expire-by-age
    spark.sql(s"REGISTER OR REPLACE ICEBERG DATASOURCE vaci OPTIONS (warehouse '$root') " +
      "NAMESPACE graft.datasource.vach")
    spark.sql("CREATE TABLE graft.datasource.vach.vaci.ti (id BIGINT)")
    spark.sql("INSERT INTO graft.datasource.vach.vaci.ti SELECT id FROM range(4)")
    spark.sql("INSERT OVERWRITE graft.datasource.vach.vaci.ti SELECT id + 10 FROM range(4)")
    assert(spark.sql(
      "VACUUM LAKE TABLE graft.datasource.vach.vaci.ti RETAIN 1000 HOURS").head().getLong(0) == 0L)
    assert(spark.sql(
      "VACUUM LAKE TABLE graft.datasource.vach.vaci.ti RETAIN 0 HOURS").head().getLong(0) > 0L)
    assert(spark.table("graft.datasource.vach.vaci.ti").count() == 4L)
    val iceDir = new Path(s"$root/ti")
    assert(IcebergLite.snapshot(spark, iceDir).snapshotId >= 0)
  }

  test("delta: RETAIN window keeps history readable inside it") {
    import spark.implicits._
    val root = tmpDir("vac-delta-r")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE vacr OPTIONS (path '$root') " +
      "NAMESPACE graft.datasource.vac")
    spark.sql("CREATE TABLE graft.datasource.vac.vacr.t (id BIGINT)")
    Seq(1L).toDF("id").createOrReplaceTempView("__vacr_1")
    spark.sql("INSERT INTO graft.datasource.vac.vacr.t SELECT * FROM __vacr_1")
    spark.sql("INSERT OVERWRITE graft.datasource.vac.vacr.t SELECT id + 1 FROM __vacr_1")
    val dir = new Path(s"$root/t")
    // retain 2 versions (the overwrite + the insert): both must still read
    spark.sql("VACUUM LAKE TABLE graft.datasource.vac.vacr.t RETAIN 2 VERSIONS")
    assert(DeltaLite.read(spark, dir, version = Some(1L))
      .head().getLong(0) == 1L)
    assert(DeltaLite.read(spark, dir, version = Some(2L))
      .head().getLong(0) == 2L)
  }

  test("iceberg: expiry drops snapshots, orphan data files and old manifests") {
    import spark.implicits._
    val root = tmpDir("vac-ice")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE ICEBERG DATASOURCE vaci OPTIONS (warehouse '$root') " +
      "NAMESPACE graft.datasource.vac")
    spark.sql("CREATE TABLE graft.datasource.vac.vaci.t (id BIGINT, v STRING)")
    (0 until 3).foreach { k =>
      (0L until 10L).map(i => (k * 100L + i, s"v$k-$i")).toDF("id", "v")
        .createOrReplaceTempView(s"__vaci_src_$k")
      spark.sql(s"INSERT INTO graft.datasource.vac.vaci.t SELECT * FROM __vaci_src_$k")
    }
    // overwrite leaves snapshot 4 with one file; 1-3's data is history-only
    Seq((999L, "z")).toDF("id", "v").createOrReplaceTempView("__vaci_ow")
    spark.sql("INSERT OVERWRITE graft.datasource.vac.vaci.t SELECT * FROM __vaci_ow")
    val dir = new Path(s"$root/t")
    val snapsBefore = IcebergLite.snapshot(spark, dir)
    val preId = snapsBefore.snapshotId

    val res = spark.sql(
      "VACUUM LAKE TABLE graft.datasource.vac.vaci.t RETAIN 1 VERSIONS").head()
    assert(res.getLong(0) > 0, "overwritten data files + old manifests should go")
    // current content intact
    val rows = spark.table("graft.datasource.vac.vaci.t").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(999L))
    // snapshot list trimmed to the current one
    val after = IcebergLite.snapshot(spark, dir)
    assert(after.snapshotId == preId)
    // data dir holds only the live file(s)
    val dataFiles = filesUnder(new java.io.File(s"$root/t"), "metadata")
    assert(dataFiles.size == after.files.size,
      s"orphans left behind: ${dataFiles.map(_.getName)}")
    // expired snapshots are gone from metadata: travel to them fails
    intercept[Exception] {
      IcebergLite.snapshot(spark, dir, version = Some("1"))
    }
  }

  test("iceberg: retention window must include the current snapshot") {
    import spark.implicits._
    val root = tmpDir("vac-ice-g")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE ICEBERG DATASOURCE vacg OPTIONS (warehouse '$root') " +
      "NAMESPACE graft.datasource.vac")
    spark.sql("CREATE TABLE graft.datasource.vac.vacg.t (id BIGINT)")
    Seq(1L).toDF("id").createOrReplaceTempView("__vacg_1")
    spark.sql("INSERT INTO graft.datasource.vac.vacg.t SELECT * FROM __vacg_1")
    // retain 1 on a 1-snapshot table: nothing to delete, metadata advances
    val res = spark.sql(
      "VACUUM LAKE TABLE graft.datasource.vac.vacg.t RETAIN 1 VERSIONS").head()
    assert(res.getLong(0) == 0L)
    assert(spark.table("graft.datasource.vac.vacg.t").count() == 1)
  }

  test("delta: vacuum keeps _change_data files of retained versions (CDF stays readable)") {
    val base = java.nio.file.Files.createTempDirectory("vac-cdf").toFile
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE vcdf OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.vcdf")
    val fqn = "graft.datasource.vcdf.vcdf.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) TBLPROPERTIES (" +
      "'delta.enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(6)") // v1
    spark.sql(s"UPDATE $fqn SET v = v + 100 WHERE id < 2")     // v2: stages _change_data
    spark.sql(s"INSERT INTO $fqn VALUES (50, 50)")             // v3
    val dir = new org.apache.hadoop.fs.Path(base.getPath, "t")
    val feedBefore = DeltaLite.changes(spark, dir, 2L, Some(2L))
      .select("id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(feedBefore.nonEmpty)
    // retain every version: vacuum must delete NOTHING the feed needs —
    // _change_data files are reachable only via cdc actions, so a
    // data+DV-only referenced set would orphan-delete them
    spark.sql(s"VACUUM LAKE TABLE $fqn RETAIN 10 VERSIONS")
    val feedAfter = DeltaLite.changes(spark, dir, 2L, Some(2L))
      .select("id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(feedAfter == feedBefore,
      "vacuum deleted change files of a version inside the retention window")
  }

  test("vacuum spares an in-flight writer's freshly staged files (both formats)") {
    import spark.implicits._
    // Delta: a racing writer has staged data but not yet landed its commit
    // json — VACUUM must not eat the staged parquet out from under it
    val droot = tmpDir("vac-inflight-d")
    val ddir = new Path(s"$droot/t")
    LakeNativeWrite.deltaCreate(spark, ddir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Nil)
    LakeNativeWrite.deltaInsert(spark, ddir, Seq(1L, 2L).toDF("id"), overwrite = false)
    spark.sql(s"SELECT 1").collect() // settle
    Thread.sleep(30) // staged strictly after the last commit's timestamp
    val staged = new java.io.File(s"$ddir/part-00000-inflight-staged.parquet")
    java.nio.file.Files.write(staged.toPath, Array[Byte](80, 65, 82, 49))
    val (nd, _) = LakeNativeWrite.deltaVacuum(spark, ddir, 1)
    assert(staged.exists(),
      "files newer than the newest commit are in-flight staging, not garbage")
    assert(nd == 0L, "nothing else was unreferenced")
    assert(DeltaLite.read(spark, ddir).count() == 2)

    // Iceberg: staged UUID manifest + data parquet with no metadata
    // version published yet survive expire_snapshots + orphan cleanup
    val iroot = tmpDir("vac-inflight-i")
    val idir = new Path(s"$iroot/t")
    LakeNativeWrite.icebergCreate(spark, idir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Nil)
    LakeNativeWrite.icebergInsert(spark, idir, Seq(1L).toDF("id"), overwrite = false)
    LakeNativeWrite.icebergInsert(spark, idir, Seq(2L).toDF("id"), overwrite = false)
    Thread.sleep(30)
    val stagedData = new java.io.File(s"$idir/data/inflight-staged.parquet")
    stagedData.getParentFile.mkdirs()
    java.nio.file.Files.write(stagedData.toPath, Array[Byte](80, 65, 82, 49))
    val stagedManifest = new java.io.File(s"$idir/metadata/inflight-m0.avro")
    java.nio.file.Files.write(stagedManifest.toPath, Array[Byte](79, 98, 106, 1))
    LakeNativeWrite.icebergExpire(spark, idir, 1)
    assert(stagedData.exists(), "in-flight staged data must survive expiry")
    assert(stagedManifest.exists(), "in-flight staged manifests must survive expiry")
    assert(IcebergLite.read(spark, idir).count() == 2)
  }

  test("vacuum's in-flight guard uses the log's FS clock, not commitInfo timestamps") {
    import spark.implicits._
    // a remote writer's clock runs a day AHEAD: its commitInfo timestamp
    // must not push the guard past local 'now' and void the in-flight
    // protection for files staged on THIS filesystem
    val root = tmpDir("vac-skew")
    val dir = new Path(s"$root/t")
    LakeNativeWrite.deltaCreate(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Nil)
    LakeNativeWrite.deltaInsert(spark, dir, Seq(1L, 2L).toDF("id"), overwrite = false)
    val conf = spark.sparkContext.hadoopConfiguration
    // skewed winner: an empty-add commit whose commitInfo timestamp is +1 day
    val v = DeltaLite.latestVersion(spark, dir)
    LakeNativeWrite.commitDelta(conf, dir, v + 1, Seq(
      LakeWrite.deltaCommitInfo(System.currentTimeMillis() + 86400000L),
      LakeWrite.deltaAdd("skewed-writer.parquet", 4L, 4L, Map.empty)))
    new java.io.File(s"$dir/skewed-writer.parquet").createNewFile()
    Thread.sleep(30)
    // an in-flight local writer stages data AFTER the last commit landed
    val staged = new java.io.File(s"$dir/part-00000-skew-staged.parquet")
    java.nio.file.Files.write(staged.toPath, Array[Byte](80, 65, 82, 49))
    val (n, _) = LakeNativeWrite.deltaVacuum(spark, dir, 1)
    assert(staged.exists(),
      "a commitInfo clock a day ahead must not void the in-flight guard")
    assert(n == 0L)

    // Iceberg twin: snapshot timestamp-ms carries the remote writer's
    // clock — a day-ahead value must not void the staged-file guard either
    val iroot = tmpDir("vac-skew-i")
    val idir = new Path(s"$iroot/t")
    import spark.implicits._
    LakeNativeWrite.icebergCreate(spark, idir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))), Nil)
    LakeNativeWrite.icebergInsert(spark, idir, Seq(1L).toDF("id"), overwrite = false)
    LakeNativeWrite.icebergInsert(spark, idir, Seq(2L).toDF("id"), overwrite = false)
    val metaFile = IcebergLite.currentMetadataFile(conf, idir)
    val metaLocal = new java.io.File(metaFile.toString.stripPrefix("file:")).toPath
    val txt = new String(java.nio.file.Files.readAllBytes(metaLocal), "UTF-8")
    val future = System.currentTimeMillis() + 86400000L
    java.nio.file.Files.write(metaLocal,
      txt.replaceAll("\"timestamp-ms\"\\s*:\\s*\\d+", s""""timestamp-ms" : $future""")
        .getBytes("UTF-8"))
    Thread.sleep(30)
    val istaged = new java.io.File(s"$idir/data/skew-staged.parquet")
    java.nio.file.Files.write(istaged.toPath, Array[Byte](80, 65, 82, 49))
    LakeNativeWrite.icebergExpire(spark, idir, 1)
    assert(istaged.exists(),
      "a snapshot timestamp a day ahead must not void the in-flight guard")
  }
}
