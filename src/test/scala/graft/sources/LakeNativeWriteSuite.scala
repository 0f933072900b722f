package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

import java.nio.file.Files

/** Native lake WRITES: CREATE TABLE / INSERT [OVERWRITE] for Delta and
  * Iceberg through the graft SQL surface with no runtime jars — the write
  * half of the lake-lite readers. Covers append/overwrite state, version
  * travel across writes, partition handling (values in the log / manifest,
  * pruning on read-back), schema alignment, commit-collision retry, and
  * the create-twice / bad-partition rejects.
  */
class LakeNativeWriteSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  test("delta: create partitioned, insert, append, overwrite, time travel") {
    import spark.implicits._
    val root = tmpDir("dw")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE dwr OPTIONS (path '$root') " +
      "NAMESPACE graft.datasource.lw")
    locally {
      spark.sql("CREATE TABLE graft.datasource.lw.dwr.t1 (id BIGINT, name STRING, p INT) " +
        "PARTITIONED BY (p)")
      // freshly created: readable and empty
      assert(spark.table("graft.datasource.lw.dwr.t1").count() == 0)

      Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 1)).toDF("id", "name", "p")
        .createOrReplaceTempView("src1")
      spark.sql("INSERT INTO graft.datasource.lw.dwr.t1 SELECT * FROM src1")
      val t = spark.table("graft.datasource.lw.dwr.t1")
      assert(t.schema.fieldNames.toSeq == Seq("id", "name", "p"))
      assert(t.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
        Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 1)))

      // append
      Seq((4L, "d", 0)).toDF("id", "name", "p").createOrReplaceTempView("src2")
      spark.sql("INSERT INTO graft.datasource.lw.dwr.t1 SELECT * FROM src2")
      assert(spark.table("graft.datasource.lw.dwr.t1").count() == 4)

      // overwrite
      Seq((9L, "z", 2)).toDF("id", "name", "p").createOrReplaceTempView("src3")
      spark.sql("INSERT OVERWRITE graft.datasource.lw.dwr.t1 SELECT * FROM src3")
      val after = spark.table("graft.datasource.lw.dwr.t1")
      assert(after.collect().map(_.getLong(0)).toSeq == Seq(9L))

      // the log replays historically: version 2 (post-append) had 4 rows
      val dir = new Path(s"$root/t1")
      assert(DeltaLite.read(spark, dir, version = Some(2L)).count() == 4)
      // partition values rode the log, not the files: pruning still fires
      val pr = DeltaLite.read(spark, dir, version = Some(2L)).where(col("p") === 1)
      assert(pr.count() == 2)
      val scans = pr.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
      assert(scans.head.metrics("numFiles").value <= 2,
        s"partition pruning lost on written table: ${scans.head.metrics("numFiles").value} files")
    }
  }

  test("delta: commit collision advances to the next version (bounded retry)") {
    import spark.implicits._
    val root = tmpDir("dw-race")
    val dir = new Path(s"$root/t")
    LakeNativeWrite.deltaCreate(spark, dir,
      StructType(Seq(StructField("id", LongType))), Nil)
    // a "concurrent writer" grabs version 1
    LakeWrite.deltaCommit(spark.sparkContext.hadoopConfiguration, dir, 1,
      Seq(LakeWrite.deltaCommitInfo(1L)))
    LakeNativeWrite.deltaInsert(spark, dir, Seq(5L).toDF("id"), overwrite = false)
    // our insert must land at version 2, not clobber 1
    assert(new java.io.File(s"$root/t/_delta_log/00000000000000000002.json").exists())
    assert(DeltaLite.read(spark, dir).count() == 1)
  }

  test("iceberg: create partitioned, insert, append, overwrite, travel, pruning") {
    import spark.implicits._
    val root = tmpDir("iw")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE ICEBERG DATASOURCE iwr OPTIONS (warehouse '$root') " +
      "NAMESPACE graft.datasource.lw")
    locally {
      spark.sql("CREATE TABLE graft.datasource.lw.iwr.t1 (id BIGINT, name STRING, p INT) " +
        "PARTITIONED BY (p)")
      assert(spark.table("graft.datasource.lw.iwr.t1").count() == 0)

      Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 1)).toDF("id", "name", "p")
        .createOrReplaceTempView("isrc1")
      spark.sql("INSERT INTO graft.datasource.lw.iwr.t1 SELECT * FROM isrc1")
      val t = spark.table("graft.datasource.lw.iwr.t1")
      assert(t.schema.fieldNames.toSeq == Seq("id", "name", "p"))
      assert(t.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
        Seq((1L, "a", 0), (2L, "b", 1), (3L, "c", 1)))

      Seq((4L, "d", 0)).toDF("id", "name", "p").createOrReplaceTempView("isrc2")
      spark.sql("INSERT INTO graft.datasource.lw.iwr.t1 SELECT * FROM isrc2")
      assert(spark.table("graft.datasource.lw.iwr.t1").count() == 4)

      // identity pruning on the table we just wrote (values served from the
      // manifest partition struct — the data files lack the p column);
      // asserted on the direct relation (the catalog route wraps the scan
      // in a V1 splice whose plan hides the file scan node)
      val dir = new Path(s"$root/t1")
      assert(spark.table("graft.datasource.lw.iwr.t1").where(col("p") === 1).count() == 2)
      val pr = IcebergLite.read(spark, dir).where(col("p") === 1)
      assert(pr.count() == 2)
      val scans = pr.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
      assert(scans.head.metrics("numFiles").value <= 2,
        s"identity pruning lost: ${scans.head.metrics("numFiles").value} files")

      // snapshot travel across our own appends
      val firstSnap = {
        val conf = spark.sparkContext.hadoopConfiguration
        val meta = org.json4s.jackson.JsonMethods.parse(
          IcebergLite.readString(conf, IcebergLite.currentMetadataFile(conf, dir)))
        (meta \ "snapshots") match {
          case org.json4s.JArray(ss) => (ss.head \ "snapshot-id").values.toString.toLong
          case _ => fail("no snapshots")
        }
      }
      assert(IcebergLite.read(spark, dir, version = Some(firstSnap.toString)).count() == 3)

      Seq((9L, "z", 2)).toDF("id", "name", "p").createOrReplaceTempView("isrc3")
      spark.sql("INSERT OVERWRITE graft.datasource.lw.iwr.t1 SELECT * FROM isrc3")
      assert(spark.table("graft.datasource.lw.iwr.t1").collect().map(_.getLong(0)).toSeq == Seq(9L))
    }
  }

  test("iceberg CTAS through the catalog") {
    val root = tmpDir("iw-ctas")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE ICEBERG DATASOURCE ictas OPTIONS (warehouse '$root') " +
      "NAMESPACE graft.datasource.lw")
    locally {
      spark.sql("CREATE TABLE graft.datasource.lw.ictas.nums AS " +
        "SELECT id, id * 2 AS twice FROM range(10)")
      val t = spark.table("graft.datasource.lw.ictas.nums")
      assert(t.count() == 10)
      assert(t.where(col("id") === 3).head.getLong(1) == 6L)
    }
  }

  test("write rejects: duplicate create, unknown insert columns, non-identity partitions") {
    import spark.implicits._
    val root = tmpDir("dw-rej")
    val dir = new Path(s"$root/t")
    LakeNativeWrite.deltaCreate(spark, dir,
      StructType(Seq(StructField("id", LongType))), Nil)
    val e1 = intercept[IllegalArgumentException] {
      LakeNativeWrite.deltaCreate(spark, dir, StructType(Seq(StructField("id", LongType))), Nil)
    }
    assert(e1.getMessage.contains("already exists"))
    val e2 = intercept[IllegalArgumentException] {
      LakeNativeWrite.deltaInsert(spark, dir, Seq((1L, "x")).toDF("other", "cols"), overwrite = false)
    }
    assert(e2.getMessage.contains("missing columns"))
    val e3 = intercept[IllegalArgumentException] {
      LakeNativeWrite.icebergCreate(spark, new Path(s"$root/t2"),
        StructType(Seq(StructField("id", LongType), StructField("d", DecimalType(10, 2)))), Seq("d"))
    }
    assert(e3.getMessage.contains("identity partition column"))
  }

  test("delta: version-checksum sidecars written per commit; a mismatch fails replay loudly") {
    import spark.implicits._
    val dir = new Path(s"${tmpDir("dcrc")}/t")
    LakeNativeWrite.deltaCreate(spark, dir,
      StructType(Seq(StructField("id", LongType))), Nil)
    LakeNativeWrite.deltaInsert(spark, dir, (0L until 5L).toDF("id"), overwrite = false)
    LakeNativeWrite.deltaInsert(spark, dir, (5L until 8L).toDF("id"), overwrite = false)
    val log = new java.io.File(dir.toString, "_delta_log")
    val crcs = log.listFiles().filter(_.getName.endsWith(".crc"))
      .map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq
    assert(crcs == Seq("00000000000000000000.crc", "00000000000000000001.crc",
      "00000000000000000002.crc"), s"one sidecar per commit, got $crcs")
    // the recorded state matches the replay (file count + total bytes)
    val snap = DeltaLite.snapshot(spark, dir)
    val recorded = scala.io.Source.fromFile(new java.io.File(log, crcs.last)).mkString
    assert(recorded.contains(s""""numFiles":${snap.files.size}"""), recorded)
    assert(recorded.contains(s""""tableSizeBytes":${snap.files.map(_.size).sum}"""), recorded)
    // corrupt the latest sidecar: replay must fail loudly, not serve a
    // state that disagrees with what the committer recorded
    val target = new java.io.File(log, crcs.last)
    new java.io.File(log, "." + crcs.last + ".crc").delete() // hadoop checksum shadow
    java.nio.file.Files.write(target.toPath,
      """{"tableSizeBytes":1,"numFiles":999,"numMetadata":1,"numProtocol":1}""".getBytes)
    val e = intercept[IllegalStateException] { DeltaLite.snapshot(spark, dir) }
    assert(e.getMessage.contains("checksum mismatch"), e.getMessage)
    // time travel to a version whose sidecar is intact still works
    assert(DeltaLite.snapshot(spark, dir, Some(1L)).files.nonEmpty)
  }

  test("delta: incremental crc state equals a full replay across overwrite and restore") {
    import spark.implicits._
    // r13: commits compute their crc from the pre-commit snapshot + own
    // actions (O(actions)) instead of a fresh O(versions) log replay; this
    // drives the remove-heavy shapes (overwrite drops every live file,
    // restore re-adds files from history) and asserts each version's
    // sidecar agrees with what a replay reconstructs — replay itself
    // validates loudly, so a drifted sidecar would also fail the snapshot
    val dir = new Path(s"${tmpDir("dcrcinc")}/t")
    LakeNativeWrite.deltaCreate(spark, dir,
      StructType(Seq(StructField("id", LongType))), Nil)
    LakeNativeWrite.deltaInsert(spark, dir, (0L until 10L).toDF("id"), overwrite = false)
    LakeNativeWrite.deltaInsert(spark, dir, (10L until 14L).toDF("id"), overwrite = false)
    LakeNativeWrite.deltaInsert(spark, dir, (20L until 23L).toDF("id"), overwrite = true)
    LakeNativeWrite.deltaInsert(spark, dir, (30L until 34L).toDF("id"), overwrite = false)
    LakeNativeWrite.deltaRestore(spark, dir, 2L)
    val log = new java.io.File(dir.toString, "_delta_log")
    val versions = log.listFiles().map(_.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(_.stripSuffix(".json").toLong).sorted.toSeq
    assert(versions.size == 6, s"expected 6 commits, got $versions")
    versions.foreach { v =>
      val s = DeltaLite.snapshot(spark, dir, Some(v))
      val crcFile = new java.io.File(log, f"$v%020d.crc")
      assert(crcFile.exists, s"crc sidecar missing for version $v")
      val rec = scala.io.Source.fromFile(crcFile).mkString
      assert(rec.contains(s""""numFiles":${s.files.size}""") &&
        rec.contains(s""""tableSizeBytes":${s.files.map(_.size).sum}"""),
        s"v$v sidecar=$rec vs replay numFiles=${s.files.size} " +
          s"tableSizeBytes=${s.files.map(_.size).sum}")
    }
    // post-restore content is the restored version's
    assert(DeltaLite.read(spark, dir).as[Long].collect().sorted.toSeq
      == (0L until 14L))
  }
}
