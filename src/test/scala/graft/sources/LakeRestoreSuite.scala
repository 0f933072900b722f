package graft.sources.lake

import org.apache.hadoop.fs.Path
import graft.SparkTestBase

/** RESTORE LAKE TABLE ... TO VERSION n: Delta rolls back through one
  * remove+re-add commit (deletion-vector state and metadata restored,
  * history intact), Iceberg through a metadata-only main-ref rollback.
  */
class LakeRestoreSuite extends SparkTestBase {

  private def tmpDir(p: String) = java.nio.file.Files.createTempDirectory(p).toFile

  test("delta: RESTORE undoes DML, history stays, writes continue") {
    val base = tmpDir("restore-d")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE rsd OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.rsd")
    val fqn = "graft.datasource.rsd.rsd.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 10 FROM range(6)") // v1
    spark.sql(s"DELETE FROM $fqn WHERE id < 2")                     // v2
    spark.sql(s"UPDATE $fqn SET v = 0 WHERE id = 5")                // v3
    assert(spark.table(fqn).count() == 4)

    val res = graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 1").head()
    assert(res.getLong(0) > 0, "restore must re-add files")
    val rows = spark.sql(s"SELECT id, v FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == (0 until 6).map(i => (i, i * 10)),
      s"restore must reproduce version 1 exactly: $rows")

    // history intact: the undone state is still time-travelable
    val dir = new Path(base.getPath, "t")
    assert(DeltaLite.read(spark, dir, version = Some(2L)).count() == 4)
    // the restore commit RECORDS its operation (shape alone would say
    // REWRITE); external writers' recorded operations are honored the
    // same way (delta-spark's DESCRIBE HISTORY contract)
    assert(DeltaLite.history(spark, dir).head._3 == "RESTORE")
    // and the table keeps accepting writes
    spark.sql(s"INSERT INTO $fqn VALUES (99, 990)")
    assert(spark.table(fqn).count() == 7)
    // restoring forward is refused
    val ex = intercept[Exception] {
      graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 99")
    }
    assert(ex.getMessage.contains("precede"), ex.getMessage)
  }

  test("delta: RESTORE rewinds deletion-vector state on unchanged files") {
    val base = tmpDir("restore-dv")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE rsv OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.rsv")
    val fqn = "graft.datasource.rsv.rsv.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) TBLPROPERTIES (" +
      "'delta.enableDeletionVectors' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(10)") // v1
    spark.sql(s"DELETE FROM $fqn WHERE id % 2 = 0")             // v2: DVs only
    assert(spark.table(fqn).count() == 5)
    graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 1")
    // same parquet files, but the DV mask is gone
    assert(spark.sql(s"SELECT id FROM $fqn ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == (0 until 10))
    // ... and restoring back to v2 re-applies the vectors
    graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 2")
    assert(spark.sql(s"SELECT id FROM $fqn ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 3, 5, 7, 9))
  }

  test("delta: RESTORE TO TIMESTAMP resolves the latest commit at-or-before") {
    val base = tmpDir("restore-dts")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE rst OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.rst")
    val fqn = "graft.datasource.rst.rst.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(4)") // v1
    Thread.sleep(20)
    val mid = System.currentTimeMillis()
    Thread.sleep(20)
    spark.sql(s"DELETE FROM $fqn WHERE id >= 2")               // v2
    assert(spark.table(fqn).count() == 2)
    // epoch-millis form between v1 and v2 -> v1 state
    graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO TIMESTAMP '$mid'")
    assert(spark.table(fqn).count() == 4)
    // restoring to 'now' is a no-op (already current)
    val res = graft.Graft.sql(spark,
      s"RESTORE LAKE TABLE $fqn TO TIMESTAMP '${System.currentTimeMillis()}'").head()
    assert(res.getLong(0) == 0L && res.getLong(1) == 0L)
    // a timestamp before the first commit is refused
    val ex = intercept[Exception] {
      graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO TIMESTAMP '1999-01-01 00:00:00'")
    }
    assert(ex.getMessage.contains("no Delta commit"), ex.getMessage)
  }

  test("delta: RESTORE refuses when the target's files were deleted") {
    val base = tmpDir("restore-gone")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE rsg OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.rsg")
    val fqn = "graft.datasource.rsg.rsg.t"
    spark.sql(s"CREATE TABLE $fqn (id INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id FROM range(3)")          // v1
    val dir = new Path(base.getPath, "t")
    val v1Files = DeltaLite.snapshot(spark, dir).fileIds
    spark.sql(s"INSERT OVERWRITE $fqn SELECT id + 10 FROM range(3)") // v2
    // simulate a vacuumed v1: physically delete its parquet
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    v1Files.foreach(f => fs.delete(new Path(dir, f), false))
    val ex = intercept[Exception] {
      graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 1")
    }
    assert(ex.getMessage.contains("no longer exist"), ex.getMessage)
    // nothing was committed: the table still reads its current state
    assert(spark.sql(s"SELECT min(id) FROM $fqn").head().getInt(0) == 10)
  }

  test("iceberg: rollback-to-timestamp + snapshot-log truncation") {
    val base = tmpDir("restore-its")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE rit OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.rit")
    val fqn = "graft.datasource.rit.rit.t"
    spark.sql(s"CREATE TABLE $fqn (id INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id FROM range(3)")      // snap A
    Thread.sleep(20)
    val mid = System.currentTimeMillis()
    Thread.sleep(20)
    spark.sql(s"INSERT INTO $fqn SELECT id + 10 FROM range(3)") // snap B
    assert(spark.table(fqn).count() == 6)
    graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO TIMESTAMP '$mid'")
    assert(spark.table(fqn).count() == 3)
    // Iceberg semantics: after the rollback, TIMESTAMP AS OF 'now'
    // resolves through the truncated+appended snapshot-log to the
    // RESTORED state — never to the undone snapshot B
    val dir = new Path(base.getPath, "t")
    val nowRead = IcebergLite.read(spark, dir,
      timestampMs = Some(System.currentTimeMillis() + 1000))
    assert(nowRead.count() == 3,
      "timestamp travel after rollback must reach the restored state")
    // snapshot B is still reachable BY ID (metadata-only rollback)
    assert(IcebergLite.snapshot(spark, dir).snapshotId != -1L)
  }

  test("iceberg: rollback re-points main, lineage and writes continue") {
    val base = tmpDir("restore-i")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE rsi OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.rsi")
    val fqn = "graft.datasource.rsi.rsi.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(3)") // snap A
    val dir = new Path(base.getPath, "t")
    val snapA = IcebergLite.snapshot(spark, dir).snapshotId
    spark.sql(s"INSERT INTO $fqn SELECT id + 10, id FROM range(3)") // snap B
    assert(spark.table(fqn).count() == 6)

    val res = graft.Graft.sql(spark,
      s"RESTORE LAKE TABLE $fqn TO VERSION $snapA").head()
    assert(res.getLong(1) > 0, "rollback must hide snapshot B's files")
    assert(spark.sql(s"SELECT id FROM $fqn ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    // metadata-only: snapshot B still exists for time travel
    assert(IcebergLite.read(spark, dir, version = Some("main")).count() == 3)
    // the next commit parents off the restored snapshot
    spark.sql(s"INSERT INTO $fqn VALUES (77, 77)")
    val lineage = IcebergLite.snapshotLineage(spark, dir)
    assert(lineage.exists(_._2 == snapA) && lineage.size == 2,
      s"post-rollback lineage must be [A, new], got $lineage")
    assert(spark.table(fqn).count() == 4)
    // unknown snapshot id is refused
    val ex = intercept[Exception] {
      graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 123456789")
    }
    assert(ex.getMessage.contains("not found"), ex.getMessage)
  }

  test("RESTORE TO TIMESTAMP accepts offset-carrying ISO forms, rejects ambiguous numerics") {
    val base = tmpDir("restore-tsf")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE rtf OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.rtf")
    val fqn = "graft.datasource.rtf.rtf.t"
    spark.sql(s"CREATE TABLE $fqn (id INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id FROM range(4)") // v1
    Thread.sleep(20)
    val mid = System.currentTimeMillis()
    Thread.sleep(20)
    spark.sql(s"DELETE FROM $fqn WHERE id >= 2")           // v2
    assert(spark.table(fqn).count() == 2)
    // 'Z'-suffixed ISO instant (UTC): LocalDateTime.parse alone would throw
    val isoZ = java.time.Instant.ofEpochMilli(mid).toString
    assert(isoZ.endsWith("Z"))
    graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO TIMESTAMP '$isoZ'")
    assert(spark.table(fqn).count() == 4)
    // explicit-offset form resolves through the offset, not a silent UTC read
    spark.sql(s"DELETE FROM $fqn WHERE id >= 2")
    val isoOff = java.time.OffsetDateTime
      .ofInstant(java.time.Instant.ofEpochMilli(mid), java.time.ZoneOffset.ofHours(2))
      .toString
    graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO TIMESTAMP '$isoOff'")
    assert(spark.table(fqn).count() == 4)
    // a 14-digit compact datetime must NOT silently parse as epoch millis
    // (20240501120000 ms ≈ year 2611) — it is rejected, never misread
    intercept[Exception] {
      graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO TIMESTAMP '20240501120000'")
    }
  }

  test("iceberg: rollback truncates the snapshot-log by POSITION, not timestamp") {
    val base = tmpDir("restore-ip")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE rip OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.rip")
    val fqn = "graft.datasource.rip.rip.t"
    spark.sql(s"CREATE TABLE $fqn (id INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id FROM range(3)")      // snap A
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(base.getPath, "t")
    val snapA = IcebergLite.snapshot(spark, dir).snapshotId
    spark.sql(s"INSERT INTO $fqn SELECT id + 10 FROM range(3)") // snap B
    val snapB = IcebergLite.snapshot(spark, dir).snapshotId
    // forge clock collision: B's snapshot-log entry shares A's millisecond
    val metaFile = IcebergLite.currentMetadataFile(conf, dir)
    val json = org.json4s.jackson.JsonMethods.parse(
      IcebergLite.readString(conf, metaFile))
    import org.json4s._
    val tsA = (json \ "snapshot-log") match {
      case JArray(entries) => entries.collectFirst {
        case e if (e \ "snapshot-id") == JInt(BigInt(snapA)) =>
          (e \ "timestamp-ms").asInstanceOf[JInt].num.toLong
      }.get
      case _ => fail("no snapshot-log")
    }
    val forged = json.transformField { case ("snapshot-log", JArray(entries)) =>
      "snapshot-log" -> JArray(entries.map {
        case e if (e \ "snapshot-id") == JInt(BigInt(snapB)) =>
          e.asInstanceOf[JObject].copy(obj = e.asInstanceOf[JObject].obj.map {
            case ("timestamp-ms", _) => "timestamp-ms" -> (JInt(BigInt(tsA)): JValue)
            case kv => kv
          })
        case e => e
      })
    }
    val fs = metaFile.getFileSystem(conf)
    val out = fs.create(metaFile, true)
    out.write(org.json4s.jackson.JsonMethods.compact(forged).getBytes("UTF-8"))
    out.close()
    // rollback to A: the same-millisecond B entry sits AFTER A in the log
    // and must drop by position — a timestamp-based truncation would keep
    // it and timestamp travel would resurrect the undone snapshot
    graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION $snapA")
    assert(spark.table(fqn).count() == 3)
    assert(IcebergLite.read(spark, dir, timestampMs = Some(tsA)).count() == 3,
      "TIMESTAMP AS OF must never resolve to the undone snapshot")
  }
}
