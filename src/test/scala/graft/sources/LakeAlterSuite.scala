package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

import java.nio.file.Files

/** ALTER TABLE over the native lake tables: Delta ADD COLUMNS /
  * SET-UNSET TBLPROPERTIES / RENAME COLUMN under column mapping, Iceberg
  * ADD COLUMNS, and the rejections that protect the lite readers'
  * resolution contracts.
  */
class LakeAlterSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  test("delta ADD COLUMNS: old rows null-fill, new writes carry the column") {
    val base = tmpDir("alter-delta")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE altd OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.altd")
    val fqn = "graft.datasource.altd.altd.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 10)")
    spark.sql(s"ALTER TABLE $fqn ADD COLUMNS (tag STRING)")
    spark.sql(s"INSERT INTO $fqn VALUES (2, 20, 'x')")
    val rows = spark.sql(s"SELECT id, v, tag FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2)))).toSeq
    assert(rows == Seq((1, 10, None), (2, 20, Some("x"))))
    // old files still read: the pre-alter row survives with a null tag
    val snap = DeltaLite.snapshot(spark, new Path(base.getPath, "t"))
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "tag"))
  }

  test("delta SET TBLPROPERTIES turns on CDF for subsequent DML") {
    val base = tmpDir("alter-cdf")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE altc OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.altc")
    val fqn = "graft.datasource.altc.altc.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(4)")       // v1
    spark.sql(s"ALTER TABLE $fqn SET TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')") // v2
    spark.sql(s"UPDATE $fqn SET v = 99 WHERE id = 1")                // v3: must write cdc now
    val dir = new Path(base.getPath, "t")
    assert(DeltaLite.snapshot(spark, dir).cdfEnabled)
    val feed = DeltaLite.changes(spark, dir, 3L, Some(3L))
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(feed == Seq((1, 1, "update_preimage"), (1, 99, "update_postimage")))
    // UNSET flips it back off: the next DML commits without cdc (and the
    // feed read rejects the rewrite, proving nothing was silently staged)
    spark.sql(s"ALTER TABLE $fqn UNSET TBLPROPERTIES ('delta.enableChangeDataFeed')") // v4
    spark.sql(s"DELETE FROM $fqn WHERE id = 2")                      // v5
    assert(!DeltaLite.snapshot(spark, dir).cdfEnabled)
    val ex = intercept[IllegalArgumentException] {
      DeltaLite.changes(spark, dir, 5L, Some(5L)).collect()
    }
    assert(ex.getMessage.contains("without cdc actions"))
  }

  test("delta RENAME COLUMN works under column mapping and is rejected without it") {
    val base = tmpDir("alter-ren")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE altr OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.altr")
    val plain = "graft.datasource.altr.altr.plain"
    spark.sql(s"CREATE TABLE $plain (id INT, v INT)")
    val ex = intercept[Exception] {
      spark.sql(s"ALTER TABLE $plain RENAME COLUMN v TO w")
    }
    assert(ex.getMessage.contains("columnMapping"))

    val mapped = "graft.datasource.altr.altr.mapped"
    spark.sql(s"CREATE TABLE $mapped (id INT, v INT) " +
      "TBLPROPERTIES ('delta.columnMapping.mode' = 'name')")
    spark.sql(s"INSERT INTO $mapped VALUES (1, 10)")
    spark.sql(s"ALTER TABLE $mapped RENAME COLUMN v TO amount")
    // pre-rename data reads back under the NEW logical name (physical name
    // pinned to the old spelling inside the field metadata)
    val rows = spark.sql(s"SELECT id, amount FROM $mapped").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((1, 10)))
    spark.sql(s"INSERT INTO $mapped VALUES (2, 20)")
    assert(spark.sql(s"SELECT sum(amount) FROM $mapped").head().getLong(0) == 30L)
    val snap = DeltaLite.snapshot(spark, new Path(base.getPath, "mapped"))
    assert(snap.schema.fieldNames.toSeq == Seq("id", "amount"))
    assert(snap.physSchema.get.fieldNames.toSeq == Seq("id", "v"))
  }

  test("SHOW LAKE HISTORY reads both formats' timelines") {
    val base = tmpDir("alter-hist")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE alth OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.alth")
    val fqn = "graft.datasource.alth.alth.t"
    spark.sql(s"CREATE TABLE $fqn (id INT)")
    spark.sql(s"INSERT INTO $fqn VALUES (1)")
    spark.sql(s"DELETE FROM $fqn WHERE id = 1")
    val hist = graft.Graft.sql(spark, s"SHOW LAKE HISTORY $fqn")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(hist.map(_._1) == Seq(2L, 1L, 0L)) // newest first
    // the DELETE statement RECORDS its operation (r9); shape alone would
    // have said REWRITE for a copy-on-write delete with survivors
    assert(hist.map(_._2) == Seq("DELETE", "WRITE", "CREATE TABLE"))

    val ibase = tmpDir("alter-hist-ice")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE althi OPTIONS (warehouse '${ibase.getPath}') NAMESPACE graft.datasource.althi")
    val ifqn = "graft.datasource.althi.althi.t"
    spark.sql(s"CREATE TABLE $ifqn (id INT)")
    spark.sql(s"INSERT INTO $ifqn VALUES (1)")
    spark.sql(s"INSERT INTO $ifqn VALUES (2)")
    val ihist = graft.Graft.sql(spark, s"SHOW LAKE HISTORY $ifqn")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getString(3))).toSeq
    assert(ihist.map(_._1) == Seq(2L, 1L)) // sequence numbers, newest first
    assert(ihist.forall(_._2.nonEmpty)) // snapshot ids present
    assert(ihist.forall(_._3 == "append"))
  }

  test("CONVERT TO DELTA in place: data files untouched, DML works after, double-convert rejected") {
    import spark.implicits._
    val base = tmpDir("convert-suite")
    val td = new java.io.File(base, "t")
    (0 until 10).map(i => (i, i * 2)).toDF("id", "v")
      .write.parquet(td.getPath)
    val before = Option(td.listFiles()).get.filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).sorted.toSeq
    val n = graft.Graft.sql(spark, s"CONVERT TO DELTA '${td.getPath}'")
      .head().getLong(0)
    assert(n == before.size)
    // the exact same files, untouched
    val after = td.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).sorted.toSeq
    assert(after == before)
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE conv OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.convsuite")
    val fqn = "graft.datasource.convsuite.conv.t"
    assert(spark.sql(s"SELECT sum(v) FROM $fqn").head().getLong(0) == 90L)
    // the converted table is a full citizen: row-level DML works on it
    spark.sql(s"DELETE FROM $fqn WHERE id < 5")
    assert(spark.sql(s"SELECT count(*) FROM $fqn").head().getLong(0) == 5L)
    val hist = graft.Graft.sql(spark, s"SHOW LAKE HISTORY $fqn")
      .collect().map(_.getString(3)).toSeq
    assert(hist == Seq("DELETE", "CONVERT"))
    val ex = intercept[Exception] {
      graft.Graft.sql(spark, s"CONVERT TO DELTA '${td.getPath}'").collect()
    }
    assert(ex.getMessage.contains("already"))
  }

  test("CHECKPOINT LAKE TABLE: replay survives JSON-tail removal, txn marks carry over") {
    import spark.implicits._
    val base = tmpDir("ckpt-suite")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE ckpt OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.ckptsuite")
    val fqn = "graft.datasource.ckptsuite.ckpt.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) " +
      "TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(8)")
    spark.sql(s"UPDATE $fqn SET v = 99 WHERE id = 1") // exercises DV-free rewrite + cdc
    val dir = new Path(base.getPath, "t")
    // a streaming txn marker that must survive into the checkpoint
    val sink = new DeltaStreamSink(spark, dir, Map("txnAppId" -> "ckpt-app"),
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(7L, Seq((100, 100)).toDF("id", "v"))
    val expected = spark.sql(s"SELECT id, v FROM $fqn").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq

    val res = graft.Graft.sql(spark, s"CHECKPOINT LAKE TABLE $fqn").head()
    val ckptVersion = res.getLong(0)
    assert(res.getLong(1) >= expected.size / 8) // state rows exist
    // remove every JSON commit at or before the checkpoint: current-version
    // replay must come entirely from the checkpoint parquet
    val log = new java.io.File(dir.toString, "_delta_log")
    log.listFiles().filter { f =>
      f.getName.endsWith(".json") &&
        f.getName.stripSuffix(".json").toLong <= ckptVersion
    }.foreach(f => assert(f.delete()))
    val replayed = DeltaLite.read(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(replayed == expected)
    // configuration (CDF flag), schema, and txn marks all survive
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.cdfEnabled && snap.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(DeltaLite.lastTxnVersion(spark, dir, "ckpt-app").contains(7L))
    // and the table keeps working: a new commit lands on the tail
    spark.sql(s"INSERT INTO $fqn VALUES (200, 200)")
    assert(DeltaLite.read(spark, dir).count() == expected.size + 1L)
  }

  test("CHECKPOINT V2: UUID manifest + sidecar replays with protocol/txn intact") {
    import spark.implicits._
    val base = tmpDir("ckpt-v2")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE ck2 OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.ckpt2")
    val fqn = "graft.datasource.ckpt2.ck2.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) " +
      "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true', " +
      "'delta.enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(10)")
    spark.sql(s"DELETE FROM $fqn WHERE id % 2 = 0") // live DV must survive replay
    val dir = new Path(base.getPath, "t")
    val sink = new DeltaStreamSink(spark, dir, Map("txnAppId" -> "ck2-app"),
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(3L, Seq((100, 100)).toDF("id", "v"))
    val expected = spark.sql(s"SELECT id, v FROM $fqn").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq

    val res = graft.Graft.sql(spark, s"CHECKPOINT LAKE TABLE $fqn V2").head()
    val ckptVersion = res.getLong(0)
    // the v2 form: a UUID-named manifest + a _sidecars parquet, NO classic
    val log = new java.io.File(dir.toString, "_delta_log")
    val names = log.listFiles().map(_.getName)
    assert(names.exists(_.matches("\\d{20}\\.checkpoint\\.[0-9a-f-]{36}\\.parquet")),
      s"expected a UUID-named v2 manifest, got ${names.toSeq}")
    assert(!names.exists(_.matches("\\d{20}\\.checkpoint\\.parquet")),
      "V2 must not also write a classic checkpoint")
    assert(new java.io.File(log, "_sidecars").listFiles().exists(_.getName.endsWith(".parquet")))
    // delete the whole JSON tail: replay must come from the v2 checkpoint
    log.listFiles().filter { f =>
      f.getName.endsWith(".json") &&
        f.getName.stripSuffix(".json").toLong <= ckptVersion
    }.foreach(f => assert(f.delete()))
    val replayed = DeltaLite.read(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(replayed == expected, "v2 replay must reproduce the state incl. DVs")
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.cdfEnabled && snap.dvs.nonEmpty,
      "configuration and deletion-vector state must survive the v2 base")
    assert(snap.protocol.writerFeatures.contains("deletionVectors"),
      s"protocol features must survive: ${snap.protocol}")
    assert(DeltaLite.lastTxnVersion(spark, dir, "ck2-app").contains(3L))
    // the table keeps accepting writes past the v2 base
    spark.sql(s"INSERT INTO $fqn VALUES (200, 200)")
    assert(DeltaLite.read(spark, dir).count() == expected.size + 1L)
  }

  test("deletion-vector DELETE: no file rewrites, vectors merge, CDF rides, OPTIMIZE purges") {
    val base = tmpDir("dv-dml")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE dvw OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.dvdml")
    val fqn = "graft.datasource.dvdml.dvw.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) TBLPROPERTIES (" +
      "'delta.enableDeletionVectors' = 'true', 'delta.enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 10 FROM range(10)")
    val dir = new Path(base.getPath, "t")
    val td = new java.io.File(dir.toString)
    def dataFiles() = td.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).sorted.toSeq
    val before = dataFiles()

    spark.sql(s"DELETE FROM $fqn WHERE id < 3")                       // v2: DV commit
    assert(dataFiles() == before, "a DV delete must not touch data files")
    assert(spark.sql(s"SELECT count(*) FROM $fqn").head().getLong(0) == 7L)
    assert(td.listFiles().exists(_.getName.startsWith("deletion_vector_")))
    // second delete overlaps the same files: vectors must MERGE
    spark.sql(s"DELETE FROM $fqn WHERE id % 2 = 0")                   // v3
    assert(dataFiles() == before)
    val left = spark.sql(s"SELECT id FROM $fqn ORDER BY id").collect().map(_.getInt(0)).toSeq
    assert(left == Seq(3, 5, 7, 9))
    // the feed carries BOTH deletes row-exactly (cdc staged alongside DVs)
    val feed = DeltaLite.changes(spark, dir, 2L, Some(3L))
      .select("id", "_change_type").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(feed == Seq(0, 1, 2, 4, 6, 8).map(i => (i, "delete")))
    // the DV commits carry their recorded operation (delta-spark's
    // DESCRIBE HISTORY contract); shape-derivation remains the fallback
    val ops = graft.Graft.sql(spark, s"SHOW LAKE HISTORY $fqn")
      .collect().map(_.getString(3)).toSeq
    assert(ops == Seq("DELETE", "DELETE", "WRITE", "CREATE TABLE"))
    // OPTIMIZE rewrites the survivors and PURGES the vectors
    graft.Graft.sql(spark, s"OPTIMIZE LAKE TABLE $fqn TARGET 1 FILES")
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.dvs.isEmpty, "compaction must resolve deletion vectors")
    assert(spark.sql(s"SELECT id FROM $fqn ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(3, 5, 7, 9))
  }

  test("DV DELETE without CDF: history says DELETE, streams demand ignoreChanges") {
    val base = tmpDir("dv-dml2")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE dvw2 OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.dvdml2")
    val fqn = "graft.datasource.dvdml2.dvw2.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) " +
      "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(6)")
    spark.sql(s"DELETE FROM $fqn WHERE id = 0")
    val dir = new Path(base.getPath, "t")
    assert(graft.Graft.sql(spark, s"SHOW LAKE HISTORY $fqn")
      .collect().map(_.getString(3)).toSeq == Seq("DELETE", "WRITE", "CREATE TABLE"))
    // without change files the feed cannot derive the DV rewrite
    val ex = intercept[IllegalArgumentException] {
      DeltaLite.changes(spark, dir, 2L, Some(2L)).collect()
    }
    assert(ex.getMessage.contains("deletion-vector rewrite"))
    // and the append stream demands ignoreChanges for the DV commit
    val ex2 = intercept[IllegalArgumentException] {
      DeltaLite.appendBatch(spark, dir, 2L, 2L, ignoreChanges = false, ignoreDeletes = false)
    }
    assert(ex2.getMessage.contains("deletion vectors"))
    // ignoreChanges re-emits ONLY the touched file's still-visible rows
    // (id 0's file, minus the masked row) — never a resurrected id 0
    val reemitted = DeltaLite.appendBatch(spark, dir, 2L, 2L,
      ignoreChanges = true, ignoreDeletes = false)
      .select("id").collect().map(_.getInt(0)).toSeq
    assert(!reemitted.contains(0) && reemitted.forall(r => r >= 1 && r <= 5))
  }

  test("iceberg merge-on-read DELETE: position-delete files, no rewrites, changelog derives") {
    val base = tmpDir("ice-mor-dml")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE imor OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.imordml")
    val fqn = "graft.datasource.imordml.imor.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 10 FROM range(8)")
    val dir = new Path(base.getPath, "t")
    val dataDir = new java.io.File(dir.toString, "data")
    def dataFiles() = dataDir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("delete-"))
      .map(f => (f.getName, f.lastModified())).sorted.toSeq
    val before = dataFiles()

    spark.sql(s"DELETE FROM $fqn WHERE id < 3")
    assert(dataFiles() == before, "a MoR delete must not touch data files")
    assert(dataDir.listFiles().exists(_.getName.startsWith("delete-")))
    assert(spark.sql(s"SELECT count(*) FROM $fqn").head().getLong(0) == 5L)
    spark.sql(s"DELETE FROM $fqn WHERE id % 2 = 0") // delete files compose
    assert(dataFiles() == before)
    assert(spark.sql(s"SELECT id FROM $fqn ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(3, 5, 7))
    // history labels the MoR commits; the changelog derives the exact rows
    // from each delete-file delta via the MOR-scan anti-join
    assert(graft.Graft.sql(spark, s"SHOW LAKE HISTORY $fqn")
      .collect().map(_.getString(3)).toSeq == Seq("delete", "delete", "append"))
    val feed = IcebergLite.changes(spark, dir)
      .where(col("_change_type") === "delete")
      .select("id", "_change_ordinal").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(feed == Seq((0, 1), (1, 1), (2, 1), (4, 2), (6, 2)))
  }

  test("merge-on-read UPDATE: originals untouched, rewrites append, feeds exact") {
    // Delta side: DV mask + append in one commit, CDF pre/post riding
    val base = tmpDir("mor-upd")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE moru OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.morupd")
    val fqn = "graft.datasource.morupd.moru.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) TBLPROPERTIES (" +
      "'delta.enableDeletionVectors' = 'true', 'delta.enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(6)")
    val dir = new Path(base.getPath, "t")
    val td = new java.io.File(dir.toString)
    val before = td.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).toSet
    spark.sql(s"UPDATE $fqn SET v = v + 100 WHERE id < 2")
    val after = td.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).toSet
    assert(before.subsetOf(after), "MoR update must not rewrite originals")
    assert(after.size > before.size, "MoR update appends the rewritten rows")
    assert(spark.sql(s"SELECT id, v FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 100), (1, 101), (2, 2), (3, 3), (4, 4), (5, 5)))
    val feed = DeltaLite.changes(spark, dir, 2L, Some(2L))
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(feed == Seq((0, 0, "update_preimage"), (0, 100, "update_postimage"),
      (1, 1, "update_preimage"), (1, 101, "update_postimage")))

    // Iceberg side: position-delete + append, changelog derives both sides
    val ibase = tmpDir("mor-upd-ice")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE morui OPTIONS (warehouse '${ibase.getPath}') NAMESPACE graft.datasource.morupdi")
    val ifqn = "graft.datasource.morupdi.morui.t"
    spark.sql(s"CREATE TABLE $ifqn (id INT, v INT) " +
      "TBLPROPERTIES ('write.update.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $ifqn SELECT id, id FROM range(5)")
    spark.sql(s"UPDATE $ifqn SET v = 77 WHERE id = 3")
    assert(spark.sql(s"SELECT id, v FROM $ifqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 0), (1, 1), (2, 2), (3, 77), (4, 4)))
    val ifeed = IcebergLite.changes(spark, new Path(ibase.getPath, "t"))
      .where(col("_change_ordinal") === 1)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(ifeed == Seq((3, 3, "delete"), (3, 77, "insert")))
  }

  test("merge-on-read MERGE: affected rows mask, updates+inserts append, originals stay") {
    // Delta side
    val base = tmpDir("mor-merge")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE morm OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.mormerge")
    val fqn = "graft.datasource.mormerge.morm.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) TBLPROPERTIES (" +
      "'delta.enableDeletionVectors' = 'true', 'delta.enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(6)")
    val td = new java.io.File(base.getPath, "t")
    val before = td.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).toSet
    spark.sql("SELECT * FROM (VALUES (1, 111), (4, 444), (9, 999)) AS s(id, v)")
      .createOrReplaceTempView("__morm_src")
    spark.sql(s"MERGE INTO $fqn t USING __morm_src s ON t.id = s.id " +
      "WHEN MATCHED AND s.id = 4 THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)")
    val after = td.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).toSet
    assert(before.subsetOf(after), "MoR merge must not rewrite originals")
    assert(spark.sql(s"SELECT id, v FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 0), (1, 111), (2, 2), (3, 3), (5, 5), (9, 999)))
    val feed = DeltaLite.changes(spark, new Path(base.getPath, "t"), 2L, Some(2L))
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(feed == Seq((1, 1, "update_preimage"), (1, 111, "update_postimage"),
      (4, 4, "delete"), (9, 999, "insert")))

    // Iceberg side (write.update.mode drives merge too)
    val ibase = tmpDir("mor-merge-ice")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE mormi OPTIONS (warehouse '${ibase.getPath}') NAMESPACE graft.datasource.mormergei")
    val ifqn = "graft.datasource.mormergei.mormi.t"
    spark.sql(s"CREATE TABLE $ifqn (id INT, v INT) " +
      "TBLPROPERTIES ('write.update.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $ifqn SELECT id, id FROM range(4)")
    spark.sql(s"MERGE INTO $ifqn t USING __morm_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)")
    assert(spark.sql(s"SELECT id, v FROM $ifqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 0), (1, 111), (2, 2), (3, 3), (4, 444), (9, 999)))
    assert(IcebergLite.snapshot(spark, new Path(ibase.getPath, "t")).deleteFiles.nonEmpty)
  }

  test("delta data skipping: per-file stats prune files before any footer opens") {
    val base = tmpDir("skip")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE skp OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.skipsuite")
    val fqn = "graft.datasource.skipsuite.skp.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, tag STRING)")
    // four commits with disjoint id ranges -> per-file bounds are tight
    (0 until 4).foreach { k =>
      spark.sql(s"INSERT INTO $fqn SELECT CAST(id + ${k * 25} AS INT), " +
        s"concat('t', CAST(id + ${k * 25} AS STRING)) FROM range(25) " +
        "ORDER BY id") // ORDER BY collapses to few files per insert
    }
    val dir = new Path(base.getPath, "t")
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.files.forall(_.stats.nonEmpty), "every add must carry stats")
    val totalFiles = snap.files.size
    assert(totalFiles >= 4)

    // metric check drives the parquet relation directly (the V1 catalog
    // bridge runs the same plan one level in, invisible to outer metrics)
    def scannedFiles(where: String): (Long, Long) = {
      val df = DeltaLite.read(spark, dir).where(where)
      val n = df.collect().length.toLong // same QueryExecution as the metric
      val plan0 = df.queryExecution.executedPlan
      val plan = plan0 match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scan = plan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no file scan in plan"))
      (scan.metrics("numFiles").value, n)
    }
    // a point predicate reads exactly the one file whose range covers it
    val (nf1, rows1) = scannedFiles("id = 57")
    assert(rows1 == 1L && nf1 == 1L, s"expected 1 file, scanned $nf1 of $totalFiles")
    // a range straddling two commits reads only their files, completely
    val (nf2, rows2) = scannedFiles("id >= 24 AND id <= 26")
    assert(rows2 == 3L && nf2 < totalFiles)
    // string bounds prune too
    val (nf3, rows3) = scannedFiles("tag = 't99'")
    assert(rows3 == 1L && nf3 == 1L)
    // and the same predicate through SQL/catalog answers identically
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE id = 57").head().getLong(0) == 1L)
    // skipping survives a checkpoint replacing the JSON tail
    graft.Graft.sql(spark, s"CHECKPOINT LAKE TABLE $fqn")
    val log = new java.io.File(dir.toString, "_delta_log")
    log.listFiles().filter(_.getName.endsWith(".json")).foreach(f => assert(f.delete()))
    val (nf4, rows4) = scannedFiles("id = 57")
    assert(rows4 == 1L && nf4 == 1L, "stats must ride the checkpoint")
  }

  test("data skipping never drops rows: all-null columns and boundary predicates") {
    import spark.implicits._
    val base = tmpDir("skip-null")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE skn OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.skipnull")
    val fqn = "graft.datasource.skipnull.skn.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT CAST(id AS INT), CAST(id AS INT) FROM range(10)")
    Seq((100, null.asInstanceOf[Integer]), (101, null.asInstanceOf[Integer]))
      .toDF("id", "v").createOrReplaceTempView("__skn_nulls")
    spark.sql(s"INSERT INTO $fqn SELECT id, v FROM __skn_nulls")
    // the all-null file skips for any comparison on v, and IS NULL keeps it
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE v = 5").head().getLong(0) == 1L)
    assert(spark.sql(s"SELECT id FROM $fqn WHERE v IS NULL ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(100, 101))
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE v IS NOT NULL").head().getLong(0) == 10L)
    // inclusive boundaries: min and max themselves must stay reachable
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE id >= 0 AND id <= 9")
      .head().getLong(0) == 10L)
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE id IN (0, 9, 100)")
      .head().getLong(0) == 3L)
  }

  test("iceberg data skipping: manifest bounds prune files before any footer opens") {
    val base = tmpDir("ice-skip")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE iskp OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.iceskip")
    val fqn = "graft.datasource.iceskip.iskp.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, tag STRING)")
    (0 until 4).foreach { k =>
      spark.sql(s"INSERT INTO $fqn SELECT CAST(id + ${k * 25} AS INT), " +
        s"concat('t', CAST(id + ${k * 25} AS STRING)) FROM range(25) ORDER BY id")
    }
    val dir = new Path(base.getPath, "t")
    val snap = IcebergLite.snapshot(spark, dir)
    assert(snap.files.forall(_.stats.nonEmpty), "every manifest entry must carry bounds")
    val totalFiles = snap.files.size
    assert(totalFiles >= 4)
    def scannedFiles(where: String): (Long, Long) = {
      val df = IcebergLite.read(spark, dir).where(where)
      val n = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scan = plan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no file scan in plan"))
      (scan.metrics("numFiles").value, n)
    }
    val (nf1, rows1) = scannedFiles("id = 57")
    assert(rows1 == 1L && nf1 == 1L, s"expected 1 file, scanned $nf1 of $totalFiles")
    val (nf2, rows2) = scannedFiles("tag = 't99'")
    assert(rows2 == 1L && nf2 == 1L)
    // correctness at inclusive boundaries through SQL
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE id >= 0 AND id <= 99")
      .head().getLong(0) == 100L)
  }

  test("OPTIMIZE ZORDER composes with data skipping: clustered rewrites get tight 2-D bounds") {
    val base = tmpDir("zskip")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE zsk OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.zskip")
    val fqn = "graft.datasource.zskip.zsk.t"
    spark.sql(s"CREATE TABLE $fqn (x INT, y INT, payload STRING)")
    // shuffled insert: x/y interleave badly, so pre-OPTIMIZE bounds are wide
    spark.sql(s"INSERT INTO $fqn SELECT CAST(id % 64 AS INT), CAST(id DIV 64 AS INT), " +
      s"CAST(id AS STRING) FROM range(4096) DISTRIBUTE BY CAST(rand(7) * 16 AS INT)")
    val dir = new Path(base.getPath, "t")
    def scanned(where: String): Long = {
      val df = DeltaLite.read(spark, dir).where(where)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get.metrics("numFiles").value
    }
    val pred = "x >= 10 AND x <= 13 AND y >= 10 AND y <= 13"
    val beforeFiles = DeltaLite.snapshot(spark, dir).files.size
    val beforeScan = scanned(pred)
    graft.Graft.sql(spark, s"OPTIMIZE LAKE TABLE $fqn TARGET 16 FILES ZORDER BY (x, y)")
    val afterFiles = DeltaLite.snapshot(spark, dir).files.size
    val afterScan = scanned(pred)
    assert(afterFiles >= 8, s"zorder should spread across files, got $afterFiles")
    // the whole point: curve clustering turns stats into file skips
    assert(afterScan < afterFiles, s"scanned $afterScan of $afterFiles post-zorder")
    assert(afterScan.toDouble / afterFiles < beforeScan.toDouble / beforeFiles,
      s"zorder must IMPROVE the scanned fraction " +
        s"($beforeScan/$beforeFiles -> $afterScan/$afterFiles)")
    // and the answer is unchanged
    assert(spark.sql(s"SELECT count(*) FROM $fqn WHERE $pred").head().getLong(0) == 16L)
  }

  test("iceberg ADD COLUMNS null-fills old files; RENAME flips to field-id reads") {
    val base = tmpDir("alter-ice")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE alti OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.alti")
    val fqn = "graft.datasource.alti.alti.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 10)")
    spark.sql(s"ALTER TABLE $fqn ADD COLUMNS (note STRING)")
    spark.sql(s"INSERT INTO $fqn VALUES (2, 20, 'n')")
    val rows = spark.sql(s"SELECT id, v, note FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2)))).toSeq
    assert(rows == Seq((1, 10, None), (2, 20, Some("n"))))
    // time travel still resolves pre-alter snapshots
    val lineage = IcebergLite.snapshotLineage(spark, new Path(base.getPath, "t"))
    assert(lineage.size == 2)
    // RENAME keeps the field id: pre-rename files' data appears under the
    // new name (field-id parquet resolution)
    spark.sql(s"ALTER TABLE $fqn RENAME COLUMN v TO w")
    val renamed = spark.sql(s"SELECT id, w FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(renamed == Seq((1, 10), (2, 20)),
      "pre-rename files must serve their data under the renamed column")
  }

  test("delta ALTER COLUMN TYPE: widening reads old narrow files, declares the feature") {
    val base = tmpDir("alter-widen")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE alwd OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.alwd")
    val fqn = "graft.datasource.alwd.alwd.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT, f FLOAT)")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 11, CAST(1.5 AS FLOAT))")
    spark.sql(s"ALTER TABLE $fqn ALTER COLUMN v TYPE BIGINT")
    spark.sql(s"ALTER TABLE $fqn ALTER COLUMN f TYPE DOUBLE")
    spark.sql(s"INSERT INTO $fqn VALUES (2, ${Int.MaxValue.toLong + 7}, CAST(2.5 AS DOUBLE))")
    val rows = spark.sql(s"SELECT id, v, f FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1, 11L, 1.5), (2, Int.MaxValue.toLong + 7, 2.5)),
      "old narrow files must read up-converted; new files carry wide values")
    // the gating feature is declared for external readers
    val snap = DeltaLite.snapshot(spark, new Path(base.getPath, "t"))
    assert(snap.protocol.readerFeatures.contains("typeWidening"),
      s"typeWidening must be declared: ${snap.protocol}")
    // ... and the spec-required per-field change history is recorded
    val vMeta = snap.schema("v").metadata
    assert(vMeta.contains("delta.typeChanges"), s"missing typeChanges: $vMeta")
    val changes = vMeta.getMetadataArray("delta.typeChanges")
    assert(changes.length == 1 &&
      changes(0).getString("fromType") == "integer" &&
      changes(0).getString("toType") == "long" &&
      changes(0).getLong("tableVersion") > 0, changes.mkString(","))
    // narrowing is refused (Spark analyzer); long -> string by our guard
    intercept[Exception] { spark.sql(s"ALTER TABLE $fqn ALTER COLUMN v TYPE INT") }
    val ex = intercept[Exception] { spark.sql(s"ALTER TABLE $fqn ALTER COLUMN v TYPE STRING") }
    assert(ex.getMessage.contains("widening"), ex.getMessage)
  }

  test("delta DROP COLUMN: mapping-gated, metadata-only, re-add never resurfaces data") {
    val base = tmpDir("alter-drop")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE aldr OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.aldr")

    // without column mapping the drop must reject (protocol prerequisite)
    val plain = "graft.datasource.aldr.aldr.plain"
    spark.sql(s"CREATE TABLE $plain (id INT, v INT)")
    spark.sql(s"INSERT INTO $plain VALUES (1, 10)")
    val ex = intercept[Exception] { spark.sql(s"ALTER TABLE $plain DROP COLUMN v") }
    assert(ex.getMessage.contains("columnMapping"), ex.getMessage)

    val fqn = "graft.datasource.aldr.aldr.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT, note STRING) " +
      "TBLPROPERTIES ('delta.columnMapping.mode' = 'name')")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 10, 'keep-away')")
    val dir = new Path(base.getPath, "t")
    val filesBefore = new java.io.File(dir.toString).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).sorted.toSeq

    spark.sql(s"ALTER TABLE $fqn DROP COLUMN note")
    assert(spark.table(fqn).schema.fieldNames.toSeq == Seq("id", "v"))
    // metadata-only: no data file was touched
    val filesAfter = new java.io.File(dir.toString).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).sorted.toSeq
    assert(filesAfter == filesBefore, "DROP COLUMN must be a metadata-only commit")

    // re-add the name: fresh physical name, the old bytes stay dead
    spark.sql(s"ALTER TABLE $fqn ADD COLUMNS (note STRING)")
    spark.sql(s"INSERT INTO $fqn VALUES (2, 20, 'fresh')")
    val rows = spark.sql(s"SELECT id, v, note FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2)))).toSeq
    assert(rows == Seq((1, 10, None), (2, 20, Some("fresh"))),
      "re-added column must read NULL from pre-drop files, never the old bytes")
  }
}
