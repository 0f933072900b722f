package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

import java.nio.file.Files

/** Row-level DML (DELETE / UPDATE / MERGE INTO) over the native lake
  * tables, end-to-end through the Spark SQL surface: copy-on-write at file
  * granularity (untouched files must survive BY PATH across the commit),
  * correct match semantics (conditions, clause order, cardinality rule),
  * deletion-vector interaction, and time travel across DML commits.
  */
class LakeRowLevelSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  private def setupDelta(ns: String): java.io.File = {
    import spark.implicits._
    val root = tmpDir("rl-delta")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE $ns OPTIONS (path '$root') " +
      s"NAMESPACE graft.datasource.rl")
    spark.sql(s"CREATE TABLE graft.datasource.rl.$ns.t (id BIGINT, v STRING, p INT) " +
      "PARTITIONED BY (p)")
    (0L until 12L).map(i => (i, s"v$i", (i % 3).toInt)).toDF("id", "v", "p")
      .createOrReplaceTempView(s"__rl_src_$ns")
    spark.sql(s"INSERT INTO graft.datasource.rl.$ns.t SELECT * FROM __rl_src_$ns")
    root
  }

  test("delta: DELETE rewrites only the touched partition's files") {
    val root = setupDelta("d1")
    val before = DeltaLite.snapshot(spark, new Path(s"$root/t"))
    val untouchedBefore = before.fileIds.filterNot(_.startsWith("p=1")).toSet
    assert(untouchedBefore.nonEmpty)

    spark.sql("DELETE FROM graft.datasource.rl.d1.t WHERE p = 1 AND id < 10")
    val t = spark.table("graft.datasource.rl.d1.t")
    assert(t.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 12L).filterNot(i => i % 3 == 1 && i < 10))

    // copy-on-write at file granularity: p=0 and p=2 files survive by path
    val after = DeltaLite.snapshot(spark, new Path(s"$root/t"))
    assert(untouchedBefore.subsetOf(after.fileIds.toSet),
      "files without matches must not be rewritten")
    // at least one p=1 file held a matching row and must be gone (a p=1
    // file holding only id 10 legitimately survives — no match inside it)
    val removedP1 = before.fileIds.filter(_.startsWith("p=1")).toSet --
      after.fileIds.toSet
    assert(removedP1.nonEmpty, "files with matches must be replaced")
    // history: pre-delete version still sees all rows
    assert(DeltaLite.read(spark, new Path(s"$root/t"), version = Some(before.version))
      .count() == 12)
  }

  test("delta: DELETE with no matches commits nothing") {
    val root = setupDelta("d2")
    val before = DeltaLite.snapshot(spark, new Path(s"$root/t"))
    spark.sql("DELETE FROM graft.datasource.rl.d2.t WHERE id > 100")
    val after = DeltaLite.snapshot(spark, new Path(s"$root/t"))
    assert(after.version == before.version, "a no-match DELETE must be a no-op")
  }

  test("delta: UPDATE with and without WHERE") {
    val root = setupDelta("d3")
    spark.sql("UPDATE graft.datasource.rl.d3.t SET v = concat(v, '!') WHERE p = 2")
    val t = spark.table("graft.datasource.rl.d3.t")
    val got = t.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == (0L until 12L).map(i => (i, if (i % 3 == 2) s"v$i!" else s"v$i")))

    // unconditional UPDATE touches everything
    spark.sql("UPDATE graft.datasource.rl.d3.t SET id = id + 100")
    assert(spark.table("graft.datasource.rl.d3.t")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == (100L until 112L))
    val _ = root
  }

  test("delta: MERGE updates, deletes, and inserts in one commit") {
    import spark.implicits._
    val root = setupDelta("d4")
    Seq((1L, "one"), (4L, "four"), (50L, "fifty"), (51L, "fiftyone"))
      .toDF("sid", "sv").createOrReplaceTempView("__rl_merge_src")
    spark.sql(
      """MERGE INTO graft.datasource.rl.d4.t t USING __rl_merge_src s ON t.id = s.sid
        |WHEN MATCHED AND t.id = 4 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.sv
        |WHEN NOT MATCHED AND s.sid < 51 THEN INSERT (id, v, p) VALUES (s.sid, s.sv, 9)
        |""".stripMargin)
    val t = spark.table("graft.datasource.rl.d4.t")
    val rows = t.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    // id 4 deleted; id 1 updated; 50 inserted into p=9; 51 filtered out
    assert(!rows.exists(_._1 == 4L))
    assert(rows.find(_._1 == 1L).map(_._2).contains("one"))
    assert(rows.find(_._1 == 50L).contains((50L, "fifty", 9)))
    assert(!rows.exists(_._1 == 51L))
    assert(rows.size == 12)
    val _ = root
  }

  test("delta: MERGE cardinality violation errors") {
    import spark.implicits._
    val root = setupDelta("d5")
    Seq((1L, "x"), (1L, "y")).toDF("sid", "sv").createOrReplaceTempView("__rl_dup_src")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO graft.datasource.rl.d5.t t USING __rl_dup_src s ON t.id = s.sid
          |WHEN MATCHED THEN UPDATE SET v = s.sv""".stripMargin)
    }
    assert(e.getMessage.contains("cardinality"))
    val _ = root
  }

  test("delta: DELETE does not resurrect DV-masked rows") {
    import spark.implicits._
    val root = tmpDir("rl-dv")
    val conf = spark.sparkContext.hadoopConfiguration
    val table = new Path(root.toString, "t")
    // one sorted file of ids 0..7, inline DV masking positions 0 and 1
    val data = (0L until 8L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
    val sz = LakeWrite.writeOneParquetFile(data, new Path(table, "f.parquet"))
    val bmp = RoaringDv.encodeBitmapArray(Seq(0L, 1L))
    val padded = bmp ++ new Array[Byte]((4 - bmp.length % 4) % 4)
    LakeWrite.deltaCommit(conf, table, 0, Seq(
      LakeWrite.deltaCommitInfo(1700000000000L),
      LakeWrite.deltaProtocolWithFeatures(Seq("deletionVectors"), Seq("deletionVectors")),
      LakeWrite.deltaMetaData("rl-dv", data.schema, Nil),
      LakeWrite.deltaAddDv("f.parquet", sz, 1700000000000L, Map.empty,
        "i", RoaringDv.base85Encode(padded), None, bmp.length, 2L)))
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE rldv OPTIONS (path '$root') " +
      "NAMESPACE graft.datasource.rl")
    spark.sql("DELETE FROM graft.datasource.rl.rldv.t WHERE id = 5")
    // ids 0,1 were DV-masked, 5 deleted: the rewritten file must hold the rest
    assert(spark.table("graft.datasource.rl.rldv.t")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 4L, 6L, 7L))
  }

  private def setupIceberg(ns: String): java.io.File = {
    import spark.implicits._
    val root = tmpDir("rl-ice")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE ICEBERG DATASOURCE $ns OPTIONS (warehouse '$root') " +
      s"NAMESPACE graft.datasource.rl")
    spark.sql(s"CREATE TABLE graft.datasource.rl.$ns.t (id BIGINT, v STRING, p INT) " +
      "PARTITIONED BY (p)")
    (0L until 12L).map(i => (i, s"v$i", (i % 3).toInt)).toDF("id", "v", "p")
      .createOrReplaceTempView(s"__rl_isrc_$ns")
    spark.sql(s"INSERT INTO graft.datasource.rl.$ns.t SELECT * FROM __rl_isrc_$ns")
    root
  }

  test("iceberg: DELETE rewrites only touched files; history survives") {
    val root = setupIceberg("i1")
    val dir = new Path(s"$root/t")
    val before = IcebergLite.snapshot(spark, dir)
    val untouchedBefore = before.dataFileMeta.map(_._1)
      .filterNot(_.contains("p=1")).toSet
    assert(untouchedBefore.nonEmpty)
    spark.sql("DELETE FROM graft.datasource.rl.i1.t WHERE p = 1 AND id < 10")
    assert(spark.table("graft.datasource.rl.i1.t")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 12L).filterNot(i => i % 3 == 1 && i < 10))
    val after = IcebergLite.snapshot(spark, dir)
    assert(untouchedBefore.subsetOf(after.dataFileMeta.map(_._1).toSet),
      "files without matches must survive by path")
    // survivors keep their ORIGINAL data sequence numbers
    val beforeSeqs = before.dataFileMeta.toMap
    after.dataFileMeta.filter(f => untouchedBefore.contains(f._1)).foreach { case (fid, seq) =>
      assert(seq == beforeSeqs(fid), s"survivor $fid changed sequence number")
    }
    // time travel to the pre-delete snapshot
    assert(IcebergLite.read(spark, dir, version = Some(before.snapshotId.toString))
      .count() == 12)
  }

  test("iceberg: UPDATE and MERGE") {
    import spark.implicits._
    val root = setupIceberg("i2")
    spark.sql("UPDATE graft.datasource.rl.i2.t SET v = upper(v) WHERE id >= 10")
    val t1 = spark.table("graft.datasource.rl.i2.t")
    assert(t1.where(col("id") === 11L).select("v").head.getString(0) == "V11")
    assert(t1.where(col("id") === 2L).select("v").head.getString(0) == "v2")

    Seq((0L, "zero"), (99L, "ninetynine")).toDF("sid", "sv")
      .createOrReplaceTempView("__rl_imrg")
    spark.sql(
      """MERGE INTO graft.datasource.rl.i2.t t USING __rl_imrg s ON t.id = s.sid
        |WHEN MATCHED THEN UPDATE SET v = s.sv
        |WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES (s.sid, s.sv, 0)""".stripMargin)
    val t2 = spark.table("graft.datasource.rl.i2.t")
    assert(t2.where(col("id") === 0L).select("v").head.getString(0) == "zero")
    assert(t2.where(col("id") === 99L).select("v").head.getString(0) == "ninetynine")
    assert(t2.count() == 13)
    val _ = root
  }

  test("iceberg: DELETE composes with existing equality deletes") {
    import spark.implicits._
    val root = setupIceberg("i3")
    val dir = new Path(s"$root/t")
    // retro-fit an equality delete masking id=3 (seq above all data files)
    val m = IcebergLite.snapshot(spark, dir)
    val eqDf = Seq(3L).toDF("id")
    val eqSize = LakeWrite.writeOneParquetFile(eqDf.coalesce(1), new Path(dir, "data/eq.parquet"))
    // note: this test writes the delete through the fixture writer at the
    // metadata level, as an external Flink-style writer would
    val conf = spark.sparkContext.hadoopConfiguration
    val entry = LakeWrite.ManifestEntry(1, "data/eq.parquet", 1L, eqSize, 777L,
      content = 2, equalityIds = Seq(1), sequenceNumber = Some(100L))
    val mdFile = java.io.File.createTempFile("rl-eq-manifest", ".avro")
    val mdLen = LakeWrite.icebergWriteManifest(mdFile, Seq(entry))
    val fs = dir.getFileSystem(conf)
    fs.copyFromLocalFile(true, true, new Path(mdFile.getAbsolutePath),
      new Path(dir, "metadata/md-eq.avro"))
    val curList = IcebergLite.resolveUri(dir, IcebergLite.snapshot(spark, dir)
      .tableDir.toString + "/metadata") // not used; manifests re-listed below
    val _ = (m, curList)
    // rebuild the manifest list: current data manifests + the eq manifest
    val metaFile = IcebergLite.currentMetadataFile(conf, dir)
    val metaJson = org.json4s.jackson.JsonMethods.parse(IcebergLite.readString(conf, metaFile))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    import org.json4s._
    val curId = (metaJson \ "current-snapshot-id").extract[Long]
    val curListPath = (metaJson \ "snapshots") match {
      case JArray(ss) => ss.find(s => (s \ "snapshot-id").extract[Long] == curId)
        .map(s => (s \ "manifest-list").extract[String]).get
      case _ => fail("no snapshots")
    }
    val lf = new org.apache.avro.mapred.FsInput(IcebergLite.resolveUri(dir, curListPath), conf)
    val rdr = org.apache.avro.file.DataFileReader.openReader(lf,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val mfs = try {
      val b = Seq.newBuilder[LakeWrite.ManifestFile]
      while (rdr.hasNext) {
        val r = rdr.next()
        b += LakeWrite.ManifestFile(r.get("manifest_path").toString,
          r.get("manifest_length").asInstanceOf[Long],
          r.get("content").asInstanceOf[Int],
          r.get("sequence_number").asInstanceOf[Long])
      }
      b.result()
    } finally rdr.close()
    val listFile = java.io.File.createTempFile("rl-eq-list", ".avro")
    LakeWrite.icebergWriteManifestListEntries(listFile,
      mfs :+ LakeWrite.ManifestFile("metadata/md-eq.avro", mdLen, 1, 100L), 778L)
    fs.copyFromLocalFile(true, true, new Path(listFile.getAbsolutePath),
      new Path(dir, "metadata/ml-eq.avro"))
    val lastSeq = (metaJson \ "last-sequence-number").extractOrElse[Long](0L)
    val metaVersion = """^v?(\d+)\.metadata\.json$""".r
      .findFirstMatchIn(metaFile.getName).map(_.group(1).toInt).get
    LakeWrite.icebergWriteMetadata(conf, dir, metaVersion + 1,
      spark.table("graft.datasource.rl.i3.t").schema,
      Seq(LakeWrite.IcebergSnapshot(778L, 1700009900000L, "metadata/ml-eq.avro",
        math.max(lastSeq, 100L))),
      currentSnapshotId = 778L,
      specFields = Seq(JObject("name" -> JString("p"), "transform" -> JString("identity"),
        "source-id" -> JInt(3), "field-id" -> JInt(1000))))

    // id=3 is equality-deleted; DELETE id=6 must not resurrect it
    assert(spark.table("graft.datasource.rl.i3.t")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 12L).filterNot(_ == 3L))
    spark.sql("DELETE FROM graft.datasource.rl.i3.t WHERE id = 6")
    assert(spark.table("graft.datasource.rl.i3.t")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 12L).filterNot(i => i == 3L || i == 6L))
  }

  test("delta: MERGE WHEN NOT MATCHED BY SOURCE deletes and updates sourceless rows") {
    import spark.implicits._
    val root = setupDelta("d6")
    // classic dimension sync: source holds keys 0..5 with new labels;
    // everything else in the target must go, except p=2 rows which get
    // flagged instead of deleted
    (0L until 6L).map(i => (i, s"sync-$i")).toDF("sid", "sv")
      .createOrReplaceTempView("__rl_sync_src")
    spark.sql(
      """MERGE INTO graft.datasource.rl.d6.t t USING __rl_sync_src s ON t.id = s.sid
        |WHEN MATCHED THEN UPDATE SET v = s.sv
        |WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES (s.sid, s.sv, 0)
        |WHEN NOT MATCHED BY SOURCE AND t.p = 2 THEN UPDATE SET v = 'stale'
        |WHEN NOT MATCHED BY SOURCE THEN DELETE
        |""".stripMargin)
    val rows = spark.table("graft.datasource.rl.d6.t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    // keys 0..5 synced; keys >= 6: p=2 rows (8, 11) flagged stale, others gone
    val expected = (0L until 6L).map(i => (i, s"sync-$i", (i % 3).toInt)) ++
      Seq((8L, "stale", 2), (11L, "stale", 2))
    assert(rows == expected, s"got $rows")
    val _ = root
  }

  test("delta: MERGE NMBS with no matched clauses still rewrites the right files") {
    import spark.implicits._
    val root = setupDelta("d7")
    // source matches nothing; the only effect is the NMBS delete of p=0
    Seq((999L, "x")).toDF("sid", "sv").createOrReplaceTempView("__rl_nmbs_src")
    spark.sql(
      """MERGE INTO graft.datasource.rl.d7.t t USING __rl_nmbs_src s ON t.id = s.sid
        |WHEN NOT MATCHED BY SOURCE AND t.p = 0 THEN DELETE""".stripMargin)
    val ids = spark.table("graft.datasource.rl.d7.t")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 12L).filterNot(_ % 3 == 0))
    val _ = root
  }
}
