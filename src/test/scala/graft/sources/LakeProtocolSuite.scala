package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

import java.nio.file.Files

/** Protocol-fidelity invariants of the native lake writers — the places a
  * syntactically valid commit can still mislead EXTERNAL engines:
  * protocol actions must never downgrade declared features, CHECKPOINT
  * must reconstruct protocol/txn state through v2 (UUID-named) bases,
  * float stats skipping must honor SQL's -0.0 = 0.0 / NaN semantics, and
  * Iceberg delete manifests on partitioned tables must reference a spec
  * whose partition struct they actually use.
  */
class LakeProtocolSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  private def lastProtocolAction(dir: Path): (Seq[String], Seq[String]) = {
    val logDir = new java.io.File(dir.toString, "_delta_log")
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val protos = logDir.listFiles().filter(_.getName.endsWith(".json"))
      .sortBy(_.getName).toSeq.flatMap { f =>
        scala.io.Source.fromFile(f, "UTF-8").getLines().toList.flatMap { line =>
          val j = org.json4s.jackson.JsonMethods.parse(line)
          (j \ "protocol") match {
            case p: org.json4s.JObject => Some((
              (p \ "readerFeatures").extractOrElse[Seq[String]](Nil),
              (p \ "writerFeatures").extractOrElse[Seq[String]](Nil)))
            case _ => None
          }
        }
      }
    protos.last
  }

  test("DV DML unions protocol features instead of re-stating them") {
    val base = tmpDir("proto-dv")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE pdv OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.pdv")
    val fqn = "graft.datasource.pdv.pdv.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) TBLPROPERTIES (" +
      "'delta.enableDeletionVectors' = 'true', 'delta.enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(6)")
    val dir = new Path(base.getPath, "t")

    // an EXTERNAL writer declares extra features (timestampNtz reader-side,
    // invariants writer-side) in its own protocol action
    val snap0 = DeltaLite.snapshot(spark, dir)
    val logDir = new java.io.File(dir.toString, "_delta_log")
    val extCommit = new java.io.File(logDir, f"${snap0.version + 1}%020d.json")
    java.nio.file.Files.write(extCommit.toPath,
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","timestampNtz"],""" +
        """"writerFeatures":["deletionVectors","timestampNtz","changeDataFeed","invariants"]}}""" + "\n")
        .getBytes("UTF-8"))

    // replay picks the declaration up
    val snap1 = DeltaLite.snapshot(spark, dir)
    assert(snap1.protocol.readerFeatures.contains("timestampNtz"))
    assert(snap1.protocol.writerFeatures.contains("invariants"))

    // a DV delete commits its own protocol action — the union, not a reset
    spark.sql(s"DELETE FROM $fqn WHERE id = 2")
    assert(spark.table(fqn).count() == 5)
    val (readers, writers) = lastProtocolAction(dir)
    assert(readers.contains("deletionVectors"))
    assert(readers.contains("timestampNtz"),
      s"externally declared reader feature dropped: $readers")
    assert(writers.contains("invariants"),
      s"externally declared writer feature dropped: $writers")
    assert(writers.contains("changeDataFeed"),
      s"CDF writer feature dropped by a DV commit on a CDF table: $writers")
    // and the CDF rows for the delete were in fact staged in that commit
    val snap2 = DeltaLite.snapshot(spark, dir)
    val feed = DeltaLite.changes(spark, dir, snap2.version, Some(snap2.version))
      .select("id", "_change_type").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(feed == Seq((2, "delete")))
  }

  test("upgrading a LEGACY-versioned protocol lists the old versions' implied features") {
    val base = tmpDir("proto-legacy")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE plg OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.plg")
    val fqn = "graft.datasource.plg.plg.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(4)")
    val dir = new Path(base.getPath, "t")
    // an external writer set a LEGACY version-gated protocol: minWriter 3
    // grants appendOnly + invariants + checkConstraints with NO feature list
    val snap0 = DeltaLite.snapshot(spark, dir)
    val logDir = new java.io.File(dir.toString, "_delta_log")
    java.nio.file.Files.write(
      new java.io.File(logDir, f"${snap0.version + 1}%020d.json").toPath,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""".getBytes("UTF-8"))
    // enabling DVs jumps to feature-listing versions: the emitted action
    // must LIST what minWriter 3 granted, not silently revoke it
    spark.sql(s"ALTER TABLE $fqn SET TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')")
    val (_, writers) = lastProtocolAction(dir)
    Seq("appendOnly", "invariants", "checkConstraints", "deletionVectors").foreach(f =>
      assert(writers.contains(f),
        s"legacy-implied feature $f revoked by the upgrade: $writers"))
    // and the DV write path preserves them too
    spark.sql(s"DELETE FROM $fqn WHERE id = 1")
    val (_, writers2) = lastProtocolAction(dir)
    Seq("appendOnly", "invariants", "checkConstraints").foreach(f =>
      assert(writers2.contains(f), s"DV commit dropped legacy feature $f: $writers2"))
  }

  test("CHECKPOINT and lastTxnVersion reconstruct through a v2 base") {
    val base = tmpDir("proto-v2cp")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE pv2 OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.pv2")
    val fqn = "graft.datasource.pv2.pv2.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(4)")
    val dir = new Path(base.getPath, "t")
    val snap = DeltaLite.snapshot(spark, dir)

    // hand-build a v2 checkpoint whose main file carries a feature
    // protocol AND a txn high-water mark, adds in the sidecar
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types.StructType
    val logDir = new java.io.File(dir.toString, "_delta_log")
    val sidecarDir = new java.io.File(logDir, "_sidecars")
    sidecarDir.mkdirs()
    val addSchema = StructType.fromDDL(
      """add STRUCT<path: STRING, partitionValues: MAP<STRING, STRING>, size: BIGINT,
        |  modificationTime: BIGINT, dataChange: BOOLEAN>""".stripMargin)
    val addRows = snap.fileIds.zip(snap.files).map { case (id, f) =>
      R(R(id, Map.empty[String, String], f.size, f.modificationTime, true))
    }
    val sidecarName = "11111111-2222-3333-4444-555555555555.parquet"
    LakeWrite.writeOneParquetFile(
      spark.createDataFrame(new java.util.ArrayList(java.util.Arrays.asList(addRows: _*)),
        addSchema).coalesce(1),
      new Path(sidecarDir.getPath, sidecarName))
    val mainSchema = StructType.fromDDL(
      """metaData STRUCT<id: STRING, schemaString: STRING,
        |  partitionColumns: ARRAY<STRING>, configuration: MAP<STRING, STRING>>,
        |protocol STRUCT<minReaderVersion: INT, minWriterVersion: INT,
        |  readerFeatures: ARRAY<STRING>, writerFeatures: ARRAY<STRING>>,
        |txn STRUCT<appId: STRING, version: BIGINT>,
        |sidecar STRUCT<path: STRING, sizeInBytes: BIGINT>""".stripMargin)
    val mainRows = Seq(
      R(R(snap.metaId, snap.schema.json, Seq.empty[String], Map.empty[String, String]),
        null, null, null),
      R(null, R(3, 7, Seq("timestampNtz"), Seq("timestampNtz", "appendOnly")), null, null),
      R(null, null, R("graft-stream-42", 17L), null),
      R(null, null, null, R(sidecarName, 1L)))
    val uuid = "aaaabbbb-cccc-dddd-eeee-ffff00001111"
    LakeWrite.writeOneParquetFile(
      spark.createDataFrame(new java.util.ArrayList(java.util.Arrays.asList(mainRows: _*)),
        mainSchema).coalesce(1),
      new Path(logDir.getPath, f"${snap.version}%020d.checkpoint.$uuid.parquet"))
    // clean the JSON tail: the v2 base is now the ONLY protocol/txn source
    logDir.listFiles().filter { f =>
      f.getName.endsWith(".json") &&
        f.getName.stripSuffix(".json").toLong <= snap.version
    }.foreach(f => assert(f.delete()))

    // the exactly-once guard must still see the v2-recorded mark
    assert(DeltaLite.lastTxnVersion(spark, dir, "graft-stream-42") == Some(17L))
    // snapshot carries the declared protocol through the v2 base
    assert(DeltaLite.snapshot(spark, dir).protocol ==
      DeltaLite.Protocol(3, 7, Seq("timestampNtz"), Seq("timestampNtz", "appendOnly")))

    // CHECKPOINT writes a classic checkpoint preserving both
    DeltaLite.writeCheckpoint(spark, dir)
    val cp = spark.read.parquet(
      new java.io.File(logDir, f"${snap.version}%020d.checkpoint.parquet").getPath)
    val proto = cp.select("protocol").where(col("protocol").isNotNull).collect()
    assert(proto.length == 1)
    val p = proto(0).getStruct(0)
    assert(p.getInt(p.fieldIndex("minReaderVersion")) == 3)
    assert(p.getInt(p.fieldIndex("minWriterVersion")) == 7)
    assert(p.getSeq[String](p.fieldIndex("writerFeatures")).contains("appendOnly"),
      "externally declared writer feature lost through CHECKPOINT")
    val txn = cp.select("txn.appId", "txn.version").where(col("appId").isNotNull).collect()
    assert(txn.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("graft-stream-42", 17L)))
  }

  test("float stats skipping: -0.0 bounds keep files for 0.0 predicates; NaN bounds never prune") {
    import org.apache.spark.sql.GraftLakeBridge.{FileStats, StatsSkipping}
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("x", DoubleType), StructField("f", FloatType)))
    def attr(n: String, dt: DataType) = AttributeReference(n, dt)()
    def keeps(filter: Expression, st: FileStats): Boolean =
      StatsSkipping.mayMatch(Seq(filter), Some(st), schema)

    // a file whose double stats are [-0.0, -0.0] CONTAINS 0.0 under SQL `=`
    val negZero = FileStats(Some(10L), Map("x" -> -0.0d), Map("x" -> -0.0d), Map("x" -> 0L))
    assert(keeps(EqualTo(attr("x", DoubleType), Literal(0.0d)), negZero),
      "max = -0.0 wrongly pruned for x = 0.0 (SQL: -0.0 = 0.0 is TRUE)")
    assert(keeps(EqualTo(attr("x", DoubleType), Literal(-0.0d)), negZero))
    // the float flavor, via a [0.0, 0.0] file and a -0.0f literal
    val posZeroF = FileStats(Some(10L), Map("f" -> 0.0f), Map("f" -> 0.0f), Map("f" -> 0L))
    assert(keeps(EqualTo(attr("f", FloatType), Literal(-0.0f)), posZeroF),
      "min = 0.0f wrongly pruned for f = -0.0f")

    // NaN bounds prove nothing about content — never prune on them
    val nanMax = FileStats(Some(10L), Map("x" -> 1.0d), Map("x" -> Double.NaN), Map("x" -> 0L))
    assert(keeps(EqualTo(attr("x", DoubleType), Literal(5.0d)), nanMax))
    assert(keeps(GreaterThan(attr("x", DoubleType), Literal(99.0d)), nanMax))
    // a NaN literal keeps too (its ordering position is not containment)
    val plain = FileStats(Some(10L), Map("x" -> 1.0d), Map("x" -> 2.0d), Map("x" -> 0L))
    assert(keeps(EqualTo(attr("x", DoubleType), Literal(Double.NaN)), plain))
    // and genuine pruning still prunes
    assert(!keeps(EqualTo(attr("x", DoubleType), Literal(5.0d)), plain))
    assert(!keeps(EqualTo(attr("x", DoubleType), Literal(0.0d)),
      FileStats(Some(10L), Map("x" -> 1.0d), Map("x" -> 2.0d), Map("x" -> 0L))))
  }

  test("iceberg: partitioned tables register an unpartitioned spec for delete manifests") {
    val base = tmpDir("proto-ice-spec")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE pis OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.pis")
    val fqn = "graft.datasource.pis.pis.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT, p INT) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id, id % 2 FROM range(8)")
    spark.sql(s"DELETE FROM $fqn WHERE id = 3")
    assert(spark.table(fqn).count() == 7)

    val dir = new Path(base.getPath, "t")
    val conf = spark.sparkContext.hadoopConfiguration
    val metaTxt = IcebergLite.readString(conf, IcebergLite.currentMetadataFile(conf, dir))
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val meta = org.json4s.jackson.JsonMethods.parse(metaTxt)
    val specs = (meta \ "partition-specs").asInstanceOf[org.json4s.JArray].arr
    assert(specs.exists(s => (s \ "spec-id").extract[Int] == 1 &&
      (s \ "fields").asInstanceOf[org.json4s.JArray].arr.isEmpty),
      "partitioned table must register the unpartitioned spec delete manifests use")
    assert((meta \ "default-spec-id").extract[Int] == 0, "default spec must stay the data spec")

    // the delete manifest's list entry references spec 1, data manifests spec 0
    val listRel = (meta \ "snapshots").asInstanceOf[org.json4s.JArray].arr
      .find(s => (s \ "snapshot-id").extract[Long] == (meta \ "current-snapshot-id").extract[Long])
      .map(s => (s \ "manifest-list").extract[String]).get
    val listPath = IcebergLite.resolveUri(dir, listRel)
    val in = new org.apache.avro.mapred.FsInput(listPath, conf)
    val reader = org.apache.avro.file.DataFileReader.openReader(in,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val entries = try {
      val buf = Seq.newBuilder[(Int, Int, Int, Long)]
      while (reader.hasNext) {
        val r = reader.next()
        buf += ((r.get("content").asInstanceOf[Number].intValue(),
          r.get("partition_spec_id").asInstanceOf[Number].intValue(),
          r.get("added_files_count").asInstanceOf[Number].intValue(),
          r.get("added_rows_count").asInstanceOf[Number].longValue()))
      }
      buf.result()
    } finally reader.close()
    val (deletes, datas) = entries.partition(_._1 == 1)
    assert(deletes.nonEmpty && deletes.forall(_._2 == 1),
      s"delete manifests must reference the unpartitioned spec: $entries")
    assert(datas.nonEmpty && datas.forall(_._2 == 0),
      s"data manifests stay on the default spec: $entries")
    // the list's count fields are real, not zero-filled — external
    // planners read them for stats
    assert(deletes.exists(e => e._3 > 0 && e._4 > 0),
      s"delete manifest counts must reflect the delete file: $entries")
    assert(datas.exists(e => e._3 + e._4 > 0),
      s"data manifest counts must reflect the entries: $entries")
  }

  test("iceberg snapshot ids advance past existing ids (same-millisecond commits)") {
    val base = tmpDir("proto-ice-snapid")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE psn OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.psn")
    val fqn = "graft.datasource.psn.psn.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(3)")

    // simulate a snapshot committed at (or logically after) "now": bump the
    // recorded snapshot id far into the future — the next commit must
    // allocate PAST it, or its m-/md-/ml-$id.avro files collide
    val dir = new Path(base.getPath, "t")
    val conf = spark.sparkContext.hadoopConfiguration
    val metaFile = IcebergLite.currentMetadataFile(conf, dir)
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val txt = IcebergLite.readString(conf, metaFile)
    val meta = org.json4s.jackson.JsonMethods.parse(txt)
    val oldId = (meta \ "current-snapshot-id").extract[Long]
    val futureId = oldId + 1000000000000L
    // only the id fields — the manifest-list PATH embeds the old id and
    // must keep resolving
    val bumped = txt.replaceAll(
      "\"(current-snapshot-id|snapshot-id)\"(\\s*):(\\s*)" + oldId,
      "\"$1\"$2:$3" + futureId)
    assert(bumped != txt, "metadata bump did not match anything")
    val f = new java.io.File(metaFile.toString)
    java.nio.file.Files.write(f.toPath, bumped.getBytes("UTF-8"))
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()

    spark.sql(s"INSERT INTO $fqn SELECT id + 10, id FROM range(2)")
    val meta2 = org.json4s.jackson.JsonMethods.parse(
      IcebergLite.readString(conf, IcebergLite.currentMetadataFile(conf, dir)))
    val newId = (meta2 \ "current-snapshot-id").extract[Long]
    assert(newId > futureId,
      s"new snapshot id $newId does not advance past existing $futureId — " +
        "same-millisecond commits would collide on metadata file names")
    assert(spark.table(fqn).count() == 5)
  }

  test("CHECKPOINT V2 declares the v2Checkpoint feature gate before writing") {
    val base = tmpDir("proto-v2cp")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE pv2 OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.pv2")
    val fqn = "graft.datasource.pv2.pv2.t"
    spark.sql(s"CREATE TABLE $fqn (id INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id FROM range(5)")
    val dir = new Path(base.getPath, "t")
    // a direct ungated v2 write is refused (spec: readers that don't know
    // the feature skip UUID-named checkpoints — the table would go dark
    // for them once the JSON tail is cleaned)
    val ex = intercept[IllegalArgumentException] {
      DeltaLite.writeCheckpoint(spark, dir, v2 = true)
    }
    assert(ex.getMessage.contains("v2Checkpoint"), ex.getMessage)
    // the command path upgrades the protocol in one commit, then writes
    graft.Graft.sql(spark, s"CHECKPOINT LAKE TABLE $fqn V2")
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.protocol.minReader == 3 && snap.protocol.minWriter == 7)
    assert(snap.protocol.readerFeatures.contains("v2Checkpoint"))
    assert(snap.protocol.writerFeatures.contains("v2Checkpoint"))
    assert(snap.configuration.get("delta.checkpointPolicy").contains("v2"))
    // the upgrade is IDEMPOTENT: a second V2 checkpoint adds no commit
    val v = snap.version
    graft.Graft.sql(spark, s"CHECKPOINT LAKE TABLE $fqn V2")
    assert(DeltaLite.snapshot(spark, dir).version == v,
      "an already-gated table must not re-upgrade")
    // and the gated table still reads (our own reader accepts the feature)
    assert(spark.table(fqn).count() == 5)
  }
}
