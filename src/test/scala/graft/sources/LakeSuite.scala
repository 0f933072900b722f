package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.json4s.jackson.JsonMethods

import graft.SparkTestBase
import graft.sources.lake._
import graft.sources.lake.LakeWrite.{IcebergSnapshot, ManifestEntry}

import java.nio.file.Files

/** The lake-lite sources: AvroLite container IO (core avro jar, no
  * spark-avro), DeltaLite log replay, IcebergLite metadata walk — plus the
  * scale contracts: sync-marker split reading, metadata-level partition
  * pruning through [[org.apache.spark.sql.GraftLakeBridge.LakeFileIndex]],
  * and the documented rejection surfaces for unsupported protocol features.
  */
class LakeSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  // ---- AvroLite ----

  test("avro round-trip covers the full type matrix including nulls") {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("dec", DecimalType(10, 3)), StructField("bin", BinaryType),
      StructField("arr", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("st", StructType(Seq(StructField("x", IntegerType), StructField("y", StringType))))))
    val rows = Seq(
      Row(1, 2L, "one", true, 1.5f, 2.5, java.sql.Date.valueOf("2021-03-04"),
        java.sql.Timestamp.valueOf("2021-03-04 05:06:07.123456"),
        new java.math.BigDecimal("12345.678"), Array[Byte](1, 2, 3),
        Seq(1, 2, 3), Map("a" -> 1L, "b" -> 2L), Row(7, "seven")),
      Row(null, null, null, null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(rows.asJava, schema)
    val dir = tmpDir("avro-rt")
    AvroLite.writeDataFrame(df, new java.io.File(dir, "t.avro"))
    val back = AvroLite.read(spark, Seq(new Path(dir.toString)))
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.toJSON.collect().sorted.toSeq == df.toJSON.collect().sorted.toSeq)
  }

  test("avro split reading: many sync blocks, small maxPartitionBytes, same rows") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i, s"name-$i" * 8)).toDF("id", "name")
    val dir = tmpDir("avro-split")
    // tiny sync interval -> many blocks -> many split points
    AvroLite.writeDataFrame(df, new java.io.File(dir, "t.avro"), codec = "null",
      syncInterval = 2048)
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try {
      val back = AvroLite.read(spark, Seq(new Path(dir.toString)))
      assert(back.rdd.getNumPartitions > 4, "expected multiple sync-aligned splits")
      assert(back.count() == 5000)
      assert(back.agg(sum("id")).head.getLong(0) == (0 until 5000).map(_.toLong).sum)
      // no duplicated and no lost rows across split boundaries
      assert(back.select("id").distinct().count() == 5000)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("avro non-record top-level schema reads as a single `value` column") {
    val schema = org.apache.avro.Schema.create(org.apache.avro.Schema.Type.STRING)
    val dir = tmpDir("avro-toplevel")
    val f = new java.io.File(dir, "t.avro")
    // written with raw avro APIs (not AvroLite's record-typed writer), so
    // the reader is exercised against an independently produced container
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[AnyRef](schema))
    w.create(schema, f)
    try Seq("alpha", "beta", "gamma").foreach(w.append(_)) finally w.close()
    val back = AvroLite.read(spark, Seq(new Path(dir.toString)))
    assert(back.schema.fieldNames.toSeq == Seq("value"))
    assert(back.collect().map(_.getString(0)).sorted.toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("parseBytes accepts the full Spark byte-suffix set") {
    assert(AvroLite.parseBytes("16384") == 16384L)
    assert(AvroLite.parseBytes("64k") == 64L << 10)
    assert(AvroLite.parseBytes("128MB") == 128L << 20)
    assert(AvroLite.parseBytes("2g") == 2L << 30)
    assert(AvroLite.parseBytes("1t") == 1L << 40)
    assert(AvroLite.parseBytes("1tb") == 1L << 40)
    assert(AvroLite.parseBytes("1p") == 1L << 50)
  }

  test("avro complex unions are rejected with a clear error") {
    val union = org.apache.avro.Schema.createUnion(
      org.apache.avro.Schema.create(org.apache.avro.Schema.Type.INT),
      org.apache.avro.Schema.create(org.apache.avro.Schema.Type.STRING))
    val e = intercept[UnsupportedOperationException] { AvroLite.toSparkType(union) }
    assert(e.getMessage.contains("union"))
  }

  // ---- DeltaLite ----

  /** id,long + p,int (partition) + name,string; v0 = 3 partition files,
    * v1 = p=1 file replaced by one holding only even ids.
    */
  private def buildDeltaFixture(dir: java.io.File): StructType = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    val full = (0 until 30).map(i => (i.toLong, i % 3, s"row-$i")).toDF("id", "p", "name")
    val schema = full.schema
    val adds0 = (0 until 3).map { p =>
      val rel = s"p=$p/part-0000$p.parquet"
      val size = LakeWrite.writeOneParquetFile(
        full.where($"p" === p).select("id", "name"), new Path(root, rel))
      LakeWrite.deltaAdd(rel, size, 1700000000000L, Map("p" -> p.toString))
    }
    LakeWrite.deltaCommit(conf, root, 0,
      Seq(LakeWrite.deltaCommitInfo(1700000000000L), LakeWrite.deltaProtocol(),
        LakeWrite.deltaMetaData("delta-suite-fixture", schema, Seq("p"))) ++ adds0)
    val rel1 = "p=1/part-00010.parquet"
    val size1 = LakeWrite.writeOneParquetFile(
      full.where($"p" === 1 && $"id" % 2 === 0).select("id", "name"), new Path(root, rel1))
    LakeWrite.deltaCommit(conf, root, 1,
      Seq(LakeWrite.deltaCommitInfo(1700000100000L),
        LakeWrite.deltaRemove("p=1/part-00001.parquet", 1700000100000L),
        LakeWrite.deltaAdd(rel1, size1, 1700000100000L, Map("p" -> "1"))))
    schema
  }

  test("delta log replay: current state, version travel, timestamp travel") {
    val dir = tmpDir("delta-replay")
    buildDeltaFixture(dir)
    val root = new Path(dir.toString)

    val cur = DeltaLite.read(spark, root)
    assert(cur.schema.fieldNames.toSeq == Seq("id", "p", "name"))
    val curIds = cur.select("id").collect().map(_.getLong(0)).sorted
    val expect = (0 until 30).filter(i => i % 3 != 1 || i % 2 == 0).map(_.toLong)
    assert(curIds.toSeq == expect)

    val v0 = DeltaLite.read(spark, root, version = Some(0L))
    assert(v0.count() == 30)
    // timestamp between the two commits resolves to v0
    val byTs = DeltaLite.read(spark, root, timestampMs = Some(1700000050000L))
    assert(byTs.count() == 30)
    val e = intercept[IllegalArgumentException] {
      DeltaLite.snapshot(spark, root, timestampMs = Some(1600000000000L))
    }
    assert(e.getMessage.contains("no Delta commit"))
    // partition column values reconstructed from the log, not the files
    assert(cur.where(col("p") === 2).count() == 10)
  }

  test("delta partition pruning prunes at the metadata level (numFiles metric)") {
    val dir = tmpDir("delta-prune")
    buildDeltaFixture(dir)
    val df = DeltaLite.read(spark, new Path(dir.toString)).where(col("p") === 2)
    // collect() drives df's OWN query execution so the scan metrics populate
    assert(df.collect().length == 10)
    val scans = df.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.head.metrics("numFiles").value == 1,
      s"partition filter should prune 4 of 5 live files, got ${scans.head.metrics("numFiles").value}")
    val all = DeltaLite.read(spark, new Path(dir.toString))
    all.count()
  }

  test("delta checkpoint parquet is used as the replay base") {
    val dir = tmpDir("delta-cp")
    buildDeltaFixture(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    // materialize state-at-v1 as a checkpoint file (single-file layout, like
    // delta's own writer), then drop the JSON commits it supersedes
    val snap = DeltaLite.snapshot(spark, root)
    val lines = Seq(LakeWrite.deltaProtocol(),
      LakeWrite.deltaMetaData("delta-suite-fixture", snap.schema, snap.partitionColumns)) ++
      snap.files.map { f =>
        val rel = f.path.stripPrefix(root.toString).stripPrefix("/")
        val pv = snap.partitionColumns.zip(f.partitionValues.map(String.valueOf)).toMap
        LakeWrite.deltaAdd(rel, f.size, f.modificationTime, pv)
      }
    import spark.implicits._
    val cpDf = spark.read.json(spark.createDataset(lines))
    val fs = root.getFileSystem(conf)
    LakeWrite.writeOneParquetFile(cpDf,
      new Path(root, "_delta_log/00000000000000000001.checkpoint.parquet"))
    fs.delete(new Path(root, "_delta_log/00000000000000000000.json"), false)
    fs.delete(new Path(root, "_delta_log/00000000000000000001.json"), false)

    val cur = DeltaLite.read(spark, root)
    val expect = (0 until 30).filter(i => i % 3 != 1 || i % 2 == 0).map(_.toLong)
    assert(cur.select("id").collect().map(_.getLong(0)).sorted.toSeq == expect)
    assert(DeltaLite.snapshot(spark, root).version == 1L)
  }

  test("delta incomplete multi-part checkpoint is never used as a replay base") {
    val dir = tmpDir("delta-mpcp")
    buildDeltaFixture(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    val expect = (0 until 30).filter(i => i % 3 != 1 || i % 2 == 0).map(_.toLong)

    // state-at-v1 actions with ONE shared schema (a real writer slices one
    // action set across parts), split so part 1 alone misses most adds
    import spark.implicits._
    val snap = DeltaLite.snapshot(spark, root)
    val allLines = Seq(LakeWrite.deltaProtocol(),
      LakeWrite.deltaMetaData("delta-suite-fixture", snap.schema, Seq("p"))) ++
      snap.files.map { f =>
        val rel = f.path.stripPrefix(root.toString).stripPrefix("/")
        LakeWrite.deltaAdd(rel, f.size, f.modificationTime,
          Map("p" -> String.valueOf(f.partitionValues.head)))
      }
    val cpAll = spark.read.json(spark.createDataset(allLines))
    val firstAdd = "p=0/part-00000.parquet"
    LakeWrite.writeOneParquetFile(
      cpAll.where(col("add").isNull || col("add.path") === firstAdd),
      new Path(root, "_delta_log/00000000000000000001.checkpoint.0000000001.0000000002.parquet"))

    // only part 1 of 2 exists -> replay must fall back to the JSON log
    val cur = DeltaLite.read(spark, root)
    assert(cur.select("id").collect().map(_.getLong(0)).sorted.toSeq == expect,
      "incomplete multi-part checkpoint was used as replay base")

    // part 2 lands -> the version is complete and usable; state unchanged
    // even with the superseded JSON commits gone
    LakeWrite.writeOneParquetFile(
      cpAll.where(col("add").isNotNull && col("add.path") =!= firstAdd),
      new Path(root, "_delta_log/00000000000000000001.checkpoint.0000000002.0000000002.parquet"))
    val fs = root.getFileSystem(conf)
    fs.delete(new Path(root, "_delta_log/00000000000000000000.json"), false)
    fs.delete(new Path(root, "_delta_log/00000000000000000001.json"), false)
    val cur2 = DeltaLite.read(spark, root)
    assert(cur2.select("id").collect().map(_.getLong(0)).sorted.toSeq == expect)
  }

  test("delta unsupported features reject clearly") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    // deletion vectors are SUPPORTED since round 7 (DeltaDvSuite) — the
    // snapshot must carry the descriptor rather than reject
    val dir1 = new Path(tmpDir("delta-dv").toString)
    LakeWrite.writeOneParquetFile(Seq((1L, "x")).toDF("id", "name"), new Path(dir1, "f.parquet"))
    LakeWrite.deltaCommit(conf, dir1, 0, Seq(
      LakeWrite.deltaProtocol(3, 7),
      LakeWrite.deltaMetaData("t", StructType(Seq(StructField("id", LongType), StructField("name", StringType))), Nil),
      """{"add":{"path":"f.parquet","partitionValues":{},"size":10,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":10,"cardinality":1}}}"""))
    assert(DeltaLite.snapshot(spark, dir1).dvs.contains("f.parquet"))

    // unsupported reader feature list (v2Checkpoint is SUPPORTED since
    // r10 — the engine writes and replays that form; collations is not)
    val dir2 = new Path(tmpDir("delta-rf").toString)
    LakeWrite.deltaCommit(conf, dir2, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["collations"],"writerFeatures":["collations"]}}""",
      LakeWrite.deltaMetaData("t", StructType(Seq(StructField("id", LongType))), Nil)))
    val e2 = intercept[IllegalArgumentException] { DeltaLite.snapshot(spark, dir2) }
    assert(e2.getMessage.contains("collations"))

    // column mapping is SUPPORTED since round 7 (DeltaCmapSuite) — the
    // snapshot must carry the physical schema rather than reject
    val dir3 = new Path(tmpDir("delta-cm").toString)
    val cmMeta = LakeWrite.deltaMetaData("t",
      StructType(Seq(StructField("id", LongType))), Nil)
      .replace("\"configuration\":{}", "\"configuration\":{\"delta.columnMapping.mode\":\"name\"}")
    LakeWrite.deltaCommit(conf, dir3, 0, Seq(LakeWrite.deltaProtocol(2, 5), cmMeta))
    assert(DeltaLite.snapshot(spark, dir3).physSchema.isDefined)

    // timestampNtz alone is fine
    val dir4 = new Path(tmpDir("delta-ntz").toString)
    LakeWrite.writeOneParquetFile(Seq((1L, "x")).toDF("id", "name"), new Path(dir4, "f.parquet"))
    val st = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    LakeWrite.deltaCommit(conf, dir4, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"],"writerFeatures":["timestampNtz"]}}""",
      LakeWrite.deltaMetaData("t", st, Nil),
      LakeWrite.deltaAdd("f.parquet",
        new java.io.File(dir4.toString, "f.parquet").length(), 0L, Map.empty)))
    assert(DeltaLite.read(spark, dir4).count() == 1)
  }

  // ---- IcebergLite ----

  /** Two-snapshot v2 table: 1001 adds A(id<10) + B(id>=10); 1002 keeps A,
    * deletes B, adds C(id>=10 even). Tag `before` -> 1001.
    */
  private def buildIcebergFixture(dir: java.io.File): Unit = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    new java.io.File(dir, "metadata").mkdirs()
    val full = (0 until 20).map(i => (i.toLong, s"row-$i")).toDF("id", "name")
    def dataFile(rel: String, cond: org.apache.spark.sql.Column): (String, Long, Long) = {
      val d = full.where(cond)
      (rel, LakeWrite.writeOneParquetFile(d, new Path(root, rel)), d.count())
    }
    val a = dataFile("data/a.parquet", $"id" < 10)
    val b = dataFile("data/b.parquet", $"id" >= 10)
    val c = dataFile("data/c.parquet", $"id" >= 10 && $"id" % 2 === 0)
    val m1len = LakeWrite.icebergWriteManifest(new java.io.File(dir, "metadata/m1.avro"),
      Seq(ManifestEntry(1, a._1, a._3, a._2, 1001L), ManifestEntry(1, b._1, b._3, b._2, 1001L)))
    LakeWrite.icebergWriteManifestList(new java.io.File(dir, "metadata/ml1.avro"),
      Seq("metadata/m1.avro" -> m1len), 1001L, 1L)
    val m2len = LakeWrite.icebergWriteManifest(new java.io.File(dir, "metadata/m2.avro"),
      Seq(ManifestEntry(0, a._1, a._3, a._2, 1001L), ManifestEntry(2, b._1, b._3, b._2, 1002L),
        ManifestEntry(1, c._1, c._3, c._2, 1002L)))
    LakeWrite.icebergWriteManifestList(new java.io.File(dir, "metadata/ml2.avro"),
      Seq("metadata/m2.avro" -> m2len), 1002L, 2L)
    LakeWrite.icebergWriteMetadata(conf, root, 2, full.schema,
      Seq(IcebergSnapshot(1001L, 1700000000000L, "metadata/ml1.avro", 1L),
        IcebergSnapshot(1002L, 1700000100000L, "metadata/ml2.avro", 2L)),
      currentSnapshotId = 1002L,
      refs = Map("main" -> (1002L, "branch"), "before" -> (1001L, "tag")))
  }

  test("iceberg snapshot walk: manifest statuses, snapshot/tag/timestamp travel") {
    val dir = tmpDir("ice-walk")
    buildIcebergFixture(dir)
    val root = new Path(dir.toString)

    val cur = IcebergLite.read(spark, root)
    assert(cur.schema.fieldNames.toSeq == Seq("id", "name"))
    val curIds = cur.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(curIds == (0L until 10L) ++ (10 until 20).filter(_ % 2 == 0).map(_.toLong))

    assert(IcebergLite.read(spark, root, version = Some("1001")).count() == 20)
    assert(IcebergLite.read(spark, root, version = Some("before")).count() == 20)
    assert(IcebergLite.read(spark, root, timestampMs = Some(1700000050000L)).count() == 20)
    val e = intercept[Exception] {
      IcebergLite.snapshot(spark, root, timestampMs = Some(1600000000000L))
    }
    assert(e.getMessage.contains("no Iceberg snapshot"))
  }

  test("iceberg delete manifest holding plain data files rejects clearly") {
    val dir = tmpDir("ice-del")
    buildIcebergFixture(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    // a manifest-list entry with content=1 (delete manifest)
    val records = {
      val r = new org.apache.avro.generic.GenericData.Record(LakeWrite.ManifestFileSchema)
      r.put("manifest_path", "metadata/m2.avro"); r.put("manifest_length", 1L)
      r.put("partition_spec_id", 0); r.put("content", 1)
      r.put("sequence_number", 3L); r.put("min_sequence_number", 3L)
      r.put("added_snapshot_id", 1003L)
      r.put("added_files_count", 0); r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0); r.put("added_rows_count", 0L)
      r.put("existing_rows_count", 0L); r.put("deleted_rows_count", 0L)
      Iterator(r: org.apache.avro.generic.GenericRecord)
    }
    AvroLite.writeFile(new java.io.File(dir, "metadata/ml3.avro"),
      LakeWrite.ManifestFileSchema, records)
    LakeWrite.icebergWriteMetadata(conf, root, 3,
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))),
      Seq(IcebergSnapshot(1003L, 1700000200000L, "metadata/ml3.avro", 3L)),
      currentSnapshotId = 1003L)
    // m2.avro is a DATA manifest (entries carry data_file content=0);
    // listing it as a delete manifest is spec-invalid and must not be
    // silently read as deletes
    val e = intercept[UnsupportedOperationException] { IcebergLite.snapshot(spark, root) }
    assert(e.getMessage.contains("delete manifest"))
  }

  /** Identity-partitioned (by p: int) single-snapshot table; when
    * `omitPartitionCol`, data files physically LACK the p column (legal per
    * spec for identity transforms — readers must serve it from metadata).
    */
  private def buildPartitionedIcebergFixture(dir: java.io.File,
      omitPartitionCol: Boolean = false): Unit = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    new java.io.File(dir, "metadata").mkdirs()
    val full = (0 until 30).map(i => (i.toLong, i % 3, s"row-$i")).toDF("id", "p", "name")
    val entrySchema = LakeWrite.manifestEntrySchema(
      """{"type":"record","name":"r102","fields":[
        |{"name":"p","type":["null","int"],"default":null,"field-id":1000}]}"""
        .stripMargin.replaceAll("\n", ""))
    val entries = (0 until 3).map { p =>
      val rel = s"data/p$p.parquet"
      val d0 = full.where($"p" === p)
      val d = if (omitPartitionCol) d0.select("id", "name") else d0
      val size = LakeWrite.writeOneParquetFile(d, new Path(root, rel))
      LakeWrite.ManifestEntry(1, rel, d0.count(), size, 2001L, Map("p" -> p))
    }
    val mlen = LakeWrite.icebergWriteManifest(new java.io.File(dir, "metadata/m1.avro"),
      entries, entrySchema)
    LakeWrite.icebergWriteManifestList(new java.io.File(dir, "metadata/ml1.avro"),
      Seq("metadata/m1.avro" -> mlen), 2001L, 1L)
    LakeWrite.icebergWriteMetadata(conf, root, 1, full.schema,
      Seq(IcebergSnapshot(2001L, 1700000000000L, "metadata/ml1.avro", 1L)),
      currentSnapshotId = 2001L,
      specFields = Seq(org.json4s.JObject(
        "name" -> org.json4s.JString("p"),
        "transform" -> org.json4s.JString("identity"),
        "source-id" -> org.json4s.JInt(2),
        "field-id" -> org.json4s.JInt(1000))))
  }

  test("iceberg identity-partition pruning fires at the metadata level") {
    val dir = tmpDir("ice-prune")
    buildPartitionedIcebergFixture(dir)
    val root = new Path(dir.toString)
    val all = IcebergLite.read(spark, root)
    assert(all.schema.fieldNames.toSeq == Seq("id", "p", "name"),
      "declared column order must survive the partition-schema split")
    assert(all.count() == 30)
    // partition values served from manifest metadata agree with the data
    assert(all.where(col("p") === 2).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0 until 30).filter(_ % 3 == 2).map(_.toLong))
    val df = IcebergLite.read(spark, root).where(col("p") === 2)
    assert(df.collect().length == 10)
    val scans = df.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.head.metrics("numFiles").value == 1,
      s"identity filter should prune 2 of 3 files, got ${scans.head.metrics("numFiles").value}")
  }

  test("iceberg identity columns omitted from data files are served from metadata") {
    val dir = tmpDir("ice-omit")
    buildPartitionedIcebergFixture(dir, omitPartitionCol = true)
    val all = IcebergLite.read(spark, new Path(dir.toString))
    // name-based parquet resolution alone would surface p as all-NULL here
    assert(all.where(col("p").isNull).count() == 0)
    assert(all.groupBy("p").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).toSeq ==
      Seq(0 -> 10L, 1 -> 10L, 2 -> 10L))
  }

  test("iceberg metadata with a dangling current-schema-id is rejected, never guessed") {
    val dir = tmpDir("ice-badschema")
    buildIcebergFixture(dir)
    val metaFile = new java.io.File(dir, "metadata/v2.metadata.json")
    val txt = new String(java.nio.file.Files.readAllBytes(metaFile.toPath), "UTF-8")
    val patched = txt.replaceAll("\"current-schema-id\"(\\s*):(\\s*)0",
      "\"current-schema-id\"$1:$2 77")
    assert(patched != txt)
    java.nio.file.Files.write(metaFile.toPath, patched.getBytes("UTF-8"))
    new java.io.File(dir, "metadata/.v2.metadata.json.crc").delete()
    val e = intercept[IllegalStateException] {
      IcebergLite.read(spark, new Path(dir.toString)).collect()
    }
    assert(e.getMessage.contains("current-schema-id"), e.getMessage)
  }

  test("iceberg rename with id-less parquet files fails loudly, never null-fills") {
    val dir = tmpDir("ice-rename")
    buildIcebergFixture(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val metaFile = new java.io.File(dir, "metadata/v2.metadata.json")
    val meta = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(metaFile.toPath), "UTF-8"))
    // append a renamed-schema generation: field id 2 `name` -> `title`
    val renamed = JsonMethods.parse(
      """{"type":"struct","schema-id":1,"fields":[
        |{"id":1,"name":"id","required":false,"type":"long"},
        |{"id":2,"name":"title","required":false,"type":"string"}]}"""
        .stripMargin.replaceAll("\n", ""))
    val patched = meta.transformField {
      case org.json4s.JField("schemas", org.json4s.JArray(ss)) =>
        org.json4s.JField("schemas", org.json4s.JArray(ss :+ renamed))
      case org.json4s.JField("current-schema-id", _) =>
        org.json4s.JField("current-schema-id", org.json4s.JInt(1))
    }
    java.nio.file.Files.write(metaFile.toPath,
      JsonMethods.pretty(JsonMethods.render(patched)).getBytes("UTF-8"))
    // the fixture wrote through Hadoop's checksummed local FS; drop the now
    // stale .crc sidecar for the out-of-band rewrite above
    new java.io.File(dir, "metadata/.v2.metadata.json.crc").delete()
    // the rename itself is supported now (field-id resolution) — but this
    // fixture's parquet files carry NO field ids, so the scan must fail
    // loudly instead of silently null-filling the renamed column
    val df = IcebergLite.read(spark, new Path(dir.toString))
    assert(df.schema.fieldNames.toSeq == Seq("id", "title"))
    val e = intercept[Throwable] { df.select("title").collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.toLowerCase.contains("field id")),
      s"expected a loud missing-field-id error, got: ${chain(e).mkString(" <- ")}")
  }

  test("iceberg raw metadata paths with spaces and percent signs resolve") {
    val dir = new Path("/warehouse/my data/t")
    assert(IcebergLite.resolveUri(dir, "data/part 1.parquet").toString
      .endsWith("my data/t/data/part 1.parquet"))
    assert(IcebergLite.resolveUri(dir, "/abs/100%25ok/f.parquet").toString ==
      "/abs/100%25ok/f.parquet")
    assert(IcebergLite.resolveUri(dir, "file:/abs/x.parquet").toString ==
      "file:/abs/x.parquet")
  }

  test("lake scans push filters and prune columns like any parquet table") {
    val dDir = tmpDir("delta-push"); buildDeltaFixture(dDir)
    val dPlan = DeltaLite.read(spark, new Path(dDir.toString))
      .where(col("id") > 5).select("id")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(dPlan.contains("PushedFilters:") && dPlan.contains("GreaterThan(id,5)"),
      s"delta scan did not push the filter:\n$dPlan")
    assert(dPlan.contains("ReadSchema: struct<id:bigint>"),
      s"delta scan did not prune columns:\n$dPlan")

    val iDir = tmpDir("ice-push"); buildIcebergFixture(iDir)
    val iPlan = IcebergLite.read(spark, new Path(iDir.toString))
      .where(col("id") > 5).select("id")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(iPlan.contains("PushedFilters:") && iPlan.contains("GreaterThan(id,5)"),
      s"iceberg scan did not push the filter:\n$iPlan")
    assert(iPlan.contains("ReadSchema: struct<id:bigint>"),
      s"iceberg scan did not prune columns:\n$iPlan")
  }

  // ---- catalog + SQL integration (lite units route when jars are absent) ----

  test("delta and iceberg lite tables read through the graft catalog SQL surface") {
    val lakeRoot = tmpDir("lake-cat")
    val deltaDir = new java.io.File(lakeRoot, "events_d"); deltaDir.mkdirs()
    buildDeltaFixture(deltaDir)
    val iceDir = new java.io.File(lakeRoot, "events_i"); iceDir.mkdirs()
    buildIcebergFixture(iceDir)

    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE dlake OPTIONS (path '$lakeRoot') " +
      "NAMESPACE graft.datasource.lakelite")
    spark.sql(s"REGISTER OR REPLACE ICEBERG DATASOURCE ilake OPTIONS (warehouse '$lakeRoot') " +
      "NAMESPACE graft.datasource.lakelite")
    try {
      val d = spark.sql(
        "SELECT COUNT(*) FROM graft.datasource.lakelite.dlake.events_d WHERE p = 2").head.getLong(0)
      assert(d == 10)
      val i = spark.sql(
        "SELECT COUNT(*) FROM graft.datasource.lakelite.ilake.events_i").head.getLong(0)
      assert(i == 15)
      // SQL time travel (Iceberg-only routing, reference parity)
      val v = spark.sql(
        "SELECT COUNT(*) FROM graft.datasource.lakelite.ilake.events_i VERSION AS OF '1001'")
        .head.getLong(0)
      assert(v == 20)
      val tag = spark.sql(
        "SELECT COUNT(*) FROM graft.datasource.lakelite.ilake.events_i VERSION AS OF 'before'")
        .head.getLong(0)
      assert(tag == 20)
      val ts = spark.sql(
        "SELECT COUNT(*) FROM graft.datasource.lakelite.ilake.events_i " +
          "TIMESTAMP AS OF '2023-11-14 22:14:10'") // between the two snapshots
        .head.getLong(0)
      assert(ts == 20)
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM graft.datasource.lakelite.dlake.events_d VERSION AS OF '0'").collect()
      }
      assert(e.getMessage.toLowerCase.contains("time travel"))
      // listTables surfaces both
      val d2 = spark.sql("SHOW TABLES IN graft.datasource.lakelite.dlake")
        .select("tableName").collect().map(_.getString(0)).toSet
      assert(d2.contains("events_d"))
    } finally spark.sql("DROP NAMESPACE IF EXISTS graft.datasource.lakelite CASCADE")
  }
}
