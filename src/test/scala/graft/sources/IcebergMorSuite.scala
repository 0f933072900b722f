package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.sources.lake.LakeWrite.{IcebergSnapshot, ManifestEntry, ManifestFile}

import java.nio.file.Files

/** IcebergLite v2 merge-on-read: position-delete application as a
  * distributed anti-join on (file identity, `_metadata.row_index`) with
  * sequence-number gating, plus the documented rejections (equality
  * deletes) and the path-spelling normalization contract between data
  * manifests and delete-file contents.
  */
class IcebergMorSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  /** Three-snapshot v2 table over rows (id: 0..19, name):
    *  - snap 3001 / seq 1: data files A (ids 0..9) + B (ids 10..19), both
    *    written in id order so position == rank.
    *  - snap 3002 / seq 2: position-delete file D covering A positions
    *    {1,3,5}, B position {0}, and ALSO C position {0} — C does not
    *    exist yet, so that entry must be sequence-gated out, never applied.
    *  - snap 3003 / seq 3: data file C (ids 100,101) added AFTER the
    *    delete; its rows must all survive.
    * `deleteSpelling` rewrites the file_path strings stored inside D, to
    * exercise spelling divergence between manifests and delete contents.
    */
  private def buildMorFixture(dir: java.io.File,
      deleteSpelling: String => String = identity): Unit = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    new java.io.File(dir, "metadata").mkdirs()
    val full = (0 until 20).map(i => (i.toLong, s"row-$i")).toDF("id", "name")
    def dataFile(rel: String, d: org.apache.spark.sql.DataFrame): ManifestEntry = {
      val size = LakeWrite.writeOneParquetFile(d.coalesce(1).sortWithinPartitions("id"),
        new Path(root, rel))
      ManifestEntry(1, rel, d.count(), size, 0L)
    }
    val a = dataFile("data/a.parquet", full.where($"id" < 10))
    val b = dataFile("data/b.parquet", full.where($"id" >= 10))
    val c = dataFile("data/c.parquet", Seq((100L, "row-100"), (101L, "row-101")).toDF("id", "name"))

    val delRows = Seq(
      ("data/a.parquet", 1L), ("data/a.parquet", 3L), ("data/a.parquet", 5L),
      ("data/b.parquet", 0L),
      ("data/c.parquet", 0L)) // seq-gated: C arrives later
      .map { case (p, pos) => (deleteSpelling(p), pos) }
      .toDF("file_path", "pos")
    val dSize = LakeWrite.writeOneParquetFile(delRows.coalesce(1), new Path(root, "data/d1.parquet"))

    val m1len = LakeWrite.icebergWriteManifest(new java.io.File(dir, "metadata/m1.avro"),
      Seq(a.copy(snapshotId = 3001L), b.copy(snapshotId = 3001L)))
    val md1len = LakeWrite.icebergWriteManifest(new java.io.File(dir, "metadata/md1.avro"),
      Seq(ManifestEntry(1, "data/d1.parquet", 5L, dSize, 3002L, content = 1)))
    val m3len = LakeWrite.icebergWriteManifest(new java.io.File(dir, "metadata/m3.avro"),
      Seq(c.copy(snapshotId = 3003L)))

    LakeWrite.icebergWriteManifestList(new java.io.File(dir, "metadata/ml1.avro"),
      Seq("metadata/m1.avro" -> m1len), 3001L, 1L)
    LakeWrite.icebergWriteManifestListEntries(new java.io.File(dir, "metadata/ml2.avro"),
      Seq(ManifestFile("metadata/m1.avro", m1len, 0, 1L),
        ManifestFile("metadata/md1.avro", md1len, 1, 2L)), 3002L)
    LakeWrite.icebergWriteManifestListEntries(new java.io.File(dir, "metadata/ml3.avro"),
      Seq(ManifestFile("metadata/m1.avro", m1len, 0, 1L),
        ManifestFile("metadata/m3.avro", m3len, 0, 3L),
        ManifestFile("metadata/md1.avro", md1len, 1, 2L)), 3003L)
    LakeWrite.icebergWriteMetadata(conf, root, 3, full.schema,
      Seq(IcebergSnapshot(3001L, 1700000000000L, "metadata/ml1.avro", 1L),
        IcebergSnapshot(3002L, 1700000100000L, "metadata/ml2.avro", 2L),
        IcebergSnapshot(3003L, 1700000200000L, "metadata/ml3.avro", 3L)),
      currentSnapshotId = 3003L)
  }

  private val expectedCurrentIds: Seq[Long] =
    (0L until 10L).filterNot(Set(1L, 3L, 5L)) ++ (11L until 20L) ++ Seq(100L, 101L)

  test("position deletes apply by (file, row ordinal) with sequence gating") {
    import spark.implicits._
    val dir = tmpDir("ice-mor")
    buildMorFixture(dir)
    val root = new Path(dir.toString)
    val cur = IcebergLite.read(spark, root)
    assert(cur.schema.fieldNames.toSeq == Seq("id", "name"),
      "internal MOR columns must not leak into the visible schema")
    val ids = cur.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == expectedCurrentIds)
    // names stayed aligned with ids through the anti-join
    assert(cur.where($"id" === 7L).select("name").head.getString(0) == "row-7")

    // time travel: before the delete commit nothing is masked
    assert(IcebergLite.read(spark, root, version = Some("3001")).count() == 20)
    // at the delete commit: A/B masked, C not yet present
    val midIds = IcebergLite.read(spark, root, version = Some("3002"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(midIds == (0L until 10L).filterNot(Set(1L, 3L, 5L)) ++ (11L until 20L))
  }

  test("filters pushed below the anti-join still delete the right rows") {
    import spark.implicits._
    val dir = tmpDir("ice-mor-f")
    buildMorFixture(dir)
    val cur = IcebergLite.read(spark, new Path(dir.toString))
    // row-group/page skipping from a pushed filter must not desync row
    // ordinals (Spark's _metadata.row_index contract)
    val got = cur.where($"id" >= 4L && $"id" < 12L).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(4L, 6L, 7L, 8L, 9L, 11L))
  }

  test("mismatched spellings do not cross-match; scheme variants do collapse") {
    // relative manifest spelling vs absolute delete spelling: different
    // table-root opinions, keys differ, nothing may be deleted
    val dir = tmpDir("ice-mor-s")
    buildMorFixture(dir, deleteSpelling = rel => s"file://${dir.getAbsolutePath}/$rel")
    val ids0 = IcebergLite.read(spark, new Path(dir.toString))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids0 == (0L until 20L) ++ Seq(100L, 101L))

    // absolute manifests with file:/ single-slash spelling vs delete
    // contents with file:// double-slash spelling: keys must collapse
    val dir2 = tmpDir("ice-mor-s2")
    buildMorFixtureAbsolute(dir2)
    val ids = IcebergLite.read(spark, new Path(dir2.toString))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 10L).filterNot(Set(1L, 3L, 5L)) ++ (11L until 20L))
  }

  /** Like buildMorFixture but two snapshots only (no C), manifests store
    * `file:/abs` single-slash URIs and the delete file stores `file://abs`
    * double-slash URIs.
    */
  private def buildMorFixtureAbsolute(dir: java.io.File): Unit = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    new java.io.File(dir, "metadata").mkdirs()
    val full = (0 until 20).map(i => (i.toLong, s"row-$i")).toDF("id", "name")
    def dataFile(rel: String, d: org.apache.spark.sql.DataFrame): ManifestEntry = {
      val size = LakeWrite.writeOneParquetFile(d.coalesce(1).sortWithinPartitions("id"),
        new Path(root, rel))
      ManifestEntry(1, s"file:${dir.getAbsolutePath}/$rel", d.count(), size, 3001L)
    }
    val a = dataFile("data/a.parquet", full.where($"id" < 10))
    val b = dataFile("data/b.parquet", full.where($"id" >= 10))
    val delRows = Seq(
      (s"file://${dir.getAbsolutePath}/data/a.parquet", 1L),
      (s"file://${dir.getAbsolutePath}/data/a.parquet", 3L),
      (s"file://${dir.getAbsolutePath}/data/a.parquet", 5L),
      (s"file://${dir.getAbsolutePath}/data/b.parquet", 0L))
      .toDF("file_path", "pos")
    val dSize = LakeWrite.writeOneParquetFile(delRows.coalesce(1), new Path(root, "data/d1.parquet"))
    val m1len = LakeWrite.icebergWriteManifest(new java.io.File(dir, "metadata/m1.avro"),
      Seq(a, b))
    val md1len = LakeWrite.icebergWriteManifest(new java.io.File(dir, "metadata/md1.avro"),
      Seq(ManifestEntry(1, s"file:${dir.getAbsolutePath}/data/d1.parquet", 4L, dSize, 3002L,
        content = 1)))
    LakeWrite.icebergWriteManifestListEntries(new java.io.File(dir, "metadata/ml1.avro"),
      Seq(ManifestFile("metadata/m1.avro", m1len, 0, 1L),
        ManifestFile("metadata/md1.avro", md1len, 1, 2L)), 3002L)
    LakeWrite.icebergWriteMetadata(conf, root, 1, full.schema,
      Seq(IcebergSnapshot(3002L, 1700000100000L, "metadata/ml1.avro", 2L)),
      currentSnapshotId = 3002L)
  }

  test("one file carrying ~1M position deletes reads exactly (agg buffer stays container-bounded)") {
    val base = tmpDir("ice-mor-1m")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE mor1m OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.mor1m")
    val fqn = "graft.datasource.mor1m.mor1m.t"
    spark.sql(s"CREATE TABLE $fqn (id BIGINT) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    // ONE data file so all deletes land in one file's bitmap
    spark.range(0, 1200000).coalesce(1).createOrReplaceTempView("__mor1m_src")
    spark.sql(s"INSERT INTO $fqn SELECT id FROM __mor1m_src")
    val dir = new Path(base.getPath, "t")
    assert(IcebergLite.snapshot(spark, dir).files.size == 1)
    spark.sql(s"DELETE FROM $fqn WHERE id < 1000000") // 1M position deletes
    val t = spark.table(fqn)
    assert(t.count() == 200000L)
    val mm = t.agg(org.apache.spark.sql.functions.min("id"),
      org.apache.spark.sql.functions.max("id")).head()
    assert(mm.getLong(0) == 1000000L && mm.getLong(1) == 1199999L)
    // the survivors are exactly the un-deleted suffix (spot the boundary)
    assert(t.where("id IN (999999, 1000000)").count() == 1L)
  }

  test("equality-delete files without equality_ids reject as spec-invalid") {
    val dir = tmpDir("ice-eqdel")
    buildMorFixture(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    val mdLen = LakeWrite.icebergWriteManifest(new java.io.File(dir, "metadata/mdeq.avro"),
      Seq(ManifestEntry(1, "data/d1.parquet", 1L, 10L, 4001L, content = 2)))
    LakeWrite.icebergWriteManifestListEntries(new java.io.File(dir, "metadata/ml4.avro"),
      Seq(ManifestFile("metadata/mdeq.avro", mdLen, 1, 4L)), 4001L)
    LakeWrite.icebergWriteMetadata(conf, root, 4,
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))),
      Seq(IcebergSnapshot(4001L, 1700000300000L, "metadata/ml4.avro", 4L)),
      currentSnapshotId = 4001L)
    val e = intercept[IllegalStateException] { IcebergLite.snapshot(spark, root) }
    assert(e.getMessage.contains("equality_ids"))
  }

  test("normPath column expression agrees with the driver-side function") {
    import spark.implicits._
    val spellings = Seq(
      "file:/a/b c.parquet", "file:///a/b c.parquet", "/a/b c.parquet",
      "s3://bucket/k/x.parquet", "s3a://bucket/k/x.parquet",
      "hdfs://nn:8020/w/t/f.parquet", "data/rel.parquet",
      "weird+x-1.2://h/p.parquet", "abfss://c@acct.dfs.core.windows.net/p.parquet")
    val fromCol = spellings.toDF("p")
      .select(IcebergLite.normPathColumn(col("p")))
      .collect().map(_.getString(0)).toSeq
    assert(fromCol == spellings.map(IcebergLite.normPath))
    // scheme variants collapse to the same key
    assert(IcebergLite.normPath("file:/a/b.parquet") == IcebergLite.normPath("file:///a/b.parquet"))
    assert(IcebergLite.normPath("data/rel.parquet") == "data/rel.parquet")
  }
}
