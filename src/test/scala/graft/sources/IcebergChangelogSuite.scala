package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

import java.nio.file.Files

/** Incremental changelog over the native Iceberg reader
  * ([[IcebergLite.changes]]): per-snapshot insert/delete derivation from
  * the parent lineage, position-delete row-level deltas, `replace`
  * (compaction) snapshots staying silent, exclusive-start sub-ranges, and
  * the end-to-end feed over a table written entirely by the NATIVE SQL
  * writers (CREATE/INSERT/DELETE/OPTIMIZE), whose commits now record
  * parent ids and operations.
  */
class IcebergChangelogSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  test("changelog over a natively-written table: insert, delete, optimize, overwrite") {
    val base = tmpDir("ice-chg")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE icw OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.icechgsuite")
    val fqn = "graft.datasource.icechgsuite.icw.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 10 FROM range(10)")   // snap 1: append
    spark.sql(s"DELETE FROM $fqn WHERE id >= 8")                       // snap 2: overwrite (CoW)
    graft.Graft.sql(spark, s"OPTIMIZE LAKE TABLE $fqn TARGET 1 FILES") // snap 3: replace
    spark.sql(s"INSERT INTO $fqn VALUES (99, 990)")                    // snap 4: append

    val dir = new Path(base.getPath, "t")
    val feed = IcebergLite.changes(spark, dir)
      .select("id", "v", "_change_type", "_change_ordinal")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .toSeq.sorted

    // ordinals: 0 = first append, 1 = delete, 2 = optimize (silent), 3 = append
    def at(ord: Int, ct: String): Set[(Int, Int)] =
      feed.filter(t => t._4 == ord && t._3 == ct).map(t => (t._1, t._2)).toSet
    assert(at(0, "insert") == (0 until 10).map(i => (i, i * 10)).toSet)
    assert(at(0, "delete").isEmpty)
    // the CoW delete is FILE-granular: only files holding a matching row
    // rewrite, their survivors re-enter — the net change must be exactly
    // the deleted keys, and untouched files contribute nothing
    assert(at(1, "delete").map(_._1).contains(8))
    assert((at(1, "delete") -- at(1, "insert")) == Set((8, 80), (9, 90)))
    assert((at(1, "insert") -- at(1, "delete")).isEmpty)
    assert(feed.count(_._4 == 2) == 0) // optimize (replace) is silent
    assert(at(3, "insert") == Set((99, 990)) && at(3, "delete").isEmpty)
  }

  test("replace-only range is empty; ordinals restart per requested range") {
    val base = tmpDir("ice-chg2")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE icw2 OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.icechgsuite")
    val fqn = "graft.datasource.icechgsuite.icw2.t"
    spark.sql(s"CREATE TABLE $fqn (id INT)")
    spark.sql(s"INSERT INTO $fqn SELECT CAST(id AS INT) FROM range(6)")
    spark.sql(s"INSERT INTO $fqn VALUES (100)")
    graft.Graft.sql(spark, s"OPTIMIZE LAKE TABLE $fqn TARGET 1 FILES")
    val dir = new Path(base.getPath, "t")
    val meta = IcebergLite.snapshot(spark, dir)
    val all = IcebergLite.changes(spark, dir)
    // three snapshots: two appends + one replace; the replace adds nothing
    assert(all.count() == 7)
    assert(all.where(col("_change_type") =!= "insert").count() == 0)
    // exclusive-start from the FIRST append: only the second append's row
    val first = all.where(col("_change_ordinal") === 0)
      .select("_commit_snapshot_id").distinct().head().getLong(0)
    val sub = IcebergLite.changes(spark, dir, fromSnapshot = Some(first))
    assert(sub.select("id").collect().map(_.getInt(0)).toSeq == Seq(100))
    assert(sub.head().getAs[Int]("_change_ordinal") == 0)
    // replace-only range (start = snapshot before the optimize)
    val second = sub.select("_commit_snapshot_id").head().getLong(0)
    val opt = IcebergLite.changes(spark, dir, fromSnapshot = Some(second))
    assert(opt.count() == 0)
    assert(opt.columns.contains("_change_type"))
    // end pinned to the current snapshot id equals the default read
    val pinned = IcebergLite.changes(spark, dir, toSnapshot = Some(meta.snapshotId))
    assert(pinned.count() == all.count())
  }

  test("position-delete commit surfaces exactly the newly-masked rows") {
    // reuse the gate fixture shape: hand-built three-snapshot MOR table
    import graft.sources.lake.LakeWrite.{IcebergSnapshot, ManifestEntry, ManifestFile}
    import spark.implicits._
    val staging = tmpDir("ice-chg-mor")
    new java.io.File(staging, "metadata").mkdirs()
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(staging.toString)
    val d = (0 until 10).map(i => (i.toLong, i.toString)).toDF("id", "s")
    val size = LakeWrite.writeOneParquetFile(
      d.coalesce(1).sortWithinPartitions("id"), new Path(root, "data/a.parquet"))
    val a = ManifestEntry(1, "data/a.parquet", 10L, size, 9001L)
    val dSize = LakeWrite.writeOneParquetFile(
      Seq(("data/a.parquet", 2L), ("data/a.parquet", 5L)).toDF("file_path", "pos").coalesce(1),
      new Path(root, "data/del.parquet"))
    val m1 = LakeWrite.icebergWriteManifest(new java.io.File(staging, "metadata/m1.avro"), Seq(a))
    val md = LakeWrite.icebergWriteManifest(new java.io.File(staging, "metadata/md.avro"),
      Seq(ManifestEntry(1, "data/del.parquet", 2L, dSize, 9002L, content = 1)))
    LakeWrite.icebergWriteManifestListEntries(new java.io.File(staging, "metadata/ml1.avro"),
      Seq(ManifestFile("metadata/m1.avro", m1, 0, 1L)), 9001L)
    LakeWrite.icebergWriteManifestListEntries(new java.io.File(staging, "metadata/ml2.avro"),
      Seq(ManifestFile("metadata/m1.avro", m1, 0, 1L),
        ManifestFile("metadata/md.avro", md, 1, 2L)), 9002L)
    LakeWrite.icebergWriteMetadata(conf, root, 2, d.schema,
      Seq(IcebergSnapshot(9001L, 1700000000000L, "metadata/ml1.avro", 1L),
        IcebergSnapshot(9002L, 1700000100000L, "metadata/ml2.avro", 2L,
          parentId = Some(9001L), operation = "delete")),
      currentSnapshotId = 9002L)

    val feed = IcebergLite.changes(spark, root)
      .select("id", "_change_type", "_commit_snapshot_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    val expected = ((0L until 10L).map((_, "insert", 9001L)) ++
      Seq((2L, "delete", 9002L), (5L, "delete", 9002L))).sorted
    assert(feed == expected)
  }

  test("a non-ancestor start snapshot and an expired lineage are rejected") {
    val base = tmpDir("ice-chg3")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE icw3 OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.icechgsuite")
    val fqn = "graft.datasource.icechgsuite.icw3.t"
    spark.sql(s"CREATE TABLE $fqn (id INT)")
    spark.sql(s"INSERT INTO $fqn VALUES (1)")
    val dir = new Path(base.getPath, "t")
    val ex = intercept[IllegalArgumentException] {
      IcebergLite.changes(spark, dir, fromSnapshot = Some(123456789L))
    }
    assert(ex.getMessage.contains("not an ancestor") ||
      ex.getMessage.contains("expired"))
  }
}
