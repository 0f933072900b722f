package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

import java.nio.file.Files

/** OPTIMIZE LAKE TABLE: file compaction over the native lake tables via
  * the copy-on-write commit — content must be byte-identical before and
  * after, file counts must drop, already-large files must not move,
  * history must stay readable, and ZORDER must produce range-disjoint
  * files along the curve.
  */
class LakeOptimizeSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  test("delta: compaction shrinks file count, preserves content and history") {
    import spark.implicits._
    val root = tmpDir("opt-delta")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE optd OPTIONS (path '$root') " +
      "NAMESPACE graft.datasource.opt")
    spark.sql("CREATE TABLE graft.datasource.opt.optd.t (id BIGINT, v STRING, p INT) " +
      "PARTITIONED BY (p)")
    // three small inserts -> many small files per partition
    (0 until 3).foreach { k =>
      (0L until 20L).map(i => (k * 100L + i, s"v$k-$i", (i % 2).toInt)).toDF("id", "v", "p")
        .createOrReplaceTempView(s"__opt_src_$k")
      spark.sql(s"INSERT INTO graft.datasource.opt.optd.t SELECT * FROM __opt_src_$k")
    }
    val dir = new Path(s"$root/t")
    val before = DeltaLite.snapshot(spark, dir)
    val contentBefore = spark.table("graft.datasource.opt.optd.t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq

    val res = spark.sql("OPTIMIZE LAKE TABLE graft.datasource.opt.optd.t").head()
    assert(res.getLong(0) == before.fileIds.size,
      "every small file should be compacted")

    val after = DeltaLite.snapshot(spark, dir)
    // one partition value -> one file
    assert(after.fileIds.size == 2, s"expected 2 files, got ${after.fileIds}")
    val contentAfter = spark.table("graft.datasource.opt.optd.t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(contentAfter == contentBefore, "compaction must not change content")
    // pre-compaction version still readable
    assert(DeltaLite.read(spark, dir, version = Some(before.version)).count() == 60)

    // second OPTIMIZE is a no-op (one file per partition already)
    val res2 = spark.sql("OPTIMIZE LAKE TABLE graft.datasource.opt.optd.t").head()
    assert(res2.getLong(0) == 0L)
  }

  test("delta: SMALLER THAN spares files at or above the threshold") {
    import spark.implicits._
    val root = tmpDir("opt-delta-thr")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE optt OPTIONS (path '$root') " +
      "NAMESPACE graft.datasource.opt")
    spark.sql("CREATE TABLE graft.datasource.opt.optt.t (id BIGINT, v STRING)")
    (0 until 3).foreach { k =>
      Seq((k.toLong, s"v$k")).toDF("id", "v").createOrReplaceTempView(s"__optt_src_$k")
      spark.sql(s"INSERT INTO graft.datasource.opt.optt.t SELECT * FROM __optt_src_$k")
    }
    val dir = new Path(s"$root/t")
    val before = DeltaLite.snapshot(spark, dir)
    assert(before.fileIds.size == 3)
    // a 1-byte threshold spares everything -> no-op, same version
    val res = spark.sql(
      "OPTIMIZE LAKE TABLE graft.datasource.opt.optt.t SMALLER THAN 1").head()
    assert(res.getLong(0) == 0L)
    assert(DeltaLite.snapshot(spark, dir).version == before.version)
  }

  test("delta: ZORDER BY produces range-clustered files") {
    import spark.implicits._
    val root = tmpDir("opt-delta-z")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE optz OPTIONS (path '$root') " +
      "NAMESPACE graft.datasource.opt")
    spark.sql("CREATE TABLE graft.datasource.opt.optz.t (x INT, y INT, v STRING)")
    // shuffled 32x32 grid in one insert
    val rnd = new scala.util.Random(7)
    rnd.shuffle((0 until 32).flatMap(x => (0 until 32).map(y => (x, y, s"$x-$y"))))
      .toDF("x", "y", "v").createOrReplaceTempView("__optz_src")
    spark.sql("INSERT INTO graft.datasource.opt.optz.t SELECT * FROM __optz_src")

    spark.sql("OPTIMIZE LAKE TABLE graft.datasource.opt.optz.t TARGET 4 FILES ZORDER BY (x, y)")
    val dir = new Path(s"$root/t")
    val snap = DeltaLite.snapshot(spark, dir)
    assert(snap.fileIds.size == 4, s"expected 4 z-ordered files, got ${snap.fileIds}")
    assert(spark.table("graft.datasource.opt.optz.t").count() == 1024)
    // each file's bounding box must cover far less than the full grid: the
    // z-curve at 4 range partitions keeps both dims clustered
    val spans = snap.files.map { f =>
      val d = spark.read.parquet(f.path)
      val r = d.agg(min("x"), max("x"), min("y"), max("y")).head()
      (r.getInt(1) - r.getInt(0) + 1).toLong * (r.getInt(3) - r.getInt(2) + 1)
    }
    assert(spans.forall(_ <= 512), s"per-file bounding boxes too loose: $spans")
  }

  test("iceberg: compaction shrinks file count, preserves content and sequence history") {
    import spark.implicits._
    val root = tmpDir("opt-ice")
    graft.Graft.install(spark, warehouseDir)
    spark.sql(s"REGISTER OR REPLACE ICEBERG DATASOURCE opti OPTIONS (warehouse '$root') " +
      "NAMESPACE graft.datasource.opt")
    spark.sql("CREATE TABLE graft.datasource.opt.opti.t (id BIGINT, v STRING, p INT) " +
      "PARTITIONED BY (p)")
    (0 until 3).foreach { k =>
      (0L until 20L).map(i => (k * 100L + i, s"v$k-$i", (i % 2).toInt)).toDF("id", "v", "p")
        .createOrReplaceTempView(s"__opti_src_$k")
      spark.sql(s"INSERT INTO graft.datasource.opt.opti.t SELECT * FROM __opti_src_$k")
    }
    val dir = new Path(s"$root/t")
    val before = IcebergLite.snapshot(spark, dir)
    val contentBefore = spark.table("graft.datasource.opt.opti.t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq

    val res = spark.sql("OPTIMIZE LAKE TABLE graft.datasource.opt.opti.t").head()
    assert(res.getLong(0) == before.files.size)

    val after = IcebergLite.snapshot(spark, dir)
    assert(after.files.size == 2, s"expected 2 files, got ${after.files.size}")
    val contentAfter = spark.table("graft.datasource.opt.opti.t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(contentAfter == contentBefore)
    // time travel to the pre-compaction snapshot
    assert(IcebergLite.read(spark, dir, version = Some(before.snapshotId.toString))
      .count() == 60)
  }
}
