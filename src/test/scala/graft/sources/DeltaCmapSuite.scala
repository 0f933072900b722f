package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

import java.nio.file.Files

/** DeltaLite column mapping (modes `name` and `id`): parquet data columns
  * and add-action partitionValues keys resolve by each field's PHYSICAL
  * name from the schema metadata; logical names restore via one cast+alias
  * projection, recursively through nested structs. Also: logical renames
  * (the feature's whole point) are invisible to the physical layer, and
  * the mapping composes with deletion vectors.
  *
  * reference: the reference delegates all Delta IO to delta-spark
  * (spark/spark-common/.../AbstractDeltaCatalogUnit.scala:29-80); this
  * native path follows the public Delta protocol's column-mapping spec.
  */
class DeltaCmapSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  private def meta(phys: String, id: Long): Metadata = new MetadataBuilder()
    .putString("delta.columnMapping.physicalName", phys)
    .putLong("delta.columnMapping.id", id).build()

  /** Logical schema k INT, s STRUCT<x INT, y STRING>, p STRING (partition),
    * physically col-k1 / col-s(col-x, col-y) / col-p.
    */
  private def nestedLogical: StructType = StructType(Seq(
    StructField("k", IntegerType, nullable = true, meta("col-k1", 1)),
    StructField("s", StructType(Seq(
      StructField("x", IntegerType, nullable = true, meta("col-x", 3)),
      StructField("y", StringType, nullable = true, meta("col-y", 4)))),
      nullable = true, meta("col-s", 2)),
    StructField("p", StringType, nullable = true, meta("col-p", 5))))

  private def physRows(rs: Seq[(Int, Int, String)]) = {
    import spark.implicits._
    rs.toDF("k", "x", "y").select(col("k").as("col-k1"),
      struct(col("x").as("col-x"), col("y").as("col-y")).as("col-s"))
  }

  private def buildNested(dir: java.io.File, mode: String): Path = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    val s1 = LakeWrite.writeOneParquetFile(
      physRows(Seq((1, 10, "a"), (2, 20, "b"))), new Path(root, "f1.parquet"))
    val s2 = LakeWrite.writeOneParquetFile(
      physRows(Seq((3, 30, "c"))), new Path(root, "f2.parquet"))
    LakeWrite.deltaCommit(conf, root, 0, Seq(
      LakeWrite.deltaCommitInfo(1700000000000L),
      LakeWrite.deltaProtocol(minReader = 2, minWriter = 5),
      LakeWrite.deltaMetaData("cmap-fixture", nestedLogical, Seq("p"),
        Map("delta.columnMapping.mode" -> mode, "delta.columnMapping.maxColumnId" -> "5")),
      LakeWrite.deltaAdd("f1.parquet", s1, 1700000000000L, Map("col-p" -> "p1")),
      LakeWrite.deltaAdd("f2.parquet", s2, 1700000000000L, Map("col-p" -> "p2"))))
    root
  }

  test("name mode: physical parquet columns and partition keys read back logically") {
    for (mode <- Seq("name", "id")) {
      val root = buildNested(tmpDir(s"delta-cmap-$mode"), mode)
      val df = DeltaLite.read(spark, root)
      assert(df.schema.fieldNames.toSeq == Seq("k", "s", "p"))
      assert(df.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("x", "y"),
        "nested struct fields must restore their logical names")
      val rows = df.select(col("k"), col("s.x"), col("s.y"), col("p"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3)))
        .sortBy(_._1).toSeq
      assert(rows == Seq((1, 10, "a", "p1"), (2, 20, "b", "p1"), (3, 30, "c", "p2")))
      // partition pruning still works on the logical name
      assert(df.where(col("p") === "p2").count() == 1)
    }
  }

  test("logical rename is a metadata-only operation over unchanged files") {
    val root = buildNested(tmpDir("delta-cmap-rn"), "name")
    // commit 1: rename k -> key, s.y -> label; physical names stay put
    val renamed = StructType(Seq(
      StructField("key", IntegerType, nullable = true, meta("col-k1", 1)),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType, nullable = true, meta("col-x", 3)),
        StructField("label", StringType, nullable = true, meta("col-y", 4)))),
        nullable = true, meta("col-s", 2)),
      StructField("p", StringType, nullable = true, meta("col-p", 5))))
    LakeWrite.deltaCommit(spark.sparkContext.hadoopConfiguration, root, 1, Seq(
      LakeWrite.deltaCommitInfo(1700000100000L),
      LakeWrite.deltaMetaData("cmap-fixture", renamed, Seq("p"),
        Map("delta.columnMapping.mode" -> "name", "delta.columnMapping.maxColumnId" -> "5"))))
    val df = DeltaLite.read(spark, root)
    assert(df.schema.fieldNames.toSeq == Seq("key", "s", "p"))
    val got = df.where(col("key") === 2).select(col("s.label")).head.getString(0)
    assert(got == "b")
    // time travel to version 0 sees the old logical names
    assert(DeltaLite.read(spark, root, version = Some(0L))
      .schema.fieldNames.toSeq == Seq("k", "s", "p"))
  }

  test("column mapping composes with deletion vectors") {
    import spark.implicits._
    val dir = tmpDir("delta-cmap-dv")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("col-a", 1)),
      StructField("v", StringType, nullable = true, meta("col-b", 2))))
    val data = (0L until 6L).map(i => (i, s"v$i")).toDF("id", "v")
      .select(col("id").as("col-a"), col("v").as("col-b"))
      .coalesce(1).sortWithinPartitions("col-a")
    val sz = LakeWrite.writeOneParquetFile(data, new Path(root, "f.parquet"))
    // inline DV masking positions 0 and 3
    val bmp = RoaringDv.encodeBitmapArray(Seq(0L, 3L))
    val padded = bmp ++ new Array[Byte]((4 - bmp.length % 4) % 4)
    LakeWrite.deltaCommit(conf, root, 0, Seq(
      LakeWrite.deltaCommitInfo(1700000000000L),
      LakeWrite.deltaProtocolWithFeatures(
        Seq("deletionVectors", "columnMapping"), Seq("deletionVectors", "columnMapping")),
      LakeWrite.deltaMetaData("cmap-dv", logical, Nil,
        Map("delta.columnMapping.mode" -> "name")),
      LakeWrite.deltaAddDv("f.parquet", sz, 1700000000000L, Map.empty,
        "i", RoaringDv.base85Encode(padded), None, bmp.length, 2L)))
    val df = DeltaLite.read(spark, root)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v"))
    val ids = df.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L, 5L))
    assert(df.where(col("id") === 4L).select("v").head.getString(0) == "v4")
  }

  test("unknown mapping mode rejects with a clear error") {
    val dir = tmpDir("delta-cmap-bad")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir.toString)
    import spark.implicits._
    val sz = LakeWrite.writeOneParquetFile(Seq((1, "a")).toDF("k", "v"),
      new Path(root, "f.parquet"))
    LakeWrite.deltaCommit(conf, root, 0, Seq(
      LakeWrite.deltaProtocol(),
      LakeWrite.deltaMetaData("bad", StructType(Seq(
        StructField("k", IntegerType), StructField("v", StringType))), Nil,
        Map("delta.columnMapping.mode" -> "banana")),
      LakeWrite.deltaAdd("f.parquet", sz, 0L, Map.empty)))
    val e = intercept[IllegalArgumentException] { DeltaLite.snapshot(spark, root) }
    assert(e.getMessage.contains("banana"))
  }
}
