package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

import java.nio.file.Files

/** Change Data Feed reads over the native Delta log replay
  * ([[DeltaLite.changes]]): cdc actions win over same-commit add/remove,
  * blind appends and full-file deletes derive, OPTIMIZE commits are
  * change-free, version sub-ranges replay only their commits, deleted rows
  * honor the predecessor version's deletion vector, and a non-cdc rewrite
  * commit is rejected rather than guessed at.
  */
class DeltaCdfSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  /** Fixture: v0 appends ids 0-9 (a.parquet) and 10-19 (b.parquet);
    * v1 updates ids 0-2 (+100 on v) via a cdc commit whose add/remove move
    * a.parquet to a2.parquet; v2 removes b.parquet (full-file delete);
    * v3 re-adds everything as one file with dataChange=false (OPTIMIZE).
    */
  private def buildTable(): Path = {
    val dir = tmpDir("delta-cdf")
    val root = new Path(dir.toString)
    val conf = spark.sparkContext.hadoopConfiguration
    import spark.implicits._
    def write(rel: String, df: org.apache.spark.sql.DataFrame): Long =
      LakeWrite.writeOneParquetFile(df.coalesce(1).sortWithinPartitions("id"), new Path(root, rel))

    val a = (0 until 10).map(i => (i.toLong, i * 10L)).toDF("id", "v")
    val b = (10 until 20).map(i => (i.toLong, i * 10L)).toDF("id", "v")
    val szA = write("a.parquet", a)
    val szB = write("b.parquet", b)
    LakeWrite.deltaCommit(conf, root, 0, Seq(
      LakeWrite.deltaCommitInfo(1700000000000L), LakeWrite.deltaProtocol(),
      LakeWrite.deltaMetaData("cdf-suite", a.schema, Nil,
        Map("delta.enableChangeDataFeed" -> "true")),
      LakeWrite.deltaAdd("a.parquet", szA, 1700000000000L, Map.empty),
      LakeWrite.deltaAdd("b.parquet", szB, 1700000000000L, Map.empty)))

    val pre = a.where($"id" < 3).withColumn("_change_type", lit("update_preimage"))
    val post = a.where($"id" < 3).withColumn("v", $"v" + 100)
      .withColumn("_change_type", lit("update_postimage"))
    val cdcSize = LakeWrite.writeOneParquetFile(
      pre.unionByName(post).coalesce(1).sortWithinPartitions("_change_type", "id"),
      new Path(root, "_change_data/cdc-1.parquet"))
    val a2 = a.withColumn("v", when($"id" < 3, $"v" + 100).otherwise($"v"))
    val szA2 = write("a2.parquet", a2)
    LakeWrite.deltaCommit(conf, root, 1, Seq(
      LakeWrite.deltaCommitInfo(1700000100000L),
      LakeWrite.deltaCdc("_change_data/cdc-1.parquet", cdcSize, Map.empty),
      LakeWrite.deltaRemove("a.parquet", 1700000100000L),
      LakeWrite.deltaAdd("a2.parquet", szA2, 1700000100000L, Map.empty)))

    LakeWrite.deltaCommit(conf, root, 2, Seq(
      LakeWrite.deltaCommitInfo(1700000200000L),
      LakeWrite.deltaRemove("b.parquet", 1700000200000L)))

    val all = a2.coalesce(1)
    val szAll = write("compact.parquet", all)
    LakeWrite.deltaCommit(conf, root, 3, Seq(
      LakeWrite.deltaCommitInfo(1700000300000L),
      LakeWrite.deltaRemoveNoDataChange("a2.parquet", 1700000300000L),
      LakeWrite.deltaAdd("compact.parquet", szAll, 1700000300000L, Map.empty,
        dataChange = false)))
    root
  }

  test("full-range feed: cdc wins over same-commit add/remove; derived inserts and deletes; optimize is silent") {
    val root = buildTable()
    val feed = DeltaLite.changes(spark, root, 0L)
      .select("id", "v", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).sorted

    val inserts = (0 until 20).map(i => (i.toLong, i * 10L, "insert", 0L))
    val updates = (0 until 3).flatMap(i => Seq(
      (i.toLong, i * 10L, "update_preimage", 1L),
      (i.toLong, i * 10L + 100, "update_postimage", 1L)))
    val deletes = (10 until 20).map(i => (i.toLong, i * 10L, "delete", 2L))
    assert(feed.toSeq == (inserts ++ updates ++ deletes).sorted)
  }

  test("commit timestamps ride from commitInfo; version sub-range replays only its commits") {
    val root = buildTable()
    val sub = DeltaLite.changes(spark, root, 1L, Some(2L))
    val ts = sub.select("_commit_version", "_commit_timestamp").distinct()
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toMap
    assert(ts == Map(1L -> 1700000100000L, 2L -> 1700000200000L))
    // the sub-range sees no v0 inserts, and the derived delete of b.parquet
    // still resolves its file state from the pre-range snapshot
    assert(sub.where(col("_change_type") === "insert").count() == 0)
    assert(sub.where(col("_change_type") === "delete").count() == 10)
    // optimize-only range: zero change rows, schema intact
    val opt = DeltaLite.changes(spark, root, 3L, Some(3L))
    assert(opt.count() == 0)
    assert(opt.columns.toSeq ==
      Seq("id", "v", "_change_type", "_commit_version", "_commit_timestamp"))
  }

  test("derived delete honors the predecessor version's deletion vector") {
    val dir = tmpDir("delta-cdf-dv")
    val root = new Path(dir.toString)
    val conf = spark.sparkContext.hadoopConfiguration
    import spark.implicits._
    val d = (0 until 8).map(i => (i.toLong, i.toString)).toDF("id", "s")
    val sz = LakeWrite.writeOneParquetFile(
      d.coalesce(1).sortWithinPartitions("id"), new Path(root, "f.parquet"))
    LakeWrite.deltaCommit(conf, root, 0, Seq(
      LakeWrite.deltaCommitInfo(1700000000000L),
      LakeWrite.deltaProtocolWithFeatures(Seq("deletionVectors"), Seq("deletionVectors")),
      LakeWrite.deltaMetaData("cdf-dv", d.schema, Nil,
        Map("delta.enableChangeDataFeed" -> "true")),
      LakeWrite.deltaAdd("f.parquet", sz, 1700000000000L, Map.empty)))
    // v1: DV masks positions 0,2 (ids 0 and 2) — rows already logically gone
    val bmp = RoaringDv.encodeBitmapArray(Seq(0L, 2L))
    val padded = bmp ++ new Array[Byte]((4 - bmp.length % 4) % 4)
    LakeWrite.deltaCommit(conf, root, 1, Seq(
      LakeWrite.deltaCommitInfo(1700000100000L),
      LakeWrite.deltaCdc("_change_data/cdc-dv.parquet",
        LakeWrite.writeOneParquetFile(
          d.where($"id".isin(0L, 2L)).withColumn("_change_type", lit("delete"))
            .coalesce(1).sortWithinPartitions("id"),
          new Path(root, "_change_data/cdc-dv.parquet")), Map.empty),
      LakeWrite.deltaAddDv("f.parquet", sz, 1700000100000L, Map.empty,
        "i", RoaringDv.base85Encode(padded), None, bmp.length, 2L)))
    // v2: full-file delete — the feed must NOT resurrect ids 0/2
    LakeWrite.deltaCommit(conf, root, 2, Seq(
      LakeWrite.deltaCommitInfo(1700000200000L),
      LakeWrite.deltaRemove("f.parquet", 1700000200000L)))

    val deleted = DeltaLite.changes(spark, root, 2L, Some(2L))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(deleted.toSeq == Seq(1L, 3L, 4L, 5L, 6L, 7L))
  }

  test("a non-cdc commit that both adds and removes data is rejected, not guessed at") {
    val dir = tmpDir("delta-cdf-bad")
    val root = new Path(dir.toString)
    val conf = spark.sparkContext.hadoopConfiguration
    import spark.implicits._
    val d = (0 until 4).map(i => (i.toLong, i.toString)).toDF("id", "s")
    val sz = LakeWrite.writeOneParquetFile(
      d.coalesce(1).sortWithinPartitions("id"), new Path(root, "f.parquet"))
    LakeWrite.deltaCommit(conf, root, 0, Seq(
      LakeWrite.deltaCommitInfo(1700000000000L), LakeWrite.deltaProtocol(),
      LakeWrite.deltaMetaData("cdf-bad", d.schema, Nil),
      LakeWrite.deltaAdd("f.parquet", sz, 1700000000000L, Map.empty)))
    val sz2 = LakeWrite.writeOneParquetFile(
      d.where($"id" > 0).coalesce(1).sortWithinPartitions("id"), new Path(root, "f2.parquet"))
    LakeWrite.deltaCommit(conf, root, 1, Seq(
      LakeWrite.deltaCommitInfo(1700000100000L),
      LakeWrite.deltaRemove("f.parquet", 1700000100000L),
      LakeWrite.deltaAdd("f2.parquet", sz2, 1700000100000L, Map.empty)))
    val ex = intercept[IllegalArgumentException] {
      DeltaLite.changes(spark, root, 0L).collect()
    }
    assert(ex.getMessage.contains("without cdc actions"))
    // but the append-only prefix of the same log reads fine
    assert(DeltaLite.changes(spark, root, 0L, Some(0L)).count() == 4)
  }

  test("native DML writes the feed: UPDATE/DELETE/MERGE emit cdc, OPTIMIZE stays silent, OVERWRITE ships delete+insert") {
    val base = tmpDir("delta-cdf-dml")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE cdfw OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.cdfwrite")
    val fqn = "graft.datasource.cdfwrite.cdfw.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) " +
      "TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 10 FROM range(10)")       // v1
    spark.sql(s"UPDATE $fqn SET v = v + 1 WHERE id < 3")                   // v2
    spark.sql(s"DELETE FROM $fqn WHERE id >= 8")                           // v3
    spark.sql("SELECT * FROM (VALUES (0, 999), (98, 980)) AS s(id, v)")
      .createOrReplaceTempView("__cdf_merge_src")
    spark.sql(s"MERGE INTO $fqn t USING __cdf_merge_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)")           // v4
    graft.Graft.sql(spark, s"OPTIMIZE LAKE TABLE $fqn TARGET 1 FILES")     // v5
    spark.sql(s"INSERT OVERWRITE $fqn SELECT id, id FROM range(2)")        // v6

    val dir = new Path(base.getPath, "t")
    val feed = DeltaLite.changes(spark, dir, 0L)
      .select("id", "v", "_change_type", "_commit_version")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq.sorted

    val expected = (
      (0 until 10).map(i => (i, i * 10, "insert", 1L)) ++
      (0 until 3).flatMap(i => Seq(
        (i, i * 10, "update_preimage", 2L), (i, i * 10 + 1, "update_postimage", 2L))) ++
      Seq((8, 80, "delete", 3L), (9, 90, "delete", 3L)) ++
      Seq((0, 1, "update_preimage", 4L), (0, 999, "update_postimage", 4L),
        (98, 980, "insert", 4L)) ++
      // v5 OPTIMIZE: silent
      // v6 OVERWRITE: everything out, new rows in
      (Seq((0, 999), (1, 11), (2, 21)) ++ (3 to 7).map(i => (i, i * 10)) ++ Seq((98, 980)))
        .map { case (i, v) => (i, v, "delete", 6L) } ++
      (0 until 2).map(i => (i, i, "insert", 6L))
    ).sorted
    assert(feed == expected)

    // the table itself reads right after all that
    val now = spark.sql(s"SELECT id, v FROM $fqn ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(now == Seq((0, 0), (1, 1)))
  }

  test("CdfConsumer: checkpointed micro-batches, crash replay, state convergence") {
    val base = tmpDir("delta-cdf-consumer")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE cdfc OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.cdfconsumer")
    val fqn = "graft.datasource.cdfconsumer.cdfc.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) " +
      "TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(5)")
    val dir = new Path(base.getPath, "t")
    val ckpt = new Path(base.getPath, "_consumer/progress.json")
    val consumer = new graft.streaming.CdfConsumer(dir, ckpt)

    // downstream state maintained by replaying the feed in version order
    val state = scala.collection.mutable.Map[Int, Int]()
    def apply(df: org.apache.spark.sql.DataFrame, from: Long, to: Long): Unit =
      df.orderBy("_commit_version").collect().foreach { r =>
        val (id, v) = (r.getInt(0), r.getInt(1))
        r.getAs[String]("_change_type") match {
          case "insert" | "update_postimage" => state(id) = v
          case "delete" => state.remove(id): Unit
          case "update_preimage" => // no-op
        }
      }

    assert(consumer.process(spark)(apply))           // batch 1: create+insert
    assert(state == (0 until 5).map(i => i -> i).toMap)
    assert(!consumer.process(spark)(apply))          // nothing new

    spark.sql(s"UPDATE $fqn SET v = v * 100 WHERE id >= 3")
    spark.sql(s"DELETE FROM $fqn WHERE id = 0")

    // crash mid-batch: fn throws, checkpoint must NOT advance
    val conf = spark.sparkContext.hadoopConfiguration
    val before = consumer.nextVersion(conf)
    intercept[RuntimeException] {
      consumer.process(spark)((_, _, _) => throw new RuntimeException("boom"))
    }
    assert(consumer.nextVersion(conf) == before)

    // replay succeeds and converges to the table's current content
    assert(consumer.process(spark)(apply))
    assert(!consumer.process(spark)(apply))
    val table = spark.sql(s"SELECT id, v FROM $fqn").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(state.toMap == table)
    assert(state == Map(1 -> 1, 2 -> 2, 3 -> 300, 4 -> 400))
  }

  test("readChangeFeed registration options serve the feed through the catalog") {
    val root = buildTable()
    val parent = new java.io.File(root.toString).getParentFile.getPath
    val name = new java.io.File(root.toString).getName
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE cdft OPTIONS (path '$parent', readChangeFeed 'true', startingVersion '1', endingVersion '2') NAMESPACE graft.datasource.cdfsuite")
    val df = spark.sql(s"SELECT * FROM graft.datasource.cdfsuite.cdft.`$name`")
    assert(df.columns.toSeq ==
      Seq("id", "v", "_change_type", "_commit_version", "_commit_timestamp"))
    val byType = df.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 3L, "update_postimage" -> 3L, "delete" -> 10L))
  }
}
