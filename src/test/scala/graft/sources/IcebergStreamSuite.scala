package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

import java.nio.file.Files

/** The `graft-iceberg` Structured Streaming source: sequence numbers as
  * offsets along the snapshot lineage, append-snapshot streaming with
  * delete/overwrite gating, replace silence, and changelog mode.
  */
class IcebergStreamSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  private def mkTable(ns: String): (String, Path) = {
    val base = tmpDir(s"icestream-$ns")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE $ns OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.$ns")
    val fqn = s"graft.datasource.$ns.$ns.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    (fqn, new Path(base.getPath, "t"))
  }

  test("append snapshots stream incrementally; replace is silent; restart resumes") {
    val (fqn, dir) = mkTable("istr1")
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 3 FROM range(4)")
    val ckpt = tmpDir("istr1-ckpt").getPath
    val out = tmpDir("istr1-out").getPath
    def runOnce(): Seq[(Int, Int)] = {
      val q = spark.readStream.format("graft-iceberg")
        .option("path", dir.toString).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    }
    assert(runOnce() == (0 until 4).map(i => (i, i * 3)))
    spark.sql(s"INSERT INTO $fqn VALUES (10, 30)")
    graft.Graft.sql(spark, s"OPTIMIZE LAKE TABLE $fqn TARGET 1 FILES") // replace: silent
    spark.sql(s"INSERT INTO $fqn VALUES (11, 33)")
    assert(runOnce() == ((0 until 4).map(i => (i, i * 3)) ++ Seq((10, 30), (11, 33))).sorted)
  }

  test("delete snapshots are gated by skipDeleteSnapshots/skipOverwriteSnapshots") {
    val (fqn, dir) = mkTable("istr2")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(4)")
    spark.sql(s"DELETE FROM $fqn WHERE id = 0") // CoW: operation=overwrite
    val failing = spark.readStream.format("graft-iceberg")
      .option("path", dir.toString).load()
      .writeStream.format("memory").queryName("istr2_fail")
      .option("checkpointLocation", tmpDir("istr2-c1").getPath)
      .trigger(Trigger.AvailableNow()).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      failing.awaitTermination()
    }
    assert(ex.getMessage.contains("skipOverwriteSnapshots") ||
      Option(ex.getCause).exists(_.getMessage.contains("skipOverwriteSnapshots")))

    val q = spark.readStream.format("graft-iceberg")
      .option("path", dir.toString)
      .option("skipOverwriteSnapshots", "true").load()
      .writeStream.format("memory").queryName("istr2_ok")
      .option("checkpointLocation", tmpDir("istr2-c2").getPath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the overwrite snapshot is SKIPPED entirely: only the initial append
    assert(spark.table("istr2_ok").collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("changelog mode streams insert AND delete rows with snapshot ids") {
    val (fqn, dir) = mkTable("istr3")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(3)")
    spark.sql(s"DELETE FROM $fqn WHERE id = 2")
    val q = spark.readStream.format("graft-iceberg")
      .option("path", dir.toString).option("readChangelog", "true").load()
      .writeStream.format("memory").queryName("istr3_a")
      .option("checkpointLocation", tmpDir("istr3-ckpt").getPath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("istr3_a").collect()
      .map(r => (r.getInt(0), r.getAs[String]("_change_type"))).sorted.toSeq
    // CoW delete: file-granular truth — deleted file's rows out, survivors in
    val net = rows.groupBy(_._1).view.mapValues { rs =>
      rs.count(_._2 == "insert") - rs.count(_._2 == "delete")
    }.toMap
    assert(net == Map(0 -> 1, 1 -> 1, 2 -> 0))
  }

  test("graft-iceberg sink: cross-format pipeline with summary-marker idempotence") {
    // delta source -> iceberg sink: the whole native stack in one stream
    val dbase = tmpDir("istr-dsrc")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE isnkd OPTIONS (path '${dbase.getPath}') NAMESPACE graft.datasource.isnkd")
    val srcFqn = "graft.datasource.isnkd.isnkd.t"
    spark.sql(s"CREATE TABLE $srcFqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $srcFqn SELECT id, id * 7 FROM range(3)")
    val (dstFqn, dstDir) = mkTable("istr5")
    val ckpt = tmpDir("istr5-ckpt").getPath
    def pump(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("path", new Path(dbase.getPath, "t").toString).load()
        .writeStream.format("graft-iceberg")
        .option("path", dstDir.toString)
        .option("txnAppId", "istr5-pipe")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    pump()
    def dst() = spark.sql(s"SELECT id, v FROM $dstFqn")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(dst() == (0 until 3).map(i => (i, i * 7)))
    pump() // no new data: nothing duplicated
    assert(dst() == (0 until 3).map(i => (i, i * 7)))
    spark.sql(s"INSERT INTO $srcFqn VALUES (8, 56)")
    pump()
    assert(dst() == ((0 until 3).map(i => (i, i * 7)) :+ (8, 56)).sorted)
    assert(LakeNativeWrite.icebergLastStreamBatch(spark, dstDir, "istr5-pipe").nonEmpty)
    // a manual replay of an old batch id is skipped
    import spark.implicits._
    val sink = new IcebergStreamSink(spark, dstDir, Map("txnAppId" -> "istr5-pipe"),
      org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(0L, Seq((99, 99)).toDF("id", "v"))
    assert(dst() == ((0 until 3).map(i => (i, i * 7)) :+ (8, 56)).sorted)
  }

  test("upsertKeys sink mode: streaming CDC upserts without reading the table") {
    val (fqn, dir) = mkTable("istr6")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(5)")
    // a delta "changes" source feeding upsert batches
    val dbase = tmpDir("istr6-src")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE i6src OPTIONS (path '${dbase.getPath}') NAMESPACE graft.datasource.istr6src")
    val srcFqn = "graft.datasource.istr6src.i6src.t"
    spark.sql(s"CREATE TABLE $srcFqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $srcFqn VALUES (1, 100), (9, 900)") // update id 1, insert id 9
    val ckpt = tmpDir("istr6-ckpt").getPath
    def pump(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("path", new Path(dbase.getPath, "t").toString).load()
        .writeStream.format("graft-iceberg")
        .option("path", dir.toString)
        .option("txnAppId", "istr6-upsert")
        .option("upsertKeys", "id")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    pump()
    def state() = spark.sql(s"SELECT id, v FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(state() == Seq((0, 0), (1, 100), (2, 2), (3, 3), (4, 4), (9, 900)))
    pump() // no new source data: summary markers make the replay a no-op
    assert(state() == Seq((0, 0), (1, 100), (2, 2), (3, 3), (4, 4), (9, 900)))
    spark.sql(s"INSERT INTO $srcFqn VALUES (9, 901)") // second upsert of id 9
    pump()
    assert(state() == Seq((0, 0), (1, 100), (2, 2), (3, 3), (4, 4), (9, 901)))
    // the masked history is merge-on-read: originals never rewrote
    assert(IcebergLite.snapshot(spark, dir).eqDeleteFiles.nonEmpty)
  }

  test("startSnapshot streams only after the named lineage snapshot") {
    val (fqn, dir) = mkTable("istr4")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 1)")
    val firstId = IcebergLite.snapshotLineage(spark, dir).last._2
    spark.sql(s"INSERT INTO $fqn VALUES (2, 2)")
    val q = spark.readStream.format("graft-iceberg")
      .option("path", dir.toString).option("startSnapshot", firstId.toString).load()
      .writeStream.format("memory").queryName("istr4_a")
      .option("checkpointLocation", tmpDir("istr4-ckpt").getPath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("istr4_a").collect().map(_.getInt(0)).toSeq == Seq(2))
  }
}
