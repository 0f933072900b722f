package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

import java.nio.file.Files

/** The `graft-delta` Structured Streaming source: micro-batches are Delta
  * versions over the native log replay — initial history replay, per-commit
  * increments, checkpointed restart, CDF mode, and the delete/update
  * option gates (delta-spark parity).
  */
class DeltaStreamSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  private def mkTable(ns: String, props: String = ""): (String, Path) = {
    val base = tmpDir(s"stream-$ns")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE $ns OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.$ns")
    val fqn = s"graft.datasource.$ns.$ns.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) $props")
    (fqn, new Path(base.getPath, "t"))
  }

  test("append stream: history replay, per-commit increments, checkpointed restart") {
    val (fqn, dir) = mkTable("dstr1")
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 2 FROM range(5)")
    val ckpt = tmpDir("dstr1-ckpt").getPath
    val out = tmpDir("dstr1-out").getPath

    // a parquet sink so the restart can RECOVER from the checkpoint
    // (memory sinks refuse recovery by design)
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("path", dir.toString).load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    val got1 = spark.read.parquet(out).collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(got1.toSeq == (0 until 5).map(i => (i, i * 2)))

    spark.sql(s"INSERT INTO $fqn VALUES (10, 20), (11, 22)")
    spark.sql(s"INSERT INTO $fqn VALUES (12, 24)")
    // restart from the SAME checkpoint: exactly the new commits arrive once
    runOnce()
    val got2 = spark.read.parquet(out).collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(got2.toSeq == ((0 until 5).map(i => (i, i * 2)) ++
      Seq((10, 20), (11, 22), (12, 24))).sorted)
  }

  test("delete commits require ignoreDeletes; updates require ignoreChanges (which re-emits)") {
    val (fqn, dir) = mkTable("dstr2")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(4)")
    spark.sql(s"DELETE FROM $fqn WHERE id = 0")

    val failing = spark.readStream.format("graft-delta")
      .option("path", dir.toString).load()
      .writeStream.format("memory").queryName("dstr2_fail")
      .option("checkpointLocation", tmpDir("dstr2-c1").getPath)
      .trigger(Trigger.AvailableNow()).start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      failing.awaitTermination()
    }
    assert(ex.getMessage.contains("ignoreChanges") || ex.getMessage.contains("ignoreDeletes") ||
      Option(ex.getCause).exists(c => c.getMessage.contains("ignoreChanges")))

    // the DELETE rewrote a file (CoW): adds+removes => ignoreChanges re-emits
    val q = spark.readStream.format("graft-delta")
      .option("path", dir.toString).option("ignoreChanges", "true").load()
      .writeStream.format("memory").queryName("dstr2_ok")
      .option("checkpointLocation", tmpDir("dstr2-c2").getPath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("dstr2_ok").collect().map(_.getInt(0)).sorted.toSeq
    // initial 0..3 plus the rewritten file's survivors re-emitted
    assert(rows.count(_ == 0) == 1 && rows.toSet == Set(0, 1, 2, 3))
  }

  test("CDF-mode stream serves change rows incrementally") {
    val (fqn, dir) = mkTable("dstr3", "TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(3)")
    val ckpt = tmpDir("dstr3-ckpt").getPath
    val out = tmpDir("dstr3-out").getPath
    def run(): Seq[(Int, Int, String)] = {
      val q = spark.readStream.format("graft-delta")
        .option("path", dir.toString).option("readChangeFeed", "true").load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getAs[String]("_change_type"))).sorted.toSeq
    }
    assert(run() == (0 until 3).map(i => (i, i, "insert")))
    spark.sql(s"UPDATE $fqn SET v = 99 WHERE id = 1")
    assert(run() == ((0 until 3).map(i => (i, i, "insert")) ++
      Seq((1, 1, "update_preimage"), (1, 99, "update_postimage"))).sorted)
  }

  test("graft-delta sink: native-to-native pipeline with exactly-once txn markers") {
    val (srcFqn, srcDir) = mkTable("dsnk1")
    val (dstFqn, dstDir) = mkTable("dsnk2")
    spark.sql(s"INSERT INTO $srcFqn SELECT id, id * 5 FROM range(4)")
    val ckpt = tmpDir("dsnk-ckpt").getPath
    def pump(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("path", srcDir.toString).load()
        .writeStream.format("graft-delta")
        .option("path", dstDir.toString)
        .option("txnAppId", "dsnk-pipeline")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    pump()
    def dst() = spark.sql(s"SELECT id, v FROM $dstFqn")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(dst() == (0 until 4).map(i => (i, i * 5)))
    // no-op pump: nothing new, nothing duplicated
    pump()
    assert(dst() == (0 until 4).map(i => (i, i * 5)))
    spark.sql(s"INSERT INTO $srcFqn VALUES (9, 45)")
    pump()
    assert(dst() == ((0 until 4).map(i => (i, i * 5)) :+ (9, 45)).sorted)
    // the txn marker recorded the last batch id
    assert(DeltaLite.lastTxnVersion(spark, dstDir, "dsnk-pipeline").nonEmpty)
  }

  test("sink addBatch is idempotent per (appId, batchId) — a replayed batch commits nothing") {
    val (fqn, dir) = mkTable("dsnk3")
    import spark.implicits._
    val sink = new DeltaStreamSink(spark, dir, Map("txnAppId" -> "replay-app"),
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = Seq((1, 10), (2, 20)).toDF("id", "v")
    sink.addBatch(0L, batch)
    sink.addBatch(0L, batch) // replay: must be skipped
    sink.addBatch(1L, Seq((3, 30)).toDF("id", "v"))
    val rows = spark.sql(s"SELECT id FROM $fqn").collect().map(_.getInt(0)).sorted.toSeq
    assert(rows == Seq(1, 2, 3))
    assert(DeltaLite.lastTxnVersion(spark, dir, "replay-app").contains(1L))
    assert(DeltaLite.lastTxnVersion(spark, dir, "other-app").isEmpty)
  }

  test("maxVersionsPerTrigger paces micro-batches one commit at a time") {
    val (fqn, dir) = mkTable("dstr6")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 1)")
    spark.sql(s"INSERT INTO $fqn VALUES (2, 2)")
    spark.sql(s"INSERT INTO $fqn VALUES (3, 3)")
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-delta")
      .option("path", dir.toString)
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes += df.count(); ()
      }
      .option("checkpointLocation", tmpDir("dstr6-ckpt").getPath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // three single-row commits -> three paced batches, all rows delivered
    assert(batchSizes.toSeq == Seq(1L, 1L, 1L), s"got $batchSizes")
  }

  test("startingVersion skips history; empty table yields no batch") {
    val (fqn, dir) = mkTable("dstr4")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 1)") // v1
    spark.sql(s"INSERT INTO $fqn VALUES (2, 2)") // v2
    val q = spark.readStream.format("graft-delta")
      .option("path", dir.toString).option("startingVersion", "2").load()
      .writeStream.format("memory").queryName("dstr4_a")
      .option("checkpointLocation", tmpDir("dstr4-ckpt").getPath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("dstr4_a").collect().map(_.getInt(0)).toSeq == Seq(2))

    val (_, dir2) = mkTable("dstr5")
    // only the CREATE commit exists; startingVersion 1 has nothing to serve
    val q2 = spark.readStream.format("graft-delta")
      .option("path", dir2.toString).option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("dstr5_a")
      .option("checkpointLocation", tmpDir("dstr5-ckpt").getPath)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("dstr5_a").count() == 0)
  }
}
