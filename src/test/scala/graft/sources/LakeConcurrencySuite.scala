package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.SparkTestBase

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier

/** Optimistic concurrency for the native lake writers: atomic version
  * claims, conflict detection against interleaved commits (delta-spark's
  * ConflictChecker taxonomy), Iceberg append rebase + CommitFailedException
  * (HadoopTableOperations' contract), and the stale-version-hint forward
  * probe on reads. The multi-writer story the runtimes own when the jars
  * are present.
  */
class LakeConcurrencySuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  private def conf = spark.sparkContext.hadoopConfiguration

  private def idTable(prefix: String): Path = {
    val dir = new Path(s"${tmpDir(prefix)}/t")
    LakeNativeWrite.deltaCreate(spark, dir,
      StructType(Seq(StructField("id", LongType))), Nil)
    dir
  }

  // ---- Delta: blind appends under contention ----

  test("delta: concurrent blind appends all serialize, no lost commits") {
    import spark.implicits._
    val dir = idTable("conc-append")
    val threads = 4
    val barrier = new CyclicBarrier(threads)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (0 until threads).map { i =>
      new Thread(() => {
        try {
          barrier.await()
          LakeNativeWrite.deltaInsert(spark, dir,
            Seq(i.toLong * 10, i.toLong * 10 + 1).toDF("id"), overwrite = false)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"concurrent appends must not conflict: ${errs.peek()}")
    // every commit landed at a distinct version: create=0 + 4 appends
    assert(DeltaLite.latestVersion(spark, dir) == 4L)
    assert(DeltaLite.read(spark, dir).count() == threads * 2L)
  }

  test("delta: blind append retries past a winner that only added files") {
    import spark.implicits._
    val dir = idTable("conc-retry")
    LakeNativeWrite.deltaInsert(spark, dir, Seq(1L).toDF("id"), overwrite = false)
    // a concurrent writer claims version 2 with a data-only commit
    LakeWrite.deltaCommit(conf, dir, 2, Seq(
      LakeWrite.deltaCommitInfo(1L),
      LakeWrite.deltaAdd("other-writer.parquet", 10L, 1L, Map.empty)))
    // our blind append planned against version 1 must land at version 3
    LakeNativeWrite.commitDelta(conf, dir, 2, Seq(
      LakeWrite.deltaCommitInfo(2L),
      LakeWrite.deltaAdd("ours.parquet", 10L, 2L, Map.empty)))
    val v3 = new java.io.File(s"$dir/_delta_log/00000000000000000003.json")
    assert(v3.exists(), "blind append must retry to the next free version")
    assert(scala.io.Source.fromFile(v3).mkString.contains("ours.parquet"))
  }

  // ---- Delta: the conflict taxonomy ----

  test("delta: delete/delete of the same file conflicts") {
    import spark.implicits._
    val dir = idTable("conc-dd")
    LakeNativeWrite.deltaInsert(spark, dir, Seq(1L, 2L).toDF("id"), overwrite = false)
    val victim = DeltaLite.snapshot(spark, dir).fileIds.head
    // the winner removes the file first
    LakeWrite.deltaCommit(conf, dir, 2, Seq(
      LakeWrite.deltaCommitInfo(1L), LakeWrite.deltaRemove(victim, 1L)))
    // our rewrite, planned against version 1, removes it too
    intercept[LakeConcurrency.ConcurrentDeleteDeleteException] {
      LakeNativeWrite.commitDelta(conf, dir, 2, Seq(
        LakeWrite.deltaCommitInfo(2L),
        LakeWrite.deltaRemove(victim, 2L),
        LakeWrite.deltaAdd("rewritten.parquet", 10L, 2L, Map.empty)))
    }
  }

  test("delta: a rewrite conflicts with a winner that appended rows") {
    import spark.implicits._
    val dir = idTable("conc-ad")
    LakeNativeWrite.deltaInsert(spark, dir, Seq(1L).toDF("id"), overwrite = false)
    val victim = DeltaLite.snapshot(spark, dir).fileIds.head
    LakeWrite.deltaCommit(conf, dir, 2, Seq(
      LakeWrite.deltaCommitInfo(1L),
      LakeWrite.deltaAdd("their-append.parquet", 10L, 1L, Map.empty)))
    intercept[LakeConcurrency.ConcurrentAppendException] {
      LakeNativeWrite.commitDelta(conf, dir, 2, Seq(
        LakeWrite.deltaCommitInfo(2L),
        LakeWrite.deltaRemove(victim, 2L),
        LakeWrite.deltaAdd("rewritten.parquet", 10L, 2L, Map.empty)))
    }
  }

  test("delta: a rewrite conflicts with a winner that deleted other files") {
    import spark.implicits._
    val dir = idTable("conc-dr")
    LakeNativeWrite.deltaInsert(spark, dir, Seq(1L).toDF("id"), overwrite = false)
    LakeNativeWrite.deltaInsert(spark, dir, Seq(2L).toDF("id"), overwrite = false)
    val Seq(f1, f2) = DeltaLite.snapshot(spark, dir).fileIds.take(2).toSeq
    LakeWrite.deltaCommit(conf, dir, 3, Seq(
      LakeWrite.deltaCommitInfo(1L), LakeWrite.deltaRemove(f1, 1L)))
    // without read-predicate tracking, a winner's delete of ANY file our
    // planning scan could have read is a (conservative) delete/read conflict
    intercept[LakeConcurrency.ConcurrentDeleteReadException] {
      LakeNativeWrite.commitDelta(conf, dir, 3, Seq(
        LakeWrite.deltaCommitInfo(2L),
        LakeWrite.deltaRemove(f2, 2L),
        LakeWrite.deltaAdd("rewritten.parquet", 10L, 2L, Map.empty)))
    }
  }

  test("delta: any commit conflicts with a winner's metadata or protocol change") {
    import spark.implicits._
    val dir = idTable("conc-meta")
    LakeNativeWrite.deltaInsert(spark, dir, Seq(1L).toDF("id"), overwrite = false)
    LakeWrite.deltaCommit(conf, dir, 2, Seq(
      LakeWrite.deltaCommitInfo(1L),
      LakeWrite.deltaMetaData("new-id",
        StructType(Seq(StructField("id", LongType), StructField("x", IntegerType))), Nil)))
    // even a blind append was encoded under the pre-change schema
    intercept[LakeConcurrency.MetadataChangedException] {
      LakeNativeWrite.commitDelta(conf, dir, 2, Seq(
        LakeWrite.deltaCommitInfo(2L),
        LakeWrite.deltaAdd("ours.parquet", 10L, 2L, Map.empty)))
    }
    LakeWrite.deltaCommit(conf, dir, 3, Seq(
      LakeWrite.deltaCommitInfo(3L), LakeWrite.deltaProtocol(2, 5)))
    intercept[LakeConcurrency.ProtocolChangedException] {
      LakeNativeWrite.commitDelta(conf, dir, 3, Seq(
        LakeWrite.deltaCommitInfo(4L),
        LakeWrite.deltaAdd("ours.parquet", 10L, 4L, Map.empty)))
    }
  }

  test("delta: same streaming appId in the winner spends the idempotency token") {
    import spark.implicits._
    val dir = idTable("conc-txn")
    LakeNativeWrite.deltaInsert(spark, dir, Seq(1L).toDF("id"), overwrite = false)
    LakeWrite.deltaCommit(conf, dir, 2, Seq(
      LakeWrite.deltaCommitInfo(1L),
      LakeWrite.deltaTxn("sink-app", 7L, 1L),
      LakeWrite.deltaAdd("their-batch.parquet", 10L, 1L, Map.empty)))
    intercept[LakeConcurrency.ConcurrentTransactionException] {
      LakeNativeWrite.commitDelta(conf, dir, 2, Seq(
        LakeWrite.deltaCommitInfo(2L),
        LakeWrite.deltaTxn("sink-app", 7L, 2L),
        LakeWrite.deltaAdd("our-batch.parquet", 10L, 2L, Map.empty)))
    }
  }

  // ---- Iceberg: rebase + CommitFailedException ----

  test("iceberg: concurrent appends rebase onto each winner, no lost rows") {
    import spark.implicits._
    val dir = new Path(s"${tmpDir("ice-conc")}/t")
    LakeNativeWrite.icebergCreate(spark, dir,
      StructType(Seq(StructField("id", LongType))), Nil)
    val threads = 4
    val barrier = new CyclicBarrier(threads)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (0 until threads).map { i =>
      new Thread(() => {
        try {
          barrier.await()
          LakeNativeWrite.icebergInsert(spark, dir,
            Seq(i.toLong * 10, i.toLong * 10 + 1).toDF("id"), overwrite = false)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"concurrent appends must rebase, not fail: ${errs.peek()}")
    assert(IcebergLite.read(spark, dir).count() == threads * 2L)
    // each commit produced its own snapshot in one serialized lineage
    assert(LakeNativeWrite.loadIceMeta(conf, dir).priorSnapshots.size == threads)
  }

  test("iceberg: a stale append rebases over the winner deterministically") {
    import spark.implicits._
    val dir = new Path(s"${tmpDir("ice-rebase")}/t")
    LakeNativeWrite.icebergCreate(spark, dir,
      StructType(Seq(StructField("id", LongType))), Nil)
    LakeNativeWrite.icebergInsert(spark, dir,
      Seq(1L, 2L).toDF("id").coalesce(1), overwrite = false)
    // plan an append against the CURRENT metadata, then let a winner land
    val stale = LakeNativeWrite.loadIceMeta(conf, dir)
    val staleFile = IcebergLite.snapshot(spark, dir).files.head
    LakeNativeWrite.icebergInsert(spark, dir, Seq(3L).toDF("id"), overwrite = false)
    // replay the stale plan: re-append the existing data file as a new
    // entry (double-counting {1,2} makes the rebase observable)
    val staleSeq = stale.lastSeq + 1
    val staleSnap = stale.priorSnapshots.map(_.id).max + 1
    val entry = LakeWrite.ManifestEntry(1, staleFile.path, 2L, staleFile.size, staleSnap,
      sequenceNumber = Some(staleSeq))
    val existing = stale.priorSnapshots.find(_.id == stale.currentId).toSeq.flatMap { s =>
      // the stale plan carried the manifests of ITS snapshot
      LakeNativeWrite.readManifestFiles(conf, dir,
        IcebergLite.resolveUri(dir, s.manifestListPath))
    }
    LakeNativeWrite.commitIceberg(conf, dir, stale, Seq(entry), existing,
      staleSnap, staleSeq, staleSnap,
      LakeWrite.manifestEntrySchema(), rebaseAppend = true)
    // the rebase kept the winner's {3} and re-appended {1,2}
    assert(IcebergLite.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 1L, 2L, 2L, 3L))
  }

  test("iceberg: losing the version race on a non-append fails loudly") {
    val dir = new Path(s"${tmpDir("ice-fail")}/t")
    LakeNativeWrite.icebergCreate(spark, dir,
      StructType(Seq(StructField("id", LongType))), Nil)
    // a concurrent writer owns v2 already
    val fs = dir.getFileSystem(conf)
    val out = fs.create(new Path(dir, "metadata/v2.metadata.json"), false)
    out.write("{}".getBytes("UTF-8")); out.close()
    intercept[LakeConcurrency.CommitFailedException] {
      LakeWrite.icebergWriteMetadata(conf, dir, 2,
        StructType(Seq(StructField("id", LongType))), Nil, currentSnapshotId = -1L,
        failIfExists = true)
    }
  }

  test("iceberg: reads probe forward past a stale version hint") {
    import spark.implicits._
    val dir = new Path(s"${tmpDir("ice-hint")}/t")
    LakeNativeWrite.icebergCreate(spark, dir,
      StructType(Seq(StructField("id", LongType))), Nil)
    LakeNativeWrite.icebergInsert(spark, dir, Seq(1L).toDF("id"), overwrite = false)
    LakeNativeWrite.icebergInsert(spark, dir, Seq(2L).toDF("id"), overwrite = false)
    // a racing hint write left the advisory pointer one version behind
    val fs = dir.getFileSystem(conf)
    val hint = fs.create(new Path(dir, "metadata/version-hint.text"), true)
    hint.write("2".getBytes("UTF-8")); hint.close()
    assert(IcebergLite.read(spark, dir).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L), "stale hint must not serve a stale snapshot")
  }
}
