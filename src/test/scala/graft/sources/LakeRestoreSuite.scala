package graft.sources.lake

import org.apache.hadoop.fs.Path
import graft.SparkTestBase

/** RESTORE LAKE TABLE ... TO VERSION n: Delta rolls back through one
  * remove+re-add commit (deletion-vector state and metadata restored,
  * history intact), Iceberg through a metadata-only main-ref rollback.
  */
class LakeRestoreSuite extends SparkTestBase {

  private def tmpDir(p: String) = java.nio.file.Files.createTempDirectory(p).toFile

  test("delta: RESTORE undoes DML, history stays, writes continue") {
    val base = tmpDir("restore-d")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE rsd OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.rsd")
    val fqn = "graft.datasource.rsd.rsd.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 10 FROM range(6)") // v1
    spark.sql(s"DELETE FROM $fqn WHERE id < 2")                     // v2
    spark.sql(s"UPDATE $fqn SET v = 0 WHERE id = 5")                // v3
    assert(spark.table(fqn).count() == 4)

    val res = graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 1").head()
    assert(res.getLong(0) > 0, "restore must re-add files")
    val rows = spark.sql(s"SELECT id, v FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == (0 until 6).map(i => (i, i * 10)),
      s"restore must reproduce version 1 exactly: $rows")

    // history intact: the undone state is still time-travelable
    val dir = new Path(base.getPath, "t")
    assert(DeltaLite.read(spark, dir, version = Some(2L)).count() == 4)
    // and the table keeps accepting writes
    spark.sql(s"INSERT INTO $fqn VALUES (99, 990)")
    assert(spark.table(fqn).count() == 7)
    // restoring forward is refused
    val ex = intercept[Exception] {
      graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 99")
    }
    assert(ex.getMessage.contains("precede"), ex.getMessage)
  }

  test("delta: RESTORE rewinds deletion-vector state on unchanged files") {
    val base = tmpDir("restore-dv")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE rsv OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.rsv")
    val fqn = "graft.datasource.rsv.rsv.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) TBLPROPERTIES (" +
      "'delta.enableDeletionVectors' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(10)") // v1
    spark.sql(s"DELETE FROM $fqn WHERE id % 2 = 0")             // v2: DVs only
    assert(spark.table(fqn).count() == 5)
    graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 1")
    // same parquet files, but the DV mask is gone
    assert(spark.sql(s"SELECT id FROM $fqn ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == (0 until 10))
    // ... and restoring back to v2 re-applies the vectors
    graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 2")
    assert(spark.sql(s"SELECT id FROM $fqn ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 3, 5, 7, 9))
  }

  test("iceberg: rollback re-points main, lineage and writes continue") {
    val base = tmpDir("restore-i")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE rsi OPTIONS (warehouse '${base.getPath}') NAMESPACE graft.datasource.rsi")
    val fqn = "graft.datasource.rsi.rsi.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT)")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(3)") // snap A
    val dir = new Path(base.getPath, "t")
    val snapA = IcebergLite.snapshot(spark, dir).snapshotId
    spark.sql(s"INSERT INTO $fqn SELECT id + 10, id FROM range(3)") // snap B
    assert(spark.table(fqn).count() == 6)

    val res = graft.Graft.sql(spark,
      s"RESTORE LAKE TABLE $fqn TO VERSION $snapA").head()
    assert(res.getLong(1) > 0, "rollback must hide snapshot B's files")
    assert(spark.sql(s"SELECT id FROM $fqn ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    // metadata-only: snapshot B still exists for time travel
    assert(IcebergLite.read(spark, dir, version = Some("main")).count() == 3)
    // the next commit parents off the restored snapshot
    spark.sql(s"INSERT INTO $fqn VALUES (77, 77)")
    val lineage = IcebergLite.snapshotLineage(spark, dir)
    assert(lineage.exists(_._2 == snapA) && lineage.size == 2,
      s"post-rollback lineage must be [A, new], got $lineage")
    assert(spark.table(fqn).count() == 4)
    // unknown snapshot id is refused
    val ex = intercept[Exception] {
      graft.Graft.sql(spark, s"RESTORE LAKE TABLE $fqn TO VERSION 123456789")
    }
    assert(ex.getMessage.contains("not found"), ex.getMessage)
  }
}
