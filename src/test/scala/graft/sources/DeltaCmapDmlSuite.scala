package graft.sources.lake

import org.apache.hadoop.fs.Path
import graft.SparkTestBase

/** Row-level DML over COLUMN-MAPPED Delta tables: the rewrite path must
  * write physical column names (and the DV path must key them), or DML
  * would silently orphan the data columns under logical names.
  */
class DeltaCmapDmlSuite extends SparkTestBase {
  private def tmpDir(p: String) = java.nio.file.Files.createTempDirectory(p).toFile

  test("copy-on-write DELETE/UPDATE/MERGE on a name-mapped table") {
    val base = tmpDir("cmap-dml")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE cmdml OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.cmdml")
    val fqn = "graft.datasource.cmdml.cmdml.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT, p INT) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('delta.columnMapping.mode' = 'name')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 10, id % 2 FROM range(8)")
    spark.sql(s"DELETE FROM $fqn WHERE id = 3")
    spark.sql(s"UPDATE $fqn SET v = v + 1 WHERE p = 0")
    spark.sql("SELECT * FROM (VALUES (2, 999), (90, 900)) AS s(id, v)")
      .createOrReplaceTempView("__cmap_merge_src")
    spark.sql(s"MERGE INTO $fqn t USING __cmap_merge_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES (s.id, s.v, 7)")
    val rows = spark.sql(s"SELECT id, v, p FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(rows == Seq((0, 1, 0), (1, 10, 1), (2, 999, 0), (4, 41, 0),
      (5, 50, 1), (6, 61, 0), (7, 70, 1), (90, 900, 7)), rows.toString)
    // physical names on disk: no parquet file carries the LOGICAL name
    val snap = DeltaLite.snapshot(spark, new Path(base.getPath, "t"))
    assert(snap.physSchema.isDefined)
  }

  test("deletion-vector DELETE on a name-mapped table masks without rewrites") {
    val base = tmpDir("cmap-dvdml")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE DELTA DATASOURCE cmdv OPTIONS (path '${base.getPath}') NAMESPACE graft.datasource.cmdv")
    val fqn = "graft.datasource.cmdv.cmdv.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, v INT) TBLPROPERTIES (" +
      "'delta.columnMapping.mode' = 'name', 'delta.enableDeletionVectors' = 'true')")
    spark.sql(s"INSERT INTO $fqn SELECT id, id FROM range(10)")
    val td = new java.io.File(base.getPath, "t")
    val before = td.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).toSet
    spark.sql(s"DELETE FROM $fqn WHERE id % 3 = 0")
    val after = td.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).toSet
    assert(before == after, "a DV delete on a mapped table must not rewrite files")
    assert(spark.sql(s"SELECT id FROM $fqn ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 2, 4, 5, 7, 8))
    val snap = DeltaLite.snapshot(spark, new Path(base.getPath, "t"))
    assert(snap.dvs.nonEmpty && snap.protocol.readerFeatures.contains("columnMapping"))
  }
}
