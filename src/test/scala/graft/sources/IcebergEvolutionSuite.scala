package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase

import java.nio.file.Files

/** Iceberg schema evolution through field-id parquet resolution: renames
  * keep their field id (pre-rename files serve data under the new name),
  * drop/re-add allocates a fresh id (the dead column's bytes never
  * resurface), and the whole read path — plain scans, merge-on-read
  * deletes, equality deletes, changelog — keeps working across the
  * evolution. This is the read surface a long-lived production table hits
  * first; the reference delegates it to the Iceberg runtime jar
  * (reference: AbstractIcebergCatalogUnit.scala:28-67), here it is Spark's
  * own field-id reader (spark.sql.parquet.fieldId.read.enabled) driven by
  * ids the metadata tracks.
  */
class IcebergEvolutionSuite extends SparkTestBase {

  private def tmpDir(prefix: String): java.io.File =
    Files.createTempDirectory(prefix).toFile

  private def mkTable(ns: String, props: String = ""): (String, Path) = {
    val base = tmpDir(s"ice-evo-$ns")
    graft.Graft.sql(spark,
      s"REGISTER OR REPLACE ICEBERG DATASOURCE $ns OPTIONS (warehouse '${base.getPath}') " +
        s"NAMESPACE graft.datasource.$ns")
    val fqn = s"graft.datasource.$ns.$ns.t"
    spark.sql(s"CREATE TABLE $fqn (id INT, a INT, b STRING)" +
      (if (props.isEmpty) "" else s" TBLPROPERTIES ($props)"))
    (fqn, new Path(base.getPath, "t"))
  }

  test("rename: pre-rename files resolve by field id under the new name") {
    val (fqn, dir) = mkTable("evo1")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 11, 'x'), (2, 22, 'y')")
    spark.sql(s"ALTER TABLE $fqn RENAME COLUMN a TO a2")
    spark.sql(s"INSERT INTO $fqn VALUES (3, 33, 'z')")

    val snap = IcebergLite.snapshot(spark, dir)
    assert(snap.idSchema.isDefined, "rename must flip the scan to field-id resolution")
    assert(snap.schema.fieldNames.toSeq == Seq("id", "a2", "b"))

    val rows = spark.sql(s"SELECT id, a2, b FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(rows == Seq((1, 11, "x"), (2, 22, "y"), (3, 33, "z")),
      "pre-rename files must serve their data under the renamed column")

    // filters against the renamed column still prune and push correctly
    val filtered = spark.sql(s"SELECT id FROM $fqn WHERE a2 = 22").collect()
      .map(_.getInt(0)).toSeq
    assert(filtered == Seq(2))
  }

  test("drop then re-add: the dead column's data never resurfaces") {
    val (fqn, dir) = mkTable("evo2")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 11, 'old-b1'), (2, 22, 'old-b2')")
    spark.sql(s"ALTER TABLE $fqn DROP COLUMN b")
    assert(spark.sql(s"SELECT * FROM $fqn").schema.fieldNames.toSeq == Seq("id", "a"))
    spark.sql(s"ALTER TABLE $fqn ADD COLUMNS (b STRING)")
    spark.sql(s"INSERT INTO $fqn VALUES (3, 33, 'new-b3')")

    val snap = IcebergLite.snapshot(spark, dir)
    assert(snap.idSchema.isDefined, "re-added name must flip to field-id resolution")

    val rows = spark.sql(s"SELECT id, a, b FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2)))).toSeq
    assert(rows == Seq((1, 11, None), (2, 22, None), (3, 33, Some("new-b3"))),
      "the re-added column must read NULL from pre-drop files (fresh field id), " +
        "never the dropped column's bytes")
  }

  test("rename + drop/re-add compose; old ids stay retired across further commits") {
    val (fqn, dir) = mkTable("evo3")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 11, 'b1')")
    spark.sql(s"ALTER TABLE $fqn RENAME COLUMN a TO score")
    spark.sql(s"ALTER TABLE $fqn DROP COLUMN b")
    spark.sql(s"ALTER TABLE $fqn ADD COLUMNS (b STRING)")
    spark.sql(s"INSERT INTO $fqn VALUES (2, 22, 'b2')")
    spark.sql(s"INSERT INTO $fqn VALUES (3, 33, 'b3')")
    val rows = spark.sql(s"SELECT id, score, b FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2)))).toSeq
    assert(rows == Seq((1, 11, None), (2, 22, Some("b2")), (3, 33, Some("b3"))))

    // metadata sanity: ids are permanent and fresh ids advance
    val conf = spark.sparkContext.hadoopConfiguration
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val meta = org.json4s.jackson.JsonMethods.parse(
      IcebergLite.readString(conf, IcebergLite.currentMetadataFile(conf, dir)))
    val schemas = (meta \ "schemas").asInstanceOf[org.json4s.JArray].arr
    assert(schemas.size >= 4, "every evolution must append a schema generation")
    val cur = schemas.maxBy(s => (s \ "schema-id").extract[Int])
    val fields = (cur \ "fields").asInstanceOf[org.json4s.JArray].arr
      .map(f => ((f \ "name").extract[String], (f \ "id").extract[Int])).toMap
    assert(fields("score") == 2, "rename must keep field id 2")
    assert(fields("b") == 4, s"re-added b must get a FRESH id (got ${fields("b")})")
    assert((meta \ "last-column-id").extract[Int] == 4)
  }

  test("merge-on-read DML and equality upserts keep applying across a rename") {
    val (fqn, dir) = mkTable("evo4", "'write.delete.mode' = 'merge-on-read'")
    spark.sql(s"INSERT INTO $fqn SELECT id, id * 10, concat('b', id) FROM range(6)")
    // position delete BEFORE the rename
    spark.sql(s"DELETE FROM $fqn WHERE id = 1")
    spark.sql(s"ALTER TABLE $fqn RENAME COLUMN a TO a2")
    // and one AFTER (the delete files and data files span the evolution)
    spark.sql(s"DELETE FROM $fqn WHERE a2 = 40")
    val rows = spark.sql(s"SELECT id, a2 FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((0, 0), (2, 20), (3, 30), (5, 50)),
      "position deletes on both sides of the rename must keep masking")

    // equality-delete upsert keyed on the RENAMED column: the pre-rename
    // data files must still match by field id
    val batch = spark.sql("SELECT * FROM (VALUES (20, 'upserted'), (77, 'new')) AS s(a2, b)")
      .withColumn("id", col("a2") / 10)
      .selectExpr("CAST(id AS INT) id", "a2", "b")
    LakeNativeWrite.icebergEqUpsert(spark, dir, batch, Seq("a2"))
    val after = spark.sql(s"SELECT id, a2, b FROM $fqn ORDER BY a2").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(after == Seq((0, 0, "b0"), (2, 20, "upserted"), (3, 30, "b3"),
      (5, 50, "b5"), (7, 77, "new")))
  }

  test("changelog and time travel survive the evolution") {
    val (fqn, dir) = mkTable("evo5")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 11, 'x')")
    val v1 = IcebergLite.snapshot(spark, dir).snapshotId
    spark.sql(s"ALTER TABLE $fqn RENAME COLUMN a TO a2")
    spark.sql(s"INSERT INTO $fqn VALUES (2, 22, 'y')")

    // time travel reads with the SNAPSHOT's schema (Iceberg's semantics):
    // the pre-rename snapshot still shows column `a`
    val old = IcebergLite.read(spark, dir, version = Some(v1.toString))
    assert(old.schema.fieldNames.toSeq == Seq("id", "a", "b"),
      s"travel must use the snapshot's schema, got ${old.schema.fieldNames.toSeq}")
    assert(old.select("id", "a").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((1, 11)))

    // the changelog walks both sides of the rename
    val feed = IcebergLite.changes(spark, dir)
      .select("id", "a2", "_change_type").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(feed == Seq((1, 11, "insert"), (2, 22, "insert")))
  }

  test("ALTER COLUMN TYPE: widening promotions read old narrow files up-converted") {
    val (fqn, dir) = mkTable("evo7")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 11, 'x')")
    spark.sql(s"ALTER TABLE $fqn ALTER COLUMN a TYPE BIGINT")
    spark.sql(s"INSERT INTO $fqn VALUES (2, ${Int.MaxValue.toLong + 5}, 'y')")
    val rows = spark.sql(s"SELECT id, a FROM $fqn ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rows == Seq((1, 11L), (2, Int.MaxValue.toLong + 5)),
      "old int32 files must read up-converted; new files carry true longs")
    // the id is unchanged and the history grew
    val conf = spark.sparkContext.hadoopConfiguration
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    val meta = org.json4s.jackson.JsonMethods.parse(
      IcebergLite.readString(conf, IcebergLite.currentMetadataFile(conf, dir)))
    val schemas = (meta \ "schemas").asInstanceOf[org.json4s.JArray].arr
    assert(schemas.size == 2)
    // narrowing is refused by Spark's analyzer before it reaches us
    val ex = intercept[Exception] {
      spark.sql(s"ALTER TABLE $fqn ALTER COLUMN a TYPE INT")
    }
    assert(ex.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), ex.getMessage)
    // an up-cast Spark allows but the Iceberg spec does not (long -> string)
    // is refused by OUR guard
    val ex2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $fqn ALTER COLUMN a TYPE STRING")
    }
    assert(ex2.getMessage.contains("widening"), ex2.getMessage)
    // and widening composes with a rename (same id throughout)
    spark.sql(s"ALTER TABLE $fqn RENAME COLUMN a TO a_wide")
    assert(spark.sql(s"SELECT a_wide FROM $fqn WHERE id = 1").collect()
      .map(_.getLong(0)).toSeq == Seq(11L))
  }

  test("DROP COLUMN refuses while live equality deletes key on it") {
    val (fqn, dir) = mkTable("evo8")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 11, 'x'), (2, 22, 'y')")
    import spark.implicits._
    val batch = Seq((2, 99, "upserted"), (3, 33, "new")).toDF("id", "a", "b")
    LakeNativeWrite.icebergEqUpsert(spark, dir, batch, Seq("a"))
    // the eq-delete file keys on `a` (field id 2): dropping it would make
    // every later read throw on id resolution
    val ex = intercept[Exception] { spark.sql(s"ALTER TABLE $fqn DROP COLUMN a") }
    assert(ex.getMessage.contains("equality-delete"), ex.getMessage)
    // an uninvolved column still drops fine
    spark.sql(s"ALTER TABLE $fqn DROP COLUMN b")
    assert(spark.table(fqn).schema.fieldNames.toSeq == Seq("id", "a"))
  }

  test("single-schema tables stay on the name path (no id metadata, no conf dependency)") {
    val (fqn, dir) = mkTable("evo6")
    spark.sql(s"INSERT INTO $fqn VALUES (1, 11, 'x')")
    // pure ADD COLUMNS grows the history but no rename/re-add: name
    // resolution remains provably exact, so the scan must NOT flip
    spark.sql(s"ALTER TABLE $fqn ADD COLUMNS (extra INT)")
    val snap = IcebergLite.snapshot(spark, dir)
    assert(snap.idSchema.isEmpty, "additive-only evolution must stay on name resolution")
    assert(spark.sql(s"SELECT id, a, b, extra FROM $fqn").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), Option(r.get(3)))).toSeq ==
      Seq((1, 11, "x", None)))
  }
}
