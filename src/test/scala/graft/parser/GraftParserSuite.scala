package graft.parser

import org.scalatest.funsuite.AnyFunSuite

import graft.commands._

class GraftParserSuite extends AnyFunSuite {

  test("sniffs graft vs spark statements") {
    assert(GraftParser.isGraftStatement("REGISTER PARQUET DATASOURCE x OPTIONS(path 'p') NAMESPACE graft.datasource.file"))
    assert(GraftParser.isGraftStatement("  -- comment\n  run dq table graft.metastore.m.t"))
    assert(GraftParser.isGraftStatement("/* c */ COMPILE USL u NAMESPACE graft.metastore DDL create table t(a int)"))
    assert(!GraftParser.isGraftStatement("SELECT * FROM t"))
    assert(!GraftParser.isGraftStatement("SHOW NAMESPACES IN graft"))
    assert(!GraftParser.isGraftStatement("UPDATE t SET a = 1")) // only UPDATE USL is ours
  }

  test("REGISTER DATASOURCE with options and tags") {
    val cmd = GraftParser.parse(
      """REGISTER OR REPLACE PDF DATASOURCE docs OPTIONS (path '/tmp/docs', scanType 'parts_scan')
        |NAMESPACE graft.datasource.files TAG (author string, pages int)""".stripMargin)
      .asInstanceOf[RegisterDataSourceCommand]
    assert(cmd.spec.name == "docs")
    assert(cmd.spec.sourceType == "PDF")
    assert(cmd.spec.replace)
    assert(cmd.spec.options == Map("path" -> "/tmp/docs", "scanType" -> "parts_scan"))
    assert(cmd.spec.namespace == Seq("graft", "datasource", "files"))
    assert(cmd.spec.tags.map(_.name) == Seq("author", "pages"))
  }

  test("REGISTER CATALOG with LIKE pattern") {
    val cmd = GraftParser.parse(
      "REGISTER CATALOG crm SOURCE graft.datasource.pg.db NAME LIKE 'cust%' NAMESPACE graft.metastore")
      .asInstanceOf[RegisterCatalogCommand]
    assert(cmd.name == "crm")
    assert(cmd.source == Seq("graft", "datasource", "pg", "db"))
    assert(cmd.namePattern.contains("cust%"))
  }

  test("COMPILE USL captures raw DDL tail") {
    val cmd = GraftParser.parse(
      "COMPILE USL IF NOT EXISTS mart DEPLOY NAMESPACE graft.metastore DDL create table a(x int); create table b(y string)")
      .asInstanceOf[CompileUslCommand]
    assert(cmd.name == "mart" && cmd.ifNotExists && cmd.deploy)
    assert(cmd.ddl == "create table a(x int); create table b(y string)")
  }

  test("ACTIVATE captures raw query with newlines and quotes") {
    val cmd = GraftParser.parse(
      "ACTIVATE USL TABLE graft.metastore.mart.orders AS select o_orderkey, 'x' as tag\nfrom src where a > 1")
      .asInstanceOf[ActivateUslTableCommand]
    assert(cmd.table == Seq("graft", "metastore", "mart", "orders"))
    assert(cmd.query.startsWith("select o_orderkey"))
    assert(cmd.query.contains("'x'"))
  }

  test("DQ statements") {
    val reg = GraftParser.parse("REGISTER DQ price_pos TABLE graft.metastore.m.orders AS o_totalprice > 0 AND o_orderkey IS NOT NULL")
      .asInstanceOf[RegisterDqCommand]
    assert(reg.expression == "o_totalprice > 0 AND o_orderkey IS NOT NULL")
    val run = GraftParser.parse("RUN DQ TABLE graft.metastore.m.orders").asInstanceOf[RunDqCommand]
    assert(run.name.isEmpty)
    val runNamed = GraftParser.parse("RUN DQ price_pos TABLE graft.metastore.m.orders").asInstanceOf[RunDqCommand]
    assert(runNamed.name.contains("price_pos"))
    val show = GraftParser.parse("SHOW DQ INVALID RECORD price_pos TABLE graft.metastore.m.orders LIMIT 10")
      .asInstanceOf[ShowDqRecordsCommand]
    assert(!show.valid && show.limit == 10)
    val composite = GraftParser.parse("RUN DQ `id,name` TABLE graft.metastore.m.t").asInstanceOf[RunDqCommand]
    assert(composite.name.contains("id,name"))
  }

  test("CREATE TABLE with constraints, annotations-free subset") {
    val specs = GraftParser.parseDdlTables(
      """create table customer (
        |  id bigint primary key,
        |  name varchar(200) not null,
        |  nation_id int references nation(n_id),
        |  email string unique
        |);
        |create table nation (
        |  n_id int,
        |  n_name string,
        |  constraint pk_n primary key (n_id),
        |  constraint u_nm unique (n_name)
        |);
        |create table orders (
        |  o_id bigint,
        |  cust_id bigint,
        |  primary key (o_id),
        |  foreign key (cust_id) references customer(id) on delete cascade on update set null
        |)""".stripMargin)
    assert(specs.map(_.name) == Seq("customer", "nation", "orders"))
    val c = specs(0)
    assert(c.columns.find(_.name == "id").exists(_.primaryKey))
    assert(c.columns.find(_.name == "name").exists(x => x.notNull && x.dataType.toLowerCase == "varchar(200)"))
    assert(c.columns.find(_.name == "nation_id").exists(_.references.exists(_.table == Seq("nation"))))
    assert(c.columns.find(_.name == "email").exists(_.unique))
    val n = specs(1)
    assert(n.primaryKey.exists(p => p.columns == Seq("n_id") && p.name.contains("pk_n")))
    assert(n.uniques.exists(u => u.columns == Seq("n_name")))
    val o = specs(2)
    assert(o.primaryKey.exists(_.columns == Seq("o_id")))
    assert(o.foreignKeys.head.onDelete.contains("CASCADE"))
    assert(o.foreignKeys.head.onUpdate.contains("SET NULL"))
  }

  test("@DataQuality annotations on CREATE TABLE") {
    val specs = GraftParser.parseDdlTables(
      """@DataQuality(name="price_pos", expression="price > 0")
        |@AccessControl(accessType="REGULATED")
        |create table orders (o_id bigint primary key, price double)""".stripMargin)
    val t = specs.head
    assert(t.dataQualities == Seq(graft.model.DataQualitySpec("price_pos", "price > 0")))
    assert(t.primaryKey.isEmpty && t.columns.head.primaryKey)
  }

  test("complex types parse") {
    val specs = GraftParser.parseDdlTables(
      "create table t (a array<int>, m map<string, double>, s struct<x:int, y:string>, d decimal(10,2), iv interval day to second)")
    val t = specs.head
    assert(t.schema.fields.length == 5) // DataType.fromDDL round-trips them all
  }

  test("backticked identifiers with dots and escapes") {
    val cmd = GraftParser.parse(
      "REGISTER PARQUET DATASOURCE `weird``name` OPTIONS (path '/p') NAMESPACE graft.datasource.`a.b`")
      .asInstanceOf[RegisterDataSourceCommand]
    assert(cmd.spec.name == "weird`name")
    assert(cmd.spec.namespace == Seq("graft", "datasource", "a.b"))
  }

  test("comments and case-insensitivity in statements") {
    val cmd = GraftParser.parse(
      """-- register the tpch source
        |/* block comment */ register OR replace PARQUET datasource t1
        |OPTIONS (path '/x') NAMESPACE graft.datasource.f""".stripMargin)
      .asInstanceOf[RegisterDataSourceCommand]
    assert(cmd.spec.replace && cmd.spec.name == "t1")
  }

  test("malformed statements produce clear parse errors") {
    val e1 = intercept[Exception](GraftParser.parse("REGISTER PARQUET DATASOURCE"))
    assert(e1.getMessage.contains("expected"))
    val e2 = intercept[Exception](GraftParser.parse("COMPILE USL x NAMESPACE"))
    assert(e2.getMessage.contains("expected"))
    val e3 = intercept[Exception](GraftParser.parseDdlTables("create table t (a int"))
    assert(e3.getMessage.contains("expected") || e3.getMessage.contains("unbalanced"))
  }

  test("statement splitting respects quotes and parens") {
    val parts = GraftParser.splitStatements("create table a(x int); create table b(s string) -- note: ';' inside quotes\n")
    assert(parts.size == 2)
    val tricky = GraftParser.splitStatements("select 'a;b' as x; select 2")
    assert(tricky == Seq("select 'a;b' as x", "select 2"))
  }

  test("VACUUM RETAIN parses both VERSIONS and HOURS forms") {
    val v = GraftParser.parse("VACUUM LAKE TABLE a.b.t RETAIN 3 VERSIONS")
      .asInstanceOf[graft.plans.VacuumLakeTableCommand]
    assert(v.retainVersions == 3 && v.retainHours.isEmpty)
    val h = GraftParser.parse("VACUUM LAKE TABLE a.b.t RETAIN 168 HOURS")
      .asInstanceOf[graft.plans.VacuumLakeTableCommand]
    assert(h.retainHours == Some(168))
    val d = GraftParser.parse("VACUUM LAKE TABLE a.b.t")
      .asInstanceOf[graft.plans.VacuumLakeTableCommand]
    assert(d.retainVersions == 1 && d.retainHours.isEmpty)
  }

  test("RESTORE LAKE TABLE parses with 64-bit snapshot ids") {
    val p = GraftParser.parse("RESTORE LAKE TABLE graft.datasource.l.d.t TO VERSION 3")
      .asInstanceOf[graft.plans.RestoreLakeTableCommand]
    assert(p.table == Seq("graft", "datasource", "l", "d", "t") && p.version == Some(3L))
    // Iceberg snapshot ids exceed Int
    val big = GraftParser.parse(
      "RESTORE LAKE TABLE graft.datasource.l.i.t TO VERSION 7296542107840584501")
      .asInstanceOf[graft.plans.RestoreLakeTableCommand]
    assert(big.version == Some(7296542107840584501L))
    assert(GraftParser.isGraftStatement("RESTORE LAKE TABLE a.b TO VERSION 1"))
    // timestamp form
    val ts = GraftParser.parse(
      "RESTORE LAKE TABLE a.b TO TIMESTAMP '2024-05-01 12:00:00'")
      .asInstanceOf[graft.plans.RestoreLakeTableCommand]
    assert(ts.version.isEmpty && ts.timestamp == Some("2024-05-01 12:00:00"))
    val e = intercept[Exception](GraftParser.parse("RESTORE LAKE TABLE a.b TO 1"))
    assert(e.getMessage.toLowerCase.contains("version") ||
      e.getMessage.contains("expected"), e.getMessage)
  }
}
