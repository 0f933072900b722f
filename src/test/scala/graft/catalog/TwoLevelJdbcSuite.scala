package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

/** db.schema routing for Snowflake/Redshift — pure logic against a fake
  * store, mirroring the reference's namespace walk
  * (JDBCDataSourceCatalogUnit.scala:63-112, SnowflakeDialect.scala:56-75).
  * No network needed.
  */
class TwoLevelJdbcSuite extends AnyFunSuite {

  private val fake = new TwoLevelSchemaStore {
    override def schemas(): Seq[(String, String)] = Seq(
      ("ANALYTICS", "PUBLIC"), ("ANALYTICS", "STAGING"),
      ("RAW", "PUBLIC"), ("RAW", "EVENTS"))
    override def tables(db: Option[String], schema: String): Seq[String] =
      (db, schema) match {
        case (Some("ANALYTICS") | None, "PUBLIC") => Seq("orders", "customers")
        case (Some("RAW"), "EVENTS") => Seq("clicks")
        case _ => Nil
      }
  }

  test("root level lists databases") {
    assert(TwoLevelJdbc.listNamespaces(fake, Nil) == Seq(Seq("ANALYTICS"), Seq("RAW")))
  }

  test("db level lists its schemas (reference listSchemas behavior)") {
    assert(TwoLevelJdbc.listNamespaces(fake, Seq("ANALYTICS")) ==
      Seq(Seq("ANALYTICS", "PUBLIC"), Seq("ANALYTICS", "STAGING")))
    assert(TwoLevelJdbc.listNamespaces(fake, Seq("RAW")) ==
      Seq(Seq("RAW", "EVENTS"), Seq("RAW", "PUBLIC")))
  }

  test("db.schema level is empty when it exists, errors when it doesn't") {
    assert(TwoLevelJdbc.listNamespaces(fake, Seq("RAW", "EVENTS")).isEmpty)
    intercept[NoSuchElementException] {
      TwoLevelJdbc.listNamespaces(fake, Seq("RAW", "NOPE"))
    }
    intercept[NoSuchElementException] {
      TwoLevelJdbc.listNamespaces(fake, Seq("NOPE"))
    }
    intercept[NoSuchElementException] {
      TwoLevelJdbc.listNamespaces(fake, Seq("A", "B", "C"))
    }
  }

  test("tables list under db.schema and bare schema") {
    assert(TwoLevelJdbc.listTables(fake, Seq("ANALYTICS", "PUBLIC")) ==
      Seq("customers", "orders"))
    assert(TwoLevelJdbc.listTables(fake, Seq("PUBLIC")) == Seq("customers", "orders"))
    assert(TwoLevelJdbc.listTables(fake, Nil).isEmpty)
  }

  test("namespaceExists at every depth") {
    assert(TwoLevelJdbc.namespaceExists(fake, Nil))
    assert(TwoLevelJdbc.namespaceExists(fake, Seq("ANALYTICS")))
    assert(TwoLevelJdbc.namespaceExists(fake, Seq("ANALYTICS", "STAGING")))
    assert(!TwoLevelJdbc.namespaceExists(fake, Seq("ANALYTICS", "NOPE")))
    assert(!TwoLevelJdbc.namespaceExists(fake, Seq("NOPE")))
  }

  test("snowflake uppercases unquoted identifiers, redshift preserves them") {
    val sfUrl = "jdbc:snowflake://acct.snowflakecomputing.com"
    val rsUrl = "jdbc:redshift://cluster.region.redshift.amazonaws.com:5439/db"
    assert(TwoLevelJdbc.isTwoLevel(sfUrl) && TwoLevelJdbc.isTwoLevel(rsUrl))
    assert(!TwoLevelJdbc.isTwoLevel("jdbc:postgresql://h/db"))
    assert(TwoLevelJdbc.normalize(sfUrl, Seq("analytics", "public")) == Seq("ANALYTICS", "PUBLIC"))
    assert(TwoLevelJdbc.normalize(rsUrl, Seq("analytics", "public")) == Seq("analytics", "public"))
  }

  test("qualified names quote each part") {
    val sfUrl = "jdbc:snowflake://acct"
    assert(TwoLevelJdbc.qualifiedName(sfUrl, Seq("db", "sch", "t")) ==
      "\"DB\".\"SCH\".\"T\"")
    val rsUrl = "jdbc:redshift://c/db"
    assert(TwoLevelJdbc.qualifiedName(rsUrl, Seq("db", "sch", "has\"quote")) ==
      "\"db\".\"sch\".\"has\"\"quote\"")
  }

  test("JdbcCatalogUnit routes two-level URLs through the store") {
    import graft.model.DataSourceSpec
    val ds = DataSourceSpec("wh", "JDBC", Seq("datasource", "jdbc"),
      Map("url" -> "jdbc:snowflake://acct"))
    val unit = new JdbcCatalogUnit(ds) {
      override protected def store: TwoLevelSchemaStore = fake
    }
    assert(unit.listNamespaces(null, Nil) == Seq(Seq("ANALYTICS"), Seq("RAW")))
    // lowercase input: snowflake normalization applies before the walk
    assert(unit.listTables(null, Seq("analytics", "public")) == Seq("customers", "orders"))
  }
}
