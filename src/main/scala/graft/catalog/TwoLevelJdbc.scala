package graft.catalog

import org.apache.spark.sql.jdbc.GraftJdbcBridge

/** Metadata view of a two-level (database.schema) JDBC store. Abstracted so
  * the routing logic below is unit-testable without a live warehouse; the
  * production implementation wraps `DatabaseMetaData.getSchemas/getTables`.
  */
trait TwoLevelSchemaStore {
  /** All (database, schema) pairs the connection can see. */
  def schemas(): Seq[(String, String)]
  /** Table names in `schema`; `db` None = any database (driver default). */
  def tables(db: Option[String], schema: String): Seq[String]
}

/** Namespace routing for two-level JDBC stores (Snowflake, Redshift).
  *
  * Spark's JDBCTableCatalog models one namespace level (the schema); these
  * warehouses expose database.schema.table, so a registered datasource has
  * TWO namespace levels under it and the walk must route accordingly —
  * matching the reference's behavior
  * (reference: catalog/JDBCDataSourceCatalogUnit.scala:63-112,
  * org/apache/spark/sql/jdbc/SnowflakeDialect.scala:31-75):
  *
  *  - `SHOW NAMESPACES IN ds`          -> databases
  *  - `SHOW NAMESPACES IN ds.db`       -> schemas of db
  *  - `SHOW NAMESPACES IN ds.db.sch`   -> empty if it exists, error if not
  *  - `SHOW TABLES IN ds.db.sch`       -> tables of that schema
  *  - `ds.db.sch.t`                    -> table, read as "db"."schema"."t"
  *
  * Snowflake stores unquoted identifiers uppercase, so namespaces are
  * uppercased before matching (reference: JDBCDataSourceCatalogUnit.scala:64-68).
  */
object TwoLevelJdbc {

  def isSnowflake(url: String): Boolean =
    url.toLowerCase.startsWith("jdbc:snowflake")

  def isTwoLevel(url: String): Boolean = {
    val u = url.toLowerCase
    u.startsWith("jdbc:snowflake") || u.startsWith("jdbc:redshift")
  }

  def normalize(url: String, ns: Seq[String]): Seq[String] =
    if (isSnowflake(url)) ns.map(_.toUpperCase) else ns

  /** ANSI double-quote (Snowflake and Redshift both honor it). */
  def quote(part: String): String = "\"" + part.replace("\"", "\"\"") + "\""

  def qualifiedName(url: String, parts: Seq[String]): String =
    normalize(url, parts).map(quote).mkString(".")

  def listNamespaces(store: TwoLevelSchemaStore, ns: Seq[String]): Seq[Seq[String]] =
    ns match {
      case Nil =>
        store.schemas().map(_._1).distinct.sorted.map(Seq(_))
      case Seq(db) =>
        val hits = store.schemas().filter(_._1 == db)
        if (hits.isEmpty) throw new NoSuchElementException(s"namespace $db not found")
        hits.map(_._2).distinct.sorted.map(s => Seq(db, s))
      case Seq(db, schema) =>
        if (store.schemas().contains((db, schema))) Nil
        else throw new NoSuchElementException(s"namespace $db.$schema not found")
      case other =>
        throw new NoSuchElementException(s"namespace ${other.mkString(".")} too deep for a db.schema store")
    }

  def listTables(store: TwoLevelSchemaStore, ns: Seq[String]): Seq[String] =
    ns match {
      case Nil => Nil
      case Seq(schema) => store.tables(None, schema).sorted
      case Seq(db, schema) => store.tables(Some(db), schema).sorted
      case other =>
        throw new NoSuchElementException(s"namespace ${other.mkString(".")} too deep for a db.schema store")
    }

  def namespaceExists(store: TwoLevelSchemaStore, ns: Seq[String]): Boolean =
    ns match {
      case Nil => true
      case Seq(db) => store.schemas().exists(_._1 == db)
      case Seq(db, schema) => store.schemas().contains((db, schema))
      case _ => false
    }
}

/** Production store over a live JDBC connection's DatabaseMetaData.
  * getSchemas returns (TABLE_SCHEM, TABLE_CATALOG) columns — note the
  * database is column 2, the schema column 1.
  */
final class MetaDataSchemaStore(props: Map[String, String]) extends TwoLevelSchemaStore {
  override def schemas(): Seq[(String, String)] =
    GraftJdbcBridge.withConnection(props) { conn =>
      val rs = conn.getMetaData.getSchemas()
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (rs.next()) out += ((Option(rs.getString(2)).getOrElse(""), rs.getString(1)))
      out.toSeq
    }

  override def tables(db: Option[String], schema: String): Seq[String] =
    GraftJdbcBridge.withConnection(props) { conn =>
      val rs = conn.getMetaData.getTables(db.orNull, schema, "%", Array("TABLE"))
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next()) out += rs.getString("TABLE_NAME")
      out.toSeq
    }
}
