package org.apache.spark.sql.jdbc

import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.catalog.{Identifier, Table}
import org.apache.spark.sql.execution.datasources.jdbc.{JDBCOptions, JDBCRDD, JdbcUtils}
import org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTable
import org.apache.spark.sql.types.StructType

import java.sql.Connection

/** Thin bridge into the private[sql] JDBC machinery, for two-level
  * (db.schema) JDBC stores where Spark's JDBCTableCatalog's single-level
  * namespace model doesn't fit. Same technique as [[org.apache.spark.sql.GraftSQLBridge]];
  * the reference similarly drops into this package for its Snowflake support
  * (reference: org/apache/spark/sql/jdbc/SnowflakeJDBCTableCatalog.scala:34-78).
  */
object GraftJdbcBridge {

  private def options(props: Map[String, String], dbtable: String): JDBCOptions =
    new JDBCOptions(CaseInsensitiveMap(props + (JDBCOptions.JDBC_TABLE_NAME -> dbtable)))

  /** Schema of `dbtable` (any fully-qualified quoted name) via a remote
    * prepared-statement metadata round trip — no data read.
    */
  def resolveTableSchema(props: Map[String, String], dbtable: String): StructType =
    JDBCRDD.resolveTable(options(props, dbtable))

  /** A DSv2 JDBC table reading `dbtable`; inherits Spark's full JDBC scan
    * stack (filter/column/aggregate/limit pushdown).
    */
  def table(ident: Identifier, schema: StructType,
      props: Map[String, String], dbtable: String): Table =
    JDBCTable(ident, schema, options(props, dbtable))

  def withConnection[T](props: Map[String, String])(f: Connection => T): T =
    JdbcUtils.withConnection(options(props, "__graft_invalid"))(f)
}
