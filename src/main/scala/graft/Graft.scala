package graft

import org.apache.spark.sql.{DataFrame, GraftSQLBridge, SparkSession}

import graft.catalog.GraftEnv
import graft.parser.GraftParser

/** User-facing facade.
  *
  * Preferred setup is session conf (parser injection + catalog):
  * {{{
  *   spark.sql.extensions                     graft.GraftExtensions
  *   spark.sql.catalog.graft                  graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.warehouse        /path/to/metastore
  * }}}
  * after which `spark.sql("REGISTER ... / COMPILE USL ... / SELECT ...")`
  * handles both dialects. [[Graft.sql]] additionally works on sessions
  * created WITHOUT the extension (it routes graft statements through
  * [[GraftParser]] directly), since DSv2 catalogs are runtime-installable
  * but parsers are not.
  */
object Graft {

  /** Install the graft catalog on a live session (no extension needed). */
  def install(spark: SparkSession, warehouse: String,
      name: String = GraftEnv.DefaultCatalogName): Unit = {
    GraftEnv.install(spark, warehouse, name)
    // ALWAYS drop cached catalog instances: a previously-instantiated
    // catalog pins the model it was built with, and the session conf can
    // have been re-pointed behind its back (SparkSession.builder
    // .getOrCreate on a live session re-applies builder configs without
    // any catalog reset), so conf-vs-target comparison cannot detect a
    // stale instance. The reset is cheap (instances rebuild lazily) and
    // install() is called once per warehouse move, not per statement.
    GraftSQLBridge.resetCatalogManager(spark)
    functions.GraftFunctions.registerAll(spark)
  }

  /** Run one statement: graft DDL through our parser, everything else
    * through spark.sql.
    */
  def sql(spark: SparkSession, statement: String): DataFrame =
    if (GraftParser.isGraftStatement(statement))
      GraftSQLBridge.ofRows(spark, GraftParser.parse(statement))
    else spark.sql(statement)
}
