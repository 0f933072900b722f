package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CatalogQueries, DataEng, Pipeline, QuerySpec, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator surfaces here as a named query over the
  * driver-provided testdata dir, paired (when ANSI-SQL-expressible) with a
  * DuckDB oracle in [[oracleSql]]. Column names match between the two — the
  * driver sorts columns by name and hashes values.
  */
object SparkEntry {

  def allSpecs: Seq[QuerySpec] =
    Relational.specs ++ Pipeline.specs ++ CatalogQueries.specs ++ DataEng.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own federated revenue example
    * (doc/doc/lightning-commands.md:113-128) over the testdata star schema.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allSpecs.collect { case QuerySpec(n, _, Some(sql)) => n -> sql }.toMap
}
