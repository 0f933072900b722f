package graft.sources.unstructured

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.types.StructType

import graft.catalog.CatalogUnit
import graft.model.DataSourceSpec
import graft.sources.DataFrameV1Table

/** Routes an unstructured datasource's two tables: the metadata table (named
  * after the datasource) and the `content` sub-table
  * (reference: datasources/v2/UnstructuredFileTable.scala:37-153,
  * PdfTable.scala:31-71).
  */
final class UnstructuredCatalogUnit(ds: DataSourceSpec) extends CatalogUnit {

  override def loadTable(spark: SparkSession, rest: Seq[String], name: String,
      schemaOverride: Option[StructType]): Table = name match {
    case n if n == ds.name =>
      new DataFrameV1Table(ds.name, Unstructured.tableSchema(spark, ds),
        s => Unstructured.metadataTable(s, ds))
    case "content" =>
      new DataFrameV1Table(s"${ds.name}.content",
        Unstructured.contentSchema(ds.sourceType.toLowerCase),
        s => Unstructured.contentTable(s, ds))
    case other => throw new NoSuchElementException(
      s"unstructured datasource ${ds.name} has tables [${ds.name}, content], not $other")
  }

  override def listTables(spark: SparkSession, rest: Seq[String]): Seq[String] =
    Seq(ds.name, "content")
}
