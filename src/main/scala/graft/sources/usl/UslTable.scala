package graft.sources.usl

import org.apache.spark.sql.SparkSession
import graft.model.TableSpec
import graft.sources.DataFrameV1Table

final class TableNotActivatedException(table: String)
  extends IllegalStateException(
    s"USL table $table is not activated; run ACTIVATE USL TABLE $table AS <query>")

/** A virtual (USL) table: declared schema + registered activation query.
  * Reading executes the activation SQL as a nested query lifecycle and
  * splices its RDD into the outer plan
  * (reference: datasources/v2/usl/USLTable.scala:33-54, USLTableScan.scala:43-53;
  * throws when unactivated, USLTableScan.scala:48-50).
  */
object UslTable {
  def apply(fqTableName: String, spec: TableSpec): DataFrameV1Table = {
    val query = spec.activateQuery.getOrElse(throw new TableNotActivatedException(fqTableName))
    new DataFrameV1Table(fqTableName, spec.schema, (spark: SparkSession) => spark.sql(query))
  }
}
