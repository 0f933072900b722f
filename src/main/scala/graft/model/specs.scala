package graft.model

import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Metadata specs persisted as JSON by [[GraftModel]].
  *
  * Mirrors the reference's data model (SURVEY.md §1):
  * data sources (reference: execution/command/RegisterDataSourceSpec.scala:40-54),
  * registered source tables (model/LightningHdfsModel.scala:280-297),
  * unified semantic layers with constraints (model/serde/UnifiedSemanticLayer.scala:29-43),
  * and per-table activation queries (LightningHdfsModel.scala:451-489).
  */
object SourceType extends Enumeration {
  val JDBC, ICEBERG, DELTA, PARQUET, ORC, CSV, JSON, AVRO, TEXT, IMAGE, PDF,
      VIDEO, AUDIO, XML, REST = Value
  val fileTypes: Set[Value] = Set(PARQUET, ORC, CSV, JSON, AVRO)
  // AUDIO is a graft extension: the reference parses it but runtime-rejects
  // (execution/command/DataSourceType.scala:26-73); here it scans like the
  // other unstructured types with header-probed metadata columns
  val unstructuredTypes: Set[Value] = Set(TEXT, IMAGE, PDF, VIDEO, AUDIO)
  def of(s: String): Value = values.find(_.toString == s.toUpperCase)
    .getOrElse(throw new IllegalArgumentException(s"unknown source type: $s"))
}

/** Extra user-declared column over an unstructured source, fed from
  * `<file>.tag` JSON sidecars (reference: datasources/v2/Tags.scala:31-50).
  */
final case class TagField(name: String, dataType: String) {
  def toStructField: StructField = StructField(name, DataType.fromDDL(dataType))
}

/** A registered endpoint: JDBC url / warehouse / file path + options. */
final case class DataSourceSpec(
    name: String,
    sourceType: String,
    namespace: Seq[String],
    options: Map[String, String],
    tags: Seq[TagField] = Nil,
    replace: Boolean = false) {
  def typ: SourceType.Value = SourceType.of(sourceType)
  def fqn: Seq[String] = namespace :+ name
}

/** Snapshot of a source table ingested into the metastore namespace:
  * schema + pointer back to the source FQN (re-resolved at query time with
  * the ingested schema, reference: AbstractLightningCatalog.scala:266-271).
  */
final case class RegisteredTableSpec(
    name: String,
    namespace: Seq[String],
    schemaJson: String,
    sourceFqn: Seq[String]) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
}

// ---- USL (unified semantic layer) ----

final case class ColumnSpec(
    name: String,
    dataType: String,
    notNull: Boolean = false,
    primaryKey: Boolean = false,
    unique: Boolean = false,
    references: Option[ForeignKeyRef] = None) {
  def toStructField: StructField =
    StructField(name, DataType.fromDDL(dataType), nullable = !notNull)
}

final case class ForeignKeyRef(table: Seq[String], columns: Seq[String])

final case class PrimaryKeySpec(columns: Seq[String], name: Option[String] = None)
final case class UniqueSpec(columns: Seq[String], name: Option[String] = None)
final case class ForeignKeySpec(
    columns: Seq[String],
    refTable: Seq[String],
    refColumns: Seq[String],
    name: Option[String] = None,
    onDelete: Option[String] = None,
    onUpdate: Option[String] = None)

/** Named boolean SQL expression attached to a USL table
  * (reference: execution/command/Annotation.scala:30).
  */
final case class DataQualitySpec(name: String, expression: String)

final case class TableSpec(
    name: String,
    columns: Seq[ColumnSpec],
    primaryKey: Option[PrimaryKeySpec] = None,
    uniques: Seq[UniqueSpec] = Nil,
    foreignKeys: Seq[ForeignKeySpec] = Nil,
    dataQualities: Seq[DataQualitySpec] = Nil,
    activateQuery: Option[String] = None) {
  def schema: StructType = StructType(columns.map(_.toStructField))
}

final case class UslSpec(
    name: String,
    namespace: Seq[String],
    tables: Seq[TableSpec])

final case class ActivationSpec(table: String, query: String)
