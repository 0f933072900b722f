package graft.catalog

import org.apache.spark.sql.SparkSession
import graft.model.GraftModel

/** Locates the registered graft catalog (name + warehouse) in a session.
  * The catalog is registered with
  * `spark.sql.catalog.<name> = graft.catalog.GraftCatalog` and
  * `spark.sql.catalog.<name>.warehouse = <dir>`; commands executed outside
  * the catalog (LeafRunnableCommands) resolve the model through here.
  */
object GraftEnv {
  val DefaultCatalogName = "graft"

  def catalogName(spark: SparkSession): String = {
    val all = spark.conf.getAll
    all.collectFirst {
      case (k, v) if k.startsWith("spark.sql.catalog.") && !k.drop(18).contains('.') &&
        v == classOf[GraftCatalog].getName => k.drop(18)
    }.getOrElse(DefaultCatalogName)
  }

  def warehouse(spark: SparkSession): String = {
    val name = catalogName(spark)
    spark.conf.getOption(s"spark.sql.catalog.$name.warehouse").getOrElse(
      throw new IllegalStateException(
        s"spark.sql.catalog.$name.warehouse is not set; register the graft catalog first"))
  }

  def model(spark: SparkSession): GraftModel = GraftModel(warehouse(spark))

  /** Ensure the catalog is registered on this session (runtime-settable: DSv2
    * catalogs are instantiated lazily on first reference).
    *
    * Also turns on `spark.sql.parquet.fieldId.read.enabled` ONCE, here —
    * a documented install-time session setting, not a mid-read mutation.
    * Iceberg tables whose history demands field-id resolution (renames,
    * drop/re-add) read under an id-annotated requested schema; Spark only
    * consults this flag from the session conf inside ParquetFileFormat,
    * so a session-level set is the only lever. The flag is semantically
    * inert for requested schemas WITHOUT `parquet.field.id` metadata
    * (every other scan), and for schemas WITH ids the flipped behavior is
    * the correct one — with ignoreMissing left false, an id-annotated
    * schema over id-less files fails loudly rather than null-filling.
    */
  def install(spark: SparkSession, warehouseDir: String,
      name: String = DefaultCatalogName): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", warehouseDir)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
  }

  /** Strip the catalog name off a user-supplied multipart identifier. */
  def stripCatalog(spark: SparkSession, parts: Seq[String]): Seq[String] =
    if (parts.nonEmpty && parts.head.equalsIgnoreCase(catalogName(spark))) parts.tail
    else parts

  def quote(parts: Seq[String]): String =
    parts.map(p => s"`${p.replace("`", "``")}`").mkString(".")
}
