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
    */
  def install(spark: SparkSession, warehouseDir: String,
      name: String = DefaultCatalogName): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", warehouseDir)
  }

  /** Strip the catalog name off a user-supplied multipart identifier. */
  def stripCatalog(spark: SparkSession, parts: Seq[String]): Seq[String] =
    if (parts.nonEmpty && parts.head.equalsIgnoreCase(catalogName(spark))) parts.tail
    else parts

  def quote(parts: Seq[String]): String =
    parts.map(p => s"`${p.replace("`", "``")}`").mkString(".")
}
