package graft.commands

import org.apache.spark.sql.{GraftSQLBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Literal, Not}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._
import org.json4s.jackson.Serialization.{read, write}

import graft.catalog.GraftEnv
import graft.model._
import graft.model.GraftModel.formats

/** The graft DDL command family (SURVEY.md §2.1): each statement is a
  * LeafRunnableCommand whose body runs on the driver and whose data movement
  * happens inside the Spark jobs it spawns
  * (reference: execution/command/LightningCommandBase.scala:34-108).
  */
trait GraftCommandBase extends LeafRunnableCommand {
  protected def attr(name: String, dt: DataType = StringType): AttributeReference =
    AttributeReference(name, dt, nullable = true)()
}

/** REGISTER [OR REPLACE] <type> DATASOURCE name OPTIONS(...) NAMESPACE ns [TAG (...)]
  * (reference: RegisterDataSourceSpec.scala:40-114)
  */
case class RegisterDataSourceCommand(spec: DataSourceSpec) extends GraftCommandBase {
  override val output: Seq[Attribute] = Seq(attr("registered"))

  private def requireOption(key: String): Unit =
    require(spec.options.contains(key),
      s"${spec.sourceType} datasource requires option $key")

  override def run(spark: SparkSession): Seq[Row] = {
    spec.typ match {
      case SourceType.JDBC => requireOption("url")
      case SourceType.ICEBERG => requireOption("warehouse")
      case SourceType.DELTA => requireOption("path")
      case t if SourceType.fileTypes.contains(t) || SourceType.unstructuredTypes.contains(t) =>
        requireOption("path")
        val st = spec.options.getOrElse("scanType", "file_scan")
        require(Seq("file_scan", "recursive_scan", "parts_scan").contains(st),
          s"invalid scanType $st")
      case _ => // REST/AUDIO/XML: parse-accepted, runtime-rejected on load
    }
    val path = GraftEnv.model(spark).saveDataSource(
      spec.copy(namespace = GraftEnv.stripCatalog(spark, spec.namespace)))
    Seq(Row(path))
  }
}

/** REGISTER [OR REPLACE] CATALOG name SOURCE src [NAME LIKE pat] NAMESPACE ns:
  * walks the source namespace, snapshots each table's schema into the
  * metastore (reference: RegisterCatalogSpec.scala:31-91).
  */
case class RegisterCatalogCommand(
    name: String,
    source: Seq[String],
    namePattern: Option[String],
    namespace: Seq[String],
    replace: Boolean) extends GraftCommandBase {
  override val output: Seq[Attribute] = Seq(attr("table"))

  private def likeMatches(table: String): Boolean = namePattern.forall { pat =>
    // SQL LIKE -> regex: % -> .*, _ -> . (reference: RegisterCatalogSpec.scala:41-49)
    val rx = pat.flatMap {
      case '%' => ".*"
      case '_' => "."
      case c if "\\.[]{}()*+-?^$|".contains(c) => s"\\$c"
      case c => c.toString
    }
    table.toLowerCase.matches(rx.toLowerCase)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val model = GraftEnv.model(spark)
    val catName = GraftEnv.catalogName(spark)
    val srcNs = GraftEnv.stripCatalog(spark, source)
    val targetNs = GraftEnv.stripCatalog(spark, namespace) :+ name
    val registered = scala.collection.mutable.ArrayBuffer.empty[String]

    def walk(ns: Seq[String], target: Seq[String]): Unit = {
      val df = spark.sql(s"SHOW TABLES IN ${GraftEnv.quote(catName +: ns)}")
      df.collect().foreach { row =>
        val tbl = row.getString(1)
        if (likeMatches(tbl)) {
          val schema = spark.table(GraftEnv.quote((catName +: ns) :+ tbl)).schema
          model.saveTable(RegisteredTableSpec(tbl, target, schema.json, ns :+ tbl))
          registered += ((target :+ tbl).mkString("."))
        }
      }
      val children = spark.sql(s"SHOW NAMESPACES IN ${GraftEnv.quote(catName +: ns)}")
      children.collect().foreach { row =>
        val child = row.getString(0).split('.').last
        walk(ns :+ child, target :+ child)
      }
    }
    walk(srcNs, targetNs)
    registered.map(Row(_)).toSeq
  }
}

/** COMPILE USL [IF NOT EXISTS] db [DEPLOY] NAMESPACE ns DDL <ddls>
  * (reference: CompileUSLSpec.scala:31-112)
  */
case class CompileUslCommand(
    name: String,
    ifNotExists: Boolean,
    deploy: Boolean,
    namespace: Seq[String],
    ddl: String) extends GraftCommandBase {
  override val output: Seq[Attribute] = Seq(attr("json"))

  override def run(spark: SparkSession): Seq[Row] = {
    val model = GraftEnv.model(spark)
    val ns = GraftEnv.stripCatalog(spark, namespace)
    if (model.loadUsl(ns, name).isDefined) {
      if (ifNotExists) return Seq(Row(write(model.loadUsl(ns, name).get)))
      else throw new IllegalStateException(s"USL $name already exists in ${ns.mkString(".")}")
    }
    val tables = graft.parser.GraftParser.parseDdlTables(ddl)
    // duplicate-table check (reference: CompileUSLSpec.scala:40-51)
    val dups = tables.groupBy(_.name.toLowerCase).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate table(s) in USL DDL: ${dups.mkString(", ")}")
    // FK target validation + FQN rewrite (reference: CompileUSLSpec.scala:53-102)
    val names = tables.map(_.name.toLowerCase).toSet
    val uslFqn = ns :+ name
    val rewritten = tables.map { tb =>
      tb.copy(
        foreignKeys = tb.foreignKeys.map { fk =>
          val ref = fk.refTable
          if (ref.size == 1) {
            require(names.contains(ref.head.toLowerCase),
              s"FK in ${tb.name} references unknown table ${ref.head}")
            fk.copy(refTable = uslFqn :+ ref.head)
          } else fk
        },
        columns = tb.columns.map { c =>
          c.copy(references = c.references.map { r =>
            if (r.table.size == 1) {
              require(names.contains(r.table.head.toLowerCase),
                s"FK in ${tb.name}.${c.name} references unknown table ${r.table.head}")
              ForeignKeyRef(uslFqn :+ r.table.head, r.columns)
            } else r
          })
        })
    }
    val spec = UslSpec(name, ns, rewritten)
    if (deploy) model.saveUsl(spec)
    Seq(Row(write(spec)))
  }
}

/** ACTIVATE USL TABLE tbl AS <query>: analyzes the query and enforces
  * column-count + widening-only type compatibility
  * (reference: ActivateUSLTableSpec.scala:33-88, LightningSource.scala:68-90).
  */
case class ActivateUslTableCommand(table: Seq[String], query: String) extends GraftCommandBase {
  override val output: Seq[Attribute] = Seq(attr("activated"))

  /** Widening-only compatibility matrix, ported from the reference's
    * dataTypeQueryable (LightningSource.scala:68-90).
    */
  def dataTypeQueryable(defined: DataType, queried: DataType): Boolean = (defined, queried) match {
    case (LongType, ByteType | ShortType | IntegerType | LongType) => true
    case (IntegerType, ByteType | ShortType | IntegerType) => true
    case (ShortType, ByteType | ShortType) => true
    case (DoubleType, FloatType | DoubleType) => true
    case (d1: DecimalType, d2: DecimalType) => d1.precision >= d2.precision && d1.scale >= d2.scale
    case (VarcharType(l1), VarcharType(l2)) => l1 >= l2
    case (VarcharType(_), StringType) => true
    case (StringType, StringType | _: VarcharType | _: CharType) => true
    case (a, b) => DataType.equalsStructurally(a, b, ignoreNullability = true)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val parts = GraftEnv.stripCatalog(spark, table)
    require(parts.size >= 3, s"USL table must be <ns...>.<usl>.<table>, got ${table.mkString(".")}")
    val (ns, usl, tbl) = (parts.dropRight(2), parts(parts.size - 2), parts.last)
    val model = GraftEnv.model(spark)
    val uslSpec = model.loadUsl(ns, usl).getOrElse(
      throw new NoSuchElementException(s"USL ${(ns :+ usl).mkString(".")} not found"))
    val tableSpec = uslSpec.tables.find(_.name.equalsIgnoreCase(tbl)).getOrElse(
      throw new NoSuchElementException(s"table $tbl not in USL $usl"))
    // self-reference guard: an activation query reading its own table would
    // recurse forever at scan time (SURVEY.md §7.4 risk 3)
    val selfFqn = (parts.mkString(".") :: (GraftEnv.catalogName(spark) +: parts).mkString(".") :: Nil)
    require(!selfFqn.exists(f => query.toLowerCase.contains(f.toLowerCase)),
      s"activation query for $tbl references the table itself")
    // analyze against live catalogs (schema access triggers analysis only)
    val queried = spark.sql(query).schema
    val declared = tableSpec.schema
    require(queried.size == declared.size,
      s"activation query has ${queried.size} columns, table $tbl declares ${declared.size}")
    declared.fields.zip(queried.fields).foreach { case (d, q) =>
      require(dataTypeQueryable(d.dataType, q.dataType),
        s"column ${d.name}: declared ${d.dataType.sql} cannot be served by queried ${q.dataType.sql}")
    }
    model.saveActivation(ns, usl, ActivationSpec(tbl, query))
    Seq(Row(s"${parts.mkString(".")} activated"))
  }
}

/** LOAD / UPDATE / REMOVE USL (reference: LoadUSL.scala:33-87). */
case class LoadUslCommand(name: String, namespace: Seq[String]) extends GraftCommandBase {
  override val output: Seq[Attribute] = Seq(attr("json"))
  override def run(spark: SparkSession): Seq[Row] = {
    val ns = GraftEnv.stripCatalog(spark, namespace)
    val usl = GraftEnv.model(spark).loadUsl(ns, name).getOrElse(
      throw new NoSuchElementException(s"USL $name not found in ${ns.mkString(".")}"))
    Seq(Row(write(usl)))
  }
}

case class UpdateUslCommand(name: String, namespace: Seq[String], json: String)
    extends GraftCommandBase {
  override val output: Seq[Attribute] = Seq(attr("updated"))
  override def run(spark: SparkSession): Seq[Row] = {
    val ns = GraftEnv.stripCatalog(spark, namespace)
    val spec = read[UslSpec](json)
    GraftEnv.model(spark).saveUsl(spec.copy(name = name, namespace = ns))
    Seq(Row(s"${(ns :+ name).mkString(".")} updated"))
  }
}

case class RemoveUslCommand(name: String, namespace: Seq[String]) extends GraftCommandBase {
  override val output: Seq[Attribute] = Seq(attr("removed"))
  override def run(spark: SparkSession): Seq[Row] = {
    val ns = GraftEnv.stripCatalog(spark, namespace)
    val ok = GraftEnv.model(spark).removeUsl(ns, name)
    if (!ok) throw new NoSuchElementException(s"USL $name not found in ${ns.mkString(".")}")
    Seq(Row(s"${(ns :+ name).mkString(".")} removed"))
  }
}
