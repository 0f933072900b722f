package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics => V2Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.{Set => JSet}
import scala.jdk.CollectionConverters._

/** A DSv2 table whose read is an arbitrary DataFrame program, spliced into
  * the outer plan through the V1Scan bridge — the same technique the
  * reference uses for USL tables
  * (reference: datasources/v2/usl/USLTableScan.scala:32-54). The program runs
  * its own full parse/analyze/optimize lifecycle and contributes its RDD;
  * Catalyst optimizes the outer plan around it.
  *
  * Pushdown ACROSS the boundary: the scan builder accepts column pruning and
  * filter pushdown from the outer plan and re-applies both to the inner
  * DataFrame program, where Catalyst pushes them onward — into the
  * activation query of a USL table or the binaryFile scan of an unstructured
  * table. Unprojected expensive columns (thumbnails, content decodes) are
  * pruned before execution, mirroring the reference's lazy content IO
  * (reference: UnstructuredFilePartitionReaderFactory.scala:166-180).
  * Filters are *also* retained by Spark post-scan (pushFilters returns its
  * input), so a filter the program can't serve exactly stays correct — this
  * deliberately avoids the reference's unsupported-filter row-drop hazard
  * (SURVEY.md §4).
  *
  * Rows are cast column-by-column to the declared schema (by position), so a
  * program returning narrower-but-queryable types (int where long declared,
  * per the widening activation check) still produces valid rows.
  */
class DataFrameV1Table(
    tableName: String,
    declaredSchema: StructType,
    program: SparkSession => DataFrame) extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = declaredSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
      private var required: StructType = declaredSchema
      private var pushed: Array[sources.Filter] = Array.empty

      override def pruneColumns(requiredSchema: StructType): Unit =
        if (requiredSchema.nonEmpty) required = requiredSchema

      override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
        pushed = filters.filter(translate(_).isDefined)
        filters // Spark re-applies everything post-scan: safe, never drops rows
      }
      override def pushedFilters(): Array[sources.Filter] = pushed

      override def build(): Scan = new V1Scan with SupportsReportStatistics {
        private val readReq = required
        private val readFilters = pushed
        override def readSchema(): StructType = readReq

        /** Planning-time statistics from the wrapped program's OPTIMIZED
          * logical plan (no execution — for file-backed programs this is
          * the summed file size Catalyst already tracks), scaled by the
          * pruned-column fraction. Without this every graft table reports
          * Spark's pessimistic default size and a genuinely tiny dimension
          * (a USL view over a 5-row parquet, a lake-lite nation table) can
          * never win a broadcast in a federated join — at 100 TB that is
          * the difference between shipping 2 KB and shuffling the fact.
          */
        override def estimateStatistics(): V2Statistics = {
          val est: Option[(BigInt, Option[BigInt])] =
            try {
              val stats = program(SparkSession.active).queryExecution.optimizedPlan.stats
              val frac =
                if (declaredSchema.isEmpty) 1.0
                else math.max(readReq.size.toDouble / declaredSchema.size.toDouble, 0.1)
              Some((
                (BigDecimal(stats.sizeInBytes) * frac).toBigInt.max(BigInt(1)),
                stats.rowCount))
            } catch { case _: Exception => None } // unresolvable now: keep defaults
          new V2Statistics {
            override def sizeInBytes(): java.util.OptionalLong = est match {
              case Some((sz, _)) if sz.isValidLong => java.util.OptionalLong.of(sz.toLong)
              case _ => java.util.OptionalLong.empty()
            }
            override def numRows(): java.util.OptionalLong = est match {
              case Some((_, Some(n))) if n.isValidLong => java.util.OptionalLong.of(n.toLong)
              case _ => java.util.OptionalLong.empty()
            }
          }
        }
        override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = readReq
            override def buildScan(): RDD[Row] = {
              val df = program(ctx.sparkSession)
              val casted =
                if (df.schema == declaredSchema) df
                else df.select(df.columns.zip(declaredSchema.fields).map {
                  case (c, f) => col(c).cast(f.dataType).as(f.name)
                }.toIndexedSeq: _*)
              val filtered = readFilters.flatMap(translate)
                .foldLeft(casted)((d, c) => d.where(c))
              filtered.select(readReq.fieldNames.map(col).toIndexedSeq: _*).rdd
            }
          }.asInstanceOf[T]
      }
    }

  /** sources.Filter -> Column for the common predicates; None skips the
    * pushdown for that filter (Spark still evaluates it post-scan).
    */
  private def translate(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case sources.Or(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case sources.Not(c) => translate(c).map(!_)
    case _ => None
  }
}
