package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.functions.col
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
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = declaredSchema
        override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = declaredSchema
            override def buildScan(): RDD[Row] = {
              val df = program(ctx.sparkSession)
              val casted =
                if (df.schema == declaredSchema) df
                else df.select(df.columns.zip(declaredSchema.fields).map {
                  case (c, f) => col(c).cast(f.dataType).as(f.name)
                }.toIndexedSeq: _*)
              casted.rdd
            }
          }.asInstanceOf[T]
      }
    }
}
