package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BasePredicate, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructType}

/** private[sql] access for the lakehouse-lite readers (Delta/Iceberg log and
  * manifest metadata resolved by graft, data IO executed by Spark's own
  * parquet machinery). Same bridge technique as [[GraftSQLBridge]]
  * (reference: spark/spark-common/.../SparkSQLBridge.scala:34-74).
  *
  * The point of routing through [[HadoopFsRelation]] instead of a bespoke
  * scan: Spark's native parquet path brings vectorized reading, predicate
  * pushdown, column pruning, file-splitting, and — through the
  * [[FileIndex.listFiles]] contract — metadata-level partition pruning, so
  * a log/manifest-backed table plans exactly like a parquet table at 100 TB.
  */
object GraftLakeBridge {

  /** One live data file of a lake table: path + size + its partition values
    * as *external* Row values aligned with the partition schema.
    */
  final case class LakeFile(path: String, size: Long, modificationTime: Long,
      partitionValues: Seq[Any])

  /** A driver-held FileIndex over an explicit file list (what Delta's log or
    * Iceberg's manifests resolve to). Partition pruning happens here:
    * `listFiles` evaluates the pushed partition predicates against each
    * file's partition values, so pruned files never reach the scan —
    * byte-for-byte the contract InMemoryFileIndex implements for hive-style
    * layouts, but driven by table metadata instead of directory names.
    */
  final class LakeFileIndex(
      root: Path,
      files: Seq[LakeFile],
      override val partitionSchema: StructType) extends FileIndex {

    private val converters = partitionSchema.fields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))

    private val groups: Seq[(InternalRow, Array[FileStatus])] =
      files.groupBy(_.partitionValues).toSeq.map { case (vals, fs) =>
        val internal = InternalRow.fromSeq(
          vals.zip(converters).map { case (v, c) => c(v) })
        internal -> fs.map(f =>
          new FileStatus(f.size, false, 1, 128L << 20, f.modificationTime, new Path(f.path))).toArray
      }

    override def rootPaths: Seq[Path] = Seq(root)

    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val selected =
        if (partitionFilters.isEmpty || partitionSchema.isEmpty) groups
        else {
          val predicate: BasePredicate = Predicate.createInterpreted(
            partitionFilters.reduce(And).transform {
              case a: AttributeReference =>
                val idx = partitionSchema.fieldIndex(a.name)
                BoundReference(idx, partitionSchema(idx).dataType, nullable = true)
            })
          groups.filter { case (values, _) => predicate.eval(values) }
        }
      selected.map { case (values, statuses) => PartitionDirectory(values, statuses) }
    }

    override def inputFiles: Array[String] = files.map(_.path).toArray
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = files.map(_.size).sum
  }

  /** Splice a (fileIndex, partitionSchema, dataSchema) triple into a
    * DataFrame through Spark's parquet FileFormat.
    */
  def parquetRelation(spark: SparkSession, index: FileIndex,
      partitionSchema: StructType, dataSchema: StructType,
      options: Map[String, String] = Map.empty): DataFrame = {
    val session = GraftSQLBridge.classicSession(spark)
    val relation = HadoopFsRelation(index, partitionSchema, dataSchema,
      bucketSpec = None, new ParquetFileFormat, options)(session)
    GraftSQLBridge.ofRows(spark, LogicalRelation(relation))
  }

  /** External -> catalyst conversion for one value (tests + partition rows). */
  def toCatalyst(v: Any, dt: DataType): Any =
    CatalystTypeConverters.createToCatalystConverter(dt)(v)

  /** Hadoop conf wrapped for executor-side file access (deletion-vector
    * decode tasks); `SerializableConfiguration` is private[spark], hence
    * exposed through this bridge like the rest of the file.
    */
  def serializableConf(spark: SparkSession): org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(spark.sparkContext.hadoopConfiguration)

  /** Re-issue a batch DataFrame as a streaming one — the V1
    * `Source.getBatch` contract (MicroBatchExecution asserts
    * `isStreaming`); `internalCreateDataFrame` is private[sql], hence here.
    * The underlying RDD stays lazy: the plan executes when the micro-batch
    * runs, not when the source returns it.
    */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse for V1 `Sink.addBatch`: the engine hands the sink a
    * micro-batch frame still FLAGGED streaming; re-issue its planned RDD as
    * a plain batch frame so batch writers accept it (the technique V1 file
    * sinks use).
    */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
