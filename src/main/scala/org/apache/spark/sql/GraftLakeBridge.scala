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
      partitionValues: Seq[Any], stats: Option[FileStats] = None)

  /** Per-file column statistics for data skipping (Delta `add.stats`):
    * external-typed min/max keyed by the PHYSICAL column name (the name
    * the scan's data filters carry), null counts, and the record count.
    * Absent entries mean "unknown" — skipping is always conservative.
    */
  final case class FileStats(numRecords: Option[Long],
      min: Map[String, Any], max: Map[String, Any], nullCount: Map[String, Long],
      /** per-column equality test beyond the range bounds — `false` =
        * a row with this EXTERNAL-typed literal value provably cannot be
        * in the file (Iceberg bucket-transform pruning rides here: the
        * literal's bucket differs from the file's). Driver-side only.
        */
      keepEq: Map[String, Any => Boolean] = Map.empty)

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
      override val partitionSchema: StructType,
      dataSchema: StructType = new StructType()) extends FileIndex {

    private val converters = partitionSchema.fields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))

    private val perFile: Seq[(Seq[Any], LakeFile)] = files.map(f => f.partitionValues -> f)

    private def internalOf(vals: Seq[Any]): InternalRow =
      InternalRow.fromSeq(vals.zip(converters).map { case (v, c) => c(v) })

    override def rootPaths: Seq[Path] = Seq(root)

    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val partKept =
        if (partitionFilters.isEmpty || partitionSchema.isEmpty) perFile
        else {
          val predicate: BasePredicate = Predicate.createInterpreted(
            partitionFilters.reduce(And).transform {
              case a: AttributeReference =>
                val idx = partitionSchema.fieldIndex(a.name)
                BoundReference(idx, partitionSchema(idx).dataType, nullable = true)
            })
          perFile.filter { case (values, _) => predicate.eval(internalOf(values)) }
        }
      // file-level DATA SKIPPING from per-file min/max stats (Delta
      // add.stats): a file provably empty under the pushed data filters
      // never produces a task — nor even a footer read
      val kept =
        if (dataFilters.isEmpty || dataSchema.isEmpty) partKept
        else partKept.filter { case (_, f) =>
          StatsSkipping.mayMatch(dataFilters, f.stats, dataSchema)
        }
      kept.groupBy(_._1).toSeq.map { case (vals, fs) =>
        PartitionDirectory(internalOf(vals), fs.map { case (_, f) =>
          new FileStatus(f.size, false, 1, 128L << 20, f.modificationTime, new Path(f.path))
        }.toArray)
      }
    }

    override def inputFiles: Array[String] = files.map(_.path).toArray
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = files.map(_.size).sum
  }

  /** Conservative per-file predicate pruning over column min/max stats:
    * keep unless a conjunct is PROVABLY false for every row of the file.
    * Handles comparisons and IN on top-level attributes of orderable
    * primitive types, and null checks via null counts; anything else keeps
    * the file. Nulls never satisfy a comparison, so an absent min/max with
    * a known all-null column still skips.
    */
  object StatsSkipping {
    import org.apache.spark.sql.catalyst.expressions._

    def mayMatch(filters: Seq[Expression], stats: Option[FileStats],
        dataSchema: StructType): Boolean = stats match {
      case None => true
      case Some(st) => filters.forall(f => conjunctMayMatch(f, st, dataSchema))
    }

    /** Floating-point skipping hazards: the interpreted ordering says
      * -0.0 < 0.0 and NaN is largest, but SQL `=` evaluates -0.0 = 0.0 as
      * TRUE — a file whose max stat is -0.0 must not be pruned for
      * `col = 0.0`. Normalize -0.0 to 0.0 on bounds AND literals (the same
      * normalization Delta's stats writer applies), and treat a NaN bound
      * as unbounded (externally-written stats may carry it; its ordering
      * vs real values is not a containment proof).
      */
    private def fpNormalize(v: Any): Any = v match {
      case d: Double if d == 0.0d => 0.0d
      case f: Float if f == 0.0f => 0.0f
      case v => v
    }
    private def isNaN(v: Any): Boolean = v match {
      case d: Double => d.isNaN
      case f: Float => f.isNaN
      case _ => false
    }

    private def bound(st: FileStats, schema: StructType, name: String):
        Option[(Any, Any, Ordering[Any])] =
      for {
        field <- schema.fields.find(_.name == name)
        ord <- orderingOf(field.dataType)
        mn <- st.min.get(name)
        mx <- st.max.get(name)
        cmn = fpNormalize(toCatalyst(mn, field.dataType))
        cmx = fpNormalize(toCatalyst(mx, field.dataType))
        if !isNaN(cmn) && !isNaN(cmx)
      } yield (cmn, cmx, ord)

    private def orderingOf(dt: DataType): Option[Ordering[Any]] = dt match {
      case _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType |
           _: org.apache.spark.sql.types.ShortType | _: org.apache.spark.sql.types.ByteType |
           _: org.apache.spark.sql.types.FloatType | _: org.apache.spark.sql.types.DoubleType |
           _: org.apache.spark.sql.types.StringType | _: org.apache.spark.sql.types.BooleanType |
           _: org.apache.spark.sql.types.DateType | _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType =>
        scala.util.Try(org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(dt).asInstanceOf[Ordering[Any]]).toOption
      case _ => None
    }

    private def allNull(st: FileStats, name: String): Boolean =
      (st.numRecords, st.nullCount.get(name)) match {
        case (Some(n), Some(nc)) => n > 0 && nc == n
        case _ => false
      }

    private def conjunctMayMatch(e: Expression, st: FileStats,
        schema: StructType): Boolean = e match {
      case And(l, r) => conjunctMayMatch(l, st, schema) && conjunctMayMatch(r, st, schema)
      case Or(l, r) => conjunctMayMatch(l, st, schema) || conjunctMayMatch(r, st, schema)
      case EqualTo(a: AttributeReference, Literal(v, _)) => cmpKeep(st, schema, a.name, v, "eq")
      case EqualTo(Literal(v, _), a: AttributeReference) => cmpKeep(st, schema, a.name, v, "eq")
      case GreaterThan(a: AttributeReference, Literal(v, _)) => cmpKeep(st, schema, a.name, v, "gt")
      case GreaterThan(Literal(v, _), a: AttributeReference) => cmpKeep(st, schema, a.name, v, "lt")
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpKeep(st, schema, a.name, v, "ge")
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => cmpKeep(st, schema, a.name, v, "le")
      case LessThan(a: AttributeReference, Literal(v, _)) => cmpKeep(st, schema, a.name, v, "lt")
      case LessThan(Literal(v, _), a: AttributeReference) => cmpKeep(st, schema, a.name, v, "gt")
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpKeep(st, schema, a.name, v, "le")
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) => cmpKeep(st, schema, a.name, v, "ge")
      case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
        list.exists { case Literal(v, _) => cmpKeep(st, schema, a.name, v, "eq") }
      case IsNull(a: AttributeReference) =>
        st.nullCount.get(a.name).forall(_ > 0)
      case IsNotNull(a: AttributeReference) => !allNull(st, a.name)
      case _ => true
    }

    /** Can any value in [min, max] satisfy `<attr> <op> lit`? A comparison
      * against null is never true, so an all-null column always skips.
      */
    private def cmpKeep(st: FileStats, schema: StructType, name: String,
        lit0: Any, op: String): Boolean = {
      if (lit0 == null) return false
      if (allNull(st, name)) return false
      // a NaN literal's position in the interpreted ordering (largest) does
      // not prove absence from any bounds — keep the file
      if (isNaN(lit0)) return true
      val lit = fpNormalize(lit0)
      // equality-only pruning beyond ranges (bucket transforms)
      if (op == "eq" && !st.keepEq.get(name).forall(_(lit))) return false
      bound(st, schema, name) match {
        case None => true
        case Some((mn, mx, ord)) => op match {
          case "eq" => ord.lteq(mn, lit) && ord.gteq(mx, lit)
          case "gt" => ord.gt(mx, lit)
          case "ge" => ord.gteq(mx, lit)
          case "lt" => ord.lt(mn, lit)
          case "le" => ord.lteq(mn, lit)
        }
      }
    }
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
