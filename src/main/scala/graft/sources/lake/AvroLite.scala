package graft.sources.lake

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.unstructured.SerializableHadoopConf

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Dependency-free Avro container-file source built on the `avro` core jar
  * Spark itself ships (avro-1.12.1 is on every Spark classpath for shuffle
  * serialization) — no `spark-avro` module required. Replaces the
  * round-2..5 reflective-only adapter for offline deployments
  * (reference: catalog/FileCatalogUnit.scala:75-81 routes AVRO to Spark's
  * optional module; this is the same surface without the optional jar).
  *
  * Scale design: files are split on Avro sync markers into
  * `spark.sql.files.maxPartitionBytes`-sized ranges, one task per range —
  * the same block-level parallelism `spark-avro` / avro-mapred derive from
  * the container format, so a single 100 GB avro file still fans out across
  * the cluster. Decoding is executor-side; the driver only reads one file
  * header for the schema.
  *
  * Type matrix (same mapping `spark-avro` documents): null/boolean/int/long/
  * float/double/bytes/string, enum→string, fixed→binary, record→struct,
  * array→array, map(string-keyed)→map, union[null,T]→nullable T, and the
  * logical types date, timestamp-millis/micros, local-timestamp-millis/
  * micros→timestamp_ntz, decimal(bytes|fixed). Complex (multi-branch
  * non-null) unions are rejected with a clear error.
  */
object AvroLite {

  // ---- schema conversion: avro -> spark ----

  def toStruct(schema: Schema): StructType = toSparkType(schema) match {
    case s: StructType => s
    case other => StructType(Seq(StructField("value", other)))
  }

  def toSparkType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.NULL => NullType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (schema.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Schema.Type.LONG => schema.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros => TimestampType
      case _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
        TimestampNTZType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BYTES | Schema.Type.FIXED => schema.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.RECORD =>
      StructType(schema.getFields.asScala.map { f =>
        StructField(f.name, toSparkType(f.schema()), nullable = isNullable(f.schema()))
      }.toSeq)
    case Schema.Type.ARRAY =>
      ArrayType(toSparkType(schema.getElementType), containsNull = isNullable(schema.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, toSparkType(schema.getValueType), valueContainsNull = isNullable(schema.getValueType))
    case Schema.Type.UNION => nonNullBranch(schema) match {
      case Some(b) => toSparkType(b)
      case None => throw new UnsupportedOperationException(
        s"complex avro union not supported: $schema (only [null, T] unions map to Spark)")
    }
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.NULL ||
      (s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL))

  /** The single non-null branch of a [null,T] (or [T]) union, None if >1. */
  private def nonNullBranch(s: Schema): Option[Schema] = {
    val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    if (branches.size == 1) Some(branches.head) else None
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) nonNullBranch(s).getOrElse(
      throw new UnsupportedOperationException(s"complex avro union not supported: $s"))
    else s

  // ---- schema conversion: spark -> avro (fixture/manifest writing) ----

  def toAvro(dt: DataType, name: String, nullable: Boolean): Schema = {
    val base = dt match {
      case NullType => Schema.create(Schema.Type.NULL)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
      case s: StructType => record(s"${name}_rec", s)
      case ArrayType(et, cn) => Schema.createArray(toAvro(et, s"${name}_item", cn))
      case MapType(StringType, vt, vn) => Schema.createMap(toAvro(vt, s"${name}_val", vn))
      case other => throw new UnsupportedOperationException(s"no avro mapping for $other")
    }
    if (nullable && base.getType != Schema.Type.NULL)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  def record(name: String, st: StructType): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, toAvro(f.dataType, f.name, f.nullable),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  // ---- value conversion: avro generic -> external Row values ----

  def toRowValue(v: Any, schema: Schema): Any = {
    if (v == null) return null
    val s = unwrap(schema)
    s.getType match {
      case Schema.Type.STRING => v.toString
      case Schema.Type.ENUM => v.toString
      case Schema.Type.INT =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.Date])
          java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
        else v
      case Schema.Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis =>
          java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(v.asInstanceOf[Long]))
        case _: LogicalTypes.TimestampMicros => microsToTimestamp(v.asInstanceOf[Long])
        case _: LogicalTypes.LocalTimestampMillis =>
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(v.asInstanceOf[Long], 1000L),
            (Math.floorMod(v.asInstanceOf[Long], 1000L) * 1000000L).toInt,
            java.time.ZoneOffset.UTC)
        case _: LogicalTypes.LocalTimestampMicros =>
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(v.asInstanceOf[Long], 1000000L),
            (Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        case _ => v
      }
      case Schema.Type.BYTES => s.getLogicalType match {
        case d: LogicalTypes.Decimal => bytesToDecimal(byteBufferBytes(v), d)
        case _ => byteBufferBytes(v)
      }
      case Schema.Type.FIXED => s.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          bytesToDecimal(v.asInstanceOf[GenericFixed].bytes().clone(), d)
        case _ => v.asInstanceOf[GenericFixed].bytes().clone()
      }
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.map(f => toRowValue(rec.get(f.pos()), f.schema())).toSeq)
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[AnyRef]].asScala
          .map(toRowValue(_, s.getElementType)).toSeq
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
          .map { case (k, mv) => k.toString -> toRowValue(mv, s.getValueType) }.toMap
      case _ => v
    }
  }

  private def microsToTimestamp(micros: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    ts
  }

  private def byteBufferBytes(v: Any): Array[Byte] = v match {
    case bb: ByteBuffer =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case a: Array[Byte] => a
  }

  private def bytesToDecimal(bytes: Array[Byte], d: LogicalTypes.Decimal): java.math.BigDecimal =
    new java.math.BigDecimal(new java.math.BigInteger(bytes), d.getScale)

  // ---- value conversion: external Row values -> avro generic ----

  def toAvroValue(v: Any, schema: Schema): Any = {
    if (v == null) return null
    val s = unwrap(schema)
    s.getType match {
      case Schema.Type.STRING => v.toString
      case Schema.Type.INT =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) v match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
          case d: java.time.LocalDate => d.toEpochDay.toInt
          case i: Int => i
        } else v
      case Schema.Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros => v match {
          case t: java.sql.Timestamp =>
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000L
          case l: Long => l
        }
        case _: LogicalTypes.LocalTimestampMicros => v match {
          case t: java.time.LocalDateTime =>
            t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
          case l: Long => l
        }
        case _ => v
      }
      case Schema.Type.BYTES => s.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.getScale)
          ByteBuffer.wrap(bd.unscaledValue().toByteArray)
        case _ => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      }
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        s.getFields.asScala.foreach(f => rec.put(f.pos(), toAvroValue(row.get(f.pos()), f.schema())))
        rec
      case Schema.Type.ARRAY =>
        v.asInstanceOf[scala.collection.Seq[Any]].map(toAvroValue(_, s.getElementType)).asJava
      case Schema.Type.MAP =>
        v.asInstanceOf[scala.collection.Map[String, Any]].map { case (k, mv) =>
          k -> toAvroValue(mv, s.getValueType)
        }.toMap.asJava
      case _ => v
    }
  }

  // ---- reading ----

  /** Schema from one container header (driver-side, header bytes only). */
  def readAvroSchema(conf: Configuration, file: Path): Schema = {
    val in = new FsInput(file, conf)
    try {
      val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    } finally in.close()
  }

  /** All `.avro` files under path (file or directory, non-recursive dirs). */
  def listAvroFiles(conf: Configuration, path: Path): Seq[(Path, Long)] = {
    val fs = path.getFileSystem(conf)
    val st = fs.getFileStatus(path)
    if (st.isFile) Seq(path -> st.getLen)
    else fs.listStatus(path).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .filter(_.getPath.getName.endsWith(".avro"))
      .map(s => s.getPath -> s.getLen)
      .sortBy(_._1.toString)
  }

  /** Distributed read: sync-marker-aligned splits, one task per range.
    * The loop condition mirrors avro-mapred's AvroRecordReader contract:
    * `sync(start)` positions at the first block after `start`, and a reader
    * owns every block that *starts* before `end` (`!pastSync(end)`), so
    * adjacent ranges partition blocks exactly once.
    */
  def read(spark: SparkSession, paths: Seq[Path], schemaHint: Option[StructType] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = paths.flatMap(listAvroFiles(conf, _))
    require(files.nonEmpty, s"no .avro files under ${paths.mkString(",")}")
    val avroSchema = readAvroSchema(conf, files.head._1)
    val struct = schemaHint.getOrElse(toStruct(avroSchema))
    val maxSplit = math.max(1L << 14, spark.conf
      .getOption("spark.sql.files.maxPartitionBytes").map(parseBytes).getOrElse(128L << 20))
    val splits = files.flatMap { case (p, len) =>
      (0L until math.max(len, 1L) by maxSplit).map(off => (p.toString, off, math.min(maxSplit, len - off)))
    }
    val schemaJson = avroSchema.toString
    // non-record top level (e.g. "string", array): toStruct declared a
    // single `value` column, so each decoded datum must be wrapped in a Row
    // to match — decided once on the driver from the same conversion
    val wrapTopLevel = !toSparkType(avroSchema).isInstanceOf[StructType]
    val serConf = new SerializableHadoopConf(conf)
    val rdd = spark.sparkContext.parallelize(splits, splits.size).flatMap {
      case (pathStr, start, len) =>
        val readerSchema = new Schema.Parser().parse(schemaJson)
        val in = new FsInput(new Path(pathStr), serConf.value)
        val reader = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord](readerSchema))
        // readers for non-record schemas yield plain values, not GenericRecord;
        // the GenericDatumReader type parameter is erased so this is safe
        reader.sync(start)
        val end = start + len
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => reader.close()))
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val more = reader.hasNext && !reader.pastSync(end)
            if (!more) reader.close()
            more
          }
          override def next(): Row = {
            val v = toRowValue(reader.next(), readerSchema)
            if (wrapTopLevel) Row(v) else v.asInstanceOf[Row]
          }
        }
    }
    spark.createDataFrame(rdd, struct)
  }

  private[sources] def parseBytes(s: String): Long = {
    val t = s.trim.toLowerCase
    // same suffix set Spark's JavaUtils.byteStringAsBytes accepts (k/m/g/t/p,
    // with optional trailing 'b') — '1t' is a legal maxPartitionBytes value
    val (num, mult) =
      if (t.endsWith("p") || t.endsWith("pb")) (t.replaceAll("p.?$", ""), 1L << 50)
      else if (t.endsWith("t") || t.endsWith("tb")) (t.replaceAll("t.?$", ""), 1L << 40)
      else if (t.endsWith("g") || t.endsWith("gb")) (t.replaceAll("g.?$", ""), 1L << 30)
      else if (t.endsWith("m") || t.endsWith("mb")) (t.replaceAll("m.?$", ""), 1L << 20)
      else if (t.endsWith("k") || t.endsWith("kb")) (t.replaceAll("k.?$", ""), 1L << 10)
      else if (t.endsWith("b")) (t.dropRight(1), 1L)
      else (t, 1L)
    (num.toDouble * mult).toLong
  }

  // ---- writing (driver-side: gate fixtures + Iceberg manifests) ----

  /** Write rows as one Avro container file. Local-path writer: fixtures and
    * Iceberg/Delta metadata are driver-written; bulk data IO stays parquet.
    */
  def writeFile(file: java.io.File, schema: Schema, records: Iterator[GenericRecord],
      codec: String = "deflate", syncInterval: Int = 64 * 1024,
      meta: Map[String, Array[Byte]] = Map.empty): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(if (codec == "null") CodecFactory.nullCodec() else CodecFactory.fromString(codec))
    w.setSyncInterval(syncInterval)
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, file)
    try records.foreach(w.append) finally w.close()
  }

  /** DataFrame -> one local avro file (collects: fixture-sized data only). */
  def writeDataFrame(df: DataFrame, file: java.io.File, codec: String = "deflate",
      syncInterval: Int = 64 * 1024): Schema = {
    val schema = record(file.getName.stripSuffix(".avro").replaceAll("[^A-Za-z0-9_]", "_"), df.schema)
    val rows = df.collect().iterator.map(r => toAvroValue(r, schema).asInstanceOf[GenericRecord])
    writeFile(file, schema, rows, codec, syncInterval)
    schema
  }
}
