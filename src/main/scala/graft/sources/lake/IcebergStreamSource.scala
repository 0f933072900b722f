package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftLakeBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("graft-iceberg")` — Structured Streaming over
  * the native Iceberg reader: offsets are SEQUENCE NUMBERS along the
  * current snapshot lineage (strictly increasing for v2 tables — a v1
  * table without sequence numbers is rejected), each micro-batch covers
  * the lineage snapshots whose sequence falls inside the offset range.
  *
  * Semantics per snapshot (the iceberg-spark source's public posture):
  * `append` streams its inserted rows; `replace` (compaction) is silent;
  * `delete` needs `skipDeleteSnapshots 'true'` and is then skipped;
  * `overwrite` needs `skipOverwriteSnapshots 'true'` and is then skipped —
  * never silently guessed at. `readChangelog 'true'` streams the full
  * [[IcebergLite.changes]] rows (insert AND delete, with the changelog
  * metadata columns) instead.
  *
  * `startSnapshot`: lineage snapshot id to start AFTER (exclusive), the
  * `start-snapshot-id` convention; default = from table creation.
  */
class IcebergStreamSource(spark: SparkSession, dir: Path,
    options: Map[String, String]) extends Source {

  private val changelog = options.get("readChangelog").exists(_.equalsIgnoreCase("true"))
  private val skipDeletes = options.get("skipDeleteSnapshots").exists(_.equalsIgnoreCase("true"))
  private val skipOverwrites = options.get("skipOverwriteSnapshots").exists(_.equalsIgnoreCase("true"))
  private val startSnapshot = options.get("startSnapshot").map(_.toLong)

  override val schema: StructType = IcebergStreamSource.schemaFor(spark, dir, changelog)

  /** lineage with the exclusive start applied, oldest first */
  private def lineage(): Seq[(Long, Long, String, Option[Long])] = {
    val full = IcebergLite.snapshotLineage(spark, dir)
    full.sliding(2).foreach {
      case Seq((s1, id1, _, _), (s2, id2, _, _)) =>
        require(s1 < s2, s"snapshots $id1 -> $id2 have non-increasing sequence " +
          s"numbers ($s1 -> $s2); streaming needs a v2 table with real sequence numbers")
      case _ =>
    }
    startSnapshot match {
      case None => full
      case Some(sid) =>
        val ix = full.indexWhere(_._2 == sid)
        require(ix >= 0, s"startSnapshot $sid is not on the current lineage of $dir")
        full.drop(ix + 1)
    }
  }

  override def getOffset: Option[Offset] =
    lineage().lastOption.map(t => LongOffset(t._1))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromSeq = start.map(seqOf).getOrElse(Long.MinValue)
    val toSeq = seqOf(end)
    val snaps = lineage().filter(t => t._1 > fromSeq && t._1 <= toSeq)
    val frames = snaps.flatMap { case (_, id, op, parent) =>
      if (changelog)
        Some(IcebergLite.changes(spark, dir, fromSnapshot = parent, toSnapshot = Some(id)))
      else op match {
        case "replace" => None
        case "delete" =>
          require(skipDeletes, s"snapshot $id deletes data from the streamed table; " +
            "set skipDeleteSnapshots to skip delete snapshots")
          None
        case "overwrite" =>
          require(skipOverwrites, s"snapshot $id overwrites data in the streamed table; " +
            "set skipOverwriteSnapshots to skip overwrite snapshots")
          None
        case _ => // append (or unlabeled: treat as append, error if it removes rows)
          val ch = IcebergLite.changes(spark, dir, fromSnapshot = parent, toSnapshot = Some(id))
          Some(ch.where(col(IcebergLite.ChangeTypeCol) === "insert")
            .drop(IcebergLite.ChangeTypeCol, IcebergLite.ChangeOrdinalCol,
              IcebergLite.ChangeSnapshotCol))
      }
    }
    val batch =
      if (frames.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else frames.reduce(_.unionByName(_))
    GraftLakeBridge.asStreamingBatch(batch)
  }

  private def seqOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def stop(): Unit = ()
}

object IcebergStreamSource {
  private[lake] def schemaFor(spark: SparkSession, dir: Path, changelog: Boolean): StructType = {
    val base = IcebergLite.snapshot(spark, dir).schema
    if (!changelog) base
    else StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField(IcebergLite.ChangeTypeCol,
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField(IcebergLite.ChangeOrdinalCol,
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField(IcebergLite.ChangeSnapshotCol,
        org.apache.spark.sql.types.LongType, nullable = false)))
  }
}

/** `writeStream.format("graft-iceberg")` — exactly-once appends to a
  * native Iceberg table via snapshot-summary markers (`streaming-app-id`,
  * `streaming-batch-id`): a replayed batch finds its batch id already on
  * the lineage and skips — the Iceberg analogue of Delta's SetTransaction,
  * and the same mechanism the iceberg-spark streaming writer records in
  * its snapshot summaries.
  */
class IcebergStreamSink(spark: SparkSession, dir: Path,
    options: Map[String, String],
    outputMode: org.apache.spark.sql.streaming.OutputMode)
  extends org.apache.spark.sql.execution.streaming.Sink {

  private val appId = options.getOrElse("txnAppId", "graft-iceberg-sink")
  private val overwrite =
    outputMode == org.apache.spark.sql.streaming.OutputMode.Complete()
  // upsert mode: each batch masks its keys via an equality-delete file and
  // appends its rows at the same sequence number — streaming CDC into the
  // table without ever reading it
  private val upsertKeys = options.get("upsertKeys")
    .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).filter(_.nonEmpty)

  override def name(): String = s"graft-iceberg-sink[$dir]"

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    if (LakeNativeWrite.icebergLastStreamBatch(spark, dir, appId).exists(_ >= batchId)) return
    val batchDf = GraftLakeBridge.asBatchFrame(data.toDF())
    val marks = Map("streaming-app-id" -> appId, "streaming-batch-id" -> batchId.toString)
    upsertKeys match {
      case Some(keys) =>
        require(!overwrite, "upsertKeys and Complete output mode are mutually exclusive")
        LakeNativeWrite.icebergEqUpsert(spark, dir, batchDf, keys, extraSummary = marks)
      case None =>
        LakeNativeWrite.icebergInsert(spark, dir, batchDf, overwrite,
          streamTxn = Some((appId, batchId)))
    }
  }
}

class IcebergStreamingProvider extends StreamSourceProvider
  with org.apache.spark.sql.sources.StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  private def dirOf(parameters: Map[String, String]): Path =
    new Path(parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-iceberg needs a path option")))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val changelog = parameters.get("readChangelog").exists(_.equalsIgnoreCase("true"))
    (shortName(), schema.getOrElse(
      IcebergStreamSource.schemaFor(sqlContext.sparkSession, dirOf(parameters), changelog)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext.sparkSession, dirOf(parameters), parameters)

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode):
      org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft-iceberg sink partitioning comes from the table's own metadata; " +
        "drop partitionBy (CREATE the table partitioned instead)")
    new IcebergStreamSink(sqlContext.sparkSession, dirOf(parameters), parameters, outputMode)
  }
}
