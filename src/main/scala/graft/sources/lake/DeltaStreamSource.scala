package graft.sources.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftLakeBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("graft-delta")` — a genuine Structured
  * Streaming source over the native Delta log replay, no runtime jar:
  * offsets are Delta versions, each micro-batch is the commits since the
  * last one, and the checkpointed offset log gives exactly-once through
  * the engine itself.
  *
  * Modes (mirroring the delta-spark source's public options):
  *  - default: APPEND rows — added files per commit; pure-delete commits
  *    need `ignoreDeletes`, rewrite commits need `ignoreChanges` (which
  *    re-emits rewritten files, delta's documented semantics);
  *  - `readChangeFeed 'true'`: the CDF rows ([[DeltaLite.changes]]) with
  *    `_change_type` / `_commit_version` / `_commit_timestamp`.
  *
  * `startingVersion`: first version to serve (default 0 = the full
  * history; the initial micro-batch therefore replays the table from
  * creation, which for an append-only table IS its current content).
  *
  * Scale shape: `getOffset` is one driver log listing; a batch scans only
  * the files its commits added (or their change files) through the same
  * pruned parquet machinery as the batch reader — a 100 TB table streams
  * at the cost of its new data.
  */
class DeltaStreamSource(spark: SparkSession, dir: Path,
    options: Map[String, String]) extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val cdf = options.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))
  private val startingVersion = options.get("startingVersion").map(_.toLong).getOrElse(0L)
  private val ignoreChanges = options.get("ignoreChanges").exists(_.equalsIgnoreCase("true"))
  private val ignoreDeletes = options.get("ignoreDeletes").exists(_.equalsIgnoreCase("true"))
  // backpressure: cap how many commits one micro-batch may cover (the
  // maxFilesPerTrigger analogue at version granularity)
  private val maxVersionsPerTrigger = options.get("maxVersionsPerTrigger").map(_.toLong)
  maxVersionsPerTrigger.foreach(m => require(m >= 1, "maxVersionsPerTrigger must be >= 1"))

  /** Last version already committed to the engine (advanced by getBatch;
    * backs the LEGACY getOffset path — admission-control engines call
    * [[latestOffset]] with the start offset instead).
    */
  private var lastBatchEnd: Option[Long] = None

  /** Trigger.AvailableNow pins the catch-up target here; pacing then
    * advances batch by batch until it is reached.
    */
  private var availableNowTarget: Option[Long] = None

  override val schema: StructType = DeltaStreamSource.schemaFor(spark, dir, cdf)

  /** next unserved version -> the end of the batch to serve, None = caught up */
  private def cappedLatest(next: Long): Option[Long] = {
    val live = DeltaLite.latestVersion(spark, dir)
    val latest = availableNowTarget.fold(live)(math.min(live, _))
    if (latest < next) None
    else Some(maxVersionsPerTrigger.fold(latest)(m => math.min(latest, next + m - 1)))
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(DeltaLite.latestVersion(spark, dir))

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset = {
    val next = Option(start).map(versionOf(_) + 1).getOrElse(startingVersion)
    cappedLatest(next).map(LongOffset(_)).orNull
  }

  override def getOffset: Option[Offset] =
    cappedLatest(lastBatchEnd.map(_ + 1).getOrElse(startingVersion))
      .orElse(lastBatchEnd) // report the high-water mark even when caught up
      .map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf(_) + 1).getOrElse(startingVersion)
    val to = versionOf(end)
    lastBatchEnd = Some(to)
    val batch =
      if (from > to)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else if (cdf) DeltaLite.changes(spark, dir, from, Some(to))
      else DeltaLite.appendBatch(spark, dir, from, to, ignoreChanges, ignoreDeletes)
    GraftLakeBridge.asStreamingBatch(batch)
  }

  private def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
    o match {
      case l: LongOffset => l.offset
      case other => other.json.trim.toLong // offset restored from the checkpoint log
    }

  override def stop(): Unit = ()
}

object DeltaStreamSource {
  private[lake] def schemaFor(spark: SparkSession, dir: Path, cdf: Boolean): StructType = {
    val base = DeltaLite.snapshot(spark, dir).schema
    if (!cdf) base
    else StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField(DeltaLite.CdfTypeCol,
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField(DeltaLite.CdfVersionCol,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(DeltaLite.CdfTimestampCol,
        org.apache.spark.sql.types.TimestampType, nullable = false)))
  }
}

/** `writeStream.format("graft-delta")` — EXACTLY-ONCE appends to a native
  * Delta table through the protocol's SetTransaction marker: every batch
  * commit carries `txn(appId, batchId)`, and a replayed batch (sink
  * restarted before the engine recorded completion) sees its own version
  * already committed and skips — the delta-spark sink's own mechanism.
  * `txnAppId` names the writer (set it when several streams append to one
  * table); Complete output mode maps to INSERT OVERWRITE per batch.
  */
class DeltaStreamSink(spark: SparkSession, dir: Path,
    options: Map[String, String],
    outputMode: org.apache.spark.sql.streaming.OutputMode)
  extends org.apache.spark.sql.execution.streaming.Sink {

  private val appId = options.getOrElse("txnAppId", "graft-delta-sink")
  private val overwrite =
    outputMode == org.apache.spark.sql.streaming.OutputMode.Complete()

  override def name(): String = s"graft-delta-sink[$dir]"

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    if (DeltaLite.lastTxnVersion(spark, dir, appId).exists(_ >= batchId)) return
    // the incoming frame is still flagged streaming; re-issue its planned
    // RDD as a plain batch frame so the batch writer accepts it
    val batchDf = GraftLakeBridge.asBatchFrame(data.toDF())
    LakeNativeWrite.deltaInsert(spark, dir, batchDf, overwrite,
      txn = Some((appId, batchId)))
  }
}

/** The `graft-delta` format registration (DataSourceRegister via
  * META-INF/services, like any Spark data source): streaming SOURCE and
  * SINK under one short name.
  */
class DeltaStreamingProvider extends StreamSourceProvider
  with org.apache.spark.sql.sources.StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def dirOf(parameters: Map[String, String]): Path =
    new Path(parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-delta needs a path option")))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val cdf = parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))
    (shortName(), schema.getOrElse(
      DeltaStreamSource.schemaFor(sqlContext.sparkSession, dirOf(parameters), cdf)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaStreamSource(sqlContext.sparkSession, dirOf(parameters), parameters)

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode):
      org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft-delta sink partitioning comes from the table's own metadata; " +
        "drop partitionBy (CREATE the table partitioned instead)")
    new DeltaStreamSink(sqlContext.sparkSession, dirOf(parameters), parameters, outputMode)
  }
}
