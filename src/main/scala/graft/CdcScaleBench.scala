package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Scaling evidence for CDC apply: a FIXED changelog batch applied to base
  * snapshots grown 1-25x. The claim under test is the apply shape's whole
  * point — the base participates only through a left-anti join against the
  * compacted (batch-sized) key set, so per-batch cost must track the
  * BATCH's shuffle plus one base SCAN, never a base shuffle: doubling the
  * snapshot adds IO, not exchange. The anti-check is a window-based apply
  * (row_number over the union) that DOES shuffle the base, timed at the
  * same scales — its growth curve is what the operator avoids.
  *
  * Base replicas shift the key space so batch keys hit only replica 0 —
  * the true touched set is scale-invariant and any cost growth is the
  * operator's own.
  *
  * Emits one JSON line per scale; paste the table into BASELINE.md.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.CdcScaleBench"
  */
object CdcScaleBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,5,10,25")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // base snapshot replicas keyed by event_id (unique; ~100k rows per
    // replica at sf0.1), shifted key space per replica so batch keys can
    // only hit replica 0
    val events = graft.queries.QueryPack.t(spark, sfDir, "events")
    val base0 = events.select(col("event_id").as("row_id"),
      col("event_type"), col("value"))
    def snapshot(k: Int): DataFrame =
      (0 until k).map(r => base0.withColumn("row_id", col("row_id") + lit(r * 1000000000L)))
        .reduce(_ unionByName _)

    // FIXED changelog batch: changes for 10% of replica-0 keys (deletes
    // where the event was an 'error'), so the touched key set never grows
    // with scale — base is 10x the batch at scale 1, 250x at scale 25
    val batch = events.where(col("event_id") % 10 === 0)
      .select(col("event_id").as("row_id"), col("event_type"), col("value"),
        col("ts"), col("event_id"))
      .withColumn("op", when(col("event_type") === "error", "D").otherwise("U"))
      .localCheckpoint(true)
    val batchRows = batch.count()

    // anti-check: the window formulation — union base (as seq -infinity
    // implicit inserts) with the changelog and row_number the whole thing,
    // shuffling base payload on every batch
    def windowApply(base: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("row_id").orderBy(col("__rank").desc, col("ts").desc, col("event_id").desc)
      val all = base
        .withColumn("ts", lit("1970-01-01 00:00:00").cast("timestamp"))
        .withColumn("event_id", lit(-1L)).withColumn("op", lit("U"))
        .withColumn("__rank", lit(0))
        .unionByName(batch.withColumn("__rank", lit(1)))
      all.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1 && !(col("op") <=> "D"))
        .select("row_id", "event_type", "value")
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm-up
    Cdc.applyChangelog(snapshot(1), batch, Seq("row_id"), Seq("ts", "event_id"), "op").count()
    windowApply(snapshot(1)).count()

    scales.foreach { k =>
      val snap = snapshot(k).localCheckpoint(true)
      val snapRows = snap.count()
      def minOf2(f: => Long): (Long, Double) = {
        val (n, t1) = timed(f); val (_, t2) = timed(f); (n, math.min(t1, t2))
      }
      val (rows, antiSec) = minOf2(
        Cdc.applyChangelog(snap, batch, Seq("row_id"), Seq("ts", "event_id"), "op").count())
      val (rowsW, windowSec) = minOf2(windowApply(snap).count())
      require(rows == rowsW, s"window/anti apply disagree at scale $k: $rows vs $rowsW")
      // full row equality (outside the timed sections): counts alone would
      // accept a same-cardinality wrong-payload bug in either shape
      val a = Cdc.applyChangelog(snap, batch, Seq("row_id"), Seq("ts", "event_id"), "op")
      val b = windowApply(snap)
      require(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"window/anti apply rows differ at scale $k")
      println(f"""{"scale":$k,"snapshot_rows":$snapRows,"batch_rows":$batchRows,""" +
        f""""result_rows":$rows,"anti_join_sec":$antiSec%.3f,"window_sec":$windowSec%.3f}""")
    }
    spark.stop()
  }
}
