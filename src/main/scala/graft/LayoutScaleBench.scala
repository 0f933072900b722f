package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Pruning evidence for the layout operators (VERDICT r6 next-step #7): the
  * curve gates prove bounding-box shrinkage; this harness converts that to
  * the numbers that matter at 100 TB for a selective 2-D box predicate over
  * replicated events data, per layout (unsorted / single-column sort /
  * z-order / hilbert):
  *
  *  - file-skip count: files whose per-file (user_id, value) bounding box
  *    misses the predicate box — exactly what a lakehouse file index
  *    (Delta/Iceberg per-file stats, our LakeFileIndex partition pruning)
  *    skips without opening the file;
  *  - scan output rows: rows surviving the pushed filter, which measures
  *    parquet row-group/page skipping INSIDE the files Spark does open;
  *  - wall time of the filtered aggregate.
  *
  * The box predicate is ~4% of each dimension (~0.16% of the plane), the
  * regime layout exists for. Emits one JSON line per (scale, layout); paste
  * the table into BASELINE.md.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.LayoutScaleBench"
  */
object LayoutScaleBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10,25")
      .split(",").map(_.trim.toInt).toSeq
    val numFiles = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_FILES", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "user_id", "value")
    // replicas keep the same (user_id, value) distribution, so the
    // predicate box keeps constant selectivity while data volume grows
    def corpus(k: Int): DataFrame =
      (0 until k).map { r =>
        base.select((col("event_id") + lit(r.toLong * 1000000000L)).as("event_id"),
          col("user_id"), col("value"))
      }.reduce(_ unionByName _)

    val (xLo, xHi) = (0.0, 1500.0)
    val (yLo, yHi) = (0.0, 561.0)
    // ~4% of each dimension
    val (qx0, qx1) = (700L, 760L)
    val (qy0, qy1) = (250.0, 272.0)

    val work = java.nio.file.Files.createTempDirectory("graft-layout-bench").toFile
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    def layouts(df: DataFrame): Seq[(String, DataFrame)] = Seq(
      "unsorted" -> df.repartition(numFiles),
      "sort_x" -> df.repartitionByRange(numFiles, col("user_id"))
        .sortWithinPartitions("user_id"),
      "zorder" -> Layout.zorder2(df, "user_id", xLo, xHi, "value", yLo, yHi,
        bits = 12, numFiles = numFiles),
      "hilbert" -> Layout.hilbertOrder2(df, "user_id", xLo, xHi, "value", yLo, yHi,
        bits = 12, numFiles = numFiles))

    scales.foreach { k =>
      val c = corpus(k).localCheckpoint(true)
      layouts(c).foreach { case (name, laid) =>
        val dir = s"$work/s$k-$name"
        laid.write.mode("overwrite").parquet(dir)
        val reread = spark.read.parquet(dir)
        // per-file bounding boxes -> how many files a stats-backed index skips
        val bounds = reread.groupBy(input_file_name().as("f"))
          .agg(min("user_id").as("x0"), max("user_id").as("x1"),
            min("value").as("y0"), max("value").as("y1"))
          .collect()
        val total = bounds.length
        def xOverlap(r: org.apache.spark.sql.Row) =
          r.getAs[Long]("x1") >= qx0 && r.getAs[Long]("x0") <= qx1
        def yOverlap(r: org.apache.spark.sql.Row) =
          r.getAs[Double]("y1") >= qy0 && r.getAs[Double]("y0") <= qy1
        // the three query shapes that separate 1-D sorting from 2-D curves:
        // a curve prunes on EITHER dimension; sort_x only on its own
        val preds = Seq(
          ("box", col("user_id").between(qx0, qx1) && col("value").between(qy0, qy1),
            (r: org.apache.spark.sql.Row) => xOverlap(r) && yOverlap(r)),
          ("x_band", col("user_id").between(qx0, qx1), xOverlap _),
          ("y_band", col("value").between(qy0, qy1), yOverlap _))
        val fields = preds.map { case (pname, cond, fileHit) =>
          val eligible = bounds.count(fileHit)
          val q = reread.where(cond).agg(count(lit(1)).as("n"), sum("value"))
          val (hits, secs) = timed { q.collect()(0).getLong(0) }
          // rows the scan emitted after pushed-filter row-group/page
          // skipping; AQE hides scans inside query-stage leaves, so recurse
          def scanRowsOf(p: org.apache.spark.sql.execution.SparkPlan): Long =
            p.collect {
              case s: org.apache.spark.sql.execution.FileSourceScanExec =>
                s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
              case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                scanRowsOf(qs.plan)
            }.sum
          val scanRows = q.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              scanRowsOf(a.executedPlan)
            case p => scanRowsOf(p)
          }
          s""""${pname}_files_eligible":$eligible,"${pname}_scan_rows":$scanRows,""" +
            s""""${pname}_hits":$hits,"${pname}_sec":${f"$secs%.3f"}"""
        }
        println(s"""{"bench":"layout_scale","scale":$k,"layout":"$name",""" +
          s""""rows":${c.count()},"files":$total,${fields.mkString(",")}}""")
      }
    }
    spark.stop()
  }
}
