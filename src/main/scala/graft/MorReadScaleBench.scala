package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling evidence for the merge-on-read READ side: DmlScaleBench shows
  * DV/position-delete WRITES stay flat; this shows what those writes cost
  * the subsequent scans, and that OPTIMIZE pays for itself. Tables grown
  * 1-25x are force-split into many files, then hit with three rounds of
  * row-level DELETEs under merge-on-read (Delta: a deletion vector on
  * every touched file; Iceberg: position-delete files), so the MoR scan
  * must anti-join delete state scattered across the whole table. The
  * claim under test: the MoR scan's overhead over an already-compacted
  * twin (same logical rows, no delete state) is a bounded constant
  * factor at every scale — the delete side stays broadcast — and a real
  * OPTIMIZE restores the compacted read cost.
  *
  * Emits one JSON line per scale; paste the table into BASELINE.md.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.MorReadScaleBench"
  */
object MorReadScaleBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,5,25")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = java.nio.file.Files.createTempDirectory("graft-morread-bench").toFile
    Graft.install(spark, wh.toString)
    val lake = new java.io.File(wh, "lake"); lake.mkdirs()
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE morb OPTIONS (path '$lake') " +
      "NAMESPACE graft.datasource.bench")
    spark.sql(s"REGISTER OR REPLACE ICEBERG DATASOURCE morbi OPTIONS (warehouse '$lake') " +
      "NAMESPACE graft.datasource.benchi")

    val events = graft.queries.QueryPack.t(spark, sfDir, "events")
    val base0 = events.select(col("event_id").as("id"), col("event_type"), col("value"))

    def replicated(k: Int) =
      (0 until k).map { r =>
        base0.withColumn("id", col("id") + lit(r * 1000000000L))
      }.reduce(_ unionByName _)

    var n = 0
    def buildDelta(k: Int, files: Int, dv: Boolean): String = {
      n += 1
      val name = s"d$n"
      val props = if (dv) " TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')" else ""
      spark.sql(s"CREATE TABLE graft.datasource.bench.morb.$name " +
        s"(id BIGINT, event_type STRING, value DOUBLE)$props")
      replicated(k).createOrReplaceTempView("__morb_src")
      spark.sql(s"INSERT INTO graft.datasource.bench.morb.$name " +
        s"SELECT /*+ REPARTITION($files) */ id, event_type, CAST(value AS DOUBLE) FROM __morb_src")
      s"graft.datasource.bench.morb.$name"
    }
    def buildIce(k: Int, files: Int): String = {
      n += 1
      val name = s"i$n"
      spark.sql(s"CREATE TABLE graft.datasource.benchi.morbi.$name " +
        "(id BIGINT, event_type STRING, value DOUBLE) " +
        "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
      replicated(k).createOrReplaceTempView("__morb_src")
      spark.sql(s"INSERT INTO graft.datasource.benchi.morbi.$name " +
        s"SELECT /*+ REPARTITION($files) */ id, event_type, CAST(value AS DOUBLE) FROM __morb_src")
      s"graft.datasource.benchi.morbi.$name"
    }

    def scanSec(fqn: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.sql(s"SELECT SUM(value), COUNT(*) FROM $fqn").collect()
        (System.nanoTime() - t0) / 1e9
      }
      once(); math.min(once(), once()) // warm + min of 2
    }
    // three delete rounds scatter delete state across every file
    def deleteRounds(fqn: String): Unit =
      Seq(0, 1, 2).foreach(r =>
        spark.sql(s"DELETE FROM $fqn WHERE id % 10 = $r"))

    // warm-up
    locally {
      val t = buildDelta(1, 4, dv = true)
      deleteRounds(t); scanSec(t)
      val ti = buildIce(1, 4)
      deleteRounds(ti); scanSec(ti)
    }

    scales.foreach { k =>
      val files = 16 * k // file count grows with the table, as it would live
      // Delta: DV merge-on-read
      val td = buildDelta(k, files, dv = true)
      deleteRounds(td)
      val dvScan = scanSec(td)
      val dvFiles = graft.sources.lake.DeltaLite
        .snapshot(spark, new org.apache.hadoop.fs.Path(s"$lake/${td.split('.').last}")).dvs.size
      // compacted twin: identical surviving rows, no delete state
      val tc = buildDelta(k, files, dv = false)
      spark.sql(s"DELETE FROM $tc WHERE id % 10 <= 2") // CoW: rewrites, no DVs
      val compactScan = scanSec(tc)
      // OPTIMIZE the DV table: the read cost must come back down
      spark.sql(s"OPTIMIZE LAKE TABLE $td")
      val optimizedScan = scanSec(td)
      // Iceberg: position-delete merge-on-read
      val ti = buildIce(k, files)
      deleteRounds(ti)
      val iceScan = scanSec(ti)
      val rows = spark.table(td).count()
      require(spark.table(tc).count() == rows, "compacted twin diverged")
      require(spark.table(ti).count() == rows, "iceberg twin diverged")
      println(s"""{"bench":"mor_read_scale","scale":$k,"files":$files,""" +
        s""""rows_visible":$rows,"dv_files":$dvFiles,""" +
        s""""delta_mor_scan_sec":$dvScan,"compacted_scan_sec":$compactScan,""" +
        s""""optimized_scan_sec":$optimizedScan,"iceberg_mor_scan_sec":$iceScan,""" +
        s""""mor_overhead_ratio":${dvScan / compactScan}}""")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(wh)
  }
}
