package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling evidence for lake row-level DML: a FIXED-touched-set DELETE
  * against Delta tables grown 1-25x. The claim under test is the
  * copy-on-write shape's whole point — cost tracks the TOUCHED files
  * (constant here: the predicate names one partition that exists only in
  * replica 0), never the table: the find-files scan prunes to the touched
  * partition at the metadata level, and only its files rewrite. The
  * anti-check is the naive formulation — INSERT OVERWRITE with the
  * filtered content — which rewrites every file and must grow linearly.
  *
  * Emits one JSON line per scale; paste the table into BASELINE.md.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.DmlScaleBench"
  */
object DmlScaleBench {
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

    val wh = java.nio.file.Files.createTempDirectory("graft-dml-bench").toFile
    Graft.install(spark, wh.toString)
    val lake = new java.io.File(wh, "lake"); lake.mkdirs()
    spark.sql(s"REGISTER OR REPLACE DELTA DATASOURCE dmlb OPTIONS (path '$lake') " +
      "NAMESPACE graft.datasource.bench")

    // replica r owns buckets 4r..4r+3, so `bucket = 0` touches ONLY
    // replica 0 — the touched set is scale-invariant by construction
    val events = graft.queries.QueryPack.t(spark, sfDir, "events")
    val base0 = events.select(col("event_id").as("id"), col("event_type"), col("value"))
    def replicated(k: Int): DataFrame =
      (0 until k).map { r =>
        base0.withColumn("id", col("id") + lit(r * 1000000000L))
          .withColumn("bucket", (col("id") % 4 + lit(r * 4)).cast("int"))
      }.reduce(_ unionByName _)

    var n = 0
    def build(k: Int, props: String = ""): String = {
      n += 1
      val name = s"t$n"
      spark.sql(s"CREATE TABLE graft.datasource.bench.dmlb.$name " +
        s"(id BIGINT, event_type STRING, value DOUBLE, bucket INT) PARTITIONED BY (bucket) $props")
      replicated(k).createOrReplaceTempView("__dmlb_src")
      spark.sql(s"INSERT INTO graft.datasource.bench.dmlb.$name " +
        "SELECT id, event_type, CAST(value AS DOUBLE), bucket FROM __dmlb_src")
      s"graft.datasource.bench.dmlb.$name"
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm-up both paths
    locally {
      val t = build(1)
      spark.sql(s"DELETE FROM $t WHERE bucket = 0 AND id % 10 = 0")
      spark.sql(s"INSERT OVERWRITE $t SELECT * FROM $t WHERE NOT (id % 10 = 1)")
      val tdv = build(1, "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')")
      spark.sql(s"DELETE FROM $tdv WHERE bucket = 0 AND id % 10 = 0")
    }

    scales.foreach { k =>
      val t1 = build(k)
      val rowsBefore = spark.table(t1).count()
      val delSec = timed {
        spark.sql(s"DELETE FROM $t1 WHERE bucket = 0 AND id % 10 = 0")
      }
      val rowsAfter = spark.table(t1).count()
      // anti-check on a FRESH identical table: full-table rewrite of the
      // same logical change
      val t2 = build(k)
      val fullSec = timed {
        spark.sql(s"INSERT OVERWRITE $t2 " +
          s"SELECT * FROM $t2 WHERE NOT (bucket = 0 AND id % 10 = 0)")
      }
      // the merge-on-read shape: the same delete as deletion vectors only
      val t3 = build(k, "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')")
      val dvSec = timed {
        spark.sql(s"DELETE FROM $t3 WHERE bucket = 0 AND id % 10 = 0")
      }
      require(spark.table(t3).count() == rowsAfter, "DV delete diverged from CoW")
      println(s"""{"bench":"dml_scale","scale":$k,"rows":$rowsBefore,""" +
        s""""deleted":${rowsBefore - rowsAfter},"delete_sec":$delSec,""" +
        s""""dv_delete_sec":$dvSec,""" +
        s""""full_rewrite_sec":$fullSec}""")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(wh)
  }
}
