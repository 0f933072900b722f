package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational gates at synthetic sf≈1 (VERDICT r6 next-step #8): the
  * TPC-H-style gates run at sf0.1 because the driver provides nothing
  * larger, so this harness replicates the FACT tables (lineitem, orders)
  * K× with per-replica key offsets into a temp directory — dimensions stay
  * fixed, exactly the 100 TB shape — and re-runs the headline gates through
  * the same `SparkEntry.queries` entry points. Per (scale, query) it
  * reports wall time (min of 2) and the final adaptive plan's join mix
  * (broadcast vs sort-merge), so any strategy flip under data growth is
  * visible with the AQE threshold that drove it.
  *
  * Replica keys: `o_orderkey`/`l_orderkey` shift by r*10^9, so orders:
  * lineitem join selectivity is scale-invariant; `o_custkey`/`l_suppkey`/
  * `l_partkey` are untouched and keep joining the fixed dimensions.
  *
  * Emits one JSON line per (scale, query); paste into BASELINE.md.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.RelScaleBench"
  */
object RelScaleBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val queries = sys.env.getOrElse("SPARK_GRAFT_QUERIES",
      "q1_pricing_summary,q3_shipping_priority,q5_revenue_by_nation,q9_brand_profit")
      .split(",").map(_.trim).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-rel-scale").toFile
    val dims = Seq("region", "nation", "customer", "supplier", "part")
    val facts = Seq("orders" -> "o_orderkey", "lineitem" -> "l_orderkey")

    def buildDir(k: Int): String = {
      val dir = new java.io.File(work, s"sf$k")
      if (!dir.exists()) {
        dims.foreach { t =>
          spark.read.parquet(s"$sfDir/$t.parquet")
            .write.mode("overwrite").parquet(s"$dir/$t.parquet")
        }
        facts.foreach { case (t, key) =>
          val base = spark.read.parquet(s"$sfDir/$t.parquet")
          (0 until k).map(r => base.withColumn(key, col(key) + lit(r.toLong * 1000000000L)))
            .reduce(_ unionByName _)
            .write.mode("overwrite").parquet(s"$dir/$t.parquet")
        }
      }
      dir.toString
    }

    def joinMix(df: DataFrame): (Int, Int) = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
        p.collect {
          case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => Seq("bhj")
          case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => Seq("smj")
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(qs.plan)
        }.flatten
      val nodes = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
        case p => walk(p)
      }
      (nodes.count(_ == "bhj"), nodes.count(_ == "smj"))
    }

    // JIT/codegen warm-up on the smallest scale
    SparkEntry.queries("q5_revenue_by_nation")(spark, buildDir(1)).collect()

    scales.foreach { k =>
      val dir = buildDir(k)
      val rows = spark.read.parquet(s"$dir/lineitem.parquet").count()
      queries.foreach { name =>
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(name)(spark, dir)
          df.collect()
          ((System.nanoTime() - t0) / 1e9, df)
        }
        val (secs, df) = runs.minBy(_._1)
        val (bhj, smj) = joinMix(df)
        println(s"""{"bench":"rel_scale","scale":$k,"lineitem_rows":$rows,""" +
          s""""query":"$name","sec":${f"$secs%.3f"},"bhj":$bhj,"smj":$smj}""")
      }
    }
    spark.stop()
  }
}
