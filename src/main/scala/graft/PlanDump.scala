package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for declared gates to files — the plan
  * evidence the optimization rounds commit under plans/rNN/ (guide §1:
  * capture the plan shape before and after every change).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_PLAN_OUT=plans/r17 \
  *   sbt "runMain graft.PlanDump [name,name,...]"
  * With no args every gate is dumped (fixture-writing gates execute their
  * setup side effects exactly as in Verify/Bench). File name is
  * `<gate><suffix>.txt`; SPARK_GRAFT_PLAN_SUFFIX picks `_before`/`_after`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "plans/r17")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names =
      if (args.nonEmpty) args.flatMap(_.split(",")).toSeq.filter(_.nonEmpty)
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$n$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] $n ok (${txt.length} chars)")
      } catch {
        case e: Throwable => println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
