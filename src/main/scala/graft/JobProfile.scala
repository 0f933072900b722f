package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job attribution for one gate: run the gate (warm-up pass then a
  * profiled pass) and print every job the profiled pass submitted, with its
  * wall duration and callsite — the optimization round's stage-attribution
  * tool (guide §1: find where the time actually goes before changing
  * anything). Serial job count is itself a metric at gate scale: each job
  * is a driver round-trip plus scheduling floor.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProfile <gate> [gate...]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          .getOrElse(js.stageInfos.map(si => si.name.takeWhile(_ != '\n').take(60))
            .mkString(" | ").take(180))
        // SPARK_GRAFT_PROFILE_STAGES=1: append the deepest graft frame from
        // the first stage's callsite details — AQE stage jobs all report
        // withThreadLocalCaptured as their short site, which attributes
        // nothing (r18)
        val deep =
          if (!sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1")) ""
          else js.stageInfos.headOption.map(_.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("JobProfile"))
            .getOrElse("")).getOrElse("") match {
            case "" => ""
            case f => " @ " + f.trim.take(90)
          }
        jobs.put(js.jobId, (site + deep, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (site, t0) =>
          done.add((je.jobId, site, (je.time - t0) / 1e3))
        }
      }
    })
    args.flatMap(_.split(",")).filter(_.nonEmpty).foreach { gate =>
      SparkEntry.queries(gate)(spark, sfDir).count() // warm-up (JIT + fixtures)
      done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(gate)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain the last job-end event
      val rows = done.toArray(Array.empty[(Int, String, Double)]).sortBy(_._1)
      println(f"PROFILE $gate wall=$wall%.2f s jobs=${rows.length}")
      rows.foreach { case (id, site, sec) => println(f"  job $id%3d  $sec%6.3f s  $site") }
      val sum = rows.map(_._3).sum
      println(f"  sum(job wall)=$sum%.2f s (serial gap=${wall - sum}%.2f s)")
    }
    spark.stop()
  }
}
