package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mid-regime CC A/B driver (r18): a synthetic star-cluster graph big enough
  * that the min-label rounds' label side is far past any broadcast estimate
  * (the sort-merge regime the pre-partitioned closure targets) but far below
  * the auto star-first threshold — the regime the sf0.1 gates cannot reach.
  *
  * Graph: nodes 0..n-1 in clusters of 5, edges (i - i%5, i) for i%5 != 0 —
  * 0.8n canonical edges, diameter 2, so the loop's cost is the per-round
  * join machinery, not round count. Deterministic, rebuilt per run.
  *
  * Usage: SPARK_GRAFT_CPUS=32 CC_NODES=2500000 CC_REPS=5 \
  *   sbt "runMain graft.CcMidBench"
  */
object CcMidBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("CC_NODES", "2500000").toLong
    val reps = sys.env.getOrElse("CC_REPS", "5").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val loadStart = BenchEnv.loadavg(); val tStart = BenchEnv.nowIso()
    def pairs = spark.range(n).where(col("id") % 5 =!= 0)
      .select((col("id") - col("id") % 5).as("id_a"), col("id").as("id_b"))
    // warm-up at 1/10 scale: JIT + codegen off the measured runs
    graft.operators.Dedup.duplicateGroups(
      pairs.where(col("id_b") < n / 10)).count()
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val cnt = graft.operators.Dedup.duplicateGroups(pairs).count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(cnt == n - n % 5, s"unexpected label count $cnt")
      println(f"CCMID run=$sec%.2f s")
      sec
    }.sorted
    val median = if (reps % 2 == 1) ts(reps / 2) else (ts(reps / 2 - 1) + ts(reps / 2)) / 2
    println(f"CCMID n=$n edges=${n - n / 5 - n % 5} min=${ts.min}%.3f median=$median%.3f " +
      s"""runs=${ts.map(t => f"$t%.2f").mkString(",")} """ +
      s"{${BenchEnv.hostJson(loadStart, tStart)}}")
    spark.stop()
  }
}
