package graft
import org.apache.spark.sql.SparkSession
object MicroBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = sys.env.get("SPARK_GRAFT_MICRO").map(_.split(",").toSeq)
      .getOrElse(Seq("dedup_minhash", "dedup_ngram_jaccard", "dedup_groups"))
    // warmup
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    for (n <- names) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); SparkEntry.queries(n)(spark, sfDir).count(); (System.nanoTime()-t0)/1e9
      }
      println(f"MICRO $n%-24s min=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
