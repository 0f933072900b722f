package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measures the coarser-banding escape hatch at the measured single-node
  * pair-path ceiling (r15: mutated sf50m, ~540M candidate pairs, spill
  * exceeded local disk). SCALE.md names the knob — fewer bands × more
  * rows/band cuts sub-threshold candidate pressure exponentially — and
  * this harness is the run that demonstrates it instead of asserting it:
  * for each bands config it times MinHash candidate generation, the
  * verified pair set, and the grouping path, and counts candidates +
  * verified pairs so the recall trade is stated with numbers, not theory.
  *
  * Banding math (numHashes=128): bands=32 → r=4 rows/band, LSH threshold
  * s* = (1/32)^(1/4) ≈ 0.42 — at a 0.7 verify threshold candidate
  * generation is effectively complete but sub-threshold pairs flood the
  * shuffle. bands=16 → r=8, s* ≈ 0.71: detection probability at J=0.7 is
  * 1-(1-0.7^8)^16 ≈ 0.61, at J=0.8 ≈ 0.94, at J≥0.85 ≈ 0.99 — the knob
  * trades tail recall AT the threshold for an exponential candidate cut.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BANDS
  * (comma list, default "32,16"), SPARK_GRAFT_GROUPS=0 to skip grouping,
  * SPARK_GRAFT_SHUFFLE_PARTITIONS, SPARK_GRAFT_GC_INTERVAL.
  */
object BandKnobBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val bandsList = sys.env.getOrElse("SPARK_GRAFT_BANDS", "32,16")
      .split(",").map(_.trim.toInt).toSeq
    val doGroups = sys.env.getOrElse("SPARK_GRAFT_GROUPS", "1") != "0"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_GC_INTERVAL", "30min"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = queries.QueryPack.t(spark, sfDir, "documents")
    val nDocs = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // candidate generation over distinct texts — the collapsed frame the
    // shipped operators actually band (collapse-first, like the gates);
    // bands-independent, so built + checkpointed ONCE outside the loop
    val reps = docs.groupBy(Dedup.normTextHash("text").as("__rh"))
      .agg(min(col("doc_id")).as("doc_id"), min_by(col("text"), col("doc_id")).as("text"))
      .select("doc_id", "text").localCheckpoint(true)
    val nReps = reps.count()

    bandsList.foreach { bands =>
      val loadStart = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      val (nCand, tCand) = timed(
        Dedup.minHashCandidatePairs(reps, "doc_id", "text", bands = bands).count())
      val (nPairs, tPairs) = timed(
        Dedup.minHashDuplicates(docs, "doc_id", "text", threshold = 0.7,
          bands = bands).count())
      val (nGroupRows, tGroups) =
        if (doGroups) timed(Dedup.minHashDuplicateGroups(docs, "doc_id", "text",
          threshold = 0.7, bands = bands).count())
        else (-1L, -1.0)
      val loadEnd = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      println(s"""{"bench":"band_knob","sf_dir":"$sfDir","docs":$nDocs,""" +
        s""""distinct_texts":$nReps,"bands":$bands,"num_hashes":128,""" +
        s""""rep_candidates":$nCand,"cand_sec":$tCand,""" +
        s""""verified_pairs":$nPairs,"pairs_sec":$tPairs,""" +
        s""""group_rows":$nGroupRows,"groups_sec":$tGroups,""" +
        s""""load_start":$loadStart,"load_end":$loadEnd}""")
    }
    spark.stop()
  }
}
