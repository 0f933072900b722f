package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.functions.{GraftFunctions => F}

/** Scaling evidence for SemDeDup (the semantic-dedup twin of
  * [[AnnScaleBench]]): synthesizes 1-25x embedding corpora and measures
  * the candidate-pair counts (quadratic all-pairs vs the within-cell join),
  * wall-clock, and pair recall vs exact brute force at each scale.
  *
  * `nCells` sizes by BANDED occupancy: rows x probes / nCells = 400, which
  * keeps every working cell under the hot-bucket guard's sampled detection
  * point (~maxCellSize since the r6 threshold fix: a 10% doc sample flags
  * buckets whose sampled count reaches cap x 0.1, i.e. true size ~cap) —
  * the failure modes were measured the hard way twice under the pre-fix
  * threshold (detection at ~cap/2): 4-cells-per-replica put cells AT the
  * cap and the guard star-linked the whole corpus (recall ~0); raising
  * probes without raising nCells pushed occupancy past detection and
  * candidate counts went DOWN. The guard is for DEGENERATE cells, not the
  * working regime — the occupancy rule keeps honest headroom below it
  * (and bounds the quadratic within-cell join at ~80k pairs/cell). Each
  * scale runs at probes = 2 and 3 to show the knob: more probes (with
  * occupancy held at 400) buys recall with candidate volume — recall
  * stays < 1 either way; that is SemDeDup's own tradeoff (the paper
  * accepts misses as slightly-less-pruned training data).
  *
  * Corpus construction mirrors AnnScaleBench: replica `r` perturbs every
  * dimension with a deterministic sinusoid keyed by (vec_id, dim, r), so
  * replicas are pairwise-distinct vectors with the same overall geometry.
  *
  * Emits one JSON line per scale; paste the table into BASELINE.md.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SemDedupScaleBench"
  */
object SemDedupScaleBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,5,10,25")
      .split(",").map(_.trim.toInt).toSeq
    val threshold = 0.45
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")

    def corpus(n: Int): DataFrame =
      (0 until n).map { r =>
        base.select(
          (col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + sin(col("vec_id") * 31 + i * 7 + lit(r * 131)) * lit(0.05)).cast("float"))
            .as("embedding"))
      }.reduce(_ unionByName _)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // warm-up: JIT/codegen charged here, not to the first scale
    Dedup.semanticDuplicates(corpus(1), "vec_id", "embedding", threshold,
      nCells = 8, probes = 2).count()

    for (n <- scales; probes <- Seq(2, 3)) {
      val c = corpus(n).localCheckpoint(true) // measure dedup, not synthesis
      val rows = c.count()
      val nCells = math.max(8, (rows * probes / 400).toInt)

      def run() = Dedup.semanticDuplicates(c, "vec_id", "embedding", threshold,
        nCells = nCells, probes = probes)
      val (_, t1) = timed(run().count())
      val (_, t2) = timed(run().count())
      val semSec = math.min(t1, t2)

      val brutePairs = rows * (rows - 1) / 2
      val semPairs = Dedup.semanticScoredPairs(c, "vec_id", "embedding",
        nCells = nCells, probes = probes)

      // pair recall vs exact brute force, measured on a deterministic
      // sample of anchor ids (full all-pairs would be rows^2/2 cosine evals
      // — 7.8e9 at scale 25); the sample side broadcasts, so the exact set
      // costs |sample| x rows evals. Exact-cosine verification makes
      // precision 1.0, so recall is the only question — reported BOTH at
      // the gate threshold (0.45, includes weakly-similar pairs whose
      // cell-splitting is SemDeDup's accepted loss) and at 0.95, the
      // paper's near-duplicate operating regime, where near-identical
      // vectors co-cluster by construction.
      val sample = c.where(col("vec_id") % 10 === 0 && col("vec_id") < 10000000L)
        .select(col("vec_id").as("sid"), col("embedding").as("sv"))
        .localCheckpoint(true)
      val exact = sample
        .join(c.select(col("vec_id").as("oid"), col("embedding").as("ov")),
          col("sid") =!= col("oid"))
        .select(least(col("sid"), col("oid")).as("id_a"),
          greatest(col("sid"), col("oid")).as("id_b"),
          F.cosine_similarity(col("sv"), col("ov")).as("cos"))
        .where(col("cos") >= threshold)
        .distinct().localCheckpoint(true)
      val sem = run().localCheckpoint(true)
      def recallAt(t: Double): (Long, Double) = {
        val e = exact.where(col("cos") >= t)
        val n = e.count()
        val hit = e.join(sem.where(col("cosine") >= t).select("id_a", "id_b"),
          Seq("id_a", "id_b")).count()
        (n, if (n == 0) 1.0 else hit.toDouble / n)
      }
      val (exactN, recall) = recallAt(threshold)
      val (exactN95, recall95) = recallAt(0.95)

      println(f"""{"scale":$n,"rows":$rows,"probes":$probes,"ncells":$nCells,"brute_pairs":$brutePairs,""" +
        f""""sem_pairs":$semPairs,"prune_x":${brutePairs.toDouble / math.max(semPairs, 1)}%.1f,""" +
        f""""sem_sec":$semSec%.3f,"exact_pairs":$exactN,"recall":$recall%.3f,""" +
        f""""exact_pairs_95":$exactN95,"recall_95":$recall95%.3f}""")
    }
    spark.stop()
  }
}
