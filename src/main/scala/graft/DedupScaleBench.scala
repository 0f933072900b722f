package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scaling evidence for the dedup pipeline (VERDICT r2 next-step #3): the
  * sf0.1 bench numbers are sub-second JVM noise, so this harness synthesizes
  * 1-25x corpora from the driver's documents table and measures the parts
  * that matter at 100 TB — LSH candidate generation (guarded vs unguarded),
  * exact-Jaccard verification, and connected-components grouping — plus the
  * candidate-pair counts that prove the work scales linearly.
  *
  * Corpus construction: replica `r` suffixes every token with `_r`, which
  * keeps each replica's INTERNAL near-dup structure identical to the base
  * corpus while making shingles disjoint across replicas — so the true
  * duplicate structure (pairs, groups) scales exactly linearly and any
  * super-linear runtime is the pipeline's own doing, not the data's.
  *
  * Emits one JSON line per scale; paste the table into BASELINE.md.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.DedupScaleBench"
  */
object DedupScaleBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,5,10,25")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_CC_SHAPES=1 switches to the connected-components
    // graph-shape bench (chain decade + hub skew) instead of the corpus
    // pipeline — the evidence that the star variant's round count stays
    // O(log n) where min-label's grows with the diameter, and that the
    // hub-skewed largeStar aggregation holds up at a million-degree minimum
    if (sys.env.contains("SPARK_GRAFT_CC_SHAPES")) {
      runShapes(spark)
      spark.stop()
      return
    }

    // SPARK_GRAFT_CC_AB=1: the same-JVM strategy A/B on the REAL gate
    // graph (VERDICT r12 "Next round" #1) — attribute the sf5 dedup_groups
    // single-run +43% by pinning minLabel / auto / star on the identical
    // checkpointed pair set, warm-up + 2 reps each, with the candidate-gen
    // stage and an untouched relational gate timed alongside as the drift
    // control. One JSON line; paste into BASELINE.md.
    if (sys.env.contains("SPARK_GRAFT_CC_AB")) {
      runGateAb(spark, sfDir)
      spark.stop()
      return
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val baseRows = base.count()

    def corpus(k: Int): DataFrame =
      (0 until k).map { r =>
        base.select(
          (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
          // suffix every token: intra-replica similarity preserved,
          // cross-replica similarity destroyed
          regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1x$r").as("text"))
      }.reduce(_ unionByName _)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // warm-up: full pipeline once at scale 1 so JIT/codegen is charged here
    Dedup.minHashDuplicates(corpus(1), "doc_id", "text", threshold = 0.7).count()

    scales.foreach { k =>
      val c = corpus(k).localCheckpoint(true) // measure dedup, not corpus synthesis
      val rows = c.count()

      // interleave 2 reps per variant and keep the min: the first heavy job at
      // a new scale pays JIT/GC warm-up that would otherwise masquerade as
      // guard premium (same lesson as MicroBench)
      val (candPairs, candSecA) = timed {
        Dedup.minHashCandidatePairs(c, "doc_id", "text").count()
      }
      val (candPairsUncapped, uncappedSecA) = timed {
        Dedup.minHashCandidatePairs(c, "doc_id", "text", maxBucketSize = Int.MaxValue).count()
      }
      val (_, candSecB) = timed {
        Dedup.minHashCandidatePairs(c, "doc_id", "text").count()
      }
      val (_, uncappedSecB) = timed {
        Dedup.minHashCandidatePairs(c, "doc_id", "text", maxBucketSize = Int.MaxValue).count()
      }
      val candSec = math.min(candSecA, candSecB)
      val uncappedSec = math.min(uncappedSecA, uncappedSecB)
      val (verified, verifySec) = timed {
        Dedup.minHashDuplicates(c, "doc_id", "text", threshold = 0.7).count()
      }
      val pairs = Dedup.minHashDuplicates(c, "doc_id", "text", threshold = 0.7)
        .localCheckpoint(true)
      val (groups, groupsSec) = timed {
        Dedup.duplicateGroups(pairs).agg(countDistinct(col("group_id"))).head().getLong(0)
      }
      val premiumPct = 100.0 * (candSec - uncappedSec) / math.max(uncappedSec, 1e-9)
      println(f"""{"scale":$k,"rows":$rows,"base_rows":$baseRows,""" +
        f""""cand_pairs":$candPairs,"cand_pairs_uncapped":$candPairsUncapped,""" +
        f""""cand_sec":$candSec%.3f,"uncapped_sec":$uncappedSec%.3f,""" +
        f""""guard_premium_pct":$premiumPct%.1f,""" +
        f""""verified_pairs":$verified,"verify_sec":$verifySec%.3f,""" +
        f""""groups":$groups,"groups_sec":$groupsSec%.3f}""")
    }
    spark.stop()
  }

  /** Same-JVM CC-strategy A/B on the gate's own near-dup graph. Stages:
    * q5 (untouched relational control), candidate-gen + verify (the gate's
    * non-CC cost), then each strategy over ONE checkpointed pair set —
    * every stage warm-up + 2, min kept, per MicroBench discipline. Also
    * records each strategy's round count and the min-label changed-count
    * decay curve, the input to tuning `auto`'s hand-off.
    */
  private def runGateAb(spark: SparkSession, sfDir: String): Unit = {
    import java.util.concurrent.atomic.AtomicInteger
    val loadStart = BenchEnv.loadavg(); val tStart = BenchEnv.nowIso()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def warmPlus2(f: => Unit): Seq[Double] = { f; Seq.fill(2)(timed(f)) }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint(true)
    val q5 = warmPlus2(SparkEntry.queries("q5_revenue_by_nation")(spark, sfDir).count(): Unit)
    val mh = warmPlus2(
      Dedup.minHashDuplicates(docs, "doc_id", "text", threshold = 0.7).count(): Unit)
    val pairs = Dedup.minHashDuplicates(docs, "doc_id", "text", threshold = 0.7)
      .localCheckpoint(true)
    val nPairs = pairs.count()
    // decay curve once, untimed (diagnostic for the auto hand-off rule)
    val decay = scala.collection.mutable.ArrayBuffer.empty[Long]
    Dedup.duplicateGroups(pairs, maxIter = 64, strategy = "minLabel",
      changedOut = Some(decay)).count(): Unit
    val byStrategy = Seq("minLabel", "auto", "star").map { st =>
      val rounds = new AtomicInteger(0)
      val ts = warmPlus2(Dedup.duplicateGroups(pairs, maxIter = 64,
        requireConvergence = true, strategy = st,
        roundsOut = Some(rounds)).count(): Unit)
      (st, ts, rounds.get())
    }
    val stJson = byStrategy.map { case (st, ts, r) =>
      f""""$st":{"runs":[${ts.map(t => f"$t%.3f").mkString(",")}],"min":${ts.min}%.3f,"rounds":$r}"""
    }.mkString(",")
    println(f"""CC_AB {"sf":"$sfDir","pairs":$nPairs,""" +
      f""""q5_control":[${q5.map(t => f"$t%.3f").mkString(",")}],""" +
      f""""minhash_verify":[${mh.map(t => f"$t%.3f").mkString(",")}],""" +
      f""""minlabel_decay":[${decay.mkString(",")}],""" +
      s"""$stJson,${BenchEnv.hostJson(loadStart, tStart)}}""")
  }

  /** CC variants over adversarial graph shapes. CHAIN is the diameter
    * stressor (path graph: min-label needs diameter rounds, star needs
    * O(log n)); HUB is the skew stressor (one vertex of degree n-1 — the
    * component minimum — so every largeStar round funnels the whole
    * neighborhood through one groupBy/join key). One JSON line per run.
    */
  private def runShapes(spark: SparkSession): Unit = {
    import java.util.concurrent.atomic.AtomicInteger
    def chain(n: Long): DataFrame = spark.range(0, n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    def hub(n: Long): DataFrame = spark.range(1, n)
      .select(lit(0L).as("id_a"), col("id").as("id_b"))
    def run(shape: String, n: Long, variant: String, df: DataFrame): Unit = {
      val edges = df.localCheckpoint(true) // measure the loop, not synthesis
      val rounds = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val groups = variant match {
        case "star" => Dedup.duplicateGroupsStar(edges, roundsOut = Some(rounds))
        case "auto" => Dedup.duplicateGroups(edges, maxIter = 64,
          requireConvergence = true, roundsOut = Some(rounds))
        case "minLabel" => Dedup.duplicateGroups(edges, maxIter = n.toInt + 2,
          requireConvergence = true, strategy = "minLabel", roundsOut = Some(rounds))
      }
      val ng = groups.agg(countDistinct(col("group_id"))).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"shape":"$shape","n":$n,"variant":"$variant",""" +
        f""""rounds":${rounds.get()},"groups":$ng,"sec":$sec%.3f}""")
      require(ng == 1, s"$shape/$n/$variant: expected ONE component, got $ng")
    }
    // chain decade: star/auto round counts must grow ~log10 step while the
    // per-round cost grows linearly with n
    Seq(10000L, 100000L, 1000000L).foreach { n =>
      Seq("star", "auto").foreach(v => run("chain", n, v, chain(n)))
    }
    // min-label's rounds ARE the diameter — shown at sizes where diameter
    // rounds are still runnable (64 and 128 rounds; 1e6 would be 1e6 rounds)
    Seq(64L, 128L).foreach(n => run("chain", n, "minLabel", chain(n)))
    // hub: million-degree minimum
    Seq(1000000L).foreach { n =>
      Seq("star", "minLabel", "auto").foreach(v => run("hub", n, v, hub(n)))
    }
    // balanced binary tree: the ADVERSARIAL decay curve for the auto rule —
    // each min-label round roughly halves the changed count, so the
    // "below half = still converging" test never fires and auto rides
    // min-label to its round budget before star closes the remainder
    // (suite twin: DedupSuite "adversarial ~halving decay"). Diameter
    // 2*log2(n), so rounds stay bounded either way; the row exists so a
    // future decay-rule tuning can't silently regress this shape.
    def tree(n: Long): DataFrame = spark.range(1, n)
      .select(((col("id") - 1) / lit(2)).cast("long").as("id_a"), col("id").as("id_b"))
    Seq(10000L, 1000000L).foreach { n =>
      Seq("star", "auto").foreach(v => run("tree", n, v, tree(n)))
    }
  }
}
