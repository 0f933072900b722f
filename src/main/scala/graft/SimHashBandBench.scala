package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Candidate-pressure A/B for the SimHash banding schemes at an aggressive
  * Hamming distance: single-table (maxHamming+1 contiguous blocks — at
  * d=8 that's 9 bands of ~7-bit keys) vs the Manku '07 multi-table
  * block-combination scheme (blocks=10 keyed on 2-block subsets → 45
  * tables of ~12.8-bit keys). Both are complete for the distance, so the
  * VERIFIED output is identical (DedupSuite pins it); what differs is the
  * candidate mass the bucket self-join must materialize and the verify
  * stage must popcount. Prints one JSON line with distinct-candidate
  * counts, raw (pre-distinct) pair counts, and wall times per scheme.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_MAXHAM (default 8).
  */
object SimHashBandBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxHam = sys.env.getOrElse("SPARK_GRAFT_MAXHAM", "8").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = queries.QueryPack.t(spark, sfDir, "documents").localCheckpoint(true)
    val nDocs = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // SPARK_GRAFT_ONLY_PAIRS=1 (r17): count the rep-level VERIFIED pair set
    // of the multi-table scheme (the pair stage simHashDuplicateGroups runs
    // after exact-collapse) plus the rep count — the slope attribution for
    // the grouping wall: on mutated fixtures near-dup cluster sizes grow
    // with copies, so rep pairs grow ~quadratically per corpus doubling
    // while members only double.
    // SPARK_GRAFT_BLOCKS (r17): override the multi-table block count in the
    // ONLY_PAIRS / ONLY_GROUPS modes — the key-width knob. At d=8:
    // blocks=10 → C(10,2)=45 tables of ~12.8-bit keys; 11 → 165 × ~17.5
    // bits; 12 → 495 × ~21.3 bits. Completeness is pigeonhole at any valid
    // blocks ONLY cap-free: under the hot-bucket cap, narrow keys saturate
    // and star-link, so a verified_pairs DELTA between settings MEASURES
    // the narrower config's silent cap degradation (r17 at sf50m/d=8:
    // blocks=10 reported 148.6M pairs where blocks=11 finds 981.7M — the
    // measurement that made simHashAutoBlocks corpus-sized).
    val mtBlocks = sys.env.getOrElse("SPARK_GRAFT_BLOCKS", "10").toInt

    if (sys.env.get("SPARK_GRAFT_ONLY_PAIRS").contains("1")) {
      import graft.operators.{Dedup => D}
      val reps = D.exactDedup(docs, "doc_id", "text").localCheckpoint(true)
      val nReps = reps.count()
      val (pairRows, sec) = timed(Dedup.simHashDuplicatesMultiTable(
        reps, "doc_id", "text", maxHam, blocks = mtBlocks).count())
      val load = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      println(s"""{"bench":"simhash_mt_pairs","sf_dir":"$sfDir","docs":$nDocs,""" +
        s""""reps":$nReps,"max_hamming":$maxHam,"blocks":$mtBlocks,""" +
        s""""verified_pairs":$pairRows,"sec":$sec,"load_end":$load}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_ONLY_GROUPS=1: skip the candidate-mass A/B (at sf-decade
    // corpora the d=8 raw candidate counts are themselves hours of work)
    // and time just the collapse-first multi-table GROUPS path — the
    // consumer shape that is supposed to make d=8 viable at scale.
    if (sys.env.get("SPARK_GRAFT_ONLY_GROUPS").contains("1")) {
      // SPARK_GRAFT_CC_STRATEGY (r17): auto | minLabel | star — A/B the
      // connected-components strategy at the aggressive-distance frontier,
      // where the CC tail owns most of the wall (BASELINE r17 slope note)
      val strategy = sys.env.getOrElse("SPARK_GRAFT_CC_STRATEGY", "auto")
      val (rows, sec) = timed(Dedup.simHashDuplicateGroups(
        docs, "doc_id", "text", maxHam, blocks = mtBlocks, strategy = strategy,
        maxIter = 40).count())
      val load = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
      println(s"""{"bench":"simhash_mt_groups","sf_dir":"$sfDir","docs":$nDocs,""" +
        s""""max_hamming":$maxHam,"blocks":$mtBlocks,"strategy":"$strategy",""" +
        s""""group_rows":$rows,"sec":$sec,"load_end":$load}""")
      spark.stop()
      return
    }

    // single-table candidates: same banding simHashDuplicates runs, with the
    // verify filter removed so the candidate mass itself is observable.
    // Each frame is checkpointed once so the distinct-count does not rerun
    // the banding + bucket self-join (the dominant cost at sf decades).
    val (singleCand, tSingleRaw) = timed(Dedup.simHashMultiTableCandidates(
      // blocks = maxHam+1 keyed on 1-block subsets IS the single-table
      // scheme (C(d+1, d) = d+1 tables of one block each)
      docs, "doc_id", "text", maxHam, maxHam + 1, Dedup.DefaultMaxBucketSize, false)
      .localCheckpoint(true))
    val singleRaw = singleCand.count()
    val (singleDistinct, _) =
      timed(singleCand.select("id_a", "id_b").distinct().count())
    val (multiCand, tMultiRaw) = timed(Dedup.simHashMultiTableCandidates(
      docs, "doc_id", "text", maxHam, 10, Dedup.DefaultMaxBucketSize, false)
      .localCheckpoint(true))
    val multiRaw = multiCand.count()
    val (multiDistinct, _) =
      timed(multiCand.select("id_a", "id_b").distinct().count())
    val (verifiedMulti, tMultiFull) = timed(Dedup.simHashDuplicatesMultiTable(
      docs, "doc_id", "text", maxHam, 10).count())
    // blocks = SimHashSingleTable forces the degraded arm: since r17 the
    // public surface AUTO-routes d >= 6 to multi-table, which would make
    // this A/B silently measure multi vs multi
    val (verifiedSingle, tSingleFull) = timed(Dedup.simHashDuplicates(
      docs, "doc_id", "text", maxHam, blocks = Dedup.SimHashSingleTable).count())
    // SPARK_GRAFT_GROUPS_MT=1: also time the collapse-first GROUPS path
    // routed through the multi-table scheme (blocks=10) — the consumer
    // shape that avoids materializing the quadratic pair set at d=8
    val (mtGroupRows, tMtGroups) =
      if (sys.env.get("SPARK_GRAFT_GROUPS_MT").contains("1"))
        timed(Dedup.simHashDuplicateGroups(docs, "doc_id", "text", maxHam,
          blocks = 10).count())
      else (-1L, -1.0)

    // Ground truth, driver-side brute force over the collected signatures
    // (n^2/2 popcounts — fine at bench corpus sizes). Both schemes verify
    // with exact popcount, so their outputs are SUBSETS of this; a shortfall
    // is the hot-bucket cap's star-link degradation, and the interesting
    // number is how much less of it the wider multi-table keys suffer
    // UNDER THE SAME CAP.
    // SPARK_GRAFT_BRUTE=0 skips it at corpus sizes where n^2/2 popcounts
    // stop being free (recall fields then read against -1)
    import graft.functions.{GraftFunctions => BF, TextFunctions => BT}
    val truePairs: Long =
      if (sys.env.get("SPARK_GRAFT_BRUTE").contains("0")) -1L
      else {
        val sigs = docs.select(col("doc_id"),
            BF.simhash64(BT.tokens(col("text")), portable = false).as("sim"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        var n = 0L
        var i = 0
        while (i < sigs.length) {
          var j = i + 1
          while (j < sigs.length) {
            if (java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) <= maxHam) n += 1
            j += 1
          }
          i += 1
        }
        n
      }

    // recall against the brute-force oracle; -1 when the oracle was skipped
    // (BRUTE=0) or found zero pairs (0/0 would print NaN — invalid JSON)
    def recallOf(verified: Long): Double =
      if (truePairs > 0) verified.toDouble / truePairs else -1.0

    val load = scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)
    println(s"""{"bench":"simhash_banding","sf_dir":"$sfDir","docs":$nDocs,""" +
      s""""max_hamming":$maxHam,"true_pairs":$truePairs,""" +
      s""""single":{"tables":${maxHam + 1},"raw_candidates":$singleRaw,""" +
      s""""distinct_candidates":$singleDistinct,"verified":$verifiedSingle,""" +
      s""""recall":${recallOf(verifiedSingle)},""" +
      s""""cand_sec":$tSingleRaw,"full_sec":$tSingleFull},""" +
      s""""multi":{"blocks":10,"tables":45,"raw_candidates":$multiRaw,""" +
      s""""distinct_candidates":$multiDistinct,"verified":$verifiedMulti,""" +
      s""""recall":${recallOf(verifiedMulti)},""" +
      s""""cand_sec":$tMultiRaw,"full_sec":$tMultiFull},""" +
      s""""mt_groups":{"rows":$mtGroupRows,"sec":$tMtGroups},""" +
      s""""load_end":$load}""")
    spark.stop()
  }
}
