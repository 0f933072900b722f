package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scaling evidence for the ANN family (VERDICT r4 next-step #9), the
  * similarity twin of [[DedupScaleBench]]: the sf0.1 ann gates run in
  * fractions of a second, so this harness synthesizes 1-50x embedding
  * corpora and measures what matters at 100 TB — the scored-pair counts
  * (brute force's rows x queries vs the LSH/IVF pruned joins) that prove
  * the pruning RATIO is scale-stable, wall-clock for each variant, and
  * recall@k against the exact answer at every scale.
  *
  * Corpus construction: replica `r` perturbs every dimension with a
  * deterministic sinusoid keyed by (vec_id, dim, r), so replicas are
  * pairwise-distinct vectors with the same overall geometry — corpus growth
  * adds genuine new points rather than exact duplicates (which would
  * collapse under cosine ties), and any super-linear candidate growth is
  * the operator's own doing.
  *
  * Emits one JSON line per scale; paste the table into BASELINE.md.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.AnnScaleBench"
  */
object AnnScaleBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,5,10,25,50")
      .split(",").map(_.trim.toInt).toSeq
    val k = 10
    val nQueries = 50
    // gate-family configs, widened for corpora past the gate's sf0.01: more
    // hyperplane bits / cells keep per-bucket work bounded as rows grow
    val (bits, tables) = (8, 8)
    val (nCells, nProbe) = (64, 8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val queries = base.where(col("vec_id") < nQueries).localCheckpoint(true)

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
    def args6(c: DataFrame) =
      (c, queries, "vec_id", "embedding", "vec_id", "embedding")

    // warm-up at scale 1: JIT/codegen charged here, not to the first scale
    {
      val (c, q, a, b, cc, d) = args6(corpus(1))
      Similarity.bruteForceTopK(c, q, a, b, cc, d, k).count()
      Similarity.lshTopK(c, q, a, b, cc, d, k, bits, multiProbe = true, tables).count()
      Similarity.ivfTopK(c, q, a, b, cc, d, k, nCells, nProbe).count()
      Similarity.pqTopK(c, q, a, b, cc, d, k, 16, 16, 5 * k, 4096, true).count()
      graft.operators.Hnsw.hnswTopK(c, q, a, b, cc, d, k,
        shards = 0, m = 8, efConstruction = 64, efSearch = 64).count()
    }

    scales.foreach { n =>
      val c = corpus(n).localCheckpoint(true) // measure ANN, not corpus synthesis
      val rows = c.count()
      val (_, qa, ia, va, qia, qva) = args6(c)

      def minOf2(f: => Long): Double = {
        val (_, t1) = timed(f); val (_, t2) = timed(f); math.min(t1, t2)
      }
      val bruteSec = minOf2(Similarity.bruteForceTopK(c, qa, ia, va, qia, qva, k).count())
      val lshSec = minOf2(Similarity.lshTopK(c, qa, ia, va, qia, qva, k, bits,
        multiProbe = true, tables).count())
      val ivfSec = minOf2(Similarity.ivfTopK(c, qa, ia, va, qia, qva, k, nCells, nProbe).count())
      // PQ: build once per scale (the deployment shape), then query twice;
      // ADC touches every (row, query) pair but at M=16 table lookups per
      // pair instead of a 64-dim float dot — its lever is bytes/FLOPs per
      // pair plus the 16 B/vector code table, not pair pruning
      val (pqIndex, pqBuildSec) = timed {
        val idx = Similarity.pqBuild(c, ia, va, m = 16, ks = 16)
        Similarity.PqIndex(idx.codebooks, idx.codes.localCheckpoint(true))
      }
      val pqSec = minOf2(Similarity.pqTopK(pqIndex, c, qa, ia, va, qia, qva,
        k, rerank = 5 * k).count())
      // HNSW: build once per scale (graph construction is the deployment
      // cost), query twice against the persisted-shape index; per-query
      // cost is shards x a ~log-n beam walk, so the QUERY time should stay
      // nearly flat while brute force grows linearly
      val (hnswIndex, hnswBuildSec) = timed {
        // shards = 0: the r12 auto-shard heuristic picks the count
        graft.operators.Hnsw.hnswBuild(c, ia, va,
          shards = 0, m = 8, efConstruction = 64).localCheckpoint(true)
      }
      val hnswSec = minOf2(graft.operators.Hnsw.hnswQuery(hnswIndex, qa,
        qia, qva, k, efSearch = 64).count())

      val brutePairs = rows * nQueries
      val lshPairs = Similarity.lshScoredPairs(c, qa, ia, va, qia, qva, bits,
        multiProbe = true, tables)
      val ivfPairs = Similarity.ivfScoredPairs(c, qa, ia, va, qia, qva, nCells, nProbe)

      // recall@k vs the exact answer (set intersection per query, averaged)
      val exact = Similarity.bruteForceTopK(c, qa, ia, va, qia, qva, k)
        .select(col("query_id"), col("nn_id")).localCheckpoint(true)
      def recall(approx: DataFrame): Double = {
        val hit = exact.join(approx.select(col("query_id"), col("nn_id")),
          Seq("query_id", "nn_id")).count()
        hit.toDouble / exact.count()
      }
      val lshRecall = recall(Similarity.lshTopK(c, qa, ia, va, qia, qva, k, bits,
        multiProbe = true, tables))
      val ivfRecall = recall(Similarity.ivfTopK(c, qa, ia, va, qia, qva, k, nCells, nProbe))
      val pqRecall = recall(Similarity.pqTopK(pqIndex, c, qa, ia, va, qia, qva,
        k, rerank = 5 * k))
      val hnswRecall = recall(graft.operators.Hnsw.hnswQuery(hnswIndex, qa,
        qia, qva, k, efSearch = 64))

      println(f"""{"scale":$n,"rows":$rows,"queries":$nQueries,""" +
        f""""brute_pairs":$brutePairs,"lsh_pairs":$lshPairs,"ivf_pairs":$ivfPairs,""" +
        f""""lsh_prune_x":${brutePairs.toDouble / math.max(lshPairs, 1)}%.1f,""" +
        f""""ivf_prune_x":${brutePairs.toDouble / math.max(ivfPairs, 1)}%.1f,""" +
        f""""brute_sec":$bruteSec%.3f,"lsh_sec":$lshSec%.3f,"ivf_sec":$ivfSec%.3f,""" +
        f""""pq_build_sec":$pqBuildSec%.3f,"pq_sec":$pqSec%.3f,""" +
        f""""lsh_recall":$lshRecall%.3f,"ivf_recall":$ivfRecall%.3f,""" +
        f""""pq_recall":$pqRecall%.3f,""" +
        f""""hnsw_build_sec":$hnswBuildSec%.3f,"hnsw_sec":$hnswSec%.3f,""" +
        f""""hnsw_recall":$hnswRecall%.3f}""")
    }
    spark.stop()
  }
}
