package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scaling evidence for incremental ingest dedup: a FIXED new batch deduped
  * against corpora grown 1-25x. The claim under test is the ingest shape's
  * whole point — per-batch cost must track the BATCH, not the corpus:
  * the direct operator pays one corpus banding pass per call (linear in
  * corpus, unavoidable without state), while the prebuilt IngestIndex
  * amortizes that pass into a one-time build and the per-batch query cost
  * stays near-flat. Replica construction mirrors DedupScaleBench (token
  * suffixing keeps replicas internally near-dup-structured but cross-replica
  * disjoint), and the batch is the base documents re-suffixed to collide
  * with replica 0 only — so the true conviction set is scale-invariant and
  * any cost growth is the operator's own.
  *
  * Emits one JSON line per scale; paste the table into BASELINE.md.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IngestScaleBench"
  */
object IngestScaleBench {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,5,10,25")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    def suffixed(df: DataFrame, r: Int, idOffset: Long): DataFrame =
      df.select((col("doc_id") + lit(idOffset)).as("doc_id"),
        regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1x$r").as("text"))

    def corpus(k: Int): DataFrame =
      (0 until k).map(r => suffixed(base, r, r.toLong * 10000000L))
        .reduce(_ unionByName _)
    // batch: a third EXACT copies of replica 0 (die at the md5 stage), a
    // third NEAR-dups (replica-0 text + one appended token -> the LSH +
    // verify path does real work), a third UNIQUE (suffix no replica has).
    // The true triage is scale-invariant by construction.
    val exactPart = suffixed(base.where(col("doc_id") % 3 === 0), 0, 900000000L)
    val nearPart = suffixed(base.where(col("doc_id") % 3 === 1), 0, 910000000L)
      .withColumn("text", concat(col("text"), lit(" appendedtail")))
    val uniquePart = suffixed(base.where(col("doc_id") % 3 === 2), 999, 920000000L)
    val batch = exactPart.unionByName(nearPart).unionByName(uniquePart)
      .localCheckpoint(true)
    val batchRows = batch.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm-up
    Dedup.incrementalDedup(corpus(1), batch, "doc_id", "text", threshold = 0.7).count()

    scales.foreach { k =>
      val c = corpus(k).localCheckpoint(true)
      val corpusRows = c.count()
      def minOf2(f: => Long): (Long, Double) = {
        val (n, t1) = timed(f); val (_, t2) = timed(f); (n, math.min(t1, t2))
      }
      val (survivors, directSec) = minOf2(
        Dedup.incrementalDedup(c, batch, "doc_id", "text", threshold = 0.7).count())
      val (index, buildSec) = timed {
        val idx = Dedup.ingestIndexBuild(c, "doc_id", "text")
        // materialize what a deployment would persist
        Dedup.IngestIndex(idx.shingleSize, idx.numHashes, idx.bands,
          idx.hashes.localCheckpoint(true), idx.banded.localCheckpoint(true))
      }
      val (survivorsIdx, idxSec) = minOf2(
        Dedup.incrementalDedup(index, c, batch, "doc_id", "text", 0.7).count())
      require(survivors == survivorsIdx,
        s"index/direct disagree at scale $k: $survivors vs $survivorsIdx")
      val (bloom, bloomBuildSec) = timed(Dedup.ingestBloomBuild(index))
      val (survivorsBloom, bloomSec) = minOf2(
        Dedup.incrementalDedup(index, c, batch, "doc_id", "text", 0.7, Some(bloom)).count())
      require(survivors == survivorsBloom,
        s"bloom/direct disagree at scale $k: $survivors vs $survivorsBloom")
      println(f"""{"scale":$k,"corpus_rows":$corpusRows,"batch_rows":$batchRows,""" +
        f""""survivors":$survivors,"direct_sec":$directSec%.3f,""" +
        f""""index_build_sec":$buildSec%.3f,"index_query_sec":$idxSec%.3f,""" +
        f""""bloom_build_sec":$bloomBuildSec%.3f,"bloom_bytes":${bloom.length},""" +
        f""""bloom_query_sec":$bloomSec%.3f}""")
    }
    spark.stop()
  }
}
