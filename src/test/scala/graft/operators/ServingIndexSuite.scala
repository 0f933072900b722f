package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

/** End-to-end proof of the documented serving-index persistence story:
  * "persist the index bucketed via [[Bucketing]] -> probes become
  * shuffle-free bucket lookups across restarts". Each index family
  * (LSH / IVF / ingest) is written as a bucketed table, rehydrated with its
  * `*From*` constructor, asserted IDENTICAL to the fresh build, and the
  * probe/candidate join is asserted exchange-free on the bucketed side.
  */
class ServingIndexSuite extends SparkTestBase {

  private def emb = QueryPack.t(spark, sf(), "embeddings")
  private def docs = QueryPack.t(spark, sf(), "documents")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Count real shuffle exchanges in the (pre-execution) physical plan —
    * Broadcast/Reused exchanges excluded on purpose: a broadcast of the
    * small probe side IS the shuffle-free plan the claim is about.
    */
  private def shuffleExchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r.findAllIn(df.queryExecution.executedPlan.toString).length

  private def withoutAutoBroadcast[A](body: => A): A = {
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
  }

  test("LSH index: bucketed round-trip is identical and probes shuffle only the probe side") {
    val idx = Similarity.lshBuild(emb, "vec_id", "embedding", bits = 5, tables = 4)
    spark.sql("DROP TABLE IF EXISTS srv_lsh_banded")
    try {
      Bucketing.writeBucketed(idx.banded, "srv_lsh_banded", Seq("table", "bucket"),
        buckets = 8, sorted = true, mode = org.apache.spark.sql.SaveMode.Overwrite)
      val re = Similarity.lshFromBanded(5, 4, spark.table("srv_lsh_banded"))
      val q = emb.where(col("vec_id") < 10)
      assert(rows(Similarity.lshQuery(re, q, "vec_id", "embedding", k = 5)) ==
        rows(Similarity.lshQuery(idx, q, "vec_id", "embedding", k = 5)))
      // with broadcast disabled the candidate join must still leave the
      // bucketed corpus side in place: exactly ONE hash exchange (the probe
      // side re-clustering), zero on the banded scan
      withoutAutoBroadcast {
        val cand = Similarity.lshQueryCandidates(re, q, "vec_id", "embedding",
          multiProbe = true, excludeSelf = true)
        val n = shuffleExchanges(cand)
        assert(n == 1, s"banded side must not shuffle (found $n hash exchanges):\n" +
          cand.queryExecution.executedPlan)
        // the fresh (un-persisted) build pays one MORE exchange for the same
        // join — that delta is exactly what persisting bucketed buys
        val fresh = Similarity.lshQueryCandidates(idx, q, "vec_id", "embedding",
          multiProbe = true, excludeSelf = true)
        assert(shuffleExchanges(fresh) == 2, s"expected the fresh build to shuffle both sides:\n" +
          fresh.queryExecution.executedPlan)
      }
    } finally spark.sql("DROP TABLE IF EXISTS srv_lsh_banded")
  }

  test("IVF index: bucketed round-trip is identical and cells never shuffle for probes") {
    val idx = Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8)
    spark.sql("DROP TABLE IF EXISTS srv_ivf_cells")
    try {
      Bucketing.writeBucketed(idx.cells, "srv_ivf_cells", "cell", buckets = 8)
      val re = Similarity.ivfFromCells(idx.centroids, spark.table("srv_ivf_cells"))
      val q = emb.where(col("vec_id") < 10)
      assert(rows(Similarity.ivfQuery(re, q, "vec_id", "embedding", k = 5, nProbe = 4)) ==
        rows(Similarity.ivfQuery(idx, q, "vec_id", "embedding", k = 5, nProbe = 4)))
      // probes broadcast by construction: the cells table takes NO hash
      // exchange at all, bucketed or not — bucketing here buys layout reuse
      // for other consumers, the probe path is already shuffle-free
      val cand = Similarity.ivfQueryCandidates(re, q, "vec_id", "embedding",
        nProbe = 4, excludeSelf = true)
      val n = shuffleExchanges(cand)
      assert(n == 0, s"cells must not shuffle for probes (found $n):\n" +
        cand.queryExecution.executedPlan)
    } finally spark.sql("DROP TABLE IF EXISTS srv_ivf_cells")
  }

  test("ingest index: bucketed round-trip is identical and the candidate join is exchange-free on the corpus side") {
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val fresh = docs.where(col("doc_id") % 2 === 1).limit(50)
    val idx = Dedup.ingestIndexBuild(corpus, "doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS srv_ing_hashes")
    spark.sql("DROP TABLE IF EXISTS srv_ing_banded")
    try {
      Bucketing.writeBucketed(idx.hashes, "srv_ing_hashes", "__h", buckets = 8)
      Bucketing.writeBucketed(idx.banded, "srv_ing_banded", Seq("band", "bucket"),
        buckets = 8, sorted = true, mode = org.apache.spark.sql.SaveMode.Overwrite)
      val re = Dedup.ingestIndexFrom(3, 128, 32,
        spark.table("srv_ing_hashes"), spark.table("srv_ing_banded"))
      assert(rows(Dedup.incrementalDedup(re, corpus, fresh, "doc_id", "text", 0.7)
          .select("doc_id")) ==
        rows(Dedup.incrementalDedup(idx, corpus, fresh, "doc_id", "text", 0.7)
          .select("doc_id")))
      withoutAutoBroadcast {
        val newBanded = Dedup.minHashBanded(fresh, "doc_id", "text", 3, 128, 32)
          .withColumnRenamed("id", "id_new")
        val cand = spark.table("srv_ing_banded").select("band", "bucket", "id")
          .join(newBanded, Seq("band", "bucket"))
        val n = shuffleExchanges(cand)
        assert(n == 1, s"persisted corpus banding must not shuffle (found $n):\n" +
          cand.queryExecution.executedPlan)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS srv_ing_hashes")
      spark.sql("DROP TABLE IF EXISTS srv_ing_banded")
    }
  }
}
