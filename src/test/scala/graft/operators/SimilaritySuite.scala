package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

class SimilaritySuite extends SparkTestBase {

  private def emb = QueryPack.t(spark, sf(), "embeddings")

  test("ivf top-k achieves high recall vs brute force") {
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 3)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"ivf recall too low: $recall") // 3/8 cells probed
    // more probes -> higher recall, monotone sanity
    val ivfAll = Similarity.ivfTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 8)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfAll == exact, "probing every cell must equal brute force")
  }

  test("lsh top-k recall is tunable via multiProbe") {
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, bits = 6, multiProbe = true)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.3, s"multi-probe lsh recall too low: $recall")
  }

  test("multi-table lsh reaches recall >= 0.9 vs brute force") {
    // the ground-truth check behind the rows-only ann_lsh gate: with enough
    // independent tables recall approaches 1 (1-(1-p)^T)
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, bits = 6, multiProbe = true, tables = 12)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"multi-table lsh recall too low: $recall")
  }

  test("ivf recall at the ann_ivf gate config is >= 0.9") {
    // ground truth behind the rows-only ann_ivf gate (same parameters)
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"ivf recall at gate config too low: $recall")
  }
}
