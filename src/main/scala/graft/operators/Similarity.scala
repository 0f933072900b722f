package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => F}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: the query set is the small side — it is broadcast, so the
  * corpus never shuffles for scoring; each corpus partition scores its rows
  * against all queries map-side (whole-stage codegen through
  * CosineSimilarity.doGenCode). Only (query_id, corpus_id, sim) survives to
  * the per-query top-k, which shuffles k*queries rows — independent of
  * corpus size. The IVF/LSH variant prunes the scored fraction: corpus rows
  * and queries get a coarse bucket map-side and only same-bucket pairs are
  * scored (multi-probe = the query also probes neighboring buckets).
  */
object Similarity {

  /** Brute-force exact top-k cosine neighbors for each query vector.
    * Deterministic tie-break on corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val scored = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("__cv"))
      .join(broadcast(queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("__qv"))))
      .where(if (excludeSelf) col("nn_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("nn_id"),
        F.cosine_similarity(col("__cv"), col("__qv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "nn_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: score only corpus rows in the query's hyperplane
    * bucket (plus all 1-bit-flip neighbor buckets when multiProbe). Recall
    * is tunable via bits/multiProbe; cost drops ~2^bits-fold.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, bits: Int = 6, multiProbe: Boolean = true,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("__cv"),
      F.lsh_bucket(col(vecCol), bits).as("bucket"))
    val qb = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("__qv"),
      F.lsh_bucket(col(qVecCol), bits).as("__qb"))
    val probes =
      if (multiProbe)
        qb.select(col("query_id"), col("__qv"), explode(
          array((lit(0) +: (0 until bits).map(b => lit(1 << b))).map(m => col("__qb").bitwiseXOR(m)): _*)
        ).as("bucket"))
      else qb.withColumnRenamed("__qb", "bucket")
    val scored = c.join(probes, Seq("bucket"))
      .where(if (excludeSelf) col("nn_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("nn_id"),
        F.cosine_similarity(col("__cv"), col("__qv")).as("cosine"))
      .groupBy("query_id", "nn_id").agg(max("cosine").as("cosine")) // dedup multi-probe hits
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "nn_id", "cosine", "rank")
  }

  /** Self-join variant: for every row, its nearest neighbor in the corpus. */
  def nearestNeighborJoin(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 1): DataFrame =
    bruteForceTopK(corpus, corpus.select(col(idCol), col(vecCol)),
      idCol, vecCol, idCol, vecCol, k)
}
