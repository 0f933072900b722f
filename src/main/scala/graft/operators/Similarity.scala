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

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nCells` cells; each query scores only the rows in its
    * `nProbe` nearest cells. The scale path when LSH recall is too blunt:
    * centroids are trained once on a sample (driver-side k-means on a few
    * thousand vectors), cell assignment is a map-side argmin against the
    * broadcast centroid array, and scoring shuffles nothing — only the
    * per-query top-k survives. Cost drops ~nCells/nProbe-fold vs brute force.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 3, sampleSize: Int = 4096,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    // 1. train the coarse quantizer on a sample (k-means|| via MLlib)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sample = corpus.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      .limit(sampleSize)
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(10).fit(sample)
    val centroids = model.clusterCenters.map(_.toArray)
    val bc = spark.sparkContext.broadcast(centroids)

    // 2. map-side cell assignment (argmin over broadcast centroids)
    val assignCell = udf { (v: Seq[Float]) =>
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val cc = cs(c)
        val n = math.min(cc.length, v.length)
        while (i < n) { val x = v(i) - cc(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val probeCells = udf { (v: Seq[Float]) =>
      val cs = bc.value
      cs.indices.map { c =>
        var d = 0.0; var i = 0
        val cc = cs(c)
        val n = math.min(cc.length, v.length)
        while (i < n) { val x = v(i) - cc(i); d += x * x; i += 1 }
        (c, d)
      }.sortBy(_._2).take(nProbe).map(_._1)
    }

    val cells = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("__cv"),
      assignCell(col(vecCol)).as("cell"))
    val probes = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("__qv"),
      explode(probeCells(col(qVecCol))).as("cell"))

    // 3. score within probed cells only; queries side broadcasts
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .where(if (excludeSelf) col("nn_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("nn_id"),
        F.cosine_similarity(col("__cv"), col("__qv")).as("cosine"))
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
