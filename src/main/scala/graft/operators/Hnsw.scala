package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ckpt.Ops
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** HNSW approximate nearest neighbors (Malkov & Yashunin '16), Spark-shaped
  * as SHARD-LOCAL graphs: the corpus hash-partitions into `shards`, each
  * shard builds its own hierarchical graph in one `mapPartitions` pass
  * (shards build in parallel, no cross-shard traffic), and a query probes
  * every shard's graph — per-shard cost is the graph search's ~log n, and
  * the merge is the same per-query top-k window the other ANN families use.
  * This is the standard distributed ANN serving layout (one sub-index per
  * shard, scatter-gather probe), so the build scales out with the corpus
  * and the probe fan-out is `shards`, not corpus size.
  *
  * Everything is DETERMINISTIC by construction, which is what lets the
  * `ann_hnsw` gate hash-check the half-oracle contract: insertion order is
  * ascending id within a shard, node levels derive from a splitmix64 hash
  * of the id (not an RNG), every heap comparator breaks ties on id, and
  * emitted cosines are computed exactly like the contract recompute
  * (double dot / norms over the raw float vectors).
  *
  * Index rows: (shard, id, vec, level, nbrs) with `nbrs(l)` = the node's
  * level-l adjacency — a plain DataFrame, parquet-persistable and
  * rehydratable ([[hnswQuery]] rebuilds each shard's graph from adjacency
  * alone, so a saved index serves queries with no rebuild).
  */
object Hnsw {

  final case class IndexRow(shard: Int, id: Long, vec: Array[Float],
      level: Int, nbrs: Seq[Seq[Long]])

  private val MaxLevel = 16

  /** splitmix64 → uniform in (0, 1]; the id IS the seed, so a node's level
    * never depends on partitioning or timing.
    */
  private def levelOf(id: Long, mL: Double): Int = {
    var z = id + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    val u = ((z >>> 11).toDouble + 1.0) / 9007199254740993.0 // (0,1]
    math.min(MaxLevel, (-math.log(u) * mL).toInt)
  }

  private def dotNorm(v: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Exact cosine, the contract arithmetic: double products over floats. */
  private def cosine(a: Array[Float], na: Double, b: Array[Float], nb: Double): Double = {
    val d = na * nb
    if (d == 0.0) return 0.0
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s / d
  }

  /** One shard's graph, built or rehydrated. */
  private final class Graph(val ids: Array[Long], val vecs: Array[Array[Float]],
      val norms: Array[Double], val levels: Array[Int],
      val nbrs: Array[Array[mutable.ArrayBuffer[Int]]]) {
    var entry: Int = -1 // node index with the highest level (ties: smallest id)

    def cos(q: Array[Float], qn: Double, i: Int): Double = cosine(q, qn, vecs(i), norms(i))

    /** Greedy single-entry descent at `level`. */
    def greedy(q: Array[Float], qn: Double, start: Int, level: Int): Int = {
      var cur = start
      var curSim = cos(q, qn, cur)
      var improved = true
      while (improved) {
        improved = false
        val adj = nbrs(cur)(level)
        var j = 0
        while (j < adj.length) {
          val c = adj(j)
          val s = cos(q, qn, c)
          if (s > curSim || (s == curSim && ids(c) < ids(cur))) {
            cur = c; curSim = s; improved = true
          }
          j += 1
        }
      }
      cur
    }

    /** Best-first beam search at `level`: the ef most similar reachable
      * nodes, deterministic (all orderings tie-break on id).
      */
    def searchLayer(q: Array[Float], qn: Double, start: Int, ef: Int,
        level: Int): mutable.ArrayBuffer[(Double, Int)] = {
      // candidates: best-similarity-first; results: worst-first for eviction
      implicit val byBest: Ordering[(Double, Int)] =
        Ordering.by[(Double, Int), (Double, Long)](t => (t._1, -ids(t._2)))
      val cand = mutable.PriorityQueue[(Double, Int)]()
      val res = mutable.PriorityQueue[(Double, Int)]()(byBest.reverse)
      val seen = mutable.HashSet[Int]()
      val s0 = cos(q, qn, start)
      cand.enqueue((s0, start)); res.enqueue((s0, start)); seen += start
      while (cand.nonEmpty) {
        val (cs, c) = cand.dequeue()
        val worst = res.head._1
        if (cs < worst && res.size >= ef) { cand.clear() }
        else {
          val adj = nbrs(c)(level)
          var j = 0
          while (j < adj.length) {
            val n = adj(j)
            if (seen.add(n)) {
              val s = cos(q, qn, n)
              if (res.size < ef || s > res.head._1 ||
                  (s == res.head._1 && ids(n) < ids(res.head._2))) {
                cand.enqueue((s, n)); res.enqueue((s, n))
                if (res.size > ef) res.dequeue()
              }
            }
            j += 1
          }
        }
      }
      val out = mutable.ArrayBuffer[(Double, Int)]()
      out ++= res
      // best first, deterministic
      out.sortInPlace()(Ordering.by[(Double, Int), (Double, Long)](t => (-t._1, ids(t._2))))
      out
    }
  }

  private def buildGraph(rows: Array[(Long, Array[Float])], m: Int,
      efConstruction: Int): Graph = {
    val mL = 1.0 / math.log(m.toDouble)
    val n = rows.length
    val g = new Graph(rows.map(_._1), rows.map(_._2), rows.map(r => dotNorm(r._2)),
      rows.map(r => levelOf(r._1, mL)),
      Array.tabulate(n)(i => Array.fill(levelOf(rows(i)._1, mL) + 1)(mutable.ArrayBuffer[Int]())))
    if (n == 0) return g
    g.entry = 0
    var topLevel = g.levels(0)
    var i = 1
    while (i < n) {
      val q = g.vecs(i); val qn = g.norms(i); val lvl = g.levels(i)
      var ep = g.entry
      var l = topLevel
      while (l > lvl) { ep = g.greedy(q, qn, ep, l); l -= 1 }
      l = math.min(lvl, topLevel)
      while (l >= 0) {
        val w = g.searchLayer(q, qn, ep, efConstruction, l)
        val mMax = if (l == 0) 2 * m else m
        val chosen = w.take(m)
        chosen.foreach { case (_, c) =>
          g.nbrs(i)(l) += c
          g.nbrs(c)(l) += i
          if (g.nbrs(c)(l).length > mMax) {
            // prune to the mMax most similar (ties: smaller id)
            val kept = g.nbrs(c)(l).toArray
              .map(x => (g.cos(g.vecs(c), g.norms(c), x), x))
              .sortBy(t => (-t._1, g.ids(t._2)))
              .take(mMax).map(_._2)
            g.nbrs(c)(l).clear()
            g.nbrs(c)(l) ++= kept
          }
        }
        ep = w.head._2
        l -= 1
      }
      if (lvl > topLevel) { topLevel = lvl; g.entry = i }
      i += 1
    }
    g
  }

  private def rehydrate(rows: Array[IndexRow]): Graph = {
    val sorted = rows.sortBy(_.id)
    val pos = sorted.iterator.zipWithIndex.map { case (r, i) => r.id -> i }.toMap
    val g = new Graph(sorted.map(_.id), sorted.map(_.vec), sorted.map(r => dotNorm(r.vec)),
      sorted.map(_.level),
      sorted.map(r => r.nbrs.map(l => mutable.ArrayBuffer(l.map(pos): _*)).toArray))
    if (sorted.nonEmpty) {
      val top = sorted.map(_.level).max
      g.entry = sorted.indices.filter(i => g.levels(i) == top).minBy(i => g.ids(i))
    }
    g
  }

  /** Default for [[hnswBuild]]'s auto-shard heuristic: a shard's whole row
    * set materializes in ONE build task (vectors + adjacency — ~350 B/row
    * at 64-dim float vectors and m=8), so rows-per-shard is the executor
    * memory bound; 250k rows ≈ 90 MB of graph per task.
    */
  val DefaultTargetRowsPerShard = 250000L

  /** Auto-sharding never splits below this many rows per shard: a probe
    * fans out to EVERY shard and tiny graphs have no small-world structure,
    * so over-sharding a small corpus costs recall and probe time for no
    * memory benefit.
    */
  val MinRowsPerShard = 4096L

  /** Build the sharded index. One hash shuffle of (id, vec), then each
    * shard builds independently; the result is a plain DataFrame
    * (shard, id, vec, level, nbrs) — write it to parquet for a serving
    * index, [[hnswQuery]] rehydrates per shard from adjacency alone.
    *
    * `shards = 0` (the default) auto-sizes from a corpus count: the larger
    * of the MEMORY floor (`targetRowsPerShard` rows per build task — the
    * reason shards exist) and the cluster-parallelism target (so a medium
    * corpus still builds on every core), the latter capped so shards never
    * shrink below [[MinRowsPerShard]] rows. The caller no longer has to
    * know that shards are the memory lever to scale past a fixed default.
    */
  def hnswBuild(corpus: DataFrame, idCol: String, vecCol: String,
      shards: Int = 0, m: Int = 8, efConstruction: Int = 64,
      targetRowsPerShard: Long = DefaultTargetRowsPerShard): DataFrame = {
    require(shards >= 0 && m >= 2 && efConstruction >= m && targetRowsPerShard >= 1)
    val spark = corpus.sparkSession
    import spark.implicits._
    val nShards =
      if (shards > 0) shards
      else {
        val n = corpus.count()
        val memoryFloor = (n + targetRowsPerShard - 1) / targetRowsPerShard
        val parallelism = math.min(spark.sparkContext.defaultParallelism.toLong,
          (n + MinRowsPerShard - 1) / MinRowsPerShard)
        math.max(1L, math.max(memoryFloor, parallelism)).min(Int.MaxValue).toInt
      }
    corpus.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"),
        pmod(hash(col(idCol)), lit(nShards)).as("shard"))
      .as[(Long, Array[Float], Int)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        // ascending-id insertion makes the graph independent of upstream
        // partitioning; the shard's whole row set materializes in one task
        // (sub-indexes are sized by the shard count, the scale lever)
        val rows = it.toArray.sortBy(_._1)
        val g = buildGraph(rows.map(r => (r._1, r._2)), m, efConstruction)
        g.ids.indices.iterator.map { i =>
          IndexRow(shard, g.ids(i), g.vecs(i), g.levels(i),
            g.nbrs(i).map(_.map(x => g.ids(x)).toSeq).toSeq)
        }
      }
      .toDF()
  }

  /** Probe every shard's graph for each query and merge to a global top-k:
    * (query_id, nn_id, cosine, rank) — the family-standard output, exact
    * cosines, (cosine desc, nn_id asc) order. `efSearch` is the level-0
    * beam width (recall knob).
    *
    * The query set is collected and BROADCAST — the serving-batch shape.
    * Past `maxQueryBatch` queries the collect would hold a corpus-sized
    * array on the driver, so the set instead streams through
    * `toLocalIterator` in chunks of `maxQueryBatch`. Chunks execute
    * STRICTLY SEQUENTIALLY: each chunk's top-k is materialized (an
    * executor-local checkpoint) and its query broadcast destroyed before
    * the next chunk's is created, so the driver holds ONE chunk's queries
    * at a time and the final union is a scan over materialized results —
    * not N live probe plans with N resident broadcasts. Chunking still
    * rehydrates the shard graphs once PER CHUNK: persist the index frame
    * before a chunked call, and if the "queries" are really a second
    * corpus, the banded/bucketed ANN family is the right tool, not a
    * broadcast probe.
    */
  def hnswQuery(index: DataFrame, queries: DataFrame,
      qIdCol: String, qVecCol: String, k: Int, efSearch: Int = 48,
      excludeSelf: Boolean = true, maxQueryBatch: Int = 65536): DataFrame = {
    require(maxQueryBatch >= 1)
    val spark = index.sparkSession
    import spark.implicits._
    val qds = queries.select(col(qIdCol).cast("long"), col(qVecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
    val ef = math.max(efSearch, k)
    def probe(qb: org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Float])]]): DataFrame = {
      index.as[IndexRow]
        .groupByKey(_.shard)
        .flatMapGroups { (_, it) =>
          val g = rehydrate(it.toArray)
          if (g.ids.isEmpty) Iterator.empty
          else qb.value.iterator.flatMap { case (qid, qv) =>
            val qn = dotNorm(qv)
            var ep = g.entry
            var l = g.levels(ep)
            while (l > 0) { ep = g.greedy(qv, qn, ep, l); l -= 1 }
            g.searchLayer(qv, qn, ep, ef, 0).iterator
              .filter { case (_, i) => !excludeSelf || g.ids(i) != qid }
              .take(k)
              .map { case (s, i) => (qid, g.ids(i), s) }
          }
        }
        .toDF("query_id", "nn_id", "cosine")
    }
    // chunks partition the query-id space, so the per-query rank window is
    // exact when applied within a chunk — the global answer is the union
    def topk(perShard: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("nn_id").asc)
      perShard.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select("query_id", "nn_id", "cosine", "rank")
    }
    // one bounded job decides the shape: a serving batch probes in one
    // broadcast; an oversized set falls to the chunked path (queries are
    // independent, so chunk membership cannot change any result)
    val head = qds.limit(maxQueryBatch + 1).collect()
    if (head.length <= maxQueryBatch) {
      val qb = spark.sparkContext.broadcast(head.sortBy(_._1))
      topk(probe(qb))
    } else {
      qds.toLocalIterator().asScala.grouped(maxQueryBatch).map { c =>
        val qb = spark.sparkContext.broadcast(c.toArray.sortBy(_._1))
        // eager executor-local checkpoint runs the chunk's scatter-gather
        // NOW; the broadcast is then destroyed before the next chunk's is
        // built, bounding resident driver memory to one chunk
        val out = topk(probe(qb)).cut(true)
        qb.destroy()
        out
      }.reduce(_ unionByName _)
    }
  }

  /** Build + query in one call (the gate shape). */
  def hnswTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, shards: Int = 0, m: Int = 8, efConstruction: Int = 64,
      efSearch: Int = 48, excludeSelf: Boolean = true): DataFrame =
    hnswQuery(hnswBuild(corpus, idCol, vecCol, shards, m, efConstruction),
      queries, qIdCol, qVecCol, k, efSearch, excludeSelf)
}
