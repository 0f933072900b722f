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

  test("lsh recall at the ann_lsh gate config is >= 0.9") {
    // ground truth behind the rows-only ann_lsh gate — SAME parameters as the
    // gate (bits=6, multiProbe, tables=12; see Pipeline.scala ann_lsh): with
    // enough independent tables recall approaches 1 (1-(1-p)^T)
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, bits = 6, multiProbe = true, tables = 12)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"multi-table lsh recall too low: $recall")
  }

  test("ivfBuild + ivfQuery equals ivfTopK, and the index serves repeat batches") {
    val q = emb.where(col("vec_id") < 20)
    val oneShot = Similarity.ivfTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 3)
      .collect().map(_.toString).sorted.toSeq
    val index = Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8)
    val viaIndex = Similarity.ivfQuery(index, q, "vec_id", "embedding", k = 5, nProbe = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex == oneShot)
    // build-once / query-many: a second, different batch against the SAME
    // index matches a fresh one-shot run (training is seeded-deterministic,
    // so equality proves the reused assignment serves both batches)
    val q2 = emb.where(col("vec_id") >= 20 && col("vec_id") < 35)
    val viaIndex2 = Similarity.ivfQuery(index, q2, "vec_id", "embedding", k = 5, nProbe = 3)
      .collect().map(_.toString).sorted.toSeq
    val oneShot2 = Similarity.ivfTopK(emb, q2, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex2 == oneShot2)
    // persistence round-trip: cells written to parquet and rehydrated with
    // the same centroids answer identically
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-cells").toString
    index.cells.write.mode("overwrite").parquet(dir)
    val rehydrated = Similarity.ivfFromCells(index.centroids, spark.read.parquet(dir))
    val viaDisk = Similarity.ivfQuery(rehydrated, q, "vec_id", "embedding", k = 5, nProbe = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(viaDisk == oneShot)
  }

  test("lshBuild + lshQuery equals lshTopK, including a persisted banded index") {
    val q = emb.where(col("vec_id") < 20)
    val oneShot = Similarity.lshTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, bits = 6, multiProbe = true, tables = 4)
      .collect().map(_.toString).sorted.toSeq
    val index = Similarity.lshBuild(emb, "vec_id", "embedding", bits = 6, tables = 4)
    val viaIndex = Similarity.lshQuery(index, q, "vec_id", "embedding", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex == oneShot)
    // parquet round-trip of the banded table serves identically (the
    // hyperplanes are deterministic in bits/tables, so only the table and
    // config need to survive)
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-banded").toString
    index.banded.write.mode("overwrite").parquet(dir)
    val rehydrated = Similarity.lshFromBanded(6, 4, spark.read.parquet(dir))
    val viaDisk = Similarity.lshQuery(rehydrated, q, "vec_id", "embedding", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(viaDisk == oneShot)
  }

  test("ivf model build runs exactly one job (no corpus count)") {
    // bind the reads BEFORE the listener: spark.read.parquet runs its own
    // file-listing job, which is not part of the model build under test
    val e = emb
    val q = e.where(col("vec_id") < 20)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    // AQE runs each query stage as its own job, which would make the count
    // a stage count — pin it off so jobs == actions for this probe
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // ivfTopK is lazy except for quantizer training: the seeded
      // TakeOrdered sample-collect is the ONE eager job — the old
      // corpus.count() (a full scan on JDBC/USL-backed corpora) is gone
      Similarity.ivfTopK(e, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 6)
      // listener events are async: wait until the counter stops moving
      var last = -1
      var spins = 0
      while (counter.get() != last && spins < 50) {
        last = counter.get(); Thread.sleep(100); spins += 1
      }
      assert(counter.get() == 1, s"model build must be one sample job, ran ${counter.get()}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("ivf recall at the ann_ivf gate config is >= 0.9") {
    // ground truth behind the rows-only ann_ivf gate — SAME parameters as the
    // gate (nCells=8, nProbe=6; see Pipeline.scala ann_ivf). The whole IVF
    // pipeline is seeded+sorted, so this recall is deterministic, not a flake.
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 6)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"ivf recall at gate config too low: $recall")
  }

  // ---- product quantization ----

  test("pq recall at the ann_pq gate config is >= 0.9; full shortlist equals brute force") {
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // SAME parameters as the ann_pq gate (m=16, ks=16, rerank=50)
    val pq = Similarity.pqTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, m = 16, ks = 16, rerank = 50, sampleSize = 4096, excludeSelf = true)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(pq).size.toDouble / exact.size
    assert(recall >= 0.9, s"pq recall at gate config too low: $recall")
    // shortlisting the whole corpus makes the exact re-rank equal brute force
    val all = Similarity.pqTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, m = 16, ks = 16, rerank = 100000, sampleSize = 4096, excludeSelf = true)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == exact, "full-shortlist PQ must equal brute force")
  }

  test("pqBuild + pqTopK equals the one-shot operator, and codes persist") {
    val q = emb.where(col("vec_id") < 10)
    val index = Similarity.pqBuild(emb, "vec_id", "embedding", m = 8, ks = 16)
    val viaIndex = Similarity.pqTopK(index, emb, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val oneShot = Similarity.pqTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, m = 8, ks = 16, rerank = 40, sampleSize = 4096, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(viaIndex == oneShot)
    // parquet round-trip of the codes table
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    index.codes.write.mode("overwrite").parquet(s"$dir/codes")
    val rehydrated = Similarity.pqFromCodes(index.codebooks,
      spark.read.parquet(s"$dir/codes"))
    val viaDisk = Similarity.pqTopK(rehydrated, emb, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(viaDisk == oneShot)
    // the compression claim: m integer codes per row, values within [0, ks)
    val codes = index.codes.collect()
    assert(codes.forall(_.getSeq[Int](1).length == 8))
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 16)))
  }

  test("ivf x pq: recall at the ann_ivfpq gate config; all-cells full shortlist is exact") {
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = Similarity.ivfPqBuild(emb, "vec_id", "embedding",
      nCells = 8, m = 16, ks = 16)
    // SAME parameters as the ann_ivfpq gate (nProbe=6, rerank=100)
    val approx = Similarity.ivfPqTopK(index, emb, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, nProbe = 6, rerank = 100)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"ivfpq recall at gate config too low: $recall")
    // probing every cell with an unbounded shortlist must equal brute force
    val all = Similarity.ivfPqTopK(index, emb, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, nProbe = 8, rerank = 100000)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == exact, "all-cells full-shortlist IVFxPQ must equal brute force")
    // persistence round-trip of the one-table (nn_id, cell, codes) layout
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    index.cells.write.mode("overwrite").parquet(dir)
    val rehydrated = Similarity.ivfPqFromCells(index.centroids, index.codebooks,
      spark.read.parquet(dir))
    val viaDisk = Similarity.ivfPqTopK(rehydrated, emb, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, nProbe = 6, rerank = 100)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDisk == approx)
  }

  test("residual IVFADC: recall at gate config, exactness, ADC fidelity, persistence") {
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = Similarity.ivfPqBuild(emb, "vec_id", "embedding", nCells = 8, m = 16, ks = 16)
    val res = Similarity.ivfPqBuild(emb, "vec_id", "embedding", nCells = 8, m = 16, ks = 16,
      residual = true)
    def recallOf(idx: Similarity.IvfPqIndex, rerank: Int) = {
      val got = Similarity.ivfPqTopK(idx, emb, q, "vec_id", "embedding",
          "vec_id", "embedding", k = 5, nProbe = 6, rerank = rerank)
        .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    assert(recallOf(res, 100) >= 0.9, "residual recall at gate config too low")
    assert(recallOf(plain, 100) >= 0.9, "plain recall at gate config too low")
    // all cells + full shortlist: exact re-rank makes it brute force
    val all = Similarity.ivfPqTopK(res, emb, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, nProbe = 8, rerank = 100000)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == exact)
    // persistence keeps the residual flag's semantics
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfadc").toString
    res.cells.write.mode("overwrite").parquet(dir)
    val back = Similarity.ivfPqFromCells(res.centroids, res.codebooks,
      spark.read.parquet(dir), residual = true)
    val viaDisk = Similarity.ivfPqTopK(back, emb, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, nProbe = 6, rerank = 100)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inMem = Similarity.ivfPqTopK(res, emb, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, nProbe = 6, rerank = 100)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDisk == inMem)
  }

  test("residual codes rank tighter than plain codes on a clustered corpus") {
    import spark.implicits._
    // The IVFADC argument: residual spread << vector spread holds when the
    // data is CLUSTERED (cells absorb the structure); the near-uniform test
    // embeddings do not reward it, so build the clustered case explicitly —
    // 8 well-separated centers, points = center + small deterministic noise.
    val rnd = new java.util.Random(7L)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 1600).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.indices.map(j => (c(j) + 0.15 * rnd.nextGaussian()).toFloat).toArray)
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def tightRecall(residual: Boolean) = {
      val idx = Similarity.ivfPqBuild(df, "vec_id", "embedding",
        nCells = 8, m = 16, ks = 16, residual = residual)
      // rerank = k: zero slack, ADC ranking quality is exactly what is measured
      val got = Similarity.ivfPqTopK(idx, df, q, "vec_id", "embedding",
          "vec_id", "embedding", k = 5, nProbe = 3, rerank = 5)
        .select("query_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val plain = tightRecall(residual = false)
    val res = tightRecall(residual = true)
    assert(res > plain,
      s"residual ADC must rank tighter on clustered data: residual=$res plain=$plain")
  }

  test("pq expressions never throw on degenerate inputs") {
    import graft.functions.{GraftFunctions => F}
    import spark.implicits._
    val books = Similarity.pqBuild(emb, "vec_id", "embedding", m = 8, ks = 16).codebooks
    // empty vector, zero vector, too-short and too-long vectors: encode must
    // stay total (zero-padded subspaces, zero-norm short-circuit)
    val weird = Seq(
      (1L, Array.empty[Float]),
      (2L, Array.fill(64)(0.0f)),
      (3L, Array.fill(3)(1.0f)),
      (4L, Array.fill(200)(0.5f))).toDF("vec_id", "embedding")
    val codes = weird.select(col("vec_id"), F.pq_encode(col("embedding"), books).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == 4)
    assert(codes.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // lut scoring with malformed code arrays: short, long, out-of-range —
    // out-of-range indexes are skipped, never thrown on
    val luts = Map(7L -> books.map(_.map(_ => 1.0)))
    val mal = Seq(
      (7L, Array(0, 1)),                      // short
      (7L, Array.fill(20)(2)),                // long
      (7L, Array(99, -1, 3, 3, 3, 3, 3, 3))). // out of range
      toDF("qid", "codes")
    val scores = mal.select(F.pq_lut_score(col("codes"), col("qid"), luts).as("s"))
      .collect().map(_.getDouble(0))
    assert(scores(0) == 2.0)  // 2 valid lookups of 1.0
    assert(scores(1) == 8.0)  // capped at m = 8 lookups
    assert(scores(2) == 6.0)  // 2 invalid indexes skipped
  }

  test("pq_encode codegen matches interpreted eval; unknown query id scores null") {
    import graft.functions.{GraftFunctions => F}
    val index = Similarity.pqBuild(emb, "vec_id", "embedding", m = 8, ks = 16)
    // interpreted path (eval) via a local relation collect with codegen off
    val withCodes = emb.select(col("vec_id"),
      F.pq_encode(col("embedding"), index.codebooks).as("codes"))
    val gen = withCodes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = withCodes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(gen == interp, "codegen and interpreted pq_encode disagree")
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // unknown qid -> null score (both paths)
    val luts = Map(1L -> index.codebooks.map(_.map(_ => 0.5)))
    val out = withCodes.limit(3)
      .select(F.pq_lut_score(col("codes"), lit(999L).cast("long"), luts).as("s"))
      .collect()
    assert(out.forall(_.isNullAt(0)), "unknown query id must score null")
  }

  test("hnsw top-k recall vs brute force at the gate config; exact emitted cosines") {
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
        "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hnsw = Hnsw.hnswTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 5, shards = 4, m = 8, efConstruction = 64, efSearch = 48)
      .collect()
    val pairs = hnsw.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(pairs).size.toDouble / exact.size
    assert(recall >= 0.9, s"hnsw recall too low: $recall")
    // per query exactly k results, ranked (cosine desc, nn_id asc)
    val byQ = hnsw.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length == 5))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getDouble(2) > b.getDouble(2) ||
          (a.getDouble(2) == b.getDouble(2) && a.getLong(1) < b.getLong(1)))
      }
    }
  }

  test("hnsw is deterministic under repartitioning and serves from a persisted index") {
    val q = emb.where(col("vec_id") < 10)
    val a = Hnsw.hnswTopK(emb, q, "vec_id", "embedding", "vec_id", "embedding",
      k = 5, shards = 3).collect().map(_.toString).sorted.toSeq
    val b = Hnsw.hnswTopK(emb.repartition(13), q, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, shards = 3).collect().map(_.toString).sorted.toSeq
    assert(a == b, "graph build must not depend on upstream partitioning")
    // persistence round-trip: parquet-saved adjacency answers identically
    val index = Hnsw.hnswBuild(emb, "vec_id", "embedding", shards = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw").toString
    index.write.mode("overwrite").parquet(dir)
    val rehydrated = spark.read.parquet(dir)
    val c = Hnsw.hnswQuery(rehydrated, q, "vec_id", "embedding", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(c == a)
  }

  test("hnsw handles empty queries, tiny shards, and self-exclusion") {
    import spark.implicits._
    val tiny = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Hnsw.hnswTopK(tiny, tiny, "vec_id", "embedding", "vec_id", "embedding",
      k = 2, shards = 2, m = 2, efConstruction = 4)
    val rows = out.collect()
    assert(rows.length == 6) // 3 queries x k=2 (self excluded, 2 others remain)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    val none = Hnsw.hnswTopK(tiny, tiny.where(lit(false)), "vec_id", "embedding",
      "vec_id", "embedding", k = 2)
    assert(none.count() == 0)
  }

  test("hnsw auto-shards: memory floor past the target, one shard for a small corpus") {
    // 500-row corpus, 100-row target: the memory floor wins — 5 shards
    val floored = Hnsw.hnswBuild(emb, "vec_id", "embedding", shards = 0,
      targetRowsPerShard = 100)
    assert(floored.select("shard").distinct().count() == 5L)
    // default target: the corpus is far below MinRowsPerShard, so the
    // parallelism term collapses to 1 — over-sharding a tiny corpus would
    // only cost recall and probe fan-out
    val auto = Hnsw.hnswBuild(emb, "vec_id", "embedding")
    assert(auto.select("shard").distinct().count() == 1L)
    // the auto-built index still answers with full contract shape
    val q = emb.where(col("vec_id") < 5)
    val out = Hnsw.hnswQuery(auto, q, "vec_id", "embedding", k = 3).collect()
    assert(out.groupBy(_.getLong(0)).values.forall(_.length == 3))
  }

  test("hnsw oversized query batches chunk through toLocalIterator, results unchanged") {
    val q = emb.where(col("vec_id") < 40)
    val index = Hnsw.hnswBuild(emb, "vec_id", "embedding", shards = 3)
      .localCheckpoint(true) // chunking re-probes the index once per chunk
    val oneShot = Hnsw.hnswQuery(index, q, "vec_id", "embedding", k = 5)
      .collect().map(_.toString).sorted.toSeq
    val chunked = Hnsw.hnswQuery(index, q, "vec_id", "embedding", k = 5,
      maxQueryBatch = 16) // 40 queries -> 3 chunks
    // r13: chunks execute sequentially and arrive MATERIALIZED — the plan
    // handed back is a union over 3 checkpointed chunk results, not 3 live
    // probe plans each pinning its query broadcast until the final job
    // (bounded driver memory, plan size linear in chunks but trivial)
    val leaves = chunked.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 3 &&
      leaves.forall(_.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      s"expected a union of 3 materialized chunk scans, got:\n" +
        chunked.queryExecution.optimizedPlan)
    assert(chunked.collect().map(_.toString).sorted.toSeq == oneShot,
      "chunk membership must not change any per-query result")
  }

  test("parallel KMeansLite fits are deterministic and Lloyd early-exit is iteration-invariant") {
    // r17 optimization pins: the restarts run on parallel driver threads
    // with the sequential first-lowest-cost selection rule, and Lloyd
    // breaks once no center moves a bit. Both must be invisible:
    // (1) repeated fits at one seed return bit-identical centers (a wrong
    //     parallel selection rule — e.g. first-finished-wins — would make
    //     this flaky), and
    // (2) raising the iteration cap past convergence changes nothing
    //     (early exit ⟺ the remaining iterations were no-ops).
    val rnd = new java.util.Random(7)
    val pts = Array.fill(500)(Similarity.KMeansLite.normalized(Array.fill(16)(rnd.nextGaussian())))
    val a = Similarity.KMeansLite.fit(pts, k = 8, iters = 25, seed = 42L, spherical = true)
    val b = Similarity.KMeansLite.fit(pts, k = 8, iters = 25, seed = 42L, spherical = true)
    assert(a.length == b.length &&
      a.indices.forall(i => java.util.Arrays.equals(a(i), b(i))),
      "repeated parallel fits diverged — the restart selection rule is nondeterministic")
    val c = Similarity.KMeansLite.fit(pts, k = 8, iters = 200, seed = 42L, spherical = true)
    val d = Similarity.KMeansLite.fit(pts, k = 8, iters = 201, seed = 42L, spherical = true)
    assert(c.indices.forall(i => java.util.Arrays.equals(c(i), d(i))),
      "iters=200 vs 201 differ — either Lloyd still moving at 200 " +
        "(raise the bound) or the early exit broke the fixpoint")
  }
}
