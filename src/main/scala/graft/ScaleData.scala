package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's synthetic testdata: key-shifted
  * replication of an existing sf directory (default sf0.1 × 10 ≈ sf1),
  * preserving referential integrity — every foreign key shifts by the same
  * per-copy offset as its dimension's primary key, so join fan-outs,
  * group cardinalities per key, and selectivities match a natively
  * generated larger scale factor. `nation`/`region` stay fixed (TPC-H
  * semantics: they do not scale). Output is bench-only input (the DuckDB
  * oracle runs at sf0.01); BASELINE.md records the measured table.
  *
  * MUTATED mode (4th arg `mutate`): verbatim replication keeps distinct
  * texts CONSTANT in SF, which is exact-collapse's ideal case — the r14
  * sf50 "flat at 2x data" result is real but tests only the collapsed
  * path's output stage. Mutation makes distinct texts (and genuine
  * NEAR-dup structure) grow with SF so high-SF runs exercise LSH banding +
  * candidate verification at true distinct-text scale. Deterministic
  * regimes by copy index k (seeded by (doc_id, k, word index) — no RNG,
  * reruns are bit-identical):
  *  - k % 3 == 0: verbatim (exact-dup cliques keep growing — the collapse
  *    still has real work);
  *  - k % 3 == 1: ~4% of words rewritten — with 3-shingles that corrupts
  *    ~11% of shingles, Jaccard ≈ 0.8: a genuine near-dup ABOVE the 0.7
  *    gate threshold, so verified cross-pairs grow with SF;
  *  - k % 3 == 2: ~12% rewritten — Jaccard ≈ 0.6: distinct non-dup texts
  *    that still collide in some LSH bands (candidate pressure without
  *    qualifying pairs).
  * Embeddings get the same 3-regime treatment with per-element jitter
  * (0 / ~1% / ~20% relative), so vector dedup sees exact piles, genuine
  * near-dups, and distinct vectors respectively.
  *
  * Usage: `runMain graft.ScaleData [srcDir] [dstDir] [copies] [mutate]`.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("testdata_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val mutate = args.lift(3).contains("mutate")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // events.parquet has shipped with TIMESTAMP(NANOS) — read as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def table(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** One offset per shifted key family: maxKey + 1 of the owning table,
      * so copy k shifts every reference to that family by k × offset.
      */
    def offsetOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("long"))).head().getLong(0) + 1L

    val offsets = Map(
      "orderkey" -> offsetOf(table("orders"), "o_orderkey"),
      "custkey" -> offsetOf(table("customer"), "c_custkey"),
      "partkey" -> offsetOf(table("part"), "p_partkey"),
      "suppkey" -> offsetOf(table("supplier"), "s_suppkey"),
      "docid" -> offsetOf(table("documents"), "doc_id"),
      "vecid" -> offsetOf(table("embeddings"), "vec_id"),
      "eventid" -> offsetOf(table("events"), "event_id"),
      "userid" -> offsetOf(table("events"), "user_id"))

    /** Word-edit percentage / vector jitter magnitude for copy k. */
    def regime(k: Int): (Int, Double) = k % 3 match {
      case 0 => (0, 0.0)      // verbatim: exact-dup clique member
      case 1 => (4, 0.01)     // near-dup above the verify threshold
      case _ => (12, 0.2)     // distinct text / vector
    }

    /** ~pct% of words rewritten to a hash-derived marker token, seeded by
      * (doc id, copy, word index, word) — deterministic, codegen'd
      * (split/transform/array_join, no UDF).
      */
    def mutText(idCol: String, c: Column, k: Int, pct: Int): Column =
      if (pct == 0) c
      else {
        val words = split(c, " ")
        array_join(transform(words, (w, i) =>
          when(pmod(xxhash64(col(idCol), lit(k), i, w), lit(100)) < pct,
            concat(lit("mut"), pmod(xxhash64(lit(k), i, w), lit(997)).cast("string")))
            .otherwise(w)), " ")
      }

    /** Per-element deterministic jitter in [-mag, mag] (relative scale of
      * the data's unit-ish vectors), seeded by (vec id, copy, element).
      */
    def mutVec(idCol: String, c: Column, k: Int, mag: Double): Column =
      if (mag == 0.0) c
      else transform(c, (x, i) =>
        (x.cast("double") +
          (pmod(xxhash64(col(idCol), lit(k), i), lit(2001)) - lit(1000))
            .cast("double") / 1000.0 * mag).cast("float"))

    /** Replicate `copies` times, shifting each (column -> key family);
      * `mut` optionally rewrites content columns per copy.
      */
    def replicate(name: String, shifts: Map[String, String],
        mut: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val base = table(name)
      val out = (0 until copies).map { k =>
        val shifted = shifts.foldLeft(base) { case (df, (c, fam)) =>
          val dt = base.schema(c).dataType
          df.withColumn(c, (col(c).cast("long") + lit(k.toLong * offsets(fam))).cast(dt))
        }
        if (mutate) mut(shifted, k) else shifted
      }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scale] $name: ${base.count()} x $copies rows" +
        (if (mutate) " (mutated)" else ""))
    }

    replicate("lineitem", Map("l_orderkey" -> "orderkey",
      "l_partkey" -> "partkey", "l_suppkey" -> "suppkey"))
    replicate("orders", Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"))
    replicate("customer", Map("c_custkey" -> "custkey"))
    replicate("part", Map("p_partkey" -> "partkey"))
    replicate("supplier", Map("s_suppkey" -> "suppkey"))
    replicate("documents", Map("doc_id" -> "docid"), (df, k) => {
      val (pct, _) = regime(k)
      val mutated = mutText("doc_id", col("text"), k, pct)
      df.withColumn("text", mutated)
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    replicate("embeddings", Map("vec_id" -> "vecid"), (df, k) => {
      val (_, mag) = regime(k)
      df.withColumn("embedding", mutVec("vec_id", col("embedding"), k, mag))
    })
    replicate("events", Map("event_id" -> "eventid", "user_id" -> "userid"))
    // fixed dimensions: straight copies
    Seq("nation", "region").foreach { n =>
      table(n).write.mode("overwrite").parquet(s"$dst/$n.parquet")
      println(s"[scale] $n: copied")
    }
    spark.stop()
  }
}
