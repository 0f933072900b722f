package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{GraftFunctions => F, TextFunctions => T}
import graft.queries.QueryPack

class SketchSuite extends SparkTestBase {

  private def docs = QueryPack.t(spark, sf(), "documents")

  test("minhash_agg of one row equals the per-row signature") {
    val one = docs.filter(col("doc_id") === 7)
      .select(T.tokens(col("text")).as("tk"))
    val agg = one.agg(F.minhash_agg(col("tk")).as("sig"))
      .head().getSeq[Long](0)
    val perRow = one.select(F.minhash_signature(col("tk")).as("sig"))
      .head().getSeq[Long](0)
    assert(agg == perRow)
  }

  test("sketch jaccard estimates exact token-set jaccard between sources") {
    val sk = docs.filter(col("source").isin("src0", "src1"))
      .groupBy(col("source"))
      .agg(F.minhash_agg(T.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // estimate via sketch positions
    val est = sk("src0").zip(sk("src1")).count { case (a, b) => a == b }.toDouble / 128.0
    // exact jaccard of the distinct token sets
    val s0 = docs.filter(col("source") === "src0")
      .select(explode(T.tokens(col("text"))).as("t")).distinct()
    val s1 = docs.filter(col("source") === "src1")
      .select(explode(T.tokens(col("text"))).as("t")).distinct()
    val inter = s0.intersect(s1).count().toDouble
    val union = s0.union(s1).distinct().count().toDouble
    val exact = inter / union
    assert(math.abs(est - exact) < 0.15, s"estimate $est vs exact $exact")
  }

  test("sketch jaccard error is bounded over all source pairs (ground truth for sketch_source_similarity)") {
    // The sketch_source_similarity gate is rows-only (hash-specific); this is
    // its ground truth: over ALL 190 source pairs, the k=128 minhash estimate
    // stays within the standard-error envelope of the exact token-set
    // Jaccard. SE = sqrt(J(1-J)/k) <= 0.5/sqrt(128) ~ 0.044, so 4-sigma is
    // ~0.177 per pair; the mean over pairs concentrates much tighter.
    val sk = docs.groupBy(col("source"))
      .agg(F.minhash_agg(T.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val toks = docs.select(col("source"), explode(T.tokens(col("text"))).as("t"))
      .distinct().collect().groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(_.getString(1)).toSet }
    val sources = sk.keys.toSeq.sorted
    val errs = for {
      a <- sources; b <- sources if a < b
    } yield {
      val est = sk(a).zip(sk(b)).count { case (x, y) => x == y }.toDouble / 128.0
      val exact = toks(a).intersect(toks(b)).size.toDouble / toks(a).union(toks(b)).size
      math.abs(est - exact)
    }
    assert(errs.max <= 2.0 / math.sqrt(128.0),
      s"worst pair error ${errs.max} exceeds 2/sqrt(k)")
    assert(errs.sum / errs.size <= 0.05,
      s"mean error ${errs.sum / errs.size} too high")
  }

  test("approx_count_distinct error is within 3x rsd (ground truth for q_approx_distinct)") {
    // q_approx_distinct is rows-only (HLL++ register layout is
    // engine-specific); bound the estimate against the exact count here.
    val li = QueryPack.t(spark, sf(), "lineitem")
    val rows = li.groupBy(col("l_linestatus"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      val rel = math.abs(approx - exact) / exact
      assert(rel <= 0.15, s"HLL relative error $rel for ${r.getString(0)} (default rsd 0.05)")
    }
  }

  test("merge is partition-order independent (algebraic aggregate)") {
    val tk = docs.select(T.tokens(col("text")).as("tk"))
    val a = tk.repartition(1).agg(F.minhash_agg(col("tk"))).head().getSeq[Long](0)
    val b = tk.repartition(13).agg(F.minhash_agg(col("tk"))).head().getSeq[Long](0)
    assert(a == b)
  }

  test("minhash codegen compiles and matches interpreted eval") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val expr = MinHashSignature(BoundReference(0, ArrayType(StringType), nullable = true), 16)
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on janino errors
    val input = new GenericArrayData(Array[Any](
      UTF8String.fromString("alpha"), UTF8String.fromString("beta"), null))
    val row = InternalRow(input)
    val fromCodegen = proj(row).getArray(0).toLongArray().toSeq
    val interpreted = expr.eval(row).asInstanceOf[GenericArrayData].toLongArray().toSeq
    assert(fromCodegen == interpreted)
  }

  test("sql surface: minhash_agg + sketch_jaccard registered") {
    graft.Graft.install(spark, warehouseDir)
    docs.createOrReplaceTempView("docs_sql")
    val r = spark.sql(
      """SELECT sketch_jaccard(
        |  (SELECT minhash_agg(split(lower(text), ' ')) FROM docs_sql WHERE source = 'src0'),
        |  (SELECT minhash_agg(split(lower(text), ' ')) FROM docs_sql WHERE source = 'src0')) AS j
        |""".stripMargin).head().getDouble(0)
    assert(r == 1.0) // identical sketches
  }
}
