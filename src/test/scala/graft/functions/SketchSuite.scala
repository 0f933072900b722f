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
