package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenFallback, GenerateUnsafeProjection}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase
import graft.functions.{GraftFunctions => F, TextFunctions => T}
import graft.queries.QueryPack

/** The fused shingle→minhash kernel must be BIT-IDENTICAL to the composed
  * `minhash_signature(word_shingles(tokens, n), k)` pipeline it replaces —
  * the dedup gates are hash-exact against the DuckDB oracle, so any
  * divergence (separator bytes, empty-word handling, short-array join,
  * null elements) would surface as a gate mismatch. These pins hold the
  * equivalence at the expression level so the gate never has to catch it.
  */
class ShingleMinHashSuite extends SparkTestBase {

  private def docs = QueryPack.t(spark, sf(), "documents")

  private def composed(tokens: Seq[Any], n: Int, k: Int): Seq[Long] = {
    val arr = new GenericArrayData(tokens.map {
      case s: String => UTF8String.fromString(s)
      case null => null
    }.toArray[Any])
    val sh = WordShingles(BoundReference(0, ArrayType(StringType), nullable = true), n)
      .nullSafeEval(arr).asInstanceOf[GenericArrayData]
    MinHashSignature(BoundReference(0, ArrayType(StringType), nullable = true), k)
      .nullSafeEval(sh).asInstanceOf[GenericArrayData].toLongArray().toSeq
  }

  private def fused(tokens: Seq[Any], n: Int, k: Int): Seq[Long] = {
    val arr = new GenericArrayData(tokens.map {
      case s: String => UTF8String.fromString(s)
      case null => null
    }.toArray[Any])
    ShingleMinHash(BoundReference(0, ArrayType(StringType), nullable = true), n, k)
      .computeRaw(arr).asInstanceOf[GenericArrayData].toLongArray().toSeq
  }

  test("fused kernel is bit-identical to composed pipeline on edge shapes") {
    val cases: Seq[Seq[Any]] = Seq(
      Seq.empty[Any],                        // no tokens -> MaxValue signature
      Seq("solo"),                           // fewer words than n: whole join
      Seq("a", "b"),                         // exactly n (n=2 case below)
      Seq("a", "b", "c", "d", "e"),          // normal sliding window
      Seq("", "x", ""),                      // empty words keep separators
      Seq(null, "mid", null),                // nulls -> empty string (parity)
      Seq("repeat", "repeat", "repeat"),     // identical shingles
      Seq("unicode", "日本語", "emoji", "🎉"), // multi-byte UTF-8 slices
      (1 to 40).map(i => s"w$i")             // longer run
    )
    for (tokens <- cases; n <- Seq(1, 2, 3, 5); k <- Seq(8, 128)) {
      assert(fused(tokens, n, k) == composed(tokens, n, k),
        s"divergence at tokens=$tokens n=$n k=$k")
    }
  }

  test("fused kernel matches composed pipeline over the documents corpus") {
    for (n <- Seq(3, 5)) {
      val mismatches = docs.select(
          F.shingle_minhash(T.tokens(col("text")), n, 64).as("a"),
          F.minhash_signature(F.word_shingles(T.tokens(col("text")), n), 64).as("b"))
        .where(col("a") =!= col("b")).count()
      assert(mismatches == 0, s"corpus divergence at shingleSize=$n")
    }
  }

  test("codegen compiles and matches interpreted eval (minhash + simhash)") {
    val mh = ShingleMinHash(BoundReference(0, ArrayType(StringType), nullable = true), 3, 16)
    val sh = SimHash64(BoundReference(0, ArrayType(StringType), nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(mh, sh)) // throws on janino errors
    val input = new GenericArrayData(Array[Any](
      UTF8String.fromString("alpha"), UTF8String.fromString("beta"), null,
      UTF8String.fromString("gamma"), UTF8String.fromString("delta")))
    val row = InternalRow(input)
    val out = proj(row)
    assert(out.getArray(0).toLongArray().toSeq ==
      mh.eval(row).asInstanceOf[GenericArrayData].toLongArray().toSeq)
    assert(out.getLong(1) == sh.eval(row).asInstanceOf[Long])
  }

  test("signature stage stays inside whole-stage codegen with no CodegenFallback") {
    val df = docs.select(F.shingle_minhash(T.tokens(col("text")), 3, 128).as("sig"),
      F.simhash64(T.tokens(col("text"))).as("sim"))
    df.count() // force planning through execution
    val plan = df.queryExecution.executedPlan
    val projectExprs = plan.collect { case p: ProjectExec => p }
      .flatMap(_.projectList).flatMap(_.collect { case e => e })
    assert(projectExprs.exists(_.isInstanceOf[ShingleMinHash]), "fused expr missing from plan")
    assert(projectExprs.exists(_.isInstanceOf[SimHash64]), "simhash missing from plan")
    val fallbacks = projectExprs.collect { case e: CodegenFallback => e }
    assert(fallbacks.isEmpty, s"interpreted expressions in the signature stage: $fallbacks")
    // the projection executes inside a WholeStageCodegen span
    val codegenned = plan.collect { case w: WholeStageCodegenExec => w }
      .flatMap(_.collect { case p: ProjectExec => p })
      .flatMap(_.projectList).exists(_.collectFirst { case e: ShingleMinHash => e }.isDefined)
    assert(codegenned, s"signature projection fell out of whole-stage codegen:\n$plan")
  }

  test("sql surface: shingle_minhash registered and consistent") {
    graft.Graft.install(spark, warehouseDir)
    docs.createOrReplaceTempView("docs_smh")
    val viaSql = spark.sql(
      "SELECT shingle_minhash(split(lower(text), ' '), 3, 32) AS s FROM docs_smh WHERE doc_id = 7")
      .head().getSeq[Long](0)
    val viaApi = docs.where(col("doc_id") === 7)
      .select(F.shingle_minhash(split(lower(col("text")), " "), 3, 32))
      .head().getSeq[Long](0)
    assert(viaSql == viaApi)
  }
}
