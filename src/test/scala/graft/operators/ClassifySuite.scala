package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

class ClassifySuite extends SparkTestBase {

  private def lg2(x: Double): Double = math.log(x) / math.log(2.0)
  private def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("naive bayes matches a hand-computed two-class model") {
    import spark.implicits._
    // class a: tokens {x x y}, 2 docs; class b: tokens {z z}, 1 doc; V = 3
    val train = Seq(("a", "x x"), ("a", "y"), ("b", "z z")).toDF("source", "text")
    val model = Classify.nbTrain(train, "source", "text")
    val out = Classify.nbPredict(model, Seq((1L, "x y")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(out.length == 1)
    // score(a) = log2(2/3) + log2((2+1)/(3+3+1)) + log2((1+1)/(3+3+1))
    val sa = r9(lg2(2.0 / 3.0)) + r9(lg2(3.0 / 7.0)) + r9(lg2(2.0 / 7.0))
    // score(b) = log2(1/3) + log2(1/(2+3+1)) * 2
    val sb = r9(lg2(1.0 / 3.0)) + r9(lg2(1.0 / 6.0)) + r9(lg2(1.0 / 6.0))
    assert(sa > sb)
    assert(out.head.getString(1) == "a")
    assert(out.head.getDouble(2) == sa.toDouble, s"got ${out.head.getDouble(2)}, want $sa")
  }

  test("prediction is invariant under partitioning and emits one row per doc") {
    val d = QueryPack.t(spark, sf(), "documents")
    val model = Classify.nbTrain(d.where(col("doc_id") % 4 =!= 0), "source", "text")
    def run(parts: Int) = Classify.nbPredict(model,
        d.where(col("doc_id") % 4 === 0).repartition(parts), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    val a = run(1)
    assert(a == run(9))
    val nDocs = d.where(col("doc_id") % 4 === 0).count()
    assert(a.length.toLong == nDocs, "exactly one prediction per scored doc")
  }

  test("classifier recovers a strong vocabulary signal") {
    import spark.implicits._
    // two synthetic dialects with disjoint vocabularies: NB must get
    // held-out docs right (this is signal recovery, not benchmark accuracy)
    def doc(cls: String, i: Int) =
      (0 until 20).map(j => s"$cls${(i * 7 + j) % 13}").mkString(" ")
    val rows = (0 until 40).map(i => (s"c${i % 2}", doc(s"w${i % 2}_", i)))
    val train = rows.take(30).toDF("source", "text")
    val test = rows.drop(30).zipWithIndex
      .map { case ((c, t), i) => (i.toLong, c, t) }.toDF("doc_id", "truth", "text")
    val model = Classify.nbTrain(train, "source", "text")
    val preds = Classify.nbPredict(model, test, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = test.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(truth.forall { case (id, c) => preds(id) == c },
      "disjoint-vocabulary classes must classify perfectly")
  }

  test("null-text docs neither train the prior nor receive predictions") {
    import spark.implicits._
    val train = Seq(("a", "x x"), ("a", "y"), ("a", null), ("b", "z z"))
      .toDF("source", "text")
    val model = Classify.nbTrain(train, "source", "text")
    // the null row must not inflate class a's doc count: priors stay 2/3, 1/3
    val totals = model.classTotals.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals == Map("a" -> 2L, "b" -> 1L), totals.toString)
    val out = Classify.nbPredict(model,
        Seq((1L, "x y"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L), "null-text doc must not be scored")
  }

  test("GATE CONFIG: no log term or prior sits near a rounding boundary") {
    // same fixed-corpus argument as the bigram gate: terms agree across
    // libms up to ulps; verify every distinct rounded quantity at the
    // text_nb_source config keeps > 1e-4 ninth-decimal distance from the
    // .5 cut (>= 100 ulps at these magnitudes)
    val d = QueryPack.t(spark, sf("sf0.01"), "documents")
    val train = d.where(col("doc_id") % 4 =!= 0)
    val model = Classify.nbTrain(train, "source", "text")
    val v = model.vocab.collect().head.getLong(0)
    val totals = model.classTotals.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nd = totals.values.map(_._1).sum
    def checkBoundary(x: Double, what: String): Unit = {
      val frac = math.abs(x * 1e9 - math.floor(x * 1e9) - 0.5)
      assert(frac > 1e-4, s"$what $x within 1e-13 of a 9-decimal boundary")
    }
    for ((_, (ndc, _)) <- totals) checkBoundary(lg2(ndc.toDouble / nd), "prior")
    // distinct (cnt, n_tokens) combos: every count in the model per class,
    // plus the unseen-token floor cnt=0 for every class
    val counts = model.tokenCounts.collect()
      .map(r => (r.getString(0), r.getLong(2))).distinct
    var n = 0
    for ((label, cnt) <- counts ++ totals.keys.map(_ -> 0L)) {
      val tot = totals(label)._2
      checkBoundary(lg2((cnt + 1.0) / (tot + v + 1.0)), s"term($label,$cnt)")
      n += 1
    }
    assert(n > 100, s"boundary check covered only $n combos")
  }
}
