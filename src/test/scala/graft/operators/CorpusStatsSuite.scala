package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

class CorpusStatsSuite extends SparkTestBase {
  test("novelty scans the corpus once (window, not groupBy+join)") {
    val df = graft.operators.CorpusStats.noveltyScores(
      QueryPack.t(spark, sf(), "documents"), "doc_id", "text")
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("FileScan")) == 1,
      s"single corpus scan expected:\n$p")
  }

  // ---- bigram LM cross-entropy ----

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  test("bigram xent matches a hand-computed add-one model") {
    import spark.implicits._
    val train = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val lm = CorpusStats.bigramTrain(train, "text")
    // train bigrams: (a,b)x2 (b,a)x2 (a,c)x1; contexts a=3 b=2; V=3
    val out = CorpusStats.bigramScore(lm,
        Seq((10L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L) // (a,b), (b,c)
    val t1 = BigDecimal(log2(3.0 / 7.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val t2 = BigDecimal(log2(1.0 / 6.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expected = BigDecimal(-(t1 + t2).toDouble / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == expected, s"got ${r.getDouble(2)}, want $expected")
  }

  test("bigram xent: OOV-only docs hit the vocabulary floor, short docs drop out") {
    import spark.implicits._
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text") // V=2, contexts a=2 b=1
    val lm = CorpusStats.bigramTrain(train, "text")
    val out = CorpusStats.bigramScore(lm, Seq(
        (10L, "x y z"),   // every bigram unseen, every context unseen
        (11L, "single"),  // one token: no bigram, must not appear
        (12L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(10L), out.keySet.toString)
    // floor prob 1/(0 + V + 1) = 1/3 per bigram
    val t = BigDecimal(log2(1.0 / 3.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expected = BigDecimal(-(t + t).toDouble / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(10L).getDouble(2) == expected)
  }

  test("bigram xent is invariant under partitioning (decimal term sum)") {
    val d = QueryPack.t(spark, sf(), "documents")
    val lm = CorpusStats.bigramTrain(d.where(org.apache.spark.sql.functions.col("doc_id") % 5 =!= 0), "text")
    def run(parts: Int) = CorpusStats.bigramScore(lm,
        d.where(org.apache.spark.sql.functions.col("doc_id") % 5 === 0).repartition(parts),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("GATE CONFIG: no log term or final division sits near a rounding boundary") {
    // The text_bigram_xent oracle matches hash-exact only if round(term, 9)
    // agrees between Spark's and DuckDB's libm (which may differ by ulps).
    // The corpus is FIXED, so verify deterministically: every scored term
    // at the gate config keeps its 9th-decimal fraction > 1e-4 away from
    // the .5 cut (1e-13 absolute — over 100 ulps at |t| <= 20, vs at most a
    // few ulps of cross-libm log disagreement; measured corpus minimum is
    // 4.9e-4), and every per-doc mean keeps a 1e-3 margin at 6 decimals
    // (belt and braces: the mean's inputs are already engine-identical).
    val d = QueryPack.t(spark, sf("sf0.01"), "documents")
    import org.apache.spark.sql.functions._
    val lm = CorpusStats.bigramTrain(d.where(col("doc_id") % 5 =!= 0), "text")
    val v = lm.vocab.collect().head.getLong(0)
    val combos = graft.queries.QueryPack.t(spark, sf("sf0.01"), "documents")
      .where(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).collect()
    // distinct (c2, c1) pairs actually scored, via the model tables
    val c2m = lm.bigrams.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val c1m = lm.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    var terms = 0
    for (r <- combos) {
      val toks = norm(r.getString(1)).split(' ')
      val termVals = toks.sliding(2).filter(_.length == 2).map { case Array(w1, w2) =>
        val c2 = c2m.getOrElse((w1, w2), 0L); val c1 = c1m.getOrElse(w1, 0L)
        val t = math.log((c2 + 1.0) / (c1 + v + 1.0)) / math.log(2.0)
        val frac = math.abs(t * 1e9 - math.floor(t * 1e9) - 0.5)
        assert(frac > 1e-4, s"term $t within 1e-13 of a 9-decimal boundary (doc ${r.getLong(0)})")
        terms += 1
        BigDecimal(t).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.toSeq
      if (termVals.nonEmpty) {
        val mean = -termVals.foldLeft(BigDecimal(0))(_ + _).toDouble / termVals.length
        val frac = math.abs(mean * 1e6 - math.floor(mean * 1e6) - 0.5)
        assert(frac > 1e-3, s"mean $mean within 1e-9 of a 6-decimal boundary (doc ${r.getLong(0)})")
      }
    }
    assert(terms > 1000, s"boundary check covered only $terms terms")
  }

  test("GATE CONFIG: dsir target-LM terms clear the same rounding boundaries") {
    // pipeline_dsir adds a SECOND model (target = src0-src3) whose log
    // terms are a new cross-libm surface; everything downstream (llr,
    // weight, kept) derives deterministically from the two
    // already-engine-identical xent doubles — the weight stays UNROUNDED
    // precisely so this holds (rounding 0.5 + llr/4 at 6 decimals would
    // create exact HALF_UP ties the engines resolve differently) — so the
    // 9-decimal term margin is the one thing to pin. Threshold 5e-5
    // (5e-14 absolute): the
    // target-LM corpus minimum is 8.3e-5 (doc 5), still ~90 ulps at that
    // term's magnitude vs a few ulps of cross-libm log drift — tighter
    // than the raw LM's 4.9e-4 minimum but equally safe.
    val d = QueryPack.t(spark, sf("sf0.01"), "documents")
    import org.apache.spark.sql.functions._
    val train = d.where(col("doc_id") % 5 =!= 0)
    val lm = CorpusStats.bigramTrain(
      train.where(col("source").isin("src0", "src1", "src2", "src3")), "text")
    val v = lm.vocab.collect().head.getLong(0)
    val c2m = lm.bigrams.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val c1m = lm.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    var terms = 0
    for (r <- d.where(col("doc_id") % 5 === 0).select(col("doc_id"), col("text")).collect()) {
      val toks = norm(r.getString(1)).split(' ')
      val termVals = toks.sliding(2).filter(_.length == 2).map { case Array(w1, w2) =>
        val c2 = c2m.getOrElse((w1, w2), 0L); val c1 = c1m.getOrElse(w1, 0L)
        val t = math.log((c2 + 1.0) / (c1 + v + 1.0)) / math.log(2.0)
        val frac = math.abs(t * 1e9 - math.floor(t * 1e9) - 0.5)
        assert(frac > 5e-5, s"target term $t near a 9-decimal boundary (doc ${r.getLong(0)})")
        terms += 1
        BigDecimal(t).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.toSeq
      if (termVals.nonEmpty) {
        val mean = -termVals.foldLeft(BigDecimal(0))(_ + _).toDouble / termVals.length
        val frac = math.abs(mean * 1e6 - math.floor(mean * 1e6) - 0.5)
        assert(frac > 1e-3, s"target mean $mean near a 6-decimal boundary (doc ${r.getLong(0)})")
      }
    }
    assert(terms > 1000, s"dsir boundary check covered only $terms terms")
  }

  test("single-pass dsirWeights equals the two-bigramScore composition exactly") {
    import org.apache.spark.sql.functions._
    val d = QueryPack.t(spark, sf("sf0.01"), "documents")
    val train = d.where(col("doc_id") % 5 =!= 0)
    val tgt = CorpusStats.bigramTrain(
      train.where(col("source").isin("src0", "src1", "src2", "src3")), "text")
    val raw = CorpusStats.bigramTrain(train, "text")
    val heldout = d.where(col("doc_id") % 5 === 0)
    val onePass = CorpusStats.dsirWeights(tgt, raw, heldout, "doc_id", "text")
      .select("id", "n_bigrams", "llr_rate", "weight")
      .orderBy("id").collect().toSeq
    // reference formulation: two independent scoring passes + id join
    val st = CorpusStats.bigramScore(tgt, heldout, "doc_id", "text")
      .select(col("id"), col("n_bigrams"), col("xent_bits").as("xt"))
    val sr = CorpusStats.bigramScore(raw, heldout, "doc_id", "text")
      .select(col("id"), col("xent_bits").as("xr"))
    val twoPass = st.join(sr, Seq("id"))
      .select(col("id"), col("n_bigrams"), round(col("xr") - col("xt"), 6).as("llr_rate"))
      .withColumn("weight",
        least(lit(1.0), greatest(lit(0.0), lit(0.5) + col("llr_rate") / 4.0)))
      .orderBy("id").collect().toSeq
    assert(onePass == twoPass)
  }

  test("dsir weights rank target-domain docs above the rest") {
    import org.apache.spark.sql.functions._
    val d = QueryPack.t(spark, sf("sf0.01"), "documents")
    val train = d.where(col("doc_id") % 5 =!= 0)
    val tgt = CorpusStats.bigramTrain(
      train.where(col("source").isin("src0", "src1", "src2", "src3")), "text")
    val raw = CorpusStats.bigramTrain(train, "text")
    val scored = CorpusStats.dsirWeights(tgt, raw,
        d.where(col("doc_id") % 5 === 0), "doc_id", "text")
      .join(d.select(col("doc_id").as("id"), col("source")), Seq("id"))
    val means = scored
      .withColumn("is_target", col("source").isin("src0", "src1", "src2", "src3"))
      .groupBy("is_target").agg(avg("llr_rate").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target-domain docs should score higher: $means")
    // weights stay in [0, 1] and are monotone in llr
    val w = scored.select("llr_rate", "weight").collect()
    assert(w.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    val sorted = w.sortBy(_.getDouble(0))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(1) <= b.getDouble(1))
      case _ =>
    }
  }

  test("kneser-ney: per-context probability mass stays just under one") {
    import spark.implicits._
    val train = Seq((1L, "a b a c a b b c d a"), (2L, "b c b d a c c a"),
      (3L, "d a b c a d")).toDF("id", "text")
    val lm = CorpusStats.knTrain(train, "text")
    val st = lm.stats.head()
    val (b, v, d) = (st.getLong(0), st.getLong(1), st.getDouble(2))
    assert(d > 0 && d < 1, s"count-of-counts discount out of range: $d")
    // assemble sum over the FULL vocab of P(w2|w1) per context from the
    // model tables (independent of knScore): discounted mass + interpolated
    // continuation mass; the shortfall from 1 is exactly the reserved OOV
    // mass D*n1p/c1/(B+V+1) scaled by the uniform leftover
    val contexts = lm.contexts.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bigrams = lm.bigrams.collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val cont = lm.continuations.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val vocabWords = Seq("a", "b", "c", "d")
    assert(vocabWords.size == v)
    contexts.foreach { case (w1, c1, n1p) =>
      val mass = vocabWords.map { w2 =>
        val c2 = bigrams.getOrElse((w1, w2), 0L)
        val pcont = (cont.getOrElse(w2, 0L) + 1).toDouble / (b + v + 1)
        math.max(c2 - d, 0.0) / c1 + d * n1p / c1 * pcont
      }.sum
      assert(mass > 0.9 && mass <= 1.0 + 1e-12,
        s"context $w1 mass $mass outside (0.9, 1]")
    }
  }

  test("kneser-ney beats add-one on held-out cross-entropy") {
    val d = QueryPack.t(spark, sf(), "documents")
    val train = d.where(col("doc_id") % 5 =!= 0)
    val test0 = d.where(col("doc_id") % 5 === 0)
    val kn = CorpusStats.knScore(CorpusStats.knTrain(train, "text"), test0, "doc_id", "text")
      .agg(avg(col("xent_bits"))).head().getDouble(0)
    val addOne = CorpusStats.bigramScore(CorpusStats.bigramTrain(train, "text"),
        test0, "doc_id", "text")
      .agg(avg(col("xent_bits"))).head().getDouble(0)
    assert(kn < addOne,
      s"KN ($kn bits) should beat add-one ($addOne bits) on held-out text")
    assert(kn > 0, "cross-entropy must be positive")
  }

  test("kneser-ney: OOV and unseen-context bigrams score finite via continuation backoff") {
    import spark.implicits._
    val train = Seq((1L, "a b a c")).toDF("id", "text")
    val lm = CorpusStats.knTrain(train, "text")
    // 'z' is OOV: context z is unseen (backoff to Pcont), and (a z) is an
    // unseen bigram under a seen context
    val scored = CorpusStats.knScore(lm,
      Seq((9L, "z a z b")).toDF("id", "text"), "id", "text").head()
    assert(scored.getLong(1) == 3L)
    val x = scored.getDouble(2)
    assert(!x.isNaN && !x.isInfinite && x > 0, s"backoff produced $x")
  }
}
