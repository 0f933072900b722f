package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

class SamplingSuite extends SparkTestBase {

  private def docs = QueryPack.t(spark, sf(), "documents")

  test("hashSplit partitions every row into exactly one split, near the weights") {
    val splits = Sampling.hashSplit(docs, "doc_id", Seq(0.8, 0.1, 0.1), seed = 11L)
    val counts = splits.map(_.count())
    assert(counts.sum == docs.count(), "splits must cover all rows disjointly")
    assert(counts(0) > counts(1) && counts(0) > counts(2))
    assert(math.abs(counts(0) - 400) < 60, s"80% split way off: ${counts(0)}/500")
    // disjoint: no id in two splits
    val overlap = splits(0).select("doc_id").intersect(splits(1).select("doc_id")).count() +
      splits(0).select("doc_id").intersect(splits(2).select("doc_id")).count() +
      splits(1).select("doc_id").intersect(splits(2).select("doc_id")).count()
    assert(overlap == 0)
  }

  test("splitLabels assigns exactly like hashSplit in one pass") {
    val d = docs
    val labeled = Sampling.splitLabels(d, "doc_id", Seq(0.8, 0.1, 0.1), seed = 11L,
        names = Seq("train", "val", "test"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val splits = Sampling.hashSplit(d, "doc_id", Seq(0.8, 0.1, 0.1), seed = 11L)
    splits.zip(Seq("train", "val", "test")).foreach { case (df, nm) =>
      df.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
        assert(labeled(id) == nm, s"doc $id: labeled ${labeled(id)}, hashSplit $nm")
      }
    }
    assert(labeled.size == d.count())
  }

  test("portable bucket: splitLabels/hashSplit agree, cover, and reshard-stably") {
    // the sample_hash_split gate variant (md5-derived 60-bit bucket): same
    // agreement + anti-leakage contract as the default xxhash64 bucket
    val d = docs
    val labeled = Sampling.splitLabels(d, "doc_id", Seq(0.8, 0.1, 0.1), seed = 11L,
        names = Seq("train", "val", "test"), portable = true)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val splits = Sampling.hashSplit(d, "doc_id", Seq(0.8, 0.1, 0.1), seed = 11L, portable = true)
    val counts = splits.map(_.count())
    assert(counts.sum == d.count(), "portable splits must cover all rows disjointly")
    splits.zip(Seq("train", "val", "test")).foreach { case (df, nm) =>
      df.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
        assert(labeled(id) == nm, s"doc $id: labeled ${labeled(id)}, hashSplit $nm")
      }
    }
    // reshard stability (the anti-leakage property)
    val trainA = splits(0).select("doc_id").collect().map(_.getLong(0)).toSet
    val trainB = Sampling.hashSplit(d.repartition(13), "doc_id", Seq(0.8, 0.1, 0.1),
        seed = 11L, portable = true)(0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainA == trainB, "portable split membership must not depend on partitioning")
    // and it is a different assignment than the default hash (flag is live)
    val defTrain = Sampling.hashSplit(d, "doc_id", Seq(0.8, 0.1, 0.1), seed = 11L)(0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainA != defTrain)
  }

  test("capPerGroup enforces the cap, deterministically, reshard-stably") {
    val d = docs
    val capped = Sampling.capPerGroup(d, "source", "doc_id", n = 7, seed = 3L)
    val bySource = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) => assert(bySource(src) == math.min(7L, n)) }
    // same selection on a differently-partitioned input
    val ids1 = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.capPerGroup(d.repartition(13), "source", "doc_id", n = 7, seed = 3L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "cap selection must be reshard-stable")
  }

  test("hashSplit is stable under resharding (no train/test leakage)") {
    val a = Sampling.hashSplit(docs, "doc_id", Seq(0.5, 0.5), seed = 3L)
    val b = Sampling.hashSplit(docs.repartition(13), "doc_id", Seq(0.5, 0.5), seed = 3L)
    val trainA = a(0).select("doc_id").collect().map(_.getLong(0)).toSet
    val trainB = b(0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainA == trainB, "split membership must not depend on partitioning")
  }

  test("deterministicK draws exactly k, stable across reruns and reshards") {
    val k = 37
    val s1 = Sampling.deterministicK(docs, "doc_id", k, seed = 5L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicK(docs.repartition(7), "doc_id", k, seed = 5L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.size == k && s1 == s2)
    val other = Sampling.deterministicK(docs, "doc_id", k, seed = 6L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != s1, "different seed should draw a different sample")
  }

  test("deterministicK compiles to a distributed top-k, not a global sort") {
    val plan = Sampling.deterministicK(docs, "doc_id", 10, seed = 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("weighted sampling keeps ~weight fraction, deterministically") {
    import org.apache.spark.sql.functions.lit
    val w9 = docs.withColumn("w", lit(0.9))
    val w1 = docs.withColumn("w", lit(0.1))
    val n9 = Sampling.weightedSample(w9, "doc_id", "w", seed = 21L).count()
    val n1 = Sampling.weightedSample(w1, "doc_id", "w", seed = 21L).count()
    assert(math.abs(n9 - 450) < 50, s"w=0.9 kept $n9/500")
    assert(math.abs(n1 - 50) < 40, s"w=0.1 kept $n1/500")
    // reshard stability
    val a = Sampling.weightedSample(w9, "doc_id", "w", seed = 21L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(w9.repartition(11), "doc_id", "w", seed = 21L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // weight 1.0 keeps everything, 0.0 keeps nothing
    assert(Sampling.weightedSample(docs.withColumn("w", lit(1.0)), "doc_id", "w", 3L).count() == 500)
    assert(Sampling.weightedSample(docs.withColumn("w", lit(0.0)), "doc_id", "w", 3L).count() == 0)
  }

  test("stratified sampling respects per-stratum fractions") {
    val fr = Map("src0" -> 1.0, "src1" -> 0.0)
    val out = Sampling.stratified(docs, "source", fr, seed = 9L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("src0") == full("src0")) // fraction 1.0 keeps everything
    assert(!out.contains("src1")) // fraction 0.0 and unlisted strata drop
    assert(out.keySet == Set("src0"))
  }

  test("tokenMixture hits the token budget in expectation and drops unlisted sources") {
    import graft.functions.{TextFunctions => T}
    val d = QueryPack.t(spark, sf("sf0.01"), "documents")
      .withColumn("n_tok", T.tokenCount(col("text")).cast("long"))
    val totals = d.groupBy("source").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // src0 modest budget; src1 oversubscribed (clamps to keep-all)
    val huge = totals("src1") * 10.0
    val kept = Sampling.tokenMixture(d, "doc_id", "n_tok", "source",
      Map("src0" -> 600.0, "src1" -> huge), seed = 23L)
    val bySrc = kept.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_tok").as("tok"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(bySrc.keySet == Set("src0", "src1"), s"unlisted sources leaked: ${bySrc.keySet}")
    // oversubscribed source clamps to rate 1 -> everything kept
    assert(bySrc("src1")._2 == totals("src1"))
    // modest budget: kept tokens within a loose band of the 600 target
    // (Bernoulli on ~25 docs; the gate pins the exact deterministic value)
    val tok0 = bySrc("src0")._2
    assert(tok0 > 150 && tok0 < 1200, s"src0 kept $tok0 tokens vs 600 target")
    // reshard stability: same decisions under a different layout
    val re = Sampling.tokenMixture(d.repartition(13), "doc_id", "n_tok", "source",
        Map("src0" -> 600.0, "src1" -> huge), seed = 23L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(re == kept.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("tokenMixture drops listed sources with null or zero token sums") {
    import spark.implicits._
    // srcN: all-null token counts (sum -> NULL); srcZ: all-zero (sum -> 0);
    // srcG: normal. Without the rate guard, least() null-skips (and x/0
    // -> +Inf clamps) both pathological sources to rate 1.0 — keep-all.
    val d = ((0L until 20L).map(i => (i, "srcN", null.asInstanceOf[java.lang.Long])) ++
      (100L until 120L).map(i => (i, "srcZ", java.lang.Long.valueOf(0L))) ++
      (200L until 220L).map(i => (i, "srcG", java.lang.Long.valueOf(50L))))
      .toDF("doc_id", "source", "n_tok")
    val kept = Sampling.tokenMixture(d, "doc_id", "n_tok", "source",
        Map("srcN" -> 500.0, "srcZ" -> 500.0, "srcG" -> 500.0), seed = 5L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("srcN"), s"null-token source kept rows: $kept")
    assert(!kept.contains("srcZ"), s"zero-token source kept rows: $kept")
    assert(kept.get("srcG").exists(_ > 0L), s"healthy source lost all rows: $kept")
  }

  test("tokenMixtureUpsample: rate>1 repeats deterministically; rate<=1 matches tokenMixture") {
    import spark.implicits._
    // srcU: 20 docs x 10 tokens = 200; budget 460 -> rate 2.3 (2 full
    // copies + a 0.3 fractional). srcD: rate 0.5. srcN: null tokens.
    val d = ((0L until 20L).map(i => (i, "srcU", java.lang.Long.valueOf(10L))) ++
      (100L until 120L).map(i => (i, "srcD", java.lang.Long.valueOf(10L))) ++
      (200L until 210L).map(i => (i, "srcN", null.asInstanceOf[java.lang.Long])))
      .toDF("doc_id", "source", "n_tok")
    val budgets = Map("srcU" -> 460.0, "srcD" -> 100.0, "srcN" -> 500.0)
    val out = Sampling.tokenMixtureUpsample(d, "doc_id", "n_tok", "source", budgets, seed = 7L)
    val byDoc = out.groupBy("doc_id", "source").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every srcU doc appears 2 or 3 times; total extra fraction ~0.3
    val uCounts = byDoc.filter(_._2 == "srcU").map(_._3)
    assert(uCounts.nonEmpty && uCounts.forall(c => c == 2L || c == 3L), uCounts.toSeq.toString)
    val uTotal = uCounts.sum
    assert(uTotal > 40L && uTotal < 60L, s"expected ~46 srcU rows, got $uTotal")
    // null-token source keeps nothing; epoch is always 0 for rate <= 1
    assert(!byDoc.exists(_._2 == "srcN"))
    assert(out.where($"source" === "srcD").select("epoch").collect()
      .forall(_.getInt(0) == 0))
    // degenerate equality: for rate <= 1 sources, the kept DOC SET matches
    // tokenMixture under the same seed
    val up = out.where($"source" === "srcD").select("doc_id").collect().map(_.getLong(0)).toSet
    val base = Sampling.tokenMixture(d, "doc_id", "n_tok", "source", budgets, seed = 7L)
      .where($"source" === "srcD").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(up == base)
    // reshard stability: identical multiset after a repartition
    val re = Sampling.tokenMixtureUpsample(d.repartition(13), "doc_id", "n_tok", "source",
        budgets, seed = 7L)
      .groupBy("doc_id", "source").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(re == byDoc.toSet)
  }

  test("temperatureMixture: alpha=1 is natural proportions, alpha<1 upweights small sources") {
    import spark.implicits._
    // two sources, 9:1 token ratio; per-doc 10 tokens
    val d = ((0 until 90).map(i => (s"a$i", "big", 10L)) ++
      (0 until 10).map(i => (s"b$i", "small", 10L)))
      .toDF("id", "src", "tok")
    // alpha=1: q_i = n_i / total, so rate_i = budget / total for EVERY
    // source — uniform keep across the corpus
    val r1 = Sampling.temperatureMixture(d, "id", "tok", "src",
      alpha = 1.0, budgetTokens = 500.0, seed = 3L)
    val k1 = r1.groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected: every doc kept with rate 0.5 regardless of source
    assert(math.abs(k1.getOrElse("big", 0L) / 90.0 - k1.getOrElse("small", 0L) / 10.0) < 0.35,
      s"alpha=1 keep fractions should match across sources: $k1")

    // alpha=0.5: tempered share of the small source is sqrt(100)/(sqrt(900)+sqrt(100))
    // = 1/4 of the mix vs 1/10 naturally -> its keep RATE must exceed the
    // big source's (2.5x in expectation)
    val r5 = Sampling.temperatureMixture(d, "id", "tok", "src",
      alpha = 0.5, budgetTokens = 500.0, seed = 3L)
    val k5 = r5.groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bigRate = k5.getOrElse("big", 0L) / 90.0
    val smallRate = k5.getOrElse("small", 0L) / 10.0
    assert(smallRate > bigRate,
      s"alpha<1 must upweight the small source: big=$bigRate small=$smallRate")
  }

  test("temperatureMixture is reshard-stable and drops zero-token sources") {
    import spark.implicits._
    val d = ((0 until 50).map(i => (s"a$i", "x", 5L)) ++
      (0 until 50).map(i => (s"b$i", "dead", 0L)))
      .toDF("id", "src", "tok")
    val once = Sampling.temperatureMixture(d, "id", "tok", "src",
      alpha = 0.7, budgetTokens = 100.0, seed = 9L)
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    val reshard = Sampling.temperatureMixture(d.repartition(13), "id", "tok", "src",
      alpha = 0.7, budgetTokens = 100.0, seed = 9L)
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(once == reshard, "keep set must not depend on physical layout")
    assert(once.forall(_.startsWith("a")), "a zero-token source keeps nothing")
  }
}
