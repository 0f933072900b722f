package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => F, TextFunctions => T}

/** Corpus-level statistical scoring for curation: how typical or novel is
  * each document relative to the corpus it sits in?
  *
  * This is the integer-exact cousin of LM-perplexity filtering: instead of
  * log-probabilities (whose floating accumulation is engine- and
  * order-dependent), documents are scored by the FRACTION of their bigrams
  * that are corpus-rare — exact integer counts and one final division, so
  * the result is bit-identical across engines and oracle-checkable. High
  * novelty flags both valuable out-of-distribution text and garbage; low
  * novelty flags boilerplate — both ends are standard curation cut points.
  *
  * Scale shape: the corpus-wide frequency attaches via a count window over
  * the bigram key, so the corpus is SCANNED ONCE and the (id, bigram) rows
  * shuffle once on bigram — the naive groupBy-then-join formulation would
  * scan the corpus twice and shuffle the heavy doc-bigram side twice
  * (verified in the plan: one FileScan, no second bigram exchange). The
  * per-doc aggregate then reduces to three integers. No driver-side state
  * at any size.
  */
object CorpusStats {

  /** Per-document novelty: (id, n_bigrams, n_rare, novelty) where a bigram
    * is "rare" when it occurs at most `rareThreshold` times corpus-wide
    * (counting one occurrence per document — presence, not multiplicity, so
    * a single spammy doc cannot make its own bigrams look common).
    */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
      rareThreshold: Long = 2L): DataFrame = {
    val docBigrams = df.select(col(idCol).as("id"),
      explode(array_distinct(F.word_shingles(T.tokens(col(textCol)), 2))).as("bg"))
    val byBigram = org.apache.spark.sql.expressions.Window.partitionBy(col("bg"))
    docBigrams.withColumn("bg_docs", count(lit(1)).over(byBigram))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(when(col("bg_docs") <= rareThreshold, lit(1))).as("n_rare"))
      .select(col("id"), col("n_bigrams"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_bigrams").cast("double")).as("novelty"))
  }

  /** A trained add-one-smoothed bigram language model, all-DataFrame so it
    * persists as three parquet tables and rehydrates by name:
    * `bigrams` (w1, w2, c2), `contexts` (w1, c1 = sum of c2 over w2), and
    * the single-row `vocab` (__v = distinct train token count).
    */
  final case class BigramLM(bigrams: DataFrame, contexts: DataFrame, vocab: DataFrame)

  /** STRICT bigram rows (w1, w2), prefixed with the id columns in `keep` —
    * empty for docs under two tokens (unlike the minhash shingles, which
    * fall back to the whole text so short docs stay dedupable; an LM must
    * not score a fake bigram). zip_with over two slices is map-only — no
    * window, no shuffle.
    */
  private def bigramRows(df: DataFrame, textCol: String,
      keep: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val tk = T.tokensOf(df, textCol)
    df.select(keep :+ explode(zip_with(
        slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
        slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("z"): _*)
      .withColumn("w1", col("z.w1")).withColumn("w2", col("z.w2")).drop("z")
  }

  /** Train bigram counts on `df` — the KenLM-shaped quality signal behind
    * CCNet-style perplexity filtering, kept to order 2 so the model is one
    * keyed aggregate. Scale shape: the token stream shuffles ONCE on the
    * bigram key; `contexts` is an aggregate over the (already reduced)
    * model and `vocab` over distinct tokens — no driver-side state at any
    * size, and the three model tables persist/rehydrate as plain parquet.
    */
  def bigramTrain(df: DataFrame, textCol: String): BigramLM = {
    val bigrams = bigramRows(df, textCol, Seq.empty)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val contexts = bigrams.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vocab = df.select(explode(T.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("__v"))
    BigramLM(bigrams, contexts, vocab)
  }

  /** Per-doc cross-entropy (bits/bigram) of `docs` under `lm` with add-one
    * smoothing: P(w2|w1) = (c2+1) / (c1 + V + 1), V = train vocab size (the
    * +1 reserves an out-of-vocabulary type). Returns (id, n_bigrams,
    * xent_bits, ppl); docs with fewer than two tokens drop out (no bigram
    * to score — filter upstream if they must be kept).
    *
    * Exactness-portability: each per-bigram log term is rounded to 9
    * decimals and summed as DECIMAL — floating log/division are identical
    * up to ulps across engines, the rounding absorbs those ulps, and the
    * decimal sum is order-independent, so the score is reproducible
    * bit-for-bit under any partitioning (and hash-checkable against an
    * independent SQL engine — the `text_bigram_xent` gate). Scale shape:
    * two keyed joins on (w1[,w2]) — the model side reduces first, the doc
    * side shuffles once — then one per-doc aggregate; the single-row vocab
    * frame broadcasts.
    */
  def bigramScore(lm: BigramLM, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = bigramRows(docs, textCol, Seq(col(idCol).as("id")))
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(lm.contexts, Seq("w1"), "left")
      .crossJoin(broadcast(lm.vocab))
      .select(col("id"),
        round(log(2.0,
          (coalesce(col("c2"), lit(0L)) + lit(1)).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("__v") + lit(1)).cast("double")),
          9).cast("decimal(28,9)").as("__t"))
    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__t")).as("__s"))
      .select(col("id"), col("n_bigrams"),
        round((-col("__s")).cast("double") / col("n_bigrams"), 6).as("xent_bits"))
      .withColumn("ppl", round(pow(lit(2.0), col("xent_bits")), 4))
  }

  /** An interpolated Kneser-Ney bigram model (Kneser & Ney '95; the
    * smoothing KenLM defaults to and CCNet ships): on top of the plain
    * counts it carries per-context distinct-successor counts (`n1p`),
    * per-word continuation counts (`cont` = distinct preceding contexts),
    * and a single-row `stats` frame with the absolute discount
    * `D = n1 / (n1 + 2 n2)` (estimated from the count-of-counts, the
    * standard closed form), the bigram-type total `B`, and the vocab size
    * `V`. All-DataFrame, so the model persists/rehydrates as parquet.
    */
  final case class KnBigramLM(bigrams: DataFrame, contexts: DataFrame,
      continuations: DataFrame, stats: DataFrame)

  /** Train an interpolated KN bigram model — same one-shuffle scale shape
    * as [[bigramTrain]]: the token stream shuffles once on the bigram key;
    * every other table is an aggregate of the already-reduced model.
    */
  def knTrain(df: DataFrame, textCol: String): KnBigramLM = {
    val bigrams = bigramRows(df, textCol, Seq.empty)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val contexts = bigrams.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1p"))
    val continuations = bigrams.groupBy(col("w2")).agg(count(lit(1)).as("cont"))
    val vocab = df.select(explode(T.tokensOf(df, textCol)).as("w"))
      .agg(countDistinct(col("w")).as("__v"))
    val stats = bigrams.agg(
        count(lit(1)).as("__b"),
        count(when(col("c2") === 1, lit(1))).as("__n1"),
        count(when(col("c2") === 2, lit(1))).as("__n2"))
      .crossJoin(broadcast(vocab))
      .select(col("__b"), col("__v"),
        // count-of-counts discount estimate; an all-counts->1 corpus would
        // give D=1 (every bigram mass discounted to the continuation
        // distribution) which stays well-defined, and an empty n1 falls
        // back to the textbook 0.75
        when(col("__n1") + lit(2) * col("__n2") > 0,
          col("__n1").cast("double") / (col("__n1") + lit(2) * col("__n2")).cast("double"))
          .otherwise(lit(0.75)).as("__d"))
    KnBigramLM(bigrams, contexts, continuations, stats)
  }

  /** Per-doc cross-entropy (bits/bigram) under interpolated Kneser-Ney:
    *
    *   P(w2|w1) = max(c2 - D, 0)/c1  +  (D * n1p(w1) / c1) * Pcont(w2)
    *   Pcont(w2) = (cont(w2) + 1) / (B + V + 1)
    *
    * with an unseen context backing off to `Pcont` alone. The `+1 / +V+1`
    * on the continuation distribution reserves out-of-vocabulary mass —
    * the same convention [[bigramScore]]'s add-one uses, keeping every
    * probability strictly positive without a <unk> retraining pass.
    *
    * Same exactness-portability discipline as [[bigramScore]] (9-decimal
    * rounded log terms, decimal sum — the `text_kn_xent` gate
    * hash-checks it against DuckDB), and the same scale shape plus ONE
    * extra keyed join on w2 for the continuation counts.
    */
  def knScore(lm: KnBigramLM, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pcont = (coalesce(col("cont"), lit(0L)) + lit(1)).cast("double") /
      (col("__b") + col("__v") + lit(1)).cast("double")
    // explicit coalesce: engines disagree on whether GREATEST skips nulls,
    // so the unseen-bigram case (c2 null, context seen) must not rely on it
    val seen = greatest(coalesce(col("c2"), lit(0L)).cast("double") - col("__d"), lit(0.0)) /
      col("c1").cast("double") +
      col("__d") * col("n1p").cast("double") / col("c1").cast("double") * pcont
    val p = when(col("c1").isNotNull, seen).otherwise(pcont)
    val scored = bigramRows(docs, textCol, Seq(col(idCol).as("id")))
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(lm.contexts, Seq("w1"), "left")
      .join(lm.continuations, Seq("w2"), "left")
      .crossJoin(broadcast(lm.stats))
      .select(col("id"), round(log(2.0, p), 9).cast("decimal(28,9)").as("__t"))
    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__t")).as("__s"))
      .select(col("id"), col("n_bigrams"),
        round((-col("__s")).cast("double") / col("n_bigrams"), 6).as("xent_bits"))
      .withColumn("ppl", round(pow(lit(2.0), col("xent_bits")), 4))
  }

  /** DSIR-shaped importance weights (Xie '23, "Data Selection via Importance
    * Resampling"): score each doc under a TARGET-domain LM and a RAW-corpus
    * LM; the per-bigram log-likelihood ratio `llr_rate = xent_raw -
    * xent_target` (bits/bigram, positive = looks more like the target than
    * the background) maps to a keep weight `clamp01(0.5 + llr_rate/scale)`.
    * The paper uses the exponential ratio on hashed-ngram features; the
    * linearized map is monotone in the same statistic and — unlike
    * `exp2`, whose libm last-ulp may differ across engines — stays inside
    * the exact-decimal discipline that makes the score hash-checkable
    * (the pipeline_dsir gate). The weight is deliberately UNROUNDED:
    * clamp/add/divide on the engine-identical llr doubles are
    * IEEE-deterministic, whereas a 6-decimal rounding of `0.5 + llr/4`
    * creates EXACT half-way ties (llr*1e6 ≡ 2 mod 4) that Spark
    * (BigDecimal HALF_UP) and DuckDB (binary std::round) resolve
    * differently. Feed the weight to [[Sampling.weightedSample]] for the
    * reshard-stable keep decision.
    *
    * Scale shape: ONE tokenize+explode pass over the docs, left-joined to
    * both models' tables (the doc-bigram side is the heavy one at curation
    * scale — scoring per-LM would scan and shuffle it twice), both
    * single-row vocab frames broadcast, one per-doc aggregate. Per-LM
    * terms and the final rounding sequence are byte-identical to two
    * [[bigramScore]] passes (asserted in CorpusStatsSuite).
    */
  def dsirWeights(target: BigramLM, raw: BigramLM, docs: DataFrame,
      idCol: String, textCol: String, scale: Double = 4.0): DataFrame = {
    require(scale > 0)
    def term(c2: Column, c1: Column, v: Column): Column =
      round(log(2.0, (coalesce(c2, lit(0L)) + lit(1)).cast("double") /
        (coalesce(c1, lit(0L)) + v + lit(1)).cast("double")), 9).cast("decimal(28,9)")
    val scored = bigramRows(docs, textCol, Seq(col(idCol).as("id")))
      .join(target.bigrams.select(col("w1"), col("w2"), col("c2").as("__c2t")),
        Seq("w1", "w2"), "left")
      .join(target.contexts.select(col("w1"), col("c1").as("__c1t")), Seq("w1"), "left")
      .join(raw.bigrams.select(col("w1"), col("w2"), col("c2").as("__c2r")),
        Seq("w1", "w2"), "left")
      .join(raw.contexts.select(col("w1"), col("c1").as("__c1r")), Seq("w1"), "left")
      .crossJoin(broadcast(target.vocab.select(col("__v").as("__vt"))))
      .crossJoin(broadcast(raw.vocab.select(col("__v").as("__vr"))))
      .select(col("id"),
        term(col("__c2t"), col("__c1t"), col("__vt")).as("__tt"),
        term(col("__c2r"), col("__c1r"), col("__vr")).as("__tr"))
    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__tt")).as("__st"), sum(col("__tr")).as("__sr"))
      .select(col("id"), col("n_bigrams"),
        round((-col("__st")).cast("double") / col("n_bigrams"), 6).as("__xt"),
        round((-col("__sr")).cast("double") / col("n_bigrams"), 6).as("__xr"))
      .select(col("id"), col("n_bigrams"),
        round(col("__xr") - col("__xt"), 6).as("llr_rate"))
      .withColumn("weight",
        least(lit(1.0), greatest(lit(0.0), lit(0.5) + col("llr_rate") / scale)))
  }
}
