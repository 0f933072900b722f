package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Multinomial Naive Bayes text classification — the closed-form stand-in
  * for the fastText-style quality/domain classifiers a curation pipeline
  * trains on seed labels (CCNet's "looks like Wikipedia" filter shape).
  * Training is nothing but counting, so unlike SGD models it is exactly
  * reproducible, trivially distributed, and — with the same
  * rounded-decimal-term discipline as [[CorpusStats.bigramScore]] —
  * hash-checkable against an independent SQL engine.
  *
  * Model tables (all plain DataFrames, parquet-persistable):
  * `tokenCounts` (label, w, cnt), `classTotals` (label, n_docs, n_tokens),
  * `vocab` (single row __v = distinct train token count).
  *
  * Scale shape: training is one keyed aggregate over (label, token) plus
  * two small reductions. Scoring explodes doc tokens once, joins the
  * model on token (the model side is vocab x classes — reduced long before
  * the join; Catalyst broadcasts it when small), crosses each token row
  * with the class list (bounded fan-out: |classes|), and runs one
  * (doc, label) aggregate plus a per-doc argmax window. The corpus text
  * shuffles once, as tokens.
  */
object Classify {

  final case class NaiveBayesModel(tokenCounts: DataFrame, classTotals: DataFrame,
      vocab: DataFrame)

  def nbTrain(df: DataFrame, labelCol: String, textCol: String): NaiveBayesModel = {
    // null text carries no tokens, so a null-text doc cannot influence the
    // likelihoods — excluding it from the PRIOR counts too keeps the model
    // well-defined (and keeps n_docs derivable from the token stream, the
    // form an independent SQL oracle naturally computes)
    val docs = df.where(col(textCol).isNotNull)
    val toks = docs.select(col(labelCol).as("label"),
      explode(T.tokens(col(textCol))).as("w"))
    val tokenCounts = toks.groupBy(col("label"), col("w")).agg(count(lit(1)).as("cnt"))
    val classTotals = docs.select(col(labelCol).as("label"), size(T.tokens(col(textCol))).as("__n"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
    val vocab = toks.agg(countDistinct(col("w")).as("__v"))
    NaiveBayesModel(tokenCounts, classTotals, vocab)
  }

  /** Per-doc class prediction: argmax over labels of
    * log2 P(label) + sum over tokens of log2 P(token|label), with add-one
    * smoothing — P(token|label) = (cnt+1)/(n_tokens + V + 1), prior =
    * n_docs_label / n_docs_total. Ties break toward the smaller label.
    *
    * Exactness-portability: every log term (priors included) rounds to 9
    * decimals and sums as DECIMAL, so scores are partitioning-invariant
    * and the argmax is engine-exact given terms agree — the same
    * cross-libm argument as [[CorpusStats.bigramScore]], with the
    * boundary-distance check for the gate corpus in ClassifySuite.
    *
    * @return (id, label, score) — score = the winning class's rounded
    *         log2-joint, a ranking signal (confidence needs the softmax
    *         over all classes, deliberately not emitted).
    */
  def nbPredict(model: NaiveBayesModel, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // precision 20, not 28: sum(decimal(20,9)) widens to decimal(30,9) and
    // adding the prior lands at decimal(31,9) — still inside Spark's 38-digit
    // ceiling. With 28 the sum hits decimal(38,9) and the final addition
    // OVERFLOWS precision, silently dropping the scale to 8 and shearing the
    // ninth decimal off every score. 20 digits still hold |score| < 1e10 —
    // far beyond any log-joint over a document.
    val dec = "decimal(20,9)"
    val labels = model.classTotals.select(col("label"), col("n_docs"), col("n_tokens"))
    val totalDocs = model.classTotals.agg(sum(col("n_docs")).as("__nd"))
    // (label, prior_term, n_tokens) with the prior already rounded-decimal
    val priors = labels.crossJoin(broadcast(totalDocs))
      .crossJoin(broadcast(model.vocab))
      .select(col("label"), col("n_tokens"), col("__v"),
        round(log(2.0, col("n_docs").cast("double") / col("__nd").cast("double")), 9)
          .cast(dec).as("__prior"))
    // null-text docs carry no tokens and are not scored (explode drops
    // them) — mirror nbTrain's treatment rather than inventing a prior-only
    // score for them
    val docToks = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(T.tokens(col(textCol))).as("w"))
    // every (doc token, label) pair: bounded fan-out of |classes|
    val perLabel = docToks.crossJoin(broadcast(priors))
      .join(model.tokenCounts, Seq("label", "w"), "left")
      .select(col("id"), col("label"), col("__prior"),
        round(log(2.0,
          (coalesce(col("cnt"), lit(0L)) + lit(1)).cast("double") /
            (col("n_tokens") + col("__v") + lit(1)).cast("double")), 9)
          .cast(dec).as("__t"))
    val scored = perLabel.groupBy(col("id"), col("label"))
      .agg((first(col("__prior")) + sum(col("__t"))).as("__score"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("__score").desc, col("label").asc)
    scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("id"), col("label"),
        col("__score").cast("double").as("score"))
  }
}
