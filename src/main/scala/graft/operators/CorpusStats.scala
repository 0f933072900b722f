package graft.operators

import org.apache.spark.sql.DataFrame
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
}
