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
  * Scale shape: one groupBy over the corpus's bigrams builds the frequency
  * table (shuffles (bigram, count) pairs — bounded by vocabulary², in
  * practice far smaller than the corpus); one join keyed on bigram attaches
  * counts to each doc's bigrams (the doc side shuffles once); one per-doc
  * aggregate reduces to three integers. No driver-side state at any size.
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
    val corpusCounts = docBigrams.groupBy("bg").agg(count(lit(1)).as("bg_docs"))
    docBigrams.join(corpusCounts, "bg")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(when(col("bg_docs") <= rareThreshold, lit(1))).as("n_rare"))
      .select(col("id"), col("n_bigrams"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_bigrams").cast("double")).as("novelty"))
  }
}
