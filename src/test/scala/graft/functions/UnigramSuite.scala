package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

/** Unigram-LM tokenizer (Kudo '18): Viterbi segmentation picks the
  * highest-probability split, EM training is deterministic in content and
  * monotone in likelihood, encoding is total (roundtrip for every doc,
  * including OOV characters), and the model persists.
  */
class UnigramSuite extends SparkTestBase {

  private def docs = QueryPack.t(spark, sf(), "documents")

  test("viterbi picks the higher-probability segmentation") {
    // "ab" as one piece is cheaper than a+b under these probs
    val lp = Map("a" -> math.log(0.1), "b" -> math.log(0.1), "ab" -> math.log(0.3))
    assert(Unigram.encodeWord("ab", lp, 2).toSeq == Seq("ab", Bpe.Eow))
    // flip the odds: now a+b wins
    val lp2 = Map("a" -> math.log(0.4), "b" -> math.log(0.4), "ab" -> math.log(0.1))
    assert(Unigram.encodeWord("ab", lp2, 2).toSeq == Seq("a", "b", Bpe.Eow))
    // OOV character segments through the floor
    assert(Unigram.encodeWord("axb", lp, 2).toSeq == Seq("a", "x", "b", Bpe.Eow))
  }

  test("roundtrip holds for every document, including OOV characters") {
    val model = Unigram.train(docs, "text", vocabSize = 300, sampleSize = 200)
    val p = Unigram.pieces(spark, model)(col("text"))
    val checked = docs
      .select(col("doc_id"), TextFunctions.normText(col("text")).as("__n"), p.as("__p"))
      .select(col("doc_id"), (Bpe.decodePieces(col("__p")) === col("__n")).as("rt"))
    assert(checked.where(!col("rt")).count() == 0, "roundtrip must hold per doc")
    // OOV text (characters the corpus never saw) still round-trips
    import spark.implicits._
    val oov = Seq((1L, "zzz qqéé normal")).toDF("doc_id", "text")
    val o = oov.select(TextFunctions.normText(col("text")).as("__n"),
      Unigram.pieces(spark, model)(col("text")).as("__p"))
      .select((Bpe.decodePieces(col("__p")) === col("__n")).as("rt")).head()
    assert(o.getBoolean(0))
  }

  test("a trained model compresses below the character count") {
    val model = Unigram.train(docs, "text", vocabSize = 300, sampleSize = 200)
    assert(model.pieces.exists(_._1.length > 1), "vocab should hold multi-char pieces")
    val stats = docs.select(
      Unigram.tokenCount(spark, model)(col("text")).cast("long").as("n_pieces"),
      length(regexp_replace(TextFunctions.normText(col("text")), " ", "")).as("n_chars"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("n_words"))
      .agg(sum("n_pieces"), sum("n_chars"), sum("n_words")).head()
    val (pieces, chars, words) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    assert(pieces < chars, s"unigram should beat character tokenization: $pieces vs $chars")
    assert(pieces >= words, "cannot do better than one piece per word")
  }

  test("training is deterministic in content, not partitioning") {
    val m1 = Unigram.train(docs, "text", vocabSize = 200, sampleSize = 100)
    val m2 = Unigram.train(docs.repartition(17), "text", vocabSize = 200, sampleSize = 100)
    assert(m1.pieces == m2.pieces)
  }

  test("model persists and rehydrates to identical pieces") {
    val model = Unigram.train(docs, "text", vocabSize = 200, sampleSize = 100)
    val back = Unigram.modelFromDF(Unigram.modelToDF(spark, model))
    assert(back.pieces.toMap == model.pieces.toMap)
    // rehydrated model encodes identically
    val a = docs.select(Unigram.pieces(spark, model)(col("text")).as("p"))
      .select(md5(to_json(struct(col("p")))).as("h")).collect().map(_.getString(0)).sorted
    val b = docs.select(Unigram.pieces(spark, back)(col("text")).as("p"))
      .select(md5(to_json(struct(col("p")))).as("h")).collect().map(_.getString(0)).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("vocab prunes to the requested size but keeps every character") {
    val model = Unigram.train(docs, "text", vocabSize = 100, sampleSize = 200)
    // chars of the sample all present
    val chars = model.pieces.map(_._1).filter(_.length == 1).toSet
    assert(chars.contains("a") && chars.contains("e"))
    assert(model.pieces.size <= 100 + chars.size,
      s"vocab ${model.pieces.size} far above target")
  }
}
