package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo '18, arXiv:1804.10959 — the model
  * behind SentencePiece's default): a piece vocabulary with probabilities,
  * trained by EM over the segmentation lattice and pruned to size; encoding
  * is the Viterbi-best segmentation. Complements [[Bpe]] (greedy merges)
  * with the probabilistic tokenizer family — the two cover the algorithms
  * real pipelines budget tokens with.
  *
  * Scale story mirrors [[Bpe]] exactly: training fits on a bounded
  * content-hash-ordered sample collected to the driver (one corpus pass,
  * TakeOrderedAndProject, no shuffle); encoding is map-only — the
  * (piece -> log prob) table broadcasts once and each executor memoizes
  * word segmentations. Nothing about the corpus ever shuffles.
  *
  * Tokenization model: [[TextFunctions.normText]] + single-space split,
  * each word Viterbi-segmented independently and terminated with the
  * shared [[Bpe.Eow]] marker piece, so [[Bpe.decodePieces]] is the decoder
  * and decode(encode(x)) == normText(x) for EVERY input — single
  * characters are never pruned from the vocabulary and unseen characters
  * segment through a floor log-probability, so encoding is total. The
  * `text_unigram_roundtrip` gate pins the property per document.
  */
object Unigram {

  /** A trained unigram model: piece -> natural-log probability. Single
    * characters of the training sample are always present.
    */
  final case class UnigramModel(pieces: Seq[(String, Double)])

  /** Floor log-prob for characters outside the vocabulary — low enough
    * that any in-vocabulary segmentation wins, high enough to never
    * underflow a word's Viterbi sum.
    */
  private val FloorLogP = -30.0

  /** Deterministic unigram training: seed vocabulary = the `seedSize` most
    * frequent substrings (length <= `maxPieceLen`) of a content-hash
    * sample plus every single character, then `emRounds` rounds of
    * { 2 EM steps; prune the weakest `pruneFrac` of multi-char pieces by
    * expected count } until at most `vocabSize` pieces remain, then a
    * final EM step. All arithmetic is driver-side IEEE on a
    * deterministically-ordered sample, so the model is a pure function of
    * corpus content — partitioning cannot change it.
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      sampleSize: Int = 4096, maxPieceLen: Int = 6, seedSize: Int = 4000,
      emRounds: Int = 4, pruneFrac: Double = 0.25): UnigramModel = {
    require(vocabSize > 0 && maxPieceLen >= 1)
    val sample = df
      .select(TextFunctions.normText(col(textCol)).as("__t"))
      .where(length(col("__t")) > 0)
      .orderBy(xxhash64(col("__t")), col("__t"))
      .limit(sampleSize)
      .collect().map(_.getString(0))
    val freq = new scala.collection.mutable.HashMap[String, Long]()
    for (t <- sample; w <- t.split(' ') if w.nonEmpty)
      freq.update(w, freq.getOrElse(w, 0L) + 1L)
    val words: Array[(String, Long)] = freq.toArray.sortBy(_._1)
    require(words.nonEmpty, "unigram training needs at least one non-empty word")

    // seed: substring counts weighted by word frequency
    val subCounts = new scala.collection.mutable.HashMap[String, Long]()
    for ((w, n) <- words; i <- 0 until w.length;
         j <- (i + 1) to math.min(w.length, i + maxPieceLen))
      subCounts.update(w.substring(i, j), subCounts.getOrElse(w.substring(i, j), 0L) + n)
    val chars: Set[String] = words.flatMap(_._1.map(_.toString)).toSet
    val multi = subCounts.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (p, n) => (-n, p) }.take(math.max(0, seedSize - chars.size))
    var vocab: Array[String] = (chars.toArray ++ multi.map(_._1)).sorted
    var logp: Map[String, Double] = {
      val tot = vocab.map(p => subCounts.getOrElse(p, 1L)).sum.toDouble
      vocab.map(p => p -> math.log(subCounts.getOrElse(p, 1L) / tot)).toMap
    }

    /** One E-step: expected piece counts over the word lattices
      * (forward-backward in log space) plus the total data log-likelihood.
      */
    def eStep(): (scala.collection.mutable.HashMap[String, Double], Double) = {
      val counts = new scala.collection.mutable.HashMap[String, Double]()
      val pieceSet = logp
      var ll = 0.0
      def lse(a: Double, b: Double): Double =
        if (a == Double.NegativeInfinity) b
        else if (b == Double.NegativeInfinity) a
        else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
      for ((w, n) <- words) {
        val L = w.length
        val alpha = Array.fill(L + 1)(Double.NegativeInfinity)
        val beta = Array.fill(L + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0; beta(L) = 0.0
        var i = 0
        while (i < L) {
          if (alpha(i) != Double.NegativeInfinity) {
            var j = i + 1
            while (j <= math.min(L, i + maxPieceLen)) {
              pieceSet.get(w.substring(i, j)).foreach { lp =>
                alpha(j) = lse(alpha(j), alpha(i) + lp)
              }
              j += 1
            }
          }
          i += 1
        }
        i = L - 1
        while (i >= 0) {
          var j = i + 1
          while (j <= math.min(L, i + maxPieceLen)) {
            pieceSet.get(w.substring(i, j)).foreach { lp =>
              beta(i) = lse(beta(i), lp + beta(j))
            }
            j += 1
          }
          i -= 1
        }
        val z = alpha(L)
        if (z != Double.NegativeInfinity) {
          ll += n * z
          i = 0
          while (i < L) {
            if (alpha(i) != Double.NegativeInfinity) {
              var j = i + 1
              while (j <= math.min(L, i + maxPieceLen)) {
                val sub = w.substring(i, j)
                pieceSet.get(sub).foreach { lp =>
                  val post = math.exp(alpha(i) + lp + beta(j) - z)
                  counts.update(sub, counts.getOrElse(sub, 0.0) + n * post)
                }
                j += 1
              }
            }
            i += 1
          }
        }
      }
      (counts, ll)
    }

    def mStep(counts: scala.collection.mutable.HashMap[String, Double]): Unit = {
      val tot = vocab.iterator.map(p => math.max(counts.getOrElse(p, 0.0), 1e-12)).sum
      logp = vocab.map(p =>
        p -> math.log(math.max(counts.getOrElse(p, 0.0), 1e-12) / tot)).toMap
    }

    var round = 0
    var lastCounts: scala.collection.mutable.HashMap[String, Double] = null
    while (round < emRounds) {
      var step = 0
      while (step < 2) { val (c, _) = eStep(); mStep(c); lastCounts = c; step += 1 }
      if (vocab.length > vocabSize) {
        // prune the weakest multi-char pieces (single chars are the
        // totality guarantee and never leave)
        val nMulti = vocab.count(_.length > 1)
        val toDrop = math.min(nMulti,
          math.max(vocab.length - vocabSize, (nMulti * pruneFrac).toInt))
        val dropped = vocab.iterator.filter(_.length > 1)
          .map(p => (p, lastCounts.getOrElse(p, 0.0)))
          .toArray.sortBy { case (p, c) => (c, p) }
          .take(toDrop).map(_._1).toSet
        vocab = vocab.filterNot(dropped)
        logp = logp.filterNot { case (p, _) => dropped(p) }
      }
      round += 1
    }
    val (c, _) = eStep(); mStep(c)
    UnigramModel(vocab.map(p => p -> logp(p)).toSeq)
  }

  /** Viterbi-best segmentation of one word. Ties break toward the LATER
    * start (longer final piece) deterministically via strict `>`.
    */
  private[graft] def encodeWord(word: String, lp: Map[String, Double],
      maxPieceLen: Int): Array[String] = {
    val L = word.length
    if (L == 0) return Array(Bpe.Eow)
    val best = Array.fill(L + 1)(Double.NegativeInfinity)
    val back = Array.fill(L + 1)(-1)
    best(0) = 0.0
    var i = 0
    while (i < L) {
      if (best(i) != Double.NegativeInfinity) {
        var j = i + 1
        while (j <= math.min(L, i + maxPieceLen)) {
          val p = lp.getOrElse(word.substring(i, j),
            if (j == i + 1) FloorLogP else Double.NegativeInfinity)
          if (p != Double.NegativeInfinity && best(i) + p > best(j)) {
            best(j) = best(i) + p; back(j) = i
          }
          j += 1
        }
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = L
    while (k > 0) { out += word.substring(back(k), k); k = back(k) }
    (out.reverse += Bpe.Eow).toArray
  }

  private final class Encoder(
      bc: org.apache.spark.broadcast.Broadcast[Array[(String, Double)]],
      maxPieceLen: Int)
      extends (String => Seq[String]) with Serializable {
    @transient private lazy val lp: Map[String, Double] = bc.value.toMap
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    def apply(text: String): Seq[String] = {
      if (text == null) return null
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (w <- text.split(" ", -1)) {
        var p = memo.get(w)
        if (p == null) {
          p = encodeWord(w, lp, maxPieceLen)
          if (memo.size < 200000) memo.put(w, p)
        }
        out ++= p
      }
      out.toSeq
    }
  }

  /** Subword pieces of `text` under `model`: array&lt;string&gt;, words
    * normalized and Eow-terminated ([[Bpe.decodePieces]] decodes). The
    * model's longest piece bounds the lattice edges per position.
    */
  def pieces(spark: SparkSession, model: UnigramModel)(text: Column): Column = {
    val maxLen = math.max(1, model.pieces.iterator.map(_._1.length).max)
    val bc = spark.sparkContext.broadcast(model.pieces.toArray)
    udf(new Encoder(bc, maxLen)).apply(TextFunctions.normText(text))
  }

  /** Budget token count under `model` (Eow markers excluded, like
    * [[Bpe.tokenCount]]).
    */
  def tokenCount(spark: SparkSession, model: UnigramModel)(text: Column): Column =
    size(filter(pieces(spark, model)(text), p => p =!= lit(Bpe.Eow)))

  /** Persistence round-trip: (piece, logp) rows. */
  def modelToDF(spark: SparkSession, model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.pieces.toDF("piece", "logp")
  }

  def modelFromDF(df: DataFrame): UnigramModel =
    UnigramModel(df.orderBy(col("piece")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq)
}
