package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. '16, arXiv:1508.07909) —
  * the real-merge-table upgrade over [[TextFunctions.subwordCount]]'s
  * regex heuristic, for token-budget accounting and sequence packing in a
  * training-data pipeline.
  *
  * Scale story: training fits on a bounded seeded sample collected to the
  * driver (the [[graft.operators.Similarity]] quantizer pattern — a seeded
  * random sort key + limit compiles to TakeOrderedAndProject, so the sample
  * is uniform in ONE corpus pass with no shuffle and no count()); encoding
  * is map-only — the merge table broadcasts once and each executor keeps a
  * bounded word->pieces memo (web text repeats words heavily, so the
  * amortized per-word cost is a cache hit). Nothing about the corpus ever
  * shuffles for either phase.
  *
  * Tokenization model: text is normalized ([[TextFunctions.normText]]) and
  * split on single spaces; each word becomes its character symbols plus a
  * trailing [[Eow]] marker, and learned merges apply greedily by rank (all
  * occurrences of the lowest-rank adjacent pair per pass — the standard
  * apply order). Characters never seen in training pass through unmerged,
  * so encoding is total and decode(encode(x)) == x for every normalized
  * input — the property the `text_bpe_roundtrip` gate pins per document.
  */
object Bpe {

  /** End-of-word marker, its own trailing symbol: "low" -> l o w </w>.
    * Decode is then a codegen'd concat + replace — no UDF on the read side.
    */
  val Eow = "</w>"

  /** A learned merge list, highest-priority first. */
  final case class BpeModel(merges: Seq[(String, String)])

  /** Deterministic BPE training on a seeded uniform sample of `df`.
    * Merges stop early when no adjacent pair repeats (count < 2) — merging
    * singletons would just memorize the sample tail. Deterministic in the
    * corpus CONTENT, not its partitioning: the sampled words are
    * frequency-counted and sorted before the merge loop, and count ties
    * break lexicographically.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      sampleSize: Int = 4096): BpeModel = {
    // content-hash sort key, not rand(seed): rand streams are seeded per
    // PARTITION, so the sample (and the learned merges) would depend on how
    // the corpus happens to be partitioned; xxhash64 of the text is a
    // pseudo-random uniform order that is a pure function of content.
    // orderBy+limit still compiles to TakeOrderedAndProject — bounded heap
    // per partition, no shuffle, one corpus pass.
    val sample = df
      .select(TextFunctions.normText(col(textCol)).as("__t"))
      .where(length(col("__t")) > 0)
      .orderBy(xxhash64(col("__t")), col("__t"))
      .limit(sampleSize)
      .collect().map(_.getString(0))
    val freq = new scala.collection.mutable.HashMap[String, Long]()
    for (t <- sample; w <- t.split(' ') if w.nonEmpty)
      freq.update(w, freq.getOrElse(w, 0L) + 1L)
    var words: Array[(Array[String], Long)] = freq.toArray.sortBy(_._1)
      .map { case (w, n) => (w.map(_.toString).toArray :+ Eow, n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, n) <- words; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts.update(p, counts.getOrElse(p, 0L) + n)
      }
      val best = counts.iterator.reduceOption { (a, b) =>
        if (a._2 > b._2) a
        else if (a._2 < b._2) b
        else if (implicitly[Ordering[(String, String)]].lt(a._1, b._1)) a else b
      }
      best match {
        case Some((pair, n)) if n >= 2 =>
          merges += pair
          words = words.map { case (syms, f) => (mergeAll(syms, pair), f) }
        case _ => exhausted = true
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Merge every non-overlapping occurrence of `pair`, left to right. */
  private def mergeAll(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy rank-order encoding of one word (symbols incl. trailing Eow):
    * repeatedly merge all occurrences of the lowest-rank adjacent pair.
    */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ Eow
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = mergeAll(syms, bestPair)
    }
    syms
  }

  /** Rebuilds the rank map and the word memo once per executor (lazily),
    * not per row; the memo is size-capped so a pathological corpus of
    * all-distinct words cannot grow it without bound.
    */
  private final class Encoder(
      bc: org.apache.spark.broadcast.Broadcast[Array[(String, String)]])
      extends (String => Seq[String]) with Serializable {
    @transient private lazy val ranks: Map[(String, String), Int] =
      bc.value.zipWithIndex.toMap
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    def apply(text: String): Seq[String] = {
      if (text == null) return null
      // split with limit -1 keeps trailing empty words, and empty words
      // encode to a bare Eow piece rather than vanishing: normText output
      // can carry a leading/trailing space (Spark trim strips only ' ',
      // so "\thello" normalizes to " hello"), and dropping the empty word
      // would break decode(encode(x)) == x — the property the roundtrip
      // gate hash-checks
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (w <- text.split(" ", -1)) {
        var p = memo.get(w)
        if (p == null) {
          p = encodeWord(w, ranks)
          if (memo.size < 200000) memo.put(w, p)
        }
        out ++= p
      }
      out.toSeq
    }
  }

  /** Subword pieces of `text` under `model`: array&lt;string&gt;, words
    * normalized and Eow-terminated. Map-only; the merge table broadcasts.
    */
  def pieces(spark: SparkSession, model: BpeModel)(text: Column): Column = {
    val bc = spark.sparkContext.broadcast(model.merges.toArray)
    udf(new Encoder(bc)).apply(TextFunctions.normText(text))
  }

  /** Token count under `model` — the budget number a packing/pricing
    * pipeline actually needs. The bare-Eow pieces that empty words (leading
    * or trailing whitespace residue) contribute exist only so decode can
    * reconstruct the normalized text — they are not budget tokens and are
    * excluded here: an empty doc costs 0, " hello" costs what "hello" costs.
    */
  def tokenCount(spark: SparkSession, model: BpeModel)(text: Column): Column =
    size(filter(pieces(spark, model)(text), p => p =!= lit(Eow)))

  /** Inverse of [[pieces]] for normalized text — pure built-ins (concat +
    * replace + trim), stays in whole-stage codegen. Caveat: text whose
    * CONTENT contains the literal marker string "&lt;/w&gt;" decodes that
    * substring to a space (the classic in-band-marker limitation of
    * Sennrich-style BPE; byte-level variants avoid it at the cost of
    * byte-mangled pieces).
    */
  def decodePieces(piecesCol: Column): Column =
    // strip exactly ONE trailing space (the final word's Eow), not trim:
    // a leading empty word (normText of "\thello" is " hello") must decode
    // back to its leading space for the roundtrip property to hold
    regexp_replace(regexp_replace(concat_ws("", piecesCol), Eow, " "), " $", "")

  /** Persistence round-trip: (rank, left, right) rows. */
  def modelToDF(spark: SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }.toDF("rank", "left", "right")
  }

  def modelFromDF(df: DataFrame): BpeModel =
    BpeModel(df.orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq)
}
