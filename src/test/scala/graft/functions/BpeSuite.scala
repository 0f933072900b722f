package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

class BpeSuite extends SparkTestBase {

  test("training learns the highest-count pair first, ties broken lexicographically") {
    import spark.implicits._
    // Sennrich's worked example vocabulary: low x5, lower x2, newest x6,
    // widest x3. (e,s), (s,t) and (t,</w>) all count 9; (e,s) is the
    // lexicographic minimum, so it must be merge #1.
    val doc = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val model = Bpe.train(df, "text", numMerges = 10)
    assert(model.merges.head == (("e", "s")), model.merges.toString)
    assert(model.merges.length == 10)
  }

  test("encodeWord merges all occurrences of the best pair left-to-right") {
    import spark.implicits._
    val df = Seq((1L, "aaab aaab aaab")).toDF("doc_id", "text")
    val model = Bpe.train(df, "text", numMerges = 1)
    assert(model.merges == Seq(("a", "a")))
    val ranks = model.merges.zipWithIndex.toMap
    // one pass of (a,a) over a a a b </w>: first two merge, the overlap is
    // consumed, the third a stays single
    assert(Bpe.encodeWord("aaab", ranks).toSeq == Seq("aa", "a", "b", Bpe.Eow))
  }

  test("merge learning stops when no pair repeats") {
    import spark.implicits._
    val df = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    // every word occurs once -> every pair counts 1 -> zero merges learned
    val model = Bpe.train(df, "text", numMerges = 50)
    assert(model.merges.isEmpty, model.merges.toString)
    // encoding still total: plain character + Eow pieces
    val ranks = Map.empty[(String, String), Int]
    assert(Bpe.encodeWord("ab", ranks).toSeq == Seq("a", "b", Bpe.Eow))
  }

  test("training is deterministic in content, not partitioning") {
    val d = QueryPack.t(spark, sf("sf0.001"), "documents")
    val m1 = Bpe.train(d.repartition(1), "text", numMerges = 50, sampleSize = 200)
    val m2 = Bpe.train(d.repartition(7), "text", numMerges = 50, sampleSize = 200)
    assert(m1.merges == m2.merges)
  }

  test("roundtrip and bounds hold over the test corpus; counts match a driver re-encode") {
    val d = QueryPack.t(spark, sf("sf0.001"), "documents")
    val model = Bpe.train(d, "text", numMerges = 200, sampleSize = 500)
    val out = d.select(col("doc_id"),
        TextFunctions.normText(col("text")).as("n"),
        Bpe.pieces(spark, model)(col("text")).as("p"))
      .select(col("doc_id"), col("n"), col("p"),
        Bpe.decodePieces(col("p")).as("rt"),
        size(col("p")).as("np"),
        size(TextFunctions.tokens(col("n"))).as("nw"),
        length(col("n")).as("nc"))
      .collect()
    assert(out.nonEmpty)
    val ranks = model.merges.zipWithIndex.toMap
    for (r <- out) {
      assert(r.getAs[String]("rt") == r.getAs[String]("n"),
        s"roundtrip failed for doc ${r.getLong(0)}")
      val np = r.getAs[Int]("np"); val nw = r.getAs[Int]("nw")
      assert(np >= nw && np <= r.getAs[Int]("nc") + nw,
        s"piece count $np out of [$nw, chars+words] for doc ${r.getLong(0)}")
      // distributed encode == driver encode, spot-checked on every 50th doc
      if (r.getLong(0) % 50 == 0) {
        val expected = r.getAs[String]("n").split(' ').filter(_.nonEmpty)
          .flatMap(w => Bpe.encodeWord(w, ranks)).toSeq
        assert(r.getSeq[String](2) == expected, s"doc ${r.getLong(0)} pieces drifted")
      }
    }
  }

  test("roundtrip survives whitespace residue: normText keeps spaces Spark trim misses") {
    import spark.implicits._
    // Spark trim strips only ' ', so "\thello" normalizes to " hello": the
    // leading empty word must encode (bare Eow) and decode back to a space,
    // and empty/whitespace-only docs must decode to their normalized form
    val docs = Seq(
      (1L, "\thello world"), (2L, "hello world\n"),
      (3L, ""), (4L, "   "), (5L, "\n")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 10)
    val out = docs.select(col("doc_id"),
        TextFunctions.normText(col("text")).as("n"),
        Bpe.decodePieces(Bpe.pieces(spark, model)(col("text"))).as("rt"))
      .collect()
    for (r <- out)
      assert(r.getString(2) == r.getString(1),
        s"doc ${r.getLong(0)}: decode '${r.getString(2)}' != norm '${r.getString(1)}'")
  }

  test("tokenCount excludes the structural bare-Eow pieces of empty words") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "\thello world"), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 10)
    val counts = docs.select(col("doc_id"),
        Bpe.tokenCount(spark, model)(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(1L) == counts(2L), "leading whitespace must not cost a token")
    assert(counts(3L) == 0 && counts(4L) == 0, "empty docs cost zero tokens")
    assert(counts(1L) > 0)
  }

  test("model persistence round-trips through a DataFrame") {
    import spark.implicits._
    val df = (Seq.fill(5)("low lower") ++ Seq.fill(6)("newest widest"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = Bpe.train(df, "text", numMerges = 20)
    assert(model.merges.nonEmpty)
    val back = Bpe.modelFromDF(Bpe.modelToDF(spark, model))
    assert(back == model)
    // token counts agree between the original and rehydrated model
    val a = df.select(Bpe.tokenCount(spark, model)(col("text"))).collect().map(_.getInt(0)).toSeq
    val b = df.select(Bpe.tokenCount(spark, back)(col("text"))).collect().map(_.getInt(0)).toSeq
    assert(a == b)
  }
}
