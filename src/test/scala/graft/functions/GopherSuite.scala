package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{GraftFunctions => F}

/** Known-answer coverage for the doc-local Gopher repetition battery —
  * the gate (text_gopher_repetition) holds it to a DuckDB recompute over a
  * planted corpus; this suite pins hand-computed values so the definitions
  * can't silently drift to whatever both engines happen to agree on.
  */
class GopherSuite extends SparkTestBase {

  private def signals(text: String): Map[String, Double] = {
    import spark.implicits._
    val row = Seq(text).toDF("t")
      .select(F.gopher_repetition(col("t")).as("g"))
      .select(GopherRepetition.FieldNames.map(f => col("g").getField(f).as(f)): _*)
      .head()
    GopherRepetition.FieldNames.zipWithIndex.map { case (f, i) => f -> row.getDouble(i) }.toMap
  }

  test("hand-computed known answers for every signal family") {
    // lines: [foo bar, foo bar, baz qux quux] -> 1 dup of 3, 7 dup chars of 26
    // paras: [foo bar\nfoo bar, baz qux quux] -> no dups
    // norm = "foo bar foo bar baz qux quux" (28 chars, 7 tokens)
    // top2 = "foo bar" x2 -> 2*7/28; top3 = all x1, longest "baz qux quux"
    // (12) -> 12/28; top4 = longest "bar baz qux quux" (16) -> 16/28
    // 5..7-grams all unique -> 0; 8..10: fewer than n tokens -> 0
    val s = signals("foo bar\nfoo bar\n\nbaz qux quux")
    assert(s("dup_line_frac") == 1.0 / 3.0)
    assert(s("dup_line_char_frac") == 7.0 / 26.0)
    assert(s("dup_para_frac") == 0.0 && s("dup_para_char_frac") == 0.0)
    assert(s("top_2gram_char_frac") == 14.0 / 28.0)
    assert(s("top_3gram_char_frac") == 12.0 / 28.0)
    assert(s("top_4gram_char_frac") == 16.0 / 28.0)
    (5 to 10).foreach(n => assert(s(s"dup_${n}gram_char_frac") == 0.0, s"n=$n"))
  }

  test("duplicated n-gram coverage counts overlapping positions once") {
    // tokens: a b c d e f a b c d e f — the 5-grams "a b c d e" and
    // "b c d e f" each occur twice; their occurrences cover every token
    // index exactly once each -> coverage 1.0, not > 1
    val s = signals("a b c d e f a b c d e f")
    assert(s("dup_5gram_char_frac") == 1.0)
  }

  test("duplicate paragraphs and characters are weighted by length") {
    // paras: [long one x, zz, long one x] -> dup 1/3; chars 10/(10+2+10)
    val s = signals("long one x\n\nzz\n\nlong one x")
    assert(s("dup_para_frac") == 1.0 / 3.0)
    assert(s("dup_para_char_frac") == 10.0 / 22.0)
  }

  test("empty and sub-n docs yield zeros, null stays null") {
    import spark.implicits._
    val s = signals("")
    GopherRepetition.FieldNames.foreach(f => assert(s(f) == 0.0, f))
    assert(signals("word")("top_2gram_char_frac") == 0.0)
    val n = Seq(Option.empty[String]).toDF("t")
      .select(F.gopher_repetition(col("t")).as("g")).head()
    assert(n.isNullAt(0))
  }

  test("gopher_repetition is reachable from SQL") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT gopher_repetition('x y\nx y').dup_line_frac AS f").head().getDouble(0)
    assert(r == 0.5)
  }
}
