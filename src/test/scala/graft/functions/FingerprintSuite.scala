package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{GraftFunctions => F}

/** Ground truth for the rows-only text_fingerprint gate: the winnowing
  * guarantees from Schleimer et al. '03 §3, checked as properties rather than
  * against another engine (the rolling-hash values are algorithm-specific).
  */
class FingerprintSuite extends SparkTestBase {

  import spark.implicits._

  private val k = 9 // gate defaults (GraftFunctions.winnowed_fingerprints)
  private val w = 4

  private def fps(texts: (Long, String)*): Map[Long, Set[Long]] =
    texts.toSeq.toDF("id", "text")
      .select(col("id"), F.winnowed_fingerprints(col("text"), k, w).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  test("identical documents get identical fingerprints") {
    val m = fps(1L -> "the quick brown fox jumps over the lazy dog repeatedly",
                2L -> "the quick brown fox jumps over the lazy dog repeatedly")
    assert(m(1L) == m(2L) && m(1L).nonEmpty)
  }

  test("winnowing guarantee: a shared substring of length >= w+k-1 yields a shared fingerprint") {
    // Schleimer '03 Theorem: any match of length >= w+k-1 chars is caught by
    // at least one shared selected fingerprint, regardless of context.
    val common = "zebras navigate moonlit canyons quietly tonight" // 48 chars >> w+k-1 = 12
    val m = fps(1L -> s"first document prefix $common and a unique tail one",
                2L -> s"a completely different beginning here $common another suffix")
    assert(m(1L).intersect(m(2L)).nonEmpty,
      "documents sharing a long substring must share a fingerprint")
  }

  test("documents over disjoint alphabets share no fingerprints") {
    val m = fps(1L -> "aaaa bbbb cccc dddd eeee ffff gggg hhhh",
                2L -> "1111 2222 3333 4444 5555 6666 7777 8888")
    assert(m(1L).intersect(m(2L)).isEmpty)
  }

  test("fingerprint count is bounded by the k-gram count") {
    val text = "some reasonably long document text for density checking purposes"
    val m = fps(1L -> text)
    val nGrams = text.length - k + 1
    assert(m(1L).nonEmpty && m(1L).size <= nGrams)
  }

  test("local edit far from a region preserves that region's fingerprints") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val edited = base.dropRight(2) + "yz" // tail edit only
    val m = fps(1L -> base, 2L -> edited)
    // the untouched prefix still contributes common fingerprints
    assert(m(1L).intersect(m(2L)).size >= (m(1L).size * 0.5),
      s"tail edit should preserve most fingerprints: ${m(1L).intersect(m(2L)).size}/${m(1L).size}")
  }
}
