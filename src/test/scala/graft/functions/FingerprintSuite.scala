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

  private def fpsWith(portable: Boolean, texts: (Long, String)*): Map[Long, Set[Long]] =
    texts.toSeq.toDF("id", "text")
      .select(col("id"), F.winnowed_fingerprints(col("text"), k, w, portable).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  private def fps(texts: (Long, String)*): Map[Long, Set[Long]] =
    fpsWith(portable = false, texts: _*)

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

  test("portable variant: winnowing guarantee + values match the reference polynomial") {
    // the text_fingerprint gate runs portable=true; the Schleimer guarantee
    // must hold there too
    val common = "zebras navigate moonlit canyons quietly tonight"
    val m = fpsWith(portable = true,
      1L -> s"first document prefix $common and a unique tail one",
      2L -> s"a completely different beginning here $common another suffix")
    assert(m(1L).intersect(m(2L)).nonEmpty)
    // value check against an independent in-test evaluation of the mod-P
    // polynomial + winnowing (the same math the DuckDB oracle runs)
    val text = "the quick brown fox jumps over the lazy dog"
    val P = graft.functions.WinnowedFingerprints.PortableMod
    val B = graft.functions.WinnowedFingerprints.PortableBase
    val grams = text.sliding(k).toArray
    val hs = grams.map(g => g.foldLeft(0L)((h, c) => (h * B + c) % P))
    val expected = hs.sliding(w).map(_.min).toSeq.distinct.toSet // consecutive-dedup == distinct for a set compare
    val got = fpsWith(portable = true, 1L -> text)(1L)
    assert(got == expected, s"portable fingerprints mismatch: got $got expected $expected")
    // every portable hash respects the mod-P range (the oracle's arithmetic domain)
    assert(got.forall(h => h >= 0L && h < P))
  }

  test("portable variant handles the nh <= w and n < k edges like the default") {
    // 13 chars -> nh = 5 window hashes, nh > w=4 barely; 10 chars -> nh = 2 <= w
    for (p <- Seq(false, true)) {
      val short = fpsWith(p, 1L -> "ab")(1L) // n < k -> empty
      assert(short.isEmpty)
      val tiny = fpsWith(p, 1L -> "abcdefghij")(1L) // nh = 2 <= w -> single global min
      assert(tiny.size == 1)
    }
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
