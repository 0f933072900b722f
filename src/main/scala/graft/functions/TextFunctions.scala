package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, built
  * from Spark's codegen'd built-ins wherever possible (no UDFs) so every
  * metric stays inside whole-stage codegen and is expressible in ANSI SQL for
  * oracle checks. All ratios are computed as exact-int numerator/denominator
  * followed by one double division — IEEE-deterministic, so DuckDB produces
  * bit-identical values.
  */
object TextFunctions {

  /** Canonical whitespace/case normalization used by exact dedup. */
  def normText(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normText(text), " ")

  /** The token column of `name` in `df`: pass-through when the column is
    * already `array<string>` — the shared-tokenization convention that lets
    * a multi-stage pipeline (e.g. KN-train → KN-score → LR-train →
    * LR-score) tokenize the corpus ONCE into a checkpointed projection and
    * feed every stage, instead of paying a scan-and-tokenize pass per
    * stage — otherwise [[tokens]] of the (string) column.
    */
  def tokensOf(df: org.apache.spark.sql.DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _) =>
        col(name)
      case _ => tokens(col(name))
    }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: word-pieces of <=4 chars. A word of
    * length L contributes ceil(L/4) pieces; computed without exploding.
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))

  private val StopWords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), w => w.isin(StopWords.map(lit): _*)))

  /** Characters that are neither word characters nor whitespace. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[\\w\\s]", ""))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Heuristic quality signals (length, punctuation ratio, stopword ratio,
    * lexical diversity, mean word length). Ratios emitted as doubles via one
    * exact int/int division.
    */
  def qualityMetrics(text: Column): Seq[Column] = {
    val nTok = tokenCount(text).cast("long")
    val nChar = length(text).cast("long")
    Seq(
      nChar.as("n_chars"),
      nTok.as("n_tokens"),
      distinctTokenCount(text).cast("long").as("n_distinct_tokens"),
      stopwordCount(text).cast("long").as("n_stopwords"),
      punctCount(text).cast("long").as("n_punct"),
      (stopwordCount(text).cast("double") / nTok.cast("double")).as("stopword_ratio"),
      (distinctTokenCount(text).cast("double") / nTok.cast("double")).as("lexical_diversity"),
      (nChar.cast("double") / nTok.cast("double")).as("chars_per_token")
    )
  }

  /** Language-ID by marker-stopword voting: count hits of per-language marker
    * words among the tokens; highest count wins, ties broken by fixed
    * language order, zero hits -> "und". Deterministic and SQL-expressible,
    * so the oracle can replicate it exactly. Marker lists are the usual
    * top-frequency function words per language.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "dans", "est", "pour", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人", "这")
  )

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(tokens(text), w => w.isin(markers.map(lit): _*)))
    }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in declaration order) achieving the max, if max > 0
    scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Unicode NFC normalization (canonical composition) — the standard first
    * step of training-text cleaning. Spark has no built-in normalizer, so
    * this is the one deliberate UDF in the text stack (java.text.Normalizer
    * is allocation-light and locale-independent; DuckDB's nfc_normalize is
    * the oracle counterpart).
    */
  def nfc(text: Column): Column = {
    val f = udf { s: String =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }
    f(text)
  }

  // ---- PII scrubbing (training-data redaction) ----
  // Patterns stick to syntax both java.util.regex (Spark) and RE2 (DuckDB)
  // support — no backreferences or lookaround — so the oracle runs the SAME
  // regexes. Replacement order matters: emails first (their local part eats
  // digits), then SSNs (stricter than phones), IPs, phones.

  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRx = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val Ipv4Rx = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRx = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  private val PiiRules = Seq(
    EmailRx -> "<EMAIL>", SsnRx -> "<SSN>", Ipv4Rx -> "<IP>", PhoneRx -> "<PHONE>")

  /** Text with emails/SSNs/IPv4s/phone numbers replaced by typed tokens.
    * Pure regexp_replace chain — map-side, codegen'd, no UDF.
    */
  def scrubPii(text: Column): Column =
    PiiRules.foldLeft(text) { case (c, (rx, token)) => regexp_replace(c, rx, token) }

  /** Per-category PII hit counts, in [[PiiRules]] order (email, ssn, ip,
    * phone) — counted before scrubbing, on the same precedence (each rule
    * counts matches in the text already scrubbed by earlier rules).
    */
  def piiCounts(text: Column): Seq[Column] =
    PiiRules.indices.map { i =>
      // count rule i on text already scrubbed by rules 0..i-1 (same
      // precedence the replacement chain applies)
      val pre = PiiRules.take(i).foldLeft(text) { case (c, (erx, etok)) =>
        regexp_replace(c, erx, etok)
      }
      regexp_count(pre, lit(PiiRules(i)._1))
    }

  /** C4-style line-level cleaning (Raffel et al. '20 §2.2): the lines of
    * `text` (newline-separated) that end in terminal punctuation, carry at
    * least `minWords` words, and contain neither a curly brace (code
    * marker) nor the word "javascript". Pure higher-order array built-ins —
    * map-side, no UDF, no shuffle.
    */
  def c4KeptLines(text: Column, minWords: Int = 5): Column =
    filter(split(text, "\n"), l =>
      trim(l).rlike("[.!?\"]$") &&
      size(split(trim(l), " ")) >= minWords &&
      !lower(l).contains("javascript") &&
      !l.contains("{"))

  /** C4 document keep flag: at least `minLines` surviving lines and no
    * "lorem ipsum" boilerplate anywhere in the original text.
    */
  def c4Keep(keptLines: Column, text: Column, minLines: Int = 3): Column =
    size(keptLines) >= minLines && !lower(text).contains("lorem ipsum")

  /** Regex for an http(s) URL's host part — deliberately RE2-compatible
    * (no lookaround) so the DuckDB oracle runs the same pattern.
    */
  val UrlHostRx = "https?://([A-Za-z0-9.-]+)"

  /** All URL hosts mentioned in the text, normalized: lowercased, leading
    * `www.` stripped. The per-document half of domain-level corpus curation
    * (map-side; the heavy part is the groupBy in [[domainStats]]).
    */
  def urlHosts(text: Column): Column =
    array_distinct(transform(
      regexp_extract_all(text, lit(UrlHostRx), lit(1)),
      h => regexp_replace(lower(h), "^www\\.", "")))

  /** Per-domain document counts over a corpus — the fan-in side of domain
    * curation. One explode + one hash-aggregate; at 100 TB the aggregate is
    * partial+final on (domain) keys, and the domain cardinality (millions)
    * is tiny next to the corpus.
    */
  def domainStats(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(explode(urlHosts(col(textCol))).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"))

  /** Docs whose text references any blocklisted domain (normalized the same
    * way). Blocklists are small — the check broadcasts; the corpus never
    * shuffles.
    */
  def blocklistedDocs(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, blocklist: Seq[String]): org.apache.spark.sql.DataFrame = {
    val bl = typedlit(blocklist.map(_.toLowerCase))
    df.select(col(idCol), urlHosts(col(textCol)).as("__hosts"))
      .where(arrays_overlap(col("__hosts"), bl))
      .select(col(idCol), array_intersect(col("__hosts"), bl).as("blocked_domains"))
  }
}
