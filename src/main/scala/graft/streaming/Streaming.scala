package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (an extension beyond the reference, which
  * ships no streaming — SURVEY.md §2.5 "absent"; its only streaming artifact
  * is reading a FileStreamSink log, UnstructuredFileTable.scala:68-72).
  *
  * Design: streams are the same declarative plans as batch — every transform
  * here works identically on a batch DataFrame, so the batch gate queries
  * double as the streaming correctness oracle (run the same transform over
  * the events table and compare). State stores partition by grouping key, so
  * a 1000-executor cluster shards sessions/windows with no driver state.
  */
object Streaming {

  /** File-based stream over a directory of parquet/csv/json drops. */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
      format: String = "parquet"): DataFrame =
    spark.readStream.format(format).schema(schema).load(dir)

  /** Tumbling-window event counts+sums with late-data handling: the
    * streaming twin of the batch `q_time_bucket` gate query.
    */
  def windowedStats(events: DataFrame, windowLength: String = "1 day",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows with a 30-minute gap, built on Spark's native
    * session_window (state sharded by user_id across executors).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  final case class EventIn(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user totals —
    * the arbitrary-state escape hatch for logic windows can't express.
    */
  def runningTotals(events: Dataset[EventIn]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserRunning(uid, n, total)
          state.update(next)
          next
      }
  }

  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long)

  /** Sessionization with flatMapGroupsWithState + event-time timeout: emits a
    * session row when the 30-minute gap elapses past the watermark. The
    * arbitrary-state version of [[sessionWindows]] for logic the built-in
    * session_window can't express (e.g. per-session early triggers).
    */
  def sessionizeWithState(events: Dataset[EventIn], gapMs: Long = 1800000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, Long, Long)], SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state) =>
          // state: open sessions as (startMs, lastMs, count)
          var sessions = state.getOption.getOrElse(Nil)
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          sorted.foreach { e =>
            val t = e.ts.getTime
            sessions = sessions match {
              case (s0, last, n) :: rest if t - last <= gapMs => (s0, t, n + 1) :: rest
              case open => (t, t, 1L) :: open
            }
          }
          val watermark = state.getCurrentWatermarkMs()
          val (closed, open) = sessions.partition { case (_, last, _) => watermark - last > gapMs }
          if (open.nonEmpty) {
            state.update(open)
            state.setTimeoutTimestamp(open.map(_._2).max + gapMs)
          } else state.remove()
          closed.reverseIterator.map { case (s0, _, n) =>
            SessionOut(uid, new java.sql.Timestamp(s0), n)
          }
      }
  }

  /** Streaming exact dedup: drop rows whose key was already seen, with the
    * state bounded by a watermark (late duplicates beyond the watermark are
    * forgotten — the standard streaming trade-off). The streaming twin of
    * `Dedup.exactDedup`.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** Stream-stream self-join: pair each event with the user's events in the
    * preceding hour (the streaming twin of the range join). Watermarks bound
    * BOTH join states; the time-interval condition lets Spark evict rows —
    * state stays proportional to one watermark window per user, not the
    * stream history.
    */
  def pairWithRecent(a: DataFrame, b: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val l = a.select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
      .withWatermark("ts_a", watermark)
    val r = b.select(col("user_id").as("user_id_b"), col("event_id").as("id_b"),
        col("ts").as("ts_b"))
      .withWatermark("ts_b", watermark)
    l.join(r,
        col("user_id") === col("user_id_b") && col("id_a") =!= col("id_b") &&
        col("ts_b") >= col("ts_a") - expr("INTERVAL 1 HOUR") && col("ts_b") < col("ts_a"))
      .select("user_id", "id_a", "id_b", "ts_a", "ts_b")
  }

  /** Training-data cleaning as a stream: NFC normalization + PII scrubbing +
    * quality filtering. Entirely stateless map-side work, so the SAME
    * declarative plan serves batch backfills and streaming ingest — the
    * property that makes a lambda-free pipeline possible (asserted by the
    * batch-equivalence test).
    */
  def cleanDocuments(docs: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val nTok = T.tokenCount(col("text")).cast("long")
    docs.select(col("doc_id"),
        T.scrubPii(T.nfc(col("text"))).as("clean_text"),
        nTok.as("n_tokens"),
        (T.distinctTokenCount(col("text")).cast("double") / nTok.cast("double"))
          .as("lexical_diversity"))
      .where(col("n_tokens") >= 5 && col("lexical_diversity") >= 0.3)
  }

  /** Streaming structural cleanup: the twin of the `text_line_dedup` /
    * `text_boilerplate_strip` batch gates. Local line dedup is a stateless
    * column rewrite (works on any stream verbatim); the boilerplate set is
    * learned from a STATIC reference corpus (boilerplate is template — by
    * definition stable across a stream's lifetime) and applied as the same
    * literal map-side filter the batch operator uses. Append mode, no
    * state store, no watermark needed.
    */
  def structuralCleanStream(docs: DataFrame, referenceCorpus: DataFrame,
      textCol: String = "text", minDocFreq: Int = 10,
      maxSetSize: Int = 10000, sep: String = "\n\n"): DataFrame = {
    import graft.operators.Dedup
    val flagged = Dedup.boilerplateParagraphs(referenceCorpus, textCol, minDocFreq, sep)
      .orderBy(col("doc_freq").desc, col("paragraph"))
      .limit(maxSetSize + 1).collect().map(_.getString(0))
    require(flagged.length <= maxSetSize,
      s"more than $maxSetSize boilerplate paragraphs at minDocFreq=$minDocFreq")
    val deduped = Dedup.dedupElementsLocal(col(textCol), sep)
    val cleaned =
      if (flagged.isEmpty) deduped
      else {
        val quoted = java.util.regex.Pattern.quote(sep)
        val spark = referenceCorpus.sparkSession
        org.apache.spark.sql.functions.array_join(
          org.apache.spark.sql.functions.filter(split(deduped, quoted),
            p => !graft.functions.InBroadcastSet.column(spark, p, flagged)), sep)
      }
    docs.withColumn(textCol, cleaned)
  }

  /** Streaming benchmark decontamination: the twin of `Dedup.contaminated`.
    * The eval/benchmark corpus is STATIC (a batch frame); its distinct
    * n-gram set is pre-aggregated into one array row and broadcast, so each
    * incoming training doc is checked with a stateless map-side
    * `array_intersect` — no streaming aggregate, no state store, append
    * mode, and per-doc results are identical to the batch operator (the
    * shared-n-gram count is |distinct doc n-grams ∩ eval n-grams| in both).
    *
    * Scale note: the one-row array shape fits eval sets up to a few million
    * n-grams (typical benchmark suites are far smaller). For a pathological
    * eval corpus, fall back to the batch operator's explode + broadcast-join
    * shape over micro-batches via foreachBatch.
    */
  def decontaminateStream(docs: DataFrame, evalDocs: DataFrame,
      shingleSize: Int = 5): DataFrame = {
    import graft.functions.{GraftFunctions => F, TextFunctions => T}
    val evalSet = evalDocs
      .select(array_distinct(F.word_shingles(T.tokens(col("text")), shingleSize)).as("ng"))
      .agg(array_distinct(flatten(collect_list(col("ng")))).as("__eval_ngrams"))
    docs.crossJoin(broadcast(evalSet))
      .select(col("doc_id"),
        size(array_intersect(
          array_distinct(F.word_shingles(T.tokens(col("text")), shingleSize)),
          col("__eval_ngrams"))).cast("long").as("n_shared_ngrams"))
      .where(col("n_shared_ngrams") > 0)
  }

  /** Streaming PII scrub: the twin of the `text_pii_scrub` batch gate —
    * scrubbed text plus per-category counts, purely stateless map-side
    * expressions (no shuffle, no state), so ingest-time scrubbing runs at
    * source parallelism on any cluster size.
    */
  def piiScrubStream(docs: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val counts = T.piiCounts(col("text"))
    docs.select(col("doc_id"),
      T.scrubPii(col("text")).as("scrubbed"),
      counts(0).cast("long").as("n_email"), counts(1).cast("long").as("n_ssn"),
      counts(2).cast("long").as("n_ip"), counts(3).cast("long").as("n_phone"))
  }

  /** Streaming Gopher repetition filter: the twin of the
    * `text_gopher_repetition` batch gate — every doc scored with the full
    * 13-signal repetition battery ([[graft.functions.GopherRepetition]], one
    * doc-local expression) and labeled with the Table-A1 keep verdict. Pure
    * stateless map (the expression is a per-row kernel), so ingest-time
    * repetition filtering runs at source parallelism with no state store.
    */
  def gopherFilterStream(docs: DataFrame, keepOnly: Boolean = true): DataFrame = {
    import graft.functions.{GopherRepetition, GraftFunctions => F}
    val flat = GopherRepetition.FieldNames.map(f => col("__g").getField(f).as(f))
    val keep = GopherRepetition.KeepThresholds
      .map { case (f, th) => col(f) <= th }.reduce(_ && _)
    val scored = docs.select(col("doc_id"), col("text"), F.gopher_repetition(col("text")).as("__g"))
      .select(col("doc_id") +: col("text") +: flat: _*)
      .withColumn("keep", keep)
    if (keepOnly) scored.where(col("keep")) else scored
  }

  /** Streaming EXACT ingest dedup: the twin of the exact stage of
    * [[graft.operators.Dedup.incrementalDedup]] — a stream-static LEFT ANTI
    * join from incoming docs to the corpus's distinct normalized-md5 hashes.
    * Stateless and append-mode; the static side's QUERY re-executes per
    * micro-batch, but whether corpus rows added between triggers become
    * visible depends on the source's listing semantics (a parquet frame
    * pins its file listing at read time — re-create the frame or refresh
    * the catalog table to pick up corpus growth). Only (hash) columns
    * join — document text never shuffles.
    */
  def exactIngestStream(corpus: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val normHash = graft.operators.Dedup.normTextHash(textCol)
    val corpusHashes = corpus.select(normHash.as("__h")).distinct()
    docs.withColumn("__h", normHash)
      .join(corpusHashes, Seq("__h"), "left_anti")
      .drop("__h")
  }

  /** [[exactIngestStream]] with the Bloom prefilter: rows whose hash the
    * (broadcast) filter rules out are definitely new and bypass the
    * stream-static anti-join entirely; only the maybe-rows join. The
    * batch-side trick of cutting the hash table with a broadcast semi-join
    * is NOT available here (a stream cannot be the build side of a static
    * join), so the maybe branch keeps the plain anti-join — the bloom still
    * removes the lookup for the typically-dominant definite-new fraction.
    * Results are identical to [[exactIngestStream]] at any fpp.
    */
  def exactIngestStreamBloom(corpus: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, bloom: Array[Byte]): DataFrame = {
    val spark = docs.sparkSession
    val normHash = graft.operators.Dedup.normTextHash(textCol)
    val corpusHashes = corpus.select(normHash.as("__h")).distinct()
    val bc = spark.sparkContext.broadcast(bloom)
    val might = udf(new graft.operators.Dedup.BloomMightContain(bc))
    val probed = docs.withColumn("__h", normHash)
      .withColumn("__maybe", might(col("__h")))
    val definite = probed.where(!col("__maybe"))
    val checked = probed.where(col("__maybe"))
      .join(corpusHashes, Seq("__h"), "left_anti")
    definite.unionByName(checked).drop("__h", "__maybe")
  }

  /** Streaming BPE token budgeting: (docs columns) + n_tokens under a
    * trained [[graft.functions.Bpe.BpeModel]] — stateless map-side (the
    * merge table broadcasts), append-mode.
    */
  def tokenBudgetStream(docs: DataFrame, model: graft.functions.Bpe.BpeModel,
      textCol: String): DataFrame =
    docs.withColumn("n_tokens",
      graft.functions.Bpe.tokenCount(docs.sparkSession, model)(col(textCol)))

  /** Streaming bigram-LM scoring: the twin of
    * [[graft.operators.CorpusStats.bigramScore]] with the model COLLECTED
    * and broadcast so each doc scores in one stateless map (an append-mode
    * stream cannot run the batch operator's explode + per-doc re-aggregate
    * without state). Requires a broadcastable model — prune the vocabulary
    * upstream if needed; the batch operator has no such constraint. Rounding
    * mirrors the batch path exactly (9-decimal HALF_UP terms, exact decimal
    * sum, 6-decimal mean), asserted by batch-equivalence in StreamingSuite.
    * Emits (id, n_bigrams, xent_bits); docs with < 2 tokens drop out.
    */
  def bigramScoreStream(lm: graft.operators.CorpusStats.BigramLM,
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val score = udf(new BigramScorer(collectAndBroadcast(docs.sparkSession, lm)))
    docs.select(col(idCol).as("id"), score(col(textCol)).as("__s"))
      .where(col("__s").isNotNull)
      .select(col("id"), col("__s._1").as("n_bigrams"), col("__s._2").as("xent_bits"))
  }

  /** Collect a [[graft.operators.CorpusStats.BigramLM]]'s three tables into
    * the (bigram-counts, context-counts, vocab-size) tuple [[BigramScorer]]
    * closes over, broadcast once — shared by [[bigramScoreStream]] and
    * [[dsirStream]] so the tuple shape has one producer.
    */
  private def collectAndBroadcast(spark: SparkSession,
      lm: graft.operators.CorpusStats.BigramLM):
      org.apache.spark.broadcast.Broadcast[(Map[(String, String), Long], Map[String, Long], Long)] = {
    val c2 = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val c1 = lm.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.sparkContext.broadcast((c2, c1, lm.vocab.collect().head.getLong(0)))
  }

  /** Streaming DSIR scoring: the twin of
    * [[graft.operators.CorpusStats.dsirWeights]] — both LMs collected and
    * broadcast, each doc scored under target and raw in ONE stateless map
    * (no stream-stream join, no state store), then the same linearized
    * weight. Emits (id, n_bigrams, llr_rate, weight); batch-equivalence
    * asserted in StreamingSuite. Feed `weight` to a hash01 filter for the
    * streaming keep decision.
    */
  def dsirStream(target: graft.operators.CorpusStats.BigramLM,
      raw: graft.operators.CorpusStats.BigramLM,
      docs: DataFrame, idCol: String, textCol: String,
      scale: Double = 4.0): DataFrame = {
    require(scale > 0)
    val spark = docs.sparkSession
    val scoreT = udf(new BigramScorer(collectAndBroadcast(spark, target)))
    val scoreR = udf(new BigramScorer(collectAndBroadcast(spark, raw)))
    docs.select(col(idCol).as("id"),
        scoreT(col(textCol)).as("__t"), scoreR(col(textCol)).as("__r"))
      .where(col("__t").isNotNull && col("__r").isNotNull)
      .select(col("id"), col("__t._1").as("n_bigrams"),
        round(col("__r._2") - col("__t._2"), 6).as("llr_rate"))
      // unrounded, like the batch operator: a 6-decimal rounding here
      // creates exact HALF_UP ties the two engines resolve differently
      .withColumn("weight",
        least(lit(1.0), greatest(lit(0.0), lit(0.5) + col("llr_rate") / scale)))
  }

  private final class BigramScorer(
      model: org.apache.spark.broadcast.Broadcast[
        (Map[(String, String), Long], Map[String, Long], Long)])
      extends (String => Option[(Long, Double)]) with Serializable {
    def apply(text: String): Option[(Long, Double)] = {
      if (text == null) return None
      val (c2, c1, v) = model.value
      // Replicate normText EXACTLY, not idiomatically: Spark's trim strips
      // only ' ' (Java's trim eats all control chars, so "\nhello" would
      // tokenize differently), and split must keep trailing empty tokens
      // the way Spark's split does (limit -1). Locale.ROOT lowercase is the
      // closest JVM analogue of Spark's UTF8String lowercasing — exotic
      // case mappings could still differ; the equivalence contract is
      // ASCII-clean text, which curation upstream normally guarantees.
      val toks = text.replaceAll("^ +", "").replaceAll(" +$", "")
        .toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ").split(" ", -1)
      if (toks.length < 2) return None
      var sum = BigDecimal(0)
      var n = 0L
      var i = 0
      while (i < toks.length - 1) {
        val p = (c2.getOrElse((toks(i), toks(i + 1)), 0L) + 1.0) /
          (c1.getOrElse(toks(i), 0L) + v + 1.0)
        sum += BigDecimal(math.log(p) / math.log(2.0))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        n += 1; i += 1
      }
      val xent = BigDecimal(-sum.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Some((n, xent))
    }
  }

  /** Streaming Kneser-Ney scoring: the twin of
    * [[graft.operators.CorpusStats.knScore]] with all four model tables
    * collected and broadcast — one stateless map per doc, no state store.
    * The interpolation arithmetic and rounding sequence mirror the batch
    * operator exactly (9-decimal HALF_UP terms, exact decimal sum,
    * 6-decimal mean); batch-equivalence asserted in StreamingSuite. Emits
    * (id, n_bigrams, xent_bits); docs with < 2 tokens drop out.
    */
  def knScoreStream(lm: graft.operators.CorpusStats.KnBigramLM,
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val c2 = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cx = lm.contexts.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cont = lm.continuations.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val st = lm.stats.collect().head
    val bc = spark.sparkContext.broadcast((c2, cx, cont, st.getLong(0), st.getLong(1),
      st.getDouble(2)))
    val score = udf(new KnScorer(bc))
    docs.select(col(idCol).as("id"), score(col(textCol)).as("__s"))
      .where(col("__s").isNotNull)
      .select(col("id"), col("__s._1").as("n_bigrams"), col("__s._2").as("xent_bits"))
  }

  private final class KnScorer(
      model: org.apache.spark.broadcast.Broadcast[
        (Map[(String, String), Long], Map[String, (Long, Long)], Map[String, Long],
          Long, Long, Double)])
      extends (String => Option[(Long, Double)]) with Serializable {
    def apply(text: String): Option[(Long, Double)] = {
      if (text == null) return None
      val (c2, cx, cont, b, v, d) = model.value
      // same exact normText replication contract as BigramScorer
      val toks = text.replaceAll("^ +", "").replaceAll(" +$", "")
        .toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ").split(" ", -1)
      if (toks.length < 2) return None
      var sum = BigDecimal(0)
      var n = 0L
      var i = 0
      while (i < toks.length - 1) {
        val pcont = (cont.getOrElse(toks(i + 1), 0L) + 1.0) / (b + v + 1.0)
        val p = cx.get(toks(i)) match {
          case Some((c1, n1p)) =>
            math.max(c2.getOrElse((toks(i), toks(i + 1)), 0L) - d, 0.0) / c1 +
              d * n1p / c1 * pcont
          case None => pcont
        }
        sum += BigDecimal(math.log(p) / math.log(2.0))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        n += 1; i += 1
      }
      val xent = BigDecimal(-sum.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Some((n, xent))
    }
  }

  /** Streaming temperature-mixture keep: the twin of
    * [[graft.operators.Sampling.temperatureMixture]] with the tempered
    * rates pinned against a STATIC reference corpus
    * ([[graft.operators.Sampling.temperatureRates]]) — the stream then
    * pays one broadcast stream-static join and a map-side hash01 filter,
    * stateless and reshard-stable, so the keep decision for a given doc is
    * identical to the batch operator run over reference + doc.
    */
  def temperatureKeepStream(referenceRates: DataFrame, docs: DataFrame,
      idCol: String, sourceCol: String, seed: Long): DataFrame = {
    val hash01 = graft.operators.Sampling.bucketCol(idCol, seed, portable = true)
      .cast("double") / 10000.0
    docs.join(broadcast(referenceRates), Seq(sourceCol))
      .where(hash01 < col("__rate"))
      .select(docs.columns.map(col).toSeq: _*)
  }

  /** Streaming multi-epoch mixture keep: the twin of
    * [[graft.operators.Sampling.tokenMixtureUpsample]] with the UNCLAMPED
    * rates pinned against a static reference corpus
    * ([[graft.operators.Sampling.mixtureRates]]). One broadcast
    * stream-static join, then the same map-side epoch explode + keep
    * filter — stateless and reshard-stable, so a given doc's copy set is
    * identical to the batch operator over reference + doc. Output carries
    * the 0-based `epoch` column.
    */
  def mixtureUpsampleStream(referenceRates: DataFrame, docs: DataFrame,
      idCol: String, sourceCol: String, seed: Long): DataFrame = {
    require(!docs.columns.contains("epoch"),
      "input already has an 'epoch' column (reserved for the copy index)")
    require(!docs.columns.contains("__rate"),
      "input already has a '__rate' column (reserved for the rates join)")
    val hash01 = graft.operators.Sampling.bucketCol(idCol, seed, portable = true)
      .cast("double") / 10000.0
    docs.join(broadcast(referenceRates), Seq(sourceCol))
      .withColumn("epoch",
        explode(sequence(lit(0), greatest(ceil(col("__rate")).cast("int") - 1, lit(0)))))
      .where(col("epoch") < floor(col("__rate")).cast("int") ||
        (col("epoch") === floor(col("__rate")).cast("int") &&
          hash01 < col("__rate") - floor(col("__rate"))))
      .select((docs.columns.map(col) :+ col("epoch")).toSeq: _*)
  }

  /** foreachBatch adapter for FULL incremental ingest dedup (exact + near):
    * near-dup conviction aggregates LSH candidates per doc, which an
    * append-mode stream cannot express statelessly, so each micro-batch runs
    * the batch operator against the static corpus and hands survivors to
    * `sink` — the standard stream-to-batch escape hatch, keeping the
    * operator's no-corpus-self-join scale shape per trigger:
    * {{{
    * docsStream.writeStream.foreachBatch(
    *   Streaming.incrementalIngest(corpus, "doc_id", "text", 0.8) { novel =>
    *     novel.write.mode("append").parquet("/data/curated") }).start()
    * }}}
    */
  def incrementalIngest(corpus: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7)(sink: DataFrame => Unit): (DataFrame, Long) => Unit =
    (batch, _) => sink(graft.operators.Dedup.incrementalDedup(
      corpus, batch, idCol, textCol, threshold))

  /** foreachBatch adapter for continuous CDC application: each micro-batch
    * of changes is compacted latest-wins and applied to the snapshot the
    * caller loads/saves around the trigger (the read-modify-write shape of a
    * lakehouse MERGE loop). Within a batch, ordering is the compaction's
    * `seqCols` max; ACROSS batches the later trigger wins unconditionally —
    * correct when the changelog source replays in order (file/commit logs
    * do), and exactly the contract `Cdc.applyChangelog` documents:
    * {{{
    * changes.writeStream.foreachBatch(
    *   Streaming.cdcApply(Seq("user_id"), Seq("ts", "event_id"), "op")(
    *     () => spark.read.parquet(snapDir), _.write.mode("overwrite").parquet(next))).start()
    * }}}
    */
  def cdcApply(keyCols: Seq[String], seqCols: Seq[String], opCol: String,
      deleteOp: String = "D")(load: () => DataFrame, save: DataFrame => Unit):
      (DataFrame, Long) => Unit =
    (batch, _) => save(graft.operators.Cdc.applyChangelog(
      load(), batch, keyCols, seqCols, opCol, deleteOp))

  /** Streaming twin of [[graft.multimodal.Multimodal.mediaIngestNearDuplicates]]:
    * hash the media stream map-side (REAL image decode), stream-static band
    * join against the persisted corpus hash index. Stateless end to end —
    * the first-agreeing-band filter stands in for the batch dedup — so it
    * runs append-mode with no watermark or state store.
    */
  def mediaIngestStream(corpusIndex: DataFrame, media: DataFrame, idCol: String,
      contentCol: String, maxDistance: Int = 3): DataFrame =
    graft.multimodal.Multimodal.mediaIngestNearDuplicates(corpusIndex,
      graft.multimodal.Multimodal.imageHashes(media, idCol, contentCol)
        .select(col("id"), col("dhash")), maxDistance)

  /** Run a stream to completion against a memory sink and return the result
    * table (test/bench harness helper).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
