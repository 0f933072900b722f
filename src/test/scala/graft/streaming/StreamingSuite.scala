package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

/** Streaming correctness: the streaming transforms must produce the same
  * answers as their batch twins over the events table (same declarative
  * plan, different source).
  */
class StreamingSuite extends SparkTestBase {

  private def events = QueryPack.t(spark, sf(), "events")

  test("windowed stats: streaming over file source equals batch") {
    // batch twin
    val batch = Streaming.windowedStats(events)
      .orderBy("window_start", "event_type").collect()

    // stream the same rows through a parquet file stream
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, events.schema)
    val result = Streaming.runToMemory(Streaming.windowedStats(stream), "win_stats",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .orderBy("window_start", "event_type").collect()

    assert(result.toSeq == batch.toSeq)
  }

  test("session windows count all events per user") {
    val sessions = Streaming.sessionWindows(events.filter(col("user_id") < 20))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sess").toString
    events.filter(col("user_id") < 20).write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, events.schema)
    val got = Streaming.runToMemory(Streaming.sessionWindows(stream), "sessions",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val batchTotal = events.filter(col("user_id") < 20).count()
    assert(got.agg(sum("n_events")).head().getLong(0) == batchTotal)
    // session count matches the batch gaps-and-islands computation shape
    assert(got.count() == sessions.count())
  }

  test("streaming dedup drops replayed duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dup").toString
    val slice = events.filter(col("user_id") < 5)
    slice.write.mode("overwrite").parquet(s"$dir/batch1")
    slice.write.mode("overwrite").parquet(s"$dir/batch2") // exact replay
    val stream = Streaming.fileStream(spark, s"$dir/batch*", events.schema)
    val got = Streaming.runToMemory(
      Streaming.streamingDedup(stream, Seq("event_id")), "deduped")
    assert(got.count() == slice.count()) // each event survives exactly once
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-fmgws").toString
    val slice = events.filter(col("user_id") < 5)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
    slice.coalesce(1).write.parquet(s"$dir/in/batch1")
    // sentinel far-future rows advance the watermark so earlier sessions close
    val maxTs = slice.agg(max("ts")).head().getTimestamp(0).getTime
    slice.limit(5).select(col("user_id"),
        lit(new java.sql.Timestamp(maxTs + 30L * 24 * 3600 * 1000)).as("ts"), col("value"))
      .coalesce(1).write.parquet(s"$dir/in/batch2")
    val stream = spark.readStream.schema(slice.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/batch*")
    val got = Streaming.runToMemory(
      Streaming.sessionizeWithState(stream.as[Streaming.EventIn]).toDF(), "fmgws_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2))).toSet
    assert(got.nonEmpty, "no sessions emitted")
    // every emitted session must exist in the batch gaps-and-islands result
    val batchSessions = slice
      .withColumn("prev", lag("ts", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts")))
      .withColumn("new_s", when(col("prev").isNull ||
        unix_millis(col("ts")) - unix_millis(col("prev")) > 1800000L, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts")))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("start"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(2).getTime, r.getLong(3))).toSet
    assert(got.subsetOf(batchSessions), s"emitted sessions not in batch result: ${got.diff(batchSessions)}")
  }

  test("stream-stream interval self-join equals its batch twin") {
    val in = events.filter(col("user_id") < 5)
    val batch = Streaming.pairWithRecent(in, in)
      .orderBy("user_id", "id_a", "id_b").collect()
    assert(batch.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ssj").toString
    in.write.mode("overwrite").parquet(dir)
    val sa = Streaming.fileStream(spark, dir, in.schema)
    val sb = Streaming.fileStream(spark, dir, in.schema)
    val result = Streaming.runToMemory(Streaming.pairWithRecent(sa, sb), "ss_join")
      .orderBy("user_id", "id_a", "id_b").collect()
    assert(result.toSeq == batch.toSeq)
  }

  test("document cleaning stream equals its batch twin") {
    val docs = QueryPack.t(spark, sf(), "documents")
    val batch = Streaming.cleanDocuments(docs).orderBy("doc_id").collect()
    assert(batch.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-clean").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, docs.schema)
    val result = Streaming.runToMemory(Streaming.cleanDocuments(stream), "clean_docs")
      .orderBy("doc_id").collect()
    assert(result.toSeq == batch.toSeq)
  }

  test("structural cleanup stream equals its batch twin (line dedup + boilerplate)") {
    import org.apache.spark.sql.functions.concat
    val docs = QueryPack.t(spark, sf(), "documents")
      // the repeated paragraph is doc-UNIQUE (carries doc_id), so it is a
      // local-dedup target but NOT cross-doc boilerplate; the footer is
      .select(col("doc_id"), concat(col("text"),
        lit("\n\nrepeat "), col("doc_id").cast("string"),
        lit("\n\nrepeat "), col("doc_id").cast("string"),
        lit("\n\nAll rights reserved.")).as("text"))
    // batch twin: local dedup then the boilerplate strip over the same corpus
    val localDeduped = docs.withColumn("text",
      graft.operators.Dedup.dedupElementsLocal(col("text"), sep = "\n\n"))
    val batch = graft.operators.Dedup.stripBoilerplate(localDeduped, "text", minDocFreq = 10)
      .orderBy("doc_id").collect()
    assert(batch.nonEmpty)
    assert(!batch.head.getString(1).contains("All rights reserved"),
      "corpus-wide footer must strip")
    val cleanedText = batch.head.getString(1)
    val rep = s"repeat ${batch.head.getLong(0)}"
    assert(cleanedText.contains(rep) &&
      cleanedText.indexOf(rep) == cleanedText.lastIndexOf(rep),
      "exactly the FIRST occurrence of the within-doc repeat survives local dedup")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-struct").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, docs.schema)
    val cleaned = Streaming.structuralCleanStream(stream, referenceCorpus = docs)
    // stateless: no aggregation anywhere in the streaming plan
    assert(!cleaned.queryExecution.analyzed.toString.contains("Aggregate"))
    val result = Streaming.runToMemory(cleaned, "struct_clean")
      .orderBy("doc_id").collect()
    assert(result.toSeq == batch.toSeq)
  }

  test("streaming gopher repetition filter equals its batch twin and stays stateless") {
    import org.apache.spark.sql.functions.concat_ws
    val docs = QueryPack.t(spark, sf(), "documents")
      // plant a repeated line so both keep outcomes occur in the fixture
      .select(col("doc_id"), concat_ws("\n", col("text"),
        when(col("doc_id") % 4 === 0, col("text")).otherwise(lit("tail line"))).as("text"))
    val batch = Streaming.gopherFilterStream(docs, keepOnly = false)
      .orderBy("doc_id").collect()
    assert(batch.nonEmpty)
    assert(batch.exists(_.getAs[Boolean]("keep")) && batch.exists(!_.getAs[Boolean]("keep")))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-gopher").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, docs.schema)
    val result = Streaming.runToMemory(
        Streaming.gopherFilterStream(stream, keepOnly = false), "gopher_stream")
      .orderBy("doc_id").collect()
    assert(result.toSeq == batch.toSeq)
    val plan = Streaming.gopherFilterStream(stream).queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"), plan)
  }

  test("streaming decontamination equals the batch operator") {
    import graft.operators.Dedup
    val docs = QueryPack.t(spark, sf(), "documents")
    // eval corpus = a handful of real docs, so collisions are guaranteed
    val evalDocs = docs.where(col("doc_id") % 100 === 0).select("text")
    val batch = Dedup.contaminated(docs, evalDocs, "doc_id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(batch.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-decon").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, docs.schema)
    val result = Streaming.runToMemory(
        Streaming.decontaminateStream(stream, evalDocs), "decon_stream")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(result.toSeq == batch.toSeq)
  }

  test("streaming pii scrub equals the batch gate shape") {
    val docs = QueryPack.t(spark, sf(), "documents")
    val batch = Streaming.piiScrubStream(docs).orderBy("doc_id").collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-pii").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, docs.schema)
    val result = Streaming.runToMemory(Streaming.piiScrubStream(stream), "pii_stream")
      .orderBy("doc_id").collect()
    assert(result.toSeq == batch.toSeq)
    // the stream plan is stateless: no aggregation/state-store operators
    val plan = Streaming.piiScrubStream(stream).queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"), plan)
  }

  test("streaming exact ingest dedup equals the batch exact stage") {
    import graft.functions.{TextFunctions => T}
    val docs = QueryPack.t(spark, sf(), "documents")
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val fresh = docs.where(col("doc_id") % 2 === 1)
    // batch twin: the same stream-side plan run on a static frame
    val batch = Streaming.exactIngestStream(corpus, fresh, "doc_id", "text")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    assert(batch.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ingest").toString
    fresh.write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, fresh.schema)
    val streamed = Streaming.exactIngestStream(corpus, stream, "doc_id", "text")
    // the stream side stays an anti join (the static side's distinct is the
    // only aggregate — allowed in append mode because it is not streaming)
    val plan = streamed.queryExecution.analyzed.toString
    assert(plan.contains("LeftAnti"), plan)
    val result = Streaming.runToMemory(streamed, "ingest_exact")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    assert(result.toSeq == batch.toSeq)
    // ground truth: survivors have no even-side normalized-text partner
    val matched = fresh.select(col("doc_id"), T.normText(col("text")).as("n"))
      .join(corpus.select(T.normText(col("text")).as("n")).distinct(), "n")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(result.toSet == fresh.select("doc_id").collect().map(_.getLong(0)).toSet -- matched)
  }

  test("bloom exact ingest stream equals the plain stream twin at any fpp") {
    import graft.operators.Dedup
    val docs = QueryPack.t(spark, sf(), "documents")
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val fresh = docs.where(col("doc_id") % 2 === 1)
    val idx = Dedup.ingestIndexBuild(corpus, "doc_id", "text")
    val plain = Streaming.exactIngestStream(corpus, fresh, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-bloom").toString
    fresh.write.mode("overwrite").parquet(dir)
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = Dedup.ingestBloomBuild(idx, fpp)
      val stream = Streaming.fileStream(spark, dir, fresh.schema)
      val out = Streaming.runToMemory(
          Streaming.exactIngestStreamBloom(corpus, stream, "doc_id", "text", bloom),
          s"bloom_ingest_${(fpp * 100).toInt}")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out == plain, s"fpp=$fpp diverged from the plain stream twin")
    }
  }

  test("stream bigram scorer matches batch on whitespace-framed text") {
    import graft.operators.CorpusStats
    import spark.implicits._
    // Java trim/split would diverge from Spark normText here: leading \n
    // (kept by Spark trim, collapsed to a leading space -> empty first
    // token) and a whitespace-only doc (scored by batch as one ("","")
    // bigram)
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val lm = CorpusStats.bigramTrain(train, "text")
    val tricky = Seq((10L, "\na b"), (11L, "a b\t"), (12L, "\n"), (13L, "x"))
      .toDF("doc_id", "text")
    val batch = CorpusStats.bigramScore(lm, tricky, "doc_id", "text")
      .select("id", "n_bigrams", "xent_bits").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-lm-ws").toString
    tricky.write.mode("overwrite").parquet(dir)
    val streamed = Streaming.runToMemory(
        Streaming.bigramScoreStream(lm,
          Streaming.fileStream(spark, dir, tricky.schema), "doc_id", "text"),
        "bigram_ws")
      .select("id", "n_bigrams", "xent_bits").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(batch.map(_._1).contains(12L), "whitespace-only doc must score (one empty-token bigram)")
  }

  test("streaming BPE token budget and bigram scoring equal their batch twins") {
    import graft.functions.Bpe
    import graft.operators.CorpusStats
    val docs = QueryPack.t(spark, sf(), "documents")
    val model = Bpe.train(docs, "text", numMerges = 100, sampleSize = 200)
    val lm = CorpusStats.bigramTrain(docs.where(col("doc_id") % 5 =!= 0), "text")
    val score = docs.where(col("doc_id") % 5 === 0)
    val batchTokens = Streaming.tokenBudgetStream(docs, model, "text")
      .select("doc_id", "n_tokens").orderBy("doc_id").collect().toSeq
    val batchXent = CorpusStats.bigramScore(lm, score, "doc_id", "text")
      .select(col("id"), col("n_bigrams"), col("xent_bits")).orderBy("id").collect().toSeq
    assert(batchTokens.nonEmpty && batchXent.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-bpe").toString
    docs.write.mode("overwrite").parquet(dir)
    val sdir = java.nio.file.Files.createTempDirectory("graft-stream-lm").toString
    score.write.mode("overwrite").parquet(sdir)
    val tok = Streaming.runToMemory(
        Streaming.tokenBudgetStream(
          Streaming.fileStream(spark, dir, docs.schema), model, "text"),
        "bpe_tokens")
      .select("doc_id", "n_tokens").orderBy("doc_id").collect().toSeq
    assert(tok == batchTokens)
    val xent = Streaming.runToMemory(
        Streaming.bigramScoreStream(lm,
          Streaming.fileStream(spark, sdir, score.schema), "doc_id", "text"),
        "bigram_stream")
      .select("id", "n_bigrams", "xent_bits").orderBy("id").collect().toSeq
    assert(xent == batchXent, "stream scorer drifted from the batch operator")
  }

  test("foreachBatch incremental ingest matches the batch operator per micro-batch") {
    import graft.operators.Dedup
    val docs = QueryPack.t(spark, sf("sf0.001"), "documents")
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val fresh = docs.where(col("doc_id") % 2 === 1)
    val want = Dedup.incrementalDedup(corpus, fresh, "doc_id", "text", threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ingest-fb").toString
    fresh.write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, fresh.schema)
    val got = scala.collection.mutable.Set.empty[Long]
    val q = stream.writeStream
      .foreachBatch(Streaming.incrementalIngest(corpus, "doc_id", "text", 0.7) { novel =>
        got ++= novel.select("doc_id").collect().map(_.getLong(0))
      })
      .start()
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == want)
  }

  test("mapGroupsWithState running totals match groupBy aggregate") {
    import spark.implicits._
    val in = events.filter(col("user_id") < 10)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      .as[Streaming.EventIn]
    val got = Streaming.runningTotals(in)
      .groupByKey(_.user_id).reduceGroups((a, b) => if (a.n > b.n) a else b)
      .map(_._2).collect().map(u => (u.user_id, u.n)).toMap
    val want = events.filter(col("user_id") < 10).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("multimodal feature extraction streams: mapPartitions twin equals batch") {
    import graft.multimodal.Multimodal
    // the batched decode kernel is stateless mapPartitions, so the SAME
    // operator serves batch backfills and streaming ingest — the lambda-free
    // property the other twins assert, now for the multimodal path
    val media = Multimodal.mediaFrom(spark,
      QueryPack.t(spark, sf(), "documents").limit(40), "doc_id", "text", "audio")
    val batch = Multimodal.extractFeatures(media)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-mm").toString
    media.write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, media.schema)
    val got = Streaming.runToMemory(Multimodal.extractFeatures(stream), "mm_feats")
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got == batch)
  }

  test("streaming dsir scoring equals the batch operator") {
    import graft.operators.CorpusStats
    val d = QueryPack.t(spark, sf("sf0.01"), "documents")
    val train = d.where(col("doc_id") % 5 =!= 0)
    val tgt = CorpusStats.bigramTrain(
      train.where(col("source").isin("src0", "src1", "src2", "src3")), "text")
    val raw = CorpusStats.bigramTrain(train, "text")
    val heldout = d.where(col("doc_id") % 5 === 0)
    val batch = CorpusStats.dsirWeights(tgt, raw, heldout, "doc_id", "text")
      .select("id", "n_bigrams", "llr_rate", "weight")
      .orderBy("id").collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dsir").toString
    heldout.write.mode("overwrite").parquet(dir)
    val got = Streaming.runToMemory(
        Streaming.dsirStream(tgt, raw,
          Streaming.fileStream(spark, dir, heldout.schema), "doc_id", "text"),
        "dsir_stream")
      .select("id", "n_bigrams", "llr_rate", "weight")
      .orderBy("id").collect().toSeq
    assert(got == batch, "stream dsir drifted from the batch operator")
  }

  test("foreachBatch cdc apply: ordered micro-batches equal one-shot apply") {
    import graft.operators.Cdc
    val changes = events
      .select(col("user_id"), col("event_type"), col("value"), col("ts"), col("event_id"))
      .withColumn("op", when(col("event_type") === "error", "D").otherwise("U"))
    val base = QueryPack.t(spark, sf(), "customer").where(col("c_custkey") < 300)
      .select(col("c_custkey").as("user_id"), lit("base").as("event_type"),
        col("c_acctbal").as("value"))
    val want = Cdc.applyChangelog(base, changes, Seq("user_id"), Seq("ts", "event_id"), "op")
      .orderBy("user_id").collect().toSeq

    // three seq-ordered micro-batches through the adapter's read-modify-write
    // loop (the in-order-replay contract the scaladoc states)
    var snap = base
    val step = Streaming.cdcApply(Seq("user_id"), Seq("ts", "event_id"), "op")(
      () => snap, out => snap = out.cache())
    val ordered = changes.orderBy("ts", "event_id").collect()
    val n = ordered.length
    Seq(ordered.slice(0, n / 3), ordered.slice(n / 3, 2 * n / 3), ordered.slice(2 * n / 3, n))
      .zipWithIndex.foreach { case (rows, i) =>
        val b = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq), changes.schema)
        step(b, i.toLong)
      }
    assert(snap.orderBy("user_id").collect().toSeq == want)
  }

  test("streaming KN scoring equals its batch twin exactly") {
    import graft.operators.CorpusStats
    val docs = QueryPack.t(spark, sf(), "documents")
    val lm = CorpusStats.knTrain(docs.where(col("doc_id") % 5 =!= 0), "text")
    val score = docs.where(col("doc_id") % 5 === 0)
    val batch = CorpusStats.knScore(lm, score, "doc_id", "text")
      .select(col("id"), col("n_bigrams"), col("xent_bits")).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-kn").toString
    score.write.mode("overwrite").parquet(dir)
    val streamed = Streaming.runToMemory(
        Streaming.knScoreStream(lm,
          Streaming.fileStream(spark, dir, score.schema), "doc_id", "text"),
        "kn_stream")
      .select("id", "n_bigrams", "xent_bits").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch, s"stream head ${streamed.take(3)} vs batch ${batch.take(3)}")
  }

  test("streaming temperature keep equals the batch mixture over the same corpus") {
    import graft.operators.Sampling
    import graft.functions.{TextFunctions => T}
    val docs = QueryPack.t(spark, sf(), "documents")
      .withColumn("n_tok", T.tokenCount(col("text")).cast("long"))
    val batch = Sampling.temperatureMixture(docs, "doc_id", "n_tok", "source",
        alpha = 0.5, budgetTokens = 3000.0, seed = 23L)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val rates = Sampling.temperatureRates(docs, "n_tok", "source", 0.5, 3000.0)
      .localCheckpoint(true) // the static side of the stream-static join
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-temp").toString
    docs.write.mode("overwrite").parquet(dir)
    val streamed = Streaming.runToMemory(
        Streaming.temperatureKeepStream(rates,
          Streaming.fileStream(spark, dir, docs.schema), "doc_id", "source", seed = 23L),
        "temp_stream")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(streamed == batch)
  }

  test("streaming mixture upsampling equals the batch operator, epochs included") {
    import graft.operators.Sampling
    import graft.functions.{TextFunctions => T}
    val docs = QueryPack.t(spark, sf(), "documents")
      .withColumn("n_tok", T.tokenCount(col("text")).cast("long"))
    val budgets = Map("src0" -> 30000.0, "src1" -> 9000.0, "src2" -> 1000.0)
    val batch = Sampling.tokenMixtureUpsample(docs, "doc_id", "n_tok", "source",
        budgets, seed = 23L)
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(batch.exists(_._2 > 0), "fixture must actually upsample somewhere")
    val rates = Sampling.mixtureRates(docs, "n_tok", "source", budgets)
      .localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ups").toString
    docs.write.mode("overwrite").parquet(dir)
    val streamed = Streaming.runToMemory(
        Streaming.mixtureUpsampleStream(rates,
          Streaming.fileStream(spark, dir, docs.schema), "doc_id", "source", seed = 23L),
        "upsample_stream")
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(streamed == batch)
  }
}
