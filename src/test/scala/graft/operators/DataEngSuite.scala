package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

/** Cdc / Chunking / Layout semantics plus their plan shapes. */
class DataEngSuite extends SparkTestBase {

  import spark.implicits._

  private def events = QueryPack.t(spark, sf(), "events")

  // ---------------------------------------------------------------- Cdc

  test("latest picks the max-seq change per key, against brute force") {
    val changes = Seq(
      (1L, 1L, 10L, "a", 1.0), (1L, 2L, 30L, "b", 2.0), (1L, 3L, 20L, "c", 3.0),
      (2L, 4L, 5L, "d", 4.0),
      (3L, 5L, 7L, "e", 5.0), (3L, 6L, 7L, "f", 6.0) // same ts: event_id breaks the tie
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = Cdc.latest(changes, Seq("user_id"), Seq("ts", "event_id"))
      .orderBy("user_id")
      .select("user_id", "event_id", "event_type").collect().toSeq
    assert(got == Seq(Row(1L, 2L, "b"), Row(2L, 4L, "d"), Row(3L, 6L, "f")))
  }

  test("latest compacts with a partial-combine aggregate, not a window sort") {
    val plan = Cdc.latest(events, Seq("user_id"), Seq("ts", "event_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"latest fell back to a window sort:\n$plan")
    assert("(?i)aggregate".r.findAllIn(plan).size >= 2,
      s"latest lost its partial/final aggregate split:\n$plan")
  }

  test("applyChangelog: upsert, delete, insert, and untouched rows") {
    val base = Seq((1L, "old", 1.0), (2L, "old", 2.0), (9L, "old", 9.0))
      .toDF("user_id", "event_type", "value")
    val changes = Seq(
      (1L, 1L, 10L, "upd", 1.5, "U"),   // update existing key 1
      (2L, 2L, 10L, "upd", 0.0, "U"),   // ...but then delete key 2 later
      (2L, 3L, 20L, "del", 0.0, "D"),
      (5L, 4L, 10L, "new", 5.0, "U"),   // insert unseen key 5
      (7L, 5L, 10L, "new", 7.0, "U"),   // insert-then-delete key 7: never appears
      (7L, 6L, 20L, "del", 0.0, "D"))
      .toDF("user_id", "event_id", "ts", "event_type", "value", "op")
    val got = Cdc.applyChangelog(base, changes, Seq("user_id"), Seq("ts", "event_id"), "op")
      .orderBy("user_id").collect().toSeq
    assert(got == Seq(
      Row(1L, "upd", 1.5), Row(5L, "new", 5.0), Row(9L, "old", 9.0)))
  }

  test("applyChangelog touches the base with one left-anti join") {
    val base = events.select(col("user_id"), col("event_type"), col("value"))
      .groupBy("user_id").agg(first("event_type").as("event_type"),
        first("value").as("value"))
    val changes = events
      .select(col("user_id"), col("event_type"), col("value"), col("ts"), col("event_id"))
      .withColumn("op", lit("U"))
    val plan = Cdc.applyChangelog(base, changes, Seq("user_id"), Seq("ts", "event_id"), "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti join in applyChangelog:\n$plan")
  }

  test("scd2 intervals tile each key's timeline, against brute force") {
    val e = events.where(col("user_id") < 10)
    val got = Cdc.scd2(e, Seq("user_id"), "ts")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("valid_from")).as("from_ms"),
        unix_millis(col("valid_to")).as("to_ms"),
        col("is_current"))
      .collect()
    val byKey = got.groupBy(_.getLong(0))
    val want = e.select(col("user_id"), col("event_id"), unix_millis(col("ts")))
      .collect().groupBy(_.getLong(0))
    byKey.foreach { case (uid, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      // each interval ends where the next begins; exactly the last is current
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) == b.getLong(2), s"gap in user $uid timeline")
          assert(!a.getBoolean(4))
        case _ =>
      }
      assert(sorted.last.isNullAt(3) && sorted.last.getBoolean(4))
      // row set = the key's events, ordered by ts
      assert(sorted.map(_.getLong(1)).toSeq ==
        want(uid).sortBy(_.getLong(2)).map(_.getLong(1)).toSeq)
    }
    assert(byKey.keySet == want.keySet)
  }

  test("scd2Apply extends history identically to a full rebuild") {
    val e = events.where(col("user_id") < 40)
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val rebuilt = Cdc.scd2(e, Seq("user_id"), "ts")
    val incremental = Cdc.scd2Apply(
      Cdc.scd2(e.where(col("ts") < cut), Seq("user_id"), "ts"),
      e.where(col("ts") >= cut), Seq("user_id"), "ts")
    val key = Seq("user_id", "event_id", "valid_from", "valid_to", "is_current")
    assert(incremental.select(key.head, key.tail: _*).orderBy("user_id", "valid_from")
      .collect().toSeq ==
      rebuilt.select(key.head, key.tail: _*).orderBy("user_id", "valid_from")
        .collect().toSeq)
  }

  test("scd2Apply: unchanged keys and batch-only keys, explicitly") {
    // every testdata user straddles the gate's cut, so pin the other two
    // branches on a synthetic changelog: key 1 has NO batch changes (its
    // current row must survive untouched), key 2 straddles, key 3 exists
    // ONLY in the batch (fresh history)
    val c1 = Seq((1L, 10L, "a"), (2L, 11L, "b"), (2L, 12L, "c"))
      .toDF("k", "seq", "v")
    val c2 = Seq((2L, 20L, "d"), (3L, 21L, "e"), (3L, 22L, "f"))
      .toDF("k", "seq", "v")
    val got = Cdc.scd2Apply(Cdc.scd2(c1, Seq("k"), "seq"), c2, Seq("k"), "seq")
      .select("k", "seq", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from").collect().toSeq
    val want = Cdc.scd2(c1.unionByName(c2), Seq("k"), "seq")
      .select("k", "seq", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from").collect().toSeq
    assert(got == want)
    // and the branch facts themselves: key 1 still current from seq 10,
    // key 2's old current closed at exactly 20, key 3 fresh with one
    // closed + one current interval
    val byK = got.groupBy(_.getLong(0))
    assert(byK(1L).map(r => (r.getLong(2), r.isNullAt(3), r.getBoolean(4))).toSeq ==
      Seq((10L, true, true)))
    assert(byK(2L).find(_.getLong(2) == 12L).get.getLong(3) == 20L)
    assert(byK(3L).map(r => (r.getLong(2), r.getBoolean(4))).sorted.toSeq ==
      Seq((21L, false), (22L, true)))
  }

  test("applyChangelog treats a NULL-op latest change as an upsert, not a phantom delete") {
    val base = Seq((1L, "old", 1.0)).toDF("user_id", "event_type", "value")
    val changes = Seq(
      (1L, 1L, 10L, "upd", 1.5, null.asInstanceOf[String]), // malformed op wins
      (2L, 2L, 10L, "new", 2.0, null.asInstanceOf[String]))
      .toDF("user_id", "event_id", "ts", "event_type", "value", "op")
    val got = Cdc.applyChangelog(base, changes, Seq("user_id"), Seq("ts", "event_id"), "op")
      .orderBy("user_id").collect().toSeq
    assert(got == Seq(Row(1L, "upd", 1.5), Row(2L, "new", 2.0)),
      s"null-op keys must upsert, got $got")
  }

  // ----------------------------------------------------------- Chunking

  test("chunks reconstruct the document exactly at every length") {
    val size = 10
    val overlap = 3
    val step = size - overlap
    val docs = (1 to 300).map(n => (n.toLong, "abcdefghij".* (30).substring(0, n)))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunk(docs, "text", size, overlap)
      .select("doc_id", "chunk_ix", "chunk")
      .collect().groupBy(_.getLong(0))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val cs = chunks(id).sortBy(_.getInt(1)).map(_.getString(2)).toSeq
      // stitch: first chunk whole, then each chunk minus its overlap prefix
      val rebuilt = cs.head + cs.tail.map(_.drop(overlap)).mkString
      assert(rebuilt == text, s"doc len ${text.length} reconstructs wrong")
      // no chunk longer than size; starts advance by step
      assert(cs.forall(_.length <= size))
      assert(cs.init.forall(_.length == size), s"non-final short chunk at len ${text.length}")
      // final chunk adds at least one uncovered character (start < len - overlap,
      // except the single-chunk case)
      if (cs.length > 1)
        assert((cs.length - 1) * step < math.max(text.length - overlap, 1))
    }
  }

  test("chunking drops null and empty texts and is map-side only") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, null)).toDF("doc_id", "text")
    val out = Chunking.chunk(docs, "text", 5, 1)
    assert(out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L))
    val plan = Chunking.chunk(events.withColumnRenamed("props", "text"), "text", 5, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking shuffled:\n$plan")
  }

  test("chunking counts code points, not bytes or UTF-16 units") {
    // é = 2 UTF-8 bytes / 1 char; 😀 = 4 bytes / 2 UTF-16 chars — Spark's
    // substr counts CODE POINTS, so a 4-cp text with size=2 step=2 splits
    // 2+2 regardless of encoding width
    val docs = Seq((1L, "aé😀b")).toDF("doc_id", "text")
    val cs = Chunking.chunk(docs, "text", 2, 0)
      .orderBy("chunk_ix").select("chunk").as[String].collect().toSeq
    assert(cs == Seq("aé", "😀b"), s"got $cs")
  }

  test("chunk and layout builders refuse inputs that collide with their internal columns") {
    val d1 = Seq((1L, "abcdef", 9)).toDF("doc_id", "text", "chunk_ix")
    val e1 = intercept[IllegalArgumentException] { Chunking.chunk(d1, "text", 3, 0) }
    assert(e1.getMessage.contains("chunk_ix"))
    val d2 = Seq((1.0, 2.0, 3L)).toDF("x", "y", "__z")
    val e2 = intercept[IllegalArgumentException] {
      Layout.zorder2(d2, "x", 0, 10, "y", 0, 10, bits = 4, numFiles = 2)
    }
    assert(e2.getMessage.contains("__z"))
    val d3 = Seq((1L, 2L, 3L)).toDF("x", "y", "__rx")
    val e3 = intercept[IllegalArgumentException] {
      Layout.hilbertValue2(d3, "x", "y", bits = 4, outCol = "h")
    }
    assert(e3.getMessage.contains("__rx"))
  }

  test("cdc_apply's anti join broadcasts the compacted changelog at runtime") {
    val base = events.select(col("event_id").as("k"), col("value"))
    val changes = events.where(col("event_id") % 7 === 0)
      .select(col("event_id").as("k"), col("value"), col("ts"), col("event_id"))
      .withColumn("op", lit("U"))
    val out = Cdc.applyChangelog(base, changes, Seq("k"), Seq("ts", "event_id"), "op")
    // collect() executes THIS dataset's QueryExecution (count() would build
    // its own), so executedPlan below is the AQE-finalized adaptive plan
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"adaptive plan not finalized:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"compacted changelog side not broadcast:\n$plan")
  }

  test("chunk reconstruction holds across size/overlap configurations") {
    val docs = (0 to 120).map(n => (n.toLong, "qwertyuiopasdfghjklzxcvbnm".* (5).substring(0, n)))
      .toDF("doc_id", "text")
    val texts = (0 to 120).map(n => n.toLong -> "qwertyuiopasdfghjklzxcvbnm".* (5).substring(0, n)).toMap
    for {
      size <- Seq(1, 2, 7, 32)
      overlap <- Seq(0, 1, size / 2, size - 1).distinct if overlap >= 0 && overlap < size
    } {
      val chunks = Chunking.chunk(docs, "text", size, overlap)
        .select("doc_id", "chunk_ix", "chunk")
        .collect().groupBy(_.getLong(0))
      texts.foreach { case (id, text) =>
        if (text.isEmpty) assert(!chunks.contains(id))
        else {
          val cs = chunks(id).sortBy(_.getInt(1)).map(_.getString(2)).toSeq
          val rebuilt = cs.head + cs.tail.map(_.drop(overlap)).mkString
          assert(rebuilt == text,
            s"size=$size overlap=$overlap len=${text.length}: reconstruct failed")
        }
      }
    }
  }

  test("zero overlap tiles the text disjointly") {
    val docs = Seq((1L, "abcdefghijk")).toDF("doc_id", "text") // len 11, size 4
    val cs = Chunking.chunk(docs, "text", 4, 0)
      .orderBy("chunk_ix").select("chunk").as[String].collect().toSeq
    assert(cs == Seq("abcd", "efgh", "ijk"))
  }

  // ------------------------------------------------------------- Layout

  test("zValue2 matches a bit-twiddling reference implementation") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      }
    val rows = events.select(col("user_id"), pmod(col("event_id"), lit(251)).as("y"))
      .limit(500)
      .withColumn("z", Layout.zValue2(col("user_id"), col("y"), bits = 8))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1), 8))
    }
    // interleave identities on exact corners
    val corner = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L)).toDF("x", "y")
      .withColumn("z", Layout.zValue2(col("x"), col("y"), bits = 8))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(corner((0L, 0L)) == 0L && corner((255L, 255L)) == 65535L)
    assert(corner((255L, 0L)) == 0x5555L && corner((0L, 255L)) == 0xAAAAL)
  }

  test("zValueN generalizes zValue2 and interleaves three columns correctly") {
    val df = events.limit(300).select(col("user_id"),
      pmod(col("event_id"), lit(251)).as("y"),
      pmod(col("event_id") * 7L, lit(256L)).as("w"))
    // n=2 case is bit-identical to zValue2
    val two = df.withColumn("a", Layout.zValue2(col("user_id"), col("y"), bits = 8))
      .withColumn("b", Layout.zValueN(Seq(col("user_id"), col("y")), bits = 8))
    assert(two.where(col("a") =!= col("b")).count() == 0)
    // n=3 against a reference implementation
    def ref(xs: Seq[Long], bits: Int): Long =
      (for { i <- 0 until bits; (x, c) <- xs.zipWithIndex }
        yield ((x >> i) & 1L) << (i * xs.length + c)).sum
    df.withColumn("z", Layout.zValueN(Seq(col("user_id"), col("y"), col("w")), bits = 8))
      .collect().foreach { r =>
        assert(r.getLong(3) == ref(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 8))
      }
  }

  test("normalize clamps to the domain and hits both edges") {
    val vals = Seq(-5.0, 0.0, 50.0, 100.0, 250.0).toDF("v")
      .withColumn("n", Layout.normalize(col("v"), 0.0, 100.0, bits = 8))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(vals(-5.0) == 0L && vals(0.0) == 0L && vals(100.0) == 255L && vals(250.0) == 255L)
    assert(vals(50.0) == 128L) // round(0.5 * 255) = 128
  }

  test("hilbertValue2 is a bijection with unit-step adjacency") {
    val bits = 5
    val n = 1 << bits // 32x32 grid, 1024 cells
    // NB: `/` is true division (doubles) — div keeps the grid integral
    val grid = spark.range(n.toLong * n)
      .selectExpr(s"id % $n AS x", s"id div $n AS y")
    val d = Layout.hilbertValue2(grid, "x", "y", bits, "h")
    // bijective onto [0, n^2)
    val stats = d.agg(countDistinct("h"), min("h"), max("h")).collect()(0)
    assert(stats.getLong(0) == n.toLong * n && stats.getLong(1) == 0L &&
      stats.getLong(2) == n.toLong * n - 1)
    // THE Hilbert property (Morton lacks it): consecutive curve indices are
    // Manhattan-adjacent cells — one step in exactly one dimension
    val w = org.apache.spark.sql.expressions.Window.orderBy("h")
    val steps = d
      .withColumn("dx", abs(col("x") - lag("x", 1).over(w)))
      .withColumn("dy", abs(col("y") - lag("y", 1).over(w)))
      .where(col("dx").isNotNull)
    assert(steps.where(col("dx") + col("dy") =!= 1).count() == 0,
      "a curve step moved diagonally or jumped")
  }

  test("hilbertOrder2 tightens per-file bounding boxes in both dimensions") {
    // absolute-tightness check mirroring the zorder2 test; Hilbert-vs-Z
    // average boxes are comparable at this granularity (power-of-4 curve
    // segments tile identically) — the adjacency test above is the
    // property that separates the curves
    val e = events.select(col("user_id"),
      pmod(col("event_id") * 37L, lit(256L)).as("y"), col("event_id"))
    val d = Layout.hilbertOrder2(e, "user_id", 0, 149, "y", 0, 255,
        bits = 8, numFiles = 16)
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(
        (max("user_id") - min("user_id")).as("xr"),
        (max("y") - min("y")).as("yr"))
      .agg(avg("xr"), avg("yr")).collect()(0)
    assert(d.getDouble(0) < 149 * 0.5, s"x not clustered: ${d.getDouble(0)}")
    assert(d.getDouble(1) < 255 * 0.5, s"y not clustered: ${d.getDouble(1)}")
  }

  test("applyChangelog is idempotent and a no-op on an empty batch") {
    val base = events.select(col("event_id").as("k"), col("event_type"), col("value"))
    val changes = events.where(col("event_id") % 9 === 0)
      .select(col("event_id").as("k"), col("event_type"), col("value"),
        col("ts"), col("event_id"))
      .withColumn("op", when(col("event_type") === "error", "D").otherwise("U"))
    val once = Cdc.applyChangelog(base, changes, Seq("k"), Seq("ts", "event_id"), "op")
    val twice = Cdc.applyChangelog(once, changes, Seq("k"), Seq("ts", "event_id"), "op")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty,
      "re-applying the same changelog changed the snapshot")
    val empty = changes.where(lit(false))
    val noop = Cdc.applyChangelog(base, empty, Seq("k"), Seq("ts", "event_id"), "op")
    assert(base.exceptAll(noop).isEmpty && noop.exceptAll(base).isEmpty)
  }

  test("scd2Apply with an empty batch returns the history unchanged") {
    val e = events.where(col("user_id") < 10)
    val hist = Cdc.scd2(e, Seq("user_id"), "ts")
    val out = Cdc.scd2Apply(hist, e.where(lit(false)), Seq("user_id"), "ts")
    assert(hist.exceptAll(out).isEmpty && out.exceptAll(hist).isEmpty)
  }

  test("curve layouts plan one range exchange and no UDF") {
    val e = events.select(col("user_id"),
      pmod(col("event_id"), lit(256L)).as("y"))
    for (plan <- Seq(
        Layout.zorder2(e, "user_id", 0, 149, "y", 0, 255, bits = 8, numFiles = 8),
        Layout.hilbertOrder2(e, "user_id", 0, 149, "y", 0, 255, bits = 8, numFiles = 8))
        .map(_.queryExecution.executedPlan.toString)) {
      assert("rangepartitioning".r.findAllIn(plan.toLowerCase).size == 1,
        s"expected exactly one range exchange:\n$plan")
      assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"),
        s"curve math left codegen:\n$plan")
    }
  }

  test("compactionBins packs under target, singles oversized files, loses none") {
    val files = (1 to 200).map(i => (s"f$i", (i * 7919L) % 400 + 1)) ++
      Seq(("big1", 1000L), ("big2", 2500L))
    val bins = Layout.compactionBins(files, targetBytes = 1000L)
    val sizes = files.toMap
    // every bin fits the target unless it is a single oversized file
    bins.foreach { b =>
      val total = b.map(sizes).sum
      assert(total <= 1000L || (b.length == 1 && sizes(b.head) > 1000L),
        s"bin over target: $b ($total)")
    }
    // partition: every file exactly once
    assert(bins.flatten.sorted == files.map(_._1).sorted)
    // FFD actually packs: far fewer bins than files
    assert(bins.length < files.length / 2)
  }

  test("zorderN over three columns tightens all three bounding boxes") {
    val e = events.select(col("user_id"),
      pmod(col("event_id") * 37L, lit(256L)).as("y"),
      pmod(col("event_id") * 101L, lit(256L)).as("w"))
    def avgRange(df: org.apache.spark.sql.DataFrame, c: String): Double =
      df.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max(c) - min(c)).as("r"))
        .agg(avg("r")).collect()(0).getDouble(0)
    val z = Layout.zorderN(e,
      Seq(("user_id", 0, 149), ("y", 0, 255), ("w", 0, 255)), bits = 8, numFiles = 27)
    // every dimension's per-partition range must sit well under its domain
    assert(avgRange(z, "user_id") < 149 * 0.6)
    assert(avgRange(z, "y") < 255 * 0.6)
    assert(avgRange(z, "w") < 255 * 0.6)
  }

  test("zorder2 tightens per-file bounding boxes in BOTH dimensions") {
    val e = events.select(col("user_id"),
      pmod(col("event_id") * 37L, lit(256L)).as("y"), col("event_id"))
    def avgRanges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.withColumn("p", spark_partition_id())
        .groupBy("p").agg(
          (max("user_id") - min("user_id")).as("xr"),
          (max("y") - min("y")).as("yr"))
        .agg(avg("xr"), avg("yr")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    val files = 16
    val (zx, zy) = avgRanges(Layout.zorder2(e, "user_id", 0, 149, "y", 0, 255,
      bits = 8, numFiles = files))
    // single-column sort: x is tight but y spans its whole domain
    val (sx, sy) = avgRanges(e.repartitionByRange(files, col("user_id")))
    assert(zy < sy * 0.5, s"z-order y-range $zy not tighter than single-sort $sy")
    assert(zx < 149 * 0.5, s"z-order x-range $zx no tighter than the full domain")
  }
}
