package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling / splitting operators for training-data assembly.
  *
  * Scale design: everything here is either a pure map-side filter (hash
  * split, stratified Bernoulli) or a distributed top-k (deterministic-k),
  * so nothing shuffles the corpus and nothing depends on row order or
  * partitioning — reruns and reshards give identical answers.
  */
object Sampling {

  /** Per-stratum Bernoulli sampling (`df.stat.sampleBy`): map-side filter,
    * seed-deterministic for a fixed input layout. Strata absent from
    * `fractions` are dropped.
    */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Exactly-k uniform sample, content-deterministic: order by a seeded hash
    * of the id and take k. Compiles to TakeOrderedAndProject — each
    * partition keeps its k smallest hashes, only numPartitions*k rows move.
    * Unlike limit() (first partitions) or sample() (approximate count), this
    * is unbiased AND exact AND stable across reruns/reshards.
    */
  def deterministicK(df: DataFrame, idCol: String, k: Int, seed: Long): DataFrame =
    df.orderBy(xxhash64(col(idCol), lit(seed))).limit(k)

  /** Per-row weighted Bernoulli keep, content-deterministic: keep a row iff
    * `hash01(id) < weight` where hash01 is the seeded id-hash mapped to
    * [0, 1). The quality-weighted resampling step of pipeline assembly
    * ("keep high-quality docs with probability ~ quality") as a pure
    * map-side filter — and unlike `rand()`-based sampling it is STABLE
    * UNDER RESHARDING: the same document always makes the same keep/drop
    * decision. Weights clamp to [0, 1].
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      seed: Long): DataFrame = {
    val hash01 = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)).cast("double") / 1000000.0
    df.where(hash01 < greatest(lit(0.0), least(lit(1.0), col(weightCol))))
  }

  /** Train/validation/test split by hash bucket: row goes to the split whose
    * cumulative weight range contains `xxhash64(id, seed) mod 10000`. A pure
    * map-side filter per split — no shuffle, no sampling state — and STABLE
    * UNDER RESHARDING: a document keeps its split assignment forever, which
    * `randomSplit` (per-partition Bernoulli over row order) does not
    * guarantee. That stability is what prevents train/test leakage when a
    * 100 TB corpus is re-partitioned between runs.
    */
  def hashSplit(df: DataFrame, idCol: String, weights: Seq[Double],
      seed: Long, portable: Boolean = false): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).map(_ / total * 10000.0)
    val bucket = bucketCol(idCol, seed, portable)
    weights.indices.map { i =>
      df.where(bucket >= math.floor(cum(i)).toLong && bucket < math.floor(cum(i + 1)).toLong)
    }
  }

  /** The split bucket in [0, 10000): seeded xxhash64 by default; `portable`
    * switches to the first 15 hex chars of `md5(id || ':' || seed)` parsed as
    * a 60-bit integer — bit-identical in any engine with md5 (DuckDB:
    * `('0x' || substr(md5(id::VARCHAR || ':<seed>'), 1, 15))::BIGINT`), which
    * is what lets the sample_hash_split gate be checked hash-exact. Both are
    * pure map-side column expressions, so the reshard-stability story is
    * identical.
    */
  private[graft] def bucketCol(idCol: String, seed: Long, portable: Boolean): Column =
    if (portable)
      pmod(conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 15),
        16, 10).cast("long"), lit(10000L))
    else pmod(xxhash64(col(idCol), lit(seed)), lit(10000L))

  /** Cap each group's contribution at `n` rows — the domain/source-balancing
    * step of corpus curation ("no single domain dominates the mix"). Which
    * rows survive is decided by a seeded hash of the id, so the selection is
    * uniform within the group, deterministic, and STABLE UNDER RESHARDING
    * (reruns keep the same rows). One hash-shuffle on the group key; the
    * per-group top-n is a running window, no global sort.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, n: Int,
      seed: Long): DataFrame = {
    require(n >= 1)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Token-budget mixture sampling (the Pile/Dolma-style source mixing
    * step): given a per-source share of a total token budget, keep each
    * source's documents with probability `min(1, share * budget /
    * source_tokens)` so the EXPECTED kept tokens hit the target mix.
    * Selection is the seeded-md5 hash01 filter — uniform within source,
    * deterministic, STABLE UNDER RESHARDING (the property `sample()`
    * lacks) — and sources absent from `shares` drop entirely.
    *
    * Scale shape: one partial-combine agg for the per-source token totals
    * (sources are few — the totals frame broadcasts back), then a pure
    * map-side keep filter; the corpus never shuffles. Oversubscribed
    * sources (share * budget > available tokens) clamp to keeping
    * everything — re-weight or upsample externally if the mix must be
    * exact rather than capped.
    *
    * `shareTimesBudget` passes `share * budget` PRE-MULTIPLIED per source:
    * both engines then evaluate the same single division, keeping the
    * rate doubles engine-identical for the hash-exact gate
    * (`sample_mixture`).
    */
  def tokenMixture(df: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, shareTimesBudget: Map[String, Double],
      seed: Long): DataFrame = {
    require(shareTimesBudget.nonEmpty && shareTimesBudget.values.forall(_ > 0))
    // drop unlisted sources BEFORE the totals agg/join — their rows carry a
    // null budget and can never survive, so they should not pay the
    // aggregation either (and keeping nulls out of the rate also sidesteps
    // least()'s null-skipping, which would silently resolve to rate 1.0)
    val listed = df.where(col(sourceCol).isin(shareTimesBudget.keys.toSeq: _*))
    val totals = listed.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).as("__tot"))
    val budgetExpr = shareTimesBudget.foldLeft(lit(null).cast("double")) {
      case (acc, (src, tb)) => when(col(sourceCol) === src, lit(tb)).otherwise(acc)
    }
    // the same portable md5 contract as hashSplit/splitLabels — one producer
    val hash01 = bucketCol(idCol, seed, portable = true).cast("double") / 10000.0
    listed.join(broadcast(totals), Seq(sourceCol))
      // a listed source with a NULL token sum (all-null tokenCol) or zero
      // tokens has no defined rate: least() would null-skip to 1.0 (and
      // x/0 -> +Inf -> 1.0), silently keeping every doc of that source —
      // guard both to rate 0 (nothing measurable to budget, keep nothing)
      .withColumn("__rate",
        when(col("__tot") > 0, least(lit(1.0), budgetExpr / col("__tot")))
          .otherwise(lit(0.0)))
      .where(hash01 < col("__rate"))
      // the key join fronts sourceCol — restore the caller's column order
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Token-budget mixture WITH UPSAMPLING (the Pile/Dolma multi-epoch
    * semantics [[tokenMixture]] clamps away): a source whose share of the
    * budget EXCEEDS its available tokens repeats — rate 2.3 keeps every
    * document twice and a 0.3-probability third copy — so the realized
    * token mix matches the target even for under-resourced sources.
    * Output carries an `epoch` column (0-based copy index; downstream
    * shuffles/packing treat copies as distinct rows).
    *
    * Copy selection stays deterministic and reshard-stable: full copies
    * are unconditional, the fractional copy keeps iff the seeded-md5
    * hash01 of the id is under the fractional part — the SAME contract as
    * [[tokenMixture]], which this degenerates to (plus `epoch = 0`) when
    * every rate <= 1.
    *
    * Scale shape: one partial-combine totals agg broadcast back, then a
    * map-side `explode(sequence(...))` bounded by ceil(rate) per row — the
    * corpus never shuffles, and the expansion factor is exactly the
    * upsampling the caller asked for.
    */
  def tokenMixtureUpsample(df: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, shareTimesBudget: Map[String, Double],
      seed: Long): DataFrame = {
    require(shareTimesBudget.nonEmpty && shareTimesBudget.values.forall(_ > 0))
    require(!df.columns.contains("epoch"),
      "input already has an 'epoch' column (reserved for the copy index)")
    val listed = df.where(col(sourceCol).isin(shareTimesBudget.keys.toSeq: _*))
    val totals = listed.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).as("__tot"))
    val budgetExpr = shareTimesBudget.foldLeft(lit(null).cast("double")) {
      case (acc, (src, tb)) => when(col(sourceCol) === src, lit(tb)).otherwise(acc)
    }
    val hash01 = bucketCol(idCol, seed, portable = true).cast("double") / 10000.0
    listed.join(broadcast(totals), Seq(sourceCol))
      // same null/zero-token guard as tokenMixture: nothing measurable to
      // budget -> rate 0, keep nothing
      .withColumn("__rate",
        when(col("__tot") > 0, budgetExpr / col("__tot")).otherwise(lit(0.0)))
      .withColumn("epoch",
        explode(sequence(lit(0), greatest(ceil(col("__rate")).cast("int") - 1, lit(0)))))
      .where(col("epoch") < floor(col("__rate")).cast("int") ||
        (col("epoch") === floor(col("__rate")).cast("int") &&
          hash01 < col("__rate") - floor(col("__rate"))))
      .select((df.columns.map(col) :+ col("epoch")).toSeq: _*)
  }

  /** Temperature-based source mixing (the T5/mC4 alpha-sampling step):
    * target share of source `i` is `q_i = n_i^alpha / sum_j n_j^alpha`
    * over the per-source token counts — `alpha = 1` keeps natural
    * proportions, `alpha -> 0` flattens toward uniform, upweighting
    * low-resource sources. Each source then keeps documents with rate
    * `min(1, q_i * budgetTokens / n_i)` under the same seeded-md5 hash01
    * filter as [[tokenMixture]] (uniform within source, deterministic,
    * reshard-stable), so the EXPECTED kept tokens hit the tempered mix.
    *
    * Scale shape: one partial-combine agg for the totals, the share
    * normalizer as a window over that (tiny, source-count-sized) frame,
    * one broadcast join back, one map-side keep — the corpus never
    * shuffles. Sources whose token sum is null or zero drop entirely
    * (nothing measurable to temper; same guard rationale as
    * [[tokenMixture]]).
    */
  def temperatureMixture(df: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, alpha: Double, budgetTokens: Double, seed: Long): DataFrame = {
    val rated = temperatureRates(df, tokenCol, sourceCol, alpha, budgetTokens)
    val hash01 = bucketCol(idCol, seed, portable = true).cast("double") / 10000.0
    df.join(broadcast(rated), Seq(sourceCol))
      .where(hash01 < col("__rate"))
      .select(df.columns.map(col).toSeq: _*)
  }

  /** The UNCLAMPED per-source mixture rates alone — (sourceCol, __rate)
    * with rate > 1 meaning upsampling — the broadcastable frame
    * [[tokenMixtureUpsample]] is built on and the static side its
    * streaming twin pins against a reference corpus
    * ([[graft.streaming.Streaming.mixtureUpsampleStream]]). Null/zero
    * token sums guard to rate 0, as everywhere.
    */
  def mixtureRates(df: DataFrame, tokenCol: String, sourceCol: String,
      shareTimesBudget: Map[String, Double]): DataFrame = {
    require(shareTimesBudget.nonEmpty && shareTimesBudget.values.forall(_ > 0))
    val listed = df.where(col(sourceCol).isin(shareTimesBudget.keys.toSeq: _*))
    val budgetExpr = shareTimesBudget.foldLeft(lit(null).cast("double")) {
      case (acc, (src, tb)) => when(col(sourceCol) === src, lit(tb)).otherwise(acc)
    }
    listed.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).as("__tot"))
      .withColumn("__rate",
        when(col("__tot") > 0, budgetExpr / col("__tot")).otherwise(lit(0.0)))
      .select(col(sourceCol), col("__rate"))
  }

  /** The tempered per-source keep rates alone — (sourceCol, __rate), the
    * broadcastable frame [[temperatureMixture]] joins and the static side
    * a streaming twin pins against a reference corpus
    * ([[graft.streaming.Streaming.temperatureKeepStream]]).
    */
  def temperatureRates(df: DataFrame, tokenCol: String, sourceCol: String,
      alpha: Double, budgetTokens: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).cast("double").as("__tot"))
      .where(col("__tot") > 0)
      .withColumn("__pa", pow(col("__tot"), lit(alpha)))
    // the share normalizer Z = sum_j n_j^alpha is a SCALAR over the (tiny,
    // source-count-sized) totals frame. r18: computed as an aggregate +
    // broadcast cross join instead of a sum().over(Window.partitionBy(lit(1)))
    // — Catalyst folds the literal partition key away, leaving an EMPTY
    // window spec that WindowExec executes by moving the frame to a single
    // partition (the "No Partition Defined" warning every Verify run
    // logged; guide §2.4). The aggregate keeps partial map-side combining
    // and never single-partitions anything, and the totals frame stays
    // bounded by the distinct source count at any corpus scale.
    totals
      .crossJoin(broadcast(totals.agg(sum(col("__pa")).as("__z"))))
      .withColumn("__rate",
        least(lit(1.0), col("__pa") / col("__z") * lit(budgetTokens) / col("__tot")))
      .select(col(sourceCol), col("__rate"))
  }

  /** Single-pass labeled variant of [[hashSplit]]: every row tagged with its
    * split name in ONE scan — the shape for split-wide reporting (per-split
    * stats, partitioned writes via `.write.partitionBy("split")`) where
    * [[hashSplit]]'s one-frame-per-split shape would scan once per split.
    * Assignment is identical to hashSplit (same bucket math), which the
    * suite asserts.
    */
  def splitLabels(df: DataFrame, idCol: String, weights: Seq[Double],
      seed: Long, names: Seq[String], portable: Boolean = false): DataFrame = {
    require(names.length == weights.length && weights.forall(_ > 0))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).map(_ / total * 10000.0)
    val bucket = bucketCol(idCol, seed, portable)
    val label = weights.indices.foldRight(lit(names.last): Column) { (i, acc) =>
      when(bucket >= math.floor(cum(i)).toLong && bucket < math.floor(cum(i + 1)).toLong,
        lit(names(i))).otherwise(acc)
    }
    df.withColumn("split", label)
  }
}
