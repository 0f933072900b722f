package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the co-located-join lever for repeated joins on
  * the same key at 100 TB.
  *
  * A join between two tables bucketed on the join key with the same bucket
  * count needs NO shuffle at all — each task reads bucket i of both sides
  * and joins locally (sort-merge without the exchange). For a corpus that
  * is joined on `doc_id` every day (quality scores, dedup verdicts,
  * annotations), paying one bucketed write turns every later join from a
  * full shuffle of the corpus into a metadata-only plan — the single
  * biggest repeated-shuffle saver Spark offers. The no-Exchange property is
  * asserted in BucketingSuite.
  *
  * Bucket-count sizing: aim for ~128-512 MB per bucket at the target scale
  * (100 TB / 256 MB ≈ 400k buckets); bucket counts should match across
  * tables that join (or be integer multiples with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sorted: Boolean = true, mode: SaveMode = SaveMode.Overwrite): Unit =
    writeBucketed(df, table, Seq(key), buckets, sorted, mode)

  /** Multi-key variant: a join is exchange-free on the bucketed side only
    * when the bucket spec covers the join keys AS CO-PARTITIONING — joining
    * on (table, bucket) against a table bucketed on (bucket) alone still
    * shuffles both sides, so composite-keyed indexes (LSH `(table, bucket)`,
    * ingest `(band, bucket)`) must bucket by the full key list.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int,
      sorted: Boolean, mode: SaveMode): Unit =
    writeBucketed(df, table, keys, buckets, sorted, mode, path = None)

  /** `path` makes the table external — bucketed data lands at an explicit
    * location instead of the session warehouse dir.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int,
      sorted: Boolean, mode: SaveMode, path: Option[String]): Unit = {
    require(keys.nonEmpty, "writeBucketed needs at least one bucket key")
    val base = path.foldLeft(df.write.mode(mode))((w, p) => w.option("path", p))
    val w = base.bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sorted) w.sortBy(keys.head, keys.tail: _*) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free by
    * construction when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
