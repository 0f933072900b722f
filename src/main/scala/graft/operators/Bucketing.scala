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
      sorted: Boolean = true, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free by
    * construction when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
