package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at cluster scale. AQE's skew-join
  * splitting (spark.sql.adaptive.skewJoin.enabled, on by default) covers
  * sort-merge joins; these cover the cases AQE can't: skewed aggregations
  * and broadcast-ineligible skewed joins with a known-or-sampled hot-key set.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys :+ salt) partial-aggregates
    * the hot key across `salts` reducers, then a second (tiny) aggregation
    * merges the salted partials. Use for algebraic aggregates (sum/count/
    * min/max) when one key dominates the groupBy shuffle.
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__pn"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"), sum(col("__pn")).as("n_rows"))
  }

  /** Salted join for a skewed left side against a small-ish right side that
    * is still too big to broadcast whole: the left side gets a random salt in
    * [0, salts), the right side is exploded `salts` times, and the join key
    * becomes (key, salt) — the hot key's rows spread over `salts` reducers.
    * Right-side amplification is the price; choose `salts` ~ skew factor.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(pmod(hash(col(key), monotonically_increasing_id()), lit(salts)) + lit(salts), lit(salts)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Sampled hot-key detection: keys holding more than `threshold` of a
    * `fraction` sample. Feed the result to [[splitJoin]].
    */
  def hotKeys(df: DataFrame, key: String, fraction: Double = 0.01,
      threshold: Long = 1000L): DataFrame =
    df.sample(fraction).groupBy(col(key)).count()
      .where(col("count") >= threshold * fraction)
      .select(col(key))

  /** Split-union join: hot keys join via broadcast (their right-side rows are
    * tiny after filtering), the long tail joins shuffle-hash/sort-merge as
    * usual. The classic plan for power-law keys where salting every row is
    * wasteful.
    */
  def splitJoin(left: DataFrame, right: DataFrame, key: String,
      hot: DataFrame): DataFrame = {
    val hotSet = broadcast(hot.select(col(key)).distinct())
    val leftHot = left.join(hotSet, Seq(key), "left_semi")
    val leftCold = left.join(hotSet, Seq(key), "left_anti")
    val rightHot = right.join(hotSet, Seq(key), "left_semi")
    leftHot.join(broadcast(rightHot), Seq(key))
      .unionByName(leftCold.join(right, Seq(key)))
  }
}
