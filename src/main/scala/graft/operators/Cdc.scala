package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture operators: changelog compaction, snapshot apply
  * (MERGE-shaped upsert+delete), and SCD2 history assembly.
  *
  * The reference federates lakehouse tables but ships no change-application
  * operator of its own (Iceberg/Delta writes are delegated to their jars,
  * `v3.5/spark-extensions/.../IcebergCatalogUnit.scala:30-42`); these are the
  * Spark-native equivalents a 100 TB ingestion pipeline needs in front of
  * such tables.
  *
  * Scale design:
  *   - [[latest]] compacts with `max_by(struct(payload), struct(seqCols))`
  *     — a hash aggregation with MAP-SIDE PARTIAL COMBINE, so a changelog
  *     with heavy per-key churn (the common shape: few hot entities, many
  *     updates) reduces locally before its single keyed shuffle. The window
  *     `row_number` formulation most engines reach for first sorts every
  *     partition and combines nothing.
  *   - [[applyChangelog]] touches the base snapshot with one LEFT ANTI join
  *     on the compacted key set. The compacted changes are bounded by
  *     distinct-keys-changed — typically orders of magnitude smaller than
  *     the base — so AQE broadcasts them and the base never shuffles. The
  *     base's payload columns ride untouched through the anti join; only
  *     the inserted/updated rows (changelog-sized) are ever materialized
  *     anew.
  *   - [[scd2]] is one keyed shuffle (window over key, ordered by seq) —
  *     the minimum for interval assembly, since validity ranges are a
  *     per-key order statistic.
  */
object Cdc {

  /** One row per key: the change with the highest `seqCols` tuple wins.
    * Payload = every column not in `keyCols` (seq columns ride along, so the
    * caller can see the winning version). Ties on the full `seqCols` tuple
    * are broken by the remaining payload columns' struct order, making the
    * result deterministic even on degenerate changelogs; give `seqCols` a
    * unique tail column (e.g. a change id) to make ordering total instead.
    */
  def latest(changes: DataFrame, keyCols: Seq[String], seqCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty)
    val payload = changes.columns.filterNot(keyCols.contains)
    val ord = struct((seqCols ++ payload.filterNot(seqCols.contains)).map(col): _*)
    changes.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), ord).as("__w"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** Apply a changelog to a base snapshot: rows whose key never appears in
    * the changelog survive unchanged; keys whose LATEST change is `deleteOp`
    * disappear; every other changed key — including one whose op is NULL
    * (a malformed/partial CDC record) — takes the latest change's payload
    * (an upsert — present-in-base or not). The null-safe comparison
    * matters: a non-null-safe filter would silently DROP a null-op key
    * (excluded from upserts after the anti join already removed it from
    * base), turning a malformed record into a phantom delete. Output
    * schema = base schema; the changelog must carry base's columns plus
    * `seqCols` and `opCol`.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], opCol: String, deleteOp: String = "D"): DataFrame = {
    val compacted = latest(changes, keyCols, seqCols)
    val untouched = base.join(compacted.select(keyCols.map(col): _*), keyCols, "left_anti")
    val upserts = compacted.where(!(col(opCol) <=> deleteOp))
      .select(base.columns.map(col).toSeq: _*)
    untouched.unionByName(upserts)
  }

  /** SCD type-2 history from a changelog: one row per change, carrying its
    * validity interval [`valid_from` = its seq value, `valid_to` = the next
    * change's seq for the key, null while current) and an `is_current`
    * flag. `seqCol` must be totally ordered per key (use [[latest]]-style
    * compaction first if the raw log has same-instant duplicates).
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incrementally extend an SCD2 [[scd2 history]] with a new batch of
    * changes, WITHOUT rebuilding: each changed key's current row closes at
    * the batch's first seq for that key, and the batch's own intervals
    * append (last one current). Requires the append-only contract — every
    * batch seq is greater than the key's history seqs (the in-order replay
    * a commit log gives you); DataEngSuite proves
    * `scd2Apply(scd2(c1), c2) == scd2(c1 union c2)` under it, and the
    * cdc_scd2_inc gate pins the same identity against the DuckDB
    * full-rebuild oracle.
    *
    * Scale: the window shuffle is batch-sized, the `min(seq)` compaction is
    * a partial-combine hash agg of the batch, and the history only takes a
    * key-join against that compacted (AQE-broadcastable) frame — history
    * payload never shuffles, so cost tracks the batch, not the accumulated
    * table.
    */
  def scd2Apply(history: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String): DataFrame = {
    val firstNew = changes.groupBy(keyCols.map(col): _*)
      .agg(min(col(seqCol)).as("__first_new"))
    val closed = history.join(firstNew, keyCols, "left")
      .withColumn("valid_to",
        when(col("is_current") && col("__first_new").isNotNull, col("__first_new"))
          .otherwise(col("valid_to")))
      .withColumn("is_current", col("is_current") && col("__first_new").isNull)
      // the key join fronts keyCols — restore the history's column order so
      // the output schema is positionally stable across applies
      .select(history.columns.map(col).toSeq: _*)
    closed.unionByName(scd2(changes, keyCols, seqCol))
  }
}
