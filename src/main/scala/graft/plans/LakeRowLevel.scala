package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftSQLBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

/** Row-level DML (DELETE / UPDATE / MERGE INTO) for the native lake tables
  * — copy-on-write at FILE granularity, the same shape the real Delta and
  * Iceberg runtimes use: find the files containing at least one matching
  * row (one predicate-pushed scan — partition pruning and parquet
  * row-group stats skip untouched files before any task launches), rewrite
  * ONLY those files through Spark's distributed parquet writer, and commit
  * remove+add atomically. Files without matches are never read or moved,
  * so a selective DELETE over a 100 TB table costs IO proportional to the
  * touched files, not the table.
  *
  * Spark-first wiring: Spark's own parser produces `DeleteFromTable` /
  * `UpdateTable` / `MergeIntoTable`; an injected resolution rule
  * ([[LakeRowLevelRule]]) swaps the resolved plan for a runnable command
  * before Spark's row-level rewrite machinery (which requires the full
  * `SupportsRowLevelOperations` stack) would reject the table. The
  * reference has no row-level surface at all — it delegates DML to the
  * runtime jars (v3.5/.../IcebergCatalogUnit.scala:30-42,
  * AbstractDeltaCatalogUnit.scala:29-80); this is native.
  */
object LakeRowLevel {

  /** Internal columns [[RowLevelHandle.scanWithRowIds]] must provide. */
  val FileIdCol = "__gfid"
  val RowIxCol = "__grix"

  /** Change-row marker column handed to
    * [[RowLevelHandle.commitRewriteWithChanges]] (the Delta CDF spelling;
    * format-agnostic here — the handle decides what to do with it).
    */
  val ChangeTypeCol = "_change_type"

  /** Dataset aliases used to re-qualify captured expressions. */
  val TargetQual = "__graft_t"
  val SourceQual = "__graft_s"

  /** What a command's planning scan READ — handed to the handle so the
    * format's optimistic-commit conflict check can scope itself the way
    * delta-spark's ConflictChecker does: a concurrent winner's ADD only
    * conflicts when the added file may contain rows matching `predicates`;
    * a winner's REMOVE only when it took a file in `readFiles` or one the
    * predicates may have matched. `readWholeTable` is the conservative
    * everything-conflicts form (no predicate was extractable, or the
    * statement genuinely reads the full table).
    *
    * At 100 TB this is the difference between a table that sustains
    * concurrent streaming appends + row rewrites and one that aborts
    * every rewrite under load: disjoint-partition traffic commits on
    * retry instead of surfacing ConcurrentAppend/DeleteRead.
    */
  final case class ReadScope(readWholeTable: Boolean,
      predicates: Seq[Expression], readFiles: Set[String])
  object ReadScope {
    /** Conservative: the transaction may have read anything. */
    val wholeTable: ReadScope = ReadScope(readWholeTable = true, Nil, Set.empty)
  }

  /** Collapse foldable subtrees (the analyzer's `CAST(50 AS BIGINT)`
    * around literals, constant arithmetic) to plain literals, the shape
    * the driver-side stats evaluator matches on. Analysis-only work.
    */
  private[plans] def foldConstants(e: Expression): Expression = e.transformUp {
    case f if f.foldable && !f.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.Literal] =>
      // `now()` & friends are foldable at analysis but Unevaluable until
      // the optimizer substitutes them — keep such nodes as-is (the stats
      // evaluator then stays conservative) instead of crashing the DML
      scala.util.Try(org.apache.spark.sql.catalyst.expressions.Literal
        .create(f.eval(), f.dataType)).getOrElse(f)
  }

  /** What a lake format contributes: an identity-carrying scan and an
    * atomic file-level rewrite commit. Everything else (matching, rewrite
    * dataflow, merge semantics) is format-agnostic.
    */
  trait RowLevelHandle {
    /** The table in declared column order PLUS [[FileIdCol]] (string file
      * identity, stable across this handle's lifetime) and [[RowIxCol]]
      * (row ordinal within the file) — with merge-on-read deletes already
      * applied, so a rewritten file carries no resurrected rows.
      */
    def scanWithRowIds(spark: SparkSession): DataFrame
    /** One atomic commit: the files named by `removedFileIds` (values of
      * [[FileIdCol]]) leave the table, `replacement` rows (logical table
      * columns) enter it.
      */
    def commitRewrite(spark: SparkSession, removedFileIds: Seq[String],
        replacement: DataFrame, operation: String = "REWRITE",
        scope: ReadScope = ReadScope.wholeTable): Unit
    /** True when the format wants the DML commands to capture row-level
      * change rows (Delta with `delta.enableChangeDataFeed = true`) and
      * commit through [[commitRewriteWithChanges]].
      */
    def wantsChangeRows: Boolean = false
    /** [[commitRewrite]] plus the commit's change rows (logical table
      * columns + `_change_type`: insert / delete / update_preimage /
      * update_postimage). Formats without a change feed ignore the rows.
      */
    def commitRewriteWithChanges(spark: SparkSession, removedFileIds: Seq[String],
        replacement: DataFrame, changeRows: DataFrame,
        operation: String = "REWRITE",
        scope: ReadScope = ReadScope.wholeTable): Unit =
      commitRewrite(spark, removedFileIds, replacement, operation, scope)
    /** True when DELETE should commit row-level delete markers (Delta
      * deletion vectors under `delta.enableDeletionVectors = true`)
      * instead of copy-on-write rewrites.
      */
    def deleteByRowIds: Boolean = false
    /** Merge-on-read DELETE commit: `matchedRowIds` = ([[FileIdCol]],
      * [[RowIxCol]]) of every deleted row; `changeRows` ride along when
      * the format keeps a change feed.
      */
    def commitDeleteRows(spark: SparkSession, matchedRowIds: DataFrame,
        changeRows: Option[DataFrame], operation: String = "DELETE",
        scope: ReadScope = ReadScope.wholeTable): Unit =
      throw new UnsupportedOperationException(s"$describe does not support MoR deletes")
    /** True when UPDATE should mask + append (merge-on-read) instead of
      * copy-on-write.
      */
    def updateByRowIds: Boolean = false
    /** Merge-on-read UPDATE commit: matched rows mask out, `newRows`
      * (their rewritten versions) append, one atomic commit.
      */
    def commitUpdateRows(spark: SparkSession, matchedRowIds: DataFrame,
        newRows: DataFrame, changeRows: Option[DataFrame],
        operation: String = "UPDATE",
        scope: ReadScope = ReadScope.wholeTable): Unit =
      throw new UnsupportedOperationException(s"$describe does not support MoR updates")
    /** A rewrite that moves bytes, not rows (OPTIMIZE / re-clustering):
      * formats with a change feed mark it so the feed skips the commit.
      */
    def commitCompaction(spark: SparkSession, removedFileIds: Seq[String],
        replacement: DataFrame): Unit =
      // byte motion only: the compaction read exactly the files it
      // rewrites, so concurrent appends never conflict with it
      commitRewrite(spark, removedFileIds, replacement, "OPTIMIZE",
        ReadScope(readWholeTable = false, Nil, removedFileIds.toSet))
    /** (file id, size in bytes, partition-group key) of every live data
      * file — OPTIMIZE's bin-packing input, driver-held exactly like the
      * formats' own file lists. Files sharing a group key can be packed
      * into one output file; compaction only pays off inside a group with
      * two or more small files, which is what makes repeated OPTIMIZE
      * idempotent.
      */
    def listFiles(spark: SparkSession): Seq[(String, Long, String)]
    /** Identity-partition columns (layout hint for compaction). */
    def partitionColumns: Seq[String]
    /** Retention maintenance: drop files no retained version references
      * (and, for Iceberg, expire the unretained snapshots). Returns
      * (files deleted, bytes deleted).
      */
    def vacuum(spark: SparkSession, retainVersions: Int): (Long, Long)
    /** Age-based retention (delta-spark's `RETAIN n HOURS`): keep every
      * version/snapshot committed within the window; current always stays.
      */
    def vacuumHours(spark: SparkSession, hours: Int): (Long, Long) =
      throw new UnsupportedOperationException(s"$describe does not support RETAIN HOURS")
    /** Table description for error messages. */
    def describe: String
    /** Commit/snapshot history, newest first: (version, snapshotId,
      * timestampMs, operation, addedFiles, removedFiles) — snapshotId and
      * the file counts are format-optional.
      */
    def history(spark: SparkSession): Seq[(Long, Option[Long], Long, String, Option[Long], Option[Long])] =
      throw new UnsupportedOperationException(s"$describe does not expose history")
    /** Write a replay-accelerator checkpoint at the current version;
      * returns (version, state rows). Format-optional.
      */
    def checkpoint(spark: SparkSession, v2: Boolean = false): (Long, Long) =
      throw new UnsupportedOperationException(s"$describe does not support CHECKPOINT")
    /** Restore the table to an earlier version (Delta: commit version;
      * Iceberg: snapshot id) — history intact, time travel still reaches
      * the undone state. Returns (files re-added, files removed).
      */
    def restore(spark: SparkSession, version: Long): (Long, Long) =
      throw new UnsupportedOperationException(s"$describe does not support RESTORE")
    /** Restore to the state current at the timestamp (delta-spark's
      * `TIMESTAMP AS OF` / Iceberg's `rollback_to_timestamp`): the latest
      * version/snapshot at-or-before `tsMs` wins; already-current = (0, 0).
      */
    def restoreTimestamp(spark: SparkSession, tsMs: Long): (Long, Long) =
      throw new UnsupportedOperationException(s"$describe does not support RESTORE")
  }

  /** Wrapper keeping captured expressions out of TreeNode's expression
    * traversal (a LeafRunnableCommand's product members of Expression type
    * would otherwise be visited by CheckAnalysis while intentionally
    * unresolved — they re-resolve by name against the rewrite DataFrames).
    */
  final case class ExprBox(e: Expression) {
    def column: Column = GraftSQLBridge.column(e)
  }

  /** Re-qualify a resolved expression so it resolves again inside the
    * command's DataFrames: target attributes become `__graft_t.name`,
    * source attributes `__graft_s.name`.
    */
  private[plans] def requalify(e: Expression, targetIds: Set[ExprId],
      sourceIds: Set[ExprId]): ExprBox = ExprBox(e.transform {
    case a: AttributeReference if targetIds.contains(a.exprId) =>
      UnresolvedAttribute(Seq(TargetQual, a.name))
    case a: AttributeReference if sourceIds.contains(a.exprId) =>
      UnresolvedAttribute(Seq(SourceQual, a.name))
  })

  private[plans] def ids(output: Seq[Attribute]): Set[ExprId] = output.map(_.exprId).toSet

  /** The target relation behind optional aliases, if it is a lake table
    * exposing a row-level handle.
    */
  @annotation.tailrec
  private[plans] def lakeTarget(p: LogicalPlan): Option[(DataSourceV2Relation, RowLevelHandle)] =
    p match {
      case r: DataSourceV2Relation => r.table match {
        case h: HasRowLevelHandle => h.rowLevelHandle.map(r -> _)
        case _ => None
      }
      case SubqueryAlias(_, child) => lakeTarget(child)
      case _ => None
    }

  /** Assignment keys must be top-level target columns; returns col name. */
  private[plans] def assignmentKey(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => throw new UnsupportedOperationException(
      s"only top-level column assignments are supported (got ${other.sql})")
  }

  /** A matched/not-matched action compiled to boxed form. */
  sealed trait BoxedAction { def cond: Option[ExprBox] }
  final case class BoxedUpdate(cond: Option[ExprBox],
      sets: Seq[(String, ExprBox)]) extends BoxedAction
  final case class BoxedDelete(cond: Option[ExprBox]) extends BoxedAction
  final case class BoxedInsert(cond: Option[ExprBox],
      sets: Seq[(String, ExprBox)]) extends BoxedAction
}

import LakeRowLevel._

/** Mixed into the lake tables that can rewrite themselves. */
trait HasRowLevelHandle {
  def rowLevelHandle: Option[RowLevelHandle]
}

/** Resolution rule: swap resolved row-level plans over handle-bearing lake
  * tables for runnable copy-on-write commands. Runs inside the analyzer's
  * resolution fixed-point, so it fires as soon as the statement is fully
  * resolved — before Spark's own row-level rewrites would reject the table
  * for not implementing SupportsRowLevelOperations.
  */
class LakeRowLevelRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case d @ DeleteFromTable(target, cond) if d.resolved =>
      lakeTarget(target) match {
        case Some((rel, handle)) =>
          LakeDeleteCommand(handle, requalifyT(cond, rel))
        case None => d
      }
    case u @ UpdateTable(target, assignments, cond) if u.resolved =>
      lakeTarget(target) match {
        case Some((rel, handle)) =>
          val sets = assignments.map(a => assignmentKey(a) -> requalifyT(a.value, rel))
          LakeUpdateCommand(handle, sets,
            cond.map(requalifyT(_, rel)).getOrElse(ExprBox(
              org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)))
        case None => u
      }
    case m: MergeIntoTable if m.resolved =>
      lakeTarget(m.targetTable) match {
        case Some((rel, handle)) =>
          val tIds = ids(rel.output)
          val sIds = ids(m.sourceTable.output)
          def rq(e: Expression): ExprBox = requalify(e, tIds, sIds)
          def rowAction(a: MergeAction, clause: String): BoxedAction = a match {
            case ua: UpdateAction =>
              BoxedUpdate(ua.condition.map(rq),
                ua.assignments.map(x => assignmentKey(x) -> rq(x.value)))
            case da: DeleteAction => BoxedDelete(da.condition.map(rq))
            case other => throw new UnsupportedOperationException(
              s"unsupported $clause action: $other")
          }
          val matched = m.matchedActions.map(rowAction(_, "WHEN MATCHED"))
          val notMatched = m.notMatchedActions.map {
            case ia: InsertAction =>
              BoxedInsert(ia.condition.map(rq),
                ia.assignments.map(a => assignmentKey(a) -> rq(a.value)))
            case other => throw new UnsupportedOperationException(
              s"unsupported WHEN NOT MATCHED action: $other")
          }
          val nmbs = m.notMatchedBySourceActions
            .map(rowAction(_, "WHEN NOT MATCHED BY SOURCE"))
          LakeMergeCommand(handle, m.sourceTable, rq(m.mergeCondition),
            matched, notMatched, nmbs)
        case None => m
      }
  }

  private def requalifyT(e: Expression, rel: DataSourceV2Relation): ExprBox =
    requalify(e, ids(rel.output), Set.empty)
}

/** Shared copy-on-write mechanics. */
sealed trait LakeRowLevelCommand extends LeafRunnableCommand {
  def handle: RowLevelHandle

  /** Distinct file ids containing at least one row matching `cond` —
    * driver-bounded by the table's FILE count (the same state the formats'
    * own drivers hold), found by one predicate-pushed scan.
    */
  protected def matchedFiles(df: DataFrame, cond: Column): Seq[String] =
    df.where(cond).select(FileIdCol).distinct()
      .collect().map(_.getString(0)).toSeq

  protected def internalCols: Seq[String] = Seq(FileIdCol, RowIxCol)

  /** The RESOLVED conjuncts of `cond` against `df` — the read predicate
    * the planning scan used, in the form conflict checking evaluates
    * against a winner's file stats (one throwaway analysis pass; nothing
    * executes). Empty when no Filter survives (e.g. a literal-true cond).
    */
  protected def readPredicates(df: DataFrame, cond: Column): Seq[Expression] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    df.where(cond).queryExecution.analyzed.collectFirst {
      case f: Filter => split(f.condition).map(LakeRowLevel.foldConstants)
    }.getOrElse(Nil)
  }

  /** Logical table columns of an id-carrying scan. */
  protected def tableCols(df: DataFrame): Seq[String] =
    df.columns.filterNot(internalCols.contains).toSeq
}

/** DELETE FROM <lake table> WHERE cond. */
case class LakeDeleteCommand(handle: RowLevelHandle, cond: ExprBox)
    extends LakeRowLevelCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val df = handle.scanWithRowIds(spark).as(TargetQual)
    val c = cond.column
    val files = matchedFiles(df, c)
    if (files.nonEmpty) {
      val cols = tableCols(df)
      val touched = df.where(col(FileIdCol).isin(files: _*))
      val hit = touched.where(coalesce(c, lit(false)))
      def changes: Option[DataFrame] =
        if (!handle.wantsChangeRows) None
        else Some(hit.select(cols.map(n => col(s"`$n`")): _*)
          .withColumn(ChangeTypeCol, lit("delete")))
      val scope = ReadScope(readWholeTable = false,
        readPredicates(df, c), files.toSet)
      if (handle.deleteByRowIds) {
        // merge-on-read: ship (file, ordinal) markers, rewrite nothing
        handle.commitDeleteRows(spark, hit.select(col(FileIdCol), col(RowIxCol)),
          changes, "DELETE", scope)
      } else {
        // rows of touched files that do NOT match survive (a null predicate
        // is not a match, so its rows are kept)
        val kept = touched.where(!coalesce(c, lit(false)))
          .select(cols.map(n => col(s"`$n`")): _*)
        changes match {
          case Some(ch) =>
            handle.commitRewriteWithChanges(spark, files, kept, ch, "DELETE", scope)
          case None => handle.commitRewrite(spark, files, kept, "DELETE", scope)
        }
      }
    }
    Seq(Row(files.size.toLong))
  }
  override val output: Seq[Attribute] =
    Seq(AttributeReference("rewritten_files", org.apache.spark.sql.types.LongType)())
}

/** UPDATE <lake table> SET ... [WHERE cond]. */
case class LakeUpdateCommand(handle: RowLevelHandle,
    sets: Seq[(String, ExprBox)], cond: ExprBox)
    extends LakeRowLevelCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val df = handle.scanWithRowIds(spark).as(TargetQual)
    val c = cond.column
    val files = matchedFiles(df, c)
    if (files.nonEmpty) {
      val assigned = sets.toMap
      val cols = tableCols(df)
      val hit = coalesce(c, lit(false))
      val out = cols.map { n =>
        assigned.get(n) match {
          case Some(v) => when(hit, v.column).otherwise(col(s"`$n`")).as(n)
          case None => col(s"`$n`")
        }
      }
      val touched = df.where(col(FileIdCol).isin(files: _*))
      val hitRows = touched.where(hit)
      def changes: Option[DataFrame] =
        if (!handle.wantsChangeRows) None
        else Some(hitRows.select(cols.map(n => col(s"`$n`")): _*)
          .withColumn(ChangeTypeCol, lit("update_preimage"))
          .unionByName(hitRows.select(out: _*)
            .withColumn(ChangeTypeCol, lit("update_postimage"))))
      val scope = ReadScope(readWholeTable = false,
        readPredicates(df, c), files.toSet)
      if (handle.updateByRowIds) {
        // merge-on-read: matched rows mask out, rewritten versions append
        handle.commitUpdateRows(spark,
          hitRows.select(col(FileIdCol), col(RowIxCol)),
          hitRows.select(out: _*), changes, "UPDATE", scope)
      } else {
        val rewritten = touched.select(out: _*)
        changes match {
          case Some(ch) =>
            handle.commitRewriteWithChanges(spark, files, rewritten, ch, "UPDATE", scope)
          case None => handle.commitRewrite(spark, files, rewritten, "UPDATE", scope)
        }
      }
    }
    Seq(Row(files.size.toLong))
  }
  override val output: Seq[Attribute] =
    Seq(AttributeReference("rewritten_files", org.apache.spark.sql.types.LongType)())
}

/** MERGE INTO <lake table> t USING src s ON cond
  * WHEN MATCHED [AND c] THEN UPDATE SET ... | DELETE   (any number, first
  * matching clause wins — SQL standard order)
  * WHEN NOT MATCHED [AND c] THEN INSERT ...
  * WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE ... | DELETE
  *
  * Copy-on-write shape: touched target files = files with >= 1 join match
  * (one semi-join), plus — only when NOT MATCHED BY SOURCE clauses exist —
  * files holding a sourceless row some clause fires on (one anti-join);
  * only their rows join again for the rewrite, everything else never
  * moves. Inserts ride in the same commit. A target row matching more
  * than one source row errors (the standard's cardinality rule, same
  * behavior as the Delta runtime).
  */
case class LakeMergeCommand(handle: RowLevelHandle, source: LogicalPlan,
    cond: ExprBox, matched: Seq[BoxedAction], notMatched: Seq[BoxedInsert],
    notMatchedBySource: Seq[BoxedAction] = Nil)
    extends LakeRowLevelCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val tgt = handle.scanWithRowIds(spark).as(TargetQual)
    val srcBase = GraftSQLBridge.ofRows(spark, source)
    val c = cond.column
    val cols = tableCols(tgt)

    val matchedF = matchedFiles(tgt.join(srcBase.as(SourceQual), c, "left_semi"), lit(true))
    val nmbsF =
      if (notMatchedBySource.isEmpty) Nil
      else {
        val fires = notMatchedBySource
          .map(_.cond.map(b => coalesce(b.column, lit(false))).getOrElse(lit(true)))
          .reduce(_ || _)
        matchedFiles(tgt.join(srcBase.as(SourceQual), c, "left_anti"), fires)
      }
    val files = (matchedF ++ nmbsF).distinct

    // read scope for conflict checking: the target-only conjuncts of the
    // ON condition (a row failing them cannot satisfy the full conjunction,
    // so a concurrent add of only such rows cannot change any clause
    // decision). NOT MATCHED BY SOURCE clauses read every target row —
    // whole-table scope then; likewise when no target-only conjunct is
    // extractable.
    val scope: ReadScope = {
      val tIds = ids(tgt.queryExecution.analyzed.output)
      def split(e: Expression): Seq[Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      val conjs = tgt.join(srcBase.as(SourceQual), c, "left_semi")
        .queryExecution.analyzed.collectFirst { case j: Join => j.condition }
        .flatten.toSeq.flatMap(split).map(foldConstants)
      val tgtOnly = conjs.filter(e =>
        e.references.nonEmpty && e.references.forall(a => tIds.contains(a.exprId)))
      if (notMatchedBySource.nonEmpty || tgtOnly.isEmpty) ReadScope.wholeTable
      else ReadScope(readWholeTable = false, tgtOnly, files.toSet)
    }

    def clauseIx(actions: Seq[BoxedAction]): Column =
      // first matching clause wins: index 1..n, 0 = no clause applies
      actions.zipWithIndex.foldRight(lit(0): Column) {
        case ((a, i), rest) =>
          val ac = a.cond.map(b => coalesce(b.column, lit(false))).getOrElse(lit(true))
          when(ac, lit(i + 1)).otherwise(rest)
      }

    // replacement rows for the touched files (+ captured change rows when
    // the format keeps a change feed; merge-on-read handles mask + append
    // instead of replacing)
    var changeParts = Seq.empty[DataFrame]
    var morMask: Option[DataFrame] = None
    var morAppend: Option[DataFrame] = None
    val rewritten: Option[DataFrame] = if (files.isEmpty) None else {
      val aff = tgt.where(col(FileIdCol).isin(files: _*))
      // matchedness is tracked by a constant source-side marker (a join key
      // could legitimately be null-valued on the source side, so no source
      // column can stand in for "this row had a partner"); alias applied
      // AFTER withColumn so the captured expressions' __graft_s qualifier
      // still resolves
      val marked = aff.join(
        srcBase.withColumn("__gsrc", lit(1)).as(SourceQual), c, "left_outer")
      // cardinality rule: no target row may match two source rows
      val dup = marked.where(col("__gsrc").isNotNull)
        .groupBy(col(FileIdCol), col(RowIxCol)).count()
        .where(col("count") > 1).limit(1).count()
      require(dup == 0L,
        s"MERGE cardinality violation on ${handle.describe}: a target row " +
          "matches more than one source row")
      val action = when(col("__gsrc").isNotNull, clauseIx(matched)).otherwise(lit(0))
      val nmbsAction =
        if (notMatchedBySource.isEmpty) lit(0)
        else when(col("__gsrc").isNull, clauseIx(notMatchedBySource)).otherwise(lit(0))
      def deleteIxsOf(actions: Seq[BoxedAction]): Seq[Int] =
        actions.zipWithIndex.collect { case (_: BoxedDelete, i) => i + 1 }
      def updateChain(actions: Seq[BoxedAction], ixCol: String, n: String,
          base: Column): Column =
        actions.zipWithIndex.foldRight(base) {
          case ((BoxedUpdate(_, sets), i), rest) =>
            sets.toMap.get(n) match {
              case Some(v) => when(col(ixCol) === (i + 1), v.column).otherwise(rest)
              case None => rest
            }
          case (_, rest) => rest
        }
      val outCols = cols.map { n =>
        val old = col(s"$TargetQual.`$n`")
        updateChain(matched, "__action",  n,
          updateChain(notMatchedBySource, "__nmbs", n, old)).as(n)
      }
      val withAction = marked.withColumn("__action", action)
        .withColumn("__nmbs", nmbsAction)
      val delM = deleteIxsOf(matched)
      val delN = deleteIxsOf(notMatchedBySource)
      val kept = withAction
        .where((if (delM.isEmpty) lit(true) else !col("__action").isin(delM: _*)) &&
          (if (delN.isEmpty) lit(true) else !col("__nmbs").isin(delN: _*)))
      def updateIxsOf(actions: Seq[BoxedAction]): Seq[Int] =
        actions.zipWithIndex.collect { case (_: BoxedUpdate, i) => i + 1 }
      def fired(cn: String, ixs: Seq[Int]): Column =
        if (ixs.isEmpty) lit(false) else col(cn).isin(ixs: _*)
      val affectedCond =
        fired("__action", delM) || fired("__nmbs", delN) ||
          fired("__action", updateIxsOf(matched)) ||
          fired("__nmbs", updateIxsOf(notMatchedBySource))
      if (handle.wantsChangeRows) {
        val oldCols = cols.map(n => col(s"$TargetQual.`$n`").as(n))
        val deleted = withAction
          .where(fired("__action", delM) || fired("__nmbs", delN))
          .select(oldCols: _*).withColumn(ChangeTypeCol, lit("delete"))
        val updRows = withAction
          .where(fired("__action", updateIxsOf(matched)) ||
            fired("__nmbs", updateIxsOf(notMatchedBySource)))
        val pre = updRows.select(oldCols: _*)
          .withColumn(ChangeTypeCol, lit("update_preimage"))
        val post = updRows.select(outCols: _*)
          .withColumn(ChangeTypeCol, lit("update_postimage"))
        changeParts = Seq(deleted, pre, post)
      }
      if (handle.updateByRowIds) {
        // merge-on-read MERGE: mask every clause-affected row, append only
        // the updated versions (inserts join below); unchanged rows stay in
        // their original files unmasked
        morMask = Some(withAction.where(affectedCond)
          .select(col(s"$TargetQual.$FileIdCol").as(FileIdCol),
            col(s"$TargetQual.$RowIxCol").as(RowIxCol)))
        morAppend = Some(withAction
          .where(fired("__action", updateIxsOf(matched)) ||
            fired("__nmbs", updateIxsOf(notMatchedBySource)))
          .select(outCols: _*))
        None
      } else Some(kept.select(outCols: _*))
    }

    // WHEN NOT MATCHED inserts: source rows with no target partner at all
    // (any source row matching a target row lives in a touched file by
    // definition, so anti-joining the full target is equivalent and exact)
    val inserts: Option[DataFrame] =
      if (notMatched.isEmpty) None
      else {
        val unmatched = srcBase.as(SourceQual).join(tgt, c, "left_anti")
        val outCols = cols.map { n =>
          val dt = tgt.schema(n).dataType
          val v = notMatched.zipWithIndex.foldRight(lit(null).cast(dt): Column) {
            case ((BoxedInsert(_, sets), i), rest) =>
              sets.toMap.get(n) match {
                case Some(e) => when(col("__ins") === (i + 1), e.column).otherwise(rest)
                case None => rest
              }
          }
          v.as(n)
        }
        Some(unmatched.withColumn("__ins", clauseIx(notMatched))
          .where(col("__ins") > 0).select(outCols: _*))
      }

    def changesOpt(i: Option[DataFrame]): Option[DataFrame] =
      if (!handle.wantsChangeRows) None
      else (changeParts ++ i.toSeq.map(_.withColumn(ChangeTypeCol, lit("insert"))))
        .reduceOption(_ unionByName _)
    if (handle.updateByRowIds && (morMask.nonEmpty || inserts.nonEmpty)) {
      val spark2 = spark
      val emptyIds = morMask.isEmpty
      val appended = (morAppend.toSeq ++ inserts.toSeq).reduceOption(_ unionByName _)
      (morMask, appended) match {
        case (Some(ids), Some(app)) =>
          handle.commitUpdateRows(spark2, ids, app, changesOpt(inserts), "MERGE", scope)
        case (None, Some(app)) =>
          // inserts only: a plain append commit suffices — but keep the
          // row-id contract by masking nothing via an empty-update is not
          // expressible, so route through commitRewrite-free append:
          handle.commitUpdateRows(spark2,
            tgt.where(lit(false)).select(col(FileIdCol), col(RowIxCol)), app,
            changesOpt(inserts), "MERGE", scope)
        case (Some(ids), None) =>
          handle.commitDeleteRows(spark2, ids, changesOpt(None), "MERGE", scope)
        case _ => require(emptyIds) // unreachable
      }
    } else (rewritten, inserts) match {
      case (None, None) => // nothing matched and no insert clauses: no-op
      case (r, i) =>
        val replacement = (r.toSeq ++ i.toSeq).reduce(_ unionByName _)
        changesOpt(i) match {
          case Some(changes) =>
            handle.commitRewriteWithChanges(spark, files, replacement, changes, "MERGE", scope)
          case None => handle.commitRewrite(spark, files, replacement, "MERGE", scope)
        }
    }
    Seq(Row(files.size.toLong))
  }
  override val output: Seq[Attribute] =
    Seq(AttributeReference("rewritten_files", org.apache.spark.sql.types.LongType)())
}

/** OPTIMIZE LAKE TABLE fqn [SMALLER THAN bytes] [TARGET n FILES]
  * [ZORDER BY (c1, ...)] — file compaction for the native lake tables,
  * built on the same copy-on-write commit as the DML commands: pick the
  * files below the size threshold (ALL files when re-clustering with
  * ZORDER), rewrite their rows bin-packed — per identity partition when
  * the table has one, range-partitioned along the z-curve when ZORDER is
  * given ([[graft.operators.Layout.zorderN]]) — and commit remove+add
  * atomically. Untouched (already-large) files never move; history stays
  * readable through time travel. The real runtimes' OPTIMIZE has exactly
  * this shape; the reference delegates it to the jars.
  */
case class OptimizeLakeTableCommand(table: Seq[String], smallerThan: Option[Long],
    targetFiles: Option[Int], zorder: Seq[String]) extends LeafRunnableCommand {

  private val DefaultTargetBytes = 128L << 20

  override def run(spark: SparkSession): Seq[Row] = {
    val tbl = GraftSQLBridge.loadV2Table(spark, table)
    val handle = tbl match {
      case h: HasRowLevelHandle => h.rowLevelHandle.getOrElse(
        throw new UnsupportedOperationException(
          s"${table.mkString(".")} does not support OPTIMIZE"))
      case _ => throw new UnsupportedOperationException(
        s"${table.mkString(".")} is not a native lake table")
    }
    val files = handle.listFiles(spark)
    val threshold = smallerThan.getOrElse(DefaultTargetBytes)
    val pick =
      if (zorder.nonEmpty) files // re-clustering rewrites everything selected
      else files.filter(_._2 < threshold)
        // only groups holding >= 2 small files benefit — this is what makes
        // a second OPTIMIZE a no-op instead of churning single-file groups
        .groupBy(_._3).valuesIterator.filter(_.size >= 2).flatten.toSeq
    if (pick.isEmpty || (zorder.isEmpty && pick.size < 2))
      return Seq(Row(0L, 0L))

    val scan = handle.scanWithRowIds(spark)
    val rows = scan.where(col(FileIdCol).isin(pick.map(_._1): _*))
      .drop(FileIdCol, RowIxCol)
    val target = targetFiles.getOrElse(
      math.max(1, math.ceil(pick.map(_._2).sum.toDouble / DefaultTargetBytes).toInt))
    val parts = handle.partitionColumns
    val arranged =
      if (zorder.nonEmpty) {
        // z-curve domains from the data itself: one min/max agg per column
        val aggs = zorder.flatMap(c => Seq(
          min(col(s"`$c`").cast("double")), max(col(s"`$c`").cast("double"))))
        val b = rows.agg(aggs.head, aggs.tail: _*).head()
        val bounds = zorder.zipWithIndex.map { case (c, i) =>
          (c, b.getDouble(2 * i), b.getDouble(2 * i + 1))
        }
        val bits = math.min(16, 62 / zorder.size)
        graft.operators.Layout.zorderN(rows, bounds, bits, target)
      } else if (parts.nonEmpty)
        // all rows of one partition value land in one task, so the hive
        // writer emits ONE file per value
        rows.repartition(parts.map(c => col(s"`$c`")): _*)
      else rows.repartition(target)
    // byte motion, not row motion: a change feed must skip this commit
    handle.commitCompaction(spark, pick.map(_._1), arranged)
    Seq(Row(pick.size.toLong, pick.map(_._2).sum))
  }

  override val output: Seq[Attribute] = Seq(
    AttributeReference("compacted_files", org.apache.spark.sql.types.LongType)(),
    AttributeReference("compacted_bytes", org.apache.spark.sql.types.LongType)())
}

/** CONVERT TO DELTA|ICEBERG '<path>' — in-place migration of a plain
  * parquet directory (optionally hive-partitioned) to a native lake
  * table: data files never move or rewrite, one metadata commit registers
  * them all. Metadata-only driver work + one schema-inference read.
  */
case class ConvertToLakeCommand(path: String, format: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val n = format match {
      case "DELTA" => graft.sources.lake.LakeNativeWrite.convertToDelta(spark, dir)
      case "ICEBERG" => graft.sources.lake.LakeNativeWrite.convertToIceberg(spark, dir)
      case other => throw new UnsupportedOperationException(
        s"CONVERT TO $other: DELTA and ICEBERG only")
    }
    Seq(Row(n))
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("converted_files", org.apache.spark.sql.types.LongType)())
}

/** CHECKPOINT LAKE TABLE fqn — write the replay-accelerator state file at
  * the current version (Delta: classic single-part checkpoint parquet +
  * `_last_checkpoint`); replay then reads one parquet + the JSON tail.
  */
case class CheckpointLakeTableCommand(table: Seq[String], v2: Boolean = false)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val tbl = GraftSQLBridge.loadV2Table(spark, table)
    val handle = tbl match {
      case h: HasRowLevelHandle => h.rowLevelHandle.getOrElse(
        throw new UnsupportedOperationException(
          s"${table.mkString(".")} does not support CHECKPOINT"))
      case _ => throw new UnsupportedOperationException(
        s"${table.mkString(".")} is not a native lake table")
    }
    val (v, rows) = handle.checkpoint(spark, v2)
    Seq(Row(v, rows))
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", org.apache.spark.sql.types.LongType)(),
    AttributeReference("state_rows", org.apache.spark.sql.types.LongType)())
}

/** RESTORE LAKE TABLE fqn TO VERSION n | TO TIMESTAMP 'ts' — roll the
  * table back to an earlier state (Delta: commit version, one remove+re-add
  * commit with DV state and metadata restored; Iceberg: snapshot id, a
  * metadata-only rollback of the main ref). The timestamp form resolves
  * the latest version/snapshot at-or-before the timestamp by the same rule
  * time travel uses (delta-spark `RESTORE ... TIMESTAMP AS OF`, Iceberg
  * `rollback_to_timestamp`); accepts `yyyy-MM-dd[ HH:mm:ss[.SSS]]` /
  * ISO-8601 (UTC) or raw epoch millis. History stays intact: time travel
  * still reaches the undone versions, and VACUUM is what eventually
  * reclaims their files.
  */
case class RestoreLakeTableCommand(table: Seq[String], version: Option[Long],
    timestamp: Option[String] = None) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val tbl = GraftSQLBridge.loadV2Table(spark, table)
    val handle = tbl match {
      case h: HasRowLevelHandle => h.rowLevelHandle.getOrElse(
        throw new UnsupportedOperationException(
          s"${table.mkString(".")} does not support RESTORE"))
      case _ => throw new UnsupportedOperationException(
        s"${table.mkString(".")} is not a native lake table")
    }
    val (added, removed) = (version, timestamp) match {
      case (Some(v), _) => handle.restore(spark, v)
      case (None, Some(ts)) => handle.restoreTimestamp(spark, parseTsMs(ts))
      case _ => throw new IllegalArgumentException(
        "RESTORE needs TO VERSION n or TO TIMESTAMP 'ts'")
    }
    Seq(Row(added, removed))
  }

  private def parseTsMs(s: String): Long = {
    val t = s.trim
    // epoch millis must be exactly 13 digits: a looser \d{10,} heuristic
    // would silently read compact datetimes like '20240501120000' as an
    // epoch and restore to a wildly wrong instant
    if (t.matches("\\d{13}")) t.toLong
    else {
      val iso = t.replace(' ', 'T')
      val withTime = if (iso.contains('T')) iso else s"${iso}T00:00:00"
      // offset-carrying forms first ('Z', '+02:00'); only a bare local
      // datetime falls back to the documented UTC interpretation
      try java.time.OffsetDateTime.parse(withTime).toInstant.toEpochMilli
      catch {
        case _: java.time.format.DateTimeParseException =>
          java.time.LocalDateTime.parse(withTime)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      }
    }
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_files", org.apache.spark.sql.types.LongType)(),
    AttributeReference("removed_files", org.apache.spark.sql.types.LongType)())
}

/** SHOW LAKE HISTORY fqn — the commit/snapshot timeline of a native lake
  * table (DESCRIBE HISTORY's shape): one row per version, newest first,
  * operations derived from the log itself so any writer's history reads
  * consistently. Driver-side metadata only — no data files open.
  */
case class ShowLakeHistoryCommand(table: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val tbl = GraftSQLBridge.loadV2Table(spark, table)
    val handle = tbl match {
      case h: HasRowLevelHandle => h.rowLevelHandle.getOrElse(
        throw new UnsupportedOperationException(
          s"${table.mkString(".")} does not expose history"))
      case _ => throw new UnsupportedOperationException(
        s"${table.mkString(".")} is not a native lake table")
    }
    handle.history(spark).map { case (v, sid, ts, op, added, removed) =>
      Row(v, sid.map(Long.box).orNull, ts, op,
        added.map(Long.box).orNull, removed.map(Long.box).orNull)
    }
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", org.apache.spark.sql.types.LongType)(),
    AttributeReference("snapshot_id", org.apache.spark.sql.types.LongType)(),
    AttributeReference("ts_millis", org.apache.spark.sql.types.LongType)(),
    AttributeReference("operation", org.apache.spark.sql.types.StringType)(),
    AttributeReference("added_files", org.apache.spark.sql.types.LongType)(),
    AttributeReference("removed_files", org.apache.spark.sql.types.LongType)())
}

/** VACUUM LAKE TABLE fqn [RETAIN n VERSIONS] — retention maintenance over
  * the native lake tables: Delta deletes every data/DV file no retained
  * version references (log untouched, like the real VACUUM); Iceberg
  * additionally expires the unretained snapshots from the metadata
  * (expire_snapshots + remove_orphan_files in one pass).
  */
case class VacuumLakeTableCommand(table: Seq[String], retainVersions: Int,
    retainHours: Option[Int] = None) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val tbl = GraftSQLBridge.loadV2Table(spark, table)
    val handle = tbl match {
      case h: HasRowLevelHandle => h.rowLevelHandle.getOrElse(
        throw new UnsupportedOperationException(
          s"${table.mkString(".")} does not support VACUUM"))
      case _ => throw new UnsupportedOperationException(
        s"${table.mkString(".")} is not a native lake table")
    }
    val (files, bytes) = retainHours match {
      case Some(h) => handle.vacuumHours(spark, h)
      case None => handle.vacuum(spark, retainVersions)
    }
    Seq(Row(files, bytes))
  }
  override val output: Seq[Attribute] = Seq(
    AttributeReference("deleted_files", org.apache.spark.sql.types.LongType)(),
    AttributeReference("deleted_bytes", org.apache.spark.sql.types.LongType)())
}
