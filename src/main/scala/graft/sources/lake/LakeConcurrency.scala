package graft.sources.lake

/** Typed optimistic-concurrency failures for the native lake writers.
  *
  * The reference jar-delegates all transaction handling (its catalog units
  * hand tables to delta-spark / iceberg-spark, which own the commit
  * protocols), so the taxonomy here follows those engines' PUBLIC
  * surfaces:
  *
  *  - Delta: delta-spark's `io.delta.exceptions` conflict family. A commit
  *    that loses the version race re-validates against every commit that
  *    won and either retries at the next version (a blind append, which
  *    read nothing) or surfaces the most specific conflict.
  *  - Iceberg: `HadoopTableOperations`' contract — the version file is
  *    created with no-overwrite semantics, losing the race is
  *    `CommitFailedException`, appends rebase onto the winner and retry
  *    internally, and every other operation surfaces the failure so the
  *    caller re-runs it against refreshed metadata.
  *
  * At cluster scale this is what makes the table safe under multiple
  * concurrent writers (streaming sinks + batch compaction + DML): version
  * files are claimed atomically, lost races never clobber, and a rewrite
  * planned against a stale snapshot can never silently resurrect or
  * double-delete rows.
  */
object LakeConcurrency {

  /** A concurrent commit won the version and ours cannot serialize after
    * it. Subclasses narrow the cause, most specific thrown first.
    */
  sealed class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  final class ProtocolChangedException(table: String, v: Long)
    extends CommitConflictException(
      s"concurrent commit $v on $table changed the table protocol")

  final class MetadataChangedException(table: String, v: Long)
    extends CommitConflictException(
      s"concurrent commit $v on $table changed the table metadata " +
        "(schema / partitioning / properties)")

  /** A row-rewriting commit (it carries removes) lost to a commit that
    * added files its planning scan never saw. Without read-predicate
    * tracking this is conservative: delta-spark narrows it to adds that
    * match the transaction's read predicates.
    */
  final class ConcurrentAppendException(table: String, v: Long)
    extends CommitConflictException(
      s"concurrent commit $v on $table added files this row-rewriting " +
        "commit did not see")

  final class ConcurrentDeleteDeleteException(table: String, v: Long, path: String)
    extends CommitConflictException(
      s"concurrent commit $v on $table deleted $path, which this commit " +
        "also deletes")

  final class ConcurrentDeleteReadException(table: String, v: Long, path: String)
    extends CommitConflictException(
      s"concurrent commit $v on $table deleted $path, which this commit read")

  /** Two writers used the same idempotency token (streaming sink appId):
    * the winner already recorded this batch, replaying it would double
    * rows.
    */
  final class ConcurrentTransactionException(table: String, v: Long, appId: String)
    extends CommitConflictException(
      s"concurrent commit $v on $table recorded txn appId $appId — this " +
        "commit's idempotency token is already spent")

  /** Iceberg: the metadata version file was taken by a concurrent writer.
    * Appends rebase and retry internally; any other operation must re-run
    * against refreshed metadata (the engine never guesses how a rewrite
    * composes with a commit it did not see).
    */
  final class CommitFailedException(msg: String) extends RuntimeException(msg)
}
