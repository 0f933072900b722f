package graft.sources.lake

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector membership as a broadcast FILTER expression: is row
  * `rix` of file `fid` masked by that file's deletion vector?
  *
  * This is the delta-spark-shaped application of DVs (a per-row bitmap
  * probe inside the scan's filter) and the scale-correct one: the
  * alternative — exploding every bitmap into (file, pos) rows and
  * anti-joining — materializes one row PER DELETED ROW, so a table with
  * 30% deletions pays a join against 30% of itself; the probe pays a
  * binary search per scanned row against bitmaps whose total size the
  * caller bounds before choosing this path. No join, no exchange, and
  * `doGenCode` keeps the scan stage inside whole-stage codegen.
  *
  * Bitmaps travel as RAW encoded bytes (small — the caller's byte cap)
  * and decode lazily ONCE PER EXECUTOR into sorted position arrays; the
  * decoded cache lives on the broadcast value holder, not the (per-task
  * serialized) expression instance.
  */
case class DvMasked(fid: Expression, rix: Expression,
    bitmaps: Broadcast[DvMasked.BitmapHolder])
  extends BinaryExpression with Predicate {

  override def left: Expression = fid
  override def right: Expression = rix
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  def masked(f: UTF8String, r: Long): Boolean = bitmaps.value.contains(f, r)

  override def nullSafeEval(f: Any, r: Any): Any =
    masked(f.asInstanceOf[UTF8String], r.asInstanceOf[Long])

  override def eval(input: InternalRow): Any = {
    val f = fid.eval(input)
    val r = rix.eval(input)
    if (f == null || r == null) false
    else masked(f.asInstanceOf[UTF8String], r.asInstanceOf[Long])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvMasked", this, classOf[DvMasked].getName)
    nullSafeCodeGen(ctx, ev, (f, r) => s"${ev.value} = $ref.masked($f, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(fid = newLeft, rix = newRight)
}

object DvMasked {
  /** One file's encoded bitmap with a decode-once-per-executor cache (the
    * benign volatile race at worst decodes twice).
    */
  private final class Slot(val bytes: Array[Byte]) extends Serializable {
    @transient @volatile private var arr: Array[Long] = _
    def positions: Array[Long] = {
      var a = arr
      if (a == null) { a = RoaringDv.decodeBitmapArray(bytes); arr = a }
      a
    }
  }

  /** Raw encoded bitmaps keyed by file id. The probe runs once per
    * SCANNED row inside codegen, so it is allocation-free: the lookup map
    * is keyed by UTF8String (built once per executor from owned copies —
    * never the scan's possibly-reused buffers) and the decoded position
    * arrays cache per executor.
    */
  final class BitmapHolder(rawByName: Map[String, Array[Byte]]) extends Serializable {
    private val slots: Map[String, Slot] =
      rawByName.map { case (k, v) => k -> new Slot(v) }
    @transient private lazy val byUtf8: java.util.HashMap[UTF8String, Slot] = {
      val m = new java.util.HashMap[UTF8String, Slot](slots.size * 2)
      slots.foreach { case (k, s) => m.put(UTF8String.fromString(k), s) }
      m
    }
    def contains(fid: UTF8String, pos: Long): Boolean = {
      val slot = byUtf8.get(fid)
      slot != null && java.util.Arrays.binarySearch(slot.positions, pos) >= 0
    }
  }
}
