package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Corpus-level MinHash union sketch: aggregates the element-wise minimum of
  * the per-row affine hashes over an array<string> column, producing one
  * k-long signature for the whole group. Because min is commutative and
  * associative the aggregate is algebraic: partial sketches are computed
  * map-side and merged with k longs per partition — at 100 TB, a
  * per-source similarity matrix costs one pass plus a k*8-byte-per-group
  * shuffle. Pair with [[SketchJaccard]] to estimate the Jaccard similarity
  * of two groups' element sets without ever joining them.
  *
  * Uses the same [[HashFamily]] affine permutations as the per-row
  * [[MinHashSignature]], so a group of one row yields exactly that row's
  * signature. (Extension beyond the reference, which has no sketching.)
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_agg expects array<string>, got $t")
  }

  private lazy val coeffs: Array[(Long, Long)] = Array.tabulate(numHashes)(HashFamily.affine)

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = HashFamily.hashString(arr.getUTF8String(i), HashFamily.BaseSeed)
          var j = 0
          while (j < numHashes) {
            val (a, b) = coeffs(j)
            val hv = a * h + b
            if (hv < buffer(j)) buffer(j) = hv
            j += 1
          }
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) { if (other(j) < buffer(j)) buffer(j) = other(j); j += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
  override def prettyName: String = "minhash_agg"
}

/** Estimated Jaccard similarity of the element sets behind two MinHash
  * sketches: the fraction of equal signature positions (Broder '97). Error
  * ~ 1/sqrt(k).
  */
case class SketchJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sketch_jaccard expects two array<bigint>, got $t")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n.toDouble
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SketchJaccard =
    copy(left = l, right = r)
  override def prettyName: String = "sketch_jaccard"
}
