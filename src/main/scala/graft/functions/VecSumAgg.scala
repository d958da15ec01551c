package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `vec_sum(x, n)` — element-wise exact int64 sum of an array<long>
  * column, as ONE aggregate over ONE n-long buffer.
  *
  * Why it exists (round 17, the RpProject lesson): the Lloyd update
  * stated the coordinate sums as 64 separate
  * `sum(element_at(x, i))` aggregates — a ~300-node plan that
  * Catalyst re-optimizes on EVERY training action (the loop
  * checkpoints each iteration, so each iteration is an action).
  * This aggregate is one plan node; the arithmetic is identical
  * (exact long addition, no order sensitivity), FunctionsSpec pins
  * the equality, and the mean projection that consumed s1..s64
  * becomes one `transform` over the summed array.
  *
  * Missing trailing elements contribute 0 (never exercised — the
  * lattice frames are fixed-width by construction); a group's sum
  * row appears only if the group has rows, exactly as the column
  * sums did (the empty-cluster LEFT JOIN + COALESCE rule upstream
  * is unchanged).
  */
case class VecSumAgg(child: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(n > 0, "vec_sum requires n > 0")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val m = math.min(n, arr.numElements())
      var i = 0
      while (i < m) {
        buf(i) += arr.getLong(i)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) {
      buf(i) += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](8 * n)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < n) { bb.putLong(buf(i)); i += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vec_sum expects array<bigint>, got ${other.simpleString}")
    }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "vec_sum"
}

object VecSumAgg {
  /** Column API: element-wise int64 sums of an n-long array column. */
  def vecSum(x: Column, n: Int): Column =
    GraftColumnBridge.toColumn(
      VecSumAgg(GraftColumnBridge.toExpression(x), n).toAggregateExpression())
}
