package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** `top_k(struct, k)` — per-group k largest struct values (struct
  * ordering = lexicographic over fields), returned as a descending
  * array. A TypedImperativeAggregate with a bounded min-heap buffer:
  *
  * The window formulation of per-key top-k
  * (`row_number().over(partitionBy(key).orderBy(...)) <= k`) shuffles
  * and sorts EVERY scored row. This aggregate keeps ≤ k rows per group
  * per task and partial-merges heaps, so the shuffle carries at most
  * k × tasks rows per group — the difference between shuffling N² ANN
  * scores and shuffling k·P of them at 100 TB.
  *
  * Deterministic: ties resolve by the struct's own total order, so
  * callers encode tie-breaks as struct fields (e.g. negated id).
  *
  * `distinct = true` gives SET semantics: a struct value equal (under
  * the same total order) to one already retained is skipped, so
  * `top_k_distinct(s, k)` over a multiset ≡ `top_k(s, k)` over its
  * distinct form (FunctionsSpec pins the identity). Scanning only the
  * ≤ k RETAINED rows suffices: the heap's minimum never decreases
  * once the buffer is full, so a duplicate of an EVICTED value always
  * fails the `> head` admission test (head ≥ the evicted minimum),
  * and a duplicate of a RETAINED value is caught by the scan. This is
  * what lets the k-NN descent rounds feed `current lists ∪ rescored
  * candidates` straight into the aggregate — the whole-frame
  * `.distinct()` exchange that guarded slot duplication becomes the
  * k-row scan here, one fewer shuffle per round (guide §2.3/§2.4).
  */
case class TopKAgg(child: Expression, k: Int, distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, "top_k requires k > 0")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val ordering =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[Any]]
  // min-heap: head is the SMALLEST retained value (eviction candidate)
  private lazy val heapOrdering: Ordering[InternalRow] =
    (a: InternalRow, b: InternalRow) => ordering.compare(b, a)
  @transient private lazy val projector = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty(heapOrdering)

  // Under `distinct`, values equal to a RETAINED row are skipped; see
  // the class doc for why scanning the ≤ k retained rows is enough.
  private def retained(buf: mutable.PriorityQueue[InternalRow],
      row: InternalRow): Boolean =
    distinct && buf.exists(r => ordering.compare(r, row) == 0)

  private def offer(buf: mutable.PriorityQueue[InternalRow],
      row: InternalRow): Unit =
    if (buf.size < k) {
      if (!retained(buf, row)) buf.enqueue(row)
    } else if (ordering.compare(row, buf.head) > 0 && !retained(buf, row)) {
      buf.dequeue(); buf.enqueue(row)
    }

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, projector(v.asInstanceOf[InternalRow]).copy())
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(row => offer(buf, row))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any = {
    // heapOrdering is already the reversed (descending-by-value)
    // comparator, so sorting by it directly yields largest-first.
    val sorted = buf.toArray.sorted(heapOrdering)
    new GenericArrayData(sorted.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { row =>
      val unsafe = row.asInstanceOf[UnsafeRow]
      val bytes = unsafe.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val rowBytes = new Array[Byte](len)
      dis.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k expects a struct child, got ${other.simpleString}")
    }
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "top_k"
}

object TopKAgg {
  /** Column API: k largest struct values per group, descending array. */
  def topK(e: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      TopKAgg(GraftColumnBridge.toExpression(e), k).toAggregateExpression())

  /** Set-semantics variant: equal struct values occupy ONE slot —
    * `topKDistinct(s, k)` over a multiset ≡ `topK(s, k)` over its
    * distinct form, without the upstream dedup exchange. */
  def topKDistinct(e: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      TopKAgg(GraftColumnBridge.toExpression(e), k, distinct = true)
        .toAggregateExpression())
}
