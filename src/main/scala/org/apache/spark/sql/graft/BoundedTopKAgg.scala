package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StructType}

/** Bounded per-group top-k: keeps the k SMALLEST struct values under the
  * struct's natural (field-order) ordering and emits them as a sorted
  * array. Descending ranks are expressed by negating the leading order
  * field on the caller side.
  *
  * Scale rationale: the standard grouped-top-k idiom —
  * `row_number().over(Window.partitionBy(g).orderBy(o))` + filter —
  * shuffles and SORTS every input row of every group just to discard all
  * but k of them. This aggregate is a bounded max-heap per group inside
  * ObjectHashAggregate: the partial (map-side) pass already reduces each
  * group to ≤ k rows per task, so the shuffle carries at most
  * tasks × groups × k rows and nothing ever sorts the full partition.
  * Memory is O(groups × k) regardless of group skew — a billion-row hot
  * group costs the same buffer as a ten-row group.
  */
case class BoundedTopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[UnsafeRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"bounded top-k needs k > 0, got $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  /** Interpreted field-order ordering over the buffered rows. Only used
    * on heap insert/evict and final sort of ≤ k+1 elements — never on
    * the full input stream, so interpreted (vs codegen) is fine here. */
  @transient private lazy val rowOrdering: Ordering[UnsafeRow] = {
    val ord = TypeUtils.getInterpretedOrdering(structType)
    new Ordering[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(a, b)
    }
  }

  /** Re-projects incoming struct values into self-contained UnsafeRows:
    * the scan reuses its output row buffer, so buffering `child.eval`
    * results directly would alias bytes that the next input overwrites. */
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType => TypeUtils.checkForOrderingExpr(s, prettyName)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a struct input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bounded_topk"

  // max-heap: head is the worst (largest) retained row, evicted first
  override def createAggregationBuffer(): mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty[UnsafeRow](rowOrdering)

  private def insert(buf: mutable.PriorityQueue[UnsafeRow], row: UnsafeRow): Unit = {
    if (buf.size < k) {
      buf.enqueue(row)
    } else if (rowOrdering.compare(row, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(row)
    }
  }

  override def update(buf: mutable.PriorityQueue[UnsafeRow], input: InternalRow)
      : mutable.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      val candidate = toUnsafe(v.asInstanceOf[InternalRow])
      // cheap reject before the copy: full heap and not better than worst
      if (buf.size < k || rowOrdering.compare(candidate, buf.head) < 0) {
        insert(buf, candidate.copy())
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[UnsafeRow],
                     other: mutable.PriorityQueue[UnsafeRow])
      : mutable.PriorityQueue[UnsafeRow] = {
    other.foreach(insert(buf, _)) // rows in `other` are already owned copies
    buf
  }

  override def eval(buf: mutable.PriorityQueue[UnsafeRow]): Any =
    new GenericArrayData(buf.toArray.sorted(rowOrdering).asInstanceOf[Array[Any]])

  override def serialize(buf: mutable.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { row =>
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopKAgg =
    copy(child = newChild)
}

/** Bounded DISTINCT top-k: the k smallest DISTINCT struct values under
  * field-order ordering, as a sorted array.
  *
  * This is the KMV sketch's exact state algebra: a duplicate hash must
  * NOT occupy a slot (it would push the k-th minimum upward and bias
  * the cardinality estimate low), so the buffer is a TreeSet — dedupe
  * and worst-eviction are both O(log k), memory O(k) per group
  * regardless of how many duplicates the stream carries. Update,
  * merge, and eval are all duplicate-idempotent and order-independent,
  * which is what lets the streaming KMV monitor's converged state
  * equal the batch sketch bit-for-bit. Everything else mirrors
  * [[BoundedTopKAgg]]. */
case class BoundedDistinctTopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[UnsafeRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"bounded distinct top-k needs k > 0, got $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val rowOrdering: Ordering[UnsafeRow] = {
    val ord = TypeUtils.getInterpretedOrdering(structType)
    new Ordering[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(a, b)
    }
  }

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType => TypeUtils.checkForOrderingExpr(s, prettyName)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a struct input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bounded_distinct_topk"

  override def createAggregationBuffer(): mutable.TreeSet[UnsafeRow] =
    mutable.TreeSet.empty[UnsafeRow](rowOrdering)

  private def insert(buf: mutable.TreeSet[UnsafeRow], row: UnsafeRow): Unit = {
    if (buf.size < k) {
      buf.add(row) // no-op on an ordering-equal duplicate
    } else if (rowOrdering.compare(row, buf.last) < 0) {
      if (buf.add(row)) buf.remove(buf.last) // evict the new worst
    }
  }

  override def update(buf: mutable.TreeSet[UnsafeRow], input: InternalRow)
      : mutable.TreeSet[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      val candidate = toUnsafe(v.asInstanceOf[InternalRow])
      // cheap reject before the copy: full and not better than worst
      if (buf.size < k || rowOrdering.compare(candidate, buf.last) < 0) {
        insert(buf, candidate.copy())
      }
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[UnsafeRow],
                     other: mutable.TreeSet[UnsafeRow])
      : mutable.TreeSet[UnsafeRow] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[UnsafeRow]): Any =
    new GenericArrayData(buf.toArray.asInstanceOf[Array[Any]]) // already sorted

  override def serialize(buf: mutable.TreeSet[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { row =>
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedDistinctTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedDistinctTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedDistinctTopKAgg =
    copy(child = newChild)
}
