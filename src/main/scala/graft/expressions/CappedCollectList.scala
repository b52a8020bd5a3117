package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a hard per-group element cap — the single-pass,
  * bounded-buffer form of "gather a bucket unless it is degenerate".
  *
  * The LSH pair generators need each bucket's member list, but must drop
  * buckets larger than `maxBucket` (a mass-duplicated boilerplate document
  * makes one bucket quadratic). A plain `collect_list` + size filter
  * materializes the WHOLE degenerate bucket in one aggregation buffer
  * before the filter sees it — OOM at exactly the input a web crawl
  * guarantees. A distributive count + semi-join prunes safely but executes
  * the banded lineage (shingles → signatures → explode, the dominant cost)
  * twice: once for the count, once for the probe side.
  *
  * This aggregate does it in ONE pass with buffers bounded at `limit`
  * elements: update stops accumulating at `limit`, merge concatenates and
  * truncates to `limit`. Set `limit = maxBucket + 1` and filter
  * `size(ids) BETWEEN 2 AND maxBucket` afterwards:
  *
  *  - a group with total ≤ maxBucket elements: every partial held ≤ total
  *    ≤ maxBucket < limit elements, so nothing was ever dropped — the
  *    gathered list is COMPLETE;
  *  - a group with total > maxBucket: the merged buffer saturates at
  *    `limit = maxBucket + 1`, the size filter drops it — and no buffer
  *    anywhere ever held more than maxBucket + 1 entries.
  *
  * Gathered element ORDER is nondeterministic (as with collect_list);
  * callers must be order-insensitive (the pair expansion compares values
  * and dedups, so it is).
  */
case class CappedCollectList(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {
  require(limit > 0, "capped_collect_list: limit must be positive")

  override def prettyName: String = "capped_collect_list"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(
      b: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (b.length < limit) {
      val v = child.eval(input)
      // copy: unsafe-row-backed values (UTF8String, arrays) are reused
      if (v != null) b += InternalRow.copyValue(v)
    }
    b
  }

  override def merge(
      b: mutable.ArrayBuffer[Any],
      o: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    while (i < o.length && b.length < limit) { b += o(i); i += 1 }
    b
  }

  override def eval(b: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(b.toArray)

  private lazy val proj = UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(b: mutable.ArrayBuffer[Any]): Array[Byte] =
    proj(InternalRow(new GenericArrayData(b.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      buf += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CappedCollectList =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedCollectList =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectList =
    copy(child = newChild)
}

object CappedCollectList {
  def apply(c: Column, limit: Int): Column =
    ColumnBridge.column(
      CappedCollectList(ColumnBridge.expression(c), limit).toAggregateExpression())
}
