package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k smallest DISTINCT string values per group, as a sorted array — the
  * order-statistics core of a KMV (k-minimum-values) distinct-count sketch.
  *
  * Mergeable bounded state: each map task keeps ≤k distinct values per
  * group, partials merge by set-union-then-truncate, so the shuffle carries
  * at most k short strings per (group, map partition) — the same
  * partial/final shape as [[TopKPairsAgg]], and the property that makes KMV
  * a SKETCH rather than a `collect_set` (whose state is O(distinct), i.e.
  * unbounded at 100 TB).
  *
  * Unlike HLL (engine-specific bias tables), KMV over a cross-engine hash
  * (md5) is DETERMINISTIC and reproducible in plain SQL — the DuckDB oracle
  * recomputes the identical k-th order statistic and estimate.
  */
case class KMinStringsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
  with UnaryLike[Expression] {
  require(k > 0, "kmin_strings: k must be positive")

  override def prettyName: String = "kmin_strings"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  /** Insert only if it would rank among the k smallest (set dedups);
    * `copy` = false for values this aggregate already owns (merge /
    * deserialize paths), true for row-backed input.
    */
  private def add(
      b: java.util.TreeSet[UTF8String], v: UTF8String, copy: Boolean): Unit = {
    def retained = if (copy) AggBuffers.owned(v) else v
    if (b.size < k) { b.add(retained); () }
    else if (v.compareTo(b.last) < 0 && b.add(retained)) { b.pollLast(); () }
  }

  override def update(
      b: java.util.TreeSet[UTF8String], input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[UTF8String], copy = true)
    b
  }

  override def merge(
      b: java.util.TreeSet[UTF8String],
      o: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    val it = o.iterator()
    while (it.hasNext) add(b, it.next(), copy = false)
    b
  }

  override def eval(b: java.util.TreeSet[UTF8String]): Any = {
    val out = new Array[Any](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending → sorted
  }

  override def serialize(b: java.util.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.size)
    val it = b.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      b.add(UTF8String.fromBytes(buf))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KMinStringsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMinStringsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KMinStringsAgg =
    copy(child = newChild)
}

object KMinStringsAgg {
  def apply(value: Column, k: Int): Column =
    ColumnBridge.column(
      KMinStringsAgg(ColumnBridge.expression(value), k).toAggregateExpression())
}
