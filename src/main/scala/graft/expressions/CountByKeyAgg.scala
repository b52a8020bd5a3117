package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row counts per key as one map<string,bigint> — `groupBy(key).count()`
  * folded into a single aggregate value, built to ride an `observe` node:
  * the SAME action that writes a fan-out range also delivers its per-sink
  * counts, instead of a second scan re-reading every written byte.
  *
  * State is one (key → count) entry per DISTINCT key, partial-merged
  * map-side — bounded by sink cardinality (rule table × labels, config-
  * sized), NOT by row count, which is what makes it observe-safe at 100 TB.
  * Keys iterate sorted (TreeMap), so the emitted map is deterministic.
  * Null keys are counted under the empty string (a routed row always has a
  * tag; defensive).
  */
case class CountByKeyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "count_by_key"
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): java.util.TreeMap[UTF8String, Long] =
    new java.util.TreeMap[UTF8String, Long]()

  private def add(
      b: java.util.TreeMap[UTF8String, Long],
      k: UTF8String, n: Long, copy: Boolean): Unit =
    if (b.containsKey(k)) { b.put(k, b.get(k) + n); () }
    else { b.put(if (copy) AggBuffers.owned(k) else k, n); () }

  override def update(
      b: java.util.TreeMap[UTF8String, Long],
      input: InternalRow): java.util.TreeMap[UTF8String, Long] = {
    val v = child.eval(input)
    val k = if (v == null) UTF8String.EMPTY_UTF8 else v.asInstanceOf[UTF8String]
    add(b, k, 1L, copy = true)
    b
  }

  override def merge(
      b: java.util.TreeMap[UTF8String, Long],
      o: java.util.TreeMap[UTF8String, Long]): java.util.TreeMap[UTF8String, Long] = {
    val it = o.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(b, e.getKey, e.getValue, copy = false)
    }
    b
  }

  override def eval(b: java.util.TreeMap[UTF8String, Long]): Any = {
    val keys = new Array[Any](b.size)
    val vals = new Array[Any](b.size)
    val it = b.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(b: java.util.TreeMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.size)
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      b.put(UTF8String.fromBytes(buf), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CountByKeyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountByKeyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): CountByKeyAgg =
    copy(child = newChild)
}

object CountByKeyAgg {
  def apply(key: Column): Column =
    ColumnBridge.column(
      CountByKeyAgg(ColumnBridge.expression(key)).toAggregateExpression())
}
