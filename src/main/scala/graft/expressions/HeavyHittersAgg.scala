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

/** Misra-Gries heavy-hitters summary: at most `m` (token → count) entries
  * per group, single pass, mergeable — the top-talkers / frequent-terms
  * sketch whose state is BOUNDED regardless of vocabulary size. A
  * `groupBy(token).count()` materializes the whole vocabulary; at 100 TB
  * a token/URL/IP domain can be billions of distinct values, while this
  * buffer never exceeds m entries on either side of the shuffle.
  *
  * Guarantees (public: Misra–Gries 1982; merge form: Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): for every token,
  * `est ≤ true ≤ est + floor(n / (m+1))` where n is the group's total
  * count — so every token with true count > n/(m+1) is PRESENT in the
  * summary, and counts are never over-estimated. When a group's distinct
  * count never exceeds m, no decrement ever fires and every count is
  * EXACT — the regime the DuckDB oracle pins; the approximate regime's
  * bound is property-tested against exact counts.
  *
  * Update: hit → +1; miss with room → insert 1; miss when full → decrement
  * ALL entries by 1 and drop zeros (amortized O(1): each decrement pays
  * for a prior insert). Merge: add counts pairwise, then if over m keep
  * the top m after subtracting the (m+1)-th largest count — the mergeable-
  * summaries reduction that preserves the error bound.
  *
  * Output: map<token, count> of the ≤ m retained entries (callers rank /
  * truncate with plain array expressions).
  */
case class HeavyHittersAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {
  require(m > 0, "heavy_hitters: m must be positive")

  override def prettyName: String = "heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long]()

  /** Decrement every count, dropping zeros (the classic MG step). */
  private def decrementAll(b: java.util.HashMap[UTF8String, Long]): Unit = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
    }
  }

  override def update(
      b: java.util.HashMap[UTF8String, Long],
      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String]
      val cur = b.get(t)
      if (cur != 0L || b.containsKey(t)) b.put(t, cur + 1L)
      else if (b.size < m) b.put(AggBuffers.owned(t), 1L)
      else decrementAll(b)
    }
    b
  }

  override def merge(
      b: java.util.HashMap[UTF8String, Long],
      o: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val it = o.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b.get(e.getKey)
      // keys from `o` are already owned by this task (deserialize path)
      b.put(e.getKey, cur + e.getValue)
    }
    if (b.size > m) {
      // subtract the (m+1)-th largest count from all, drop <= 0
      val counts = new Array[Long](b.size)
      var i = 0
      val vit = b.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(b.size - m - 1) // (m+1)-th largest
      val eit = b.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    b
  }

  override def eval(b: java.util.HashMap[UTF8String, Long]): Any = {
    // deterministic map order: token ascending (hash-map iteration order
    // must never leak into results)
    val keys = new Array[UTF8String](b.size)
    b.keySet().toArray(keys)
    java.util.Arrays.sort(keys, (a: UTF8String, c: UTF8String) => a.compareTo(c))
    val ks = new Array[Any](keys.length)
    val vs = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) { ks(i) = keys(i); vs(i) = b.get(keys(i)); i += 1 }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override def serialize(b: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
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

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val c = in.readLong()
      b.put(UTF8String.fromBytes(buf), c)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object HeavyHittersAgg {
  def apply(value: Column, m: Int): Column =
    ColumnBridge.column(
      HeavyHittersAgg(ColumnBridge.expression(value), m).toAggregateExpression())
}
