package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k (tf desc, df asc, term asc) — the aggregate form of the
  * salient-terms ranking window (same rationale as [[TopKPairsAgg]]: the
  * window shuffles and SORTS every (doc, term) row to rank it; the
  * TypedImperativeAggregate ships at most k entries per (doc, map
  * partition) and never sorts more than its k-element heap). Term order is
  * UTF8String binary — identical to Spark's string ordering — so results
  * are bit-identical to the `row_number` formulation (differential-tested
  * in SpanExprSpec).
  *
  * Output: `array<struct<term, tf, df>>` sorted by the ranking order; the
  * caller derives rank from the position.
  */
case class TopKTermsAgg(
    first: Expression, // tf (long)
    second: Expression, // df (long)
    third: Expression, // term (string)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKTermsAgg.Buffer] with TernaryLike[Expression] {
  require(k > 0, "topk_terms: k must be positive")

  override def prettyName: String = "topk_terms"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false),
      StructField("df", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKTermsAgg.Buffer =
    new TopKTermsAgg.Buffer(k)

  override def update(b: TopKTermsAgg.Buffer, input: InternalRow): TopKTermsAgg.Buffer = {
    val tf = first.eval(input)
    val df = second.eval(input)
    val t = third.eval(input)
    if (tf != null && df != null && t != null)
      b.add(tf.asInstanceOf[Long], df.asInstanceOf[Long],
        t.asInstanceOf[UTF8String].clone()) // buffers may be reused rows
    b
  }

  override def merge(b: TopKTermsAgg.Buffer, o: TopKTermsAgg.Buffer): TopKTermsAgg.Buffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKTermsAgg.Buffer): Any = {
    val arr = b.sortedBest()
    new GenericArrayData(arr.map { e =>
      new GenericInternalRow(Array[Any](e.term, e.tf, e.df)): Any
    })
  }

  override def serialize(b: TopKTermsAgg.Buffer): Array[Byte] = {
    val entries = b.entries()
    var size = 4
    val termBytes = entries.map(_.term.getBytes)
    entries.indices.foreach(i => size += 16 + 4 + termBytes(i).length)
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putLong(entries(i).tf); bb.putLong(entries(i).df)
      bb.putInt(termBytes(i).length); bb.put(termBytes(i))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKTermsAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKTermsAgg.Buffer(k)
    var i = 0
    while (i < n) {
      val tf = bb.getLong
      val df = bb.getLong
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      b.add(tf, df, UTF8String.fromBytes(tb))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKTermsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKTermsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKTermsAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TopKTermsAgg {

  final case class Entry(tf: Long, df: Long, term: UTF8String)

  /** "x better than y" under (tf desc, df asc, term asc). */
  private def better(x: Entry, y: Entry): Boolean = {
    if (x.tf != y.tf) return x.tf > y.tf
    if (x.df != y.df) return x.df < y.df
    x.term.compareTo(y.term) < 0
  }

  /** k-bounded heap; head = WORST retained entry. */
  final class Buffer(k: Int) {
    private val pq = new java.util.PriorityQueue[Entry](
      math.max(k, 1),
      // head must be the worst → "least" under reversed betterness
      (x: Entry, y: Entry) =>
        if (better(x, y)) 1 else if (better(y, x)) -1 else 0)

    def add(tf: Long, df: Long, term: UTF8String): Unit = {
      val e = Entry(tf, df, term)
      if (pq.size < k) { pq.add(e); () }
      else if (better(e, pq.peek())) { pq.poll(); pq.add(e); () }
    }

    def mergeFrom(o: Buffer): Unit = {
      val it = o.pq.iterator()
      while (it.hasNext) {
        val e = it.next()
        if (pq.size < k) { pq.add(e); () }
        else if (better(e, pq.peek())) { pq.poll(); pq.add(e); () }
      }
    }

    def entries(): Array[Entry] = pq.toArray(new Array[Entry](pq.size))

    def sortedBest(): Array[Entry] = {
      val a = entries()
      java.util.Arrays.sort(a, (x: Entry, y: Entry) =>
        if (better(x, y)) -1 else if (better(y, x)) 1 else 0)
      a
    }
  }

  def apply(tf: Column, df: Column, term: Column, k: Int): Column =
    ColumnBridge.column(
      TopKTermsAgg(ColumnBridge.expression(tf), ColumnBridge.expression(df),
        ColumnBridge.expression(term), k).toAggregateExpression())
}
