package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k as a real AGGREGATE — the shuffle-minimal form of
  * "rank within group, keep k".
  *
  * A window (`row_number over (partition by q order by sim)`) must shuffle
  * EVERY scored row to rank it; even the two-stage local/global window form
  * moves the full candidate set once. A TypedImperativeAggregate gets the
  * partial/final protocol instead: each map task keeps a k-element heap per
  * group, and only those ≤k serialized entries per (group, map partition)
  * ever cross the wire. At 100 TB the shuffle for top-10-of-10^9-per-query
  * drops from the full scored set to k×P rows — the same reason
  * `groupBy.agg(min)` beats `min() over (partition by)` for keeper election.
  *
  * Output: `array<struct<sim_ppm, neighbor_id>>` sorted by
  * (sim desc, id asc) — a total order, so results are bit-identical to the
  * window formulation (differential-tested in AnnSpec).
  */
case class TopKPairsAgg(
    left: Expression, // sim (long)
    right: Expression, // id (long)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsAgg.Buffer] with BinaryLike[Expression] {
  require(k > 0, "topk_pairs: k must be positive")

  override def prettyName: String = "topk_pairs"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sim_ppm", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKPairsAgg.Buffer =
    new TopKPairsAgg.Buffer(k)

  override def update(b: TopKPairsAgg.Buffer, input: InternalRow): TopKPairsAgg.Buffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKPairsAgg.Buffer, o: TopKPairsAgg.Buffer): TopKPairsAgg.Buffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKPairsAgg.Buffer): Any = {
    val arr = b.sortedDesc()
    new GenericArrayData(arr.map { e =>
      new GenericInternalRow(Array[Any](e(0), e(1))): Any
    })
  }

  override def serialize(b: TopKPairsAgg.Buffer): Array[Byte] = {
    val entries = b.entries()
    val bb = ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { e => bb.putLong(e(0)); bb.putLong(e(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKPairsAgg.Buffer(k)
    var i = 0
    while (i < n) { b.add(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)
}

object TopKPairsAgg {

  /** k-bounded heap of (sim, id); head = WORST retained entry, so a new
    * candidate only displaces the head when strictly better under the
    * (sim desc, id asc) total order.
    */
  final class Buffer(k: Int) {
    private val pq = new java.util.PriorityQueue[Array[Long]](
      math.max(k, 1),
      (x: Array[Long], y: Array[Long]) => {
        val c = java.lang.Long.compare(x(0), y(0)) // smaller sim = worse
        if (c != 0) c else java.lang.Long.compare(y(1), x(1)) // larger id = worse
      })

    def add(sim: Long, id: Long): Unit = {
      if (pq.size < k) pq.add(Array(sim, id))
      else {
        val w = pq.peek()
        if (sim > w(0) || (sim == w(0) && id < w(1))) {
          pq.poll(); pq.add(Array(sim, id))
        }
      }
    }

    def mergeFrom(o: Buffer): Unit = {
      val it = o.pq.iterator()
      while (it.hasNext) { val e = it.next(); add(e(0), e(1)) }
    }

    def entries(): Array[Array[Long]] =
      pq.toArray(new Array[Array[Long]](pq.size))

    def sortedDesc(): Array[Array[Long]] = {
      val a = entries()
      java.util.Arrays.sort(a, (x: Array[Long], y: Array[Long]) => {
        val c = java.lang.Long.compare(y(0), x(0)) // sim desc
        if (c != 0) c else java.lang.Long.compare(x(1), y(1)) // id asc
      })
      a
    }
  }

  def apply(sim: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKPairsAgg(ColumnBridge.expression(sim), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
