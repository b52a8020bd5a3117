package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** In-row unordered-pair expansion for LSH buckets — the codegen'd
  * replacement for the interpreted nested-lambda form
  *
  * `flatten(transform(ids, x => transform(filter(ids, y => y > x),
  *    y => struct(x AS id_a, y AS id_b))))`
  *
  * which evaluates O(bucket²) interpreted lambda calls (each one a filter
  * closure + a struct allocation) per bucket row. One expression, one
  * nested loop, identical pair set AND identical order (for each x in
  * array order: every y later-in-VALUE — `y > x` — in array order).
  *
  * Elements are either atomic ids (long / string → output
  * `array<struct<id_a, id_b>>`) or `struct<id, sig>` rows (the SimHash
  * gather → output `array<struct<id_a, id_b, sig_a, sig_b>>`, compared by
  * the `id` field). Differential-tested against the lambda form in
  * SpanExprSpec.
  */
case class UnorderedPairs(child: Expression) extends UnaryExpression {

  @transient private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val isStructElem: Boolean =
    elemType.isInstanceOf[StructType]

  override def dataType: DataType = elemType match {
    case StructType(fields) =>
      // struct<id, sig> → struct<id_a, id_b, sig_a, sig_b>
      val id = fields(0)
      val sig = fields(1)
      ArrayType(StructType(Seq(
        StructField("id_a", id.dataType, id.nullable),
        StructField("id_b", id.dataType, id.nullable),
        StructField("sig_a", sig.dataType, sig.nullable),
        StructField("sig_b", sig.dataType, sig.nullable))),
        containsNull = false)
    case t =>
      ArrayType(StructType(Seq(
        StructField("id_a", t, nullable = false),
        StructField("id_b", t, nullable = false))),
        containsNull = false)
  }

  override def prettyName: String = "unordered_pairs"

  override protected def nullSafeEval(input: Any): Any =
    UnorderedPairs.compute(input.asInstanceOf[ArrayData], elemType, isStructElem)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("upElemType", elemType,
      "org.apache.spark.sql.types.DataType")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnorderedPairs.compute($c, $et, $isStructElem)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnorderedPairs {

  /** Spark `>` for the supported id types (long; string = UTF8String
    * binary order, which IS Spark's string comparison).
    */
  private def gt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => x > y
    case (x: java.lang.Integer, y: java.lang.Integer) => x > y
    case (x: UTF8String, y: UTF8String) => x.compareTo(y) > 0
    case _ => throw new IllegalArgumentException(
      s"unordered_pairs: unsupported id type ${a.getClass}")
  }

  /** Public so generated code can call it. */
  def compute(arr: ArrayData, elemType: DataType, structElem: Boolean): GenericArrayData = {
    if (!structElem) {
      val n = arr.numElements()
      val vals = new Array[Any](n)
      var i = 0
      while (i < n) { vals(i) = arr.get(i, elemType); i += 1 }
      val out = new java.util.ArrayList[Any](n * 2)
      i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          if (gt(vals(j), vals(i)))
            out.add(new GenericInternalRow(Array[Any](vals(i), vals(j))))
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    } else {
      val st = elemType.asInstanceOf[StructType]
      val idT = st.fields(0).dataType
      val sigT = st.fields(1).dataType
      val n = arr.numElements()
      val ids = new Array[Any](n)
      val sigs = new Array[Any](n)
      var i = 0
      while (i < n) {
        val row = arr.getStruct(i, 2)
        ids(i) = row.get(0, idT)
        sigs(i) = row.get(1, sigT)
        i += 1
      }
      val out = new java.util.ArrayList[Any](n * 2)
      i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          if (gt(ids(j), ids(i)))
            out.add(new GenericInternalRow(
              Array[Any](ids(i), ids(j), sigs(i), sigs(j))))
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  def apply(ids: Column): Column =
    ColumnBridge.column(UnorderedPairs(ColumnBridge.expression(ids)))
}
