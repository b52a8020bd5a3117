package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sketch primitives as single-pass codegen'd expressions.
  *
  * The SQL-lambda formulations (`aggregate` + `zip_with` + `transform`) are
  * semantically identical but run interpreted — Catalyst does not codegen
  * higher-order functions — and allocate an n-wide array per element; on the
  * bench they dominated the dedup queries (7.7s MinHash / 4.0s SimHash at a
  * mere 5k docs). These expressions keep bit-identical outputs (asserted by
  * differential tests against the lambda forms) in one tight JVM loop.
  */

/** MinHash signature over pre-hashed shingles: for j in 0..n-1,
  * `min over shingles h of xxhash64(h, j)` — bit-identical to
  * `Dedup.minHashFromHashesSql`. Spark's `xxhash64(h:long, j:int)` is
  * XXH64.hashInt(j, XXH64.hashLong(h, 42)) (seed 42, children folded left).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.expressions.MinHashSig.compute($c, $numHashes))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  final val SparkHashSeed = 42L

  /** Public so generated code can call it. */
  def compute(hashes: ArrayData, n: Int): Array[Long] = {
    val out = Array.fill(n)(Long.MaxValue)
    val len = hashes.numElements()
    var i = 0
    while (i < len) {
      val base = XXH64.hashLong(hashes.getLong(i), SparkHashSeed)
      var j = 0
      while (j < n) {
        val v = XXH64.hashInt(j, base)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }

  def apply(shingleHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(shingleHashes), numHashes))
}

/** 64-bit SimHash from pre-hashed words, as the MSB-first '0'/'1' bitstring
  * of `Dedup.simHashBitsSql`: bit j is 1 iff the ±1 votes (by bit j of each
  * word hash) sum positive; string position 0 carries bit 63.
  */
case class SimHashBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any =
    SimHashBits.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHashBits.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two equal-length strings, one pass — replaces
  * `aggregate(zip_with(split(a,""), split(b,""), ...), 0, _+_)`, which
  * materializes two 64-element arrays per PAIR inside the banded self-join.
  * Byte-wise compare is exact for the '0'/'1' bitstrings it is applied to
  * (and for any ASCII input); differential-tested against the built-in form.
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "hamming_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HammingDist.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.HammingDist.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDist {
  /** Public so generated code can call it. */
  def compute(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var d = 0
    var i = 0
    while (i < n) { if (ab(i) != bb(i)) d += 1; i += 1 }
    // zip_with pads the shorter side with null; null === x is null, and
    // when(null, 0).otherwise(1) counts 1 per padded position
    d + (math.max(ab.length, bb.length) - n)
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      HammingDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

object SimHashBits {
  /** Public so generated code can call it. */
  def compute(wordHashes: ArrayData): UTF8String = {
    val counts = new Array[Long](64)
    val len = wordHashes.numElements()
    var i = 0
    while (i < len) {
      val h = wordHashes.getLong(i)
      var j = 0
      while (j < 64) {
        // counts(0) is bit 63 (MSB-first), matching the lambda form
        if (((h >>> (63 - j)) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    val bytes = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      bytes(j) = if (counts(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(bytes)
  }

  def apply(wordHashes: Column): Column =
    ColumnBridge.column(SimHashBits(ColumnBridge.expression(wordHashes)))
}
