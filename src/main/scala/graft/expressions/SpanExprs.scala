package graft.expressions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass codegen'd span/shingle STRING builders.
  *
  * Why these exist (guide §1.2 step 2 — per-task work): the built-in
  * formulation `transform(sequence(1, size(ws) - (n-1)), i ->
  * concat_ws(" ", slice(ws, i, n)))` with `ws = split(trim(text), "\s+")`
  * re-evaluates the FULL `split` inside the lambda for every element —
  * higher-order-function lambdas re-evaluate captured subtrees per call —
  * so a w-word document pays O(w) regex splits of the whole text: O(w²)
  * work per row, all interpreted. These expressions split once and build
  * every span over the word array in a single pass. Each is differential-
  * tested against the lambda formulation it replaces (SpanExprSpec).
  *
  * Word semantics shared with [[ShingleHashes]] (and the SQL
  * `TextFunctions.words`): words = `split(trim(text), "\s+", -1)`,
  * "" after trim → no words.
  */

/** text → n-word shingle strings, one pass.
  *
  * `wholeIfShort = true` reproduces `TextFunctions.shingles`: fewer than n
  * words collapse to ONE whole-text shingle (possibly ""). `false`
  * reproduces the `when(size(ws) < n, array())` guard variant (bigram
  * streams). `distinct = true` fuses the `array_distinct` the LSH verify
  * paths apply (first-occurrence order, same as array_distinct).
  */
case class ShingleStrings(
    child: Expression, n: Int, wholeIfShort: Boolean, distinct: Boolean)
  extends UnaryExpression {
  require(n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings"

  override protected def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[UTF8String], n, wholeIfShort, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ShingleStrings.compute($c, $n, $wholeIfShort, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStrings {
  private val ws = Pattern.compile("\\s+")

  private[expressions] def splitWords(text: UTF8String): Array[String] = {
    val trimmed = text.trim.toString
    if (trimmed.isEmpty) Array.empty else ws.split(trimmed, -1)
  }

  /** Public so generated code can call it. */
  def compute(
      text: UTF8String, n: Int, wholeIfShort: Boolean,
      distinct: Boolean): GenericArrayData = {
    val words = splitWords(text)
    if (words.length < n) {
      return new GenericArrayData(
        if (wholeIfShort) Array[Any](UTF8String.fromString(words.mkString(" ")))
        else Array.empty[Any])
    }
    val total = words.length - n + 1
    val sb = new java.lang.StringBuilder(64)
    if (!distinct) {
      val out = new Array[Any](total)
      var s = 0
      while (s < total) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(s + j))
          j += 1
        }
        out(s) = UTF8String.fromString(sb.toString)
        s += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](total)
      val seen = new java.util.HashSet[String](total * 2)
      var outLen = 0
      var s = 0
      while (s < total) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(s + j))
          j += 1
        }
        val str = sb.toString
        if (seen.add(str)) { out(outLen) = UTF8String.fromString(str); outLen += 1 }
        s += 1
      }
      new GenericArrayData(
        if (outLen == total) out
        else {
          val trimmedOut = new Array[Any](outLen)
          System.arraycopy(out, 0, trimmedOut, 0, outLen)
          trimmedOut
        })
    }
  }

  def apply(text: Column, n: Int, wholeIfShort: Boolean = true,
      distinct: Boolean = false): Column =
    ColumnBridge.column(
      ShingleStrings(ColumnBridge.expression(text), n, wholeIfShort, distinct))
}

/** text → md5 hex fingerprint of every k-word span, position-ordered, one
  * pass — the codegen'd replacement for
  * `transform(sequence(1, size(ws) - (k-1)), i -> md5(concat_ws(" ", slice(ws, i, k))))`
  * in [[graft.dedup.Dedup.spanFps]] (same O(w²)-to-O(w·k) reduction as
  * [[ShingleStrings]], plus one reused MessageDigest instead of one per
  * span). Fewer than k words → empty array. Hex output is bit-identical to
  * Spark's `md5` (lowercase hex of the digest over the span's UTF-8 bytes).
  */
case class Md5SpanFps(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "md5_span_fps"

  override protected def nullSafeEval(input: Any): Any =
    Md5SpanFps.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5SpanFps.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5SpanFps {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val buffers: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](1 << 12))

  /** Public so generated code can call it. */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val words = ShingleStrings.splitWords(text)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val wordBytes = new Array[Array[Byte]](words.length)
    var i = 0
    while (i < words.length) {
      wordBytes(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val md = digests.get()
    val scratch = new Array[Byte](16)
    val total = words.length - k + 1
    val out = new Array[Any](total)
    var s = 0
    while (s < total) {
      var len = k - 1
      var j = 0
      while (j < k) { len += wordBytes(s + j).length; j += 1 }
      var buf = buffers.get()
      if (buf.length < len) {
        buf = new Array[Byte](Integer.highestOneBit(len) * 2)
        buffers.set(buf)
      }
      var pos = 0
      j = 0
      while (j < k) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val wb = wordBytes(s + j)
        System.arraycopy(wb, 0, buf, pos, wb.length)
        pos += wb.length
        j += 1
      }
      md.reset()
      md.update(buf, 0, len)
      md.digest(scratch, 0, 16)
      out(s) = Md5MinHashSig.toHex(scratch)
      s += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(Md5SpanFps(ColumnBridge.expression(text), k))
}
