package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping regex matches — the codegen'd replacement for
  * `size(regexp_extract_all(text, pattern, 0))` on scoring hot paths
  * (quality metrics, language ID): identical Java-regex `find()` loop and
  * therefore identical counts, but no per-match UTF8String, no array
  * materialization, and the compiled Pattern is cached per pattern string
  * (regexp_extract_all re-uses its pattern too, but builds the full match
  * array just to take its size). Differential-tested in SpanExprSpec.
  */
case class CountMatches(child: Expression, pattern: String)
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_matches"

  override protected def nullSafeEval(input: Any): Any =
    CountMatches.compute(input.asInstanceOf[UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the pattern is a compile-time constant: reference it via a cached
    // global instead of re-escaping into the generated source
    val patRef = ctx.addReferenceObj("cmPattern", pattern, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.CountMatches.compute($c, $patRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountMatches {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Pattern]()

  /** Public so generated code can call it. */
  def compute(text: UTF8String, pattern: String): Int = {
    val p = cache.computeIfAbsent(pattern, Pattern.compile(_))
    val m = p.matcher(text.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }

  def apply(text: Column, pattern: String): Column =
    ColumnBridge.column(CountMatches(ColumnBridge.expression(text), pattern))
}
