package graft.expressions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Driver-compiled, executor-executed grok extraction: ONE regex pass per
  * row yields every named field. The built-in alternative — one
  * `regexp_extract(line, pattern, i)` per field — re-executes the full
  * pattern once per field (a 10-field apache-log grok would match each line
  * 10×) and allocates a Matcher + String each time; this runs the match once
  * with a thread-local reused Matcher (same rationale as
  * [[CompiledRuleTable]], profiled in BASELINE.md).
  *
  * @param groupIdx 1-based capturing-group index of each field in `pattern`
  *                 (the grok compiler rewrites dictionary-internal groups to
  *                 non-capturing, so indices are stable).
  */
final case class CompiledGrok(
    pattern: String,
    fields: Array[String],
    groupIdx: Array[Int])
    extends Serializable {

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)
  @transient private lazy val local: ThreadLocal[Matcher] =
    ThreadLocal.withInitial(() => compiled.matcher(""))

  /** null input or non-matching line → null (no fields, grok "no match");
    * matched line → one string per field, null for non-participating
    * optional groups.
    */
  def extract(value: UTF8String): InternalRow = {
    if (value == null) return null
    val m = local.get().reset(value.toString)
    if (!m.find()) return null
    val out = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      val g = m.group(groupIdx(i))
      out(i) = if (g == null) null else UTF8String.fromString(g)
      i += 1
    }
    new GenericInternalRow(out)
  }
}

/** `grok_extract(line)` → `struct<field1 string, ..., fieldN string>`
  * (null when the line does not match). Stays inside whole-stage codegen via
  * a plan reference object, like [[TagRewriteExpr]].
  */
case class GrokExtractExpr(child: Expression, grok: CompiledGrok)
    extends UnaryExpression {

  override def dataType: DataType =
    StructType(grok.fields.map(f => StructField(f, StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "grok_extract"

  override def eval(input: InternalRow): Any =
    grok.extract(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val grokRef = ctx.addReferenceObj("grok", grok, classOf[CompiledGrok].getName)
    val c = child.genCode(ctx)
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    ev.copy(code =
      code"""
        |${c.code}
        |$rowCls ${ev.value} =
        |  $grokRef.extract(${c.isNull} ? null : ${c.value});
        |boolean ${ev.isNull} = ${ev.value} == null;
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
