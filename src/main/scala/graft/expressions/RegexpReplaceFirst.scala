package graft.expressions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Replace the FIRST (leftmost) regex match only — Ruby `String#sub`
  * semantics, used by the reference's tag strip
  * (out_rewrite_tag_filter.rb:156 `tag.sub(@remove_tag_regexp, '')`).
  * Spark's builtin `regexp_replace` replaces ALL occurrences, which diverges
  * for unanchored `remove_tag_regexp` patterns, hence this custom Catalyst
  * expression. The regex and replacement must be foldable (they come from
  * the driver-side rule config), so the Pattern is compiled exactly once per
  * (codegen'd) plan; `doGenCode` keeps the expression inside whole-stage
  * codegen via a reference object rather than falling back to interpretation.
  */
case class RegexpReplaceFirst(subject: Expression, regexp: Expression, rep: Expression)
    extends TernaryExpression {

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = rep

  // Always constructed over string inputs (see companion apply).
  override def dataType: DataType = StringType
  override def nullable: Boolean =
    subject.nullable || regexp.nullable || rep.nullable
  override def prettyName: String = "regexp_replace_first"

  require(regexp.foldable, "regexp_replace_first: pattern must be foldable")
  require(rep.foldable, "regexp_replace_first: replacement must be foldable")

  @transient private lazy val pattern: Pattern =
    Pattern.compile(regexp.eval(null).asInstanceOf[UTF8String].toString)
  @transient private lazy val quotedRep: String =
    Matcher.quoteReplacement(rep.eval(null).asInstanceOf[UTF8String].toString)

  override protected def nullSafeEval(s: Any, r: Any, p: Any): Any =
    UTF8String.fromString(
      pattern.matcher(s.asInstanceOf[UTF8String].toString)
        .replaceFirst(quotedRep))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", pattern, classOf[Pattern].getName)
    val repRef = ctx.addReferenceObj("rep", quotedRep, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (s, _, _) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $patRef.matcher($s.toString()).replaceFirst($repRef));""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(subject = newFirst, regexp = newSecond, rep = newThird)
}

object RegexpReplaceFirst {
  import org.apache.spark.sql.catalyst.expressions.Literal

  /** Column-level entry point: replace first match of `pattern` with `rep`.
    * Pattern/replacement become catalyst Literals directly (a
    * `functions.lit` Column round-trips through the Connect column-node
    * model and is not guaranteed to surface as a foldable Expression).
    */
  def apply(subject: Column, pattern: String, rep: String): Column =
    ColumnBridge.column(RegexpReplaceFirst(
      ColumnBridge.expression(subject),
      Literal.create(pattern, StringType),
      Literal.create(rep, StringType)))
}
