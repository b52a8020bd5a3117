package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.{CharsetDecoder, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Ruby `String#scrub('?')` parity for binary ingest (R-SCRUB,
  * out_rewrite_tag_filter.rb:139-145; tests :255-291): decode bytes as
  * UTF-8, replacing each invalid sequence with `?`. The reference matches
  * rules against the SCRUBBED value while the emitted record keeps the
  * original bytes — so the pattern is
  * `route on scrubToUtf8(raw), carry raw through unchanged`.
  *
  * The flagship's parquet/Iceberg string columns are valid UTF-8 by
  * construction, which is why this sits off the hot path; it exists for
  * raw-bytes parse stages (e.g. tailing binary logs into a BinaryType
  * column).
  */
case class ScrubToUtf8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "scrub_to_utf8"

  override protected def nullSafeEval(input: Any): Any =
    ScrubToUtf8.scrub(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ScrubToUtf8.scrub($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScrubToUtf8 {

  private val decoders: ThreadLocal[CharsetDecoder] =
    ThreadLocal.withInitial { () =>
      StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPLACE)
        .onUnmappableCharacter(CodingErrorAction.REPLACE)
        .replaceWith("?")
    }

  /** Public so generated code can call it. */
  def scrub(bytes: Array[Byte]): UTF8String = {
    val dec = decoders.get()
    dec.reset()
    UTF8String.fromString(dec.decode(ByteBuffer.wrap(bytes)).toString)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(ScrubToUtf8(ColumnBridge.expression(c)))
}
