package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit rolling hash over a string's UTF-8 bytes — the document
  * fingerprint primitive (content-addressed dedup / checkpoint lineage).
  * A custom codegen'd Catalyst expression: engine-version-stable (unlike
  * `hashCode`), dependency-free, and cross-checkable from any language
  * (FNV-1a is a published public-domain algorithm).
  */
case class FnvHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv_hash64"

  override protected def nullSafeEval(input: Any): Any =
    FnvHash64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.FnvHash64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FnvHash64 {
  private final val OffsetBasis = 0xcbf29ce484222325L
  private final val Prime = 0x100000001b3L

  /** Public so generated code can call it. */
  def hash(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  def apply(c: Column): Column =
    ColumnBridge.column(FnvHash64(ColumnBridge.expression(c)))
}
