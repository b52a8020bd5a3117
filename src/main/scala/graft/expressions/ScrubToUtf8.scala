package graft.expressions

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
  *
  * Replacement granularity: one `?` per MAXIMAL SUBPART of an ill-formed
  * sequence (Unicode best practice, which Ruby's scrub implements): a
  * truncated-but-valid prefix (`E0 A0` at end) is ONE `?`; a lead byte whose
  * successor is out of range restarts at the successor (`E0 80 80`,
  * surrogates `ED A0 80`, overlongs `C0 AF` → one `?` per rejected byte).
  * Hand-rolled rather than JDK CharsetDecoder REPLACE, which reports CESU
  * surrogate triples as one malformed unit (`ED A0 80` → one `?`) and would
  * diverge from the reference on such inputs. Valid input passes through
  * with no transcoding and no allocation (output bytes ARE input bytes).
  * RoutingGoldenSpec pins the vectors explicitly.
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

  /** Public so generated code can call it. One pass; RFC 3629 lead/successor
    * ranges (E0→A0..BF, ED→80..9F, F0→90..BF, F4→80..8F, else 80..BF).
    */
  def scrub(bytes: Array[Byte]): UTF8String = {
    val n = bytes.length
    var out: java.io.ByteArrayOutputStream = null // lazily allocated
    var copied = 0 // input prefix already flushed to `out`
    var i = 0

    // replace input range [from, to) with one '?'; resume scanning at `to`
    def bad(from: Int, to: Int): Unit = {
      if (out == null) out = new java.io.ByteArrayOutputStream(n + 8)
      out.write(bytes, copied, from - copied)
      out.write('?')
      copied = to
    }

    while (i < n) {
      val b = bytes(i) & 0xff
      val len =
        if (b < 0x80) 1
        else if (b >= 0xc2 && b <= 0xdf) 2
        else if (b >= 0xe0 && b <= 0xef) 3
        else if (b >= 0xf0 && b <= 0xf4) 4
        else 0 // 80..C1 (bare continuation / overlong lead) and F5..FF
      if (len == 0) { bad(i, i + 1); i += 1 }
      else if (len == 1) i += 1
      else {
        var j = i + 1
        var ok = true
        while (ok && j < i + len && j < n) {
          val c = bytes(j) & 0xff
          val valid =
            if (j == i + 1) b match {
              case 0xe0 => c >= 0xa0 && c <= 0xbf
              case 0xed => c >= 0x80 && c <= 0x9f
              case 0xf0 => c >= 0x90 && c <= 0xbf
              case 0xf4 => c >= 0x80 && c <= 0x8f
              case _    => c >= 0x80 && c <= 0xbf
            }
            else c >= 0x80 && c <= 0xbf
          if (valid) j += 1 else ok = false
        }
        if (ok && j == i + len) i = j // complete valid sequence
        else { bad(i, j); i = j } // maximal subpart [i, j) → one '?'
      }
    }

    if (out == null) UTF8String.fromBytes(bytes) // valid input: zero-copy
    else {
      out.write(bytes, copied, n - copied)
      UTF8String.fromBytes(out.toByteArray)
    }
  }

  def apply(c: Column): Column =
    ColumnBridge.column(ScrubToUtf8(ColumnBridge.expression(c)))
}
