package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parser + resolver for rule `key` field paths, the analog of Fluentd's
  * `record_accessor` (out_rewrite_tag_filter.rb:48,119; nested-key tests
  * test_out_rewrite_tag_filter.rb:293-325). Supported syntaxes:
  *
  *   - `domain`                 → top-level field
  *   - `$.email.domain`         → dot notation
  *   - `$['email']['domain']`   → bracket notation (single or double quotes)
  *
  * Resolution against a fixed schema replaces the reference's fully dynamic
  * lookup; missing paths read as empty string (`nil.to_s`, :119) via
  * `coalesce(cast(col as string), '')` so rule semantics (R-EMPTY) match.
  */
object KeyPath {

  sealed trait Step
  final case class Field(name: String) extends Step
  final case class Index(i: Int) extends Step

  private val bracket = """\[(?:'([^']*)'|"([^"]*)"|(\d+))\]""".r

  def parse(key: String): List[Step] = {
    if (key.startsWith("$.")) {
      key.drop(2).split("\\.", -1).toList.map(Field(_))
    } else if (key.startsWith("$[")) {
      val steps = bracket.findAllMatchIn(key.drop(1)).map { m =>
        if (m.group(3) != null) Index(m.group(3).toInt): Step
        else Field(Option(m.group(1)).getOrElse(m.group(2))): Step
      }.toList
      if (steps.isEmpty)
        throw new RuleConfigError(s"unparseable key path: $key")
      steps
    } else List(Field(key))
  }

  /** Resolve a path to a string-typed Column, ANSI-safe (no out-of-bounds /
    * missing-key errors; nulls instead), with missing-field → "" semantics.
    * A path that cannot exist under `schema` resolves to the constant ""
    * (the reference's behavior for absent fields), so normal rules skip and
    * inverted rules still evaluate.
    *
    * A BinaryType leaf resolves through [[graft.expressions.ScrubToUtf8]]
    * (R-SCRUB, out_rewrite_tag_filter.rb:139-145): rules MATCH against the
    * scrubbed value (each invalid UTF-8 subpart → `?`) while the routed row
    * keeps its original bytes — a plain binary→string cast would hand the
    * regex engine malformed UTF8String bytes instead.
    */
  def resolve(key: String, schema: StructType): Column = {
    val steps = parse(key)

    def walk(dt: DataType, c: Column, rest: List[Step]): Option[(DataType, Column)] =
      rest match {
        case Nil => Some((dt, c))
        case Field(f) :: tl =>
          dt match {
            case st: StructType =>
              st.fields.find(_.name == f) match {
                case Some(sf) => walk(sf.dataType, c.getField(f), tl)
                case None     => None
              }
            case mt: MapType =>
              walk(mt.valueType, try_element_at(c, lit(f)), tl)
            case _ => None
          }
        case Index(i) :: tl =>
          dt match {
            // Fluentd array indices are 0-based; `get` is 0-based and
            // null-safe (vs element_at, which throws under ANSI).
            case at: ArrayType => walk(at.elementType, get(c, lit(i)), tl)
            case mt: MapType =>
              walk(mt.valueType, try_element_at(c, lit(i)), tl)
            case _ => None
          }
      }

    val head = steps.head match {
      case Field(f) => schema.fields.find(_.name == f).map(sf =>
        walk(sf.dataType, col(quoted(f)), steps.tail)).getOrElse(None)
      case Index(_) => None
    }
    head match {
      case Some((BinaryType, c)) =>
        coalesce(graft.expressions.ScrubToUtf8(c), lit(""))
      case Some((_, c)) => coalesce(c.cast(StringType), lit(""))
      case None         => lit("") // absent path ≡ Fluentd missing field
    }
  }

  private def quoted(f: String): String = s"`${f.replace("`", "``")}`"
}
