package graft.parse

import java.util.regex.Pattern

import graft.RuleConfigError
import graft.expressions.{CompiledGrok, GrokExtractExpr}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Grok-pattern parse stage (north rule: "grok/regex parse"). The reference
  * pipeline's events arrive pre-parsed by Fluentd input plugins — its
  * canonical config tails an apache access log through `format apache2`
  * (/root/reference/example.conf:8-18) and then routes on the parsed fields
  * (`message`, `status`, `agent`). This module supplies that parse stage
  * Spark-natively: a `%{NAME:field}` grok expression compiles once on the
  * driver to a single Java/RE2-compatible regex, evaluated one-pass-per-row
  * by [[GrokExtractExpr]].
  *
  * Pattern definitions follow the public logstash grok dictionary
  * (grok syntax `%{SYNTAX:SEMANTIC}`); only RE2-safe constructs are used
  * (no lookaround, no backreferences) so the same expanded regex runs
  * unchanged in the DuckDB oracle.
  */
object Grok {

  /** RE2-safe subset of the standard grok dictionary. */
  val patterns: Map[String, String] = Map(
    "INT" -> "(?:[+-]?(?:[0-9]+))",
    "BASE10NUM" -> "(?:[+-]?(?:[0-9]+(?:\\.[0-9]+)?)|\\.[0-9]+)",
    "NUMBER" -> "(?:%{BASE10NUM})",
    "WORD" -> "\\b\\w+\\b",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s*",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "QUOTEDSTRING" -> "\"[^\"]*\"",
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "USER" -> "%{USERNAME}",
    "IPV4" -> "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}",
    "IP" -> "%{IPV4}",
    "HOSTNAME" -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b",
    "IPORHOST" -> "(?:%{IP}|%{HOSTNAME})",
    "MONTH" -> "\\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\\b",
    "MONTHDAY" -> "(?:3[01]|[1-2][0-9]|0?[1-9])",
    "YEAR" -> "(?:\\d\\d){1,2}",
    "HOUR" -> "(?:2[0123]|[01]?[0-9])",
    "MINUTE" -> "(?:[0-5][0-9])",
    "SECOND" -> "(?:[0-5][0-9])",
    "TIME" -> "%{HOUR}:%{MINUTE}:%{SECOND}",
    "HTTPDATE" -> "%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "TIMESTAMP_ISO8601" ->
      "%{YEAR}-(?:0[1-9]|1[0-2])-%{MONTHDAY}[T ]%{HOUR}:%{MINUTE}(?::%{SECOND})?(?:Z|[+-]%{HOUR}:?%{MINUTE})?",
    "LOGLEVEL" ->
      "(?:[Tt]race|TRACE|[Dd]ebug|DEBUG|[Ii]nfo|INFO|[Nn]otice|NOTICE|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL)",
    "QS" -> "%{QUOTEDSTRING}", // logstash QS: captured value INCLUDES quotes
    "POSINT" -> "\\b(?:[1-9][0-9]*)\\b",
    "NONNEGINT" -> "\\b(?:[0-9]+)\\b",
    // NOT logstash's `[A-Za-z]([A-Za-z0-9+\-.]+)+`: that nested quantifier
    // is a known exponential-backtracking (ReDoS) shape on non-matching
    // input; the star form matches the same language in linear time
    "URIPROTO" -> "[A-Za-z][A-Za-z0-9+\\-.]*",
    "URIHOST" -> "%{IPORHOST}(?::%{POSINT})?",
    "URIPATH" -> "(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\\-]*)+",
    "URIPARAM" -> "\\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\\-\\[\\]<>]*",
    "URIPATHPARAM" -> "%{URIPATH}(?:%{URIPARAM})?",
    // syslog preamble (RE2-safe subset: no facility brackets form)
    "SYSLOGTIMESTAMP" -> "%{MONTH} +%{MONTHDAY} %{TIME}",
    "SYSLOGHOST" -> "%{IPORHOST}",
    "PROG" -> "[\\w._/%-]+",
    "SYSLOGPROG" -> "%{PROG:program}(?:\\[%{POSINT:pid}\\])?",
    "SYSLOGBASE" ->
      "%{SYSLOGTIMESTAMP:timestamp} %{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    // the apache2 access-log format the reference's example config parses
    "COMMONAPACHELOG" ->
      ("%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \\[%{HTTPDATE:timestamp}\\] " +
        "\"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" " +
        "%{NUMBER:response} (?:%{NUMBER:bytes}|-)"),
    // combined format = common + quoted referrer/agent — what the reference
    // README's canonical `agent`-routing examples parse
    // (/root/reference/README.md:97-107 route on an `agent` field)
    "COMBINEDAPACHELOG" ->
      "%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}")

  private val grokRef = Pattern.compile("""%\{(\w+)(?::(\w+))?\}""")

  /** Expand a grok expression to (regex, fields, 1-based group index per
    * field). Named refs `%{NAME:field}` become capturing groups; bare refs
    * `%{NAME}` and all groups inside dictionary patterns are rewritten
    * non-capturing, so each field's group index is stable.
    */
  def compile(expr: String, maxDepth: Int = 16): CompiledGrok = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val groups = scala.collection.mutable.ArrayBuffer.empty[Int]
    var groupCount = 0

    def expand(s: String, depth: Int): String = {
      if (depth > maxDepth)
        throw new RuleConfigError(s"grok recursion deeper than $maxDepth: $expr")
      val m = grokRef.matcher(s)
      val sb = new StringBuilder
      var pos = 0
      while (m.find()) {
        sb.append(neutralize(s.substring(pos, m.start())))
        val name = m.group(1)
        val field = m.group(2)
        val body = patterns.getOrElse(name,
          throw new RuleConfigError(s"unknown grok pattern %{$name} in: $expr"))
        if (field != null) {
          // named refs capture at ANY depth (composite dictionary patterns
          // like COMMONAPACHELOG carry their own %{NAME:field} refs)
          groupCount += 1
          fields += field
          groups += groupCount
          sb.append("(").append(expand(body, depth + 1)).append(")")
        } else {
          sb.append("(?:").append(expand(body, depth + 1)).append(")")
        }
        pos = m.end()
      }
      sb.append(neutralize(s.substring(pos)))
      sb.toString
    }

    // rewrite every bare capturing '(' to '(?:' — %{NAME:field} refs are the
    // ONLY capturing groups, so each field's group index is stable no matter
    // how many parens the dictionary bodies or the user expression contain.
    // Named groups '(?<x>' / '(?P<x>' start with '(?' but STILL capture and
    // would silently shift every field's group index — reject them outright.
    // Character classes nest in Java ("[a[b]]" is a union), so track depth,
    // not a boolean.
    def neutralize(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      var classDepth = 0 // '(' inside [...] is a literal, not a group
      // 1 = just after '[', 2 = just after '[^', 0 = elsewhere; a ']' in
      // state 1/2 is a LITERAL class member in Java ("[]]" matches ']')
      var atStart = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          atStart = 0
          sb.append(c).append(s.charAt(i + 1)); i += 2
        }
        else if (c == '[') { classDepth += 1; atStart = 1; sb.append(c); i += 1 }
        else if (c == '^' && atStart == 1) { atStart = 2; sb.append(c); i += 1 }
        else if (c == ']' && classDepth > 0 && atStart == 0) {
          classDepth -= 1; sb.append(c); i += 1
        }
        else if (c == ']' && atStart != 0) { atStart = 0; sb.append(c); i += 1 } // literal ]
        else if (c == '(' && classDepth == 0) {
          atStart = 0
          if (i + 1 >= s.length || s.charAt(i + 1) != '?') { sb.append("(?:"); i += 1 }
          else {
            val rest = s.substring(i)
            if ((rest.startsWith("(?<") && !rest.startsWith("(?<=") &&
                !rest.startsWith("(?<!")) || rest.startsWith("(?P<"))
              throw new RuleConfigError(
                s"named capturing group in grok pattern (use %{NAME:field} instead): $s")
            sb.append(c); i += 1
          }
        }
        else { atStart = 0; sb.append(c); i += 1 }
      }
      sb.toString
    }

    val regex = expand(expr, 0)
    try Pattern.compile(regex)
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        throw new RuleConfigError(
          s"grok expression expands to an invalid regex: ${e.getMessage}")
    }
    if (fields.isEmpty)
      throw new RuleConfigError(s"grok expression captures no fields: $expr")
    val dup = fields.diff(fields.distinct)
    if (dup.nonEmpty)
      throw new RuleConfigError(s"duplicate grok field names: ${dup.mkString(",")}")
    CompiledGrok(regex, fields.toArray, groups.toArray)
  }

  /** One-pass extraction column: `struct<field1, ..., fieldN>`, null when
    * the line does not match.
    */
  def extract(line: Column, expr: String): Column =
    extract(line, compile(expr))

  def extract(line: Column, g: CompiledGrok): Column =
    ColumnBridge.column(GrokExtractExpr(ColumnBridge.expression(line), g))

  /** Parse stage: add every grok field of `expr` as a string column. Rows
    * that do not match keep null fields (filter on them to drop).
    */
  def parse(df: DataFrame, inputCol: String, expr: String): DataFrame = {
    val g = compile(expr)
    val parsed = df.withColumn("__grok", extract(col(inputCol), g))
    g.fields.foldLeft(parsed)((d, f) => d.withColumn(f, col(s"__grok.$f")))
      .drop("__grok")
  }
}
