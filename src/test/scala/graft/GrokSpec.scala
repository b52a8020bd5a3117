package graft

import graft.parse.Grok
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grok parse stage: pattern expansion, group-index stability, one-pass
  * struct extraction, and the grok → route composition that reproduces the
  * reference's canonical apache-access pipeline
  * (/root/reference/example.conf:8-30: `format apache2` parse, then rules
  * keyed on the parsed fields).
  */
class GrokSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compile: named refs capture, dictionary parens are neutralized") {
    val g = Grok.compile("%{IP:ip} %{WORD:method} %{NUMBER:code}")
    assert(g.fields.toSeq == Seq("ip", "method", "code"))
    // IP/NUMBER bodies contain their own parens; indices must still be 1,2,3
    assert(g.groupIdx.toSeq == Seq(1, 2, 3))
    val m = java.util.regex.Pattern.compile(g.pattern)
      .matcher("10.1.2.3 GET 200")
    assert(m.find())
    assert(m.group(1) == "10.1.2.3" && m.group(2) == "GET" && m.group(3) == "200")
  }

  test("compile: errors — unknown pattern, no fields, duplicate fields") {
    intercept[RuleConfigError](Grok.compile("%{NOPE:x}"))
    intercept[RuleConfigError](Grok.compile("%{IP} plain"))
    intercept[RuleConfigError](Grok.compile("%{WORD:a} %{WORD:a}"))
  }

  test("literal paren inside a character class survives neutralization") {
    val g = Grok.compile("[(]%{WORD:w}[)]")
    val m = java.util.regex.Pattern.compile(g.pattern).matcher("(hello)")
    assert(m.find() && m.group(1) == "hello")
    // must NOT match the corrupted-class inputs '?foo)' / ':foo)'
    assert(!java.util.regex.Pattern.compile(g.pattern).matcher("?foo)").find())
    assert(!java.util.regex.Pattern.compile(g.pattern).matcher(":foo)").find())
  }

  test("named capturing groups are rejected; lookbehind-shaped starts aside") {
    // '(?<x>...)' and '(?P<x>...)' capture despite starting with '(?' — left
    // in place they would shift every %{NAME:field} group index silently
    intercept[RuleConfigError](Grok.compile("(?<stolen>x)%{WORD:w}"))
    intercept[RuleConfigError](Grok.compile("(?P<stolen>x)%{WORD:w}"))
  }

  test("nested character classes (Java union) keep parens literal") {
    // Java: [a[(]] is the union {a, (} — depth tracking must not exit the
    // class at the inner ']' and then mangle the literal '('
    val g = Grok.compile("[a[(]]%{WORD:w}")
    val p = java.util.regex.Pattern.compile(g.pattern)
    val m = p.matcher("(hello")
    assert(m.find() && m.group(1) == "hello")
    assert(g.groupIdx.toSeq == Seq(1))
  }

  test("leading ']' in a class is a literal member (Java []] / [^]] forms)") {
    // "[](]" is ONE Java class matching ']' or '(' — the '(' inside must
    // stay literal, and the class must not be considered closed at "[]"
    val g = Grok.compile("[](]%{WORD:w}")
    val p = java.util.regex.Pattern.compile(g.pattern)
    assert(p.matcher("(ok").find())
    assert(p.matcher("]ok").find())
    assert(!p.matcher("?ok").find(), "class leaked: '(' was rewritten to '(?:'")
    val neg = Grok.compile("[^]]%{WORD:w}")
    assert(java.util.regex.Pattern.compile(neg.pattern).matcher("?ok").find())
  }

  test("COMBINEDAPACHELOG: referrer and agent with logstash QS semantics") {
    val g = Grok.compile("%{COMBINEDAPACHELOG}")
    val line = "10.0.0.1 - alice [10/Oct/2000:13:55:36 -0700] " +
      "\"GET /index.html?q=1 HTTP/1.0\" 200 2326 " +
      "\"http://ref.example/start\" \"Mozilla/5.0 Googlebot-FooBar/2.1\""
    val out = Seq(line).toDF("l")
      .select(Grok.extract(col("l"), g).as("g")).select("g.*").collect()(0)
    assert(out.getAs[String]("clientip") == "10.0.0.1")
    assert(out.getAs[String]("request") == "/index.html?q=1")
    assert(out.getAs[String]("response") == "200")
    assert(out.getAs[String]("bytes") == "2326")
    // QS captures WITH quotes (logstash semantics)
    assert(out.getAs[String]("referrer") == "\"http://ref.example/start\"")
    assert(out.getAs[String]("agent") == "\"Mozilla/5.0 Googlebot-FooBar/2.1\"")
  }

  test("URIPATHPARAM and SYSLOGBASE expand and match") {
    val g = Grok.compile("%{URIPATHPARAM:uri}")
    val m = java.util.regex.Pattern.compile(g.pattern)
      .matcher("/foo/bar.php?id=1&x=%20y")
    assert(m.find() && m.group(1) == "/foo/bar.php?id=1&x=%20y")
    val s = Grok.compile("%{SYSLOGBASE} %{GREEDYDATA:msg}")
    assert(s.fields.toSeq == Seq("timestamp", "logsource", "program", "pid", "msg"))
    val sm = java.util.regex.Pattern.compile(s.pattern)
      .matcher("Oct 10 13:55:36 web01 sshd[4321]: Accepted publickey")
    assert(sm.find())
    assert(sm.group(s.groupIdx(s.fields.indexOf("program"))) == "sshd")
    assert(sm.group(s.groupIdx(s.fields.indexOf("pid"))) == "4321")
    assert(sm.group(s.groupIdx(s.fields.indexOf("msg"))) == "Accepted publickey")
  }

  test("extract: one-pass struct; non-matching line → null struct") {
    val df = Seq(
      "10.0.0.1 alice 200",
      "not a log line !!!").toDF("line")
    val out = df.select(
      Grok.extract(col("line"), "%{IP:ip} %{USER:user} %{INT:status}").as("g"))
      .select(col("g.ip"), col("g.user"), col("g.status"))
      .collect()
    assert(out(0).getString(0) == "10.0.0.1")
    assert(out(0).getString(1) == "alice")
    assert(out(0).getString(2) == "200")
    assert(out(1).isNullAt(0) && out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("COMMONAPACHELOG: full apache2 access line, alternation groups") {
    val line = """192.168.0.5 - frank [10/Oct/2000:13:55:36 -0700] """ +
      """"GET /apache_pb.gif HTTP/1.0" 200 2326"""
    val df = Seq(line).toDF("message")
    val row = Grok.parse(df, "message", "%{COMMONAPACHELOG}").collect()(0)
    assert(row.getAs[String]("clientip") == "192.168.0.5")
    assert(row.getAs[String]("auth") == "frank")
    assert(row.getAs[String]("timestamp") == "10/Oct/2000:13:55:36 -0700")
    assert(row.getAs[String]("verb") == "GET")
    assert(row.getAs[String]("request") == "/apache_pb.gif")
    assert(row.getAs[String]("httpversion") == "1.0")
    assert(row.getAs[String]("response") == "200")
    assert(row.getAs[String]("bytes") == "2326")
    assert(row.getAs[String]("rawrequest") == null) // other alternative
  }

  test("grok parse → rule route: the reference's apache status pipeline") {
    // example.conf:20-30 shape: parse access log, route 5xx to an alert tag
    val lines = Seq(
      ("""10.0.0.1 - - [10/Oct/2000:13:55:36 -0700] "GET /a HTTP/1.0" 200 10""", "web.access"),
      ("""10.0.0.2 - - [10/Oct/2000:13:55:37 -0700] "GET /b HTTP/1.0" 503 20""", "web.access"),
      ("""10.0.0.3 - - [10/Oct/2000:13:55:38 -0700] "POST /c HTTP/1.0" 404 30""", "web.access"))
      .toDF("message", "source")
    val parsed = Grok.parse(lines, "message", "%{COMMONAPACHELOG}")
    val routed = Router.route(parsed, Seq(
      Rule("response", "^5\\d\\d$", "alert.${tag_parts[0]}.5xx"),
      Rule("response", "^[45]", "warn.$0x", invert = false),
      Rule("response", "^$", "ok.${tag}", invert = true)))
    val got = routed.select("clientip", "new_tag").as[(String, String)].collect().toSet
    assert(got == Set(
      ("10.0.0.1", "ok.web.access"),
      ("10.0.0.2", "alert.web.5xx"),
      ("10.0.0.3", "warn.x"))) // $0 is not a backref → "" (gsub-table miss)
  }
}
