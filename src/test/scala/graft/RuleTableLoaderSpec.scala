package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C-PARSE surface: rule tables loaded from Fluentd-shape conf text, JSON,
  * and DataFrames, with the reference's ConfigError behavior
  * (test_out_rewrite_tag_filter.rb:13-58 parse tests, :169-186 hostname).
  */
class RuleTableLoaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val conf =
    """# comment line
      |capitalize_regex_backreference true
      |remove_tag_prefix input
      |<rule>
      |  key     domain
      |  pattern /^www\.(.+)\.com$/
      |  tag     site.$1
      |</rule>
      |# a full-line comment between sections
      |<rule>
      |  key     status
      |  pattern ^5\d\d$
      |  tag     alert.${tag}
      |  label   @ALERT
      |  invert  true
      |</rule>""".stripMargin

  test("conf text: params, /re/ and bare patterns, label, invert, comments") {
    val (rules, cfg) = RuleTableLoader.fromConf(conf)
    assert(cfg.capitalizeRegexBackreference)
    assert(cfg.removeTagPrefix.contains("input"))
    assert(rules == Seq(
      Rule("domain", "/^www\\.(.+)\\.com$/", "site.$1"),
      Rule("status", "^5\\d\\d$", "alert.${tag}", label = Some("ALERT"), invert = true)))
    assert(rules.head.normalizedPattern == "^www\\.(.+)\\.com$")
  }

  test("comments are full-line only: an inline '#' is part of the value") {
    val (rules, _) = RuleTableLoader.fromConf(
      """<rule>
        |  key     message
        |  pattern /^ERROR #\d+$/
        |  tag     errors.numbered
        |</rule>""".stripMargin)
    assert(rules.head.normalizedPattern == "^ERROR #\\d+$")
  }

  test("JSON: same surface, order preserved, null label") {
    val (rules, cfg) = RuleTableLoader.fromJson(
      """{"remove_tag_regexp": "^app\\.",
        |  "hostname": "json-host",
        |  "rules": [
        |    {"key": "a", "pattern": "x", "tag": "t1"},
        |    {"key": "b", "pattern": "y", "tag": "t2", "label": "L", "invert": true},
        |    {"key": "c", "pattern": "z", "tag": "t3", "label": null}
        |  ]}""".stripMargin)
    assert(cfg.removeTagRegexp.contains("^app\\."))
    assert(cfg.hostname == "json-host")
    assert(rules.map(_.key) == Seq("a", "b", "c"))
    assert(rules(1) == Rule("b", "y", "t2", label = Some("L"), invert = true))
    assert(rules(2).label.isEmpty)
  }

  test("DataFrame: explicit rule_order drives rule order") {
    import spark.implicits._
    val df = Seq(
      (2, "k2", "p2", "t2", Some("L2"), Some("true")),
      (1, "k1", "p1", "t1", None, None),
      (3, "k3", "p3", "t3", None, Some("false")))
      .toDF("rule_order", "key", "pattern", "tag", "label", "invert")
    val rules = RuleTableLoader.fromDataFrame(df)
    assert(rules.map(_.key) == Seq("k1", "k2", "k3"))
    assert(rules(1) == Rule("k2", "p2", "t2", label = Some("L2"), invert = true))
    val noOrder = df.drop("rule_order")
    assertThrows[RuleConfigError](RuleTableLoader.fromDataFrame(noOrder))
    // duplicate order = nondeterministic first-match winner → rejected
    val dup = Seq(
      (1, "k1", "p1", "tA"), (1, "k1", "p1x", "tB"))
      .toDF("rule_order", "key", "pattern", "tag")
    assertThrows[RuleConfigError](RuleTableLoader.fromDataFrame(dup))
  }

  test("legacy rewriterule<n> syntax is rejected with the reference's error") {
    val e = intercept[RuleConfigError](RuleTableLoader.fromConf(
      "rewriterule1 domain ^www\\..+$ site.rewritten"))
    assert(e.getMessage.contains("has been dropped"))
  }

  test("config errors: unknown params, missing fields, unterminated rule") {
    assertThrows[RuleConfigError](RuleTableLoader.fromConf("not_a_param x"))
    assertThrows[RuleConfigError](RuleTableLoader.fromConf(
      "<rule>\n  key k\n  pattern p\n</rule>")) // missing tag
    assertThrows[RuleConfigError](RuleTableLoader.fromConf(
      "<rule>\n  key k\n  pattern p\n  tag t\n  frobnicate 1\n</rule>"))
    assertThrows[RuleConfigError](RuleTableLoader.fromConf("<rule>\n key k"))
    assertThrows[RuleConfigError](RuleTableLoader.fromConf(
      "emit_mode sideways\n<rule>\n key k\n pattern p\n tag t\n</rule>"))
    assertThrows[RuleConfigError](RuleTableLoader.fromJson("""{"rules": {}}"""))
    assertThrows[RuleConfigError](RuleTableLoader.fromJson("""{}"""))
  }

  test("hostname_command runs once on the driver with chomp semantics") {
    // mirrors the reference's hostname test shape (:169-186): the command's
    // output (sans trailing newline) becomes the ${hostname} literal
    val (_, cfg) = RuleTableLoader.fromConf(
      """hostname_command printf 'short-host\n'
        |<rule>
        |  key k
        |  pattern p
        |  tag t
        |</rule>""".stripMargin)
    assert(cfg.hostname == "short-host")
    assertThrows[RuleConfigError](
      RuleTableLoader.hostnameFromCommand("exit 3"))
    // explicit hostname wins over hostname_command
    val (_, cfg2) = RuleTableLoader.fromConf(
      "hostname literal-host\nhostname_command echo other\n" +
        "<rule>\n key k\n pattern p\n tag t\n</rule>")
    assert(cfg2.hostname == "literal-host")
  }

  test("hostname_command: hung command times out with a clear error") {
    val err = intercept[RuleConfigError](
      RuleTableLoader.hostnameFromCommand("sleep 60", timeoutSec = 1L))
    assert(err.getMessage.contains("timed out"))
    // a command that ignores its stdout pipe must not hang the reader either
    val err2 = intercept[RuleConfigError](
      RuleTableLoader.hostnameFromCommand("exec sleep 60", timeoutSec = 1L))
    assert(err2.getMessage.contains("timed out"))
    // A backgrounded grandchild holding the pipe after the shell exits is
    // a PLATFORM RACE: the JVM process reaper normally severs the pipe at
    // shell exit (the reader then hits EOF and the shell's own output comes
    // back whole), but if the reader is still blocked the guard must error
    // rather than return a truncated value. Both outcomes are sound; what
    // must never happen is a silent PREFIX of the shell's output.
    try {
      val out = RuleTableLoader.hostnameFromCommand(
        "echo partial-host; (sleep 60; echo more) &", timeoutSec = 5L)
      assert(out == "partial-host") // reaper severed the pipe: complete output
    } catch {
      case e: RuleConfigError =>
        assert(e.getMessage.contains("stdout stayed open"))
    }
  }

  test("hostname_command in JSON rule tables requires an explicit opt-in") {
    // a rule table loaded from data-plane storage must not execute shell
    // commands at parse time (the reference only shells out for operator
    // conf files — backticks at configure)
    val json =
      """{"hostname_command": "echo pwned",
        | "rules": [{"key": "k", "pattern": "p", "tag": "t"}]}""".stripMargin
    val err = intercept[RuleConfigError](RuleTableLoader.fromJson(json))
    assert(err.getMessage.contains("hostname_command"))
    val (_, cfg) = RuleTableLoader.fromJson(json, allowHostnameCommand = true)
    assert(cfg.hostname == "pwned")
    // plain hostname literals in JSON stay allowed
    val (_, cfg2) = RuleTableLoader.fromJson(
      """{"hostname": "h1", "rules": [{"key": "k", "pattern": "p", "tag": "t"}]}""")
    assert(cfg2.hostname == "h1")
  }

  test("conf-loaded table routes identically to the literal table") {
    import spark.implicits._
    val df = Seq(
      ("r1", "www.google.com", "200"),
      ("r2", "www.example.com", "503"),
      ("r3", "not-a-site", "301"))
      .toDF("id", "domain", "status")
      .withColumn("tag0", lit("input.web"))
    val (rules, cfg) = RuleTableLoader.fromConf(conf)
    val viaLoader = Router.route(df, rules, cfg, "tag0")
      .select("id", "new_tag", "new_label").collect().map(_.toSeq).toSet
    val literal = Router.route(df,
      Seq(
        Rule("domain", "^www\\.(.+)\\.com$", "site.$1"),
        Rule("status", "^5\\d\\d$", "alert.${tag}", label = Some("ALERT"), invert = true)),
      RoutingConfig(capitalizeRegexBackreference = true,
        removeTagPrefix = Some("input"), hostname = cfg.hostname), "tag0")
      .select("id", "new_tag", "new_label").collect().map(_.toSeq).toSet
    assert(viaLoader == literal)
    // capitalize came through the loader: $1 backref is Ruby-capitalized
    assert(viaLoader.exists(_.contains("site.Google")))
  }
}
