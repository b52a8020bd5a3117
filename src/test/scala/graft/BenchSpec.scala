package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench timing machinery must be loud about failures: a query that
  * throws records value -1 plus its message, never a fast "timing".
  */
class BenchSpec extends AnyFunSuite {

  test("measure: one untimed warm-up run + median of timed reps") {
    var n = 0
    val (v, err) = Bench.measure(3)(() => { n += 1 })
    assert(n == 4, "3 timed reps preceded by one warm-up run")
    assert(v >= 0.0 && err.isEmpty)
  }

  test("measure: a failing rep yields -1 and the error, not a timing") {
    val (v, err) = Bench.measure(3)(() =>
      throw new IllegalStateException("deliberately broken query\nsecond line"))
    assert(v == -1.0)
    assert(err.exists(_.startsWith("IllegalStateException: deliberately broken query")))
    assert(err.forall(!_.contains("\n")), "message must be single-line for JSON")
  }

  test("measure stops at the first failure instead of re-running a broken query") {
    var n = 0
    val (v, err) = Bench.measure(3)(() => { n += 1; throw new RuntimeException("boom") })
    assert(n == 1, "a known-broken query must not be re-run")
    assert(v == -1.0 && err.isDefined)
  }

  test("escJson escapes quotes, backslashes and control chars") {
    assert(Bench.escJson("a\"b\\c\n") == "a\\\"b\\\\c\\u000a")
  }
}
