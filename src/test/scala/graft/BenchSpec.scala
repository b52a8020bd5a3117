package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench timing machinery must be loud about failures: a query that
  * throws records value -1 plus its message, never a fast "timing".
  */
class BenchSpec extends AnyFunSuite {

  test("measure: median of successful reps") {
    var n = 0
    val (v, err) = Bench.measure(3)(() => { n += 1 })
    assert(n == 3)
    assert(v >= 0.0 && err.isEmpty)
  }

  test("measure: a failing rep yields -1 and the error, not a timing") {
    val (v, err) = Bench.measure(3)(() =>
      throw new IllegalStateException("deliberately broken query\nsecond line"))
    assert(v == -1.0)
    assert(err.exists(_.startsWith("IllegalStateException: deliberately broken query")))
    assert(err.forall(!_.contains("\n")), "message must be single-line for JSON")
  }

  test("escJson escapes quotes, backslashes and control chars") {
    assert(Bench.escJson("a\"b\\c\n") == "a\\\"b\\\\c\\u000a")
  }
}
