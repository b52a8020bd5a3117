package graft

import graft.expressions.{HammingDist, Md5MinHashSig, ScrubToUtf8}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (seeded, deterministic) invariants for the hand-rolled
  * byte/hash primitives — the fixed vectors pin known edges; these sweep a
  * broad slice of the input space every CI run.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randomByteArrays(n: Int, seed: Long): Seq[Array[Byte]] = {
    val rnd = new java.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(65)
      val a = new Array[Byte](len)
      rnd.nextBytes(a)
      a
    }
  }

  // byte soup biased toward UTF-8 structure (lead/continuation bytes) so the
  // multi-byte state machine is exercised, not just "everything invalid"
  private def utf8ishArrays(n: Int, seed: Long): Seq[Array[Byte]] = {
    val rnd = new java.util.Random(seed)
    val interesting = Array(0x7f, 0x80, 0xa0, 0xbf, 0xc0, 0xc2, 0xdf, 0xe0,
      0xe1, 0xed, 0xef, 0xf0, 0xf4, 0xf5, 0xff, 'a', ' ')
    (0 until n).map { _ =>
      val len = rnd.nextInt(24)
      Array.fill(len)(interesting(rnd.nextInt(interesting.length)).toByte)
    }
  }

  test("scrub: output is always VALID UTF-8, for any byte sequence") {
    val strict = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    (randomByteArrays(500, 1L) ++ utf8ishArrays(2000, 2L)).foreach { bytes =>
      val out = ScrubToUtf8.scrub(bytes).getBytes
      strict.reset()
      strict.decode(java.nio.ByteBuffer.wrap(out)) // throws on invalid
    }
  }

  test("scrub: idempotent; no-op on valid input") {
    (randomByteArrays(500, 3L) ++ utf8ishArrays(2000, 4L)).foreach { bytes =>
      val once = ScrubToUtf8.scrub(bytes)
      assert(ScrubToUtf8.scrub(once.getBytes) == once)
    }
    val rnd = new java.util.Random(5L)
    (0 until 300).foreach { _ =>
      // valid-by-construction unicode strings round-trip untouched
      val s = (0 until rnd.nextInt(20)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => "a"; case 1 => "é"; case 2 => "你"; case 3 => "𐍈"
        }
      }.mkString
      assert(ScrubToUtf8.scrub(s.getBytes("UTF-8")).toString == s)
    }
  }

  test("scrub ≡ independent maximal-subpart reference scan") {
    // reference implementation of the Unicode maximal-subpart rule,
    // structured differently from the production scanner
    def refScrub(b: Array[Byte]): String = {
      val sb = new StringBuilder
      var i = 0
      def cont(j: Int, lo: Int, hi: Int): Boolean =
        j < b.length && (b(j) & 0xff) >= lo && (b(j) & 0xff) <= hi
      while (i < b.length) {
        val c = b(i) & 0xff
        if (c < 0x80) { sb.append(c.toChar); i += 1 }
        else {
          val (len, lo2, hi2) =
            if (c >= 0xc2 && c <= 0xdf) (2, 0x80, 0xbf)
            else if (c == 0xe0) (3, 0xa0, 0xbf)
            else if (c >= 0xe1 && c <= 0xec) (3, 0x80, 0xbf)
            else if (c == 0xed) (3, 0x80, 0x9f)
            else if (c >= 0xee && c <= 0xef) (3, 0x80, 0xbf)
            else if (c == 0xf0) (4, 0x90, 0xbf)
            else if (c >= 0xf1 && c <= 0xf3) (4, 0x80, 0xbf)
            else if (c == 0xf4) (4, 0x80, 0x8f)
            else (0, 0, 0)
          if (len == 0) { sb.append('?'); i += 1 }
          else {
            var j = i + 1
            if (cont(j, lo2, hi2)) {
              j += 1
              while (j < i + len && cont(j, 0x80, 0xbf)) j += 1
            }
            if (j == i + len) sb.append(new String(b.slice(i, j), "UTF-8"))
            else sb.append('?')
            i = j
          }
        }
      }
      sb.toString
    }
    (randomByteArrays(500, 6L) ++ utf8ishArrays(4000, 7L)).foreach { bytes =>
      assert(ScrubToUtf8.scrub(bytes).toString == refScrub(bytes),
        bytes.map(b => "%02x".format(b)).mkString(","))
    }
  }

  test("Md5MinHashSig ≡ lambda form on random word sets (batched)") {
    import spark.implicits._
    val rnd = new java.util.Random(8L)
    val docs = (0 until 40).map { i =>
      (i, (0 until rnd.nextInt(30)).map(_ =>
        "w" + rnd.nextInt(400)).mkString(" "))
    }
    val df = docs.toDF("id", "text")
      .withColumn("sh", array_distinct(
        graft.textops.TextFunctions.shingles(col("text"), 2)))
    val n = 8
    val ref = transform(sequence(lit(0), lit(n - 1)),
      j => array_min(transform(col("sh"),
        s => md5(concat(j.cast("string"), lit(":"), s)))))
    val out = df.select(Md5MinHashSig(col("sh"), n).as("fast"), ref.as("ref"))
      .collect()
    out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("HammingDist ≡ built-in zipped compare on random strings (batched)") {
    import spark.implicits._
    val rnd = new java.util.Random(9L)
    val alphabet = "01x"
    val pairs = (0 until 60).map { _ =>
      def str(len: Int) =
        (0 until len).map(_ => alphabet(rnd.nextInt(3))).mkString
      (str(12), str(rnd.nextInt(13)))
    }
    val df = pairs.toDF("a", "b")
    val out = df.select(
      HammingDist(col("a"), col("b")).as("fast"),
      graft.dedup.Dedup.hammingBitsSql(col("a"), col("b")).as("ref")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
