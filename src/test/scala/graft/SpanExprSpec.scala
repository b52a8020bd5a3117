package graft

import graft.dedup.Dedup
import graft.textops.{TextFunctions, Vocab}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass span/shingle expressions (r6 optimization: the lambda
  * formulations re-evaluate the full word split inside the lambda per
  * element — O(words²) interpreted) must be bit-identical to the SQL-lambda
  * formulations that define their semantics. Also pins the r6 driver-local
  * BPE fit against the distributed merge loop it replaced.
  */
class SpanExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def texts: Seq[(Long, String)] = (Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g h i j k l",
    "dup dup dup dup dup", // repeated shingles (distinct-path coverage)
    "one two one two one two one", // overlapping repeats
    "short",
    "two words",
    "",
    "   ",
    "\tleading tab whitespace words here",
    "trailing ws words here\t",
    "  spaced   out   tokens  ",
    "unicode: žluťoučký kůň úpěl ďábelské ódy žluťoučký kůň",
    (1 to 120).map(i => s"w${i % 7}").mkString(" "), // long, heavy dups
    null
  ): Seq[String]).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def df = texts.toDF("doc_id", "text")

  private def collectArr(c: org.apache.spark.sql.Column): Seq[(Long, Seq[String])] =
    df.select(col("doc_id"), c.as("a")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toSeq

  test("ShingleStrings(wholeIfShort=true) ≡ shinglesSql, n = 1..4") {
    for (n <- 1 to 4) {
      val got = collectArr(TextFunctions.shingles(col("text"), n))
      val want = collectArr(TextFunctions.shinglesSql(col("text"), n))
      assert(got == want, s"n=$n")
    }
  }

  test("ShingleStrings(distinct=true) ≡ array_distinct(shinglesSql)") {
    for (n <- Seq(2, 3)) {
      val got = collectArr(
        graft.expressions.ShingleStrings(col("text"), n,
          wholeIfShort = true, distinct = true))
      val want = collectArr(
        array_distinct(TextFunctions.shinglesSql(col("text"), n)))
      assert(got == want, s"n=$n")
    }
  }

  test("ShingleStrings(wholeIfShort=false) ≡ size-guarded bigram lambda") {
    val ws = TextFunctions.words(col("text"))
    val lambdaForm = when(size(ws) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", slice(ws, i, lit(2)))))
    val got = collectArr(graft.expressions.ShingleStrings(col("text"), 2,
      wholeIfShort = false, distinct = false))
    val want = collectArr(lambdaForm)
    // the lambda form yields null for null text; the guard variant is only
    // used behind a non-empty-text filter, but pin the difference explicitly
    assert(got.filter(_._2 != null) == want.filter(_._2 != null))
    assert(got.forall(_._2 != null) || want.exists(_._2 == null))
  }

  test("spanFps (Md5SpanFps) ≡ spanFpsSql, k = 2, 8") {
    for (k <- Seq(2, 8)) {
      val got = collectArr(Dedup.spanFps(col("text"), k))
      val want = collectArr(coalesce(Dedup.spanFpsSql(col("text"), k),
        array().cast("array<string>")))
      assert(got == want, s"k=$k")
    }
  }

  test("CountMatches ≡ size(regexp_extract_all(_, pat, 0)) on scoring patterns") {
    val pats = Seq(
      TextFunctions.bpeTokenPattern,
      "[^A-Za-z0-9\\s]", "[A-Z]", "\\b(the|a|an|of|and|or|is|to|in)\\b") ++
      TextFunctions.langMarkers.map(_._2)
    val rich = df.union(Seq((100L, "The, quick! BROWN fox? of the and a 42"),
      (101L, "ALL CAPS WITH the AND of markers der die das le la"))
      .toDF("doc_id", "text"))
    for (p <- pats; useLower <- Seq(false, true)) {
      val in = if (useLower) lower(col("text")) else col("text")
      val rows = rich.select(
        graft.expressions.CountMatches(in, p).as("fast"),
        size(regexp_extract_all(in, lit(p), lit(0))).as("ref")).collect()
      rows.foreach { r =>
        val fast = if (r.isNullAt(0)) null else r.getInt(0)
        val ref = if (r.isNullAt(1)) null else r.getInt(1)
        assert(fast == ref, s"pattern=$p lower=$useLower")
      }
    }
  }

  test("fused QualityScoreExpr / LangIdExpr ≡ SQL formulations") {
    val rich = df.union(Seq(
      (100L, "The, quick! BROWN fox? of the and a 42 to in is or"),
      (101L, "der die das und ist nicht mit der die"),
      (102L, "le la les et est pas avec le la"),
      (103L, "el los las es y no con el"),
      (104L, "汉字 mixed with the english text"),
      (105L, "the der le el"), // marker tie — first-listed must win
      (106L, "!!!! ???? ;;;; %%%%"), // punct-heavy
      (107L, (1 to 60).map(_ => "the").mkString(" ")) // stopword-saturated
    ).toDF("doc_id", "text"))
    val rows = rich.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("qf"),
      TextFunctions.qualityScoreSql(col("text")).as("qs"),
      TextFunctions.langId(col("text")).as("lf"),
      TextFunctions.langIdSql(col("text")).as("ls")).collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2), s"quality doc=${r.getLong(0)}: ${r.get(1)} vs ${r.get(2)}")
      assert(r.get(3) == r.get(4), s"lang doc=${r.getLong(0)}: ${r.get(3)} vs ${r.get(4)}")
    }
  }

  test("QuantizeInt8Expr ≡ lambda quantization on random float vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      val v: Seq[Float] =
        if (i == 0) Seq.fill(8)(0.0f) // all-zero vector
        else if (i == 1) Seq.empty[Float]
        else Seq.fill(16)((rnd.nextFloat() - 0.5f) * math.pow(10,
          rnd.nextInt(6) - 3).toFloat)
      (i.toLong, v)
    }
    val vdf = vecs.toDF("vec_id", "embedding")
    val fast = graft.ann.Ann.quantizeInt8(vdf, "embedding", "qv")
      .select("vec_id", "qv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ref = graft.ann.Ann.quantizeInt8Sql(vdf, "embedding", "qv")
      .select("vec_id", "qv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast == ref)
  }

  test("salientTerms heap aggregate ≡ window formulation") {
    import graft.textops.CorpusStats
    val rich = df.union(Seq(
      (200L, "tie tie tie alpha alpha beta beta gamma gamma"), // tf/df ties
      (201L, "alpha beta gamma delta epsilon zeta"), // all tf=1 — term order
      (202L, "zz zz yy yy xx xx ww ww")
    ).toDF("doc_id", "text"))
    for (k <- Seq(1, 3, 5)) {
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))
      val fast = CorpusStats.salientTerms(rich, k).collect().map(key).toSet
      val ref = CorpusStats.salientTermsWindow(rich, k).collect().map(key).toSet
      assert(fast == ref, s"k=$k")
    }
  }

  test("UnorderedPairs ≡ nested-lambda expansion (atomic and struct elements)") {
    val rnd = new scala.util.Random(11)
    val idArrays = (0 until 60).map { i =>
      val n = rnd.nextInt(8)
      (i.toLong, (0 until n).map(_ => rnd.nextInt(6).toLong))
    }
    val adf = idArrays.toDF("row_id", "ids")
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getLong(1))))).toSeq
    val fastA = norm(adf.select(col("row_id"),
      graft.expressions.UnorderedPairs(col("ids")).as("p")).collect())
    val refA = norm(adf.select(col("row_id"),
      flatten(transform(col("ids"), x =>
        transform(filter(col("ids"), y => y > x),
          y => struct(x.as("id_a"), y.as("id_b"))))).as("p")).collect())
    assert(fastA == refA) // pair set AND order

    val sdf = idArrays.map { case (i, ids) =>
      (i, ids.map(id => (id, s"sig$id-$i")))
    }.toDF("row_id", "ds")
      .select(col("row_id"), expr(
        "transform(ds, e -> struct(e._1 AS id, e._2 AS sig))").as("ds"))
    def norms(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getLong(1), p.getString(2), p.getString(3)))))
        .toSeq
    val fastS = norms(sdf.select(col("row_id"),
      graft.expressions.UnorderedPairs(col("ds")).as("p")).collect())
    val refS = norms(sdf.select(col("row_id"),
      flatten(transform(col("ds"), x =>
        transform(filter(col("ds"), y => y.getField("id") > x.getField("id")),
          y => struct(
            x.getField("id").as("id_a"), y.getField("id").as("id_b"),
            x.getField("sig").as("sig_a"), y.getField("sig").as("sig_b")))))
        .as("p")).collect())
    assert(fastS == refS)
  }

  test("driver-local BPE fit ≡ distributed merge loop (and ≤2 fit actions)") {
    val docs = Seq(
      (1L, "low lower lowest Low, LOW!"),
      (2L, "newer newest new low 42 low42x"),
      (3L, "aaaa aa aaa aaaa aaaa"),
      (4L, "mixed42digits and words aaa lower")).toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSet
    for (nMerges <- Seq(0, 3, 8)) {
      val driver = rows(Vocab.bpeFitEncode(docs, nMerges))
      val distributed = rows(Vocab.bpeFitEncode(docs, nMerges,
        driverFitMaxWords = 0L)) // force the distributed fallback
      assert(driver == distributed, s"nMerges=$nMerges")
    }
    // the fit phase (plan construction) must cost ≤ 2 Spark actions under
    // the threshold regardless of merge count — the whole point of the
    // driver-local fit (VERDICT r5 next-round #1)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Vocab.bpeFitEncode(docs, nMerges = 200) // plan only — no action on it
      Thread.sleep(500) // listener bus is async; jobs were submitted inline
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(counter.get() <= 2,
      s"driver-local BPE fit ran ${counter.get()} Spark jobs, expected <= 2")
  }
}
