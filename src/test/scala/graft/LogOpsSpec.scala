package graft

import graft.logops.LogOps
import graft.textops.{CorpusStats, Sampling}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden + differential semantics for the log-analytics and corpus-stats
  * operators (the DuckDB oracles pin them cross-engine; these pin them
  * at the unit level with hand-checkable inputs).
  */
class LogOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, Double)]): DataFrame =
    rows.toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s")).cast("timestamp_ntz"))
      .withColumn("event_type", lit("t"))
      .drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value")
      // ts_s arrives as a long column; rebuild the tuple type explicitly
      .withColumn("user_id", col("user_id").cast("long"))

  test("sessionize: gap breaks, per-user independence, exact aggregates") {
    // user 1: events at t=0, 10, 2000 (gap>1800 between 10 and 2000 splits)
    // user 2: single event
    val events = ev(Seq(
      (1L, 1L, 0L, 1.25), (2L, 1L, 10L, 2.50), (3L, 1L, 2000L, 4.00),
      (4L, 2L, 5L, 0.10)))
    val out = LogOps.sessionize(events, gapSeconds = 1800)
      .orderBy("user_id", "session_idx")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6))).toSeq ===
      Seq(
        (1L, 1L, 2L, 10000000L, 375L), // 2 events, 10 s span, 1.25+2.50 = 3.75
        (1L, 2L, 1L, 0L, 400L),
        (2L, 1L, 1L, 0L, 10L)))
    // start/end micros are exact epoch micros
    val s1 = out.head
    assert(s1.getLong(3) === 0L && s1.getLong(4) === 10000000L)
  }

  test("sessionize: boundary gap exactly == gapSeconds does NOT break") {
    val events = ev(Seq((1L, 1L, 0L, 0.0), (2L, 1L, 1800L, 0.0)))
    val out = LogOps.sessionize(events, gapSeconds = 1800).collect()
    assert(out.length === 1 && out.head.getLong(2) === 2L)
  }

  test("sessionize: microsecond-resolution gap comparison (no second truncation)") {
    // 1800.000001 s gap — breaks; a seconds-truncating implementation
    // would see exactly 1800 and keep one session
    val events = Seq((1L, 1L, 0.0, 0.0), (2L, 1L, 1800.000001, 0.0))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s")).cast("timestamp_ntz"))
      .withColumn("event_type", lit("t")).drop("ts_s")
    assert(LogOps.sessionize(events, gapSeconds = 1800).count() === 2L)
  }

  test("rateSpikes: trailing frame, cold-start gating, cross-multiplied flag") {
    // one entity, minutes 0..6 with counts 1,1,1,1,1,3,1 — minute 5 (count
    // 3) has a full 5-minute trailing sum of 5, 3*5*2 > 5*3 → spike;
    // minute 6 trail_sum=7, 1*5*2 < 21 → no spike; minutes 0..4 have
    // trail_n < 5 → gated off regardless of ratio
    val rows = (0 to 6).flatMap { m =>
      val c = if (m == 5) 3 else 1
      (0 until c).map(i => (m.toLong * 100 + i, 1L, m * 60L, 0.0))
    }
    val out = LogOps.rateSpikes(ev(rows), trailingN = 5, num = 3, den = 2)
      .orderBy("minute").collect()
    assert(out.length === 7)
    val spikes = out.map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(spikes.count(_._5 == 1L) === 1)
    val m5 = spikes(5)
    assert(m5._2 === 3L && m5._3 === 5L && m5._4 === 5L && m5._5 === 1L)
    assert(spikes.take(5).forall(_._5 == 0L), "cold-start minutes must be gated")
  }

  test("exactQuantiles: equals the sorted-pick definition on random data") {
    val rnd = new scala.util.Random(42)
    val data = (1 to 4).flatMap { k =>
      val n = 50 + k * 37
      (0 until n).map(_ => (s"k$k", (rnd.nextInt(400) - 100).toLong))
    }
    val df = data.toDF("key", "v")
    val out = LogOps.exactQuantiles(df, "key", "v",
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .collect().map(r => r.getString(0) -> r).toMap
    data.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      def pick(num: Int, den: Int) = sorted(((n - 1).toLong * num / den).toInt)
      val r = out(k)
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === pick(1, 2), s"$k p50")
      assert(r.getLong(3) === pick(9, 10), s"$k p90")
      assert(r.getLong(4) === pick(99, 100), s"$k p99")
    }
  }

  test("exactQuantiles: single-value and single-row groups") {
    val df = Seq(("a", 7L), ("a", 7L), ("b", 3L)).toDF("key", "v")
    val out = LogOps.exactQuantiles(df, "key", "v", Seq(("p50", 1, 2)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(("a", 2L, 7L), ("b", 1L, 3L)))
  }

  test("quotaSample: equals the window-rank reference, stable under repartition") {
    val docs = (1L to 200L).map(i => (i, s"g${i % 3}")).toDF("doc_id", "grp")
    val expected = docs
      .withColumn("h", md5(concat(lit("s:"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"), col("doc_id"))).cast("long"))
      .where(col("rk") <= 5)
      .select(col("grp"), col("rk"), col("doc_id").cast("string").as("sample_key"))
    val got = Sampling.quotaSample(docs.repartition(7), "grp", "doc_id", k = 5, salt = "s")
    assert(got.count() === 15)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("quotaSample: group smaller than k returns the whole group, ranked") {
    val docs = Seq((1L, "a"), (2L, "a")).toDF("doc_id", "grp")
    val out = Sampling.quotaSample(docs, "grp", "doc_id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.length === 2 && out.map(_._2).sorted.toSeq === Seq(1L, 2L))
  }

  test("repetitionSignals: hand-checked ratios, one-word and empty docs") {
    val docs = Seq(
      (1L, "a a a a"),        // n1=4 d1=1 top1=4; bigrams "a a"×3
      (2L, "x y z"),          // all distinct; bigrams "x y","y z"
      (3L, "solo"),           // one word → no bigrams
      (4L, "   ")             // whitespace-only → excluded
    ).toDF("doc_id", "text")
    val out = CorpusStats.repetitionSignals(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L))
    val d1 = out(1L)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3)) === ((4L, 1L, 4L)))
    assert((d1.getLong(4), d1.getLong(5), d1.getLong(6)) === ((3L, 1L, 3L)))
    assert(d1.getLong(7) === 750000L) // (4-1)/4
    assert(d1.getLong(8) === 666666L) // floor(2/3 ppm)
    assert(d1.getLong(9) === 1000000L)
    val d2 = out(2L)
    assert((d2.getLong(1), d2.getLong(2), d2.getLong(3)) === ((3L, 3L, 1L)))
    assert((d2.getLong(7), d2.getLong(8), d2.getLong(9)) === ((0L, 0L, 500000L)))
    val d3 = out(3L)
    assert((d3.getLong(4), d3.getLong(5), d3.getLong(6)) === ((0L, 0L, 0L)))
    assert((d3.getLong(8), d3.getLong(9)) === ((0L, 0L)))
  }

  test("rollingDailyCounts: RANGE frame excludes days beyond the window across gaps") {
    val day = 86400L
    // days 0 (2 events), 1 (1), 9 (1): a ROWS-frame would count day 0/1
    // into day 9's 3-day window; RANGE must not
    val events = ev(Seq(
      (1L, 1L, 10L, 0.0), (2L, 2L, 20L, 0.0),
      (3L, 1L, day + 5L, 0.0),
      (4L, 1L, 9 * day + 1L, 0.0)))
    val out = LogOps.rollingDailyCounts(events, windowDays = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(
      0L -> (2L, 2L),
      1L -> (1L, 3L),  // covers days -1..1 → 2+1
      9L -> (1L, 1L))) // days 7..9: the gap excludes everything earlier
  }

  test("retention: first-day cohorts, distinct per offset, multi-day activity") {
    val day = 86400L
    val events = ev(Seq(
      // user 1: days 0, 1, 1 (dup same day), 3
      (1L, 1L, 10L, 0.0), (2L, 1L, day + 5L, 0.0),
      (3L, 1L, day + 60L, 0.0), (4L, 1L, 3 * day, 0.0),
      // user 2: first active day 1, returns day 3 (offset 2)
      (5L, 2L, day + 7L, 0.0), (6L, 2L, 3 * day + 1L, 0.0),
      // user 3: day 0 only
      (7L, 3L, 20L, 0.0)))
    val out = LogOps.retention(events)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 2L, // users 1, 3 on their day-0
      (0L, 1L) -> 1L, // user 1 returns next day (dup events counted once)
      (0L, 3L) -> 1L, // user 1 on day 3
      (1L, 0L) -> 1L, // user 2's cohort
      (1L, 2L) -> 1L)) // user 2 returns 2 days later
  }

  test("funnel: ordered progression, out-of-order steps don't count, per-session isolation") {
    def e(id: Long, user: Long, ts: Long, typ: String) = (id, user, ts, typ, 0.0)
    val events = Seq(
      // user 1, session 1: full ordered funnel A(0) B(10) C(20)
      e(1, 1, 0, "A"), e(2, 1, 10, "B"), e(3, 1, 20, "C"),
      // user 2: B before A — B must NOT count; later B(30) does; no C
      e(4, 2, 0, "B"), e(5, 2, 10, "A"), e(6, 2, 30, "B"),
      // user 3: C only → zero stages
      e(7, 3, 5, "C"),
      // user 1, session 2 (gap > 1800): A only — progression isolated
      e(8, 1, 5000, "A"))
      .toDF("event_id", "user_id", "ts_s", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s")).cast("timestamp_ntz"))
      .drop("ts_s")
    val out = LogOps.funnel(events, Seq("A", "B", "C"), gapSeconds = 1800)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), r.getLong(5))).toMap
    assert(out((1L, 1L)) === ((Some(0L), Some(10000000L), Some(20000000L), 3L)))
    assert(out((2L, 1L)) === ((Some(10000000L), Some(30000000L), None, 2L)))
    assert(out((3L, 1L)) === ((None, None, None, 0L)))
    assert(out((1L, 2L)) === ((Some(5000000000L), None, None, 1L)))
    assert(out.size === 4)
  }

  test("funnel: same-timestamp step events satisfy at-or-after (inclusive)") {
    val events = Seq((1L, 1L, 100L, "A", 0.0), (2L, 1L, 100L, "B", 0.0))
      .toDF("event_id", "user_id", "ts_s", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s")).cast("timestamp_ntz"))
      .drop("ts_s")
    val r = LogOps.funnel(events, Seq("A", "B"), gapSeconds = 1800).collect().head
    assert(r.getAs[Long]("stages_reached") === 2L)
  }

  test("asofJoin: most recent version ≤ ts, inclusive ties, null before first version") {
    val left = Seq(
      (1L, 10L, 5L),   // before any version → null
      (2L, 10L, 10L),  // ts == version ts → INCLUSIVE match (v1)
      (3L, 10L, 15L),  // between versions → v1
      (4L, 10L, 20L),  // at second version → v2
      (5L, 10L, 99L),  // far after → still v2
      (6L, 77L, 50L)   // key with no versions at all → null
    ).toDF("event_id", "key", "ts")
    val right = Seq((10L, 10L, 111L), (10L, 20L, 222L)).toDF("key", "vts", "attr")
    val out = LogOps.asofJoin(left, right, "key", "ts", "vts", Seq("attr"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out === Map(
      1L -> None, 2L -> Some(111L), 3L -> Some(111L),
      4L -> Some(222L), 5L -> Some(222L), 6L -> None))
  }

  test("asofJoin: multiple attrs carried together; left columns pass through") {
    val left = Seq((1L, "k", 15L, "payload")).toDF("event_id", "key", "ts", "extra")
    val right = Seq(("k", 10L, 7L, "x")).toDF("key", "vts", "a1", "a2")
    val out = LogOps.asofJoin(left, right, "key", "ts", "vts", Seq("a1", "a2")).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("extra") === "payload" &&
      r.getAs[Long]("a1") === 7L && r.getAs[String]("a2") === "x")
  }

  test("asofJoin: a NULL attribute in the latest version is honored, not resurrected") {
    // version at ts=10 has a1 = NULL, a2 = "y": the ts=15 event must get
    // THAT version atomically (a1 null, a2 "y"), never a1=7 from the
    // superseded ts=5 version — per-attribute carries would mix versions
    val left = Seq((1L, "k", 15L)).toDF("event_id", "key", "ts")
    val right = Seq(
      ("k", 5L, Some(7L), "x"),
      ("k", 10L, None: Option[Long], "y")).toDF("key", "vts", "a1", "a2")
    val r = LogOps.asofJoin(left, right, "key", "ts", "vts", Seq("a1", "a2"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("a1")), "superseded non-null a1 resurrected")
    assert(r.getAs[String]("a2") === "y")
  }

  test("asofJoin: rejects colliding attr names") {
    val left = Seq((1L, "k", 15L)).toDF("event_id", "key", "ts")
    val right = Seq(("k", 10L, 7L)).toDF("key", "vts", "ts")
    assertThrows[IllegalArgumentException] {
      LogOps.asofJoin(left, right, "key", "ts", "vts", Seq("ts"))
    }
  }

  test("collocations: lift order, minCount gate, k cap") {
    // "a b" occurs 3x and a/b occur only in it → lift 3/(3*3) = 1/3
    // "c d" occurs 2x, c 4x, d 2x → lift 2/8 = 1/4 → ranks below "a b"
    // "c c" occurs 2x (within the c-run) but c is common → lowest
    // "e f" occurs once → killed by minCount=2
    val docs = Seq(
      (1L, "a b x a b y a b"),
      (2L, "c d z c d"),
      (3L, "c c c"), // bigrams: "c c" x2
      (4L, "e f")).toDF("doc_id", "text")
    val out = CorpusStats.collocations(docs, minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length === 3)
    assert(out(0) === (("a", "b", 3L, 3L, 3L)))
    // lift: cd = 2/(5·2) = 0.2, cc = 2/(5·5) = 0.08 → cd before cc
    assert(out(1) === (("c", "d", 2L, 5L, 2L)))
    assert(out(2)._2 == "c")
    assert(!out.exists(t => t._1 == "e"), "minCount must gate hapax pairs")
  }

  test("distributionDrift: exact two-sample KS ppm over the bucket grid") {
    val docs = Seq(
      (1L, "x", 10L), (2L, "x", 20L),   // both bucket 0 (width 64)
      (3L, "y", 100L), (4L, "y", 130L)) // buckets 1 and 2 → grid {0,1,2}
      .toDF("doc_id", "source", "n_chars")
    // corpus CDF over the grid: 0.5, 0.75, 1.0
    // x CDF: 1, 1, 1 → gaps 0.5, 0.25, 0 → max 0.5
    // y CDF: 0, 0.5, 1 → gaps 0.5, 0.25, 0 → max 0.5 (y exercises the
    // bucket-0 hole in the grid: its CDF must be evaluated there too)
    val out = CorpusStats.distributionDrift(docs, "source", "n_chars", 64L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("x") == ((2L, 500000L)))
    assert(out("y") == ((2L, 500000L)))
  }

  test("distributionDrift floors negative values into their own buckets (DuckDB // parity)") {
    val docs = Seq(
      (1L, "x", -1L), (2L, "x", -64L), // both floor to bucket -1
      (3L, "y", 0L), (4L, "y", -65L))  // buckets 0 and -2 → grid {-2,-1,0}
      .toDF("doc_id", "source", "v")
    // corpus CDF over sorted grid [-2,-1,0]: 0.25, 0.75, 1.0
    // x CDF: 0, 1, 1 → gaps 0.25, 0.25, 0; y CDF: 0.5, 0.5, 1 → same max
    val out = CorpusStats.distributionDrift(docs, "source", "v", 64L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("x") == 250000L)
    assert(out("y") == 250000L)
  }

  test("bigramFluency: mean corpus-bigram frequency, integer ppm") {
    val docs = Seq(
      (1L, "a b c"),   // bigrams: "a b", "b c"
      (2L, "a b d"),   // bigrams: "a b", "b d"
      (3L, "x")).toDF("doc_id", "text") // <2 words → one degenerate shingle "x"
    // corpus freqs: "a b"=2, "b c"=1, "b d"=1, "x"=1
    val out = CorpusStats.bigramFluency(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 3L, 1500000L))) // (2+1)/2 → 1.5e6 ppm
    assert(out(2L) == ((2L, 3L, 1500000L)))
    assert(out(3L) == ((1L, 1L, 1000000L)))
  }

  test("salientTerms: tf desc, df asc, term asc; k cap") {
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana banana cherry"),
      (3L, "cherry date")).toDF("doc_id", "text")
    // df: apple 1, banana 2, cherry 3, date 1
    val out = CorpusStats.salientTerms(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out((1L, 1L)) === (("apple", 2L, 1L)))   // tf 2 wins
    assert(out((1L, 2L)) === (("banana", 1L, 2L)))  // tf tie → rarer df wins over cherry
    assert(out((2L, 1L)) === (("banana", 2L, 2L)))
    assert(out((3L, 1L)) === (("date", 1L, 1L)))    // df tiebreak: date (1) < cherry (3)
    assert(out((3L, 2L)) === (("cherry", 1L, 3L)))
    assert(out.size === 6)
  }

  test("invertedIndex: df/cf exact, postings capped at k, tf desc doc asc order") {
    val docs = Seq(
      (1L, "x x x y"),
      (2L, "x x y y"),
      (3L, "x y z"),
      (4L, "x")).toDF("doc_id", "text")
    val out = CorpusStats.invertedIndex(docs, k = 2, minDf = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(3)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    // x: df 4, cf 3+2+1+1=7; top-2 postings tf desc doc asc → (1,3),(2,2)
    assert(out(("x", 1L)) === ((4L, 7L, 1L, 3L)))
    assert(out(("x", 2L)) === ((4L, 7L, 2L, 2L)))
    // y: df 3, cf 1+2+1=4; tf tie between docs 1 and 3 → doc asc after doc 2
    assert(out(("y", 1L)) === ((3L, 4L, 2L, 2L)))
    assert(out(("y", 2L)) === ((3L, 4L, 1L, 1L)))
    // z is hapax (df 1) → pruned by minDf = 2; k caps x at 2 postings
    assert(out.size === 4)
  }

  test("latestState: max (ts, id) wins, id breaks ts ties, one row per key") {
    val ev = Seq(
      (1L, 10L, 100L, "a", 1.0),
      (2L, 10L, 300L, "b", 2.0), // latest ts for user 10
      (3L, 10L, 200L, "c", 3.0),
      (4L, 20L, 500L, "d", 4.0),
      (5L, 20L, 500L, "e", 5.0)) // ts tie: larger event_id wins
      .toDF("event_id", "user_id", "ts_us", "event_type", "value")
    val out = LogOps.latestState(ev, payloadCols = Seq("event_type", "value"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))).toMap
    assert(out(10L) === ((300L, 2L, "b", 2.0)))
    assert(out(20L) === ((500L, 5L, "e", 5.0)))
    assert(out.size === 2)
  }

  test("percentileRanks: strict-below ppm, ties share min rank, singleton is 0") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 7L), (4L, 9L), (5L, 9L)).toDF("id", "v")
    val out = CorpusStats.percentileRanks(df, "v")
      .collect().map(r => r.getLong(r.fieldIndex("id")) -> r.getLong(r.fieldIndex("pctl_ppm"))).toMap
    // N-1 = 4: v=5 → 0 below; v=7 → 2 below → 500000; v=9 → 3 below → 750000
    assert(out(1L) === 0L && out(2L) === 0L)
    assert(out(3L) === 500000L)
    assert(out(4L) === 750000L && out(5L) === 750000L)
    val single = CorpusStats.percentileRanks(Seq((1L, 42L)).toDF("id", "v"), "v")
      .collect().head.getLong(2)
    assert(single === 0L, "N = 1 must not divide by zero")
  }

  test("intervalJoin: [start, end) bounds, multi-bucket windows join once, empty windows dropped") {
    val ev = Seq(
      (1L, "a", 100L),  // inside w1 [100, 250)
      (2L, "a", 249L),  // last inside w1 (end exclusive)
      (3L, "a", 250L),  // AT end → outside w1
      (4L, "a", 99L),   // just before start → outside
      (5L, "b", 100L),  // wrong key
      (6L, "a", 210L))  // inside w1 AND w2 [200, 260)
      .toDF("event_id", "event_type", "ts_us")
    val wins = Seq(
      ("a", 10L, 100L, 250L), // spans buckets 1..4 at bucketUs=64
      ("a", 20L, 200L, 260L),
      ("a", 30L, 300L, 300L), // empty: end == start, matches nothing
      ("b", 40L, 500L, 600L))
      .toDF("event_type", "win_id", "start_us", "end_us")
    val out = LogOps.intervalJoin(ev, wins, bucketUs = 64L)
      .collect().map(r => (r.getLong(r.fieldIndex("event_id")), r.getLong(r.fieldIndex("win_id"))))
      .sorted
    // events 2/3 pin end-exclusivity on w1 (ts 249 in, ts 250 out) while
    // both land in w2 [200, 260); event 6 matches both windows but each
    // pair appears EXACTLY once even though w1 spans 4 buckets (the event
    // side has a single bucket)
    assert(out === Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (6L, 10L), (6L, 20L)))
  }

  test("transitions: per-user edges, id tiebreak on ties, exact ppm shares") {
    // user 1: a→b→a (ts order); user 2: a→b via event_id tiebreak at equal ts
    val events = Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 10L, "b"), (3L, 1L, 20L, "a"),
      (4L, 2L, 5L, "a"), (5L, 2L, 5L, "b"), // same ts: event_id orders a before b
      (6L, 3L, 0L, "c")) // single event: no edge
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", timestamp_seconds(col("ts_s")).cast("timestamp_ntz"))
      .drop("ts_s")
    val out = LogOps.transitions(events)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // edges: a→b ×2 (users 1, 2), b→a ×1 (user 1); c contributes nothing
    assert(out.size === 2)
    assert(out(("a", "b")) === ((2L, 1000000L))) // only a-edge: share 100%
    assert(out(("b", "a")) === ((1L, 1000000L)))
    // ppm shares split exactly when a source fans out
    val fan = Seq(
      (1L, 1L, 0L, "x"), (2L, 1L, 1L, "y"), (3L, 1L, 2L, "x"), (4L, 1L, 3L, "z"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", timestamp_seconds(col("ts_s")).cast("timestamp_ntz"))
      .drop("ts_s")
    val f = LogOps.transitions(fan)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    // x fans to y and z once each: floor(1/2 · 1e6) = 500000 both
    assert(f(("x", "y")) === 500000L && f(("x", "z")) === 500000L)
    assert(f(("y", "x")) === 1000000L)
  }

  test("sampledQuantiles: sample-exact quantiles, bounded and deterministic") {
    // values 0..999 under one key; the md5 sample is a fixed subset, so the
    // quantiles of the SAMPLE must be reproduced exactly on a re-run
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("k", lit("g"))
      .withColumn("v", col("id"))
    val qs = Seq(("p50", 1, 2), ("p90", 9, 10))
    val once = LogOps.sampledQuantiles(df, "k", "v", "id", k = 101, qs).collect()
    val again = LogOps.sampledQuantiles(df, "k", "v", "id", k = 101, qs).collect()
    assert(once.toSeq === again.toSeq)
    val r = once.head
    assert(r.getAs[Long]("n") === 101L) // exactly k rows survive per group
    // a uniform 101-sample of 0..999: p50 within ±150 of 500, p90 near 900
    val p50 = r.getAs[Long]("p50"); val p90 = r.getAs[Long]("p90")
    assert(math.abs(p50 - 500L) < 150, s"p50=$p50")
    assert(math.abs(p90 - 900L) < 100, s"p90=$p90")
    // k ≥ group size degenerates to the exact quantiles
    val small = spark.range(0, 50).toDF("id")
      .withColumn("k", lit("g")).withColumn("v", col("id"))
    val exact = LogOps.sampledQuantiles(small, "k", "v", "id", k = 101, qs)
      .collect().head
    assert(exact.getAs[Long]("n") === 50L)
    assert(exact.getAs[Long]("p50") === LogOps.exactQuantiles(small, "k", "v", qs)
      .collect().head.getAs[Long]("p50"))
  }
}
