package graft.logops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log/telemetry analytics over routed event streams — the downstream
  * consumers a Fluentd-style router feeds (reference ecosystem: the
  * datacounter/numeric-monitor output family sitting behind
  * rewrite_tag_filter; cf. reference README usage chains,
  * /root/reference/README.md). Everything here follows the repo-wide
  * oracle rules: integer or scaled-integer outputs only (no float
  * hashing), built-in codegen'd expressions only (no UDFs).
  *
  * Scale design notes are per-operator; the common theme is that windows
  * only ever run over either (a) per-entity partitions with running
  * O(1) frames, or (b) already-aggregated series/histograms that are
  * orders of magnitude smaller than the input.
  */
object LogOps {

  /** THE session-assignment definition, shared by [[sessionize]] and
    * [[funnel]] (one source of truth: a drift between the two would bucket
    * the same events into different sessions). Adds `ts_us` (exact epoch
    * micros) and `session_idx` (1-based per user, time order) to `events`.
    * Two sequential Window nodes over the SAME partitioning+ordering (a
    * window function can't nest inside another's argument): one sort, no
    * second exchange.
    */
  private def tagSessions(
      events: DataFrame,
      gapSeconds: Long,
      userCol: String,
      tsCol: String,
      idCol: String): DataFrame = {
    require(gapSeconds > 0, s"session gap must be positive, got $gapSeconds")
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapSeconds * 1000000L
    events
      // NTZ → TIMESTAMP under the session's fixed UTC zone: the same
      // wall-clock-as-UTC reading DuckDB's epoch_us gives a naive timestamp
      .withColumn("ts_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(order))
      .withColumn("is_break",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_break")).over(running))
  }

  /** Gap-based sessionization: a session is a maximal run of one user's
    * events where consecutive gaps are ≤ `gapSeconds`. The classic
    * log-pipeline operator (publicly described everywhere from web-analytics
    * literature to the Spark docs' sessionization examples).
    *
    * Shape at scale: ONE shuffle on `user`. The lag/running-sum window has
    * an O(1) frame (no buffering of the partition), and the per-session
    * aggregate's grouping keys (user, session_idx) are a SUPERSET of the
    * window's partition key, so `HashPartitioning(user)` already satisfies
    * the aggregate's ClusteredDistribution — Catalyst plans no second
    * exchange (asserted in PlanShapeSpec). Per-user state is one partition's
    * worth of rows streamed in sort order, never materialized.
    *
    * Timestamps are compared in epoch MICROSECONDS (exact integers in both
    * engines: `unix_micros` here, `epoch_us` in DuckDB) — seconds-level
    * truncation would merge events straddling a second boundary.
    *
    * Output per session: user, session_idx (1-based within user, in time
    * order), n_events, start_us, end_us, dur_us, value_c (cents, summed
    * AFTER per-row rounding: float addition is order-sensitive).
    */
  def sessionize(
      events: DataFrame,
      gapSeconds: Long,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      valueCol: String = "value"): DataFrame = {
    tagSessions(events, gapSeconds, userCol, tsCol, idCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"),
        sum(round(col(valueCol) * 100).cast("long")).as("value_c"))
  }

  /** Per-(entity, minute) rate counts with a trailing-window spike flag:
    * a minute is a spike when its count exceeds `num/den` × the mean of the
    * previous `trailingN` OBSERVED minutes (rows-frame over the per-minute
    * series — both engines agree on row frames; absent minutes contribute
    * nothing, which is the behavior a sparse telemetry series wants).
    * The comparison is integer cross-multiplied (`cnt * trail_n * den >
    * trail_sum * num`) so no float ever exists — the mean is never
    * materialized.
    *
    * Shape at scale: the per-minute count is a partial+final aggregate over
    * the raw stream (map-side combine absorbs per-minute hot keys); the
    * trailing window then runs over the AGGREGATED series — cardinality
    * (entities × minutes), unrelated to raw event volume.
    */
  def rateSpikes(
      events: DataFrame,
      trailingN: Int = 5,
      num: Int = 3,
      den: Int = 1,
      entityCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(trailingN > 0 && num > 0 && den > 0, "rateSpikes parameters must be positive")
    val perMinute = events
      .groupBy(
        col(entityCol),
        date_format(date_trunc("minute", col(tsCol)), "yyyy-MM-dd HH:mm").as("minute"))
      .agg(count(lit(1)).as("cnt"))
    // fixed-format minute strings sort chronologically; the frame counts
    // observed rows, so leading minutes see a shorter history (flag gated
    // on a FULL window to avoid cold-start false positives)
    val trail = Window.partitionBy(col(entityCol)).orderBy(col("minute"))
      .rowsBetween(-trailingN, -1)
    perMinute
      .withColumn("trail_sum", coalesce(sum(col("cnt")).over(trail), lit(0L)))
      .withColumn("trail_n", count(col("cnt")).over(trail))
      .withColumn("spike",
        (col("trail_n") === trailingN &&
          col("cnt") * col("trail_n") * den > col("trail_sum") * num).cast("long"))
  }

  /** Exact discrete quantiles via the two-level histogram shape — the only
    * exact-quantile plan that survives 100 TB. A naive
    * `percentile()`/window-over-raw-rows plan buffers every value of a key
    * in one task; this one:
    *   1. partial+final count per (key, value) — raw volume collapses to
    *      the value histogram, map-side combine absorbs hot values;
    *   2. running-count window over the HISTOGRAM (cardinality = distinct
    *      values per key, not rows — telemetry value domains are small);
    *   3. quantile k picks the first histogram bin whose cumulative count
    *      reaches floor((n-1) * num/den) + 1 — pure integer arithmetic,
    *      identical in any engine (the lower discrete quantile; no
    *      interpolation, so no float divergence by construction).
    *
    * `quantiles` are (name, num, den) with 0 ≤ num/den ≤ 1. The value
    * column must already be integral (round to cents upstream).
    */
  def exactQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (n, a, b) =>
      require(b > 0 && a >= 0 && a <= b, s"quantile $n: need 0 <= $a/$b <= 1")
    }
    val hist = df.groupBy(col(keyCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val byKey = Window.partitionBy(col(keyCol))
    val cum = byKey.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // n (total count) rides the same partitioning as the cumulative window —
    // no extra shuffle, no scalar subquery
    val withCum = hist
      .withColumn("cum", sum(col("c")).over(cum))
      .withColumn("n", sum(col("c")).over(byKey))
    val qCols = quantiles.map { case (name, num, den) =>
      // (n-1)*num is far below 2^53, so double division + floor is exact
      // and equals DuckDB's integer `//`
      val target = floor((col("n") - 1) * num.toLong / den.toLong) + 1 // 0-based idx, then 1-based
      min(when(col("cum") >= target, col("v"))).as(name)
    }
    val aggs = max(col("n")).as("n") +: qCols
    withCum.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Rolling event counts per entity over a trailing `windowDays`-day
    * RANGE frame of integer epoch days — the gap-aware moving aggregate
    * (a ROWS frame would silently stretch across missing days; RANGE on
    * the integer day is the correct sparse-series semantics, identical in
    * any engine).
    *
    * Shape at scale: raw volume collapses at the (entity, day)
    * partial+final count; the RANGE window runs over the daily series
    * (entities × days), never raw events.
    */
  def rollingDailyCounts(
      events: DataFrame,
      windowDays: Int,
      entityCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val daily = events
      .groupBy(col(entityCol),
        floor(unix_micros(col(tsCol).cast("timestamp")) / 86400000000.0)
          .cast("long").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val trail = Window.partitionBy(col(entityCol)).orderBy(col("day"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily.withColumn("rolling_cnt", sum(col("cnt")).over(trail))
  }

  /** Cohort retention: users are cohorted by their FIRST active day; each
    * (cohort_day, day_offset) cell counts the distinct cohort members
    * active again `day_offset` days later — the standard retention
    * triangle. Days are integer epoch days (floor(epoch_us / 86.4e9);
    * exact below 2^53, identical in any engine).
    *
    * Shape at scale: the raw stream collapses to DISTINCT (user, day)
    * first (partial+final, the only pass over raw volume), the
    * cohort-day aggregate and the join back are both keyed on user (one
    * co-keyed exchange), and the final cell count is a two-phase distinct
    * aggregate over (cohort, offset, user) triples — bounded by
    * users × active-days, never raw events.
    */
  def retention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val days = events
      .select(col(userCol),
        floor(unix_micros(col(tsCol).cast("timestamp")) / 86400000000.0)
          .cast("long").as("day"))
      .distinct()
    val cohort = days.groupBy(col(userCol)).agg(min(col("day")).as("cohort_day"))
    days.join(cohort, userCol)
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Ordered-funnel progression per session: for funnel steps s1 → s2 → …
    * → sk, a session reaches stage j when there exist events of types
    * s1..sj at non-decreasing timestamps (each stage's timestamp is the
    * EARLIEST occurrence at-or-after the previous stage — the standard
    * product-analytics funnel definition). Returns one row per session
    * with each stage's epoch-micro timestamp (null once progression
    * stops) and `stages_reached`.
    *
    * Shape at scale: sessionize's single user-shuffle, then one
    * conditional aggregate PER STAGE over the session key — stage j's
    * aggregate needs stage j-1's timestamp, an inherently sequential
    * dependency, so it is k joined aggregates rather than one (k is the
    * funnel length, a small constant; every aggregate and join is
    * co-keyed on (user, session_idx) and partial+final — no windows over
    * raw events, no event-list gather, state O(1) per session per stage).
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      gapSeconds: Long,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val tagged = tagSessions(events, gapSeconds, userCol, tsCol, idCol)
      .select(col(userCol), col("session_idx"), col("ts_us"), col(typeCol))
    val key = Seq(userCol, "session_idx")
    // stage 1: earliest step-1 event per session
    val first = tagged
      .groupBy(key.map(col): _*)
      .agg(min(when(col(typeCol) === steps.head, col("ts_us"))).as("stage1_us"))
    // stage j: earliest step-j event at-or-after stage j-1
    val staged = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"stage${i}_us"
      val cur = s"stage${i + 1}_us"
      val next = tagged.join(acc.select((key :+ prev).map(col): _*), key)
        .groupBy(key.map(col): _*)
        .agg(min(when(col(typeCol) === step && col("ts_us") >= col(prev),
          col("ts_us"))).as(cur))
      acc.join(next, key)
    }
    val stageCols = steps.indices.map(i => col(s"stage${i + 1}_us"))
    staged.withColumn("stages_reached",
      stageCols.map(c => when(c.isNotNull, 1L).otherwise(0L)).reduce(_ + _))
  }

  /** As-of (most-recent-version) join: each left row picks the right row
    * with the LARGEST `rightTs` ≤ its own `ts`, per key — the canonical
    * late-binding enrichment of a log pipeline (the dimension version that
    * was active when the event happened). Spark has no native as-of join;
    * the naive per-row subquery/range join is O(rows × versions).
    *
    * This is the scale-correct UNION + RUNNING-WINDOW shape: tag both
    * sides, union, sort each key partition once by (ts, side) with the
    * dimension side FIRST at equal timestamps (ties are inclusive, like
    * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`), and carry each dimension
    * attribute forward with `last(attr, ignoreNulls = true)` over the
    * running frame — O(1) window state, ONE shuffle on the key, both
    * inputs streamed in sort order, never buffered. Left rows before any
    * dimension version get nulls (left-join semantics).
    *
    * `rightAttrs` must not collide with left column names. The right side
    * must be unique per (key, rightTs) — pre-aggregate it otherwise (an
    * ambiguous as-of match is a bug in the caller, not a tie to break
    * silently; uniqueness is asserted cheaply via the oracle/test, not a
    * runtime scan).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightTsCol: String,
      rightAttrs: Seq[String]): DataFrame = {
    require(rightAttrs.nonEmpty, "asofJoin needs at least one right attribute")
    val leftCols = left.columns.toSeq
    require(rightAttrs.intersect(leftCols).isEmpty,
      s"right attrs ${rightAttrs.intersect(leftCols)} collide with left columns")
    // the whole dimension version is carried as ONE struct: carrying each
    // attribute independently with last(ignoreNulls) would (a) skip a
    // version whose attribute is genuinely NULL (resurrecting a superseded
    // value) and (b) mix attributes from different versions — the struct is
    // non-null exactly on dimension rows, so one ignoreNulls carry picks
    // the latest VERSION atomically, nulls inside it and all
    val dimStruct = struct(rightAttrs.map(col): _*)
    val dimType = {
      val r = right.select(dimStruct.as("__dim"))
      r.schema("__dim").dataType
    }
    val l = left.select(leftCols.map(col) :+ lit(1).as("__side") :+
      lit(null).cast(dimType).as("__dim"): _*)
      .withColumn("__ts", col(tsCol))
    val r = right.select(col(keyCol), col(rightTsCol).as("__ts"),
      lit(0).as("__side"), dimStruct.as("__dim"))
    // left payload columns are null on dimension rows; they are filtered
    // out after the carry-forward, so only schema alignment matters
    val rAligned = r.select(
      leftCols.map(c => if (c == keyCol) col(c) else lit(null).cast(l.schema(c).dataType).as(c)) :+
        col("__side") :+ col("__dim") :+ col("__ts"): _*)
    val unioned = l.unionByName(rAligned)
    val carry = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__dim", last(col("__dim"), ignoreNulls = true).over(carry))
    rightAttrs.foldLeft(carried) { (df, a) => df.withColumn(a, col("__dim")(a)) }
      .where(col("__side") === 1)
      .drop("__side", "__ts", "__dim")
  }

  /** Bounded-state approximate quantiles: exact discrete quantiles of a
    * deterministic k-per-group uniform sample — the 100 TB answer when
    * even the [[exactQuantiles]] two-level histogram is too wide (a
    * high-cardinality value domain keeps the histogram near raw size).
    *
    * The sample is [[graft.textops.Sampling.quotaSample]]'s bottom-k by
    * md5(salt:id): uniform without replacement per group, reproducible
    * across runs/engines/retries, and elected by the bounded
    * KMinStringsAgg (state ≤ k per group on both sides of the shuffle).
    * The sampled ids join back to their values via a BROADCAST join (k
    * rows per group — trivially broadcastable), then the exact-quantile
    * plan runs over ≤ k·groups rows. Every step is deterministic, so the
    * DuckDB oracle reproduces the answer exactly — the "approximation" is
    * statistical (sample vs population), never numeric.
    */
  def sampledQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      idCol: String,
      k: Int,
      quantiles: Seq[(String, Int, Int)],
      salt: String = "graft"): DataFrame = {
    val sample = graft.textops.Sampling
      .quotaSample(df.select(col(keyCol), col(idCol)), keyCol, idCol, k, salt)
      .select(col(keyCol), col("sample_key"))
    val joined = df
      .select(col(keyCol), col(idCol).cast("string").as("sample_key"), col(valueCol))
      .join(broadcast(sample), Seq(keyCol, "sample_key"))
    exactQuantiles(joined, keyCol, valueCol, quantiles)
  }

  /** Latest-record-wins compaction (the CDC/upsert "current state" view):
    * per key, the payload of the row with the maximal (tsCol, idCol) —
    * the unique-id tiebreak makes the winner total and engine-independent.
    *
    * Shape at scale: ONE partial+final `max_by(payload_struct, order_struct)`
    * aggregate. Each map task keeps exactly one candidate row per key and
    * ships only that — a hot entity with a billion updates contributes one
    * struct per task to the shuffle. The textbook
    * `row_number() OVER (PARTITION BY key ORDER BY ts DESC) = 1` plan
    * shuffles and SORTS every update ever logged to elect the same single
    * winner; at 100 TB that is the difference between a count-sized
    * exchange and a corpus-sized sort.
    */
  def latestState(
      events: DataFrame,
      payloadCols: Seq[String],
      keyCol: String = "user_id",
      tsCol: String = "ts_us",
      idCol: String = "event_id"): DataFrame = {
    require(payloadCols.nonEmpty, "latestState needs at least one payload column")
    val carried = (tsCol +: idCol +: payloadCols).distinct
    val last = events.groupBy(col(keyCol))
      .agg(max_by(struct(carried.map(col): _*), struct(col(tsCol), col(idCol))).as("__last"))
    last.select(col(keyCol) +: carried.map(c => col(s"__last.$c").as(s"last_$c")): _*)
  }

  /** Interval (range) join re-expressed as a bucketized EQUI-join — the
    * published technique for making "point in [start, end)" joins scale
    * (Spark's optimizer ships it as the range-join hint; Flink's interval
    * join is the same shape). A naive θ-join on
    * `key = key AND start <= ts AND ts < end` gives Spark an equi-key plus
    * range residual: every event of a key meets every window of that key
    * inside one sort-merge task — O(events × windows) per hot key, the
    * exact blow-up that kills incident-correlation joins at 100 TB.
    *
    * Here each WINDOW is exploded to the fixed time buckets it covers
    * (`span/bucketUs + 1` replicas — choose `bucketUs` near the typical
    * span so replication stays O(1)) while each EVENT maps to exactly ONE
    * bucket, and the join key becomes `(key, bucket)`. Only pairs sharing
    * a bucket are ever compared, the shuffle is a plain hash exchange, and
    * because the event side has a single bucket per row, a matching
    * (event, window) pair meets in exactly one bucket — no post-join
    * dedup, no duplicate rows by construction.
    *
    * `events` needs (`keyCol`, `tsUsCol`: long micros); `windows` needs
    * (`keyCol`, `winIdCol`, `startUsCol`, `endUsCol`) with `endUsCol`
    * EXCLUSIVE. Returns the inner join: every event row paired with each
    * covering window's id. All bucket arithmetic is integral `div` — no
    * IEEE floor on epoch micros.
    */
  def intervalJoin(
      events: DataFrame,
      windows: DataFrame,
      bucketUs: Long,
      keyCol: String = "event_type",
      tsUsCol: String = "ts_us",
      winIdCol: String = "win_id",
      startUsCol: String = "start_us",
      endUsCol: String = "end_us"): DataFrame = {
    require(bucketUs > 0, s"intervalJoin bucketUs must be positive, got $bucketUs")
    val wb = windows
      .where(col(endUsCol) > col(startUsCol)) // empty windows match nothing
      .select(col(keyCol), col(winIdCol), col(startUsCol), col(endUsCol),
        explode(sequence(
          expr(s"$startUsCol div ${bucketUs}L"),
          expr(s"($endUsCol - 1) div ${bucketUs}L"))).as("__bucket"))
    events
      .withColumn("__bucket", expr(s"$tsUsCol div ${bucketUs}L"))
      .join(wb, Seq(keyCol, "__bucket"))
      .where(col(tsUsCol) >= col(startUsCol) && col(tsUsCol) < col(endUsCol))
      .drop("__bucket", startUsCol, endUsCol)
  }

  /** First-order event-type transition counts (the Markov edge list over
    * per-user event sequences): each user's stream is ordered by
    * (ts, idCol) — the id tiebreak makes simultaneous events a total,
    * engine-independent order — and every consecutive (type → next type)
    * pair is counted globally, plus per-edge share of its source type in
    * exact ppm (integer floor division, identical cross-engine).
    *
    * Shape at scale: ONE exchange on the user key feeds the lead() window
    * (O(1) frame, no buffering beyond the sort); raw volume then collapses
    * at a partial+final (from, to) count, and the ppm share rides a window
    * over the TYPE×TYPE edge list — dozens of rows, never the corpus.
    */
  def transitions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val seq = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val edges = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(seq))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val bySrc = Window.partitionBy(col("from_type"))
    edges
      .withColumn("__src_n", sum(col("n")).over(bySrc))
      // `div` is exact long division (≡ DuckDB's `//`) — no IEEE rounding
      .withColumn("share_ppm", expr("n * 1000000L div __src_n"))
      .drop("__src_n")
  }
}
