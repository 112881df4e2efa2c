package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.engine.Det.dsum
import graft.engine.Tables.t
import graft.engine.TimeSeries

/** Window / time-series operators (SURVEY.md §2.5 W1-W6, §2.6 O1-O3, §2.3
  * J2/J3, §2.8 C12) over the `events` table. Ordering is always
  * (ts, event_id) — event_id breaks timestamp ties, so every window frame is
  * uniquely determined and the output is oracle-comparable.
  *
  * Scale: all per-entity windows partition by user_id (parallel across
  * entities, no global sort). The only global windows run over day-level
  * aggregates — bounded by calendar days, not data size.
  */
object WindowQueries {

  /** W1 — lag diff over the daily aggregate series (main.py:66 `diff()`).
    * The series is globally ordered but the plan never uses a global window:
    * lag runs inside month buckets and the month boundaries are stitched
    * from a broadcast per-month last-value aggregate. */
  val windowLag: Q = Q(
    "q_window_lag",
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
      |  FROM events GROUP BY 1)
      |SELECT day, total, total - LAG(total) OVER (ORDER BY day) AS delta
      |FROM daily ORDER BY day""".stripMargin) { (s, dir) =>
    val daily = t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(dsum(col("value")).as("total"))
    TimeSeries.lagDiffStitched(daily, col("total"),
        year(col("day")) * 12 + month(col("day")), col("day"), "delta")
      .select("day", "total", "delta")
      .orderBy("day")
  }

  /** W2 — per-user running total (main.py:260-262 `cumsum`), decimal-exact. */
  val windowCumsum: Q = Q(
    "q_window_cumsum",
    """SELECT event_id, user_id,
      |       CAST(SUM(CAST(value AS DECIMAL(38,6)))
      |            OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .withColumn("running",
        TimeSeries.cumSum(col("value"), Seq("user_id"), Seq(col("ts"), col("event_id"))))
      .select("event_id", "user_id", "running")
      .orderBy("user_id", "event_id")
  }

  /** Ranking family (SURVEY §7.3 window extensions): rank / dense_rank /
    * row_number over a unique ordering; top-3 suppliers per nation. */
  val windowRank: Q = Q(
    "q_window_rank",
    """SELECT * FROM (
      |  SELECT s_nationkey, s_suppkey, s_acctbal,
      |         RANK()       OVER w AS rnk,
      |         DENSE_RANK() OVER w AS drnk,
      |         ROW_NUMBER() OVER w AS rn
      |  FROM supplier
      |  WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey))
      |WHERE rn <= 3
      |ORDER BY s_nationkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("s_nationkey").orderBy(desc("s_acctbal"), asc("s_suppkey"))
    t(s, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("s_nationkey", "rn")
  }

  /** Sliding frame: 7-row moving average per user (frame-spec extension). */
  val windowMovAvg: Q = Q(
    "q_window_movavg",
    """SELECT event_id, user_id,
      |       CAST(SUM(CAST(value AS DECIMAL(38,6)))
      |            OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |       / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS mov_avg
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    t(s, dir, "events")
      .withColumn("mov_avg",
        sum(col("value").cast(DecimalType(38, 6))).over(w).cast(DoubleType) /
          count(col("value")).over(w))
      .select("event_id", "user_id", "mov_avg")
      .orderBy("user_id", "event_id")
  }

  /** W3 — first/last row per entity (pandas `iloc[0]` / `iloc[-1]`,
    * main.py:49-51, 656) via row_number from both ends. */
  val firstLast: Q = Q(
    "q_first_last",
    """WITH numbered AS (
      |  SELECT user_id, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_asc,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_desc
      |  FROM events)
      |SELECT user_id,
      |       MAX(CASE WHEN rn_asc = 1 THEN value END) AS first_value,
      |       MAX(CASE WHEN rn_desc = 1 THEN value END) AS last_value
      |FROM numbered GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    // min_by/max_by over the (ts, event_id) ordering struct: ONE hash
    // aggregation, no window sorts at all (the round-1 form sorted every
    // partition twice, once per direction).
    val ord = struct(col("ts"), col("event_id"))
    t(s, dir, "events")
      .groupBy("user_id")
      .agg(
        min_by(col("value"), ord).as("first_value"),
        max_by(col("value"), ord).as("last_value"))
      .orderBy("user_id")
  }

  /** W4 — tail slice: last 3 events per user (pandas `iloc[-(n+1):]`,
    * main.py:652). */
  val tailSlice: Q = Q(
    "q_tail_slice",
    """SELECT user_id, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn <= 3
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    TimeSeries.tailSlice(t(s, dir, "events"), 3,
        Seq("user_id"), Seq(desc("ts"), desc("event_id")))
      .select("user_id", "event_id", "value")
      .orderBy("user_id", "event_id")
  }

  /** J2 — positional alignment join (main.py:645-655): zip the click series
    * against the purchase series by row index and compare. */
  val rowAlignJoin: Q = Q(
    "q_row_align_join",
    """WITH a AS (
      |  SELECT value AS click_value,
      |         ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
      |  FROM events WHERE event_type = 'click'),
      |b AS (
      |  SELECT value AS purchase_value,
      |         ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
      |  FROM events WHERE event_type = 'purchase')
      |SELECT a.rn, a.click_value, b.purchase_value,
      |       a.click_value - b.purchase_value AS diff
      |FROM a JOIN b ON a.rn = b.rn
      |ORDER BY a.rn""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    // Global index WITHOUT a global window: day-bucketed local numbering +
    // broadcast prefix offsets (TimeSeries.globalRowNumber). The day bucket
    // is a prefix of the (ts, event_id) ordering, so the index is identical
    // to a global row_number — but every stage stays partition-parallel.
    def side(tpe: String, alias: String) =
      TimeSeries.globalRowNumber(
        ev.filter(col("event_type") === tpe),
        date_trunc("day", col("ts")), Seq(col("ts"), col("event_id")), "rn")
        .select(col("value").as(alias), col("rn"))
    side("click", "click_value")
      .join(side("purchase", "purchase_value"), "rn")
      .select(col("rn"), col("click_value"), col("purchase_value"),
        (col("click_value") - col("purchase_value")).as("diff"))
      .orderBy("rn")
  }

  /** W5 — the reference's position-based linear interpolation
    * (main.py:392-419) with nulls injected deterministically
    * (event_id % 7 = 0). A null first row becomes 0 and anchors the rest of
    * the leading run (in-place fill semantics); trailing run carries forward;
    * interior runs blend linearly by row position (quirk Q6). */
  val interpolate: Q = Q(
    "q_interpolate",
    """WITH base AS (
      |  SELECT event_id, user_id, ts,
      |         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      |  FROM events),
      |num AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM base),
      |eff AS (
      |  SELECT *, CASE WHEN v IS NULL AND rn = 1 THEN 0.0 ELSE v END AS v_eff
      |  FROM num),
      |ctx AS (
      |  SELECT *,
      |    MAX(CASE WHEN v_eff IS NOT NULL THEN rn END) OVER wb AS prev_rn,
      |    MIN(CASE WHEN v IS NOT NULL THEN rn END) OVER wf AS next_rn,
      |    LAST_VALUE(v_eff IGNORE NULLS) OVER wb AS prev_v,
      |    FIRST_VALUE(v IGNORE NULLS) OVER wf AS next_v
      |  FROM eff
      |  WINDOW
      |    wb AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_id, user_id,
      |       CASE WHEN v IS NOT NULL THEN v
      |            WHEN next_v IS NULL THEN prev_v
      |            ELSE prev_v + (next_v - prev_v) *
      |                 (CAST(rn - prev_rn AS DOUBLE) / CAST(next_rn - prev_rn AS DOUBLE))
      |       END AS v_interp
      |FROM ctx
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val base = t(s, dir, "events")
      .withColumn("v", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
    TimeSeries.interpolateLinear(base, "v", Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("event_id", "user_id", "v_interp")
      .orderBy("user_id", "event_id")
  }

  /** C12 — accounting-invariant imputation (main.py:421-433): synthesize the
    * reference's Confirmed = Active + Deaths + Recovered identity over
    * events, null exactly one component per row (deterministic), and solve
    * for the missing field with pure when/otherwise — no UDF. */
  val imputeInvariant: Q = Q(
    "q_impute_invariant",
    """WITH base AS (
      |  SELECT event_id,
      |         CASE WHEN event_id % 4 = 0 THEN NULL ELSE value * 1.75 END AS confirmed,
      |         CASE WHEN event_id % 4 = 1 THEN NULL ELSE value END AS active,
      |         CASE WHEN event_id % 4 = 2 THEN NULL ELSE value * 0.5 END AS deaths,
      |         value * 0.25 AS recovered
      |  FROM events)
      |SELECT event_id,
      |       COALESCE(confirmed, active + deaths + recovered) AS confirmed,
      |       COALESCE(active, confirmed - deaths - recovered) AS active,
      |       COALESCE(deaths, confirmed - active - recovered) AS deaths,
      |       recovered
      |FROM base
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val base = t(s, dir, "events").select(
      col("event_id"),
      when(col("event_id") % 4 === 0, lit(null)).otherwise(col("value") * 1.75).as("confirmed"),
      when(col("event_id") % 4 === 1, lit(null)).otherwise(col("value")).as("active"),
      when(col("event_id") % 4 === 2, lit(null)).otherwise(col("value") * 0.5).as("deaths"),
      (col("value") * 0.25).as("recovered"))
    base.select(
      col("event_id"),
      coalesce(col("confirmed"), col("active") + col("deaths") + col("recovered")).as("confirmed"),
      coalesce(col("active"), col("confirmed") - col("deaths") - col("recovered")).as("active"),
      coalesce(col("deaths"), col("confirmed") - col("active") - col("recovered")).as("deaths"),
      col("recovered"))
      .orderBy("event_id")
  }

  /** K18 — cumulative fraction of an entity total (main.py:248-293): running
    * sum divided by a per-key scalar lookup (J1 + W2 composed). */
  val cumFraction: Q = Q(
    "q_cum_fraction",
    """WITH tot AS (
      |  SELECT user_id,
      |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS user_total
      |  FROM events GROUP BY user_id)
      |SELECT e.event_id, e.user_id,
      |       CAST(SUM(CAST(e.value AS DECIMAL(38,6)))
      |            OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |       / NULLIF(t.user_total, 0.0) AS cum_frac
      |FROM events e JOIN tot t ON e.user_id = t.user_id
      |ORDER BY e.user_id, e.event_id""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val tot = ev.groupBy("user_id").agg(dsum(col("value")).as("user_total"))
    ev.join(broadcast(tot), "user_id")
      .withColumn("running",
        TimeSeries.cumSum(col("value"), Seq("user_id"), Seq(col("ts"), col("event_id"))))
      .select(col("event_id"), col("user_id"),
        (col("running") / col("user_total")).as("cum_frac"))
      .orderBy("user_id", "event_id")
  }

  /** TIME-RANGE window frame — the trailing-interval aggregate ROWS frames
    * can't express (q_window_movavg's `ROWS 6 PRECEDING` counts rows;
    * rate-limiting, rolling exposure, and "activity in the last hour"
    * count TIME): per user, the sum and count of events inside the
    * trailing hour of EVENT TIME at each event. The frame is
    * `RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW` over
    * epoch-microseconds — a physical long, so both engines resolve
    * identical frame bounds (no calendar arithmetic), and timestamp TIES
    * are in-frame together on both sides regardless of tie order, which is
    * what makes a RANGE frame oracle-comparable where an unkeyed ROWS
    * frame would not be. The sum folds in DECIMAL(38,6) and casts to
    * double once (the engine's standing exact-aggregation discipline).
    *
    * Shape at 100 TB: partitioned by user_id — parallel across entities,
    * per-partition sort only; the frame slides with two pointers per
    * partition, never materializing the window. */
  val windowTimeRange: Q = Q(
    "q_window_timerange",
    """SELECT event_id, user_id,
      |       CAST(SUM(CAST(value AS DECIMAL(38,6)))
      |            OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_1h_sum,
      |       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS trailing_1h_n
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(38, 6))).over(w)
          .cast(DoubleType).as("trailing_1h_sum"),
        count(lit(1)).over(w).as("trailing_1h_n"))
      .orderBy("user_id", "event_id")
  }

  /** DISTRIBUTION-RANK family — ntile / percent_rank / cume_dist, the
    * quartile-bucketing and percentile-position windows a leaderboard or
    * scorecard needs (completes the ranking family next to
    * [[windowRank]]). percent_rank and cume_dist are re-derived as EXACT
    * ppm integers from rank()/count() — `(rank−1)·10⁶ DIV (n−1)` and
    * `rn·10⁶ DIV n` — rather than the builtins' IEEE doubles, so the
    * oracle hash-matches without float tolerance; a single-row partition
    * reports percent_rank 0 (the n = 1 guard), and cume_dist's tie
    * semantics reduce to row_number because the (cents, suppkey) order is
    * a unique total order. ntile(4) itself is the builtin (its frame
    * arithmetic is integer-deterministic in both engines under the same
    * total order).
    *
    * Shape at 100 TB: one window pass per (nation) partition over a
    * unique (acctbal, suppkey) total order — partition-local sorts; the
    * per-partition count rides the same window, no second scan. */
  val windowNtile: Q = Q(
    "q_window_ntile",
    """SELECT s_nationkey, s_suppkey,
      |       CAST(ROUND(s_acctbal * 100) AS BIGINT) AS cents,
      |       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      |       CASE WHEN COUNT(*) OVER p = 1 THEN 0
      |            ELSE (RANK() OVER w - 1) * 1000000
      |                   // (COUNT(*) OVER p - 1) END AS pct_rank_ppm,
      |       ROW_NUMBER() OVER w * 1000000 // COUNT(*) OVER p AS cume_ppm
      |  FROM supplier
      |  WINDOW
      |    w AS (PARTITION BY s_nationkey
      |          ORDER BY CAST(ROUND(s_acctbal * 100) AS BIGINT), s_suppkey),
      |    p AS (PARTITION BY s_nationkey)
      |ORDER BY s_nationkey, cents, s_suppkey""".stripMargin) { (s, dir) =>
    val cents = round(col("s_acctbal") * 100).cast("long")
    val w = Window.partitionBy("s_nationkey").orderBy(col("cents"), col("s_suppkey"))
    val p = Window.partitionBy("s_nationkey")
    t(s, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"), cents.as("cents"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(p))
      .withColumn("cume_n", row_number().over(w).cast("long"))
      .select(col("s_nationkey"), col("s_suppkey"), col("cents"),
        col("quartile"),
        expr("CASE WHEN n = 1 THEN 0L ELSE (rnk - 1) * 1000000 DIV (n - 1) END")
          .as("pct_rank_ppm"),
        expr("cume_n * 1000000 DIV n").as("cume_ppm"))
      .orderBy("s_nationkey", "cents", "s_suppkey")
  }

  val all: Seq[Q] = Seq(
    windowLag, windowCumsum, windowRank, windowMovAvg, firstLast, tailSlice,
    rowAlignJoin, interpolate, imputeInvariant, cumFraction, windowTimeRange,
    windowNtile)
}
