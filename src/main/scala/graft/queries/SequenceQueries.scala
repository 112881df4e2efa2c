package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Det.dsum
import graft.engine.Tables.t

/** Event-SEQUENCE analytics over `events` — the order-sensitive operators a
  * behavioral/training-sequence pipeline needs beyond per-window aggregates:
  * Markov transition statistics, OHLC downsampling, and last-touch
  * attribution. Engine-own surface (SURVEY §7.5 spirit; the reference is
  * batch-relational only).
  *
  * All three run per-user/per-window with bounded frames or single-lag
  * windows — partition-local sorts, never a global one — and every derived
  * metric is either an exact value pick (min_by/max_by), an integer, or a
  * Det decimal sum, so the oracles hash-match.
  */
object SequenceQueries {

  /** MARKOV TRANSITION MATRIX — counts and exact-ppm probabilities of each
    * (previous event_type -> next event_type) transition within a user's
    * timeline: the first-order sequence statistics behind session modeling
    * and next-event prediction baselines.
    *
    * Shape: one `lag` window per user (partition-local sort on the
    * microsecond timestamp + unique event_id tiebreak), then a 25-row
    * aggregate; the row-count denominator joins back by BROADCAST. */
  val eventTransitions: Q = Q(
    "q_event_transitions",
    """WITH s AS (
      |  SELECT user_id, event_type,
      |         LAG(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS prev
      |  FROM events),
      |tr AS (SELECT prev, event_type AS next, COUNT(*) AS n
      |       FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type),
      |tot AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS n_out FROM tr GROUP BY prev)
      |SELECT tr.prev, tr.next, tr.n, o.n_out,
      |       tr.n * 1000000 // o.n_out AS prob_ppm
      |FROM tr JOIN tot o ON o.prev = tr.prev
      |ORDER BY tr.prev, tr.next""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val seq = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
    val tr = seq.groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val tot = tr.groupBy(col("prev").as("tprev"))
      .agg(sum(col("n")).as("n_out"))
    tr.join(broadcast(tot), col("prev") === col("tprev"))
      .select(col("prev"), col("next"), col("n"), col("n_out"),
        expr("n * 1000000 DIV n_out").as("prob_ppm"))
      .orderBy("prev", "next")
  }

  /** OHLC DOWNSAMPLING — 15-minute tumbling bars per event_type with
    * open/high/low/close/volume, the classic telemetry/markets resampling
    * operator. Open and close are deterministic VALUE PICKS via
    * min_by/max_by on the unique event_id (no window sort at all); the
    * whole bar is ONE map-side-combined hash aggregation, the same shape
    * as q_window_tumbling — linear at any scale. */
  val ohlcBars: Q = Q(
    "q_ohlc_bars",
    """WITH w AS (SELECT event_type,
      |                  ts - to_microseconds(epoch_us(ts) % 900000000) AS wstart,
      |                  value, event_id
      |           FROM events)
      |SELECT wstart, event_type, COUNT(*) AS n_events,
      |       min_by(value, event_id) AS open,
      |       MAX(value) AS high, MIN(value) AS low,
      |       max_by(value, event_id) AS close,
      |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
      |FROM w GROUP BY wstart, event_type
      |ORDER BY wstart, event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        dsum(col("value")).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n_events"), col("open"), col("high"), col("low"), col("close"),
        col("total"))
      .orderBy("wstart", "event_type")
  }

  /** LAST-TOUCH ATTRIBUTION — attach to each purchase the user's most recent
    * preceding view/click within a 2-hour window: the marketing/causal
    * primitive. Runs as the SAME union-and-running-window stream-merge the
    * engine's as-of join uses (engine/AsOf.scala — no inequality join, no
    * per-probe scan): touches and purchases union into one per-user
    * timeline, a `last(ignoreNulls)` window carries the latest touch
    * struct forward, and the tolerance is an exact integer microsecond
    * comparison applied afterward. Ties (same-microsecond touches) break
    * by the struct order (ts, event_id) — deterministic.
    *
    * Shape at 100 TB: one shuffle on user_id, partition-local sort,
    * bounded state — the merge never materializes the touch×purchase
    * product. */
  val lastTouchAttribution: Q = Q(
    "q_attribution",
    """WITH u AS (
      |  SELECT user_id, ts, 1 AS probe, event_id, value,
      |         CAST(NULL AS STRUCT(tts TIMESTAMP, tid BIGINT, ttype VARCHAR)) AS tv
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts, 0, NULL, NULL,
      |         struct_pack(tts := ts, tid := event_id, ttype := event_type)
      |  FROM events WHERE event_type IN ('view', 'click')),
      |w AS (SELECT *, LAST_VALUE(tv IGNORE NULLS) OVER
      |         (PARTITION BY user_id ORDER BY ts, probe, tv
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      |      FROM u),
      |res AS (SELECT event_id AS purchase_id, user_id, value AS purchase_value,
      |               m.tid AS raw_tid, m.ttype AS raw_ttype,
      |               epoch_us(ts) - epoch_us(m.tts) AS gap_us
      |        FROM w WHERE probe = 1)
      |SELECT purchase_id, user_id, purchase_value,
      |       CASE WHEN gap_us <= 7200000000 THEN raw_tid END AS touch_id,
      |       CASE WHEN gap_us <= 7200000000 THEN raw_ttype END AS touch_type,
      |       CASE WHEN gap_us <= 7200000000 THEN gap_us END AS gap_us,
      |       COALESCE(gap_us <= 7200000000, FALSE) AS attributed
      |FROM res ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val tvType = "struct<tts:timestamp,tid:bigint,ttype:string>"
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("probe"),
        col("event_id"), col("value"), lit(null).cast(tvType).as("tv"))
    val refs = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), lit(0).as("probe"),
        lit(null).cast("bigint").as("event_id"),
        lit(null).cast("double").as("value"),
        struct(col("ts").as("tts"), col("event_id").as("tid"),
          col("event_type").as("ttype")).as("tv"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("probe"), col("tv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val res = probes.unionAll(refs)
      .withColumn("m", last(col("tv"), ignoreNulls = true).over(w))
      .filter(col("probe") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("value").as("purchase_value"),
        col("m.tid").as("raw_tid"), col("m.ttype").as("raw_ttype"),
        (unix_micros(col("ts")) - unix_micros(col("m.tts"))).as("gap_raw"))
    val in = col("gap_raw") <= 7200000000L
    res.select(col("purchase_id"), col("user_id"), col("purchase_value"),
        when(in, col("raw_tid")).as("touch_id"),
        when(in, col("raw_ttype")).as("touch_type"),
        when(in, col("gap_raw")).as("gap_us"),
        coalesce(in, lit(false)).as("attributed"))
      .orderBy("purchase_id")
  }

  val all: Seq[Q] = Seq(eventTransitions, ohlcBars, lastTouchAttribution)
}
