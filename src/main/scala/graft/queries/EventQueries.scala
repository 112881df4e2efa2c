package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Det.dsum
import graft.engine.Tables.t

/** Semi-structured extraction + event-time windowing over `events`
  * (SURVEY §2.9/§7.5 extensions; the reference is batch-only, so these are
  * the engine's own surface — expressed in batch form here, with the same
  * operators reusable under Structured Streaming, see graft.streaming).
  *
  * All window aggregations are per (window, key) hash aggregations — partial
  * aggregation applies map-side, nothing sorts globally. Sliding windows
  * multiply rows by windows-per-event (4 here) BEFORE the aggregation, the
  * standard Spark shape.
  */
object EventQueries {

  /** JSON field extraction (`props` payload) + aggregation on the extracted
    * value. get_json_object stays inside codegen; the extracted string is
    * cast to a numeric type explicitly (both engines null on malformed). */
  val jsonExtract: Q = Q(
    "q_json_extract",
    """SELECT event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(k).as("sum_k"),
        min(k).as("min_k"), max(k).as("max_k"))
      .orderBy("event_type")
  }

  /** Tumbling event-time window (1 hour) per event_type. */
  val windowTumbling: Q = Q(
    "q_window_tumbling",
    """SELECT date_trunc('hour', ts) AS wstart, event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY wstart, event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n_events"), col("total"))
      .orderBy("wstart", "event_type")
  }

  /** Sliding event-time window (1 hour every 15 minutes): each event lands
    * in exactly 4 overlapping windows. The DuckDB mirror expands the windows
    * with a 4-element series join on the 15-minute-aligned start. */
  val windowSliding: Q = Q(
    "q_window_sliding",
    """WITH expanded AS (
      |  SELECT e.ts, e.value,
      |         e.ts - to_microseconds(epoch_us(e.ts) % 900000000)
      |              - to_microseconds(g.k * 900000000) AS wstart
      |  FROM events e
      |  CROSS JOIN (SELECT unnest(range(4)) AS k) g)
      |SELECT wstart,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
      |FROM expanded
      |GROUP BY wstart
      |ORDER BY wstart""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total"))
      .select(col("w.start").as("wstart"), col("n_events"), col("total"))
      .orderBy("wstart")
  }

  /** Session window (10-minute gap) per user. Spark sessions are half-open
    * [start, last_event + gap): a new session begins when the inter-event
    * gap is >= the timeout. The DuckDB mirror is the gaps-and-islands form:
    * flag gap >= 10 min, running-sum the flags into session ids, aggregate. */
  val windowSession: Q = Q(
    "q_window_session",
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |         CASE WHEN LAG(ts) OVER w IS NULL
      |                OR ts - LAG(ts) OVER w >= INTERVAL 10 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL 10 MINUTE AS session_end,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
      |FROM sessions
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total"))
      .orderBy("user_id", "session_start")
  }

  /** FUNNEL analysis: how far each user progresses through the ordered
    * view -> click -> purchase sequence, where each stage must strictly
    * follow the previous one in event time — the classic product-analytics
    * operator (and, for a training-data pipeline, the interaction-quality
    * signal event logs are filtered on).
    *
    * Shape at 100 TB: each stage is a per-user MIN aggregation (map-side
    * partial) JOINED to the next stage's filtered events on the user key —
    * three keyed aggregations + three keyed equi-joins, never a per-user
    * sort or a window over the raw event stream; stage tables shrink to
    * <= one row per user before every join. */
  val eventFunnel: Q = Q(
    "q_event_funnel",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |s1 AS (SELECT user_id, MIN(ts) AS t_view FROM events
      |       WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t_click
      |       FROM events e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > s1.t_view GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
      |       FROM events e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t_click GROUP BY e.user_id)
      |SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase,
      |       CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
      |                 WHEN s2.t_click IS NOT NULL THEN 2
      |                 WHEN s1.t_view IS NOT NULL THEN 1
      |                 ELSE 0 END AS BIGINT) AS stage
      |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |LEFT JOIN s3 USING (user_id)
      |ORDER BY u.user_id""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
    val u = ev.select("user_id").distinct()
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    u.join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_purchase").isNotNull, 3L)
          .when(col("t_click").isNotNull, 2L)
          .when(col("t_view").isNotNull, 1L)
          .otherwise(0L).as("stage"))
      .orderBy("user_id")
  }

  /** RETENTION COHORTS: users grouped by their first-seen week, counted in
    * every later week they return — the cohort-retention matrix of product
    * analytics (and the freshness/engagement profile an interaction-log
    * pipeline slices training data by). Week truncation is Monday-start
    * ISO in BOTH engines, so the cohort keys hash-match.
    *
    * Shape: distinct (user, week) pairs -> per-user MIN (map-side partial)
    * -> one keyed join back -> one aggregation. Never a window, never a
    * sort before the presentation ORDER BY; every table after the distinct
    * is bounded by users x weeks. */
  val retentionCohorts: Q = Q(
    "q_retention_cohorts",
    """WITH uw AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      |c AS (SELECT user_id, MIN(wk) AS cohort_week FROM uw GROUP BY user_id)
      |SELECT c.cohort_week,
      |       CAST(datediff('day', c.cohort_week, uw.wk) / 7 AS BIGINT) AS week_offset,
      |       COUNT(*) AS active_users
      |FROM uw JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val uw = t(s, dir, "events")
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val c = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
    uw.join(c, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Session TRAJECTORY assembly — the event-log-to-training-sequence
    * constructor: each (user, 10-minute session) becomes one ordered
    * event-type sequence string, the row shape a behavioral-sequence
    * model trains on (and the companion of q_window_session, which keeps
    * only the session AGGREGATES this query keeps the order of).
    *
    * Ordering inside a session is total and engine-independent:
    * `(ts, event_id)` — the struct sort's leading fields — so the
    * assembled string is deterministic even for same-microsecond events.
    *
    * Shape at 100 TB: one keyed shuffle (user sessionization via
    * `session_window`, the same partial-merging session aggregation as
    * q_window_session); `collect_list` is bounded by SESSION length — a
    * session closes after a 10-minute gap, so no list grows with the
    * corpus, unlike a per-user collect. The sort is per-row over that
    * bounded array, not a window over the event stream. */
  val sessionTrajectories: Q = Q(
    "q_session_trajectories",
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, event_type,
      |         CASE WHEN LAG(ts) OVER w IS NULL
      |                OR ts - LAG(ts) OVER w >= INTERVAL 10 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       string_agg(event_type, ' ' ORDER BY ts, event_id) AS trajectory
      |FROM sessions
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), " ").as("trajectory"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("trajectory"))
      .orderBy("user_id", "session_start")
  }

  /** HyperLogLog distinct-count SKETCH, fully oracle-checked — the
    * cardinality estimator every 100-TB pipeline runs where exact
    * count-distinct is too expensive, here with its whole numeric tower
    * made ENGINE-DETERMINISTIC so even the approximation hash-matches
    * DuckDB:
    *  - the hash is the engine's cross-engine md5-32
    *    ([[graft.functions.Text.md5Hash32]]);
    *  - the register index is `h % 256` (p = 8) and the rank is the
    *    leading-zero count of the remaining 24 bits via a pure
    *    integer CASE ladder — no floating log anywhere (the tfidf
    *    lesson: libm calls are not cross-engine reproducible);
    *  - the harmonic sum over 256 registers is EXACT double arithmetic:
    *    every 2^-M_j term is a dyadic rational in [2^-25, 1], so all
    *    partial sums stay below 53 mantissa bits — no rounding, hence
    *    no float-addition order sensitivity across engines or partition
    *    layouts;
    *  - the output is the RAW alpha_256 * m^2 / S estimate AND the
    *    small-range-corrected one, alongside the exact distinct count and
    *    both relative errors. Linear counting needs ln() — libm again,
    *    not cross-engine reproducible — but its argument V = zero_buckets
    *    is FINITE (1..256), so the correction ships as a 256-entry literal
    *    table of exact-decimal m*ln(m/V) doubles
    *    ([[graft.functions.Sketch.HllLinearStrings]]), applied when the
    *    raw estimate is <= 5/2*m and V > 0 — deterministic in both engines
    *    by the same trick as the dyadic 2^-m table. The testdata's user
    *    cardinality (15/150/1500 at the three SFs) sits squarely in that
    *    small-range regime, so the corrected column is the one that reads
    *    right on the gate data; at the billions-of-keys cardinalities the
    *    p = 8 bank targets at 100 TB, zero_buckets hits 0, the correction
    *    is the identity, and the raw estimate's error concentrates to
    *    ~1.04/sqrt(256) = 6.5%.
    *
    * Shape at 100 TB: two keyed aggregations — (bucket) max-rank with
    * map-side partials (the shuffle carries at most 256 rows per map
    * task), then one 256-row global fold. The exact count_distinct
    * column exists to GRADE the sketch and is the expensive operator the
    * sketch replaces in production. */
  val hllDistinct: Q = {
    import graft.functions.Sketch
    // rank of the 24 remaining hash bits: leading zeros + 1, as a pure
    // integer CASE ladder (identical text in both engines)
    val caseSql = (23 to 0 by -1)
      .map(b => s"WHEN w >= ${1L << b} THEN ${24 - b}")
      .mkString("CASE ", " ", " ELSE 25 END")
    // 2^-m via a literal lookup table of EXACT finite-decimal dyadics —
    // power(2.0, -m) is a libm call with no cross-engine bit guarantee;
    // each element ::DOUBLE because a bare decimal list literal types as
    // DECIMAL in DuckDB and rounds the deep dyadic terms
    val invSql = Sketch.HllInvStrings.map(_ + "::DOUBLE").mkString("[", ", ", "]")
    // m*ln(m/V) small-range table, same exact-decimal treatment (ln is
    // libm-dependent; the finite V domain makes it enumerable instead)
    val linSql = Sketch.HllLinearStrings.map(_ + "::DOUBLE").mkString("[", ", ", "]")
    // alpha_256 * m^2 pre-multiplied in Scala so BOTH engines see ONE
    // identical double literal (DuckDB parses bare decimal literals as
    // DECIMAL and overflows multiplying them; an explicit DOUBLE cast of
    // the single constant sidesteps decimal arithmetic entirely)
    val AlphaM2 = Sketch.HllAlphaM2
    Q(
      "q_hll_distinct",
      s"""WITH h AS (
        |  SELECT user_id,
        |         CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS hv
        |  FROM events),
        |rho AS (
        |  SELECT hv % 256 AS bucket, hv // 256 AS w FROM h),
        |ranked AS (
        |  SELECT bucket, $caseSql AS r FROM rho),
        |regs AS (SELECT bucket, MAX(r) AS m FROM ranked GROUP BY bucket),
        |folded AS (
        |  SELECT COUNT(*) AS n_buckets,
        |         SUM(($invSql)[m]) AS s,
        |         SUM(CASE WHEN m >= 25 THEN 1 ELSE 0 END) AS saturated
        |  FROM regs),
        |exact AS (SELECT COUNT(DISTINCT user_id) AS exact_distinct FROM events),
        |raw AS (
        |  SELECT f.n_buckets, 256 - f.n_buckets AS zb, f.saturated,
        |         f.s + (256 - f.n_buckets) AS hs,
        |         CAST($AlphaM2 AS DOUBLE) / (f.s + (256 - f.n_buckets)) AS est
        |  FROM folded f),
        |corrected AS (
        |  SELECT r.*, CASE WHEN r.zb > 0 AND r.est <= CAST(640.0 AS DOUBLE)
        |                   THEN ($linSql)[CAST(r.zb AS INTEGER)]
        |                   ELSE r.est END AS cest
        |  FROM raw r)
        |SELECT CAST(c.n_buckets AS BIGINT) AS n_buckets,
        |       CAST(c.zb AS BIGINT) AS zero_buckets,
        |       CAST(c.saturated AS BIGINT) AS saturated_buckets,
        |       c.hs AS harmonic_sum,
        |       c.est AS hll_estimate,
        |       c.cest AS hll_corrected,
        |       CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
        |       abs(c.est - e.exact_distinct) / e.exact_distinct AS rel_err,
        |       abs(c.cest - e.exact_distinct) / e.exact_distinct AS rel_err_corrected
        |FROM corrected c, exact e""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val hv = Sketch.hllHash(col("user_id"))
      val rho = ev.select(hv.as("hv"))
        .select(Sketch.hllBucket(col("hv")).as("bucket"),
          Sketch.hllRank(col("hv")).as("r"))
      val regs = rho.groupBy("bucket").agg(max(col("r")).as("m"))
      val folded = regs.agg(
        count(lit(1)).as("n_buckets"),
        sum(Sketch.hllInv(col("m"))).as("s"),
        sum(when(col("m") >= Sketch.HllRankMax, 1).otherwise(0)).as("saturated"))
      val exact = ev.agg(countDistinct(col("user_id")).as("exact_distinct"))
      val hs = col("s") + (lit(Sketch.HllBuckets) - col("n_buckets"))
      val est = Sketch.hllEstimate(col("s"), col("n_buckets"))
      val zb = lit(Sketch.HllBuckets) - col("n_buckets")
      val cest = Sketch.hllCorrected(est, zb)
      folded.crossJoin(exact)
        .select(col("n_buckets").cast("long").as("n_buckets"),
          zb.cast("long").as("zero_buckets"),
          col("saturated").cast("long").as("saturated_buckets"),
          hs.as("harmonic_sum"),
          est.as("hll_estimate"),
          cest.as("hll_corrected"),
          col("exact_distinct").cast("long").as("exact_distinct"),
          (abs(est - col("exact_distinct")) / col("exact_distinct")).as("rel_err"),
          (abs(cest - col("exact_distinct")) / col("exact_distinct")).as("rel_err_corrected"))
    }
  }

  /** BLOOM-FILTER membership pruning, fully oracle-checked — the other
    * sketch a 100-TB join planner lives on: build a 2048-bit / 3-hash
    * Bloom filter over the purchase-user set, probe EVERY user through
    * it, and grade the verdicts against exact membership. In production
    * the filter prunes a huge probe side before an expensive join (rows
    * whose keys definitely-miss never shuffle); here the probe emits
    * per-user (bloom_maybe, actual, false_positive) so the oracle checks
    * the FILTER ITSELF bit-for-bit, not just the pruned result.
    *
    * Determinism: bit positions are md5-32 hashes ("b0:"/"b1:"/"b2:"
    * namespaces) mod 2048; the filter words build via BIT_OR of
    * `1 << (bit % 64)` masks (two's-complement longs — identical in both
    * engines; DuckDB refuses to shift INTO the sign bit, so position 63
    * is spelled as the Long.MinValue literal in the mirror); the probe is
    * a 3-way all-bits-set check. No floats anywhere.
    *
    * Shape at 100 TB: the filter is 32 (word_idx, word) rows REGARDLESS
    * of build-side size — a keyed BIT_OR aggregation with map-side
    * partials, then broadcast; the probe explodes each key to its 3
    * (word_idx, mask) probes, joins the broadcast words, and folds back
    * with a count-of-hits == 3 check: one narrow aggregation per probe
    * key, no shuffle of the probe side against the build side. */
  val bloomPrune: Q = {
    val M = 2048L // bits
    val K = 3 // hashes
    def bitSql(i: Int) =
      s"CAST(('0x' || substr(md5('b$i:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % $M"
    val probeUnion = (0 until K).map(i =>
      s"SELECT user_id, $i AS ki, ${bitSql(i)} AS bit FROM u").mkString("\n  UNION ALL\n  ")
    Q(
      "q_bloom_prune",
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
        |members AS (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |mbits AS (
        |  ${probeUnion.replace("FROM u", "FROM members")}),
        |words AS (
        |  SELECT bit // 64 AS word_idx, BIT_OR(CASE WHEN bit % 64 = 63
        |           THEN CAST(-9223372036854775808 AS BIGINT)
        |           ELSE 1::BIGINT << CAST(bit % 64 AS INTEGER) END) AS w
        |  FROM mbits GROUP BY bit // 64),
        |pbits AS (
        |  $probeUnion),
        |hits AS (
        |  SELECT p.user_id,
        |         SUM(CASE WHEN (w.w & (CASE WHEN p.bit % 64 = 63
        |                    THEN CAST(-9223372036854775808 AS BIGINT)
        |                    ELSE 1::BIGINT << CAST(p.bit % 64 AS INTEGER) END)) != 0
        |                  THEN 1 ELSE 0 END) AS n_hit
        |  FROM pbits p LEFT JOIN words w ON w.word_idx = p.bit // 64
        |  GROUP BY p.user_id)
        |SELECT h.user_id,
        |       h.n_hit = $K AS bloom_maybe,
        |       m.user_id IS NOT NULL AS actual_member,
        |       h.n_hit = $K AND m.user_id IS NULL AS false_positive
        |FROM hits h LEFT JOIN members m ON m.user_id = h.user_id
        |ORDER BY h.user_id""".stripMargin) { (s, dir) =>
      import graft.functions.Sketch
      val ev = t(s, dir, "events")
      val users = ev.select(col("user_id")).distinct()
      val members = ev.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      def bits(df: org.apache.spark.sql.DataFrame) =
        df.select(col("user_id"), Sketch.bloomBits(col("user_id")).as("bit"))
      val filterWords = bits(members)
        .select(Sketch.bloomWordIdx(col("bit")).as("word_idx"),
          Sketch.bloomMask(col("bit")).as("m"))
        .groupBy("word_idx").agg(bit_or(col("m")).as("w"))
      val hits = bits(users)
        .select(col("user_id"), Sketch.bloomWordIdx(col("bit")).as("word_idx"),
          Sketch.bloomMask(col("bit")).as("m"))
        .join(broadcast(filterWords), Seq("word_idx"), "left")
        .groupBy("user_id")
        .agg(sum(when(col("w").bitwiseAND(col("m")) =!= 0, 1).otherwise(0)).as("n_hit"))
      hits
        .join(members.withColumn("is_m", lit(true)), Seq("user_id"), "left")
        .select(col("user_id"),
          (col("n_hit") === K).as("bloom_maybe"),
          col("is_m").isNotNull.as("actual_member"),
          (col("n_hit") === K && col("is_m").isNull).as("false_positive"))
        .orderBy("user_id")
    }
  }

  val all: Seq[Q] =
    Seq(jsonExtract, windowTumbling, windowSliding, windowSession, eventFunnel,
      retentionCohorts, sessionTrajectories, hllDistinct, bloomPrune)
}
