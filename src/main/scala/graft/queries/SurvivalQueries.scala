package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables.t

/** Fold input for the KM product: one duration row of one cohort's
  * at-risk timeline. */
final case class KmIn(cohort: String, dur: Long, d_n: Long, c_n: Long,
    n_risk: Long)

/** Fold output: the KM/Nelson-Aalen curve row. */
final case class KmOut(cohort: String, duration_days: Long, n_risk: Long,
    n_events: Long, n_censored: Long, survival_ppm: Long,
    hazard_cum_ppm: Long)

/** Survival analysis over the event stream — the churn/retention lens a
  * product analytics platform runs daily: how long do users stay active,
  * and does the answer differ by acquisition cohort?
  *
  * Observation model (declared, not inferred): a user ENTERS at the date
  * of their first event and is assigned to the cohort of that first
  * event's type (ties broken by (ts, event_id) — deterministic); a user
  * has CHURNED (the event) if their last activity is ≥ 7 days before the
  * global max date, at duration = last − first days; otherwise they are
  * CENSORED at study end, duration = max_date − first (the standard
  * right-censoring convention — still-active users contribute at-risk
  * time but no event).
  */
object SurvivalQueries {

  /** KAPLAN-MEIER SURVIVAL + NELSON-AALEN CUMULATIVE HAZARD per cohort:
    * at every distinct observed duration t, the at-risk count n_t
    * (reverse cumulative over the duration timeline), churn count d_t,
    * censored count c_t, the KM product-limit estimate
    * S(t) = Π_{u ≤ t} (n_u − d_u)/n_u and the Nelson-Aalen estimate
    * H(t) = Σ_{u ≤ t} d_u/n_u, both in exact ppm.
    *
    * Exactness: the product recurrence is S_t = S_{t−1}·(n_t − d_t) DIV
    * n_t seeded at 10⁶ — per-step ppm truncation (states and factors are
    * nonnegative, so truncate ≡ floor and both engines agree bit-for-bit,
    * the q_holt_forecast contract); the hazard is a per-term ⌊10⁶·d/n⌋
    * then an exact integer cumsum. Order-sensitive ⇒ the Spark side runs
    * the sanctioned PER-KEY SEQUENTIAL FOLD (groupByKey(cohort)
    * .flatMapGroups) over the CALENDAR-BOUNDED duration grid (durations
    * are day counts inside the study span — the grid is bounded by time,
    * not by users); the DuckDB oracle replays the identical recurrence as
    * a recursive CTE.
    *
    * Shape at 100 TB: one fact scan → per-user (first, last, first-type)
    * aggregation (ONE shuffle on user_id — the window for the cohort pick
    * and the min/max aggregate share it); then a duration-grid-sized
    * (cohorts × days) timeline whose reverse-cumulative window and fold
    * never touch fact rows again. */
  val survivalKm: Q = Q(
    "q_survival_km",
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d, event_type, ts, event_id
      |  FROM events),
      |mx AS (SELECT MAX(d) AS m FROM ev),
      |usr AS (
      |  SELECT user_id, MIN(d) AS first_d, MAX(d) AS last_d
      |  FROM ev GROUP BY user_id),
      |coh AS (
      |  SELECT user_id, event_type AS cohort
      |  FROM (SELECT user_id, event_type,
      |               ROW_NUMBER() OVER (PARTITION BY user_id
      |                                  ORDER BY ts, event_id) AS rn
      |        FROM ev) WHERE rn = 1),
      |obs AS (
      |  SELECT c.cohort,
      |         CASE WHEN u.last_d <= m.m - 7 THEN u.last_d - u.first_d
      |              ELSE m.m - u.first_d END AS dur,
      |         CASE WHEN u.last_d <= m.m - 7 THEN 1 ELSE 0 END AS churned
      |  FROM usr u JOIN coh c USING (user_id) CROSS JOIN mx m),
      |agg AS (
      |  SELECT cohort, dur, SUM(churned) AS d_n, SUM(1 - churned) AS c_n
      |  FROM obs GROUP BY 1, 2),
      |tl AS (
      |  SELECT cohort, dur, d_n, c_n,
      |         SUM(d_n + c_n) OVER (PARTITION BY cohort
      |                              ORDER BY dur DESC) AS n_risk,
      |         ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY dur) AS rn
      |  FROM agg),
      |km AS (
      |  SELECT cohort, rn, dur, d_n, c_n, n_risk,
      |         (1000000 * (n_risk - d_n)) // n_risk AS s,
      |         (1000000 * d_n) // n_risk AS h
      |  FROM tl WHERE rn = 1
      |  UNION ALL
      |  SELECT t.cohort, t.rn, t.dur, t.d_n, t.c_n, t.n_risk,
      |         (km.s * (t.n_risk - t.d_n)) // t.n_risk,
      |         km.h + (1000000 * t.d_n) // t.n_risk
      |  FROM km JOIN tl t ON t.cohort = km.cohort AND t.rn = km.rn + 1)
      |SELECT cohort, CAST(dur AS BIGINT) AS duration_days,
      |       CAST(n_risk AS BIGINT) AS n_risk,
      |       CAST(d_n AS BIGINT) AS n_events,
      |       CAST(c_n AS BIGINT) AS n_censored,
      |       CAST(s AS BIGINT) AS survival_ppm,
      |       CAST(h AS BIGINT) AS hazard_cum_ppm
      |FROM km ORDER BY cohort, duration_days""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"),
        col("ts"), col("event_id"))
    val mx = ev.agg(max(col("d")).as("m"))
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // ONE user-keyed shuffle carries both the cohort pick (first event's
    // type) and the first/last dates: window then aggregate on the same key
    val usr = ev
      .withColumn("rn", row_number().over(byUser))
      .groupBy("user_id")
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"),
        min(when(col("rn") === 1, col("event_type"))).as("cohort"))
    val obs = usr.crossJoin(broadcast(mx)) // 1-row study-end bound
      .select(col("cohort"),
        when(col("last_d") <= date_sub(col("m"), 7),
          datediff(col("last_d"), col("first_d")).cast("long"))
          .otherwise(datediff(col("m"), col("first_d")).cast("long"))
          .as("dur"),
        when(col("last_d") <= date_sub(col("m"), 7), 1L).otherwise(0L)
          .as("churned"))
    val agg = obs.groupBy("cohort", "dur")
      .agg(sum(col("churned")).as("d_n"),
        sum(lit(1L) - col("churned")).as("c_n"))
    val revCum = Window.partitionBy("cohort").orderBy(col("dur").desc)
    val tl = agg
      .withColumn("n_risk", sum(col("d_n") + col("c_n")).over(revCum))
      .as[KmIn]
    tl.groupByKey(_.cohort).flatMapGroups { (coh: String, it: Iterator[KmIn]) =>
      val rows = it.toArray.sortBy(_.dur) // calendar-bounded timeline
      var sv = 1000000L
      var h = 0L
      rows.iterator.map { r =>
        sv = sv * (r.n_risk - r.d_n) / r.n_risk
        h += 1000000L * r.d_n / r.n_risk
        KmOut(coh, r.dur, r.n_risk, r.d_n, r.c_n, sv, h)
      }
    }.toDF()
      .orderBy("cohort", "duration_days")
  }

  val all: Seq[Q] = Seq(survivalKm)
}
