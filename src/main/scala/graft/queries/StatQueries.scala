package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Det.{davg, dsum}
import graft.engine.Tables.t

/** Estimator-family queries (SURVEY §2.4 A5-A8, §2.11 K3/K4/K7/K8/K9) over
  * driver testdata. The covid-CSV golden parity lives in EstimatorsSpec; here
  * the same expressions run PER ENTITY (user) so the oracle can check them
  * and so the shape is the scale-out one: thousands of independent series
  * estimated in one pass, windows partitioned by user — never a global sort.
  */
object StatQueries {

  /** A5+A6/A7 — per-user mean-of-ratio estimator and closed-form
    * no-intercept least-squares slope sum(x*y)/sum(x^2) over the lag-diffed
    * daily series (reference main.py:63-104, testdata-shaped). */
  val estimatorSlopes: Q = Q(
    "q_estimator_slopes",
    """WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS a
      |  FROM events GROUP BY 1, 2),
      |diffed AS (
      |  SELECT user_id, day, a,
      |         a - LAG(a) OVER (PARTITION BY user_id ORDER BY day) AS da
      |  FROM daily)
      |SELECT user_id,
      |       CAST(SUM(CAST(da * a AS DECIMAL(38,6))) AS DOUBLE)
      |         / NULLIF(CAST(SUM(CAST(a * a AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS slope,
      |       CAST(SUM(CAST(FLOOR(da / NULLIF(a, 0.0) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
      |         / 1000000.0 / COUNT(da / NULLIF(a, 0.0)) AS ratio_mean_1e6
      |FROM diffed WHERE da IS NOT NULL
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    // NULLIF mirrors Spark's non-ANSI division, which returns NULL for ANY
    // zero divisor: without it a user whose daily total hits exactly 0
    // would diverge (DuckDB IEEE gives inf/NaN, then the FLOOR..BIGINT cast
    // errors the whole oracle query) — a latent gate-breaker even though
    // the current testdata never produces a zero daily sum.
    val daily = t(s, dir, "events")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(dsum(col("value")).as("a"))
    val w = Window.partitionBy("user_id").orderBy("day")
    // slope's products sit on the exact 4-dp grid (2-dp data), so the 6-dp
    // row quantization never rounds. The RATIO da/a is an arbitrary rational
    // though: it can land exactly ON a decimal-cast rounding boundary (e.g.
    // -1.8515625), where Spark (exact binary expansion) and DuckDB (shortest
    // decimal repr) round opposite ways — at ANY scale. So the ratio is
    // quantized with explicit IEEE ops instead: floor(x*1e6 + 0.5) is
    // bit-deterministic given identical input doubles, keeps the sum an
    // exact integer, and never touches either engine's decimal-cast
    // internals. (Half rounds toward +inf.) The quantization is part of the
    // column's CONTRACT, so the name carries it: `ratio_mean_1e6` is the
    // mean of per-row ratios each pre-rounded to the 1e-6 grid — up to
    // ~5e-7 from the unrounded mean — not an exact mean.
    daily
      .withColumn("da", col("a") - lag(col("a"), 1).over(w))
      .filter(col("da").isNotNull)
      .groupBy("user_id")
      .agg(
        (dsum(col("da") * col("a")) / dsum(col("a") * col("a"))).as("slope"),
        (sum(floor(col("da") / col("a") * 1000000.0 + 0.5)).cast("double")
          / 1000000.0 / count(col("da") / col("a"))).as("ratio_mean_1e6"))
      .orderBy("user_id")
  }

  /** K7/K8/K9 — per-entity time-varying SIR parameter estimation and R0
    * trajectory with the reference's epsilon clamps (C3 `greatest`,
    * main.py:550-556): synthetic compartments from the daily value series. */
  val r0Trajectory: Q = Q(
    "q_r0_trajectory",
    """WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS a
      |  FROM events GROUP BY 1, 2),
      |comp AS (
      |  SELECT user_id, day, a, a * 0.3 AS d, a * 0.2 AS r,
      |         1000000.0 - (a + a * 0.2 + a * 0.3) AS s
      |  FROM daily),
      |diffed AS (
      |  SELECT *,
      |         d - LAG(d) OVER w AS dd,
      |         r - LAG(r) OVER w AS dr,
      |         a - LAG(a) OVER w AS da
      |  FROM comp
      |  WINDOW w AS (PARTITION BY user_id ORDER BY day))
      |SELECT user_id, day,
      |       dd / GREATEST(a, 0.00001) AS mu_t,
      |       ((1.0 / 4.5) * a - dr) / GREATEST(dr, 0.00001) AS alpha_t,
      |       (da / GREATEST(a, 1.0) + dd / GREATEST(a, 0.00001) + (1.0 / 4.5))
      |         / GREATEST(s, 0.00001) AS beta_t,
      |       ((da / GREATEST(a, 1.0) + dd / GREATEST(a, 0.00001) + (1.0 / 4.5))
      |         / GREATEST(s, 0.00001)) / (1.0 / 4.5) AS r0
      |FROM diffed WHERE dd IS NOT NULL
      |ORDER BY user_id, day""".stripMargin) { (s, dir) =>
    val gamma = lit(1.0 / 4.5)
    val eps = lit(0.00001)
    val daily = t(s, dir, "events")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(dsum(col("value")).as("a"))
    val comp = daily.select(col("user_id"), col("day"), col("a"),
      (col("a") * 0.3).as("d"), (col("a") * 0.2).as("r"),
      (lit(1000000.0) - (col("a") + col("a") * 0.2 + col("a") * 0.3)).as("s"))
    val w = Window.partitionBy("user_id").orderBy("day")
    val diffed = comp
      .withColumn("dd", col("d") - lag(col("d"), 1).over(w))
      .withColumn("dr", col("r") - lag(col("r"), 1).over(w))
      .withColumn("da", col("a") - lag(col("a"), 1).over(w))
      .filter(col("dd").isNotNull)
    val muT = col("dd") / greatest(col("a"), eps)
    val betaT = (col("da") / greatest(col("a"), lit(1.0)) + muT + gamma) /
      greatest(col("s"), eps)
    diffed.select(col("user_id"), col("day"),
      muT.as("mu_t"),
      ((gamma * col("a") - col("dr")) / greatest(col("dr"), eps)).as("alpha_t"),
      betaT.as("beta_t"),
      (betaT / gamma).as("r0"))
      .orderBy("user_id", "day")
  }

  /** A8/K6 — MSE between two row-aligned series (main.py:142-146), per
    * entity: the positional alignment join runs inside each user partition
    * (parallel across users — the 100-TB-safe form of J2). */
  val mseAligned: Q = Q(
    "q_mse_aligned",
    """WITH a AS (
      |  SELECT user_id, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE event_type = 'click'),
      |b AS (
      |  SELECT user_id, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE event_type = 'purchase')
      |SELECT a.user_id,
      |       CAST(SUM(CAST((a.value - b.value) * (a.value - b.value)
      |                     AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mse,
      |       COUNT(*) AS n_aligned
      |FROM a JOIN b ON a.user_id = b.user_id AND a.rn = b.rn
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    def side(tpe: String, alias: String) =
      ev.filter(col("event_type") === tpe)
        .select(col("user_id"), col("value").as(alias),
          row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")).as("rn"))
    val diff = col("click") - col("purchase")
    side("click", "click")
      .join(side("purchase", "purchase"), Seq("user_id", "rn"))
      .groupBy("user_id")
      .agg((dsum(diff * diff) / count(lit(1))).as("mse"),
        count(lit(1)).as("n_aligned"))
      .orderBy("user_id")
  }

  val all: Seq[Q] = Seq(estimatorSlopes, r0Trajectory, mseAligned)
}
