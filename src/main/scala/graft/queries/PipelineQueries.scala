package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Det.dsum
import graft.engine.Tables.t
import graft.engine.{Sir, SirParams, SirSeriesRow, Wrangle}

/** Declared queries for the K12 wrangling pipeline (reference main.py:449-498)
  * over driver testdata, so the DuckDB oracle can exercise the composed
  * pipeline end-to-end (the covid-CSV parity lives in WrangleSpec goldens).
  *
  * Events are reshaped into covid-like per-(entity, day) measures with
  * deterministic null injection chosen to fire every stage: per-(uid, day)
  * modular rules guarantee whole-day nulls survive the dedup max (an
  * event_id-based rule would almost never null the whole group); day<=3 for
  * uid%5==0 creates leading all-null prefixes (F4); (uid+dk)%11 makes
  * Confirmed==Active so the conditional zero-fill (F3) can fire; overlapping
  * %5 rules create >=2-missing rows (the interpolation path, U2); %3 Active
  * nulls combined with a measure null produce rows the final na.drop (F5)
  * must remove. */
object PipelineQueries {

  /** The K12 WRANGLING PIPELINE end to end (null-count audit, group-max
    * dedup, conditional zero-fill, leading-prefix drop, interpolation,
    * invariant imputation, final subset drop — engine/Wrangle.scala) over
    * a deterministic events-derived frame whose planted nulls fire every
    * stage; the oracle replays the identical stage order in SQL. */
  val wrangle: Q = Q(
    "q_wrangle",
    """WITH ev AS (
      |  SELECT user_id AS uid, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         EXTRACT(day FROM ts) AS dk, value AS v
      |  FROM events),
      |raw AS (
      |  SELECT uid, day,
      |    CASE WHEN (dk <= 3 AND uid % 5 = 0) OR (uid + dk) % 7 = 0 THEN NULL
      |         WHEN (uid + dk) % 11 = 0 THEN v ELSE v * 2 END AS c,
      |    CASE WHEN (dk <= 3 AND uid % 5 = 0) OR (uid + dk) % 3 = 0 THEN NULL ELSE v END AS a,
      |    CASE WHEN (dk <= 3 AND uid % 5 = 0) OR (uid + dk) % 5 = 0 THEN NULL ELSE v * 0.3 END AS d,
      |    CASE WHEN (dk <= 3 AND uid % 5 = 0) OR (uid * 3 + dk) % 5 = 0 THEN NULL ELSE v * 0.2 END AS r
      |  FROM ev),
      |dedup AS (
      |  SELECT uid, day, MAX(c) AS c, MAX(a) AS a, MAX(d) AS d, MAX(r) AS r
      |  FROM raw GROUP BY uid, day),
      |trimmed AS (
      |  SELECT uid, day, c, a, d, r FROM (
      |    SELECT *, MIN(CASE WHEN c IS NOT NULL OR a IS NOT NULL OR d IS NOT NULL
      |                       OR r IS NOT NULL THEN day END)
      |              OVER (PARTITION BY uid) AS fv
      |    FROM dedup)
      |  WHERE day >= fv),
      |zeroed AS (
      |  SELECT uid, day, c, a,
      |    CASE WHEN c = a AND d IS NULL AND r IS NULL THEN 0.0 ELSE d END AS d,
      |    CASE WHEN c = a AND d IS NULL AND r IS NULL THEN 0.0 ELSE r END AS r
      |  FROM trimmed),
      |sfx AS (
      |  SELECT *, (CASE WHEN c IS NULL THEN 1 ELSE 0 END
      |           + CASE WHEN a IS NULL THEN 1 ELSE 0 END
      |           + CASE WHEN d IS NULL THEN 1 ELSE 0 END
      |           + CASE WHEN r IS NULL THEN 1 ELSE 0 END) AS nn
      |  FROM zeroed),
      |sf AS (
      |  SELECT uid, day,
      |    CASE WHEN nn = 1 AND c IS NULL THEN a + d + r ELSE c END AS c,
      |    CASE WHEN nn = 1 AND a IS NULL THEN c - d - r ELSE a END AS a,
      |    CASE WHEN nn = 1 AND d IS NULL THEN c - a - r ELSE d END AS d,
      |    CASE WHEN nn = 1 AND r IS NULL THEN c - a - d ELSE r END AS r
      |  FROM sfx),
      |num AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY uid ORDER BY day) AS rn FROM sf),
      |eff AS (
      |  SELECT *,
      |    CASE WHEN c IS NULL AND rn = 1 THEN 0.0 ELSE c END AS c_e,
      |    CASE WHEN d IS NULL AND rn = 1 THEN 0.0 ELSE d END AS d_e,
      |    CASE WHEN r IS NULL AND rn = 1 THEN 0.0 ELSE r END AS r_e
      |  FROM num),
      |ctx AS (
      |  SELECT *,
      |    LAST_VALUE(c_e IGNORE NULLS) OVER wb AS c_pv,
      |    MAX(CASE WHEN c_e IS NOT NULL THEN rn END) OVER wb AS c_pr,
      |    FIRST_VALUE(c IGNORE NULLS) OVER wf AS c_nv,
      |    MIN(CASE WHEN c IS NOT NULL THEN rn END) OVER wf AS c_nr,
      |    LAST_VALUE(d_e IGNORE NULLS) OVER wb AS d_pv,
      |    MAX(CASE WHEN d_e IS NOT NULL THEN rn END) OVER wb AS d_pr,
      |    FIRST_VALUE(d IGNORE NULLS) OVER wf AS d_nv,
      |    MIN(CASE WHEN d IS NOT NULL THEN rn END) OVER wf AS d_nr,
      |    LAST_VALUE(r_e IGNORE NULLS) OVER wb AS r_pv,
      |    MAX(CASE WHEN r_e IS NOT NULL THEN rn END) OVER wb AS r_pr,
      |    FIRST_VALUE(r IGNORE NULLS) OVER wf AS r_nv,
      |    MIN(CASE WHEN r IS NOT NULL THEN rn END) OVER wf AS r_nr
      |  FROM eff
      |  WINDOW wb AS (PARTITION BY uid ORDER BY rn
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wf AS (PARTITION BY uid ORDER BY rn
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      |interp AS (
      |  SELECT uid, day, c, a, d, r,
      |    CASE WHEN c IS NOT NULL THEN c WHEN c_nv IS NULL THEN c_pv
      |         ELSE c_pv + (c_nv - c_pv) * (CAST(rn - c_pr AS DOUBLE) / CAST(c_nr - c_pr AS DOUBLE)) END AS c_i,
      |    CASE WHEN d IS NOT NULL THEN d WHEN d_nv IS NULL THEN d_pv
      |         ELSE d_pv + (d_nv - d_pv) * (CAST(rn - d_pr AS DOUBLE) / CAST(d_nr - d_pr AS DOUBLE)) END AS d_i,
      |    CASE WHEN r IS NOT NULL THEN r WHEN r_nv IS NULL THEN r_pv
      |         ELSE r_pv + (r_nv - r_pv) * (CAST(rn - r_pr AS DOUBLE) / CAST(r_nr - r_pr AS DOUBLE)) END AS r_i
      |  FROM ctx),
      |f2 AS (
      |  SELECT uid, day, a,
      |    CASE WHEN cdr >= 2 THEN COALESCE(c, c_i) ELSE c END AS c,
      |    CASE WHEN cdr >= 2 THEN COALESCE(d, d_i) ELSE d END AS d,
      |    CASE WHEN cdr >= 2 THEN COALESCE(r, r_i) ELSE r END AS r
      |  FROM (SELECT *, (CASE WHEN c IS NULL THEN 1 ELSE 0 END
      |                 + CASE WHEN d IS NULL THEN 1 ELSE 0 END
      |                 + CASE WHEN r IS NULL THEN 1 ELSE 0 END) AS cdr FROM interp))
      |SELECT uid, day, c AS confirmed, COALESCE(a, c - d - r) AS active,
      |       d AS deaths, r AS recovered
      |FROM f2
      |WHERE c IS NOT NULL AND COALESCE(a, c - d - r) IS NOT NULL
      |  AND d IS NOT NULL AND r IS NOT NULL
      |ORDER BY uid, day""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val u = col("user_id")
    val dk = dayofmonth(col("ts"))
    val v = col("value")
    val allNull = dk <= 3 && u % 5 === 0
    val raw = ev.select(
      u.as("uid"),
      date_trunc("day", col("ts")).cast("date").as("day"),
      when(allNull || (u + dk) % 7 === 0, lit(null))
        .when((u + dk) % 11 === 0, v).otherwise(v * 2).as("Confirmed"),
      when(allNull || (u + dk) % 3 === 0, lit(null)).otherwise(v).as("Active"),
      when(allNull || (u + dk) % 5 === 0, lit(null)).otherwise(v * 0.3).as("Deaths"),
      when(allNull || (u * 3 + dk) % 5 === 0, lit(null)).otherwise(v * 0.2).as("Recovered"))
    Wrangle.processComplete(raw, "uid", "day")
      .select(col("uid"), col("day"),
        col("Confirmed").as("confirmed"), col("Active").as("active"),
        col("Deaths").as("deaths"), col("Recovered").as("recovered"))
      .orderBy("uid", "day")
  }

  /** U4/K5 scale-out — one SIR Euler recurrence per user over its daily
    * series (groupByKey.flatMapGroups; SURVEY §4.3). The coupled fold is not
    * a window/aggregate, but a DuckDB RECURSIVE CTE replays the identical
    * Euler steps in the identical operation order, so even this operator is
    * fully hash-checked (IEEE doubles are deterministic given the op
    * sequence). Golden parity for the fold itself additionally lives in
    * SirSpec against reference-derived constants. */
  val sirSimulate: Q = Q(
    "q_sir_simulate",
    """WITH RECURSIVE
      |daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS a
      |  FROM events GROUP BY 1, 2),
      |series AS (
      |  SELECT user_id AS key,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) - 1 AS INTEGER) AS step,
      |         a AS i, a * 0.2 AS r, a * 0.3 AS d
      |  FROM daily),
      |bounds AS (SELECT key, MAX(step) AS max_step FROM series GROUP BY key),
      |sim AS (
      |  SELECT s.key, CAST(0 AS INTEGER) AS step,
      |         1000000.0 - s.i - s.r - s.d AS s, s.i AS i, s.r AS r, s.d AS d,
      |         b.max_step AS max_step
      |  FROM series s JOIN bounds b ON s.key = b.key WHERE s.step = 0
      |  UNION ALL
      |  -- literals cast to DOUBLE: DuckDB folds bare decimal literals in
      |  -- DECIMAL arithmetic ((0.002 + 0.1) -> exact 0.102), which is 1 ulp
      |  -- off the double addition the Scala fold performs
      |  SELECT key, CAST(step + 1 AS INTEGER),
      |         s + (0.0111::DOUBLE * r - 0.25::DOUBLE * s * i / 1000000.0::DOUBLE),
      |         i + (0.25::DOUBLE * s * i / 1000000.0::DOUBLE - (0.002::DOUBLE + 0.1::DOUBLE) * i),
      |         r + (0.1::DOUBLE * i - 0.0111::DOUBLE * r),
      |         d + 0.002::DOUBLE * i,
      |         max_step
      |  FROM sim WHERE step < max_step)
      |SELECT key, step, s, i, r, d FROM sim
      |ORDER BY key, step""".stripMargin) { (s, dir) =>
    import s.implicits._
    val daily = t(s, dir, "events")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(dsum(col("value")).as("a"))
    val w = Window.partitionBy("user_id").orderBy("day")
    val series = daily.select(
      col("user_id").as("key"),
      (row_number().over(w) - 1).as("step"),
      col("a").as("i"), (col("a") * 0.2).as("r"), (col("a") * 0.3).as("d"))
      .as[SirSeriesRow]
    Sir.simulatePerKey(series, SirParams(0.0111, 0.25, 0.1, 0.002), 1000000.0)
      .toDF()
      .orderBy("key", "step")
  }

  val all: Seq[Q] = Seq(wrangle, sirSimulate)
}
