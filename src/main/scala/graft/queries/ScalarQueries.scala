package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Det.{davg, dsum}
import graft.engine.Tables.t

/** Scalar-function pack (SURVEY §2.8 C2-C6/C10) composed into covid-kernel
  * analogues over testdata: half-even rounding (quirk Q7 — pandas `.round`
  * is banker's rounding, so `bround`, never `round`), whole-value string
  * replace with the reference's "Antartica" spelling (quirk Q8), `greatest`
  * clamps, exact powers, and `M/d/yy` date parsing (C5, two-digit years kept
  * in the 20xx pivot window both engines share). */
object ScalarQueries {

  /** K13 analogue (main.py:333-347): per-nation "active fraction" in the
    * EUROPE region, clamped numerator, banker's-rounded to 4 decimals. */
  val activeFraction: Q = Q(
    "q_active_fraction",
    """SELECT n.n_name,
      |       round_even(CAST(SUM(CAST(GREATEST(c.c_acctbal, 0.0) AS DECIMAL(38,6))) AS DOUBLE)
      |                  / COUNT(*), 4) AS active_fraction,
      |       COUNT(*) AS n_customers
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'EUROPE'
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .groupBy("n_name")
      .agg(
        bround(dsum(greatest(col("c_acctbal"), lit(0.0))) / count(lit(1)), 4)
          .as("active_fraction"),
        count(lit(1)).as("n_customers"))
      .orderBy("n_name")
  }

  /** K14 analogue (main.py:349-361): an empty-string group label is
    * whole-value-replaced with 'Antartica' (the reference's spelling), then
    * the mean of a per-row rate is taken per group. Also exercises exact
    * powers of two (C10) on an integer-derived exponent. */
  val deathRateByGroup: Q = Q(
    "q_death_rate_by_group",
    """WITH base AS (
      |  SELECT CASE WHEN event_type = 'click' THEN '' ELSE event_type END AS grp,
      |         (value * 0.3) / GREATEST(value, 1.0) AS rate,
      |         pow(2.0, CAST(FLOOR(value) AS BIGINT) % 7) AS scale
      |  FROM events)
      |SELECT CASE WHEN grp = '' THEN 'Antartica' ELSE grp END AS grp,
      |       CAST(SUM(CAST(rate AS DECIMAL(38,6))) AS DOUBLE) / COUNT(rate) AS avg_rate,
      |       CAST(SUM(CAST(rate * scale AS DECIMAL(38,6))) AS DOUBLE) AS scaled_total
      |FROM base
      |GROUP BY 1
      |ORDER BY grp""".stripMargin) { (s, dir) =>
    val base = t(s, dir, "events").select(
      when(col("event_type") === "click", "").otherwise(col("event_type")).as("grp"),
      ((col("value") * 0.3) / greatest(col("value"), lit(1.0))).as("rate"),
      pow(lit(2.0), floor(col("value")).cast("long") % 7).as("scale"))
    base
      .groupBy(when(col("grp") === "", "Antartica").otherwise(col("grp")).as("grp"))
      .agg(davg(col("rate")).as("avg_rate"),
        dsum(col("rate") * col("scale")).as("scaled_total"))
      .orderBy("grp")
  }

  /** K16 analogue (main.py:558-579): a county-style daily series whose dates
    * arrive as `M/d/yy` strings and are parsed back (C5); unparseable rows
    * coerce to null and drop (S5/C6). */
  val countySeries: Q = Q(
    "q_county_series",
    """WITH strs AS (
      |  SELECT strftime(ts, '%-m/%-d/%y') AS ds, user_id, value FROM events),
      |parsed AS (
      |  SELECT strptime(ds, '%-m/%-d/%y')::DATE AS day, user_id, value FROM strs)
      |SELECT day, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
      |FROM parsed
      |WHERE day IS NOT NULL
      |GROUP BY day
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val strs = t(s, dir, "events")
      .select(date_format(col("ts"), "M/d/yy").as("ds"), col("user_id"), col("value"))
    strs
      .select(to_date(col("ds"), "M/d/yy").as("day"), col("value"))
      .na.drop(Seq("day"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total"))
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(activeFraction, deathRateByGroup, countySeries)
}
