package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.SurvivalQueries

/** Hand-computed Kaplan-Meier / Nelson-Aalen curves on a crafted event
  * timeline: censoring rule, cohort-by-first-event, at-risk reverse
  * cumulative, and the per-step ppm product. */
class SurvivalSpec extends SparkSpec {

  private def write(rows: Seq[Row]): String = {
    val d = Files.createTempDirectory("graft-surv").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private val base = java.time.Instant.parse("2024-01-01T12:00:00Z")
  private def day(i: Int) = Timestamp.from(base.plusSeconds(i * 86400L))

  test("KM curve: censoring rule, at-risk counts, ppm product, hazard") {
    // study span day 0..20 (max date = day 20; churn cut = day 13)
    val d = write(Seq(
      // cohort 'view' (first event type view, later clicks don't matter)
      Row(1L, 1L, day(0), "view", 1.0, "{}"),
      Row(2L, 1L, day(5), "click", 1.0, "{}"), // u1 churned, dur 5
      Row(3L, 2L, day(0), "view", 1.0, "{}"),
      Row(4L, 2L, day(5), "view", 1.0, "{}"), // u2 churned, dur 5
      Row(5L, 3L, day(0), "view", 1.0, "{}"),
      Row(6L, 3L, day(10), "view", 1.0, "{}"), // u3 churned, dur 10
      Row(7L, 4L, day(0), "view", 1.0, "{}"),
      Row(8L, 4L, day(20), "view", 1.0, "{}"), // u4 censored, dur 20
      Row(9L, 5L, day(2), "view", 1.0, "{}"),
      Row(10L, 5L, day(16), "view", 1.0, "{}"), // u5 censored, dur 18
      // cohort 'click'
      Row(11L, 6L, day(1), "click", 1.0, "{}"), // u6 churned, dur 0
      Row(12L, 7L, day(1), "click", 1.0, "{}"),
      Row(13L, 7L, day(19), "click", 1.0, "{}"))) // u7 censored, dur 19
    val r = SurvivalQueries.survivalKm.build(spark, d).collect()
      .map(x => (x.getString(0), x.getAs[Long]("duration_days")) ->
        (x.getAs[Long]("n_risk"), x.getAs[Long]("n_events"),
          x.getAs[Long]("n_censored"), x.getAs[Long]("survival_ppm"),
          x.getAs[Long]("hazard_cum_ppm"))).toMap
    assert(r.size == 6)
    // view: S(5) = 3/5, S(10) = 3/5 * 2/3, censored rows leave S unchanged
    assert(r(("view", 5L)) == ((5L, 2L, 0L, 600000L, 400000L)))
    assert(r(("view", 10L)) == ((3L, 1L, 0L, 400000L, 733333L)))
    assert(r(("view", 18L)) == ((2L, 0L, 1L, 400000L, 733333L)))
    assert(r(("view", 20L)) == ((1L, 0L, 1L, 400000L, 733333L)))
    // click: one of two churns immediately -> S(0) = 1/2
    assert(r(("click", 0L)) == ((2L, 1L, 0L, 500000L, 500000L)))
    assert(r(("click", 19L)) == ((1L, 0L, 1L, 500000L, 500000L)))
  }
}
