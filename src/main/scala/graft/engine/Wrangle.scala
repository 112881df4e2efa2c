package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K12 — the reference's wrangling pipeline `process_country_complete`
  * (reference main.py:449-498), its data-engineering centerpiece, re-expressed
  * as one declarative per-key Spark plan.
  *
  * The reference runs the pipeline for ONE country at a time, re-reading and
  * re-wrangling the whole CSV per call, with per-row Python `apply` loops.
  * Here every stage is a column expression or window partitioned by the
  * entity key, so a single plan wrangles ALL entities in parallel — the same
  * code covers 187 countries or 100M device-series at 100 TB, with exactly
  * two shuffles (one for the (key, date) dedup aggregation, one for the
  * per-key windows).
  *
  * Stage order is semantic — single-missing fill runs BEFORE interpolation,
  * and the interpolation fill applies only to rows with >=2 missing among
  * Confirmed/Deaths/Recovered (main.py:481, 489):
  *
  *  1. A1  dedup: groupBy(key, date).max per measure (quirk Q4: max not sum,
  *          null-skipping, all-null group stays null)
  *  2. F4  leading all-null prefix drop: keep from the first date with ANY
  *          non-null measure (quirk Q3; interior all-null rows survive).
  *          An entity with no valid row at all is dropped entirely (the
  *          reference returns its raw frame and every caller then drops the
  *          all-null rows anyway — documented deviation).
  *  3. F3  conditional zero-fill: Confirmed == Active and Deaths/Recovered
  *          both null -> Deaths = Recovered = 0 (main.py:477-478)
  *  4. U1  single-missing fill: exactly one of the four null -> solve the
  *          invariant Confirmed = Active + Deaths + Recovered (main.py:421-433)
  *  5. W5  interpolation reference for Confirmed/Deaths/Recovered over the
  *          stage-4 frame (main.py:484-487), position-based per key
  *  6. U2  rows with >=2 missing among C/D/R take interpolated values for
  *          their missing C/D/R (main.py:435-446)
  *  7. C12 missing Active -> Confirmed - Deaths - Recovered (main.py:492-493;
  *          also subsumes fill_row_manual's trailing single-missing pass,
  *          which can only ever have Active left missing)
  *  8. F5  drop rows still missing any of the four (main.py:496)
  *
  * Requires simple (un-dotted) column names: key, date, and the four measures
  * `Confirmed`, `Active`, `Deaths`, `Recovered` (rename at the source scan —
  * see WrangleSpec for the covid CSV mapping).
  */
object Wrangle {
  private val Measures = Seq("Confirmed", "Active", "Deaths", "Recovered")
  private val Cdr = Seq("Confirmed", "Deaths", "Recovered")

  private def nullCount(cols: Seq[String]): Column =
    cols.map(c => when(col(c).isNull, 1).otherwise(0)).reduce(_ + _)

  def processComplete(raw: DataFrame, keyCol: String, dateCol: String): DataFrame = {
    val k = col(keyCol)
    val d = col(dateCol)

    // 1. A1 dedup across sub-entities (provinces): per-column max.
    val dedup = raw.groupBy(k, d).agg(
      max("Confirmed").as("Confirmed"), max("Active").as("Active"),
      max("Deaths").as("Deaths"), max("Recovered").as("Recovered"))

    // 2. F4 leading prefix drop: one per-key min aggregate window, then a
    // filter — no sort needed (min is order-insensitive).
    val anyValid = Measures.map(col(_).isNotNull).reduce(_ || _)
    val trimmed = dedup
      .withColumn("__first_valid",
        min(when(anyValid, d)).over(Window.partitionBy(k)))
      .filter(d >= col("__first_valid"))
      .drop("__first_valid")

    // 3. F3 conditional zero-fill. Spark's null-propagating === matches the
    // reference: pandas NaN == x is False, Spark null === x is null -> branch
    // not taken either way.
    val zCond = col("Confirmed") === col("Active") &&
      col("Deaths").isNull && col("Recovered").isNull
    val zeroed = trimmed
      .withColumn("__z", zCond)
      .withColumn("Deaths", when(col("__z"), 0.0).otherwise(col("Deaths")))
      .withColumn("Recovered", when(col("__z"), 0.0).otherwise(col("Recovered")))
      .drop("__z")

    // 4. U1 single-missing invariant fill: all four outputs computed
    // simultaneously from the pre-fill values (exactly one branch can fire
    // per row, so simultaneous == the reference's sequential elif chain).
    val singleFilled = {
      val one = nullCount(Measures) === 1
      zeroed.select(k, d,
        when(one && col("Confirmed").isNull,
          col("Active") + col("Deaths") + col("Recovered"))
          .otherwise(col("Confirmed")).as("Confirmed"),
        when(one && col("Active").isNull,
          col("Confirmed") - col("Deaths") - col("Recovered"))
          .otherwise(col("Active")).as("Active"),
        when(one && col("Deaths").isNull,
          col("Confirmed") - col("Active") - col("Recovered"))
          .otherwise(col("Deaths")).as("Deaths"),
        when(one && col("Recovered").isNull,
          col("Confirmed") - col("Active") - col("Deaths"))
          .otherwise(col("Recovered")).as("Recovered"))
    }

    // 5. W5 interpolation reference for C/D/R — one shared window pass.
    val interp = TimeSeries.interpolateLinearAll(
      singleFilled, Cdr, Seq(keyCol), Seq(d))

    // 6. U2 >=2-missing rows take interpolated C/D/R (the guard counts nulls
    // among C/D/R only, Active excluded — main.py:489).
    val geTwo = nullCount(Cdr) >= 2
    val filled = Cdr.foldLeft(interp.withColumn("__ge2", geTwo)) { (acc, c) =>
      acc.withColumn(c,
        when(col("__ge2"), coalesce(col(c), col(s"${c}_interp"))).otherwise(col(c)))
    }.drop("__ge2" +: Cdr.map(c => s"${c}_interp"): _*)

    // 7-8. C12 Active from the invariant, then F5 final null drop.
    filled
      .withColumn("Active",
        coalesce(col("Active"), col("Confirmed") - col("Deaths") - col("Recovered")))
      .na.drop(Measures)
  }
}
