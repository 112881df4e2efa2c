package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.12 — the dashboard surface: one parameterized entry point per
  * Streamlit page of the reference (main.py:768-943). Visualization itself
  * is out of engine scope; each function returns the DataFrame(s)/scalars
  * the page renders. Lazy plans — a serving layer caches the shared
  * upstream frames (the reference re-wrangles the whole CSV on every widget
  * interaction; Catalyst + `.cache()` make that free here).
  */
object Dashboard {

  /** Overview page: date-filtered global series (K1) + stat tiles (K17). */
  def overview(dayWise: DataFrame, worldometer: DataFrame,
      startDate: String, endDate: String): (DataFrame, (Double, Double, Double)) = {
    val series = dayWise
      .filter(col("Date").between(lit(startDate).cast("date"), lit(endDate).cast("date")))
      .select("Date", "Confirmed", "Deaths", "Recovered", "Active")
      .orderBy("Date")
    (series, Analytics.globalTiles(worldometer))
  }

  /** K7/K8 — R0 trajectory page (main.py:295-331). Quirk Q10 preserved: the
    * series is the GLOBAL day_wise regardless of country; the country enters
    * only through its population divisor (J1 scalar lookup). */
  def r0Trajectory(dayWise: DataFrame, worldometer: DataFrame,
      country: String): DataFrame = {
    val population = worldometer
      .filter(col("`Country.Region`") === country)
      .select("Population").head().getDouble(0)
    val gamma = 1.0 / 4.5
    val w = Window.partitionBy(TimeSeries.boundedGlobal(col("Date")): _*) // bounded global series (one row per day)
      .orderBy("Date")
    val norm = dayWise.select(col("Date"),
      (col("Deaths") / population).as("d"),
      (col("Recovered") / population).as("r"),
      (col("Active") / population).as("i"))
    val diffed = norm
      .withColumn("dd", col("d") - lag("d", 1).over(w))
      .withColumn("di", col("i") - lag("i", 1).over(w))
      .withColumn("s_t", lit(1.0) - (col("i") + col("r") + col("d")))
      .filter(col("dd").isNotNull) // skip first row (diff NaN)
    val muT = col("dd") / col("i")
    val betaT = (col("di") / col("i") + muT + lit(gamma)) / col("s_t")
    diffed.select(col("Date"), (betaT / lit(gamma)).as("R0")).orderBy("Date")
  }

  /** SIR parameter-comparison page: simulation + MSE for parameter set
    * 1 (constants), 2 (mean-of-ratio), or 3 (least squares). */
  def sirComparison(dayWise: DataFrame, paramSet: Int): (Vector[SirPoint], (Double, Double, Double, Double)) = {
    val n = Estimators.totalPopulation(dayWise)
    val p = paramSet match {
      case 1 => SirParams(Estimators.Params1("alpha"), Estimators.Params1("beta"),
        Estimators.Params1("gamma"), Estimators.Params1("mu"))
      case 2 => val m = Estimators.meanOfRatio(dayWise, n)
        SirParams(m("alpha"), m("beta"), m("gamma"), m("mu"))
      case 3 => val m = Estimators.leastSquares(dayWise, n)
        SirParams(m("alpha"), m("beta"), m("gamma"), m("mu"))
      case other =>
        throw new IllegalArgumentException(
          s"paramSet must be 1 (constants), 2 (mean-of-ratio), or 3 (least squares); got $other")
    }
    val steps = dayWise.count().toInt - 1
    val init = dayWise.orderBy("Date")
      .select(col("Active").cast("double"), col("Recovered").cast("double"),
        col("Deaths").cast("double")).head()
    val sim = Sir.simulate(p, Estimators.S0, init.getDouble(0), init.getDouble(1),
      init.getDouble(2), n, steps)
    (sim, Sir.mse(sim, Sir.actualFrame(dayWise, n)))
  }

  /** SIR fit-test page (K10/K11). */
  def sirFitTest(wrangled: DataFrame, paramCountry: String, simCountry: String,
      populations: Map[String, Double]): Sir.FitResult =
    Sir.fitTest(wrangled, "country", "Date", paramCountry, simCountry, populations)

  /** Country-analysis page: K18 fractions + the K12 wrangled series slice.
    * The dashboard's "USA" label maps to the data's "US" (main.py:884). */
  def countryAnalysis(dayWise: DataFrame, worldometer: DataFrame,
      wrangled: DataFrame, country: String, startDate: String,
      endDate: String): (DataFrame, DataFrame) = {
    val dataCountry = if (country == "USA") "US" else country
    val fractions = Analytics.cumulativeFractions(
      dayWise, worldometer, dataCountry, startDate, endDate)
    val series = wrangled.filter(col("country") === dataCountry)
      .filter(col("Date").between(lit(startDate).cast("date"), lit(endDate).cast("date")))
      .orderBy("Date")
    (fractions, series)
  }

  /** Global-insights page (K14). */
  def globalInsights(worldometer: DataFrame): DataFrame =
    Analytics.deathRateByContinent(worldometer)

  /** Counties-analysis page (K15 + K16). */
  def countiesAnalysis(usaCounty: DataFrame, county: String): (DataFrame, DataFrame, DataFrame) =
    (Analytics.topCounties(usaCounty, "Deaths"),
      Analytics.topCounties(usaCounty, "Confirmed"),
      Analytics.countySeries(usaCounty, county))
}
