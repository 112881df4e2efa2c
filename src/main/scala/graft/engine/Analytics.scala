package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K13-K18 — the reference's Part-3 analytics kernels (main.py:248-385,
  * 558-579, 784-792) over covid-shaped tables. The worldometer and
  * usa_county tables exist only as fixtures (the reference's SQLite db is an
  * absent git-LFS pointer — SURVEY §0); schemas in [[Covid]], synthesized
  * rows in AnalyticsSpec.
  *
  * Testdata-shaped oracle-checked twins of these kernels live in
  * ScalarQueries/WindowQueries (q_active_fraction, q_death_rate_by_group,
  * q_county_series, q_cum_fraction, q_topk_revenue); these functions are the
  * covid-surface API a reference user would call.
  */
object Analytics {

  /** K13 (main.py:333-347): Europe active-case fraction per country,
    * banker's-rounded to 4 decimals (quirk Q7). */
  def activeFractionEurope(worldometer: DataFrame): DataFrame =
    worldometer
      .filter(col("Continent") === "Europe")
      .select(col("`Country.Region`").as("country"),
        bround(col("ActiveCases") / col("Population"), 4).as("ActiveFraction"))

  /** K14 (main.py:349-361): average death rate by continent, empty-string
    * continent whole-value-replaced with "Antartica" (quirk Q8 — the
    * reference's spelling). */
  def deathRateByContinent(worldometer: DataFrame): DataFrame =
    worldometer
      .withColumn("Continent",
        when(col("Continent") === "", "Antartica").otherwise(col("Continent")))
      .withColumn("DeathRate", Det.pdiv(col("TotalDeaths"), col("TotalCases")))
      .groupBy("Continent")
      .agg(avg("DeathRate").as("DeathRate"))
      .orderBy("Continent")

  /** K15 (main.py:363-385): top-k counties by a summed measure —
    * TakeOrderedAndProject, no full sort. Duplicate county names across
    * states merge (reference semantics: groupby Admin2 only). */
  def topCounties(usaCounty: DataFrame, by: String, k: Int = 5): DataFrame =
    usaCounty
      .groupBy("Admin2")
      .agg(sum("Deaths").as("Deaths"), sum("Confirmed").as("Confirmed"))
      .orderBy(desc(by), asc("Admin2"))
      .limit(k)

  /** K16 (main.py:558-579): one county's daily series, dates parsed from
    * `M/d/yy` strings (C5), sorted. */
  def countySeries(usaCounty: DataFrame, county: String): DataFrame =
    usaCounty
      .filter(col("Admin2") === county)
      .withColumn("Date", to_date(col("Date"), "M/d/yy"))
      .select("Date", "Confirmed", "Deaths")
      .orderBy("Date")

  /** K17 (main.py:784-792): global stat tiles. */
  def globalTiles(worldometer: DataFrame): (Double, Double, Double) = {
    val r = worldometer.agg(
      sum("TotalCases"), sum("TotalDeaths"), sum("TotalRecovered")).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  /** K18 (main.py:248-293): cumulative fractions of a country's population
    * over a date range. Quirk Q5 preserved: the cumsum runs over columns
    * that are ALREADY cumulative levels — mathematically dubious but it is
    * the reference's semantics. Population comes from the scalar-lookup
    * join J1 (worldometer filtered by country, first row). */
  def cumulativeFractions(dayWise: DataFrame, worldometer: DataFrame,
      country: String, startDate: String, endDate: String): DataFrame = {
    val pop = worldometer
      .filter(col("`Country.Region`") === country)
      .select("Population").head().getDouble(0)
    val w = Window.partitionBy(TimeSeries.boundedGlobal(col("Date")): _*) // bounded global series (one row per day)
      .orderBy("Date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dayWise
      .filter(col("Date").between(lit(startDate).cast("date"), lit(endDate).cast("date")))
      .select(col("Date"),
        (sum("Active").over(w) / pop).as("Active_fraction"),
        (sum("Deaths").over(w) / pop).as("Deaths_fraction"),
        (sum("Recovered").over(w) / pop).as("Recovered_fraction"))
      .orderBy("Date")
  }
}
