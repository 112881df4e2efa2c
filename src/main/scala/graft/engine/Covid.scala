package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Sources + schemas for the reference's covid tables (SURVEY.md §1).
  *
  * Explicit StructTypes (schema-on-read like the reference, but deterministic
  * — no inferSchema pass), `nullValue = "NA"` for complete.csv's literal NA
  * tokens (reference main.py:450 relies on pandas turning them into NaN), and
  * date columns parsed at scan. Column names keep the reference's dots,
  * spaces and slashes (backticked where referenced).
  */
object Covid {

  /** day_wise.csv (reference main.py:18) — 188 rows, one per day, no nulls. */
  val dayWiseSchema: StructType = StructType(Seq(
    StructField("Date", DateType, nullable = false),
    StructField("Confirmed", LongType),
    StructField("Deaths", LongType),
    StructField("Recovered", LongType),
    StructField("Active", LongType),
    StructField("New cases", LongType),
    StructField("New deaths", LongType),
    StructField("New recovered", LongType),
    StructField("Deaths / 100 Cases", DoubleType),
    StructField("Recovered / 100 Cases", DoubleType),
    StructField("Deaths / 100 Recovered", DoubleType),
    StructField("No. of countries", LongType)))

  /** complete.csv (reference main.py:450) — counts are nullable doubles
    * because of the literal `NA` tokens. */
  val completeSchema: StructType = StructType(Seq(
    StructField("Province.State", StringType),
    StructField("Country.Region", StringType),
    StructField("Lat", DoubleType),
    StructField("Long", DoubleType),
    StructField("Date", DateType),
    StructField("Confirmed", DoubleType),
    StructField("Deaths", DoubleType),
    StructField("Recovered", DoubleType),
    StructField("Active", DoubleType),
    StructField("WHO.Region", StringType)))

  /** country_wise.csv (db mirror; loaded-but-unused in the reference —
    * quirk Q2 — kept for catalog completeness). */
  val countryWiseSchema: StructType = StructType(Seq(
    StructField("Country.Region", StringType),
    StructField("Confirmed", LongType),
    StructField("Deaths", LongType),
    StructField("Recovered", LongType),
    StructField("Active", LongType),
    StructField("New.cases", LongType),
    StructField("New.deaths", LongType),
    StructField("New.recovered", LongType),
    StructField("Deaths...100.Cases", DoubleType),
    StructField("Recovered...100.Cases", DoubleType),
    StructField("Deaths...100.Recovered", DoubleType),
    StructField("Confirmed.last.week", LongType),
    StructField("X1.week.change", LongType),
    StructField("X1.week...increase", DoubleType),
    StructField("WHO.Region", StringType)))

  /** worldometer_data (db table; db absent — LFS pointer). Columns the
    * reference touches: main.py:249, 253, 334-335, 350-351, 787-789. */
  val worldometerSchema: StructType = StructType(Seq(
    StructField("Country.Region", StringType),
    StructField("Continent", StringType),
    StructField("Population", DoubleType),
    StructField("TotalCases", DoubleType),
    StructField("TotalDeaths", DoubleType),
    StructField("TotalRecovered", DoubleType),
    StructField("ActiveCases", DoubleType)))

  /** usa_county_wise (db table; db absent). Reference main.py:364, 559-561.
    * Date is a raw string in `%m/%d/%y`, parsed on use (C5). */
  val usaCountySchema: StructType = StructType(Seq(
    StructField("Admin2", StringType),
    StructField("Province_State", StringType),
    StructField("Date", StringType),
    StructField("Confirmed", LongType),
    StructField("Deaths", LongType)))

  private def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "NA")
      .schema(schema)
      .csv(path)

  def dayWise(spark: SparkSession, dir: String = "/root/reference"): DataFrame =
    csv(spark, s"$dir/day_wise.csv", dayWiseSchema)

  def complete(spark: SparkSession, dir: String = "/root/reference"): DataFrame =
    csv(spark, s"$dir/complete.csv", completeSchema)

  def countryWise(spark: SparkSession, dir: String = "/root/reference"): DataFrame =
    csv(spark, s"$dir/country_wise.csv", countryWiseSchema)
}
