package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.engine.{Analytics, Covid}

/** K13-K18 kernels over covid-shaped fixtures. The worldometer/usa_county
  * tables are synthesized here (the reference's db is an absent LFS pointer;
  * FIXTURES.md §A4/§A5) with the edge rows the reference requires: an
  * empty-string Continent, a zero TotalCases (division blow-up, README
  * quirk), and duplicate county names across states. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def worldometer: DataFrame = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("Netherlands", "Europe", 17134872.0, 50000.0, 6000.0, 100.0, 44000.0),
      Row("Belgium", "Europe", 11589623.0, 66000.0, 9800.0, 17000.0, 39000.0),
      Row("US", "North America", 331000000.0, 4200000.0, 148000.0, 1300000.0, 2800000.0),
      Row("Mystery", "", 1000.0, 10.0, 1.0, 2.0, 7.0),     // empty continent -> Antartica
      Row("Ghostland", "Oceania", 5000.0, 0.0, 0.0, 0.0, 0.0) // zero TotalCases -> inf rate
    )), Covid.worldometerSchema)

  private def usaCounty: DataFrame = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("Hudson", "New Jersey", "1/22/20", 5L, 1L),
      Row("Hudson", "New Jersey", "1/23/20", 9L, 2L),
      Row("Hudson", "Texas", "1/22/20", 100L, 10L), // same county name, other state: merges
      Row("Bergen", "New Jersey", "1/22/20", 50L, 8L),
      Row("Kings", "New York", "1/23/20", 70L, 3L))),
    Covid.usaCountySchema)

  test("K13: Europe-only fractions, banker's-rounded") {
    val got = Analytics.activeFractionEurope(worldometer)
      .orderBy("country").as[(String, Double)].collect().toSeq
    assert(got == Seq(
      ("Belgium", math.rint(39000.0 / 11589623.0 * 1e4) / 1e4),
      ("Netherlands", 0.0026)))
  }

  test("K14: empty continent becomes Antartica; zero cases divide to infinity") {
    val got = Analytics.deathRateByContinent(worldometer)
      .as[(String, Double)].collect().toMap
    assert(got.keySet == Set("Antartica", "Europe", "North America", "Oceania"))
    assert(got("Antartica") == 0.1)
    assert(math.abs(got("Europe") -
      ((6000.0 / 50000.0) + (9800.0 / 66000.0)) / 2) < 1e-15)
    assert(got("Oceania").isNaN, "0.0/0.0 must propagate as NaN (quirk Q9)")
  }

  test("K15: county top-k merges duplicate names across states") {
    val got = Analytics.topCounties(usaCounty, by = "Deaths", k = 2)
      .as[(String, Long, Long)].collect().toSeq
    // Hudson NJ+TX merge: deaths 13, confirmed 114
    assert(got == Seq(("Hudson", 13L, 114L), ("Bergen", 8L, 50L)))
  }

  test("K16: county series parses M/d/yy and sorts") {
    val got = Analytics.countySeries(usaCounty, "Hudson")
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    assert(got.map(_._1.toString) == Seq("2020-01-22", "2020-01-22", "2020-01-23"))
  }

  test("K17: global tiles") {
    val (c, d, r) = Analytics.globalTiles(worldometer)
    assert(c == 4316010.0 && d == 163801.0 && r == 1317102.0)
  }

  test("K18: cumulative fractions over real day_wise (quirk Q5 semantics)") {
    val dayWise = Covid.dayWise(spark)
    val got = Analytics.cumulativeFractions(dayWise, worldometer,
      "Netherlands", "2020-01-22", "2020-01-31")
      .as[(java.sql.Date, Double, Double, Double)].collect().toSeq
    assert(got.size == 10)
    // independently recompute from the raw rows
    val raw = dayWise.filter(col("Date") <= lit("2020-01-31").cast("date"))
      .orderBy("Date").select("Active", "Deaths", "Recovered")
      .as[(Long, Long, Long)].collect().toSeq
    val pop = 17134872.0
    val expActive = raw.scanLeft(0L)(_ + _._1).drop(1).map(_ / pop)
    assert(got.map(_._2) == expActive)
    assert(got.last._1.toString == "2020-01-31")
  }
}
