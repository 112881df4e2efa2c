package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.engine.{Covid, Dashboard}

/** §2.12 dashboard surface: every page entry point serves its frames, and
  * the K7/K8 trajectory matches a driver-side recomputation (quirk Q10:
  * global series, per-country population only). */
class DashboardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dayWise = Covid.dayWise(spark).cache()
  private val nlPop = 17134872.0
  private lazy val worldometer: DataFrame = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("Netherlands", "Europe", nlPop, 50000.0, 6000.0, 100.0, 44000.0))),
    Covid.worldometerSchema)

  test("overview: filtered series + tiles") {
    val (series, tiles) = Dashboard.overview(dayWise, worldometer,
      "2020-03-01", "2020-05-01")
    assert(series.count() == 62)
    assert(tiles == ((50000.0, 6000.0, 100.0)))
  }

  test("K7/K8 R0 trajectory matches driver recomputation (quirk Q10)") {
    val got = Dashboard.r0Trajectory(dayWise, worldometer, "Netherlands")
      .as[(java.sql.Date, Double)].collect().toSeq
    assert(got.size == 187) // first row skipped (diff)
    val raw = dayWise.orderBy("Date")
      .select($"Active".cast("double"), $"Recovered".cast("double"),
        $"Deaths".cast("double"))
      .as[(Double, Double, Double)].collect()
    val gamma = 1.0 / 4.5
    val want = (1 until raw.length).map { t =>
      val (i, r, d) = (raw(t)._1 / nlPop, raw(t)._2 / nlPop, raw(t)._3 / nlPop)
      val dd = d - raw(t - 1)._3 / nlPop
      val di = i - raw(t - 1)._1 / nlPop
      val sT = 1.0 - (i + r + d)
      val mu = dd / i
      ((di / i + mu + gamma) / sT) / gamma
    }
    got.map(_._2).lazyZip(want).foreach { (g, w) =>
      assert(math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w)), s"$g vs $w")
    }
  }

  test("sirComparison serves all three parameter sets") {
    (1 to 3).foreach { ps =>
      val (sim, mse) = Dashboard.sirComparison(dayWise, ps)
      assert(sim.length == 188)
      assert(Seq(mse._1, mse._2, mse._3, mse._4).forall(m => m > 0 && !m.isNaN))
    }
    // out-of-range selector fails descriptively, not with a MatchError
    val e = intercept[IllegalArgumentException](Dashboard.sirComparison(dayWise, 0))
    assert(e.getMessage.contains("paramSet"))
  }

  test("countryAnalysis maps USA to US") {
    val wrangled = Seq(
      ("US", java.sql.Date.valueOf("2020-03-02"), 10.0, 5.0, 3.0, 2.0),
      ("NL", java.sql.Date.valueOf("2020-03-02"), 1.0, 1.0, 0.0, 0.0))
      .toDF("country", "Date", "Confirmed", "Active", "Deaths", "Recovered")
    val usWm = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("US", "North America", 331000000.0, 1.0, 1.0, 1.0, 1.0))),
      Covid.worldometerSchema)
    val (fractions, series) = Dashboard.countryAnalysis(
      dayWise, usWm, wrangled, "USA", "2020-03-01", "2020-03-05")
    assert(series.count() == 1)
    assert(fractions.count() == 5)
  }
}
