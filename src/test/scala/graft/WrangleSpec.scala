package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.engine.{Covid, Wrangle}

/** K12 golden parity: the all-countries wrangling plan must reproduce the
  * reference's per-country `process_country_complete` outputs exactly
  * (FIXTURES.md §B — values recorded by executing reference main.py:449-498
  * on the shipped complete.csv). Also the first live consumer of the Covid
  * CSV loaders (S1/S2). */
class WrangleSpec extends SparkSpec {

  private lazy val wrangled: DataFrame = {
    val complete = Covid.complete(spark)
      .withColumnRenamed("Country.Region", "country")
      .select("country", "Date", "Confirmed", "Active", "Deaths", "Recovered")
    Wrangle.processComplete(complete, "country", "Date").cache()
  }

  private def rowsFor(country: String): Array[Row] =
    wrangled.filter(col("country") === country)
      .orderBy("Date").select("Date", "Confirmed", "Active", "Deaths", "Recovered")
      .collect()

  // (country, rows, first (C,A,D,R), last (C,A,D,R), sums (C,A,D,R))
  private val golden = Seq(
    ("Netherlands", 152, "2020-02-27", (1.0, 1.0, 0.0, 0.0),
      "2020-07-27", (53151.0, 47010.0, 6141.0, 102.0),
      (5144509.0, 4524181.0, 620328.0, 9662.0)),
    ("Belgium", 162, "2020-02-04", (1.0, 1.0, 0.0, 0.0),
      "2020-07-27", (66428.0, 39154.0, 9822.0, 17452.0),
      (6281103.0, 3689945.0, 963679.0, 1627479.0)),
    ("US", 188, "2020-01-22", (1.0, 1.0, 0.0, 0.0),
      "2020-07-27", (4290259.0, 2816444.0, 148011.0, 1325804.0),
      (224345948.0, 156981121.0, 11011411.0, 56353416.0)))

  private def cadr(r: Row): (Double, Double, Double, Double) =
    (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))

  golden.foreach { case (country, n, fd, fv, ld, lv, sums) =>
    test(s"K12 golden parity: $country") {
      val rows = rowsFor(country)
      assert(rows.length == n, s"row count for $country")
      assert(rows.head.getDate(0).toString == fd && cadr(rows.head) == fv,
        s"first row for $country: ${rows.head}")
      assert(rows.last.getDate(0).toString == ld && cadr(rows.last) == lv,
        s"last row for $country: ${rows.last}")
      // Sums with a 1e-6 guard: interior-run interpolation uses the direct
      // closed-form blend, which can differ from the reference's sequential
      // in-place fill by a couple of ulps (see TimeSeriesSpec).
      val Seq(sc, sa, sd, sr) =
        Seq[Row => Double](_.getDouble(1), _.getDouble(2), _.getDouble(3), _.getDouble(4))
          .map(f => rows.map(f).sum)
      assert(math.abs(sc - sums._1) < 1e-6, s"sum Confirmed $sc")
      assert(math.abs(sa - sums._2) < 1e-6, s"sum Active $sa")
      assert(math.abs(sd - sums._3) < 1e-6, s"sum Deaths $sd")
      assert(math.abs(sr - sums._4) < 1e-6, s"sum Recovered $sr")
    }
  }

  test("no nulls survive the pipeline, for any country") {
    val withNull = Seq("Confirmed", "Active", "Deaths", "Recovered")
      .map(c => col(c).isNull).reduce(_ || _)
    assert(wrangled.filter(withNull).isEmpty)
  }

  test("covid loaders read the reference CSVs (S1/S2)") {
    assert(Covid.dayWise(spark).count() == 188)
    val complete = Covid.complete(spark)
    assert(complete.count() == 49256)
    // literal NA tokens must become real nulls (S2)
    assert(complete.filter(col("Confirmed").isNull).count() == 10093)
    // country_wise is loaded-but-unused in the reference (quirk Q2) — the
    // catalog must still serve it
    assert(Covid.countryWise(spark).count() == 187)
  }
}
