package graft

import org.apache.spark.sql.functions.col
import graft.engine._

/** U4/K5/K6 golden parity: constants recorded by executing the reference's
  * Euler + MSE logic (main.py:49-163) on the shipped day_wise.csv. The fold
  * keeps the reference's float operation order, so constant-parameter finals
  * match EXACTLY; MSEs allow 1e-9 relative slack (numpy means use pairwise
  * summation, Spark's avg is sequential). */
class SirSpec extends SparkSpec {

  private lazy val dayWise = Covid.dayWise(spark)
  private lazy val n = Estimators.totalPopulation(dayWise) // 17,000,555
  private val steps = 187 // 188 days -> 187 Euler steps
  private val init = (17000000.0, 510.0, 28.0, 17.0) // S0, I0, R0, D0

  private def relNear(got: Double, want: Double, tol: Double, what: String): Unit =
    assert(math.abs(got - want) <= tol * math.max(1.0, math.abs(want)),
      s"$what: got $got want $want")

  test("K5 exact finals, parameter set 1 (CDC constants)") {
    val p = SirParams(alpha = 0.0111, beta = 0.25, gamma = 0.1, mu = 0.002)
    val sim = Sir.simulate(p, init._1, init._2, init._3, init._4, n, steps)
    assert(sim.length == 188)
    val f = sim.last
    assert(f.s == 8047703.201261873 && f.i == 649194.6362178561 &&
      f.r == 7898583.018660043 && f.d == 405074.1438602228, s"finals $f")
  }

  test("K5+K6 golden MSEs for all three parameter sets") {
    val p2m = Estimators.meanOfRatio(dayWise, n)
    val p3m = Estimators.leastSquares(dayWise, n)
    val actual = Sir.actualFrame(dayWise, n).cache()
    val cases = Seq(
      (SirParams(0.0111, 0.25, 0.1, 0.002), 1e-9,
        (2.963538625447419e13, 6.858011902545495e12, 2.9970320030925312e13, 6.9840112543428335e9)),
      (SirParams(p2m("alpha"), p2m("beta"), p2m("gamma"), p2m("mu")), 1e-8,
        (6.309228834499975e12, 7.273695613675474e12, 2.401113049778212e12, 2.709309924933533e11)),
      (SirParams(p3m("alpha"), p3m("beta"), p3m("gamma"), p3m("mu")), 1e-8,
        (2.7391547481180293e13, 4.773392642670541e12, 8.161729439431795e12, 8.782098571725003e10)))
    cases.zipWithIndex.foreach { case ((p, tol, (ms, mi, mr, md)), idx) =>
      val sim = Sir.simulate(p, init._1, init._2, init._3, init._4, n, steps)
      val (gs, gi, gr, gd) = Sir.mse(sim, actual)
      relNear(gs, ms, tol, s"p${idx + 1} mse_S")
      relNear(gi, mi, tol, s"p${idx + 1} mse_I")
      relNear(gr, mr, tol, s"p${idx + 1} mse_R")
      relNear(gd, md, tol, s"p${idx + 1} mse_D")
    }
  }

  test("K10 time-varying params reduce to K5 when constant") {
    val p = SirParams(0.0111, 0.25, 0.1, 0.002)
    val const = Sir.simulate(p, init._1, init._2, init._3, init._4, n, 50)
    val tv = Sir.simulateTimeVarying(
      Vector.fill(50)(p.alpha), Vector.fill(50)(p.beta), Vector.fill(50)(p.mu),
      p.gamma, init._1, init._2, init._3, init._4, n, 50)
    assert(const == tv)
  }

  test("K10 fit test golden: params exact, blow-up reproduced (quirk Q9/Q12)") {
    // Golden values from executing reference main.py:536-556 + 629-726 on the
    // shipped complete.csv with synthesized populations (the reference's db
    // is an absent LFS pointer; FIXTURES.md §A4). The reference's own fit
    // test overflows to NaN — its README documents the blow-up
    // (README.md:131-140); parity means reproducing it, not fixing it.
    val pops = Map("Netherlands" -> 17134872.0, "Belgium" -> 11589623.0)
    val wrangled = {
      val complete = Covid.complete(spark)
        .withColumnRenamed("Country.Region", "country")
        .select("country", "Date", "Confirmed", "Active", "Deaths", "Recovered")
      Wrangle.processComplete(complete, "country", "Date")
    }
    val r = Sir.fitTest(wrangled, "country", "Date", "Netherlands", "Belgium", pops)
    assert(r.nSteps == 151)
    assert(r.alpha.take(3) == Vector(22222.22222222222, 133333.3333333333, 222222.22222222222),
      s"alpha head ${r.alpha.take(3)}")
    assert(r.beta.take(3) == Vector(1.296900468186905e-8, 6.160279021473268e-8, 3.6313232182565706e-8),
      s"beta head ${r.beta.take(3)}")
    assert(r.mu.take(3) == Vector(0.0, 0.0, 0.0))
    assert(r.finals.s.isNaN && r.finals.i.isNaN && r.finals.r.isNaN && r.finals.d.isNaN,
      s"reference blow-up must reproduce: ${r.finals}")

    val r2 = Sir.fitTest(wrangled, "country", "Date", "Belgium", "Netherlands", pops)
    assert(r2.nSteps == 151)
    assert(r2.alpha.head == 22222.22222222222 && r2.beta.head == 1.9174242457797347e-8)
  }

  test("simulatePerKey matches the driver fold per entity") {
    import spark.implicits._
    val p = SirParams(0.02, 0.3, 0.1, 0.01)
    val nPop = 100000.0
    // two entities with different series lengths and initial conditions
    val rows = Seq(
      SirSeriesRow(1L, 0, 100.0, 5.0, 1.0), SirSeriesRow(1L, 1, 120.0, 6.0, 1.0),
      SirSeriesRow(1L, 2, 140.0, 8.0, 2.0),
      SirSeriesRow(2L, 0, 10.0, 0.0, 0.0), SirSeriesRow(2L, 1, 12.0, 1.0, 0.0))
    val got = Sir.simulatePerKey(rows.toDS(), p, nPop)
      .collect().sortBy(r => (r.key, r.step))
    Seq((1L, 100.0, 5.0, 1.0, 3), (2L, 10.0, 0.0, 0.0, 2)).foreach {
      case (key, i0, r0, d0, len) =>
        val expect = Sir.simulate(p, nPop - i0 - r0 - d0, i0, r0, d0, nPop, len - 1)
          .map(pt => SirSimRow(key, pt.step, pt.s, pt.i, pt.r, pt.d))
        assert(got.filter(_.key == key).toSeq == expect, s"key $key")
    }
  }
}
