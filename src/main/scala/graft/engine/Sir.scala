package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SIR model parameters (alpha = reinfection, beta = transmission,
  * gamma = recovery, mu = mortality — reference main.py:56-61). */
final case class SirParams(alpha: Double, beta: Double, gamma: Double, mu: Double)

/** One simulated day: compartment sizes after `step` Euler steps. */
final case class SirPoint(step: Int, s: Double, i: Double, r: Double, d: Double)

/** Per-entity observed series row (input to the scale-out simulation). */
final case class SirSeriesRow(key: Long, step: Int, i: Double, r: Double, d: Double)

/** Per-entity simulated row (output of the scale-out simulation). */
final case class SirSimRow(key: Long, step: Int, s: Double, i: Double, r: Double, d: Double)

/** U4/K5/K6/K10 — the reference's SIR Euler recurrence (main.py:108-129,
  * 180-215, 661-687) and MSE comparison (main.py:136-147).
  *
  * The recurrence is an order-N coupled nonlinear fold — not expressible as a
  * fixed-depth column expression or a standard window aggregate. Two honest
  * forms:
  *
  *   - [[simulate]] / [[simulateTimeVarying]]: a driver-side fold over a
  *     bounded series (the reference's case is 188 steps — collecting it is
  *     the right call, not a scale compromise);
  *   - [[simulatePerKey]]: `groupByKey(key).flatMapGroups` — ONE sequential
  *     fold per entity, all entities in parallel. At 100 TB the recurrence
  *     length per entity stays bounded (a few years of daily steps) while the
  *     entity count scales out across executors; this is the Spark-native
  *     shape for per-series state machines.
  *
  * Arithmetic is kept in the reference's exact operation order
  * (alpha*R - beta*S*I/N etc.) so results are bit-comparable to the golden
  * fixtures.
  */
object Sir {

  /** K5 — constant-parameter Euler simulation: `steps` steps from the given
    * initial compartments (main.py:108-129). Returns steps+1 points. */
  def simulate(p: SirParams, s0: Double, i0: Double, r0: Double, d0: Double,
      n: Double, steps: Int): Vector[SirPoint] = {
    val out = Vector.newBuilder[SirPoint]
    var (s, i, r, d) = (s0, i0, r0, d0)
    out += SirPoint(0, s, i, r, d)
    var t = 0
    while (t < steps) {
      val dS = p.alpha * r - p.beta * s * i / n
      val dI = p.beta * s * i / n - (p.mu + p.gamma) * i
      val dR = p.gamma * i - p.alpha * r
      val dD = p.mu * i
      s += dS; i += dI; r += dR; d += dD
      t += 1
      out += SirPoint(t, s, i, r, d)
    }
    out.result()
  }

  /** K10 — time-varying-parameter Euler simulation (main.py:661-687): step t
    * uses alpha(t), beta(t), mu(t) with a fixed gamma. */
  def simulateTimeVarying(alpha: IndexedSeq[Double], beta: IndexedSeq[Double],
      mu: IndexedSeq[Double], gamma: Double,
      s0: Double, i0: Double, r0: Double, d0: Double,
      n: Double, steps: Int): Vector[SirPoint] = {
    require(steps <= alpha.length && steps <= beta.length && steps <= mu.length)
    val out = Vector.newBuilder[SirPoint]
    var (s, i, r, d) = (s0, i0, r0, d0)
    out += SirPoint(0, s, i, r, d)
    var t = 0
    while (t < steps) {
      val dS = alpha(t) * r - beta(t) * s * i / n
      val dI = beta(t) * s * i / n - (mu(t) + gamma) * i
      val dR = gamma * i - alpha(t) * r
      val dD = mu(t) * i
      s += dS; i += dI; r += dR; d += dD
      t += 1
      out += SirPoint(t, s, i, r, d)
    }
    out.result()
  }

  /** Scale-out variant: one Euler fold per key. Initial conditions come from
    * each entity's first observed row (S = N - I - R - D, main.py:662-665);
    * the simulation runs for (series length - 1) steps. Entities are
    * independent — Spark distributes groups across executors; within a group
    * the rows are sorted by step in memory (bounded per-entity series). */
  def simulatePerKey(rows: Dataset[SirSeriesRow], p: SirParams, n: Double): Dataset[SirSimRow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key).flatMapGroups { (key, it) =>
      val series = it.toArray.sortBy(_.step)
      val h = series.head
      val s0 = n - h.i - h.r - h.d
      simulate(p, s0, h.i, h.r, h.d, n, series.length - 1)
        .map(pt => SirSimRow(key, pt.step, pt.s, pt.i, pt.r, pt.d))
    }
  }

  /** K6 — MSE between a simulated series and the actual frame
    * (main.py:136-147): positional alignment (J2) + avg of squared residuals
    * (A8). `actual` needs columns (step, s_real, i_real, r_real, d_real);
    * the simulated series is broadcast (bounded) and joined by step — the
    * actual side streams, nothing is collected. */
  def mse(sim: Seq[SirPoint], actual: DataFrame): (Double, Double, Double, Double) = {
    val spark = actual.sparkSession
    import spark.implicits._
    val simDf = sim.toDF()
    def sq(a: String, b: String) = (col(a) - col(b)) * (col(a) - col(b))
    val row = actual.join(broadcast(simDf), "step")
      .agg(
        avg(sq("s", "s_real")).as("mse_s"), avg(sq("i", "i_real")).as("mse_i"),
        avg(sq("r", "r_real")).as("mse_r"), avg(sq("d", "d_real")).as("mse_d"))
      .head()
    (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
  }

  /** K10 fit-test output: per-day estimated parameters from the param
    * entity plus the simulated finals for the sim entity. */
  final case class FitResult(nSteps: Int, alpha: Vector[Double],
      beta: Vector[Double], mu: Vector[Double], finals: SirPoint)

  /** K10 — cross-entity fit test (main.py:629-726): estimate time-varying
    * parameters from `paramKey`'s wrangled series
    * (estimates_country_complete, main.py:536-556, with its epsilon clamps),
    * then simulate `simKey` from ITS trailing slice's initial conditions.
    *
    * Quirk Q12 preserved: the actual series aligns by TRAILING slice while
    * parameter rows index from the START of the param series. Quirk Q9
    * preserved too: the reference's near-zero Recovered_change days produce
    * enormous alpha values and the simulation overflows to NaN — its README
    * (README.md:131-140) documents exactly this blow-up; we reproduce it
    * bit-for-bit rather than "fixing" the semantics.
    *
    * Series are collected per entity (bounded, same honesty as the driver
    * fold); for the all-entities form, the identical arithmetic runs
    * distributed in q_r0_trajectory. */
  def fitTest(wrangled: DataFrame, keyCol: String, dateCol: String,
      paramKey: String, simKey: String,
      populations: Map[String, Double]): FitResult = {
    val eps = 0.00001
    val gamma = 1.0 / 4.5
    def series(key: String): Array[(Double, Double, Double, Double)] =
      wrangled.filter(col(keyCol) === key).orderBy(dateCol)
        .select(col("Confirmed").cast("double"), col("Active").cast("double"),
          col("Deaths").cast("double"), col("Recovered").cast("double"))
        .collect()
        .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))

    val p = series(paramKey)
    val popP = populations(paramKey)
    // elementwise, indices 1..len-1 (pandas .diff().iloc[1:])
    val (alphaT, betaT, muT) = {
      val a = Vector.newBuilder[Double]; val b = Vector.newBuilder[Double]
      val m = Vector.newBuilder[Double]
      var i = 1
      while (i < p.length) {
        val (_, act, dth, rec) = p(i)
        val dA = act - p(i - 1)._2
        val dD = dth - p(i - 1)._3
        val dR = rec - p(i - 1)._4
        val sT = popP - (act + rec + dth)
        val mu = dD / math.max(act, eps)
        a += (gamma * act - dR) / math.max(dR, eps)
        b += (dA / math.max(act, 1.0) + mu + gamma) / math.max(sT, eps)
        m += mu
        i += 1
      }
      (a.result(), b.result(), m.result())
    }

    val actual = series(simKey)
    val nSteps = math.min(alphaT.length, actual.length - 1)
    val tail = actual.drop(actual.length - (nSteps + 1))
    val (_, i0, d0, r0) = tail.head
    val nSim = populations(simKey)
    val sim = simulateTimeVarying(alphaT, betaT, muT, gamma,
      nSim - i0 - r0 - d0, i0, r0, d0, nSim, nSteps)
    FitResult(nSteps, alphaT, betaT, muT, sim.last)
  }

  /** Actual-series frame for [[mse]] from a day_wise-shaped table: 0-based
    * step by date order, S_real = N - Active - Recovered - Deaths
    * (main.py:149-154). */
  def actualFrame(dayWise: DataFrame, n: Double): DataFrame = {
    val w = Window.partitionBy(TimeSeries.boundedGlobal(col("Date")): _*) // bounded global series (one row per day)
      .orderBy("Date")
    dayWise.select(
      (row_number().over(w) - 1).as("step"),
      (lit(n) - col("Active") - col("Recovered") - col("Deaths"))
        .cast("double").as("s_real"),
      col("Active").cast("double").as("i_real"),
      col("Recovered").cast("double").as("r_real"),
      col("Deaths").cast("double").as("d_real"))
  }
}
