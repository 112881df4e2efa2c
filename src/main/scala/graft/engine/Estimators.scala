package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K2-K4 — the reference's SIR parameter estimators (main.py:56-104), as
  * single-pass Spark aggregates.
  *
  * The reference computes these with pandas series arithmetic + statsmodels
  * OLS; both estimator families reduce to plain aggregates over the lag-diff
  * projection (W1):
  *
  *   - set 2 (K3, main.py:63-73): means of elementwise ratios
  *   - set 3 (K4, main.py:76-104): no-intercept least squares, whose closed
  *     form is sum(x*y)/sum(x*x) — statsmodels OLS on one regressor without
  *     constant is exactly this ratio, so no ML library is needed
  *
  * day_wise is ONE bounded global series (188 calendar days), so the lag
  * window is intentionally unpartitioned — the single-partition sort is
  * bounded by the calendar, not data size. For per-entity estimation at
  * scale, the same expressions run per key (see q_estimator_slopes /
  * q_r0_trajectory, which partition by user).
  */
object Estimators {

  /** Constants from the reference (K2, main.py:56-61 + 49-53). */
  val Params1: Map[String, Double] =
    Map("alpha" -> 0.0111, "beta" -> 0.25, "gamma" -> 0.1, "mu" -> 0.002)
  val S0: Double = 17000000.0

  /** Lag-diff projection shared by both estimator sets: day-over-day deltas
    * of Deaths/Recovered/Active plus S = N - Active - Recovered - Deaths,
    * first row dropped (pandas `.diff().iloc[1:]`). */
  private def diffed(dayWise: DataFrame, n: Double): DataFrame = {
    val w = Window.partitionBy(TimeSeries.boundedGlobal(col("Date")): _*).orderBy("Date")
    def d(c: String, as: String) = (col(c) - lag(col(c), 1).over(w)).as(as)
    dayWise
      .select(col("Date"),
        col("Active").cast("double").as("I"),
        col("Recovered").cast("double").as("R"),
        col("Deaths").cast("double").as("D"))
      .withColumn("S", lit(n) - col("I") - col("R") - col("D"))
      .select(col("*"), d("D", "dDeaths"), d("R", "dRecovered"), d("I", "dActive"))
      .filter(col("dDeaths").isNotNull)
  }

  /** K3 — parameter set 2, mean-of-ratio estimators (main.py:63-73).
    * Two aggregation passes: alpha/beta need the mu/gamma scalars. */
  def meanOfRatio(dayWise: DataFrame, n: Double): Map[String, Double] = {
    val df = diffed(dayWise, n)
    val first = df.agg(
      avg(col("dDeaths") / col("I")).as("mu"),
      avg(col("dRecovered") / col("I")).as("gamma")).head()
    val (mu, gamma) = (first.getDouble(0), first.getDouble(1))
    val second = df.agg(
      avg((lit(gamma) * col("I") - col("dRecovered")) / col("R")).as("alpha"),
      avg((lit(n) / col("S")) *
        (col("dActive") / col("I") + lit(mu) + lit(gamma))).as("beta")).head()
    Map("alpha" -> second.getDouble(0), "beta" -> second.getDouble(1),
      "gamma" -> gamma, "mu" -> mu)
  }

  /** Closed-form no-intercept least squares: sum(x*y)/sum(x*x) (A6/A7). */
  def slope(x: Column, y: Column): Column = sum(x * y) / sum(x * x)

  /** K4 — parameter set 3, OLS / least-squares estimators (main.py:76-104).
    * Again two passes: alpha/beta regress on residuals of mu/gamma. */
  def leastSquares(dayWise: DataFrame, n: Double): Map[String, Double] = {
    val df = diffed(dayWise, n)
    val first = df.agg(
      slope(col("I"), col("dDeaths")).as("mu"),
      slope(col("I"), col("dRecovered")).as("gamma")).head()
    val (mu, gamma) = (first.getDouble(0), first.getDouble(1))
    val second = df.agg(
      // alpha: sum(R * (gamma*I - dR)) / sum(R^2)  (main.py:99)
      (sum(col("R") * (lit(gamma) * col("I") - col("dRecovered"))) /
        sum(pow(col("R"), 2))).as("alpha"),
      // beta: predictor = S*I/N, response = dI + (mu+gamma)*I (main.py:100-103)
      slope(col("S") * col("I") / lit(n),
        col("dActive") + lit(mu + gamma) * col("I")).as("beta")).head()
    Map("alpha" -> second.getDouble(0), "beta" -> second.getDouble(1),
      "gamma" -> gamma, "mu" -> mu)
  }

  /** N as the reference derives it: S0 + first-day (Active, Recovered,
    * Deaths) (main.py:49-53, W3 first-row extraction). */
  def totalPopulation(dayWise: DataFrame): Double = {
    val r = dayWise.orderBy("Date")
      .select(col("Active").cast("double"), col("Recovered").cast("double"),
        col("Deaths").cast("double"))
      .head()
    S0 + r.getDouble(0) + r.getDouble(1) + r.getDouble(2)
  }
}
