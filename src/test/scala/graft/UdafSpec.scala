package graft

import org.apache.spark.sql.functions.{col, udaf}
import graft.engine._

/** UDAF surface (S3 + §4.3): Aggregator registration for SQL, the catalog
  * registerAll path, and ordered-stream SIR stepping. */
class UdafSpec extends SparkSpec {
  import spark.implicits._

  test("registerAll exposes every testdata table to spark.sql (S3/S4)") {
    Tables.registerAll(spark, sf)
    val names = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Tables.testdataTables.toSet.subsetOf(names))
    // full SQL path over the registered views, including the nanos table
    val n = spark.sql(
      """SELECT COUNT(*) AS n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey""".stripMargin)
      .as[Long].head()
    assert(n > 0)
    assert(spark.sql("SELECT MAX(ts) FROM events").head().get(0) != null)
  }

  test("WeightedRatioAgg: slope via SQL-registered udaf matches Det form") {
    spark.udf.register("wratio", udaf(WeightedRatioAgg))
    Tables.registerAll(spark, sf)
    val viaUdaf = spark.sql(
      "SELECT wratio(l_quantity, l_extendedprice) FROM lineitem")
      .as[Double].head()
    val viaAgg = Tables.t(spark, sf, "lineitem")
      .agg(Estimators.slope(col("l_quantity"), col("l_extendedprice")))
      .as[Double].head()
    assert(math.abs(viaUdaf - viaAgg) <= 1e-9 * math.abs(viaAgg),
      s"udaf $viaUdaf vs agg $viaAgg")
  }

  test("SirStepAggregator: ordered reduction equals the driver fold") {
    val p = SirParams(0.02, 0.3, 0.1, 0.01)
    val nPop = 100000.0
    val agg = new SirStepAggregator(p, nPop)
    val series = Seq(
      SirSeriesRow(1L, 0, 100.0, 5.0, 1.0), SirSeriesRow(1L, 1, 0.0, 0.0, 0.0),
      SirSeriesRow(1L, 2, 0.0, 0.0, 0.0), SirSeriesRow(1L, 3, 0.0, 0.0, 0.0))
    val got = series.foldLeft(agg.zero)(agg.reduce)
    val want = Sir.simulate(p, nPop - 106.0, 100.0, 5.0, 1.0, nPop, 3).last
    assert(got == want)
    intercept[UnsupportedOperationException] {
      agg.merge(got, want)
    }
  }
}
