package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.RankQueries

/** Hand-computed fixtures for the rank/robust-statistics wave: mid-rank
  * Spearman under ties, Kendall concordance counts, Theil-Sen robustness
  * against a planted outlier, and lead-lag recovery of a planted shift. */
class RankSpec extends SparkSpec {

  /** Write an events table where type `ty` has exactly `counts(i)` rows on
    * day i (2024-01-01 + i). Counts ARE the daily series under test. */
  private def writeCounts(series: Map[String, Seq[Int]]): String = {
    val d = Files.createTempDirectory("graft-rank").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val base = java.time.Instant.parse("2024-01-01T12:00:00Z")
    var id = 0L
    val rows = for {
      (ty, counts) <- series.toSeq
      (c, day) <- counts.zipWithIndex
      _ <- 0 until c
    } yield {
      id += 1
      Row(id, id % 7, Timestamp.from(base.plusSeconds(day * 86400L)), ty,
        1.0, "{}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("spearman: monotone pairs hit ±1, mid-rank ties match hand math") {
    val d = writeCounts(Map(
      "view" -> Seq(1, 2, 3, 4, 5, 6),
      "click" -> Seq(2, 4, 6, 8, 10, 12), // same order as view -> rho = 1
      "error" -> Seq(6, 5, 4, 3, 2, 1), // reversed -> rho = -1
      "signup" -> Seq(1, 1, 2, 2, 3, 3))) // tied mid-ranks vs view
    val r = RankQueries.spearmanCorr.build(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getAs[Long]("rho2_signed_ppm"), x.getAs[Double]("rho"))).toMap
    assert(r(("click", "view"))._1 == 1000000L)
    assert(r(("click", "view"))._2 == 1.0)
    assert(r(("error", "view"))._1 == -1000000L)
    assert(r(("error", "view"))._2 == -1.0)
    // view centered 2-ranks [-5,-3,-1,1,3,5]; signup mid-ranks x2 centered
    // [-4,-4,0,0,4,4]: num = 64, dena = 70, denb = 64
    // rho2 = 64*64*1e6 // (70*64) = 914285
    assert(r(("signup", "view"))._1 == 914285L)
    assert(r(("signup", "view"))._2 == math.sqrt(914285.0 / 1000000.0))
  }

  test("kendall: all-discordant -1, ties excluded from both counts") {
    val d = writeCounts(Map(
      "view" -> Seq(1, 2, 3, 4, 5, 6),
      "error" -> Seq(6, 5, 4, 3, 2, 1),
      "signup" -> Seq(1, 1, 2, 2, 3, 3)))
    val r = RankQueries.kendallTau.build(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getAs[Long]("n_pairs"), x.getAs[Long]("concordant"),
          x.getAs[Long]("discordant"), x.getAs[Long]("tied"),
          x.getAs[Long]("tau_a_ppm"))).toMap
    assert(r(("error", "view")) == ((15L, 0L, 15L, 0L, -1000000L)))
    // signup ties at day pairs (1,2),(3,4),(5,6): 3 tied, 12 concordant
    assert(r(("signup", "view")) == ((15L, 12L, 0L, 3L, 800000L)))
    // error vs signup: reverse of the above ordering -> 12 discordant
    assert(r(("error", "signup")) == ((15L, 0L, 12L, 3L, -800000L)))
  }

  test("theil-sen: planted outlier cannot move the median slope") {
    val d = writeCounts(Map(
      "purchase" -> Seq(10, 12, 14, 16, 100, 20))) // collinear but day 4
    val r = RankQueries.theilSenSlope.build(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_days") == 6L)
    assert(row.getAs[Long]("n_pairs") == 15L)
    // 10 of 15 pairwise slopes are exactly 2/day; outlier pairs land on
    // both flanks; low median (rank 8) = 2,000,000 micro/day
    assert(row.getAs[Long]("slope_micro") == 2000000L)
    // intercepts x_i*1e6 - 2e6*i = [10M x4, 92M, 10M]; low median = 10M
    assert(row.getAs[Long]("intercept_micro") == 10000000L)
  }

  test("rank xcorr: recovers a planted 2-day lead exactly") {
    val v = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3)
    val d = writeCounts(Map(
      "view" -> v,
      "click" -> (Seq(7, 7) ++ v.dropRight(2)))) // click = view shifted +2
    val rows = RankQueries.rankXcorr.build(spark, d).collect()
      .filter(x => x.getString(0) == "view" && x.getString(1) == "click")
    assert(rows.length == 8)
    val at2 = rows.find(_.getAs[Long]("lag") == 2L).get
    // at lag 2 the aligned pairs carry the same underlying values, but each
    // side is ranked within its OWN full series (click's includes the two
    // filler days), so the overlap Pearson is near-perfect, not exactly 1 —
    // the contract ranks once per series, not once per (lag, overlap)
    assert(at2.getAs[Long]("rho2_signed_ppm") >= 900000L)
    assert(at2.getAs[Long]("is_best") == 1L)
    // and the plant is unambiguous: every other lag is strictly weaker
    val best = at2.getAs[Long]("rho2_signed_ppm")
    assert(rows.filter(_.getAs[Long]("lag") != 2L)
      .forall(x => math.abs(x.getAs[Long]("rho2_signed_ppm")) < best))
    assert(rows.map(_.getAs[Long]("is_best")).sum == 1L)
  }

  test("mann-whitney: separation, ties as halves, and the U identity") {
    val d = writeCounts(Map(
      "view" -> Seq(1, 2, 3),
      "error" -> Seq(4, 5, 6), // fully above view -> CLES(view) = 0
      "signup" -> Seq(3, 3, 1))) // ties with view at 1 and 3
    val r = RankQueries.mannWhitney.build(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getAs[Long]("u2_a"), x.getAs[Long]("u2_b"),
          x.getAs[Long]("cles_ppm"))).toMap
    // 2U_a + 2U_b = 2 n_a n_b = 18 on every pair
    assert(r.values.forall(v => v._1 + v._2 == 18L))
    // error dominates view: U(error over view... a = error side) counts
    // (error > view) twice: all 9 pairs -> u2_a = 18, CLES = 1
    assert(r(("error", "view"))  == ((18L, 0L, 1000000L)))
    // signup [3,3,1] vs view [1,2,3]: (signup > view) pairs = (3,1),(3,2)
    // from each 3 -> 4, doubled = 8; ties (3,3),(3,3),(1,1) -> 3; u2 = 11
    assert(r(("signup", "view"))._1 == 11L)
    assert(r(("signup", "view"))._3 == 11000000L / 18L)
  }

  test("anova: textbook two-group decomposition, exact milli/ppm") {
    val d = writeCounts(Map(
      "view" -> Seq(1, 2, 3),
      "error" -> Seq(4, 5, 6)))
    val r = graft.queries.StatQueries.anovaDaily.build(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("k_groups") == 2L)
    assert(row.getAs[Long]("n_days") == 3L)
    // A = k*sum(S^2) - (sum S)^2 = 2*261 - 441 = 81; B = T*Q - sum(S^2) = 12
    assert(row.getAs[Long]("ssb_num") == 81L)
    assert(row.getAs[Long]("ssw_num") == 12L)
    // F = SSB/(k-1) / (SSW/(N-k)) = 13.5/1.0 = 13.5
    assert(row.getAs[Long]("f_milli") == 13500L)
    // eta^2 = 13.5 / 17.5
    assert(row.getAs[Long]("eta2_ppm") == 81L * 1000000L / 105L)
  }
}
