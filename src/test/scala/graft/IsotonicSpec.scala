package graft

import org.apache.spark.sql.functions._

import graft.queries.CurationQueries

/** Grades q_isotonic_calibration against an INDEPENDENT textbook PAV:
  * the bin stats are re-derived from the documents with a separate copy
  * of the scoring formula, pooled by the sequential pool-adjacent-
  * violators algorithm over exact rationals, and floored to ppm only at
  * the end — the minimax form in the query must match bit-for-bit
  * (floor commutes with min/max). */
class IsotonicSpec extends SparkSpec {

  /** Exact-rational PAV pooling: (weight, positives) per bin in order;
    * returns the pooled mean of each bin's block as (pos, n). */
  private def pav(bins: Seq[(Long, Long)]): Seq[(BigInt, BigInt)] = {
    // blocks of (n, pos); merge while the previous block mean >= next's
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(BigInt, BigInt)]
    for ((n, pos) <- bins) {
      blocks += ((BigInt(n), BigInt(pos)))
      // pool while non-increasing: mean(prev) >= mean(last) via cross-mult
      var merged = true
      while (merged && blocks.length >= 2) {
        val (n2, p2) = blocks(blocks.length - 1)
        val (n1, p1) = blocks(blocks.length - 2)
        if (p1 * n2 >= p2 * n1) {
          blocks.remove(blocks.length - 1)
          blocks(blocks.length - 1) = (n1 + n2, p1 + p2)
        } else merged = false
      }
    }
    blocks.toSeq
  }

  test("isotonic fit equals sequential PAV over exact rationals, floored") {
    val dir = "/root/testdata/sf0.001"
    // independent re-derivation of the bin stats (same declared formula,
    // separate code path: SQL over the raw documents)
    val binStats = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("split(text, ' ') AS tk")
      .selectExpr(
        "CAST(size(tk) AS BIGINT) AS n_tokens",
        "CAST(size(array_distinct(tk)) AS BIGINT) * 1000000 DIV size(tk) AS d_ppm",
        "aggregate(tk, 0L, (a, x) -> a + length(x)) * 1000000 DIV size(tk) AS w_ppm",
        "CAST(size(filter(tk, x -> x IN ('a', 'the'))) AS BIGINT) * 1000000 DIV size(tk) AS s_ppm")
      .selectExpr(
        "n_tokens",
        "600 * d_ppm + 500000 * LEAST(n_tokens, 80L) + 20 * w_ppm + (-900) * s_ppm AS score")
      .selectExpr(
        "LEAST(GREATEST(score, 0L), 699999999L) * 1000000 DIV 700000000 AS pred_ppm",
        "CASE WHEN n_tokens >= 40 THEN 1L ELSE 0L END AS pos")
      .selectExpr("LEAST(pred_ppm * 10 DIV 1000000, 9L) AS bin", "pos")
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("pos"))
      .orderBy("bin")
      .collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("pos")))
    // expected: PAV blocks -> per-bin floored ppm
    val blocks = pav(binStats.map(b => (b._2, b._3)))
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var bi = 0
    for ((bn, bp) <- blocks) {
      var w = BigInt(0)
      while (w < bn) {
        val (bin, n, _) = binStats(bi)
        expected += ((bin, ((bp * 1000000) / bn).toLong))
        w += n
        bi += 1
      }
    }
    val got = CurationQueries.isotonicCalibration.build(spark, dir).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("iso_ppm")))
    assert(got.toSeq == expected.toSeq)
    // and the fit is monotone nondecreasing by construction
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // PAV cannot fit worse than the raw diagram: residual <= raw ECE gaps
    val raw = CurationQueries.scoreCalibration.build(spark, dir).collect()
    val rawEce = raw.head.getAs[Long]("ece_ppm")
    val isoEce = CurationQueries.isotonicCalibration.build(spark, dir)
      .collect().head.getAs[Long]("iso_ece_ppm")
    assert(isoEce <= rawEce + 1) // +1 for independent ppm floors
  }
}
