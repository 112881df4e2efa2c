package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.{LakehouseQueries, ProfileQueries, SequenceQueries}

/** Cross-implementation property tests for the round-10 operators (the
  * Levenshtein technique: the distributed operator vs an independent naive
  * Scala form on seeded random inputs). The naive forms are deliberately
  * quadratic / literal — exactly what the production shapes avoid — so a
  * match is evidence about SEMANTICS, not a shared shortcut. */
class LakehousePropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(4242)

  /** Random event log with FORCED ts collisions (coarse second grid) so the
    * (ts, kind, event_id) tie rules are genuinely exercised. */
  private def randomLog(n: Int): Seq[(Long, Long, Timestamp, String, Double)] = {
    val types = Seq("signup", "purchase", "error", "view", "click")
    (0 until n).map { i =>
      val user = 1L + rnd.nextInt(12)
      val ts = new Timestamp(1704067200000L + rnd.nextInt(300) * 1000L)
      (i.toLong, user, ts, types(rnd.nextInt(types.size)),
        (rnd.nextInt(1000) + 1).toDouble)
    }
  }

  private def logDir(rows: Seq[(Long, Long, Timestamp, String, Double)]): String = {
    val dir = Files.createTempDirectory("lh-prop").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          Row(r._1, r._2, r._3, r._4, r._5, "{}")), 3), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def isChange(t: String) = t == "signup" || t == "purchase" || t == "error"

  test("pit join == naive latest-change scan on random logs with ts ties") {
    for (_ <- 1 to 3) {
      val log = randomLog(300)
      val dir = logDir(log)
      val changes = log.filter(r => isChange(r._4))
        .map(r => (r._2, r._3.getTime, r._1,
          if (r._4 == "error") "delete" else "upsert", r._5))
      val naive = log.filter(_._4 == "view").map { p =>
        val visible = changes.filter(c =>
          c._1 == p._2 && (c._2 < p._3.getTime || c._2 == p._3.getTime))
        val last = visible.sortBy(c => (c._2, c._3)).lastOption
        p._1 -> last.map(c => (c._4, if (c._4 == "delete") None else Some(c._5)))
      }.toMap
      val got = LakehouseQueries.pitJoin.build(spark, dir)
        .select("probe_event_id", "state_op", "state_value")
        .collect().map(r => r.getLong(0) ->
          (Option(r.getString(1)), Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toMap
      assert(got.keySet == naive.keySet)
      got.foreach { case (id, (op, v)) =>
        naive(id) match {
          case None => assert(op.isEmpty && v.isEmpty, s"probe $id: no state yet")
          case Some((nop, nv)) =>
            assert(op.contains(nop) && v == nv, s"probe $id: $op/$v vs $nop/$nv")
        }
      }
    }
  }

  test("scd2 == naive per-key sorted versioning on random logs") {
    val log = randomLog(300)
    val dir = logDir(log)
    val naive = log.filter(r => isChange(r._4))
      .groupBy(_._2).flatMap { case (u, rs) =>
        val sorted = rs.sortBy(r => (r._3.getTime, r._1))
        sorted.zipWithIndex.map { case (r, i) =>
          (u, i + 1L) -> (sorted.lift(i + 1).map(_._3), i == sorted.size - 1)
        }
      }.toMap
    val got = LakehouseQueries.scd2Build.build(spark, dir)
      .select("user_id", "version", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.getTimestamp(2)), r.getBoolean(3))).toMap
    assert(got == naive)
  }

  test("streaks == naive gap-split on random day sets") {
    val log = randomLog(250).map { case (id, u, _, t, v) =>
      // remap ts to a random day within two months for real gap structure
      (id, u, new Timestamp(1704067200000L +
        rnd.nextInt(60) * 86400000L + rnd.nextInt(86400) * 1000L), t, v)
    }
    val dir = logDir(log)
    val naive = log.groupBy(_._2).map { case (u, rs) =>
      val days = rs.map(r => Math.floorDiv(r._3.getTime, 86400000L))
        .distinct.sorted
      val runs = scala.collection.mutable.ListBuffer.empty[Long]
      var prev = Long.MinValue
      for (d <- days) {
        if (d == prev + 1) runs(runs.size - 1) += 1 else runs += 1L
        prev = d
      }
      u -> (runs.size.toLong, runs.max, days.size.toLong)
    }
    val got = SequenceQueries.streakIslands.build(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == naive)
  }

  test("ewma == naive kernel recompute on the random daily series") {
    val log = randomLog(250).map { case (id, u, _, t, v) =>
      (id, u, new Timestamp(1704067200000L +
        rnd.nextInt(40) * 86400000L + rnd.nextInt(86400) * 1000L), t, v)
    }
    val dir = logDir(log)
    val naive = log.groupBy(r => (r._4, Math.floorDiv(r._3.getTime, 86400000L)))
      .map { case (k, rs) => k -> rs.size.toLong }
      .groupBy(_._1._1).flatMap { case (tp, m) =>
        val series = m.toSeq.map { case ((_, d), c) => (d, c) }.sortBy(_._1)
        series.indices.map { i =>
          val e = (0 until 16).map(j =>
            series.lift(i - j).map(_._2).getOrElse(0L).toDouble *
              math.pow(2, -(j + 1))).sum
          (tp, java.time.LocalDate.ofEpochDay(series(i)._1).toString) -> e
        }
      }
    // key by the DATE STRING — java.sql.Date.getTime is JVM-default-tz
    // local midnight, not a UTC epoch day
    val got = SequenceQueries.ewmaDaily.build(spark, dir)
      .collect().map(r => (r.getString(0), r.getDate(1).toString)
        -> r.getDouble(3)).toMap
    assert(got.keySet == naive.keySet)
    got.foreach { case (k, v) =>
      assert(v == naive(k), s"$k: $v != ${naive(k)} (must be bit-exact)")
    }
  }

  /** Spark's exact-percentile interpolation tree (Percentile.scala):
    * pos = (n-1)*p; lower + (higher - lower) * fraction — the same tree
    * DuckDB's quantile_cont uses, reproduced here literally so the naive
    * form is an independent third implementation. */
  private def interp(sorted: IndexedSeq[Long], p: Double): Double = {
    val pos = (sorted.length - 1) * p
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (sorted(hi) - sorted(lo)) * (pos - lo)
  }

  test("mad robust == naive median/MAD fold on random logs") {
    for (_ <- 1 to 3) {
      val log = randomLog(400)
      val dir = logDir(log)
      val naive = log.groupBy(_._4).map { case (tpe, rows) =>
        val xs = rows.map(r => math.round(r._5 * 100)).toIndexedSeq.sorted
        val med = interp(xs, 0.5)
        val devs = xs.map(x => math.abs(x.toDouble - med)).sorted
        val mad = devs.length match {
          case n =>
            val pos = (n - 1) * 0.5; val lo = math.floor(pos).toInt
            devs(lo) + (devs(math.ceil(pos).toInt) - devs(lo)) * (pos - lo)
        }
        tpe -> (xs.length.toLong, med, mad,
          devs.count(_ > 3 * mad).toLong, devs.max)
      }
      val got = graft.queries.ProfileQueries.madRobust.build(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
            r.getDouble(5))).toMap
      assert(got.keySet == naive.keySet)
      got.foreach { case (k, (n, med, mad, out, mx)) =>
        val (nn, nmed, nmad, nout, nmx) = naive(k)
        assert(n == nn && out == nout, s"$k counts: ($n,$out) != ($nn,$nout)")
        assert(math.abs(med - nmed) < 1e-9 && math.abs(mad - nmad) < 1e-9 &&
          math.abs(mx - nmx) < 1e-9, s"$k stats differ")
      }
    }
  }

  test("equi-width histogram == naive integer bucketing on random logs") {
    for (_ <- 1 to 3) {
      val log = randomLog(400)
      val dir = logDir(log)
      val naive = log.groupBy(_._4).flatMap { case (tpe, rows) =>
        val xs = rows.map(r => math.round(r._5 * 100))
        val lo = xs.min; val hi = xs.max; val span = math.max(hi - lo, 1L)
        xs.groupBy(x => math.min((x - lo) * 10 / span, 9L))
          .map { case (b, g) => (tpe, b) -> (g.size.toLong, lo, hi) }
      }
      val got = graft.queries.ProfileQueries.histEquiwidth.build(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got == naive, s"only-got: ${(got.toSet diff naive.toSet).take(3)} " +
        s"only-naive: ${(naive.toSet diff got.toSet).take(3)}")
    }
  }

  test("skyline == naive quadratic dominance filter on random parts") {
    val dir = Files.createTempDirectory("lh-prop-sky").toString
    val parts = (1 to 300).map { i =>
      (i.toLong, s"B${rnd.nextInt(4)}", rnd.nextInt(20) + 1,
        (rnd.nextInt(500) + 1).toDouble)
    }
    val schema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_brand", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(parts.map(p => Row(p._1, p._2, p._3, p._4)), 3),
        schema)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val naive = parts.filter { p =>
      !parts.exists(q => q._2 == p._2 &&
        q._4 <= p._4 && q._3 >= p._3 && (q._4 < p._4 || q._3 > p._3))
    }.map(_._1).toSet
    val got = ProfileQueries.skyline.build(spark, dir)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == naive)
  }
}
