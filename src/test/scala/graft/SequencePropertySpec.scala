package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.{ProfileQueries, SequenceQueries}

/** Property check: the sequence/monitoring operators against naive
  * in-memory implementations on seeded random event sets — a third
  * independent implementation alongside the Spark plan and the DuckDB
  * oracle (the GraphPropertySpec technique for the events family). */
class SequencePropertySpec extends SparkSpec {

  private case class Ev(id: Long, user: Long, tsUs: Long, tpe: String, value: Double)

  private val types = Vector("view", "click", "purchase", "signup", "error")

  private def randomEvents(seed: Int, nUsers: Int, perUser: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val base = 1704067200000000L // 2024-01-01 UTC in micros
    var id = -1L
    (for {
      u <- 0 until nUsers
      _ <- 0 until perUser
    } yield {
      id += 1
      Ev(id, u.toLong, base + rnd.nextInt(1 << 28).toLong * 100L,
        types(rnd.nextInt(types.size)), rnd.nextInt(20000) / 100.0)
    }).toSeq
  }

  private def write(evs: Seq[Ev]): String = {
    val d = Files.createTempDirectory("graft-seqprop").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = evs.map(e => Row(e.id, e.user,
      Timestamp.from(java.time.Instant.EPOCH.plusNanos(e.tsUs * 1000)),
      e.tpe, e.value, "{}"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def perUserSorted(evs: Seq[Ev]): Map[Long, Seq[Ev]] =
    evs.groupBy(_.user).view.mapValues(_.sortBy(e => (e.tsUs, e.id))).toMap

  test("transitions match a naive lag scan on random events") {
    val evs = randomEvents(11, 6, 25)
    val dir = write(evs)
    val naive = perUserSorted(evs).values.toSeq
      .flatMap(seq => seq.zip(seq.tail).map(p => (p._1.tpe, p._2.tpe)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SequenceQueries.eventTransitions.build(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(got == naive)
  }

  test("anomaly flags match a naive ring-buffer scan on random events") {
    val evs = randomEvents(12, 5, 30)
    val dir = write(evs)
    val naive = perUserSorted(evs).values.toSeq.flatMap { seq =>
      seq.zipWithIndex.flatMap { case (e, i) =>
        val win = seq.slice(math.max(0, i - 8), i)
          .map(x => BigDecimal(x.value * 100)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        val n = win.size.toLong
        if (n >= 4) {
          val x = BigDecimal(e.value * 100)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          val s1 = win.sum; val s2 = win.map(v => v * v).sum
          val dev2 = (n * x - s1) * (n * x - s1)
          if (dev2 > 4L * (n * s2 - s1 * s1)) Some(e.id) else None
        } else None
      }
    }.toSet
    val got = ProfileQueries.anomalyZscore.build(spark, dir).collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(got == naive)
  }

  /** Random events spread across ~25 calendar days (the stock generator
    * spans only ~7 hours — a single grid day, which would make every
    * daily-series property vacuous: NULL trends, n = 1 ACF). */
  private def randomDailyEvents(seed: Int, n: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val base = 1704067200000000L // 2024-01-01 UTC in micros
    (0 until n).map { i =>
      Ev(i.toLong, rnd.nextInt(8).toLong,
        base + rnd.nextInt(25 * 86400).toLong * 1000000L,
        types(rnd.nextInt(types.size)), rnd.nextInt(20000) / 100.0)
    }
  }

  /** Daily zero-filled grid per type over the GLOBAL calendar span —
    * the shared precondition of the time-series queries under test. */
  private def dailyGrids(evs: Seq[Ev]): Map[String, Seq[Long]] = {
    def dayOf(us: Long) = us / 86400000000L
    val days = evs.map(e => dayOf(e.tsUs))
    val (d0, d1) = (days.min, days.max)
    val byTypeDay = evs.groupBy(e => (e.tpe, dayOf(e.tsUs)))
      .view.mapValues(_.size.toLong).toMap
    evs.map(_.tpe).distinct.map { tpe =>
      tpe -> (d0 to d1).map(d => byTypeDay.getOrElse((tpe, d), 0L))
    }.toMap
  }

  test("autocorr matches the BigInt closed form on random daily series") {
    val evs = randomDailyEvents(13, 320)
    val got = SequenceQueries.autocorr.build(spark, write(evs)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    for ((tpe, xs) <- dailyGrids(evs); k <- 1 to 7) {
      val n = BigInt(xs.size); val S = BigInt(xs.sum)
      val Qs = xs.map(x => BigInt(x) * x).sum
      val den = n * n * Qs - n * S * S
      val naive =
        if (den == 0) None
        else {
          val pairs = xs.drop(k).zip(xs)
          val P = pairs.map { case (a, b) => BigInt(a) * b }.sum
          val T = pairs.map { case (a, b) => BigInt(a) + b }.sum
          val A = n * n * P - n * S * T + (n - k) * S * S
          // the query's +K*den offset realizes FLOOR division in both engines
          def floorDiv(a: BigInt, b: BigInt): BigInt = {
            val q = a / b
            if (a % b != 0 && (a < 0) != (b < 0)) q - 1 else q
          }
          Some(floorDiv(A * 1000000, den).toLong)
        }
      assert(got((tpe, k.toLong)) == naive, s"$tpe lag $k")
    }
  }

  test("holt fold matches a naive truncating recurrence on random series") {
    val evs = randomDailyEvents(14, 245)
    val got = SequenceQueries.holtForecast.build(spark, write(evs)).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // the query orders by (type, d); collect preserves that order per type
    for ((tpe, xs) <- dailyGrids(evs)) {
      var l = 1000000L * xs.head; var b = 0L
      val naive = xs.zipWithIndex.map { case (x, i) =>
        if (i > 0) {
          val l1 = (1000000L * x + l + b) / 2L // truncating, like DuckDB //
          b = ((l1 - l) + 3L * b) / 4L
          l = l1
        }
        (l, b)
      }
      assert(got(tpe).toSeq == naive, tpe)
    }
  }

  test("stl identity: trend + seasonal + remainder rebuilds the series") {
    val evs = randomDailyEvents(15, 270)
    val rows = SequenceQueries.stlDecompose.build(spark, write(evs)).collect()
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        // x*1e6 == trend + seasonal + remainder, by construction EXACTLY
        assert(r.getLong(2) * 1000000L ==
          r.getLong(4) + r.getLong(5) + r.getLong(6),
          s"${r.getString(0)} ${r.getDate(1)}")
      }
    }
    assert(rows.exists(!_.isNullAt(4)), "interior days exist")
  }

  test("cusum matches the literal statistic on random events") {
    val evs = randomEvents(13, 4, 40)
    val dir = write(evs)
    val naive = evs.groupBy(_.tpe).map { case (tpe, es) =>
      val daily = es.groupBy(_.tsUs / 86400000000L).view
        .mapValues(_.map(e => BigDecimal(e.value * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum)
        .toSeq.sortBy(_._1)
      val xx = daily.map(_._2).sum
      val tt = daily.size.toLong
      val devs = daily.zipWithIndex.map { case ((day, _), i) =>
        val cs = daily.take(i + 1).map(_._2).sum
        (day, math.abs(tt * cs - (i + 1) * xx))
      }
      val maxDev = devs.map(_._2).max
      tpe -> (devs.filter(_._2 == maxDev).map(_._1).min, maxDev, tt)
    }
    val got = SequenceQueries.cusumChangepoint.build(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("change_day"),
        r.getAs[Long]("max_dev"), r.getAs[Long]("n_days")))).toMap
    assert(got == naive)
  }

  test("conversion time matches a naive first-view/first-purchase scan") {
    val evs = randomEvents(14, 8, 20)
    val dir = write(evs)
    val gaps = perUserSorted(evs).values.toSeq.flatMap { seq =>
      seq.find(_.tpe == "view").flatMap { v =>
        seq.filter(e => e.tpe == "purchase" && e.tsUs > v.tsUs)
          .map(_.tsUs).minOption.map(_ - v.tsUs)
      }
    }
    val row = SequenceQueries.conversionTime.build(spark, dir).collect().head
    assert(row.getAs[Long]("n_converted") == gaps.size.toLong)
    if (gaps.nonEmpty) {
      assert(row.getAs[Long]("min_us") == gaps.min)
      assert(row.getAs[Long]("max_us") == gaps.max)
    }
  }
}
