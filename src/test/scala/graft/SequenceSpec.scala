package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.SequenceQueries

class SequenceSpec extends SparkSpec {

  private def writeEvents(rows: Seq[Row]): String = {
    val d = Files.createTempDirectory("graft-seq").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
  private def at(minutes: Long) = Timestamp.from(base.plusSeconds(minutes * 60))

  test("transitions: exact counts and ppm on a crafted timeline") {
    val d = writeEvents(Seq(
      Row(0L, 1L, at(0), "view", 1.0, "{}"),
      Row(1L, 1L, at(1), "click", 1.0, "{}"),
      Row(2L, 1L, at(2), "view", 1.0, "{}"),
      Row(3L, 1L, at(3), "purchase", 1.0, "{}"),
      Row(4L, 2L, at(0), "view", 1.0, "{}"), // user 2: single event, no transition
      Row(5L, 3L, at(0), "view", 1.0, "{}"),
      Row(6L, 3L, at(5), "click", 1.0, "{}")))
    val r = SequenceQueries.eventTransitions.build(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(4))).toSet
    assert(r == Set(
      ("view", "click", 2L, 666666L), // 2 of view's 3 outgoing
      ("view", "purchase", 1L, 333333L),
      ("click", "view", 1L, 1000000L)))
  }

  test("ohlc: open/close picked by event_id, high/low exact") {
    val d = writeEvents(Seq(
      Row(10L, 1L, at(1), "view", 5.0, "{}"),
      Row(11L, 2L, at(4), "view", 9.0, "{}"),
      Row(12L, 3L, at(8), "view", 2.0, "{}"),
      Row(13L, 4L, at(14), "view", 7.0, "{}"),
      Row(14L, 5L, at(20), "view", 3.0, "{}"))) // second 15-min bar
    val r = SequenceQueries.ohlcBars.build(spark, d).collect()
    assert(r.length == 2)
    val bar0 = r.head
    assert(bar0.getAs[Long]("n_events") == 4)
    assert(bar0.getAs[Double]("open") == 5.0)
    assert(bar0.getAs[Double]("high") == 9.0)
    assert(bar0.getAs[Double]("low") == 2.0)
    assert(bar0.getAs[Double]("close") == 7.0)
    assert(bar0.getAs[Double]("total") == 23.0)
  }

  test("attribution: latest in-window touch wins; stale touches do not") {
    val d = writeEvents(Seq(
      // user 1: view at t0, click at t10, purchase at t20 -> click wins
      Row(0L, 1L, at(0), "view", 1.0, "{}"),
      Row(1L, 1L, at(10), "click", 1.0, "{}"),
      Row(2L, 1L, at(20), "purchase", 50.0, "{}"),
      // user 2: touch 3h before purchase -> outside the 2h window
      Row(3L, 2L, at(0), "view", 1.0, "{}"),
      Row(4L, 2L, at(180), "purchase", 60.0, "{}"),
      // user 3: purchase with no touches at all
      Row(5L, 3L, at(0), "purchase", 70.0, "{}")))
    val r = SequenceQueries.lastTouchAttribution.build(spark, d).collect()
      .map(x => x.getAs[Long]("purchase_id") -> x).toMap
    assert(r(2L).getAs[Boolean]("attributed"))
    assert(r(2L).getAs[Long]("touch_id") == 1L)
    assert(r(2L).getAs[String]("touch_type") == "click")
    assert(r(2L).getAs[Long]("gap_us") == 10L * 60 * 1000000)
    assert(!r(4L).getAs[Boolean]("attributed"))
    assert(r(4L).isNullAt(r(4L).fieldIndex("touch_id")))
    assert(!r(5L).getAs[Boolean]("attributed"))
  }

  test("conversion time: strictly-after purchase only, exact gap") {
    val d = writeEvents(Seq(
      Row(0L, 1L, at(0), "view", 1.0, "{}"),
      Row(1L, 1L, at(10), "purchase", 5.0, "{}"), // converts in 10 min
      Row(2L, 2L, at(0), "purchase", 5.0, "{}"), // purchase BEFORE any view
      Row(3L, 2L, at(5), "view", 1.0, "{}"),
      Row(4L, 3L, at(0), "view", 1.0, "{}"))) // never purchases
    val r = SequenceQueries.conversionTime.build(spark, d).collect().head
    assert(r.getAs[Long]("n_converted") == 1)
    assert(r.getAs[Long]("min_us") == 10L * 60 * 1000000)
    assert(r.getAs[Double]("p50_us") == 10.0 * 60 * 1000000)
    assert(r.getAs[Long]("max_us") == 10L * 60 * 1000000)
  }

  test("cusum: a planted level shift peaks at the boundary day") {
    // 10 days at 10.00/day then 10 days at 100.00/day, one event per day
    val rows = (0 until 20).map { i =>
      val v = if (i < 10) 10.0 else 100.0
      Row(i.toLong, 1L, at(i.toLong * 24 * 60), "view", v, "{}")
    }
    val d = writeEvents(rows)
    val r = SequenceQueries.cusumChangepoint.build(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    val day0 = java.util.concurrent.TimeUnit.MILLISECONDS.toDays(
      base.toEpochMilli)
    // argmax |T*S_t - t*X| lands on the LAST low day (t=10 -> day0+9):
    // dv grows 90000t through the low regime, then decays
    assert(row.getAs[Long]("change_day") == day0 + 9)
    assert(row.getAs[Long]("max_dev") == 900000L)
    assert(row.getAs[Long]("n_days") == 20L)
  }

  test("pivot -> melt roundtrip: wide counts exact, zeros restored") {
    val d = writeEvents(Seq(
      Row(0L, 1L, at(0), "view", 1.0, "{}"),
      Row(1L, 1L, at(1), "view", 1.0, "{}"),
      Row(2L, 1L, at(2), "click", 1.0, "{}"),
      Row(3L, 2L, at(0), "purchase", 1.0, "{}")))
    val wide = SequenceQueries.pivotEvents.build(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(wide(1L).getAs[Long]("n_view") == 2)
    assert(wide(1L).getAs[Long]("n_click") == 1)
    assert(wide(1L).getAs[Long]("n_purchase") == 0) // explicit zero
    assert(wide(2L).getAs[Long]("n_purchase") == 1)
    val long = SequenceQueries.meltEvents.build(spark, d).collect()
    // melt restores the full 2-user x 5-type grid, zeros included
    assert(long.length == 10)
    val m = long.map(r => (r.getAs[Long]("user_id"),
      r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
    assert(m((1L, "view")) == 2 && m((1L, "signup")) == 0)
    assert(m((2L, "purchase")) == 1 && m((2L, "view")) == 0)
  }

  test("event paths: exact trigram counts on a crafted timeline") {
    val d = writeEvents(Seq(
      Row(0L, 1L, at(0), "view", 1.0, "{}"),
      Row(1L, 1L, at(1), "view", 1.0, "{}"),
      Row(2L, 1L, at(2), "click", 1.0, "{}"),
      Row(3L, 1L, at(3), "purchase", 1.0, "{}"),
      Row(4L, 2L, at(0), "view", 1.0, "{}"),
      Row(5L, 2L, at(1), "click", 1.0, "{}"))) // too short for a trigram
    val r = SequenceQueries.eventPaths.build(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2)) ->
        x.getAs[Long]("n")).toMap
    assert(r == Map(("view", "view", "click") -> 1L,
      ("view", "click", "purchase") -> 1L))
  }

  test("streaks: islands split exactly at day gaps") {
    def day(d: Int, i: Int) = at(d.toLong * 1440 + i)
    val dir = writeEvents(Seq(
      // user 1: runs [1,2,3], [5], [10,11] — two events on day 1 must not
      // double-count the day
      Row(0L, 1L, day(1, 0), "view", 1.0, "{}"),
      Row(1L, 1L, day(1, 30), "click", 1.0, "{}"),
      Row(2L, 1L, day(2, 0), "view", 1.0, "{}"),
      Row(3L, 1L, day(3, 0), "view", 1.0, "{}"),
      Row(4L, 1L, day(5, 0), "view", 1.0, "{}"),
      Row(5L, 1L, day(10, 0), "view", 1.0, "{}"),
      Row(6L, 1L, day(11, 0), "view", 1.0, "{}"),
      Row(7L, 2L, day(4, 0), "view", 1.0, "{}")))
    val rows = SequenceQueries.streakIslands.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 3L, 3L, 6L), (2L, 1L, 1L, 1L)))
  }

  test("ewma: dyadic kernel is exact on a crafted daily series") {
    def day(d: Int, i: Int) = at(d.toLong * 1440 + i)
    val dir = writeEvents(
      (0 until 4).map(i => Row(i.toLong, 1L, day(1, i), "view", 1.0, "{}")) ++
        (0 until 2).map(i => Row((10 + i).toLong, 1L, day(2, i), "view", 1.0, "{}")) ++
        (0 until 8).map(i => Row((20 + i).toLong, 1L, day(3, i), "view", 1.0, "{}")))
    val rows = SequenceQueries.ewmaDaily.build(spark, dir)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    // counts 4, 2, 8 -> 4/2 ; 2/2+4/4 ; 8/2+2/4+4/8 — every term dyadic-exact
    assert(rows.toSeq == Seq((4L, 2.0), (2L, 2.0), (8L, 5.0)))
  }

  test("seasonal profile: exact ppm index, ISO weekday keying") {
    def day(d: Int, i: Int) = at(d.toLong * 1440 + i) // day 0 = Mon 2024-01-01
    val dir = writeEvents(
      // Mondays Jan 1 + Jan 8: counts 4 and 2; Tuesday Jan 2: count 1
      (0 until 4).map(i => Row(i.toLong, 1L, day(0, i), "view", 1.0, "{}")) ++
        (0 until 2).map(i => Row((10 + i).toLong, 1L, day(7, i), "view", 1.0, "{}")) ++
        Seq(Row(20L, 1L, day(1, 0), "view", 1.0, "{}")))
    val rows = SequenceQueries.seasonalProfile.build(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // Monday: s=6 over 2 days vs flat 7/3 -> 6*3e6 DIV (2*7); Tuesday: 1*3e6 DIV 7
    assert(rows.toSeq == Seq(
      (1L, 6L, 2L, 6L * 3L * 1000000L / (2L * 7L)),
      (2L, 1L, 1L, 3000000L / 7L)))
  }

  test("session concurrency: spans count per hour, exclusive end excluded") {
    // user 1: continuous 5-min cadence 00:10-02:20 -> ONE session
    // [00:10, 02:30) overlapping hours 0, 1, 2; user 2: single event at
    // 00:50 -> session [00:50, 01:00) ends EXACTLY on the hour -> hour 0 only
    val dir = writeEvents(
      (0 until 27).map(i =>
        Row(i.toLong, 1L, at(10 + i * 5), "view", 1.0, "{}")) :+
        Row(100L, 2L, at(50), "view", 1.0, "{}"))
    val got = graft.queries.EventQueries.sessionConcurrency.build(spark, dir)
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toSeq
    assert(got == Seq(
      "2024-01-01 00:00:00.0" -> 2L,
      "2024-01-01 01:00:00.0" -> 1L,
      "2024-01-01 02:00:00.0" -> 1L))
  }

  test("autocorr: exact ppm on an alternating series, NULL for constant") {
    def day(d: Int, i: Int) = at(d.toLong * 1440 + i)
    // view: 2 events on even days, NONE on odd days (the zero-fill path);
    // click: exactly 1 event every day (constant series -> D = 0 -> NULL)
    val rows = (0 until 8).flatMap { d =>
      val clicks = Seq(Row(1000L + d, 9L, day(d, 1), "click", 1.0, "{}"))
      val views =
        if (d % 2 == 0)
          Seq(Row(2000L + d * 2, 8L, day(d, 2), "view", 1.0, "{}"),
            Row(2001L + d * 2, 8L, day(d, 3), "view", 1.0, "{}"))
        else Seq.empty
      clicks ++ views
    }
    val got = SequenceQueries.autocorr.build(spark, writeEvents(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got.size == 14, "two types x seven lags")
    // series [2,0,2,0,2,0,2,0]: mean 1, deviations alternate +-1, so the
    // truncated-sum ACF at lag k is (-1)^k * (8-k)/8 exactly
    val expect = Map(1L -> -875000L, 2L -> 750000L, 3L -> -625000L,
      4L -> 500000L, 5L -> -375000L, 6L -> 250000L, 7L -> -125000L)
    expect.foreach { case (k, v) =>
      assert(got(("view", k)) == ((8L, Some(v))), s"lag $k")
    }
    (1L to 7L).foreach { k =>
      assert(got(("click", k)) == ((8L, None)), "constant series: NULL acf")
    }
  }

  test("stl: trend/seasonal/remainder match a naive recompute, edges NULL") {
    def day(d: Int, i: Int) = at(d.toLong * 1440 + i)
    // 14 days of "view" with a weekly sawtooth + ramp; day 5 has NO rows
    // (the zero-fill path — days 0 and 13 anchor the calendar span).
    // Counts: d -> (d % 7) + 1 + (if d >= 7 then 2 else 0), d5 = 0
    val counts = (0 until 14).map(d =>
      if (d == 5) 0 else (d % 7) + 1 + (if (d >= 7) 2 else 0))
    val rows = for {
      d <- 0 until 14
      i <- 0 until counts(d)
    } yield Row(d * 100L + i, 1L, day(d, i), "view", 1.0, "{}")
    // day 5 must still exist on the calendar: plant a click that day so the
    // global span covers it... the span is min..max over ALL types, and
    // days 0 and 13 have view rows, so the span already includes day 5.
    val got = SequenceQueries.stlDecompose.build(spark, writeEvents(rows))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
    // naive recompute, integer micro-units exactly as documented
    val x = counts.map(_.toLong)
    val trend = (0 until 14).map { t =>
      if (t < 3 || t > 10) None
      else Some((t - 3 to t + 3).map(x).sum * 1000000L / 7L)
    }
    val det = (0 until 14).map(t => trend(t).map(x(t) * 1000000L - _))
    // 2024-01-01 is a Monday: dow(d) = d % 7 + 1
    val seas = (1 to 7).map { dw =>
      val ds = (0 until 14).filter(_ % 7 + 1 == dw).flatMap(det(_))
      dw.toLong -> {
        val (s, n) = (ds.sum, ds.size)
        // floor division (values may be negative)
        Math.floorDiv(s, n.toLong)
      }
    }.toMap
    (0 until 14).foreach { d =>
      val key = ("view", f"2024-01-${d + 1}%02d")
      val (gx, gdow, gtrend, gseas, grem) = got(key)
      assert(gx == x(d), s"day $d count")
      assert(gdow == d % 7 + 1, s"day $d ISO weekday")
      assert(gtrend == trend(d), s"day $d trend")
      assert(gseas == seas(d % 7 + 1L), s"day $d seasonal")
      assert(grem == det(d).map(_ - seas(d % 7 + 1L)), s"day $d remainder")
    }
  }

  test("holt: hand-computed level/trend recurrence incl. negative truncation") {
    def day(d: Int, i: Int) = at(d.toLong * 1440 + i)
    // view: [1,0,0,0] (decay drives the trend negative and forces the
    // truncate-vs-floor distinction on day 3); click: constant 1/day
    // (level pinned at 1e6, trend 0) and anchors the calendar span
    val rows = Seq(Row(1L, 1L, day(0, 1), "view", 1.0, "{}")) ++
      (0 until 4).map(d => Row(10L + d, 2L, day(d, 2), "click", 1.0, "{}"))
    val got = SequenceQueries.holtForecast.build(spark, writeEvents(rows))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(("view", "2024-01-01")) == ((1L, 1000000L, 0L, 1000000L)))
    assert(got(("view", "2024-01-02")) == ((0L, 500000L, -125000L, 375000L)))
    assert(got(("view", "2024-01-03")) == ((0L, 187500L, -171875L, 15625L)))
    // l3 = 15625/2 = 7812 (trunc); b3 = -695313/4 = -173828 — TRUNCATED
    // toward zero (a flooring engine would emit -173829)
    assert(got(("view", "2024-01-04")) == ((0L, 7812L, -173828L, -166016L)))
    (1 to 4).foreach { d =>
      assert(got(("click", f"2024-01-$d%02d")) == ((1L, 1000000L, 0L, 1000000L)),
        "constant series: level pinned, zero trend")
    }
  }

  test("multitouch: equal credit split, window bounds, exact ppm") {
    val d = writeEvents(Seq(
      // user 1: view + click inside the 2h window of two purchases
      Row(1L, 1L, at(0), "view", 1.0, "{}"),
      Row(2L, 1L, at(30), "click", 1.0, "{}"),
      Row(3L, 1L, at(60), "purchase", 5.0, "{}"),
      Row(4L, 1L, at(61), "purchase", 6.0, "{}"),
      // user 2: touch 200 min before the purchase — outside the window
      Row(5L, 2L, at(0), "view", 1.0, "{}"),
      Row(6L, 2L, at(200), "purchase", 7.0, "{}"),
      // user 3: touch exactly AT the purchase instant — strictly-before excludes
      Row(7L, 3L, at(5), "view", 1.0, "{}"),
      Row(8L, 3L, at(5), "purchase", 8.0, "{}")))
    val got = SequenceQueries.multiTouch.build(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // each purchase of user 1 had n=2 touches -> 500000 ppm per touch
    assert(got("view") == ((2L, 2L, 1000000L)))
    assert(got("click") == ((2L, 2L, 1000000L)))
    assert(got.size == 2, "out-of-window and same-instant touches earn nothing")
  }

  test("seasonal anomaly: planted spike flagged, constant series silent") {
    def day(d: Int, i: Int) = at(d.toLong * 1440 + i)
    // view: flat 3/day over 4 weeks with day 15 spiked to 30;
    // click: constant 1/day (MAD = 0 and dev = 0 -> no anomaly rows)
    val rows = (0 until 28).flatMap { d =>
      val nView = if (d == 15) 30 else 3
      (0 until nView).map(i => Row(d * 1000L + i, 1L, day(d, i + 1), "view", 1.0, "{}")) :+
        Row(d * 1000L + 900L, 2L, day(d, 600), "click", 1.0, "{}")
    }
    val got = SequenceQueries.seasonalAnomaly.build(spark, writeEvents(rows))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4), r.getDate(6).toString))
      .toMap
    val (nScored, nAnom, worst) = got("view")
    assert(nScored == 22, "28 days minus 3 NULL-trend edge days each side")
    assert(nAnom >= 1, "the planted spike must flag")
    assert(worst == "2024-01-16", "worst deviation lands on the spike day")
    assert(got("click")._2 == 0, "a constant series never false-alarms")
  }

  test("cohort ltv: first-activity cohorts, cumulative cents, per-user DIV") {
    def day(d: Int, i: Int) = at(d.toLong * 1440 + i)
    val d = writeEvents(Seq(
      // cohort week 0 (Mon 2024-01-01): users 1 (buyer) and 2 (free rider)
      Row(1L, 1L, day(0, 1), "purchase", 10.0, "{}"),
      Row(2L, 1L, day(15, 1), "purchase", 20.0, "{}"), // age 2 weeks
      Row(3L, 2L, day(1, 1), "view", 1.0, "{}"),
      // cohort week 1: user 3 buys in their first week
      Row(4L, 3L, day(8, 1), "purchase", 5.0, "{}")))
    val got = SequenceQueries.cohortLtv.build(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(("2024-01-01", 0L)) == ((2L, 1000L, 1000L, 500L)))
    assert(got(("2024-01-01", 2L)) == ((2L, 2000L, 3000L, 1500L)),
      "cumulative skips the empty week 1; free rider halves the LTV")
    assert(got(("2024-01-08", 0L)) == ((1L, 500L, 500L, 500L)))
    assert(got.size == 3)
  }

  test("forecast backtest: reported MAEs equal a recompute from the model output") {
    val fc = SequenceQueries.holtForecast.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(5)))
    val got = SequenceQueries.forecastBacktest.build(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((tpe, rows) <- fc.groupBy(_._1)) {
      val ordered = rows.sortBy(_._2)
      val pairs = ordered.zip(ordered.drop(1))
      val errs = pairs.map { case ((_, _, _, f), (_, _, xn, _)) =>
        math.abs(1000000L * xn - f)
      }
      val naive = pairs.map { case ((_, _, x, _), (_, _, xn, _)) =>
        math.abs(1000000L * xn - 1000000L * x)
      }
      val (n, mae, maeN, skill) = got(tpe)
      assert(n == pairs.length.toLong, tpe)
      assert(mae == errs.sum / n, tpe)
      assert(maeN == naive.sum / n, tpe)
      assert(skill == errs.sum * 1000000L / math.max(naive.sum, 1L), tpe)
    }
  }

  test("sequence queries run end-to-end on real testdata") {
    assert(SequenceQueries.eventTransitions.build(spark, sf).count() > 0)
    assert(SequenceQueries.ohlcBars.build(spark, sf).count() > 0)
    val a = SequenceQueries.lastTouchAttribution.build(spark, sf)
    assert(a.count() > 0)
    assert(SequenceQueries.streakIslands.build(spark, sf).count() > 0)
    assert(SequenceQueries.ewmaDaily.build(spark, sf).count() > 0)
    assert(SequenceQueries.seasonalProfile.build(spark, sf).count() > 0)
  }

  test("label windows: features strictly pre-cutoff, labels strictly post") {
    val got = graft.queries.EventQueries.labelWindows.build(spark, sf)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // naive recompute off the raw rows (Tables.t normalizes the ts vintage)
    val ev = graft.engine.Tables.t(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val lo = ev.map(_._2).min
    val hi = ev.map(_._2).max
    val cut = (lo + hi) / 2
    val pre = ev.filter(e => e._2 * 2 < lo + hi).groupBy(_._1)
    val pos = ev.filter(e => e._2 * 2 >= lo + hi && e._3 == "purchase")
      .map(_._1).toSet
    val expect = pre.map { case (u, xs) =>
      u -> (xs.length.toLong,
        xs.count(_._3 == "purchase").toLong,
        (cut - xs.map(_._2).max) / 86400000000L,
        if (pos(u)) 1L else 0L)
    }
    assert(got == expect)
    // leakage guards: every emitted user HAS pre-cutoff history, and no
    // feature can see past the cutoff (recency is never negative)
    assert(got.keySet == pre.keySet)
    got.values.foreach { case (n, np, rec, lab) =>
      assert(n > 0 && np >= 0 && np <= n && rec >= 0 && (lab == 0L || lab == 1L))
    }
  }

  test("sax motifs: PAA means, positional quartiles, and word ranks") {
    // 13 days of 'view': frames of 3 days -> PAA [1e6, 3e6, 6e6, 9e6] plus
    // a 1-day tail frame at 9e6; quartile ranks over n = 5 select
    // b1 = 3e6 (rank 2), b2 = 6e6 (rank 3), b3 = 9e6 (rank 4) ->
    // symbols [0,0,1,2,2] -> words 001, 012, 122 (each once, lexicographic)
    val counts = Seq(1, 1, 1, 3, 3, 3, 6, 6, 6, 9, 9, 9, 9)
    var id = 100L
    val rows = counts.zipWithIndex.flatMap { case (c, day) =>
      (0 until c).map { _ =>
        id += 1
        Row(id, id % 5, at(day * 1440L), "view", 1.0, "{}")
      }
    }
    val d = writeEvents(rows)
    val r = SequenceQueries.saxMotifs.build(spark, d).collect()
      .map(x => (x.getString(0), x.getAs[Long]("rank")) ->
        (x.getString(1), x.getAs[Long]("cnt")))
    assert(r.toSeq.sortBy(_._1).map(_._2) ==
      Seq(("001", 1L), ("012", 1L), ("122", 1L)))
  }

  test("holt-winters: query equals an independent replay of the recurrence") {
    // 3 weekly cycles with a ramp: x = [2,4,6,8,10,12,14] + 7 * week
    val counts = (0 until 21).map(i => 2 * (i % 7 + 1) + 7 * (i / 7))
    var id = 500L
    val rows = counts.zipWithIndex.flatMap { case (c, day) =>
      (0 until c).map { _ =>
        id += 1
        Row(id, id % 4, at(day * 1440L), "view", 1.0, "{}")
      }
    }
    val d = writeEvents(rows)
    val got = SequenceQueries.hwSeasonal.build(spark, d).collect()
      .map(x => (x.getAs[java.sql.Date]("d").toString,
        x.getAs[Long]("level_micro"), x.getAs[Long]("trend_micro"),
        x.getAs[Long]("seasonal_micro"), x.getAs[Long]("forecast_next_micro")))
    // independent replay, Long arithmetic, truncating division
    var l = 1000000L * counts.head
    var b = 0L
    val sb = Array.fill(7)(0L)
    val want = counts.zipWithIndex.map { case (x, i) =>
      if (i > 0) {
        val sold = sb(0)
        val xm = 1000000L * x
        val l1 = (xm - sold + l + b) / 2L
        b = ((l1 - l) + 3L * b) / 4L
        val snew = ((xm - l1) + sold) / 2L
        l = l1
        System.arraycopy(sb, 1, sb, 0, 6)
        sb(6) = snew
      }
      (java.time.LocalDate.parse("2024-01-01").plusDays(i).toString,
        l, b, sb(6), l + b + sb(0))
    }
    assert(got.toSeq == want)
    // with a stable weekly shape the seasonals separate: the busiest day
    // of the last week carries a clearly higher seasonal state than the
    // quietest (full monotonicity needs more than 3 γ = 1/2 updates)
    val lastWeek = got.takeRight(7).map(_._4)
    assert(lastWeek.last > lastWeek.head, lastWeek.toString)
  }
}
