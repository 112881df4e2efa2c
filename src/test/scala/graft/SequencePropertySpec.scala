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
