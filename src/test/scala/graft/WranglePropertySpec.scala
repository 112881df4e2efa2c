package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}
import graft.engine.Wrangle

/** Randomized K12 property sweep: the distributed pipeline must agree with a
  * direct sequential port of the reference algorithm (main.py:449-498,
  * including in-place interpolation) on arbitrary inputs — nulls anywhere,
  * duplicate dates, all-null prefixes, multi-entity frames. Inputs come from
  * scalacheck generators under a fixed seed (SURVEY §5.2-3). */
class WranglePropertySpec extends SparkSpec {

  type Raw = (Int, Option[Double], Option[Double], Option[Double], Option[Double])

  // ---- direct sequential port (test oracle; mirrors the reference) ----
  private def interpInPlace(xs: Array[Option[Double]]): Array[Option[Double]] = {
    val s = xs.clone()
    for (i <- s.indices) if (s(i).isEmpty) {
      if (i == 0) s(i) = Some(0.0)
      else {
        val a = (i - 1 to 0 by -1).find(s(_).isDefined).get // i>0: i-1 is filled
        val k = (i + 1 until s.length).find(s(_).isDefined)
        s(i) = k match {
          case Some(b) =>
            Some(s(a).get + (s(b).get - s(a).get) * ((i - a).toDouble / (b - a).toDouble))
          case None => s(a)
        }
      }
    }
    s
  }

  private def portPipeline(rows: Seq[Raw]): Seq[(Int, Double, Double, Double, Double)] = {
    def maxOpt(vs: Seq[Option[Double]]): Option[Double] = {
      val d = vs.flatten
      if (d.isEmpty) None else Some(d.max)
    }
    // 1. dedup by date, per-column max
    var s = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, g) =>
      (d, maxOpt(g.map(_._2)), maxOpt(g.map(_._3)), maxOpt(g.map(_._4)), maxOpt(g.map(_._5)))
    }
    // 2. leading all-null prefix drop (entity vanishes if no valid row)
    val first = s.indexWhere(r => r._2.isDefined || r._3.isDefined || r._4.isDefined || r._5.isDefined)
    if (first < 0) return Seq.empty
    s = s.drop(first)
    // 3. conditional zero-fill
    s = s.map { case r @ (d, c, a, dd, rr) =>
      if (c.isDefined && a.isDefined && c == a && dd.isEmpty && rr.isEmpty)
        (d, c, a, Some(0.0), Some(0.0))
      else r
    }
    // 4. single-missing invariant fill
    def fillSingle(r: (Int, Option[Double], Option[Double], Option[Double], Option[Double])) = {
      val (d, c, a, dd, rr) = r
      if (Seq(c, a, dd, rr).count(_.isEmpty) == 1) {
        if (a.isEmpty) (d, c, Some(c.get - dd.get - rr.get), dd, rr)
        else if (dd.isEmpty) (d, c, a, Some(c.get - a.get - rr.get), rr)
        else if (rr.isEmpty) (d, c, a, dd, Some(c.get - a.get - dd.get))
        else (d, Some(a.get + dd.get + rr.get), a, dd, rr)
      } else r
    }
    s = s.map(fillSingle)
    // 5. interpolation reference for C/D/R
    val ci = interpInPlace(s.map(_._2).toArray)
    val di = interpInPlace(s.map(_._4).toArray)
    val ri = interpInPlace(s.map(_._5).toArray)
    // 6. >=2-missing among C/D/R -> take interp, then single-fill (only A can remain)
    s = s.zipWithIndex.map { case (r @ (d, c, a, dd, rr), i) =>
      if (Seq(c, dd, rr).count(_.isEmpty) >= 2)
        fillSingle((d, c.orElse(ci(i)), a, dd.orElse(di(i)), rr.orElse(ri(i))))
      else r
    }
    // 7. Active from invariant; 8. final drop
    s.flatMap { case (d, c, a, dd, rr) =>
      val a2 = a.orElse(for (cv <- c; dv <- dd; rv <- rr) yield cv - dv - rv)
      for (cv <- c; av <- a2; dv <- dd; rv <- rr) yield (d, cv, av, dv, rv)
    }
  }

  // ---- generators ----
  private val rawRow: Gen[Raw] = for {
    day <- Gen.choose(1, 20)
    vals <- Gen.listOfN(4, Gen.option(Gen.choose(0, 500).map(_.toDouble)))
  } yield (day, vals.head, vals(1), vals(2), vals(3))

  private val entityRows: Gen[List[Raw]] = Gen.choose(5, 28).flatMap(Gen.listOfN(_, rawRow))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  test("distributed pipeline == sequential reference port on random inputs") {
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("Date", DateType),
      StructField("Confirmed", DoubleType), StructField("Active", DoubleType),
      StructField("Deaths", DoubleType), StructField("Recovered", DoubleType)))
    def toDate(day: Int) = Date.valueOf(f"2020-03-$day%02d")
    for (round <- 1 to 12) {
      val entities = (1 to 3).map(e => s"e$e" -> sample(entityRows, round * 100L + e)).toMap
      val data = entities.toSeq.flatMap { case (k, rows) =>
        rows.map(r => Row(k, toDate(r._1),
          r._2.map(Double.box).orNull, r._3.map(Double.box).orNull,
          r._4.map(Double.box).orNull, r._5.map(Double.box).orNull))
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(data, 4), schema)
      val got = Wrangle.processComplete(df, "k", "Date")
        .collect()
        .map(r => (r.getString(0), r.getDate(1).toLocalDate.getDayOfMonth,
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2)).toMap
      entities.foreach { case (k, rows) =>
        val want = portPipeline(rows)
        val g = got.getOrElse(k, Seq.empty).map(t => (t._2, t._3, t._4, t._5, t._6))
        assert(g.length == want.length, s"round $round $k: ${g.length} vs ${want.length}")
        g.lazyZip(want).foreach { (a, b) =>
          assert(a._1 == b._1, s"round $round $k date: $a vs $b")
          Seq(a._2 -> b._2, a._3 -> b._3, a._4 -> b._4, a._5 -> b._5).foreach {
            case (x, y) =>
              // closed-form vs in-place interpolation may differ in final ulps
              assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
                s"round $round $k: $a vs $b")
          }
        }
      }
    }
  }
}
