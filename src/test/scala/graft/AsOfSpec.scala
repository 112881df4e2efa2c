package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.engine.AsOf

/** Direction and tolerance semantics of the generic AS-OF join on a
  * hand-computed fixture. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  // refs for key 1 at 10:00 (v=1), 10:10 (v=2); key 2 has none
  private lazy val refs = Seq(
    (1L, ts("10:00:00"), 1.0),
    (1L, ts("10:10:00"), 2.0)).toDF("k", "rts", "rv")
  // probes: before all refs, exactly on a ref, between refs, after all refs
  private lazy val probes = Seq(
    (1L, 100L, ts("09:55:00")),
    (1L, 101L, ts("10:00:00")),
    (1L, 102L, ts("10:04:00")),
    (1L, 103L, ts("10:06:00")),
    (1L, 104L, ts("10:20:00")),
    (2L, 200L, ts("10:00:00"))).toDF("k", "pid", "pts")

  private def run(d: AsOf.Direction, tol: Option[Long] = None): Map[Long, Option[Double]] =
    AsOf.join(probes, refs, Seq("k"), "pts", "rts", "rv", d, tol)
      .select(col("pid"), col("rv_asof"))
      .as[(Long, Option[Double])].collect().toMap

  test("backward: latest ref at-or-before; none -> null") {
    assert(run(AsOf.Backward) == Map(
      100L -> None, 101L -> Some(1.0), 102L -> Some(1.0),
      103L -> Some(1.0), 104L -> Some(2.0), 200L -> None))
  }

  test("forward: earliest ref at-or-after; none -> null") {
    assert(run(AsOf.Forward) == Map(
      100L -> Some(1.0), 101L -> Some(1.0), 102L -> Some(2.0),
      103L -> Some(2.0), 104L -> None, 200L -> None))
  }

  test("nearest: closer side wins; exact midpoint ties backward") {
    // 10:04 -> backward 4min vs forward 6min: backward (1.0)
    // 10:06 -> backward 6min vs forward 4min: forward (2.0)
    // 10:05 would tie -> backward by contract
    assert(run(AsOf.Nearest) == Map(
      100L -> Some(1.0), 101L -> Some(1.0), 102L -> Some(1.0),
      103L -> Some(2.0), 104L -> Some(2.0), 200L -> None))
    val tie = AsOf.join(
      Seq((1L, 105L, ts("10:05:00"))).toDF("k", "pid", "pts"),
      refs, Seq("k"), "pts", "rts", "rv", AsOf.Nearest)
      .select("rv_asof").as[Option[Double]].head()
    assert(tie == Some(1.0))
  }

  test("tolerance nulls matches beyond the window") {
    // backward with 5-minute tolerance: 10:20 is 10min from 10:10 -> null
    assert(run(AsOf.Backward, tol = Some(300)) == Map(
      100L -> None, 101L -> Some(1.0), 102L -> Some(1.0),
      103L -> None, 104L -> None, 200L -> None))
  }
}
