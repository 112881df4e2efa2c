package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.EventQueries

/** Pins the funnel's STRICT ordering semantics (each stage must follow the
  * previous one in event time) that the oracle can't state. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private def eventsDir(rows: Seq[(Long, Timestamp, String)]): String = {
    val dir = Files.createTempDirectory("funnel-spec").toString
    // ts is stored as NANOSECOND longs, matching the driver testdata layout
    // Tables.t normalizes (`ts div 1000` -> timestamp_micros)
    rows.toDF("user_id", "ts0", "event_type")
      .select(unix_micros(col("ts0")).as("event_id"),
        (unix_micros(col("ts0")) * 1000).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("""{"k":"1"}""").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel: stages require strict temporal progression") {
    val dir = eventsDir(Seq(
      // user 1: full funnel in order -> stage 3
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // user 2: purchase BEFORE the click -> stage stops at 2
      (2L, ts(0), "view"), (2L, ts(2), "click"), (2L, ts(1), "purchase"),
      // user 3: click before any view -> stage stops at 1
      (3L, ts(1), "view"), (3L, ts(0), "click"),
      // user 4: never viewed -> stage 0
      (4L, ts(0), "click"), (4L, ts(1), "purchase")))
    val got = EventQueries.eventFunnel.build(spark, dir)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L), s"got $got")
  }

  test("funnel agrees with a sequential model on random event streams") {
    val rnd = new scala.util.Random(20260813L)
    val types = Array("view", "click", "purchase", "error", "signup")
    val events = (1 to 300).map { i =>
      (1L + rnd.nextInt(12), ts(rnd.nextInt(60)), types(rnd.nextInt(types.length)))
    }.distinct // duplicate (user, ts, type) rows would make min-ties ambiguous
    // sequential model: anchor-chained first-occurrence scan per user
    val want = events.groupBy(_._1).map { case (u, evs) =>
      val sorted = evs.sortBy(_._2.getTime)
      var stage = 0L
      var anchor = Long.MinValue
      for ((_, t, ty) <- sorted) {
        val steps = Seq("view", "click", "purchase")
        if (stage < 3 && ty == steps(stage.toInt) &&
            (stage == 0L || t.getTime > anchor)) {
          stage += 1; anchor = t.getTime
        }
      }
      u -> stage
    }
    val dir = eventsDir(events)
    val got = EventQueries.eventFunnel.build(spark, dir)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(got == want, s"diff: ${(got.toSet diff want.toSet).take(3)} vs " +
      s"${(want.toSet diff got.toSet).take(3)}")
  }

  test("funnel: a later same-type event can satisfy the stage") {
    // user's SECOND view is followed by the click, even though the first
    // view is too — min(t_view) is the anchor, so both orderings pass
    val dir = eventsDir(Seq(
      (1L, ts(0), "view"), (1L, ts(5), "view"), (1L, ts(3), "click")))
    val got = EventQueries.eventFunnel.build(spark, dir)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(got(1L) == 2L)
  }
}
