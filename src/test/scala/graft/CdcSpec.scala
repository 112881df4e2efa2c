package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.EventQueries

/** Pins the CDC merge semantics the oracle can't state: delete tombstones,
  * blind delta-over-base override, and the incremental == full-compaction
  * invariant (matches_full) on both crafted and real logs. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private def eventsDir(rows: Seq[(Long, Timestamp, String, Double)]): String = {
    val dir = Files.createTempDirectory("cdc-spec").toString
    // ts stored as NANOSECOND longs, matching the driver testdata layout
    rows.toDF("user_id", "ts0", "event_type", "value")
      .select(unix_micros(col("ts0")).as("event_id"),
        (unix_micros(col("ts0")) * 1000).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("""{"k":"1"}""").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("cdc merge: upsert/delete/override semantics on a crafted log") {
    // time range 10:00-10:58, so the midpoint cut falls at 10:29 — minutes
    // 0-10 land in the BASE epoch, 50-58 in the DELTA epoch
    val dir = eventsDir(Seq(
      (1L, ts(0), "signup", 1.0), (1L, ts(55), "purchase", 5.0), // delta overrides
      (2L, ts(1), "signup", 2.0), (2L, ts(5), "purchase", 3.0),
      (2L, ts(58), "error", 0.0), // delta delete tombstones
      (3L, ts(2), "signup", 7.0), // base only — survives unchanged
      (4L, ts(56), "signup", 9.0), // delta only — fresh insert
      (5L, ts(3), "view", 4.0), (5L, ts(57), "click", 4.0))) // reads: absent
    val rows = EventQueries.cdcMerge.build(spark, dir)
      .select("user_id", "merged_op", "merged_value", "merged_deleted", "matches_full")
      .as[(Long, String, Option[Double], Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L), "only mutating keys appear")
    assert(rows(1L) == ((1L, "upsert", Some(5.0), false, true)))
    assert(rows(2L) == ((2L, "delete", None, true, true)))
    assert(rows(3L) == ((3L, "upsert", Some(7.0), false, true)))
    assert(rows(4L) == ((4L, "upsert", Some(9.0), false, true)))
  }

  test("cdc merge: incremental result == full compaction on the real log") {
    val rows = EventQueries.cdcMerge.build(spark, sf)
      .select("matches_full").as[Boolean].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(identity),
      "delta-over-base must agree with one-pass compaction everywhere")
  }
}
