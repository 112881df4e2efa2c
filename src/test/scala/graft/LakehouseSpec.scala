package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.queries.LakehouseQueries

/** Pins the lakehouse-primitive semantics the oracle can't state: SCD2
  * interval chaining / single-current invariants, bitmap word-boundary
  * bit placement (bit 63, word crossings), and the adaptive-Bloom ladder
  * actually ADAPTING the filter size to the build cardinality. */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private def eventsDir(rows: Seq[(Long, Timestamp, String, Double)]): String = {
    val dir = Files.createTempDirectory("lakehouse-spec").toString
    // ts stored as NANOSECOND longs, matching the driver testdata layout
    rows.toDF("user_id", "ts0", "event_type", "value")
      .select(unix_micros(col("ts0")).as("event_id"),
        (unix_micros(col("ts0")) * 1000).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("""{"k":"1"}""").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("scd2: versions chain, tombstones are versions, one current per key") {
    val dir = eventsDir(Seq(
      (1L, ts(0), "signup", 1.0), (1L, ts(5), "purchase", 2.0),
      (1L, ts(9), "error", 0.0), (1L, ts(20), "signup", 3.0),
      (2L, ts(1), "signup", 4.0),
      (3L, ts(2), "view", 9.0))) // read event: not a change, no versions
    val rows = LakehouseQueries.scd2Build.build(spark, dir)
      .as[(Long, Long, String, Double, Timestamp, Option[Timestamp], Boolean)]
      .collect()
    assert(rows.map(_._1).toSet == Set(1L, 2L), "only mutating keys versioned")
    val k1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(k1.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L), "dense version numbers")
    assert(k1.map(_._3).toSeq == Seq("upsert", "upsert", "delete", "upsert"),
      "tombstone keeps its place in history")
    // intervals chain: each valid_to equals the NEXT version's valid_from
    k1.sliding(2).foreach { case Array(a, b) =>
      assert(a._6.contains(b._5), s"interval chain broken at version ${a._2}")
    }
    assert(k1.count(_._7) == 1 && k1.last._7, "exactly the last version current")
    assert(rows.filter(_._1 == 2L).map(r => (r._2, r._7)).toSeq == Seq((1L, true)))
  }

  test("scd2 on real data: dense versions, single current, ordered intervals") {
    val df = LakehouseQueries.scd2Build.build(spark, sf).cache()
    try {
      val bad = df.groupBy("user_id")
        .agg(max("version").as("mx"), count(lit(1)).as("n"),
          sum(when(col("is_current"), 1).otherwise(0)).as("cur"))
        .filter(col("mx") =!= col("n") || col("cur") =!= 1)
        .count()
      assert(bad == 0, "every key: dense versions and exactly one current row")
      val unordered = df.filter(col("valid_to").isNotNull &&
        col("valid_to") <= col("valid_from")).count()
      assert(unordered == 0, "validity intervals strictly forward")
    } finally df.unpersist()
  }

  test("bitmap overlap: word boundaries and bit 63 place correctly") {
    // users 63 (bit 63 of word 0 — the sign bit), 64 (bit 0 of word 1),
    // 127/128 (next boundary): overlap of the two segments is {63, 128}
    val dir = eventsDir(Seq(
      (63L, ts(0), "view", 1.0), (64L, ts(1), "view", 1.0),
      (128L, ts(2), "view", 1.0),
      (63L, ts(3), "click", 1.0), (127L, ts(4), "click", 1.0),
      (128L, ts(5), "click", 1.0)))
    val rows = LakehouseQueries.bitmapOverlap.build(spark, dir)
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(rows.toSeq == Seq(("click", "view", 2L, 2L, true)))
  }

  test("bitmap overlap on real data: bitmap count == naive count, all pairs") {
    val rows = LakehouseQueries.bitmapOverlap.build(spark, sf)
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(rows.length == 10, "C(5,2) segment pairs")
    assert(rows.forall(_._5), "bitmap intersection exact on every pair")
    assert(rows.exists(_._3 > 0), "audiences genuinely intersect")
  }

  test("adaptive bloom: filter size tracks build cardinality up the ladder") {
    def log(nMembers: Int, nOthers: Int) = eventsDir(
      (1 to nMembers).map(i => (i.toLong, ts(0), "purchase", 1.0)) ++
        (1 to nOthers).map(i => ((100000 + i).toLong, ts(1), "view", 1.0)))
    val small = LakehouseQueries.adaptiveBloom.build(spark, log(40, 400))
      .as[(Double, Long, Long, Long, Long, Long, Long, Boolean)].head()
    val large = LakehouseQueries.adaptiveBloom.build(spark, log(3000, 400))
      .as[(Double, Long, Long, Long, Long, Long, Long, Boolean)].head()
    // (est, bits, n_users, n_members, fp, n_nonmembers, fpp_ppm, no_fn)
    assert(small._2 == 1024L, s"40-key build sizes to the 2^10 floor: $small")
    assert(large._2 > small._2, "3000-key build must climb the ladder")
    assert((large._2 & (large._2 - 1)) == 0, "ladder yields a power of two")
    for (r <- Seq(small, large)) {
      assert(r._8, "no false negatives, ever")
      assert(r._7 <= 60000, s"~16 bits/key holds FPP low, got ${r._7} ppm")
    }
  }

  test("pit join: probes see the state AT their time, never future state") {
    val dir = eventsDir(Seq(
      (1L, ts(0), "view", 0.0), // before any change: no state
      (1L, ts(2), "signup", 7.0),
      (1L, ts(3), "view", 0.0), // sees the signup (value 7)
      (1L, ts(5), "purchase", 9.0),
      (1L, ts(5), "view", 0.0), // change at the SAME ts is visible (kind order)
      (1L, ts(7), "error", 0.0),
      (1L, ts(8), "view", 0.0), // after tombstone: deleted -> null value
      (1L, ts(20), "signup", 3.0),
      (1L, ts(21), "view", 0.0))) // resurrection visible
    val rows = LakehouseQueries.pitJoin.build(spark, dir)
      .as[(Long, Long, Timestamp, Option[Timestamp], Option[String],
        Option[Double], Boolean)].collect().sortBy(_._3.getTime)
    assert(rows.map(r => (r._5, r._6, r._7)).toSeq == Seq(
      (None, None, false),
      (Some("upsert"), Some(7.0), true),
      (Some("upsert"), Some(9.0), true),
      (Some("delete"), None, false),
      (Some("upsert"), Some(3.0), true)))
    // version_ts is the matched change's OWN time, not the probe's
    assert(rows(1)._4.contains(ts(2)) && rows(4)._4.contains(ts(20)))
  }

  test("twap: duration-weighted mean, tombstone gaps excluded, exact cents") {
    val dir = eventsDir(Seq(
      // user 1: value 10 for 10 min, then 40 for 20 min, tombstone at 30,
      // dead gap to 50, value 100 for 8 min (window closes at the view @58)
      (1L, ts(0), "signup", 10.0),
      (1L, ts(10), "purchase", 40.0),
      (1L, ts(30), "error", 0.0),
      (1L, ts(50), "signup", 100.0),
      (9L, ts(58), "view", 0.0))) // pushes the global window end to minute 58
    val r = LakehouseQueries.twap.build(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(r.length == 1 && r.head._1 == 1L)
    val (_, n, liveUs, twap) = r.head
    assert(n == 3, "three live intervals (the tombstone's is excluded)")
    assert(liveUs == (10L + 20L + 8L) * 60000000L)
    // numerator in cent-microseconds, denominator in microseconds*100 —
    // the exact integer operands the query divides
    val num = (1000L * 600000000L + 4000L * 1200000000L +
      10000L * 480000000L).toDouble
    assert(twap == num / (liveUs.toDouble * 100),
      "exact integer-operand division")
    assert(math.abs(twap - 1700.0 / 38) < 1e-12)
  }

  test("incremental agg: mid-split merge equals recompute, one-sided keys kept") {
    def at(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // old-only day (10th), delta-only day (25th), and the boundary day
    // (21st) with rows STRADDLING the 12:00 split — min on one side, max
    // on the other, so the cross-side monoid fold is what produces them
    val dir = eventsDir(Seq(
      (1L, at(10, 9), "view", 5.00), (1L, at(10, 10), "view", 1.25),
      (2L, at(25, 9), "click", 7.00),
      (3L, at(21, 8), "view", 0.50),  // boundary day, old side (the min)
      (3L, at(21, 11), "view", 2.00), // boundary day, old side
      (3L, at(21, 13), "view", 9.75), // boundary day, delta side (the max)
      (3L, at(21, 23), "view", 3.00))) // boundary day, delta side
    val got = LakehouseQueries.incrementalAgg.build(spark, dir)
      .as[(String, java.sql.Date, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2.toString) -> (r._3, r._4, r._5, r._6)).toMap
    assert(got(("view", "2024-01-10")) == ((2L, 625L, 125L, 500L)),
      "old-only key survives the merge untouched")
    assert(got(("click", "2024-01-25")) == ((1L, 700L, 700L, 700L)),
      "delta-only key appears through the merge")
    assert(got(("view", "2024-01-21")) == ((4L, 1525L, 50L, 975L)),
      "boundary day folds across the split: count/sum add, min old, max delta")
    assert(got.size == 3)
  }

  test("adaptive bloom on real data: guarantees hold, geometry from ladder") {
    val r = LakehouseQueries.adaptiveBloom.build(spark, sf)
      .as[(Double, Long, Long, Long, Long, Long, Long, Boolean)].head()
    assert(r._8, "no false negatives on the real log")
    assert((r._2 & (r._2 - 1)) == 0 && r._2 >= 1024L && r._2 <= (1L << 20))
    assert(r._5 <= r._6, "false positives bounded by the non-member pool")
  }
}
