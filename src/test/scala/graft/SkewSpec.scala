package graft

import org.apache.spark.sql.functions._
import graft.engine.{Skew, Tables}

/** Salting must change the shuffle shape, never the answer. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals plain aggregation") {
    val ev = Tables.t(spark, sf, "events")
    val plain = ev.groupBy("user_id")
      .agg(sum("value").as("sum_value"), count(lit(1)).as("n_rows"))
      .orderBy("user_id").as[(Long, Double, Long)].collect().toSeq
    val salted = Skew.saltedSumCount(ev, Seq("user_id"), "value",
        discriminator = col("event_id"), salts = 8)
      .orderBy("user_id")
      .select(col("user_id"), col("sum_value"), col("n_rows"))
      .as[(Long, Double, Long)].collect().toSeq
    assert(salted.map(_._1) == plain.map(_._1))
    assert(salted.map(_._3) == plain.map(_._3))
    // double sums may differ in the last ulps (different add order by design)
    salted.lazyZip(plain).foreach { (s, p) =>
      assert(math.abs(s._2 - p._2) <= 1e-9 * math.max(1.0, math.abs(p._2)))
    }
  }

  test("saltedJoin equals plain join") {
    val ev = Tables.t(spark, sf, "events").select("event_id", "user_id", "value")
    // a non-broadcast-shaped dim: one row per user
    val dim = ev.groupBy("user_id").agg(max("value").as("user_max"))
    val plain = ev.join(dim, "user_id")
      .select("event_id", "user_max").orderBy("event_id")
      .as[(Long, Double)].collect().toSeq
    val salted = Skew.saltedJoin(ev, dim, "user_id",
        factDiscriminator = col("event_id"), salts = 4)
      .select("event_id", "user_max").orderBy("event_id")
      .as[(Long, Double)].collect().toSeq
    assert(salted == plain)
  }
}
