package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.StatQueries

/** q_ols2_daily on an exactly-linear planted model: the closed-form
  * normal-equation solve must recover the coefficients with zero ppm
  * error (every division is remainder-free on this fixture). */
class OlsSpec extends SparkSpec {

  test("two-feature OLS recovers a planted y = 2*views + clicks + 3") {
    val d = Files.createTempDirectory("graft-ols").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val base = java.time.Instant.parse("2024-01-01T12:00:00Z")
    val views = Seq(1, 2, 3, 4, 5, 6)
    val clicks = Seq(2, 1, 2, 1, 2, 1)
    var id = 0L
    val rows = (0 until 6).flatMap { day =>
      val y = 2 * views(day) + clicks(day) + 3
      val mk = (ty: String, c: Int) => (0 until c).map { _ =>
        id += 1
        Row(id, id % 3, Timestamp.from(base.plusSeconds(day * 86400L)), ty,
          1.0, "{}")
      }
      mk("view", views(day)) ++ mk("click", clicks(day)) ++ mk("purchase", y)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = StatQueries.ols2Daily.build(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_days") == 6L)
    assert(r.head.getAs[Long]("beta_view_ppm") == 2000000L)
    assert(r.head.getAs[Long]("beta_click_ppm") == 1000000L)
    assert(r.head.getAs[Long]("alpha_ppm") == 3000000L)
  }
}
