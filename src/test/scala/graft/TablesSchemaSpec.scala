package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables

/** Regression guard for the two physical vintages of `events.ts` the driver
  * testdata has shipped as (VERDICT r8 item 2):
  *
  *   - parquet TIMESTAMP(NANOS) — surfaces as a nanosecond LongType under
  *     `spark.sql.legacy.parquet.nanosAsLong` (simulated here by writing a
  *     bare long column: the reader-visible schema is identical);
  *   - parquet timestamp[us], isAdjustedToUTC=false — surfaces as
  *     TIMESTAMP_NTZ (what pandas/pyarrow writes today).
  *
  * [[Tables.t]] must read BOTH to the same session-zoned TimestampType rows.
  * The environment has changed shape once already; this pins the contract so
  * a future flip either way stays green.
  */
class TablesSchemaSpec extends SparkSpec {

  private val micros: Seq[Long] = Seq(
    0L, // epoch
    1700000000000000L, // 2023-11-14T22:13:20Z
    1700000000123456L, // sub-second precision survives
    -86400000000L) // pre-epoch

  private def writeVintage(kind: String): String = {
    val dir = Files.createTempDirectory(s"graft-events-$kind").toFile
    dir.deleteOnExit()
    val base = spark.range(micros.length).toDF("event_id")
      .withColumn("us", element_at(
        lit(micros.toArray), col("event_id").cast("int") + 1))
      .withColumn("user_id", col("event_id") % 2)
      .withColumn("event_type", lit("view"))
      .withColumn("value", col("event_id").cast("double"))
      .withColumn("props", lit("{}"))
    val withTs = kind match {
      case "nanos" => // nanos-as-long vintage: long column holding ts * 1000
        base.withColumn("ts", col("us") * 1000L)
      case "ntz" => // timestamp[us] vintage: Spark writes TimestampNTZType
        // as parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
        base.withColumn("ts",
          timestamp_micros(col("us")).cast(TimestampNTZType))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  test("Tables.t reads nanos-long and timestamp[us] events to identical rows") {
    val nanosDir = writeVintage("nanos")
    val ntzDir = writeVintage("ntz")

    val a = Tables.t(spark, nanosDir, "events")
    val b = Tables.t(spark, ntzDir, "events")

    assert(a.schema("ts").dataType === TimestampType)
    assert(b.schema("ts").dataType === TimestampType)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1)))

    val ra = rows(a)
    assert(ra === rows(b))
    assert(ra.map(_._2) === micros)
  }

  test("driver testdata events reads to TimestampType with sane bounds") {
    val ev = Tables.t(spark, sf, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    val Row(lo: java.sql.Timestamp, hi: java.sql.Timestamp, n: Long) =
      ev.agg(min("ts"), max("ts"), count(lit(1))).head()
    assert(n > 0)
    // the driver generates recent event streams; a unit slip (ns read as us
    // or vice versa) would throw this range off by x1000
    assert(lo.getTime > 0L)
    assert(hi.getTime < 4102444800000L) // < year 2100 in millis
  }
}
