package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.WindowQueries

/** Pins the distribution-rank semantics the oracle can't state: exact
  * integer percent_rank/cume_dist against hand-computed positions, the
  * single-row-partition guard, and ntile's balanced bucket sizes. */
class WindowNtileSpec extends SparkSpec {

  test("ntile/pct_rank/cume: hand-computed positions, n=1 guard") {
    val d = Files.createTempDirectory("graft-ntile").toString
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType)))
    // nation 1: five suppliers, balances 10 < 20 < 30 < 40 < 50
    // nation 2: a single supplier (the n = 1 guard path)
    val rows = (1 to 5).map(i => Row(i.toLong, 1, i * 10.0)) :+ Row(9L, 2, 77.0)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/supplier.parquet")
    val got = WindowQueries.windowNtile.build(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // n=5: pct_rank = (rank-1)*1e6 DIV 4 -> 0, 250000, 500000, 750000, 1000000
    //      cume    = rn*1e6 DIV 5      -> 200000, 400000, 600000, 800000, 1000000
    // ntile(4) over 5 rows: buckets sized 2,1,1,1
    assert(got((1, 1L)) == ((1L, 0L, 200000L)))
    assert(got((1, 2L)) == ((1L, 250000L, 400000L)))
    assert(got((1, 3L)) == ((2L, 500000L, 600000L)))
    assert(got((1, 4L)) == ((3L, 750000L, 800000L)))
    assert(got((1, 5L)) == ((4L, 1000000L, 1000000L)))
    assert(got((2, 9L)) == ((1L, 0L, 1000000L)), "single-row partition guard")
  }
}
