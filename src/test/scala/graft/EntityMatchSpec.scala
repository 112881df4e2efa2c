package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.AdvancedJoinQueries

/** Pins the record-linkage semantics the oracle can't state: the
  * Fellegi-Sunter verdict ladder on crafted dirty duplicates, blocking
  * isolation across nation/segment/band, the candidate filter (evidence
  * on at least one field), and the oversized-block df-cut. */
class EntityMatchSpec extends SparkSpec {

  private def writeCustomers(rows: Seq[Row]): String = {
    val d = Files.createTempDirectory("graft-em").toString
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    d
  }

  private def run(rows: Seq[Row]): Map[(Long, Long), (Long, Long, Long, String)] =
    AdvancedJoinQueries.entityMatch.build(spark, writeCustomers(rows))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap

  test("verdict ladder: match / possible / non_match on crafted dirty dups") {
    val got = run(Seq(
      Row(1L, "Customer#000000010", 1, 5000.00, "BUILDING"),
      Row(2L, "Customer#000000011", 1, 5004.00, "BUILDING"), // 1 edit, $4
      Row(3L, "Customer#000000099", 1, 5008.00, "BUILDING"), // 2 edits, $8
      Row(4L, "Customer#000000012", 1, 5950.00, "BUILDING"), // 1 edit, $950 off
      Row(5L, "Customer#000000777", 1, 5003.00, "BUILDING"), // 3 edits, $3
      Row(6L, "Customer#000000010", 2, 5000.00, "BUILDING"), // other nation
      Row(7L, "Customer#000000010", 1, 5000.00, "MACHINERY"), // other segment
      Row(8L, "Customer#000000010", 1, 5000.50, "BUILDING"))) // exact name twin
    // both evidence fields agree -> match
    assert(got((1L, 8L)) == ((0L, 50L, 40L, "match")), "exact-name twin")
    assert(got((1L, 2L)) == ((1L, 400L, 40L, "match")))
    assert(got((1L, 3L)) == ((2L, 800L, 40L, "match")))
    // name agrees, balance far -> possible
    assert(got((1L, 4L)) == ((1L, 95000L, 20L, "possible")))
    // balance close, name far -> weak evidence stays non_match
    assert(got((1L, 5L)) == ((3L, 300L, 8L, "non_match")))
    // no-evidence pair (3 edits AND $947 apart > $10) is filtered out
    assert(!got.contains((4L, 5L)), "non-evidence pair never emitted")
    // blocking isolation: keys 6 (nation) and 7 (segment) pair with no one
    assert(!got.keys.exists(p => p._1 == 6L || p._2 == 6L))
    assert(!got.keys.exists(p => p._1 == 7L || p._2 == 7L))
    assert(got.size == 14, "all 15 in-block pairs minus the non-evidence one")
  }

  test("entity resolve: closure over accepted links, survivorship, review flag") {
    val rows = Seq(
      // {1,2,3,8} link at match strength; 4 joins through possible links
      Row(1L, "Customer#000000010", 1, 5000.00, "BUILDING"),
      Row(2L, "Customer#000000011", 1, 5004.00, "BUILDING"),
      Row(3L, "Customer#000000099", 1, 5008.00, "BUILDING"),
      Row(8L, "Customer#000000010", 1, 5000.50, "BUILDING"),
      Row(4L, "Customer#000000012", 1, 5950.00, "BUILDING"), // possible; richest
      Row(5L, "Customer#000000777", 1, 5003.00, "BUILDING"), // non_match only
      // cluster {20,21}: match-strength link, exact balance tie
      Row(20L, "Customer#000000500", 5, 1000.00, "BUILDING"),
      Row(21L, "Customer#000000501", 5, 1000.00, "BUILDING"))
    val got = AdvancedJoinQueries.entityResolve
      .build(spark, writeCustomers(rows)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getInt(4), r.getLong(5),
          r.getBoolean(6)))
      .toMap
    assert(got(1L) == ((5L, 4L, "Customer#000000012", 1, 595000L, true)),
      "possible links pull 4 into the entity; weakest link flags review")
    assert(got(20L) == ((2L, 20L, "Customer#000000500", 5, 100000L, false)),
      "all-match entity auto-merges; balance tie breaks to the smaller key")
    assert(got.size == 2, "rejected (non_match) links never form entities")
  }

  test("df-cut: a block over 256 members is dropped, small blocks survive") {
    val big = (0 until 257).map(i =>
      Row(100L + i, "Customer#000000500", 9, 1000.0, "BUILDING"))
    val small = Seq(
      Row(1L, "Customer#000000010", 1, 5000.00, "BUILDING"),
      Row(2L, "Customer#000000011", 1, 5004.00, "BUILDING"))
    val got = run(big ++ small)
    assert(got.keySet == Set((1L, 2L)),
      "oversized block contributes zero pairs; the small block still links")
  }
}
