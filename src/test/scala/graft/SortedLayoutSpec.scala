package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.engine.{Sinks, Tables}

/** Min/max file skipping on the range-sorted layout (Sinks.writeRangeSorted):
  * after `repartitionByRange + sortWithinPartitions`, every parquet file
  * covers one narrow key band, so its footer min/max statistics let a range
  * predicate skip whole files' row-groups at scan time. The proof is the
  * scan METRIC, not the final answer: the scan over the sorted layout emits
  * only the overlapping band's rows, while the same predicate over a
  * round-robin layout must emit every row-group (all files overlap the
  * range) and leave the trimming to the post-scan Filter.
  *
  * This is the value-range complement of SinksSpec's hive partition pruning
  * and DppSpec's dynamic pruning — and the executable half of what
  * q_zorder_layout grades analytically. */
class SortedLayoutSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_sorted").toString

  /** Rows the parquet scan actually emitted (post row-group skipping). */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    scan.metrics("numOutputRows").value
  }

  test("range predicate skips non-overlapping files of the sorted layout") {
    val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val total = li.count()
    val keys = li.agg(min("l_orderkey"), max("l_orderkey")).head()
    val (lo, hi) = (keys.getLong(0), keys.getLong(1))
    // a band covering ~1/8 of the key range, aligned with nFiles = 8
    val bandLo = lo + (hi - lo) * 3 / 8
    val bandHi = lo + (hi - lo) * 4 / 8

    val sortedDir = tmp()
    val randomDir = tmp()
    Sinks.writeRangeSorted(li, sortedDir, nFiles = 8, Seq("l_orderkey"))
    li.repartition(8).write.mode("overwrite").parquet(randomDir) // control

    def pred(df: DataFrame) = df.filter(col("l_orderkey").between(bandLo, bandHi))
    val sortedScan = scanRows(pred(spark.read.parquet(sortedDir)))
    val randomScan = scanRows(pred(spark.read.parquet(randomDir)))
    val matching = li.filter(col("l_orderkey").between(bandLo, bandHi)).count()

    // the sorted layout's scan emitted only the touched band (≤ 2 of 8
    // files can overlap a 1/8 band boundary), the random layout's scan
    // emitted everything — min/max skipping did the work
    assert(sortedScan >= matching, s"scan must cover all $matching matches")
    assert(sortedScan <= total / 2,
      s"sorted layout: scan emitted $sortedScan of $total rows — no skipping?")
    assert(randomScan == total,
      s"control: round-robin layout should emit all $total rows, got $randomScan")
    // and both layouts agree on the answer
    assert(pred(spark.read.parquet(sortedDir)).count() == matching)
    assert(pred(spark.read.parquet(randomDir)).count() == matching)
  }
}
