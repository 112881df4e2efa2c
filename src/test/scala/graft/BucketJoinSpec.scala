package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.engine.{Sinks, Tables}

/** Executed-plan evidence for the bucketed-table layout (Sinks.writeBucketed):
  * a fact/fact join between two tables pre-bucketed on the join key plans
  * with ZERO shuffle exchanges, and — because writeBucketed lands one sorted
  * file per bucket — ZERO sorts under the sort-merge join. At 100 TB this is
  * the single biggest shuffle eliminator a lakehouse layout offers: every
  * repeated join on the bucketed key becomes a local zip of bucket pairs.
  *
  * AQE is off for the suite body so the executed plan is the traversable
  * physical tree (the assertion is about static bucketed planning, not
  * runtime re-planning — AqeReplanSpec covers that); broadcast is off so the
  * join is the fact/fact sort-merge shape the layout exists for. */
class BucketJoinSpec extends SparkSpec {

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect { case e: ShuffleExchangeExec => e }
  private def sorts(p: SparkPlan): Seq[SortExec] =
    p.collect { case s: SortExec => s }

  /** Force an executed physical plan (AQE disabled here, so executedPlan is
    * the final tree) and return it after running the query. */
  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan
  }

  test("pre-bucketed fact/fact join runs with zero Exchange and zero Sort") {
    val conf = spark.conf
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // expose the per-bucket sort order from the scan (Spark hides it by
    // default because multi-file buckets would need a merge; writeBucketed
    // guarantees one file per bucket, making the order real)
    conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val lineitem = Tables.t(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val orders = Tables.t(spark, sf, "orders")
        .select("o_orderkey", "o_orderdate")
      Sinks.writeBucketed(lineitem, "lineitem_bj", 8, Seq("l_orderkey"))
      Sinks.writeBucketed(orders, "orders_bj", 8, Seq("o_orderkey"))

      // one file per bucket: the repartition aligned write tasks with
      // bucket ids, so the sorted-scan precondition holds
      for (tbl <- Seq("lineitem_bj", "orders_bj")) {
        val loc = spark.sql(s"DESCRIBE FORMATTED $tbl").collect()
          .find(_.getString(0) == "Location").get.getString(1)
        val files = new java.io.File(new java.net.URI(loc)).listFiles()
          .count(_.getName.endsWith(".parquet"))
        assert(files == 8, s"$tbl: expected 8 bucket files, got $files")
      }

      // fact/fact join + per-key aggregate: the bucket partitioning must
      // satisfy BOTH the join distribution and the aggregation, so the
      // whole pipeline plans without a single exchange or sort
      val joined = spark.table("lineitem_bj")
        .join(spark.table("orders_bj"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      val plan = executed(joined)
      assert(plan.toString.contains("SortMergeJoin"),
        s"expected a sort-merge join:\n${plan.toString.take(800)}")
      assert(shuffles(plan).isEmpty,
        s"bucketed join must have zero Exchange:\n${plan.toString.take(800)}")
      assert(sorts(plan).isEmpty,
        s"sorted one-file buckets must eliminate Sort:\n${plan.toString.take(800)}")

      // negative control: the same join with a PLAIN side still shuffles
      // (and sorts) that side — the zero above is the layout, not the conf
      val half = spark.table("lineitem_bj")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
      val halfPlan = executed(half)
      assert(shuffles(halfPlan).nonEmpty && sorts(halfPlan).nonEmpty,
        "half-bucketed control should still shuffle+sort the plain side")

      // answers identical to the plain shuffled join
      val expect = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
        .orderBy("o_orderkey").collect().toSeq
      assert(joined.orderBy("o_orderkey").collect().toSeq == expect)
    } finally {
      conf.unset("spark.sql.adaptive.enabled")
      conf.unset("spark.sql.autoBroadcastJoinThreshold")
      conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS lineitem_bj")
      spark.sql("DROP TABLE IF EXISTS orders_bj")
    }
  }

  test("point predicate on the bucket key scans exactly one bucket file") {
    // a bare point lookup has no join/agg whose distribution bucketing
    // would serve, so the DisableUnnecessaryBucketedScan rule turns the
    // bucketed scan (and with it, bucket PRUNING) off; force it on — a
    // production point-lookup path on a bucketed table would do the same
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val customer = Tables.t(spark, sf, "customer")
        .select("c_custkey", "c_mktsegment")
      Sinks.writeBucketed(customer, "customer_bp", 8, Seq("c_custkey"))
      val key = customer.orderBy("c_custkey").limit(1)
        .collect().head.getLong(0)
      val q = spark.table("customer_bp").filter(col("c_custkey") === key)
      q.collect()
      // bucket pruning: the scan lists 1 of 8 buckets, and since
      // writeBucketed lands one file per bucket, reads exactly one file
      val scan = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      assert(scan.toString.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning missing from scan:\n${scan.toString.take(500)}")
      // numFiles is recorded from the pre-prune listing, so the proof that
      // only the key's bucket was READ is the scan's emitted rows: one
      // bucket's worth (~1/8 of the table), not the whole table — parquet
      // min/max can't do this (hashing spreads the key range over every
      // bucket file; a plain scan of the same data emits all rows)
      val total = customer.count()
      val scanRows = scan.metrics("numOutputRows").value
      assert(scanRows <= total / 4 && scanRows > 0,
        s"bucket-pruned scan emitted $scanRows of $total rows — no pruning?")
      assert(q.count() == customer.filter(col("c_custkey") === key).count())
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS customer_bp")
    }
  }
}
