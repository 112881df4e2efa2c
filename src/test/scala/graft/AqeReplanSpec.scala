package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** AQE runtime re-planning — the third piece of adaptive-execution
  * evidence next to DppSpec (dynamic partition pruning reaching the fact
  * scan) and DedupSpec's skew-join case (hot-key replication): a join
  * whose dim side is only knowably small at RUNTIME — static broadcast
  * disabled entirely, the situation of a filtered dim with no stats —
  * must be rewritten from the planned sort-merge join to a broadcast
  * hash join once the dim's shuffle stage materializes and reports its
  * true size. On a 1000-executor cluster this is the difference between
  * shuffling the 100-TB fact side on the join key and shipping a few MB
  * to every executor; asserting it here pins that the engine's session
  * conf never regresses the adaptive path away. */
class AqeReplanSpec extends SparkSpec {

  test("AQE rewrites a sort-merge join to broadcast when the dim materializes small") {
    val confs = Map(
      // no STATIC broadcast: the planner must commit to a shuffled join
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // ...but the RUNTIME re-optimizer may broadcast a stage that
      // materialized under 1MB — the production posture for unstatted dims
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1048576")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.t(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity")
      val dim = Tables.t(spark, sf, "part").filter(col("p_size") >= 1)
        .select("p_partkey", "p_brand")
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
      val before = joined.queryExecution.executedPlan.toString
      assert(before.contains("isFinalPlan=false") &&
        before.contains("SortMergeJoin"),
        s"expected an initial sort-merge plan:\n${before.take(800)}")
      // execute THIS DataFrame (collect, not count — count builds a new
      // queryExecution and would leave `joined`'s adaptive plan unfinalized)
      assert(joined.collect().nonEmpty, "join must produce rows (non-vacuous)")
      val after = joined.queryExecution.executedPlan.toString
      // the printed adaptive plan carries BOTH sections; judge the final
      // one only (the initial section legitimately still shows the SMJ)
      val finalSection = after.split("== Initial Plan ==").head
      assert(after.contains("isFinalPlan=true") &&
        finalSection.contains("BroadcastHashJoin"),
        s"AQE did not re-plan to broadcast:\n${after.take(1200)}")
      assert(!finalSection.contains("SortMergeJoin"),
        "the sort-merge join must be gone from the final plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
