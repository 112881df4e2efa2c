package graft

import org.apache.spark.sql.functions._
import graft.engine.Dedup

/** Connected-components dedup resolution: chains, separate components,
  * singletons, and canonical flags. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("components: chain collapses to its minimum; components stay apart") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, triangle 20-21-22
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L)).toDF("a", "b")
    val comp = Dedup.components(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L), s"$comp")
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(comp(_) == 20L))
  }

  test("components: a 400-deep chain converges inside the default cap") {
    // pointer jumping makes rounds O(log diameter); plain neighbor
    // propagation would need 200 double-rounds here and trip the cap —
    // the 1M-doc stress probe's failure mode, kept as a regression test
    val edges = (0L until 400L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Dedup.components(edges).as[(Long, Long)].collect().toMap
    assert(comp.size == 401 && comp.values.forall(_ == 0L), s"${comp.take(5)}")
  }

  test("components: an id appearing only in self-loop edges is kept") {
    val edges = Seq((5L, 5L), (1L, 2L)).toDF("a", "b")
    val comp = Dedup.components(edges).as[(Long, Long)].collect().toMap
    assert(comp == Map(5L -> 5L, 1L -> 1L, 2L -> 1L), s"$comp")
  }

  test("resolve: docs get cluster + canonical flag; singletons self-cluster") {
    val docs = Seq(1L, 2L, 3L, 7L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Dedup.resolve(docs, "doc_id", edges)
      .select("doc_id", "cluster", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (7L, 7L, true)))
  }

  test("components == union-find on random graphs (seeded sweep)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = (0 until 70).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> {
          // min node in the component (union-find root is min by union rule)
          find(id.toInt).toLong
        }).toMap
      val got = Dedup.components(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("end-to-end: exact-dup clusters from planted fingerprint edges") {
    // plant exact copies of docs 0..4 under +1000 and +2000: each cluster
    // {d, d+1000, d+2000} must resolve to canonical d
    val docs = graft.engine.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 5)
    val planted = docs
      .unionAll(docs.select((col("doc_id") + 1000).as("doc_id"), col("text")))
      .unionAll(docs.select((col("doc_id") + 2000).as("doc_id"), col("text")))
    val fp = planted.select(col("doc_id"),
      graft.functions.Text.fingerprint(col("text")).as("fp"))
    val edges = fp.as("x").join(fp.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    val resolved = Dedup.resolve(planted, "doc_id", edges)
    assert(resolved.filter(col("is_canonical")).count() == 5)
    val clusters = resolved.groupBy("cluster").count()
      .select("count").as[Long].collect().toSeq
    assert(clusters.length == 5 && clusters.forall(_ == 3L))
  }

  test("compressStep: AQE skew-replicates the near-fixpoint hot label key") {
    // The Dedup scaladoc claims the compression join's deliberate hot key
    // (near the fixpoint every member of a component shares ONE label) is
    // handled by AQE skew-join splitting, not by a single straggler task.
    // Pin that the way DppSpec pins DPP: build the exact near-fixpoint
    // label frame (one component, every node already at the min label),
    // run the engine's own compressStep, and read the skew flag off the
    // executed adaptive plan. Thresholds are lowered so the 200k-row hot
    // partition counts as skewed at test scale; production defaults fire
    // at the 256MB partitions a 100-TB run produces.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffled join
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // comp must be DATA-DEPENDENT (pmod(id, 1) == 0 for every row):
      // a literal 0 label constant-folds the equi-join condition away and
      // the plan degenerates to a broadcast instead of the keyed shuffle
      // the production loop runs
      val labels = spark.range(200000).select(
        col("id"), pmod(col("id"), lit(1L)).as("comp"), lit(false).as("chg"))
      val out = Dedup.compressStep(labels)
      // semantics first (this action also finalizes the adaptive plan):
      // at the fixpoint the jump is a no-op
      val rows = out.collect()
      assert(rows.length == 200000 &&
        rows.forall(r => r.getLong(1) == 0L && !r.getBoolean(2)))
      // plan evidence: the executed join carries the AQE skew flag
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"no AQE skew-join flag in executed plan:\n${plan.take(1200)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
