package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** From candidate PAIRS to dedup DECISIONS: near-dup detection emits edges
  * (d1, d2); deciding which docs to keep needs the transitive closure — a
  * doc similar to A and to B puts all three in one duplicate cluster.
  *
  * [[components]] is min-label propagation: every node starts as its own
  * label; each round every node takes the minimum label in its
  * neighborhood; fixpoint = connected components, labeled by their minimum
  * member id (the natural "keep the smallest doc_id" canonical choice).
  * Rounds needed = graph diameter — near-dup clusters are shallow (a
  * handful of hops), so the loop is short; each round is two keyed
  * shuffles (join + min aggregate), nothing quadratic. The loop runs
  * driver-side but every step is a distributed plan, and each round is
  * exactly ONE job: the propagation select carries a `chg` flag, the
  * next labels are LAZILY localCheckpoint'ed, and the count of changed
  * rows both materializes that checkpoint and decides convergence — no
  * separate compare-join action per round.
  */
object Dedup {

  /** @param edges two-column DataFrame of undirected pairs (ids)
    * @return (id, component) — component = min id reachable from `id`;
    *         includes every id appearing in `edges`
    */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // checkpoint the RAW edges once: sym AND the label seed both derive
    // from them, and the caller's edge plan is often an expensive candidate
    // pipeline (e.g. MinHash banding) that must not re-execute per consumer
    val e = edges.toDF("a", "b").localCheckpoint(eager = true)
    // undirected: propagate both ways
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(eager = true) // reused every round; cut lineage once
    // seed from BOTH endpoint columns of the RAW edges (before the
    // self-loop filter) so an id appearing only in a==b edges still gets a
    // singleton component, as the contract promises
    var labels = e.select(col("a").as("id"))
      .unionAll(e.select(col("b").as("id"))).distinct()
      .withColumn("comp", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each node's new label: min of its own and its neighbors' labels
      val nbr = labels.select(col("id").as("__nb"), col("comp").as("__nc"))
      val neighborMin = sym
        .join(nbr, col("b") === col("__nb"))
        .groupBy(col("a").as("id"))
        .agg(min(col("__nc")).as("nmin"))
      // `chg` is true iff a neighbor supplied a strictly smaller label; the
      // lazy checkpoint is materialized (all partitions — count, not a
      // short-circuiting limit) by the same action that reads the flag, and
      // also bounds lineage growth across rounds
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          (col("nmin").isNotNull && col("nmin") < col("comp")).as("chg"))
        .localCheckpoint(eager = false)
      val changed = next.filter(col("chg")).count()
      labels = next.drop("chg")
      converged = changed == 0
      i += 1
    }
    require(converged, s"components did not converge in $maxIter rounds")
    labels
  }

  /** Dedup verdicts from near-dup edges over a corpus: every doc gets its
    * duplicate-cluster id (its own id when it has no near-dups) and a
    * `is_canonical` flag (the cluster's minimum id survives). */
  def resolve(docs: DataFrame, idCol: String, edges: DataFrame): DataFrame = {
    val comp = components(edges)
      .withColumnRenamed("id", idCol).withColumnRenamed("comp", "cluster")
    docs.join(comp, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .withColumn("is_canonical", col("cluster") === col(idCol))
  }
}
