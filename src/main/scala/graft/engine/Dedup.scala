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

  /** @param edges two-column DataFrame of undirected pairs (ids).
    *   Duplicate pairs are tolerated (a min aggregate cannot change) but
    *   each copy is re-shuffled through the propagation join every round —
    *   callers holding a heavily duplicated edge set (e.g. raw banded LSH
    *   output, one row per shared band) should `.distinct()` it first, as
    *   [[graft.engine.Similarity.lshCandidatePairs]] already does.
    * @return (id, component) — component = min id reachable from `id`;
    *         includes every id appearing in `edges`
    */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // checkpoint the RAW edges once: sym AND the label seed both derive
    // from them, and the caller's edge plan is often an expensive candidate
    // pipeline (e.g. MinHash banding) that must not re-execute per consumer
    val e = edges.toDF("a", "b").localCheckpoint(eager = true)
    // undirected: propagate both ways. No distinct and no checkpoint of its
    // own — duplicate edges cannot change a min aggregate (they only add
    // rows the map-side partial min collapses), sym is a narrow map over
    // the cached edges, and the removed distinct was a full extra shuffle
    // of the edge set per materialization
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
    // seed = the FIRST propagation round fused into the label init:
    // min(own id, direct neighbor ids) per node, in the same union +
    // aggregate shape as a loop round. It is lazy — round 1's count job
    // materializes it — so the first hop costs no driver round trip of its
    // own. Ids come from BOTH endpoint columns of the RAW edges (before the
    // self-loop filter) so an id appearing only in a==b edges still gets a
    // singleton component, as the contract promises.
    var labels = sym.select(col("a").as("id"), col("b").as("lab"))
      .unionAll(e.select(col("a").as("id"), col("a").as("lab")))
      .unionAll(e.select(col("b").as("id"), col("b").as("lab")))
      .groupBy("id").agg(min(col("lab")).as("comp"))
    // one propagation hop: each node's new label is the min of its own and
    // its neighbors' labels. Neighbor messages and the node's own label go
    // through ONE union + aggregate — two shuffles per hop (join key, then
    // node id) where the previous groupBy-then-left-join shape needed
    // three; the `own` flag recovers the old label inside the same
    // aggregate so `chg` (strictly smaller label arrived) needs no
    // separate compare join.
    def propagate(labels: DataFrame): DataFrame = {
      val nbr = labels.select(col("id").as("__nb"), col("comp").as("__nc"))
      sym.join(nbr, col("b") === col("__nb"))
        .select(col("a").as("id"), col("__nc").as("lab"), lit(false).as("own"))
        .unionAll(labels.select(col("id"), col("comp").as("lab"), lit(true).as("own")))
        .groupBy("id")
        .agg(min(col("lab")).as("comp"),
          min(when(col("own"), col("lab"))).as("__old"))
        .select(col("id"), col("comp"), (col("comp") < col("__old")).as("chg"))
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // TWO hops per driver round trip: the loop's cost on shallow graphs
      // is job latency, not data, so halving the count-job count halves it.
      // Convergence reads ONLY the second hop's flag — a changeless second
      // hop means the fixpoint was reached whatever the first hop did (at
      // worst the final job evaluates one already-converged hop). The lazy
      // checkpoint is materialized (all partitions — count, not a
      // short-circuiting limit) by the same action that reads the flag,
      // and also bounds lineage growth across rounds.
      val next = propagate(propagate(labels).drop("chg"))
        .localCheckpoint(eager = false)
      val changed = next.filter(col("chg")).count()
      labels = next.drop("chg")
      converged = changed == 0
      i += 1
    }
    require(converged, s"components did not converge in $maxIter double-rounds")
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
