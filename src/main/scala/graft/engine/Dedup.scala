package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** From candidate PAIRS to dedup DECISIONS: near-dup detection emits edges
  * (d1, d2); deciding which docs to keep needs the transitive closure — a
  * doc similar to A and to B puts all three in one duplicate cluster.
  *
  * [[components]] is min-label propagation with pointer jumping: every
  * node starts as its own label; each round every node takes the minimum
  * label in its neighborhood (two hops), then jumps through its label's
  * label (`comp <- comp[comp]`, path compression). Fixpoint = connected
  * components, labeled by their minimum member id (the natural "keep the
  * smallest doc_id" canonical choice). Neighbor hops alone need
  * diameter-many rounds — fine for shallow near-dup clusters, but a
  * corpus whose candidate buckets chain (the 1M-doc stress probe built
  * exactly that: planted-twin buckets form components hundreds of hops
  * deep) would blow any fixed round cap. The compression step doubles
  * the propagated distance per round, so convergence is O(log diameter)
  * — ~6 rounds for a 300-deep chain, bounded ~20 for any graph that
  * fits on disk. Each round is keyed shuffles only (joins + min
  * aggregate), nothing quadratic, and exactly ONE job: the selects carry
  * a `chg` flag, the next labels are LAZILY localCheckpoint'ed, and the
  * count of changed rows both materializes that checkpoint and decides
  * convergence — no separate compare-join action per round. The
  * compression join's key is the label itself — near the fixpoint every
  * member of a component shares one key, a deliberate hot key: the probe
  * side is one row per key, which AQE skew-join replicates across the
  * split fact partitions.
  */
object Dedup {

  /** One pointer-jumping compression step over a (id, comp, chg) label
    * frame: every label is replaced by its label's label
    * (`comp <- comp[comp]`), folding any change into `chg`. The join key
    * on the probe side is the LABEL — near the fixpoint every member of a
    * component shares one label value, a deliberate hot key whose skewed
    * shuffle partition AQE splits and replicates (the build side is one
    * row per key). Package-private so DedupSpec can pin that AQE
    * skew-join posture on the engine's exact join shape (the way DppSpec
    * pins dynamic partition pruning) instead of a lookalike. */
  private[graft] def compressStep(labels: DataFrame): DataFrame = {
    val l2 = labels.select(col("id").as("__cid"), col("comp").as("__cc"))
    labels.join(l2, col("comp") === col("__cid"), "left")
      .select(col("id"),
        coalesce(col("__cc"), col("comp")).as("comp"),
        (col("chg") ||
          coalesce(col("__cc"), col("comp")) < col("comp")).as("chg"))
  }

  /** @param edges two-column DataFrame of undirected pairs (ids).
    *   Duplicate pairs are tolerated (a min aggregate cannot change) but
    *   each copy is re-shuffled through the propagation join every round —
    *   callers holding a heavily duplicated edge set (e.g. raw banded LSH
    *   output, one row per shared band) should `.distinct()` it first, as
    *   [[graft.engine.Similarity.lshCandidatePairs]] already does.
    * @param maxIter cap on double-rounds before failing loud. Pointer
    *   jumping roughly doubles the propagated distance per round, but the
    *   doubling only kicks in once compression starts (round 3 — the first
    *   two rounds propagate direct labels), so the practical reachable
    *   diameter at the default 20 is ~2^17 hops — still beyond any
    *   realistic corpus graph (a duplicate-cluster chain 131k docs deep);
    *   an adversarial deeper chain trips the require(converged) guard
    *   rather than silently mislabeling, and raising maxIter for it is
    *   safe (each extra round is one more doubling, cost stays keyed
    *   shuffles only).
    * @return (id, component) — component = min id reachable from `id`;
    *         includes every id appearing in `edges`
    */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // checkpoint the RAW edges once: sym AND the label seed both derive
    // from them, and the caller's edge plan is often an expensive candidate
    // pipeline (e.g. MinHash banding) that must not re-execute per consumer.
    // The keyed repartition (no explicit count — AQE sizes it by bytes)
    // NORMALIZES the checkpoint's partitioning: callers hand edges at
    // whatever width their candidate scoring ran at (often deliberately
    // wide for a compute-dense kernel), and every loop round would
    // otherwise re-scan that many partitions per hop — task-count
    // overhead, not data, dominating the closure (measured: a 32-wide
    // edge checkpoint nearly doubled q_entity_resolve's loop).
    val e = edges.toDF("a", "b").repartition(col("a"))
      .localCheckpoint(eager = true)
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
    // pointer jumping: replace every label by its label's label. Labels
    // are monotone (comp[x] <= x always: the seed takes a min with the own
    // id and every later step only lowers), so comp[comp[x]] <= comp[x]
    // and the jump is itself a propagation step — it doubles the distance
    // covered so far. comp values are node ids present in `labels`
    // (they originate as ids in the seed), so the lookup always hits; the
    // left join + coalesce is belt-and-braces. `chg` folds the jump's
    // changes into the incoming flag.
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // Round 1 is ONE hop, later rounds are two hops + one jump per
      // driver round trip. The seed already realizes the first
      // propagation (min of self and direct neighbors), so a SHALLOW
      // graph — the common near-dup case: planted twins, accepted entity
      // links — is at its fixpoint before the loop starts and round 1
      // only needs the cheapest possible confirmation (one hop, two
      // keyed shuffles; the second hop and the jump would be no-ops on
      // it). A deep graph pays one extra round trip and then doubles as
      // before — O(1) against its O(log diameter) total. Convergence
      // reads the final flag, which folds the last hop's and the jump's
      // — a changeless last hop means the propagation fixpoint was
      // reached whatever earlier hops did, and at that fixpoint the jump
      // is a no-op. The lazy checkpoint is materialized (all partitions
      // — count, not a short-circuiting limit) by the same action that
      // reads the flag, and also bounds lineage growth across rounds.
      // (An optimization round also tried batching TWO double-hop+jump
      // halves per count job — it regressed every shallow-graph consumer
      // by the extra hops and bought the deep graphs nothing: per-round
      // stage execution, not the driver trip, is the dominant term.)
      val next = (if (i < 1) propagate(labels)
        else compressStep(propagate(propagate(labels).drop("chg"))))
        .localCheckpoint(eager = false)
      val changed = next.filter(col("chg")).count()
      labels = next.drop("chg")
      converged = changed == 0
      i += 1
    }
    require(converged,
      s"components did not converge in $maxIter double-rounds. Pointer " +
        "jumping makes the round count O(log graph-diameter) — ~20 rounds " +
        "covers any graph that fits on disk — so hitting this cap means " +
        "either a pathologically deep component chain (raising maxIter is " +
        "SAFE and each extra round roughly doubles the reachable depth) or " +
        "an upstream bug feeding unbounded fresh edges per round.")
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
