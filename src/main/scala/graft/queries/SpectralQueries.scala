package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables.t

/** Iterative linear algebra as declared queries — POWER ITERATION run
  * twice: on the dense embedding Gram matrix (the leading PCA direction
  * every whitening / OPQ-style rotation / drift monitor starts from) and
  * on the sparse event-type transition matrix (the stationary distribution
  * of user navigation — PageRank's little sibling). Both are fixed-depth
  * (8 rounds) integer recurrences: matvec in DECIMAL(38,0)/HUGEINT, one
  * normalizing integral division per component per round (both engines'
  * integer division TRUNCATES toward zero — the recurrence is DEFINED over
  * truncating division, the q_holt_forecast contract, so bit-equality
  * needs no offset machinery). The oracle unrolls the same eight rounds as
  * chained CTEs; determinism comes from the fixed all-ones / uniform seed.
  *
  * The scale split: the DATA-sized stage is a one-pass reduction (Gram
  * cells / transition counts — map-side combined); every iteration after
  * it touches only DIMENSION-sized state (64 components / k event types),
  * so 8 rounds cost 8 tiny jobs regardless of corpus size — the only
  * defensible way to iterate at 100 TB. */
object SpectralQueries {

  /** Unrolled oracle iteration k: matvec against v{k-1}, max-abs
    * normalize back to ±10⁶ ppm. MATERIALIZED is load-bearing: DuckDB
    * inlines plain CTEs per reference, and the r→m + r→v double
    * reference would re-expand the whole Gram pipeline exponentially
    * across the eight unrolled rounds (the oracle-side analogue of the
    * Spark twin's eager localCheckpoint). */
  private def pcaIter(k: Int): String = {
    val prev = s"v${k - 1}"
    s"""r$k AS MATERIALIZED (
       |  SELECT g.i, SUM(g.g * $prev.v) AS raw
       |  FROM g JOIN $prev ON $prev.i = g.j GROUP BY g.i),
       |m$k AS (SELECT MAX(ABS(raw)) AS mx FROM r$k),
       |v$k AS MATERIALIZED (
       |  SELECT i, CASE WHEN mx = 0 THEN CAST(0 AS HUGEINT)
       |                 ELSE (raw * 1000000) // mx END AS v
       |  FROM r$k CROSS JOIN m$k)""".stripMargin
  }

  /** LEADING PRINCIPAL DIRECTION (power iteration) — 8 rounds of
    * v ← normalize(G·v) on the 64×64 embedding Gram matrix, seeded
    * all-ones; normalization is v·10⁶ DIV max|component| (truncating),
    * so every state is an exact integer in ±10⁶. The Rayleigh quotient
    * λ = ⌊vᵀGv / vᵀv⌋ rides along from one extra matvec — the dominant
    * eigenvalue estimate in milli² dot units. The Gram chain is
    * single-sourced with q_gram_matrix ([[SimilarityQueries.gramCellCtes]]
    * / gramTriCells), so the matrix iterated IS the matrix reported.
    *
    * Headroom: |G| ≤ d·N·(10³·‖x‖∞)² — matvec·10⁶ stays inside 38 digits
    * to N ≈ 10¹⁸ vectors; λ fits BIGINT to N ≈ 10⁹ (then widen the
    * column). Fixed 8 rounds is the CONTRACT (a deterministic transform,
    * like q_pagerank's fixed rounds), not a convergence promise — the
    * spec grades closeness to the true eigenvector on a spiked fixture.
    *
    * Shape at 100 TB: the corpus is touched ONCE (the 2080-cell in-row
    * expansion → map-side-combined aggregation); the reduced triangle is
    * dimension-bounded (2080 cells whatever the corpus size), so the
    * eight rounds then run as higher-order functions over ONE row
    * holding the sorted triangle — a single Catalyst plan whose
    * per-round cost is 64×64 decimal multiply-adds, with one-row
    * exchange barriers between rounds so each matvec evaluates exactly
    * once (the previous per-round join + aggregate + checkpoint loop
    * spent ~3s of a 4.6s bench entry in driver planning across 47
    * jobs). */
  val pcaPower: Q = Q(
    "q_pca_power",
    s"""WITH ${SimilarityQueries.gramCellCtes},
      |gu AS (SELECT i, j, CAST(SUM(p) AS HUGEINT) AS g
      |       FROM cells GROUP BY i, j),
      |g AS MATERIALIZED (
      |      SELECT i, j, g FROM gu
      |      UNION ALL
      |      SELECT j AS i, i AS j, g FROM gu WHERE i <> j),
      |v0 AS (SELECT DISTINCT i, CAST(1000000 AS HUGEINT) AS v FROM g),
      |${(1 to 8).map(pcaIter).mkString(",\n")},
      |r9 AS (
      |  SELECT g.i, SUM(g.g * v8.v) AS raw
      |  FROM g JOIN v8 ON v8.i = g.j GROUP BY g.i),
      |ray AS (
      |  SELECT SUM(v8.v * r9.raw) AS vgv, SUM(v8.v * v8.v) AS vv
      |  FROM v8 JOIN r9 ON r9.i = v8.i)
      |SELECT CAST(v8.i AS BIGINT) AS i, CAST(v8.v AS BIGINT) AS v_ppm,
      |       CAST(vgv // vv AS BIGINT) AS lambda
      |FROM v8 CROSS JOIN ray ORDER BY i""".stripMargin) { (s, dir) =>
    // The corpus rows are spread to full parallelism before the 2080×
    // in-row cell expansion (the expansion, not the scan, is the cost —
    // guide §2.5), reduced to the 2080-cell triangle by ONE map-side-
    // combined aggregation — the only data-sized stage.
    val gu = SimilarityQueries.gramTriCells(
        graft.engine.Tables.spread(SimilarityQueries.quantizedVecs(s, dir),
          col("vec_id")))
      .groupBy("i", "j").agg(sum(col("p")).cast("decimal(38,0)").as("g"))
    // The iteration state is DIMENSION-sized (64 components), so the eight
    // rounds run as higher-order functions over ONE row holding the sorted
    // triangle — one Catalyst plan, no per-round driver round trips (the
    // previous per-round join + aggregate + checkpoint loop spent ~3s of a
    // 4.6s query in driver planning across 47 jobs). Same value tree:
    // DECIMAL(38,0) products/sums, DIV truncates identically, and the
    // complete triangle means every join row of the old shape has its
    // positional twin here.
    // The triangle lands as ONE sorted array: cells sorted by (i, j) ARE
    // the row-major upper triangle over the rank space, because the
    // in-row expansion emits every (i, j) pair i <= j of every vector —
    // the triangle over the observed index set is complete by
    // construction, so positions need no map probe (a map's element_at
    // is a LINEAR scan of 2080 entries — measured ~300ms per matvec).
    val one = gu
      .agg(sort_array(collect_list(struct(col("i"), col("j"), col("g"))))
        .as("cells"))
      .select(
        expr("transform(cells, c -> c.g)").as("tri"),
        expr("array_sort(array_distinct(flatten(transform(cells, c -> array(c.i, c.j)))))")
          .as("ds"))
      // one-row exchange barrier: tri/ds must be ATTRIBUTES before the
      // fold below references them inside lambda bodies (an inlined
      // expression would re-evaluate per element)
      .repartition(1)
    // G(rank a, rank b) = tri[p*n - p*(p+1)/2 + q], p = min, q = max —
    // O(1) positional indexing into the sorted triangle. `vec` must be a
    // LAMBDA VARIABLE or attribute: a lambda-body reference to an inlined
    // expression re-evaluates it per element (measured 6.3s for one
    // collapsed round chain).
    def matvec(vec: String): String =
      s"""transform(sequence(0, size(ds) - 1), a ->
         |  aggregate(sequence(0, size(ds) - 1), CAST(0 AS DECIMAL(38,0)),
         |    (acc, b) -> acc + element_at(tri, CAST(
         |        least(a, b) * size(ds) - (least(a, b) * (least(a, b) + 1)) DIV 2
         |          + greatest(a, b) + 1 AS INT)) *
         |      element_at($vec, b + 1)))""".stripMargin
    // All eight rounds fold inside ONE aggregate expression: the running
    // vector is the fold's accumulator — a lambda variable, evaluated
    // state, immune to the projection-collapse re-evaluation trap — and
    // each round's matvec / max-abs bind once through the
    // single-element-array `transform` let idiom (transform(array(x),
    // raw -> ...) evaluates x exactly once and names it). One Catalyst
    // plan, one projection, zero per-round shuffles or driver trips —
    // the per-round join + aggregate + checkpoint loop this replaces
    // spent ~3s of a 4.6s bench entry in driver planning across 47 jobs.
    val rounds = s"""
      |aggregate(sequence(1, 8),
      |  transform(ds, x -> CAST(1000000 AS DECIMAL(38,0))),
      |  (v, r) -> element_at(transform(array(${matvec("v")}),
      |    raw -> element_at(transform(array(array_max(transform(raw, x -> abs(x)))),
      |      mx -> transform(raw, x ->
      |        CASE WHEN mx = 0 THEN CAST(0 AS DECIMAL(38,0))
      |             ELSE CAST((x * 1000000) DIV mx AS DECIMAL(38,0)) END)),
      |      1)),
      |    1))""".stripMargin
    one
      .withColumn("v", expr(rounds))
      // one-row exchange barrier so v/tri/ds are attributes for the
      // readout below (its lambdas reference v per element)
      .repartition(1)
      .withColumn("r9", expr(matvec("v")))
      .repartition(1) // r9/v as attributes before the lambda-heavy readout
      .withColumn("vgv", expr(
        """aggregate(sequence(0, size(ds) - 1), CAST(0 AS DECIMAL(38,0)),
          |  (acc, a) -> acc + element_at(v, a + 1) * element_at(r9, a + 1))"""
          .stripMargin))
      .withColumn("vv", expr(
        """aggregate(v, CAST(0 AS DECIMAL(38,0)), (acc, x) -> acc + x * x)"""
          .stripMargin))
      .select(explode(arrays_zip(col("ds"), col("v"))).as("z"),
        col("vgv"), col("vv"))
      .select(col("z.ds").cast("long").as("i"),
        col("z.v").cast("long").as("v_ppm"),
        expr("CAST(vgv DIV vv AS BIGINT)").as("lambda"))
      .orderBy("i")
  }

  /** Unrolled oracle iteration k for the chain: mass flows along the
    * ppm transition rows, one truncating DIV 10⁶ per destination. */
  private def chainIter(k: Int): String = {
    val prev = s"pi${k - 1}"
    s"""pi$k AS (
       |  SELECT s.st, COALESCE(SUM($prev.pi * p.p_ppm), 0) // 1000000 AS pi
       |  FROM states s
       |  LEFT JOIN p ON p.b = s.st
       |  LEFT JOIN $prev ON $prev.st = p.a
       |  GROUP BY s.st)""".stripMargin
  }

  /** MARKOV STATIONARY DISTRIBUTION — 8 power-iteration rounds of
    * π ← πP on the event-type transition chain (q_event_transitions'
    * counts, row-normalized to ppm by truncating division), seeded
    * uniform 10⁶ DIV k. The state space is the SOURCE types (a type with
    * no outgoing transition would absorb mass the chain can't return;
    * transitions into non-source types drop their mass — declared, and
    * ppm truncation bleeds ≤ k ppm per round by construction, so the
    * readout is a near-stationary vector, not a normalized probability).
    * Emits π₀ and π₈ plus each state's outgoing mass so drift from
    * uniform is readable in one row.
    *
    * Shape at 100 TB: transition counting is one fact scan + a per-user
    * LEAD window (user-keyed, bounded frames) + a k²-group aggregation;
    * the eight rounds then touch only the k²-row chain — dimension-sized,
    * like [[pcaPower]]. */
  val markovStationary: Q = Q(
    "q_markov_stationary",
    s"""WITH tr AS (
      |  SELECT user_id, event_type,
      |         LEAD(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |cnt AS (
      |  SELECT event_type AS a, nxt AS b, COUNT(*) AS c
      |  FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT a, SUM(c) AS n FROM cnt GROUP BY a),
      |p AS MATERIALIZED (
      |  SELECT cnt.a, cnt.b, (cnt.c * 1000000) // tot.n AS p_ppm
      |  FROM cnt JOIN tot USING (a)),
      |states AS (SELECT a AS st FROM tot),
      |kk AS (SELECT COUNT(*) AS k FROM states),
      |pi0 AS (SELECT st, 1000000 // k AS pi FROM states CROSS JOIN kk),
      |${(1 to 8).map(chainIter).mkString(",\n")}
      |SELECT pi8.st AS event_type, CAST(tot.n AS BIGINT) AS n_out,
      |       CAST(pi0.pi AS BIGINT) AS pi0_ppm,
      |       CAST(pi8.pi AS BIGINT) AS pi8_ppm
      |FROM pi8 JOIN pi0 ON pi0.st = pi8.st JOIN tot ON tot.a = pi8.st
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val tr = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(byUser).as("nxt"))
    val cnt = tr.filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("a"), col("nxt").as("b"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("a").agg(sum(col("c")).as("n"))
    // the k²-row chain is DIMENSION-sized (k event types), so the eight
    // rounds run as higher-order functions over ONE row holding the
    // transition rows and the sorted state list — a single Catalyst plan
    // with one-row exchange barriers between rounds, replacing the
    // per-round double-join + aggregate + eager-checkpoint loop that
    // spent most of a 3.4s bench entry in driver planning across 58
    // jobs (the q_pca_power treatment). Value trees are identical: the
    // old left joins summed exactly the (a, b) rows present in `p` with
    // COALESCE(.., 0) for states with no inflow — here every state
    // aggregates the same present rows, missing ones contribute the same
    // zero via the filtered sum; DIV truncates identically.
    val p = cnt.join(tot, "a")
      .select(col("a"), col("b"), expr("(c * 1000000) DIV n").as("p_ppm"))
    val one = p
      .agg(collect_list(struct(col("a"), col("b"), col("p_ppm"))).as("tr"))
      .select(col("tr"),
        expr("array_sort(array_distinct(transform(tr, t -> t.a)))").as("ds"))
      // one-row exchange barrier: tr/ds must be ATTRIBUTES before the
      // fold references them inside lambda bodies (an inlined expression
      // would re-evaluate per element — the q_pca_power lesson)
      .repartition(1)
    // pi(st) for the next round: sum of pi[a] * p_ppm over transitions
    // (a, st), then DIV 1e6 — transitions probe the state RANK via
    // array_position on the small sorted state list. All eight rounds
    // fold inside ONE aggregate expression: the running pi vector is the
    // fold's accumulator (a lambda variable — evaluated state, never
    // re-inlined), so the whole iteration is one projection with no
    // per-round shuffles or driver trips (the per-round double-join +
    // aggregate + checkpoint loop this replaces spent most of a 3.4s
    // bench entry across 58 jobs).
    def step(vec: String): String =
      s"""transform(ds, st ->
         |  aggregate(filter(tr, t -> t.b = st), 0L,
         |    (acc, t) -> acc + element_at($vec,
         |      CAST(array_position(ds, t.a) AS INT)) * t.p_ppm) DIV 1000000)"""
        .stripMargin
    val rounds = s"""
      |aggregate(sequence(1, 8),
      |  transform(ds, st -> 1000000 DIV CAST(size(ds) AS BIGINT)),
      |  (pi, r) -> ${step("pi")})""".stripMargin
    val it = one.withColumn("kk", size(col("ds")))
      .withColumn("pi", expr(rounds))
    val outN = tot.select(col("a").as("st"), col("n"))
    it
      .select(explode(arrays_zip(col("ds"), col("pi"))).as("z"), col("kk"))
      .select(col("z.ds").as("st"),
        expr("CAST(1000000 DIV CAST(kk AS BIGINT) AS BIGINT)").as("pi0_ppm"),
        col("z.pi").as("pi"))
      .join(outN, "st")
      .select(col("st").as("event_type"), col("n").cast("long").as("n_out"),
        col("pi0_ppm"), col("pi").cast("long").as("pi8_ppm"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(pcaPower, markovStationary)
}
