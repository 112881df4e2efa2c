package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.GraphQueries

/** Graph suite on a CRAFTED co-purchase graph with known structure: the
  * support>=2 edge set is {1-2, 2-3, 1-3, 3-4} (each planted via two
  * repeat orders; a single extra one-off order must be cut by the
  * support filter), i.e. one triangle {1,2,3} plus a pendant node 4
  * hanging off the triangle's highest-degree vertex. */
class GraphSpec extends SparkSpec {

  /** Write a minimal lineitem parquet whose DISTINCT (order, part)
    * baskets produce the crafted graph; returns the table dir. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-graph").toString
    // orders 1..8 plant the four support-2 edges; order 9 is a one-off
    // (4,5) pair that the nij >= 2 cut must drop (node 5 disappears).
    val baskets = Seq(
      1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 2L, // edge 1-2 x2
      3L -> 2L, 3L -> 3L, 4L -> 2L, 4L -> 3L, // edge 2-3 x2
      5L -> 1L, 5L -> 3L, 6L -> 1L, 6L -> 3L, // edge 1-3 x2
      7L -> 3L, 7L -> 4L, 8L -> 3L, 8L -> 4L, // edge 3-4 x2
      9L -> 4L, 9L -> 5L) // one-off, must be cut
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType)))
    val rows = baskets.map { case (o, p) => Row(o, p) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("triangle count: one triangle, support cut applied, exact gcc") {
    val r = GraphQueries.triangleCount.build(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    // degrees: 1->2, 2->2, 3->3, 4->1; node 5 cut by support
    assert(row.getAs[Long]("n_nodes") == 4)
    assert(row.getAs[Long]("n_edges") == 4)
    assert(row.getAs[Long]("n_triangles") == 1)
    // open triplets: C(2,2 nodes)=1+1, C(3,2)=3, C(1,2)=0 -> 5
    assert(row.getAs[Long]("n_triplets") == 5)
    assert(row.getAs[Long]("gcc_ppm") == 3L * 1 * 1000000 / 5)
  }

  test("pagerank: hub ranks highest, mass conserved up to DIV truncation") {
    val rows = GraphQueries.pageRank.build(spark, dir).collect()
    assert(rows.length == 4)
    // node 3 (degree 3, the triangle vertex holding the pendant) leads
    assert(rows.head.getAs[Long]("part") == 3L)
    assert(rows.head.getAs[Long]("degree") == 3L)
    // ranks strictly ordered by the query's sort key
    val ranks = rows.map(_.getAs[Long]("rank_scaled"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // mass ~ n * 1e9: each of 3 rounds leaks < 1 unit per edge-end per
    // node via the two DIVs, plus the damping DIV — bound loosely.
    val mass = ranks.sum
    assert(mass <= 4L * 1000000000L && mass > 4L * 1000000000L - 1000L)
  }

  test("basket rules: exact support/confidence/lift ppm on planted pairs") {
    val rows = GraphQueries.basketRules.build(spark, dir).collect()
    // 9 baskets total; all four planted pairs survive nij >= 2
    assert(rows.length == 4)
    val byPair = rows.map(r =>
      (r.getAs[Long]("p1"), r.getAs[Long]("p2")) -> r).toMap
    val e12 = byPair((1L, 2L))
    // part 1 in orders {1,2,5,6} -> n1=4; part 2 in {1,2,3,4} -> n2=4
    assert(e12.getAs[Long]("nij") == 2)
    assert(e12.getAs[Long]("support_ppm") == 2L * 1000000 / 9)
    assert(e12.getAs[Long]("conf_1to2_ppm") == 2L * 1000000 / 4)
    assert(e12.getAs[Long]("conf_2to1_ppm") == 2L * 1000000 / 4)
    assert(e12.getAs[Long]("lift_ppm") == 2L * 9 * 1000000 / (4 * 4))
    val e34 = byPair((3L, 4L))
    // part 3 in {3,4,5,6,7,8} -> n3=6; part 4 in {7,8,9} -> n4=3
    assert(e34.getAs[Long]("lift_ppm") == 2L * 9 * 1000000 / (6 * 3))
  }

  test("k-core: peel removes the pendant and then the starved triangle") {
    val rows = GraphQueries.kCore.build(spark, dir).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges"))).toSeq
    // round 0: full graph; round 1: only node 3 has degree >= 3, so no
    // edge survives; rounds 2-3: empty (stable).
    assert(rows == Seq((0, 4L, 4L), (1, 1L, 0L), (2, 0L, 0L), (3, 0L, 0L)))
  }

  test("recommendations: lift-ranked partners in both directions") {
    val rows = GraphQueries.recommendTopk.build(spark, dir).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("rnk")) ->
        (r.getAs[Long]("rec"), r.getAs[Long]("lift_ppm"))).toMap
    // part 1 (n1=4): partner 2 lift 2*9e6/(4*4)=1125000 beats
    // partner 3 lift 2*9e6/(4*6)=750000
    assert(rows((1L, 1L)) == (2L, 1125000L))
    assert(rows((1L, 2L)) == (3L, 750000L))
    // pendant part 4 (n4=3): only partner is 3, lift 2*9e6/(6*3)=1000000
    assert(rows((4L, 1L)) == (3L, 1000000L))
    assert(!rows.contains((4L, 2L)))
  }

  test("bfs hops: exact distances from the min-id root; frontier is a set") {
    // root = 1 (min vertex); triangle puts 2 and 3 at hop 1, pendant 4 at
    // hop 2 — and 4 is discovered via BOTH 3-paths, so the MIN dedups it
    val rows = GraphQueries.bfsHops.build(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("mutual best match: only reciprocal rank-1 pairs survive") {
    // bests on the crafted graph: 1<->2 (lift 1.125M both ways) and
    // 3<->4 (1.0M both ways, 3 preferring its pendant over the triangle);
    // 1-3 and 2-3 are one-way-at-best and must not appear
    val rows = GraphQueries.mutualBestMatch.build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rows == Seq(
      (1L, 2L, 2L, 1125000L, 1125000L),
      (3L, 4L, 2L, 1000000L, 1000000L)))
  }

  test("link predict: 2-hop non-edges scored exactly; edges excluded") {
    // neighborhoods: 1:{2,3} 2:{1,3} 3:{1,2,4} 4:{3}. The only 2-hop
    // NON-edges are (1,4) and (2,4), both witnessed by neighbor 3:
    // cn = 1, jaccard = 1/(2+1-1) = 500000 ppm. Every edge pair and the
    // support-cut node 5 must be absent.
    val rows = GraphQueries.linkPredict.build(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 4L), (2L, 4L)))
    rows.foreach { r =>
      assert(r.getAs[Long]("common_neighbors") == 1L)
      assert(r.getAs[Long]("deg_a") == 2L)
      assert(r.getAs[Long]("deg_b") == 1L)
      assert(r.getAs[Long]("jaccard_ppm") == 500000L)
    }
  }

  test("modularity: exact negative ppm on the crafted brand partition") {
    // brands: {1,2,3} -> A, {4,5} -> B over edges {1-2, 2-3, 1-3, 3-4}:
    // m=4, e_A=3, e_B=0, d_A=7, d_B=1
    // Q = (3/4 - (7/8)^2) + (0 - (1/8)^2) = -1/32 -> -31250 ppm, and each
    // community contributes floor(-1e6/64) = -15625 — the negative-path
    // offset floor both engines must take identically
    val partSchema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_brand", StringType)))
    val parts = Seq(Row(1L, "A"), Row(2L, "A"), Row(3L, "A"),
      Row(4L, "B"), Row(5L, "B"))
    spark.createDataFrame(spark.sparkContext.parallelize(parts, 2), partSchema)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = GraphQueries.modularity.build(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got("A") == ((3L, 7L, 4L, -15625L, -31250L)))
    assert(got("B") == ((0L, 1L, 4L, -15625L, -31250L)))
    assert(got.size == 2, "node 5 (support-cut) contributes no community row")
  }

  test("graph queries run end-to-end on real testdata") {
    val tri = GraphQueries.triangleCount.build(spark, sf).collect()
    assert(tri.head.getAs[Long]("n_triangles") > 0)
    val pr = GraphQueries.pageRank.build(spark, sf).collect()
    assert(pr.length == 20)
    assert(GraphQueries.basketRules.build(spark, sf).count() > 0)
    assert(GraphQueries.bfsHops.build(spark, sf).count() > 0)
  }
}
