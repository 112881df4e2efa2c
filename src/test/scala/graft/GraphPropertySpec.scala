package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.queries.GraphQueries

/** Property check: the distributed graph operators against naive
  * in-memory implementations on seeded random graphs. The naive forms
  * are the textbook definitions (triple-loop triangles, literal peeling,
  * literal integer PageRank), so agreement pins the degree-orientation,
  * support-cut, and fixed-point arithmetic end to end — the same
  * cross-implementation technique the Levenshtein kernel uses against
  * the builtin. */
class GraphPropertySpec extends SparkSpec {

  /** Random undirected graph -> a lineitem table whose support>=2 edge
    * set is exactly `edges` (two orders per edge, ok ids disjoint). */
  private def writeGraph(edges: Seq[(Long, Long)]): String = {
    val d = Files.createTempDirectory("graft-graphprop").toString
    val rows = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(Row(2L * i, a), Row(2L * i, b), Row(2L * i + 1, a), Row(2L * i + 1, b))
    }
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  private def randomGraph(seed: Int, n: Int, p: Double): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (for {
      a <- 0 until n; b <- (a + 1) until n
      if rnd.nextDouble() < p
    } yield (a.toLong, b.toLong)).toSeq
  }

  private def naiveTriangles(edges: Seq[(Long, Long)]): Long = {
    val es = edges.toSet
    def has(a: Long, b: Long) = es.contains((a min b, a max b))
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    (for {
      i <- vs; j <- vs if j > i; k <- vs if k > j
      if has(i, j) && has(j, k) && has(i, k)
    } yield 1L).sum
  }

  private def naivePageRank(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.length.toLong).toMap
    var r: Map[Long, Long] = deg.map { case (v, _) => v -> 1000000000L }
    for (_ <- 1 to 3) {
      val cin = adj.toSeq.flatMap { case (u, vs) => vs.map(v => v -> r(u) / deg(u)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = deg.map { case (v, _) => v -> (150000000L + 85L * cin.getOrElse(v, 0L) / 100L) }
    }
    r
  }

  private def naiveKcoreRounds(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    var e = edges
    def degs(es: Seq[(Long, Long)]) =
      es.flatMap(x => Seq(x._1, x._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    var acc = Seq((degs(e).size.toLong, e.size.toLong))
    for (_ <- 1 to 3) {
      val d = degs(e)
      val alive = d.filter(_._2 >= 3).keySet
      e = e.filter(x => alive(x._1) && alive(x._2))
      acc :+= (alive.size.toLong, e.size.toLong)
    }
    acc
  }

  test("triangles, pagerank, k-core agree with naive forms on random graphs") {
    for (seed <- Seq(7, 21)) {
      val edges = randomGraph(seed, 14, 0.3)
      assert(edges.nonEmpty)
      val dir = writeGraph(edges)

      val tri = GraphQueries.triangleCount.build(spark, dir).collect().head
      assert(tri.getAs[Long]("n_edges") == edges.size.toLong, s"seed $seed")
      assert(tri.getAs[Long]("n_triangles") == naiveTriangles(edges),
        s"seed $seed triangles")

      val pr = GraphQueries.pageRank.build(spark, dir).collect()
        .map(r => r.getAs[Long]("part") -> r.getAs[Long]("rank_scaled")).toMap
      val expected = naivePageRank(edges)
      // the query returns top-20; every returned rank must match the
      // naive integer recurrence EXACTLY
      pr.foreach { case (v, rank) =>
        assert(expected(v) == rank, s"seed $seed node $v: $rank vs ${expected(v)}")
      }

      val kc = GraphQueries.kCore.build(spark, dir).collect()
        .map(r => (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"))).toSeq
      assert(kc == naiveKcoreRounds(edges), s"seed $seed kcore")
    }
  }
}
