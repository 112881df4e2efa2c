package graft

import org.apache.spark.sql.functions._
import graft.engine.{Ivf, Tables}
import graft.functions.Vectors

/** Learned-centroid IVF: twin recall, cell pruning, and exhaustive-probe
  * equivalence with brute force. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Tables.t(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 200)
  private lazy val twin = base.filter(col("vec_id") === 3)
    .select(lit(99999L).as("vec_id"), col("embedding"))
  private lazy val corpus = base.unionAll(twin)
  private lazy val index = Ivf.build(corpus, "vec_id", "embedding", nCells = 8)

  test("build assigns every vector a cell; twin shares its original's cell") {
    assert(index.assigned.count() == corpus.count())
    assert(index.centroids.length == 8)
    val cells = index.assigned.filter(col("vec_id").isin(3L, 99999L))
      .select("cell").as[Int].collect().toSet
    assert(cells.size == 1, "identical vectors must land in the same cell")
  }

  test("nProbe=1 finds the planted twin top-1") {
    val top = Ivf.searchTopK(index, col("vec_id") === 99999L,
        "vec_id", "embedding", k = 1, nProbe = 1)
      .select("vec_id", "cos").as[(Long, Double)].head()
    assert(top._1 == 3L && math.abs(top._2 - 1.0) < 1e-12, s"got $top")
  }

  test("exhaustive probe (nProbe = nCells) equals brute-force top-k") {
    val got = Ivf.searchTopK(index, col("vec_id") % 50 === 0,
        "vec_id", "embedding", k = 3, nProbe = 8)
      .select("qid", "vec_id", "rk").as[(Long, Long, Int)].collect().toSet
    val e = index.assigned.select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    val want = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Vectors.cosineNative(col("qv"), col("v")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("qid", "vec_id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("searchTopK refuses an unbounded query batch before collecting it") {
    // the guard (r13 verdict item 5): this utility collects the query side
    // driver-side; a predicate matching more than maxQueryBatch rows must
    // fail loudly instead of OOMing the driver
    val e = intercept[IllegalArgumentException] {
      Ivf.searchTopK(index, lit(true), "vec_id", "embedding",
        k = 1, nProbe = 1, maxQueryBatch = 5)
    }
    assert(e.getMessage.contains("maxQueryBatch"),
      s"guard message should name the knob: ${e.getMessage}")
    // a batch at the cap still runs (boundary inclusive)
    val ok = Ivf.searchTopK(index, col("vec_id") < 5, "vec_id", "embedding",
      k = 1, nProbe = 1, maxQueryBatch = 5)
    assert(ok.count() > 0)
  }

  test("learnedCellRanks: fixed-point means are partitioning-invariant") {
    // the claim behind the oracle-ability of q_ann_ivf_learned: integer-sum
    // (1e-6-grid) centroid means do not depend on aggregation order, so a
    // different physical partitioning yields BIT-identical centroids,
    // distances, and assignments (a double-sum mean would not)
    val emb = Tables.t(spark, sf, "embeddings")
    def ranks(df: org.apache.spark.sql.DataFrame) =
      Ivf.learnedCellRanks(df, "vec_id", "embedding", dim = 64, nPlanes = 3)
        .select("vec_id", "cell", "dist", "rk")
    val a = ranks(emb)
    val b = ranks(emb.repartition(17))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "learned assignment changed under repartition")
    // and the assignment is total: exactly one rk=1 cell per vector
    val n = emb.count()
    assert(a.filter(col("rk") === 1).count() == n)
  }
}
