package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.ClassifyQueries

/** Behavioral coverage for the embedding-eval batch (ClassifyQueries); the
  * oracle gate covers cross-engine value parity, these pin the classifier
  * semantics (separable clusters classify perfectly, votes are bounded,
  * confusion counts conserve the corpus). */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  /** An embeddings.parquet-shaped temp dir with crafted vectors. */
  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    val dir = Files.createTempDirectory("classify-spec").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Three well-separated clusters along distinct axes; ids chosen so that
    * vec_id % 50 == 0 picks one query per cluster. */
  private def separable(): String = {
    def v(axis: Int, jitter: Float): Seq[Float] =
      Seq.tabulate(8)(i => if (i == axis) 1.0f else if (i == axis + 3) jitter else 0.0f)
    embDir(
      (Seq(0L, 1L, 2L, 3L).map(id => (id, v(0, 0.01f * id), 0)) ++
        Seq(50L, 51L, 52L, 53L).map(id => (id, v(1, 0.01f * (id - 50)), 1)) ++
        Seq(100L, 101L, 102L, 103L).map(id => (id, v(2, 0.01f * (id - 100)), 2))))
  }

  test("knn classify: separable clusters predict their own label unanimously") {
    val got = ClassifyQueries.knnClassify.build(spark, separable())
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0L, 50L, 100L))
    assert(got.forall { case (_, t, p, _, c) => p == t && c == 1L },
      "every query must be classified by its own cluster")
    // only 3 same-cluster neighbors exist, so the winning vote is 3 of 5
    assert(got.forall(_._4 == 3L))
  }

  test("knn classify: sf run is well-formed (votes bounded, correct flag consistent)") {
    val got = ClassifyQueries.knnClassify.build(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (_, t, p, nv, c) =>
      nv >= 1 && nv <= 5 && c == (if (t == p) 1L else 0L) })
  }

  test("ncm classify: separable clusters give a purely diagonal confusion matrix") {
    val got = ClassifyQueries.ncmClassify.build(spark, separable())
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq((0L, 0L, 4L), (1L, 1L, 4L), (2L, 2L, 4L)))
  }

  test("ncm classify: confusion counts conserve the corpus") {
    val got = ClassifyQueries.ncmClassify.build(spark, sf)
      .as[(Long, Long, Long)].collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(got.map(_._3).sum == total, "every vector lands in exactly one cell")
  }
}
