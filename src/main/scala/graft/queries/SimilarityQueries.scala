package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Similarity, Tables}
import graft.engine.Tables.t
import graft.functions.Vectors

/** LLM-data-pipeline batch 2: similarity search over the `embeddings` table.
  *
  * Scale shapes:
  *  - q_cosine_topk: the brute-force baseline done right — the BOUNDED query
  *    batch is broadcast, the vector corpus streams through ONE scan, and
  *    per-query top-k is a window over the scored stream. Cost is
  *    O(|queries| * N) with no shuffle of the corpus; correct for any N, and
  *    the yardstick ANN variants are measured against.
  *  - q_ann_ivf: partition-pruned search — each query searches only its own
  *    cell (the `label` column stands in for an IVF centroid assignment).
  *    The join is keyed on the cell id, so at 100 TB each query touches
  *    1/cells of the corpus.
  *  - q_ann_lsh: hyperplane-LSH bucketed search (no SQL oracle — the bucket
  *    derivation uses xxhash64, which DuckDB lacks; verified in
  *    SimilaritySpec with planted twins instead).
  */
object SimilarityQueries {

  private val CosineSql =
    """list_reduce(list_transform(list_zip(q.qv, e.v), p -> p[1] * p[2]), (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_transform(q.qv, x -> x * x), (x, y) -> x + y))
      |     * sqrt(list_reduce(list_transform(e.v, x -> x * x), (x, y) -> x + y)))""".stripMargin

  val cosineTopK: Q = Q(
    "q_cosine_topk",
    s"""WITH q AS (
      |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0),
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |scored AS (
      |  SELECT q.qid, e.vec_id,
      |    $CosineSql AS cos
      |  FROM q, e WHERE e.vec_id <> q.qid),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
      |  FROM scored)
      |SELECT qid, vec_id, cos, rk FROM ranked
      |WHERE rk <= 5
      |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), Vectors.asDouble(col("embedding")).as("qv"))
    val e = emb.select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Vectors.cosineNative(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy("qid", "rk")
  }

  val annIvf: Q = Q(
    "q_ann_ivf",
    s"""WITH q AS (
      |  SELECT vec_id AS qid, label, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id % 50 = 0),
      |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |scored AS (
      |  SELECT q.qid, e.vec_id,
      |    $CosineSql AS cos
      |  FROM q JOIN e ON q.label = e.label AND e.vec_id <> q.qid),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
      |  FROM scored)
      |SELECT qid, vec_id, cos, rk FROM ranked
      |WHERE rk <= 3
      |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("label"),
        Vectors.asDouble(col("embedding")).as("qv"))
    val e = emb.select(col("vec_id"), col("label"),
      Vectors.asDouble(col("embedding")).as("v"))
    val scored = e.join(broadcast(q), "label")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Vectors.cosineNative(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("qid", "rk")
  }

  /** LSH-bucketed ANN: 4 hyperplanes -> 16 buckets; queries meet candidates
    * through an equi-join on the bucket key. Rows-only driver check; twin
    * and recall behavior covered in SimilaritySpec. */
  val annLsh: Q = Q.noOracle("q_ann_lsh") { (s, dir) =>
    val emb = Similarity.lshIndex(
      Tables.t(s, dir, "embeddings"), "vec_id", "embedding", dim = 64, nPlanes = 4)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("bucket"),
        Vectors.asDouble(col("embedding")).as("qv"))
    val e = emb.select(col("vec_id"), col("bucket"),
      Vectors.asDouble(col("embedding")).as("v"))
    val scored = e.join(broadcast(q), "bucket")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Vectors.cosineNative(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("qid", "rk")
  }

  /** MinHash+LSH near-dup candidates over documents (8 bands x 2 rows on a
    * 16-slot signature), with planted near-identical twins so candidates
    * exist at every scale. xxhash64-based, so rows-only driver check; the
    * banding math is verified in SimilaritySpec. */
  val minhashNearDup: Q = Q.noOracle("q_minhash_neardup") { (s, dir) =>
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    // plant a twin of every 10th doc: same text with one token appended
    val twins = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" twinmarker")).as("text"))
    val sig = Similarity.minhashSignatures(docs.unionAll(twins), "doc_id", "text", k = 16)
    Similarity.lshCandidatePairs(sig, "doc_id", k = 16, bands = 8)
      .orderBy("d1", "d2")
  }

  val all: Seq[Q] = Seq(cosineTopK, annIvf, annLsh, minhashNearDup)
}
