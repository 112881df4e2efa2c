package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}

/** Near-duplicate detection machinery for the LLM-data-pipeline surface:
  * MinHash+LSH banding, 16-bit SimHash, and hyperplane-LSH ANN over
  * embeddings. All hash-bucketed — candidate pairs always come from an
  * equi-join on a bucket key, never a crossJoin, so the pair space is
  * bounded by bucket occupancy at any corpus size.
  *
  * Hash functions are Spark's xxhash64 seeded by column position — stable
  * across runs and executors, nothing random at runtime.
  */
object Similarity {

  /** MinHash signatures: k permutation-hashes approximated by
    * min(xxhash64(i, token)) over the document's distinct tokens. One
    * explode + one groupBy — the signature computation is a single
    * aggregation pass regardless of k. Returns (idCol, mh_0..mh_{k-1}). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("tok"))
      .distinct()
    val mh = (0 until k).map(i => min(xxhash64(lit(i), col("tok"))).as(s"mh_$i"))
    tok.groupBy(idCol).agg(mh.head, mh.tail: _*)
  }

  /** LSH banding over minhash signatures: split the k signature slots into
    * `bands` bands of k/bands rows each; docs agreeing on ALL rows of any
    * band become a candidate pair. Implemented as one unioned self-join per
    * band keyed on the band hash — the classic sub-quadratic shape: two docs
    * with Jaccard j collide with probability 1-(1-j^r)^b. */
  def lshCandidatePairs(sig: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val perBand = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"mh_$i"))
      val keyed = sig.select(col(idCol),
        xxhash64(lit(b) +: cols: _*).as("band_key"))
      keyed.select(col(idCol).as("d1"), col("band_key"))
        .join(keyed.select(col(idCol).as("d2"), col("band_key")), "band_key")
        .filter(col("d1") < col("d2"))
        .select("d1", "d2")
    }
    perBand.reduce(_ unionAll _).distinct()
  }

  /** 16-bit SimHash: per token a 64-bit hash contributes +1/-1 to each of 16
    * bit positions; the sign of each positional sum becomes a fingerprint
    * bit. Near-dups differ in few bits (compare with [[hamming16]]).
    * One explode + one groupBy, 16 aggregate columns. */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("tok"))
      .distinct()
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 16).map(p =>
      sum(when(shiftright(col("h"), p).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b_$p"))
    val sums = tok.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
    val packed = (0 until 16)
      .map(p => when(col(s"b_$p") > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col(idCol), packed.as("simhash"))
  }

  /** Hamming distance between two packed simhash values. */
  def hamming16 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    bit_count(a.bitwiseXOR(b))

  /** Hyperplane-LSH ANN index: assigns each vector a bucket; queries search
    * only their own bucket (optionally multiple independent tables for
    * recall — pass different `table` seeds and union). The planted-twin
    * guarantee: an exact duplicate vector always lands in the same bucket. */
  def lshIndex(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      nPlanes: Int): DataFrame =
    emb.withColumn("bucket",
      Vectors.lshBucket(Vectors.asDouble(col(vecCol)), dim, nPlanes))
}
