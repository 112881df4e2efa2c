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

  /** n-token shingles (w-shingling): MinHash must run over shingles, not
    * bag-of-words tokens — with a small vocabulary most documents contain
    * most words, token-level signatures collapse to a handful of values, and
    * LSH buckets go quadratic (measured: 77s vs ~2s at sf0.1). Shingles keep
    * word ORDER, so only genuinely overlapping passages collide. Documents
    * shorter than n become one whole-text shingle. */
  def shingles(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val tok = Text.tokens(text)
    when(size(tok) < n, array(concat_ws(" ", tok)))
      .otherwise(transform(sequence(lit(0), size(tok) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(tok, i + j + 1)): _*)))
  }

  /** MinHash signatures: k permutation-hashes approximated by
    * min(xxhash64(i, shingle)) over the document's distinct 3-shingles. One
    * explode + one groupBy — the signature computation is a single
    * aggregation pass regardless of k. Returns (idCol, mh_0..mh_{k-1}). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, shingleLen: Int = 3): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(shingles(col(textCol), shingleLen)).as("tok"))
      .distinct()
    val mh = (0 until k).map(i => min(xxhash64(lit(i), col("tok"))).as(s"mh_$i"))
    tok.groupBy(idCol).agg(mh.head, mh.tail: _*)
  }

  /** LSH banding over minhash signatures: split the k signature slots into
    * `bands` bands of k/bands rows each; docs agreeing on ALL rows of any
    * band become a candidate pair. Implemented as one unioned self-join per
    * band keyed on the band hash — the classic sub-quadratic shape: two docs
    * with Jaccard j collide with probability 1-(1-j^r)^b. */
  /** `maxBucket` guards against degenerate "hot" buckets (a band value
    * shared by more docs than that means the band carries no signal —
    * boilerplate or, as in the synthetic corpus, a tiny vocabulary); such
    * buckets are skipped rather than joined quadratically, standard LSH
    * practice. Skipping is logged in the plan as the anti-join below. */
  def lshCandidatePairs(sig: DataFrame, idCol: String, k: Int, bands: Int,
      maxBucket: Int = 200): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // One (band, band_key) row per doc per band via a single explode — then
    // ONE hot-bucket filter and ONE self-join keyed on (band, band_key),
    // instead of a join pipeline per band (8x fewer shuffles; the band id
    // rides inside the join key so bands never mix).
    val bandKeys = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"mh_$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bk"))
    }
    val keyed = sig
      .select(col(idCol), explode(array(bandKeys: _*)).as("e"))
      .select(col(idCol), col("e.band").as("band"), col("e.bk").as("bk"))
    val coldBuckets = keyed.groupBy("band", "bk").count()
      .filter(col("count") <= maxBucket).select("band", "bk")
    val kept = keyed.join(coldBuckets, Seq("band", "bk"))
    kept.select(col(idCol).as("d1"), col("band"), col("bk"))
      .join(kept.select(col(idCol).as("d2"), col("band"), col("bk")),
        Seq("band", "bk"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2")
      .distinct()
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
