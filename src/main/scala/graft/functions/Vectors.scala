package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (LLM-pipeline similarity surface).
  *
  * Pure higher-order-function expressions — no UDFs, no linear-algebra
  * library — so Catalyst sees the whole computation and the DuckDB oracle can
  * mirror it bit-for-bit: both engines fold the products sequentially
  * (Spark `aggregate` with 0.0 init == DuckDB `list_reduce`, since
  * 0.0 + p1 == p1 exactly), giving identical IEEE754 results.
  *
  * Inputs are cast element-wise to double FIRST (the stored embeddings are
  * float32): float arithmetic would round differently between engines.
  */
object Vectors {

  /** Element-wise cast to double (mirror: `embedding::DOUBLE[]`). */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-fold dot product (mirror: list_reduce(list_transform(
    * list_zip(a, b), p -> p[1]*p[2]), (x,y) -> x+y)). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, computed as dot / (norm * norm). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native-expression forms (graft.expressions.DotProduct, registered by
    * GraftExtensions): a codegen'd primitive loop instead of the HOF's
    * zipped-array allocation + per-element lambda. Same sequential
    * accumulation order, so bit-identical results — only faster. */
  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))

  /** Sign-random-projection LSH bucket (Charikar SimHash for vectors):
    * `nPlanes` Rademacher (+1/-1) hyperplanes derived deterministically from
    * xxhash64(plane, dim) — no stored plane matrix, so executors rebuild the
    * "planes" from the hash function alone. Vectors with high cosine
    * similarity land in the same bucket with probability
    * (1 - angle/pi)^nPlanes. Bucket is a bit-packed long in [0, 2^nPlanes).
    */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { i =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, d) => when(pmod(xxhash64(lit(i), d), lit(2)) === 0, x).otherwise(-x)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
