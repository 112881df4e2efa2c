package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic sketch primitives — single source for the
  * batch q_hll_distinct oracle query and the streaming register maintainer
  * ([[graft.streaming.Streams.hllRegisters]]), so the two forms cannot
  * drift. See the query scaladoc for the determinism argument (md5-32
  * hash, integer CASE ladder for ranks, exact-dyadic 2^-m table, <53-bit
  * harmonic sums). */
object Sketch {

  /** Register count m = 2^p with p = 8. */
  val HllBuckets = 256

  /** Rank ceiling: 24 payload bits -> ranks 1..25. */
  val HllRankMax = 25

  /** alpha_256 * m^2, pre-multiplied so both engines share ONE double
    * literal (alpha_256 = 0.7213 / (1 + 1.079/256)). */
  val HllAlphaM2: Double = 0.7182725932495458 * 65536.0

  /** Exact finite-decimal strings of 2^-1 .. 2^-25 (dyadics have finite
    * decimal expansions; parsing them yields the exact double in any
    * engine). */
  val HllInvStrings: Seq[String] = (1 to HllRankMax).map(i =>
    java.math.BigDecimal.ONE.divide(new java.math.BigDecimal(2).pow(i))
      .toPlainString)

  /** The cross-engine 32-bit key hash for a string-able key column. */
  def hllHash(key: Column): Column =
    Text.md5Hash32(concat(lit("hll:"), key.cast("string")))

  def hllBucket(hv: Column): Column = hv % HllBuckets

  /** Rank = leading zeros of the 24 payload bits + 1, as a nested-when
    * ladder folded ASCENDING so the largest threshold is OUTERMOST —
    * matching a SQL CASE's top-down largest-first evaluation. */
  def hllRank(hv: Column): Column = {
    val w = hv.divide(lit(HllBuckets)).cast("long") // exact: hv >= 0
    (0 to 23).foldLeft[Column](lit(HllRankMax)) {
      (els, b) => when(w >= (1L << b), lit(24 - b)).otherwise(els)
    }
  }

  /** 2^-m lookup (m in 1..25) against the exact-dyadic literal table. */
  def hllInv(m: Column): Column =
    element_at(array(HllInvStrings.map(d => lit(d.toDouble)): _*),
      m.cast("int"))

  /** Raw HLL estimate from (sum of 2^-m over occupied registers, occupied
    * register count): empty registers contribute 2^0 = 1 each. */
  def hllEstimate(s: Column, nBuckets: Column): Column =
    lit(HllAlphaM2) / (s + (lit(HllBuckets) - nBuckets))

  /** Small-range threshold 5/2 * m (Flajolet et al. 2007): below it, with
    * empty registers present, linear counting beats the raw estimator.
    * 640.0 is exactly representable, so the <= comparison is deterministic
    * given the bit-identical raw estimate. */
  val HllSmallRangeMax: Double = 2.5 * HllBuckets

  /** m * ln(m/V) for V = 1..m, each double rendered as its EXACT finite
    * decimal (every double is a dyadic rational, so the expansion is
    * finite; parsing it back yields the bit-identical double in any
    * engine). ln() itself is libm-dependent — not cross-engine
    * reproducible — but V = zero_buckets is FINITE (1..256), so the whole
    * correction domain is enumerable into a literal table computed once
    * here: the same determinism trick as [[HllInvStrings]]. Entry 256
    * (all registers empty) is exactly 0. */
  val HllLinearStrings: Seq[String] = (1 to HllBuckets).map { v =>
    new java.math.BigDecimal(
      HllBuckets * math.log(HllBuckets.toDouble / v)).toPlainString
  }

  /** Linear-counting estimate m * ln(m/V) via the literal table
    * (V = zero-register count, 1-indexed like the SQL list mirror). */
  def hllLinear(zeroBuckets: Column): Column =
    element_at(array(HllLinearStrings.map(d => lit(d.toDouble)): _*),
      zeroBuckets.cast("int"))

  /** Small-range-corrected estimate: linear counting when empty registers
    * exist AND the raw estimate is <= 5/2*m; the raw estimate otherwise
    * (at 100-TB cardinalities zero_buckets hits 0 and this is the
    * identity). */
  def hllCorrected(raw: Column, zeroBuckets: Column): Column =
    when(zeroBuckets > 0 && raw <= lit(HllSmallRangeMax),
      hllLinear(zeroBuckets)).otherwise(raw)

  /** Bloom filter geometry shared by q_bloom_prune and the streaming word
    * maintainer: 2048 bits / 3 hashes -> 32 64-bit words. */
  val BloomBits = 2048L
  val BloomHashes = 3

  /** The k exploded (bit) positions for a key — md5-32 in per-hash
    * namespaces, mod [[BloomBits]]. */
  def bloomBits(key: Column): Column =
    explode(array((0 until BloomHashes).map(i =>
      Text.md5Hash32(concat(lit(s"b$i:"), key.cast("string"))) % BloomBits): _*))

  /** Word index of a bit position. Exact: positions < 2048 divide exactly
    * in double space before the truncating cast. */
  def bloomWordIdx(bit: Column): Column = (bit / 64).cast("long")

  /** Single-bit mask within a word: a 64-entry literal lookup (1L << i,
    * two's-complement — entry 64 is Long.MinValue), robust for any bit
    * Column without string-round-tripping an expr. */
  def bloomMask(bit: Column): Column =
    element_at(array((0 to 63).map(i => lit(1L << i)): _*),
      (bit % 64).cast("int") + 1)
}
