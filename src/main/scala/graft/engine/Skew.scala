package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handling (on by default)
  * covers sort-merge joins at runtime; these cover the cases AQE does not:
  * a single hot GROUP BY key overwhelming one reducer, and a broadcast-
  * ineligible dim joined on a skewed key. Salting is deterministic here
  * (hash-derived, never random) so results stay oracle-comparable.
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates: spread each key
    * over `salts` sub-keys (partial aggregate), then combine per key. One
    * extra narrow aggregation in exchange for no single reducer ever seeing
    * more than ~1/salts of a hot key's rows. The salt derives from a
    * caller-chosen discriminator column (any high-cardinality column of the
    * row, e.g. its id) — deterministic, so re-runs agree. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      discriminator: Column, salts: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(xxhash64(discriminator), lit(salts)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pcnt").as("n_rows"))
  }

  /** Salted join of a fact with a skewed key against a non-broadcastable
    * dim: fact rows scatter across `salts` sub-keys; dim rows replicate to
    * every sub-key (explode over the salt range). The shuffle key becomes
    * (key, salt), splitting a hot key's rows across `salts` tasks at the
    * cost of a `salts`-times larger dim shuffle — the standard trade. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
      factDiscriminator: Column, salts: Int): DataFrame = {
    val saltedFact = fact
      .withColumn("__salt", pmod(xxhash64(factDiscriminator), lit(salts)))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(saltedDim, Seq(keyCol, "__salt")).drop("__salt")
  }
}
