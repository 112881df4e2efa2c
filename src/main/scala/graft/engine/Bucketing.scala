package graft.engine

import org.apache.spark.sql.DataFrame

/** Bucketed-table support: the pre-shuffle answer to repeated large joins.
  *
  * Writing both sides of a hot join bucketed (and sorted) by the join key
  * pins each key range to a bucket file; Spark then plans the join with NO
  * exchange on either side — at 100 TB this converts every downstream
  * fact-fact join on that key from a full shuffle into a local zip of
  * bucket pairs. The trade: bucket layout is fixed at write time, so it
  * pays off for keys joined repeatedly (orderkey, custkey), not ad-hoc ones.
  *
  * (Testdata stays plain parquet — the driver owns those files; BucketSpec
  * demonstrates the shuffle-free plan on tables written to a scratch
  * warehouse.)
  */
object Bucketing {

  /** Persist `df` bucketed+sorted by `key` as a managed table (single-key
    * convenience over [[Sinks.writeBucketed]], which adds multi-key,
    * explicit sortCols, external paths, and the one-file-per-bucket
    * repartition that sorted bucket scans require). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    Sinks.writeBucketed(df, table, buckets, Seq(key))

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed joins buy. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
