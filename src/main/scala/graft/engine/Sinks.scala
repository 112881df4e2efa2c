package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink helpers (SURVEY.md §2.1 S6 extensions) for the file-layout concerns
  * that only matter at scale:
  *
  *  - **File sizing**: a 100-TB write that lets every reduce task emit one
  *    file produces either a small-files explosion (metadata pressure,
  *    per-file open cost on every future scan) or multi-GB files (no read
  *    parallelism). `writeSized` bounds rows per file with Spark's own
  *    maxRecordsPerFile split — tasks roll over to a new file at the cap,
  *    no extra shuffle.
  *  - **Partition layout**: `writePartitionedBy` lays data out hive-style so
  *    future reads with a filter on the partition column scan only matching
  *    directories (partition pruning — the `PartitionFilters` line in
  *    `.explain`, complementing the `PushedFilters` the audit tracks).
  */
object Sinks {

  /** Parquet write with an upper bound on rows per file. */
  def writeSized(df: DataFrame, path: String, maxRecordsPerFile: Long,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Hive-layout parquet write partitioned by the given columns; combine
    * with [[writeSized]]'s cap via the same option. */
  def writePartitionedBy(df: DataFrame, path: String, cols: Seq[String],
      maxRecordsPerFile: Long = 0L,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).partitionBy(cols: _*)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }
}
