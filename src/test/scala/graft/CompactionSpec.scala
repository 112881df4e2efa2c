package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.engine.{Sinks, Tables}

/** Small-file compaction (Sinks.compact): a directory fragmented into many
  * tiny files — the state every streaming sink or append-heavy table drifts
  * into — rewrites to the minimum number of row-bounded files with identical
  * contents, swapped in place. The lakehouse OPTIMIZE primitive next to
  * writeBucketed/writeRangeSorted. */
class CompactionSpec extends SparkSpec {

  test("fragmented directory compacts to the minimal file count, same rows") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    val n = docs.count()
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // fragment: ~one file per 7 rows
    Sinks.writeSized(docs, dir, maxRecordsPerFile = 7)
    def parquetFiles() = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val before = parquetFiles().length
    assert(before >= (n / 7).toInt, s"fragmentation vacuous: $before files")

    val checksum = docs.agg(sum("doc_id"), sum("n_chars")).head()
    val written = Sinks.compact(spark, dir, maxRecordsPerFile = 1000)
    val after = parquetFiles()
    assert(after.length == written)
    assert(after.length == ((n + 999) / 1000).toInt,
      s"expected minimal file count, got ${after.length}")
    assert(after.length < before)
    for (f <- after)
      assert(spark.read.parquet(f.getPath).count() <= 1000, s"${f.getName} too big")
    // contents identical: row count and column checksums survive the swap
    val back = spark.read.parquet(dir)
    assert(back.count() == n)
    assert(back.agg(sum("doc_id"), sum("n_chars")).head() == checksum)
    assert(back.schema == docs.schema)
    // no leftover staging directory
    assert(!new java.io.File(dir + ".compacting").exists())
  }
}
