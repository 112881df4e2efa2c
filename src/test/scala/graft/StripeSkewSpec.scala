package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.Text

/** The 64-stripe designs (q_budget_mixture, q_curriculum_order) bound
  * their window partitions BY CONSTRUCTION: the partition key is
  * (lang|band, md5-sub-bucket % 64), so even a language holding 90% of
  * the corpus never yields a window partition larger than ~1/64 of that
  * language. SkewSpec proves the analogous property for salted joins;
  * this suite proves it empirically for the stripe designs with a
  * synthetic 90%-skew corpus — the direct evidence behind the "no window
  * partition ever exceeds ~1/64 of a language" claim in their scaladoc.
  *
  * Everything here is deterministic (fixed ids -> fixed md5 stripes), so
  * the asserted bounds are exact reruns, not statistical luck.
  */
class StripeSkewSpec extends SparkSpec {

  private val nDocs = 20000L

  /** Synthetic corpus with one language at 90%: doc_id % 10 == 0 -> "zh",
    * everything else "en"; 5..34 tokens per doc so curriculum bands span
    * more than one value. Written as a documents.parquet dir so the REAL
    * declared queries run against it unmodified. */
  private lazy val skewDir: String = {
    val dir = Files.createTempDirectory("graft_skew_docs").toString
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(1), lit(5) + pmod(col("id"), lit(30))),
        i => concat(lit("w"), pmod(col("id") * 31 + i, lit(997)))), " ").as("text"),
      when(pmod(col("id"), lit(10)) === 0, "zh").otherwise("en").as("lang"),
      lit("src0").as("source"))
    docs.withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def maxLangRows: Long = nDocs * 9 / 10 // "en" at 90%

  test("budget-mixture stripes bound window partitions under 90% skew") {
    // the query itself runs green on the skewed corpus
    val out = SparkEntry.queries("q_budget_mixture")(spark, skewDir)
    assert(out.count() > 0)
    // and its window-partition key (lang, md5 % 64 — the exact expressions
    // the query partitions by, CurationQueries.budgetMixture) never holds
    // more than ~1/64 of the dominant language
    val h = Text.md5Hash32(concat(lit("bud:"), col("doc_id").cast("string")))
    val maxPartition = spark.read.parquet(s"$skewDir/documents.parquet")
      .groupBy(col("lang"), pmod(h, lit(64L)).as("stripe"))
      .count().agg(max("count")).head.getLong(0)
    val evenShare = maxLangRows / 64.0
    assert(maxPartition <= (evenShare * 1.5).toLong,
      s"max stripe partition $maxPartition exceeds 1.5x the even share $evenShare")
  }

  test("curriculum stitch buckets bound window partitions under 90% skew") {
    val out = SparkEntry.queries("q_curriculum_order")(spark, skewDir)
    assert(out.count() == nDocs)
    // stitch-bucket key = band * 64 + (md5 % 64) (CurationQueries
    // .curriculumOrder); with every doc in one band this is the worst case
    val h = Text.md5Hash32(concat(lit("cur:"), col("doc_id").cast("string")))
    val docs = spark.read.parquet(s"$skewDir/documents.parquet")
      .select(col("doc_id"),
        floor(Text.tokenCount(col("text")) / lit(25.0)).cast("long").as("band"),
        h.as("h"))
    val bandCounts = docs.groupBy("band").count()
    val maxBandRows = bandCounts.agg(max("count")).head.getLong(0)
    val maxBucket = docs
      .groupBy((col("band") * 64 + pmod(col("h"), lit(64L))).as("bucket"))
      .count().agg(max("count")).head.getLong(0)
    val evenShare = maxBandRows / 64.0
    assert(maxBucket <= (evenShare * 1.5).toLong,
      s"max stitch bucket $maxBucket exceeds 1.5x the even share $evenShare")
  }
}
