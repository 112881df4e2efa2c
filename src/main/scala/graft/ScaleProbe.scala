package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round scaling-regression gate: replicates the sf0.1 `documents`
  * table `Repl`x, re-runs every documents-only query on base and
  * replicated data, and writes the measured factor per query to
  * SCALING.json.
  *
  * The replication must preserve the workload's SHAPE, not just its row
  * count, so each replica is made disjoint from the others on every key a
  * query buckets by: ids are strided far apart (planted-twin offsets never
  * collide across replicas, and `doc_id % k` plant patterns repeat
  * identically per replica) AND every token gets a replica-specific suffix
  * — identical text across replicas would give all 10 copies identical
  * MinHash/SimHash signatures and token sets, multiplying every band
  * bucket's occupancy by Repl (pushing buckets over the hot caps, which
  * SKIPS them and would let a genuinely quadratic candidate step report a
  * sub-linear factor) and wiring the dedup graph ACROSS replicas. With
  * disjoint vocabularies per replica, near-dup structure stays
  * within-replica and the scaled corpus really is Repl independent copies
  * of the base workload.
  *
  * A sub-linear-or-linear factor (<= ~Repl) is the evidence that no
  * candidate-generation step has gone quadratic — the failure mode the
  * fixed-SF bench can never see. Run each round; the judge reads
  * SCALING.json next to BENCH.json.
  */
object ScaleProbe {

  /** Queries that read ONLY the documents table (the replicated input). */
  private val DocQueries = Seq(
    "q_dedup_exact", "q_text_stats", "q_lang_id", "q_doc_profile",
    "q_jaccard_neardup", "q_media_meta", "q_token_counts",
    "q_fingerprint_rolling", "q_train_split", "q_shuffle_order",
    "q_pack_shards", "q_minhash_neardup", "q_simhash_neardup",
    "q_dedup_components", "q_decontaminate", "q_mix_sample",
    "q_repetition_quality", "q_vocab_topk", "q_tfidf_keywords",
    "q_substring_dedup", "q_source_cap", "q_lm_score", "q_blocklist_scrub",
    "q_curation_report", "q_curriculum_order", "q_corpus_diff",
    "q_budget_mixture", "q_length_quantiles", "q_pipeline_e2e",
    "q_shard_manifest", "q_dedup_normalized", "q_label_mismatch")

  private val Repl = 10
  // larger than any planted-twin id offset (1_000_000 + base ids), so
  // replica id ranges can never overlap each other or their planted twins
  private val Stride = 10_000_000L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scaledDir = "target/scaleprobe"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = engine.Tables.t(spark, sfDir, "documents")
    (0 until Repl)
      .map { r =>
        // replica 0 keeps the base text verbatim; every other replica
        // suffixes each token with its replica id, so replicas share no
        // tokens/shingles/signatures (see scaladoc for why that matters)
        val text =
          if (r == 0) col("text")
          else array_join(transform(split(col("text"), " "),
            t => concat(t, lit(s"~$r"))), " ")
        base.withColumn("doc_id", col("doc_id") + lit(r * Stride))
          .withColumn("text", text)
      }
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$scaledDir/documents.parquet")

    val queries = SparkEntry.queries
    // a failing query must not abort the probe and discard the completed
    // measurements — it reports factor NaN and the run continues
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def timeOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      catch {
        case t: Throwable =>
          if (failed.add(name))
            System.err.println(s"[scale] $name FAILED on $dir: ${t.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // one discarded cold run (codegen/JIT), then median of steady runs —
    // same protocol for base and scaled, so the FACTOR is load-robust
    val SteadyIters = 3
    def bench(name: String, dir: String): Double = {
      timeOnce(name, dir)
      median((1 to SteadyIters).map(_ => timeOnce(name, dir)))
    }

    val rows = DocQueries.map { q =>
      val b = bench(q, sfDir)
      val s = bench(q, scaledDir)
      val factor = s / b
      System.err.println(f"[scale] $q%-24s base=$b%7.3fs x$Repl=$s%7.3fs factor=$factor%5.2f")
      (q, b, s, factor)
    }
    val ok = rows.filterNot { case (q, _, _, _) => failed(q) }
    val json = ok.map { case (q, b, s, f) =>
      f""""$q":{"base_s":$b%.3f,"x${Repl}_s":$s%.3f,"factor":$f%.2f}"""
    }.mkString(s"""{"replication":$Repl,"sf":"$sfDir","steady_iters":$SteadyIters,"failed":[${failed.map("\"" + _ + "\"").mkString(",")}],"queries":{""", ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get("SCALING.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
