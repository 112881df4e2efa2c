package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import graft.engine.{Sinks, Tables}

/** DYNAMIC partition pruning — the subquery-filter path a 100-TB fact/dim
  * layout lives on (VERDICT r9 item 3, completing SinksSpec's STATIC
  * pruning evidence): a filter that exists only on the DIM side must
  * reach the hive-partitioned FACT scan at runtime as a
  * `dynamicpruningexpression`, so only the matching partitions' files are
  * ever read. SinksSpec proves the static half (a literal predicate on
  * the partition column); this spec proves the half where the predicate
  * is not known until the dim side is evaluated — on a cluster, the
  * difference between scanning 100 TB and scanning one partition. */
class DppSpec extends SparkSpec {
  import spark.implicits._

  /** AQE wraps joins; the final physical plan lives inside. */
  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Collect file scans through AQE's opaque stage boundaries
    * (QueryStageExec is a leaf whose subtree hides behind .plan). */
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val here = p match {
      case s: FileSourceScanExec => Seq(s)
      case q: QueryStageExec => scans(q.plan)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case r: ReusedExchangeExec => scans(r.child)
      case _ => Seq.empty
    }
    here ++ p.children.flatMap(scans)
  }

  private def parquetFilesUnder(d: java.io.File): Int = {
    val here = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
    here.count(f => f.isFile && f.getName.endsWith(".parquet")) +
      here.filter(_.isDirectory).map(parquetFilesUnder).sum
  }

  test("dim-side filter dynamically prunes the hive-partitioned fact scan") {
    // fact: documents laid out hive-partitioned by lang (the layout
    // Sinks.writePartitionedBy exists for)
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "n_chars", "lang")
    val dir = Files.createTempDirectory("graft_dpp").toString
    Sinks.writePartitionedBy(docs, dir, Seq("lang"))

    // dim: a lang -> group mapping where the FILTER column (grp) exists
    // only on the dim — the fact-side partition predicate is unknowable
    // until the dim is evaluated, which is exactly what DPP solves
    val langs = docs.select("lang").distinct().as[String].collect().sorted
    assert(langs.length >= 2, "need >= 2 partitions for a non-vacuous prune")
    val keep = langs.take(2)
    // the dim must be a REAL scan, not a LocalRelation: an in-memory dim
    // gets its filter constant-folded away (ConvertToLocalRelation), and
    // with no selective predicate left the PartitionPruning rule bails
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString
    langs.map(l => (l, if (keep.contains(l)) "keep" else "drop"))
      .toSeq.toDF("lang", "grp").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    val fact = spark.read.parquet(dir)
    val joined = fact.join(dim, Seq("lang")).filter(col("grp") === "keep")
      .select("doc_id", "lang", "grp")
    val got = joined.collect()

    // 1) plan evidence: the fact scan carries a runtime
    //    dynamicpruningexpression in its PartitionFilters
    val plan = finalPlan(joined.queryExecution.executedPlan)
    assert(plan.toString.contains("dynamicpruningexpression"),
      s"no DPP filter in plan:\n${plan.toString.take(800)}")

    // 2) metric evidence: the scan read ONLY the kept partitions' files
    val factScan = scans(plan)
      .filter(_.output.exists(_.name == "doc_id")).head
    val filesKept = keep.map(l => parquetFilesUnder(new java.io.File(s"$dir/lang=$l"))).sum
    val filesTotal = parquetFilesUnder(new java.io.File(dir))
    assert(filesKept < filesTotal, s"vacuous: $filesKept of $filesTotal files")
    assert(factScan.metrics("numFiles").value == filesKept,
      s"scan read ${factScan.metrics("numFiles").value} files, kept partitions hold $filesKept")

    // 3) result evidence: identical rows to the unpartitioned join
    val want = docs.filter(col("lang").isin(keep: _*)).count()
    assert(got.length == want, s"got ${got.length} rows, want $want")
    assert(got.forall(r => keep.contains(r.getAs[String]("lang"))))
  }
}
