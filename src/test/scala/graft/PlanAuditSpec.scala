package graft

/** Scale-shape regression gate: every declared query's physical plan must
  * stay free of the two 100-TB red flags ([[PlanFlags]] — CartesianProduct
  * and unbounded empty-partition windows). PLANS.md documents the audit;
  * this test makes a regression fail the build instead of waiting for a
  * human to reread the artifact. Plans only — nothing executes. */
class PlanAuditSpec extends SparkSpec {

  test("no declared query plans a CartesianProduct or an unbounded global window") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, build) =>
      val fs = PlanFlags.flags(build(spark, sf).queryExecution.sparkPlan)
      if (fs.isEmpty) None else Some(s"$name: ${fs.mkString(", ")}")
    }
    assert(bad.isEmpty, s"red-flagged plans:\n${bad.mkString("\n")}")
  }
}
