package graft
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // quirk Q9: pandas float semantics (x/0 -> inf, 0/0 -> NaN), not ANSI errors
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      val codegen = plan.linesIterator.count(_.contains("WholeStageCodegen"))
      val pushed = plan.linesIterator.filter(_.contains("PushedFilters: [")).map(_.trim.take(100)).toList
      println(s"=== $name: exchanges=$exchanges scans=$scans codegenSpans=$codegen")
      pushed.filterNot(_.contains("PushedFilters: []")).foreach(l => println(s"   $l"))
    }
    spark.stop()
  }
}
