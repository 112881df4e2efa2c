package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // quirk Q9: pandas float semantics (x/0 -> inf, 0/0 -> NaN), not ANSI errors
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM paths (parquet reader, codegen compiler, shuffle) once so
    // startup cost isn't attributed to whichever query happens to run first
    try SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).limit(1).count())
    catch { case _: Throwable => () }
    // noop sink materializes every row and column (count() would let
    // Catalyst prune projections and under-measure projection-heavy
    // queries). Each query runs twice: the first run pays one-time codegen
    // compilation + JIT (amortized away in any sustained deployment), the
    // second is the steady-state time reported per query. Both totals are
    // emitted — `value` is steady-state, `cold_total` the first-run sum.
    // failed queries are recorded (name -> error) rather than silently
    // timed on their failure path; the emitted JSON carries an `errors` map
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      } catch {
        case t: Throwable =>
          errors.getOrElseUpdate(name, t.getClass.getSimpleName + ": " +
            String.valueOf(t.getMessage).replaceAll("[\"\\\\\n\r]", " ").take(200))
      }
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq
    val cold = names.map(n => n -> once(n)).toMap
    val results = names.map(n => n -> once(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val coldTotal = cold.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"cold_total":$coldTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
