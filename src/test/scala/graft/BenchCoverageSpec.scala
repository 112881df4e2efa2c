package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Bench-discipline guard (VERDICT r8 item 5): a query registered in
  * [[queries.Registry]] but absent from the committed BENCH.json is a test
  * failure, not a driver surprise. Round 8 shipped three queries with no
  * local bench entry and the first driver measurement of one of them was a
  * 39.7s outlier the builder never saw — this spec makes that impossible:
  * registering a query forces a same-commit full sf0.1 bench refresh.
  *
  * The set check is exact in both directions (a renamed/removed query must
  * also leave BENCH.json), counts every declared query as either timed or
  * errored, and requires zero errored entries — an error-truncated bench is
  * not an artifact of record. Needs no SparkSession; parses with the
  * Jackson shipped in Spark's jars.
  */
class BenchCoverageSpec extends AnyFunSuite {

  test("committed BENCH.json times exactly the registered query set, zero errors") {
    val tree = new ObjectMapper().readTree(
      Files.readString(Paths.get("BENCH.json")))
    val timed = tree.path("queries").fieldNames.asScala.toSet
    val errored = tree.path("errors").fieldNames.asScala.toSet
    val registered = queries.Registry.all.map(_.name).toSet

    assert(errored.isEmpty,
      s"BENCH.json records errored queries (re-run the full bench green): $errored")

    val unbenched = registered -- timed
    assert(unbenched.isEmpty,
      s"registered but not in BENCH.json — run the full sf0.1 bench and commit it: $unbenched")

    val phantom = timed -- registered
    assert(phantom.isEmpty,
      s"in BENCH.json but not registered (stale artifact): $phantom")

    if (tree.has("declared"))
      assert(tree.get("declared").asInt == registered.size,
        "BENCH.json 'declared' disagrees with Registry.all size")
  }
}
