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

  test("per-query shuffle bytes did not silently blow up since last round") {
    val cur = new ObjectMapper().readTree(
      Files.readString(Paths.get("BENCH.json")))
    assert(cur.has("shuffle_bytes"),
      "BENCH.json predates the shuffle-bytes ledger — refresh the full bench")
    // compare against the last COMMITTED BENCH.json (the driver's
    // BENCH_rNN.json is a truncated stdout capture, not the artifact);
    // bytes are plan-determined, so a >2x jump on >4 MiB of growth is a
    // plan regression (a new shuffle, a lost broadcast, a lost
    // partial-agg) even when local[32] wall time hides it. After the
    // refreshed bench is committed HEAD equals the working tree and the
    // diff is vacuous — the check bites exactly in the
    // refresh-then-commit window, and in any later round's run.
    val prior =
      try {
        val p = new ProcessBuilder("git", "show", "HEAD:BENCH.json").start()
        val out = new String(p.getInputStream.readAllBytes())
        p.waitFor()
        if (p.exitValue == 0) Some(new ObjectMapper().readTree(out))
        else None
      } catch { case _: Exception => None }
    prior.filter(_.has("shuffle_bytes")) match {
      case None => // first ledger-bearing round: nothing to diff yet
      case Some(prev) =>
        val prevB = prev.get("shuffle_bytes")
        val curB = cur.get("shuffle_bytes")
        val blown = prevB.fieldNames.asScala
          .filter(curB.has(_))
          .map(n => (n, prevB.get(n).asLong, curB.get(n).asLong))
          .filter { case (_, p, c) => c > 2 * p && c - p > (4L << 20) }
          .toSeq
        assert(blown.isEmpty,
          "shuffle bytes regressed >2x vs the last round's artifact " +
            "(new shuffle / lost broadcast?): " +
            blown.map { case (n, p, c) => s"$n: $p -> $c" }.mkString("; "))
    }
  }
}
