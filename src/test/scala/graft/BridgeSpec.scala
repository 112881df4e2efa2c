package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Upgrade fence for the one `private[sql]` reach in the codebase
  * (org.apache.spark.sql.graftbridge.Bridge): it unwraps sort-order Columns
  * via Spark's internal ColumnNode model, which can change shape on a Spark
  * upgrade WITHOUT a compile error (the match would just stop firing and
  * callers like TimeSeries would silently treat `desc("x")` as a value
  * column). This spec makes that break loud. */
class BridgeSpec extends SparkSpec {

  test("unwrapSortOrder strips desc()/asc() down to the value column") {
    val plain = col("x")
    for (wrapped <- Seq(desc("x"), asc("x"), col("x").desc, col("x").asc)) {
      val un = Bridge.unwrapSortOrder(wrapped)
      assert(un == plain,
        s"Bridge.unwrapSortOrder no longer unwraps $wrapped — Spark's " +
          "internal SortOrder ColumnNode changed shape (Spark upgrade?). " +
          "Fix the match in graftbridge/Bridge.scala before trusting any " +
          "ordered-column API (TimeSeries.asOfJoin ordering).")
    }
    // non-sort columns pass through untouched
    assert(Bridge.unwrapSortOrder(plain) == plain)
    assert(Bridge.unwrapSortOrder(col("x") + lit(1)) == (col("x") + lit(1)))
  }

  test("unwrapped order column is usable where a SortOrder is not") {
    import spark.implicits._
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("k", "v")
    // grouping by a raw desc("k") would throw at analysis; the unwrapped
    // column works — the exact contract TimeSeries relies on
    val got = df.groupBy(Bridge.unwrapSortOrder(desc("k")))
      .count().orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L))
  }
}
