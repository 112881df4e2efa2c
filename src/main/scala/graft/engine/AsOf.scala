package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic AS-OF join (the full direction surface of q_asof_join's
  * composition): attach to each probe row the reference row whose timestamp
  * is nearest at-or-before it (Backward), at-or-after it (Forward), or
  * whichever of the two is closer (Nearest, ties backward) — optionally
  * within a tolerance.
  *
  * Spark-first shape, no inequality join anywhere: both sides are tagged
  * and unioned, and an ignoreNulls running window inside each key partition
  * carries the reference (timestamp, value) struct to the probe rows —
  * O(n log n) per key, every key independent, the stream-merge form. At
  * equal timestamps the reference row is visible to the probe in BOTH
  * directions (<= / >= semantics).
  */
object AsOf {

  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction
  case object Nearest extends Direction

  /** @param keys       equi-join key columns (same names both sides)
    * @param leftTs     probe-side timestamp column
    * @param rightTs    reference-side timestamp column
    * @param rightVal   reference-side value column to attach
    * @param toleranceS max |probe ts - reference ts| in seconds; matches
    *                   further away become null
    * @return left's columns plus `<rightVal>_asof` and `<rightVal>_asof_ts`
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVal: String,
      direction: Direction = Backward,
      toleranceS: Option[Long] = None): DataFrame = {
    val keyCols = keys.map(col)
    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))

    val probes = left.select(
      keyCols :+ col(leftTs).as("__ts") :+ struct(left.columns.map(col): _*).as("__l") :+
        lit(1).as("__probe") :+
        lit(null).cast("struct<rt:timestamp,v:double>").as("__rv"): _*)
    val refs = right.select(
      keyCols :+ col(rightTs).as("__ts") :+ lit(null).cast(probes.schema("__l").dataType).as("__l") :+
        lit(0).as("__probe") :+
        struct(col(rightTs).cast("timestamp").as("rt"),
          col(rightVal).cast("double").as("v")).as("__rv"): _*)
    val u = probes.unionAll(refs)

    // Backward: refs sort BEFORE probes at equal ts (probe sees same-ts ref
    // through the preceding frame); Forward: refs sort AFTER probes (probe
    // sees same-ts ref through the following frame). __rv last in the order
    // makes the winner among equal-ts refs deterministic.
    def matched(probeFirstAtTie: Boolean): Column = {
      val ord: Seq[Column] =
        if (probeFirstAtTie)
          Seq(col("__ts"), col("__probe").desc, col("__rv"))
        else
          Seq(col("__ts"), col("__probe"), col("__rv"))
      val w = Window.partitionBy(keyCols: _*).orderBy(ord: _*)
      if (probeFirstAtTie)
        first(col("__rv"), ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__rv"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }

    val withMatch = direction match {
      case Backward => u.withColumn("__m", matched(probeFirstAtTie = false))
      case Forward  => u.withColumn("__m", matched(probeFirstAtTie = true))
      case Nearest =>
        val b = matched(probeFirstAtTie = false)
        val f = matched(probeFirstAtTie = true)
        val db = abs(col("__ts").cast("double") - col("__b").getField("rt").cast("double"))
        val df_ = abs(col("__ts").cast("double") - col("__f").getField("rt").cast("double"))
        u.withColumn("__b", b).withColumn("__f", f)
          .withColumn("__m",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(df_ < db, col("__f"))
              .otherwise(col("__b"))) // ties -> backward
          .drop("__b", "__f")
    }

    val inTol = toleranceS match {
      case Some(t) =>
        abs(col("__ts").cast("double") - col("__m").getField("rt").cast("double")) <= t.toDouble
      case None => lit(true)
    }
    withMatch
      .filter(col("__probe") === 1)
      .withColumn("__ok", col("__m").isNotNull && inTol)
      .select(leftCols :+
        when(col("__ok"), col("__m").getField("v")).as(s"${rightVal}_asof") :+
        when(col("__ok"), col("__m").getField("rt")).as(s"${rightVal}_asof_ts"): _*)
  }
}
