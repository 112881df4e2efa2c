package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column

/** Bridge to Spark 4's qualified-private classic Column internals.
  *
  * Spark 4 moved the Column internals behind `private[sql]` (the
  * Connect-compatible Column is a ColumnNode wrapper), so this object lives
  * in an `org.apache.spark.sql` subpackage to reach them, and is the ONLY
  * place in the codebase allowed to do so. The surface is kept to exactly
  * what the engine uses — every extra method here is internal API that can
  * silently break on a Spark upgrade. */
object Bridge {

  /** If `c` is a sort-order column (`desc("x")` / `asc("x")`), its child
    * value column; otherwise `c` itself. Matches on the ColumnNode — the
    * Catalyst expression wraps the node lazily, so a Catalyst-level match
    * would not see the SortOrder until analysis. */
  def unwrapSortOrder(c: Column): Column = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder => Column(so.child)
    case _ => c
  }
}
