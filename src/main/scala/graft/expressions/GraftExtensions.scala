package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extension point: registers the native expressions with the
  * session's function registry. Wire with
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`
  * (all engine entry points do); after that `expr("graft_dot(a, b)")` and
  * SQL both resolve, and the expression participates in whole-stage
  * codegen like any built-in. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_dot expects exactly 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_norm_fp"),
      new ExpressionInfo(classOf[NormFingerprint].getCanonicalName, "graft_norm_fp"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"graft_norm_fp expects exactly 1 argument, got ${children.length}")
        NormFingerprint(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpeish_count"),
      new ExpressionInfo(classOf[BpeishCount].getCanonicalName, "graft_bpeish_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1,
          s"graft_bpeish_count expects exactly 1 argument, got ${children.length}")
        BpeishCount(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_levenshtein"),
      new ExpressionInfo(classOf[BitLevenshtein].getCanonicalName, "graft_levenshtein"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"graft_levenshtein expects exactly 2 arguments, got ${children.length}")
        BitLevenshtein(children.head, children(1))
      }))
  }
}
