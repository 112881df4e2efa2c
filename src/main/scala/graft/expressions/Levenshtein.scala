package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel exact Levenshtein distance (Myers 1999; Hyyrö 2003 blocked
  * extension), registered as `graft_levenshtein`.
  *
  * Spark's built-in `levenshtein` runs the classic O(m*n) cell-at-a-time DP
  * — measured ~0.7 ms per ~300-char pair, which made the candidate-verify
  * queries' scoring pass their dominant cost (7.6 s of kernel time for a
  * 10k-pair set). Myers' algorithm processes one TEXT column per step and
  * all m PATTERN rows at once as bit-vectors — O(ceil(m/64) * n) word ops,
  * ~50x fewer operations at these lengths — and returns the IDENTICAL
  * exact distance (property-tested against the built-in kernel across
  * random unicode inputs, SimilaritySpec).
  *
  * Additional exact-preserving fast paths: common prefix/suffix trimming
  * (a near-duplicate pair — the dominant verify case — collapses to just
  * its differing middle) and pattern/text swap so the bit-vectors cover
  * the shorter side. Distances are over CODE POINTS, matching both the
  * built-in and DuckDB's `levenshtein`.
  */
object MyersLev {

  /** Exact Levenshtein distance between two UTF8 strings, over code
    * points. Static entry point for both `nullSafeEval` and the generated
    * code. */
  def distance(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString.codePoints.toArray
    val t = b.toString.codePoints.toArray
    // trim common prefix/suffix: edits never cross an untouched match run
    var lo = 0
    var hiS = s.length
    var hiT = t.length
    while (lo < hiS && lo < hiT && s(lo) == t(lo)) lo += 1
    while (hiS > lo && hiT > lo && s(hiS - 1) == t(hiT - 1)) { hiS -= 1; hiT -= 1 }
    val (p, pl, tx, tl) =
      if (hiS - lo <= hiT - lo) (s, hiS - lo, t, hiT - lo)
      else (t, hiT - lo, s, hiS - lo)
    if (pl == 0) return tl
    if (pl <= 64) single(p, lo, pl, tx, lo, tl)
    else blocked(p, lo, pl, tx, lo, tl)
  }

  /** Single-word Myers: pattern fits one 64-bit vector. */
  private def single(p: Array[Int], po: Int, m: Int,
      t: Array[Int], to: Int, n: Int): Int = {
    val peq = new java.util.HashMap[Integer, java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      val c: Integer = p(po + i)
      val prev = peq.get(c)
      peq.put(c, (if (prev == null) 0L else prev.longValue()) | (1L << i))
      i += 1
    }
    var pv = -1L
    var mv = 0L
    var score = m
    val last = 1L << (m - 1)
    var j = 0
    while (j < n) {
      val eqBox = peq.get(t(to + j): Integer)
      val eq = if (eqBox == null) 0L else eqBox.longValue()
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      var mh = pv & xh
      if ((ph & last) != 0L) score += 1
      if ((mh & last) != 0L) score -= 1
      ph = (ph << 1) | 1L
      mh = mh << 1
      pv = mh | ~(xv | ph)
      mv = ph & xv
      j += 1
    }
    score
  }

  /** Blocked Myers (Hyyrö): pattern spans ceil(m/64) words; the add and
    * the shifts propagate carries across blocks. */
  private def blocked(p: Array[Int], po: Int, m: Int,
      t: Array[Int], to: Int, n: Int): Int = {
    val w = (m + 63) >>> 6
    val peq = new java.util.HashMap[Integer, Array[Long]](m * 2)
    var i = 0
    while (i < m) {
      val c: Integer = p(po + i)
      var row = peq.get(c)
      if (row == null) { row = new Array[Long](w); peq.put(c, row) }
      row(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    val pvs = Array.fill(w)(-1L)
    val mvs = new Array[Long](w)
    var score = m
    val last = 1L << ((m - 1) & 63)
    var j = 0
    while (j < n) {
      val eqRow = peq.get(t(to + j): Integer)
      var addCarry = 0L // carry of (eq & pv) + pv across blocks
      var phIn = 1L // shift-in: the DP boundary row contributes +1 at bit 0
      var mhIn = 0L
      var b = 0
      while (b < w) {
        val eq = if (eqRow == null) 0L else eqRow(b)
        val pv = pvs(b)
        val mv = mvs(b)
        // horizontal-minus carry-in folds into Eq (Hyyro's blocked rule)
        val eqIn = eq | mhIn
        val xv = eq | mv
        val tAnd = eqIn & pv
        val sum = tAnd + pv + addCarry
        addCarry = ((tAnd & pv) | ((tAnd | pv) & ~sum)) >>> 63
        val xh = (sum ^ pv) | eqIn
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        if (b == w - 1) {
          if ((ph & last) != 0L) score += 1
          if ((mh & last) != 0L) score -= 1
        }
        val phOut = ph >>> 63
        val mhOut = mh >>> 63
        ph = (ph << 1) | phIn
        mh = (mh << 1) | mhIn
        phIn = phOut
        mhIn = mhOut
        pvs(b) = mh | ~(xv | ph)
        mvs(b) = ph & xv
        b += 1
      }
      j += 1
    }
    score
  }
}

/** `graft_levenshtein(l, r)` — exact Levenshtein distance via the
  * bit-parallel kernel above. Null if either side is null, like the
  * built-in. */
case class BitLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_levenshtein expects two string arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MyersLev.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.MyersLev.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitLevenshtein =
    copy(left = newLeft, right = newRight)
}
