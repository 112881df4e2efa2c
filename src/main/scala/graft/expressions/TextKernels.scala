package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass replacements for the two regex chains the 10x scale probe
  * flagged as CPU-saturated (per-row Java-regex NFA passes dominating
  * q_dedup_normalized and the bpe-ish token counts):
  *
  *  - [[NormFingerprint]] (`graft_norm_fp`): the dedup normalization
  *    `trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9 ]', ''), ' +', ' '))`
  *    as ONE sweep — measured as three NFA passes plus two intermediate
  *    string allocations in the builtin form.
  *  - [[BpeishCount]] (`graft_bpeish_count`):
  *    `regexp_count(s, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')` as one
  *    run-length scan with no match objects.
  *
  * Both are EXACT drop-ins: character classes are ASCII, so the automaton
  * is a per-code-point switch, and each kernel is property-tested against
  * the builtin expression chain on random unicode (TextSpec). Non-ASCII
  * input takes the same code path — the classes simply never match it —
  * except lowercasing in [[NormFingerprint]], where a non-ASCII string
  * first goes through the same UTF8String.toLowerCase the builtin
  * `lower()` uses (the rare locale-sensitive mappings, e.g. Kelvin-sign ->
  * 'k', then flow through the sweep identically).
  */
object TextKernels {

  def normFingerprint(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    val src: Array[Byte] =
      if (ascii) bytes
      else s.toLowerCase.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](src.length)
    var n = 0
    var pendingSpace = false
    i = 0
    while (i < src.length) {
      val b = src(i)
      // ASCII lower for the fast path; slow path already lowercased and
      // anything still uppercase there is non-mapping, hence stripped
      val c: Int =
        if (b >= 'A' && b <= 'Z') b + 32
        else b & 0xff
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = c.toByte
        n += 1
      } else if (c == ' ') {
        pendingSpace = true // collapse runs; trim leading/trailing by deferral
      }
      // every other byte (incl. multi-byte UTF8 continuation) is stripped,
      // exactly like the '[^a-z0-9 ]' class
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }

  def bpeishCount(s: UTF8String): Int = {
    val str = s.toString
    var count = 0
    var prev = 0 // 0 = none/space, 1 = alpha run, 2 = digit run
    var i = 0
    while (i < str.length) {
      // code-point steps: a surrogate PAIR is one '[^A-Za-z0-9 ]' match in
      // Java regex and RE2 alike, so it must count once here too
      val cp = str.codePointAt(i)
      val cls =
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) 1
        else if (cp >= '0' && cp <= '9') 2
        else if (cp == ' ') 0
        else 3
      cls match {
        case 0 => prev = 0
        case 3 => count += 1; prev = 0 // every symbol cp is its own token
        case c => if (c != prev) count += 1; prev = c
      }
      i += Character.charCount(cp)
    }
    count
  }
}

/** `graft_norm_fp(s)` — the dedup normalization fingerprint input in one
  * pass (see [[TextKernels.normFingerprint]]). */
case class NormFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_norm_fp expects a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.normFingerprint(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.expressions.TextKernels.normFingerprint($a)")

  override protected def withNewChildInternal(newChild: Expression): NormFingerprint =
    copy(child = newChild)
}

/** `graft_bpeish_count(s)` — the pre-merge BPE granularity count in one
  * scan (see [[TextKernels.bpeishCount]]). */
case class BpeishCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bpeish_count expects a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.bpeishCount(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.expressions.TextKernels.bpeishCount($a)")

  override protected def withNewChildInternal(newChild: Expression): BpeishCount =
    copy(child = newChild)
}
