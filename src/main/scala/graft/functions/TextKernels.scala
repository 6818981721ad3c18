package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass whitespace kernels behind [[TextFunctions.normalizeText]]
  * and [[TextFunctions.tokens]] (r19).
  *
  * The declarative forms — `lower(trim(regexp_replace(text, "\\s+", " ")))`
  * and `split(trim(text), "\\s+")` — run the java.util.regex NFA over
  * every document, allocating a Matcher and a StringBuffer per row; at
  * sf0.1 the tokenize map stages of the text composites (q152/q164/q170/
  * q189/q212…) were the largest single CPU stages of the bench. These
  * kernels do one byte scan instead. Semantics are replicated EXACTLY
  * (TextKernelsSpec pins kernel ≡ declarative over the corpus and an
  * adversarial literal set):
  *
  *   - `\s` is Java's default (non-UNICODE_CHARACTER_CLASS) class
  *     [ \t\n\x0B\f\r] — all single-byte in UTF-8, so a byte scan cannot
  *     split a multi-byte code point;
  *   - `trim` removes only the space character (0x20), exactly like
  *     Spark's StringTrim — a leading tab survives trim and yields the
  *     same leading empty token `split` produces;
  *   - lowercasing calls UTF8String.toLowerCase on the whole normalized
  *     string — the identical code path (ASCII fast path, full-case
  *     String.toLowerCase otherwise) Spark's `lower` runs, applied in the
  *     same order (normalize, then lower);
  *   - `split(s, re)` with Spark's default limit -1 keeps leading empty
  *     fields (and the [""] result for an empty input), both replicated.
  */
object TextKernels {

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  /** lower(trim(regexp_replace(s, "\\s+", " "))) in one byte pass plus
    * one toLowerCase.
    */
  def normWs(s: UTF8String): UTF8String = {
    val n = s.numBytes
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.getByte(i)
      if (isWs(c)) {
        if (o > 0) pendingSpace = true // leading run: trimmed anyway
      } else {
        if (pendingSpace) { out(o) = 0x20; o += 1; pendingSpace = false }
        out(o) = c
        o += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o).toLowerCase
  }

  /** split(trim(s), "\\s+") with Spark's default limit (-1): trim strips
    * 0x20 only; a leading non-space whitespace char yields a leading ""
    * token (Java split semantics); an empty trimmed input yields [""].
    */
  def wsTokens(s: UTF8String): ArrayData = {
    val n = s.numBytes
    var lo = 0
    var hi = n
    while (lo < hi && s.getByte(lo) == 0x20) lo += 1
    while (hi > lo && s.getByte(hi - 1) == 0x20) hi -= 1
    if (lo == hi)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    // Java split(re, -1) semantics: one segment before each \s+ run and
    // one after the last — so a leading run yields a leading "" and a
    // trailing run a trailing "" (only spaces were trimmed above)
    val out = new java.util.ArrayList[UTF8String]
    val bytes = s.getBytes
    var i = lo
    var segStart = lo
    while (i < hi) {
      if (isWs(bytes(i))) {
        out.add(UTF8String.fromBytes(bytes, segStart, i - segStart))
        while (i < hi && isWs(bytes(i))) i += 1
        segStart = i
      } else i += 1
    }
    out.add(UTF8String.fromBytes(bytes, segStart, hi - segStart))
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }
}

/** [[TextKernels.normWs]] as a codegen-friendly expression. */
case class WsNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_normalize requires STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "ws_normalize"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.normWs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.normWs($c)")
  override protected def withNewChildInternal(newChild: Expression): WsNormalize =
    copy(child = newChild)
}

/** [[TextKernels.wsTokens]] as a codegen-friendly expression. */
case class WsTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wsTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wsTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}
