package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge-rule application over a SEP-joined symbol string —
  * greedy LEFTMOST NON-OVERLAPPING merging of adjacent symbol pairs
  * (l, r) → lr, the exact Sennrich et al. 2016 semantics (their
  * reference regex `(?<!\S)l\sr(?!\S)` uses zero-width boundaries, so
  * consecutive disjoint occurrences all merge; a merged symbol is never
  * reused as the LEFT of another merge in the same pass — which falls
  * out of comparing whole symbols, since l+r ≠ l whenever r is
  * non-empty).
  *
  * This replaces the r7 literal `replace(w, l+SEP+r, l+r)`, which
  * compared SUBSTRINGS, not symbols: once multi-char symbols exist it
  * could fuse across symbol boundaries (symbols [x, aa] with rule
  * (x, a): replace("x␁aa", "x␁a", "xa") → "xaa", welding x to half of
  * "aa") and its consumed separators dropped merges between adjacent
  * disjoint occurrences ([a,b,a,b] merged only once). Symbols are
  * compared EXACTLY here; the DuckDB oracle runs the same fold as a
  * list_reduce lambda, so training stays hash-oracled. Tokens must not
  * contain the U+0001 separator (the [[graft.operators.TextAnalysis]]
  * BPE contract).
  */
case class BpeMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string, string), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_bpe_merge"

  override def nullable: Boolean = true

  override protected def nullSafeEval(w: Any, l: Any, r: Any): Any =
    BpeMergeUtil.merge(w.asInstanceOf[UTF8String],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, l, r) =>
      s"${ev.value} = graft.functions.BpeMergeUtil.merge($w, $l, $r);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeMerge =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeMergeUtil {
  final val Sep = "\u0001"

  def merge(w: UTF8String, l: UTF8String, r: UTF8String): UTF8String = {
    val ws = w.toString
    if (!ws.contains(Sep)) return w
    val ls = l.toString
    val rs = r.toString
    val syms = ws.split(Sep, -1)
    val sb = new java.lang.StringBuilder(ws.length)
    var i = 0
    var first = true
    while (i < syms.length) {
      val merged = i + 1 < syms.length && syms(i) == ls && syms(i + 1) == rs
      if (!first) sb.append(Sep)
      if (merged) { sb.append(ls).append(rs); i += 2 }
      else { sb.append(syms(i)); i += 1 }
      first = false
    }
    UTF8String.fromString(sb.toString)
  }
}
