package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All C(k,2) ordered pairs "a b" over the DISTINCT, binary-sorted,
  * non-empty elements of an array<string> — the local pair expansion of
  * co-occurrence mining (queries.Extended.q51), one fused codegen loop.
  *
  * Semantics are EXACTLY the composable HOF form it replaces:
  * {{{
  *   t = array_sort(array_distinct(tokens))
  *   flatten(transform(t, (x, i) =>
  *     transform(slice(t, i + 2, size(t)), y => struct(x, y))))
  *     .filter(length(tok_a) > 0)
  * }}}
  * — dedup, binary-lexicographic sort (UTF8String byte order — what
  * array_sort uses and what SQL engines' default string collation
  * compares, NOT Java's UTF-16 code-unit order), pairs (a, b) with
  * a < b, pairs involving the empty token dropped (the empty string
  * sorts first, so it can only ever be tok_a — skipping it up front is
  * identical to the post-hoc filter). Pair elements join with a single
  * space: tokens come from a space-split so they can never contain one,
  * making `split(pair, ' ')` a lossless decode after aggregation.
  *
  * The HOF form allocates O(k) slice copies (O(k²) total copying) and
  * interprets three lambda trees per document outside whole-stage
  * codegen — measured 41× the oracle's cost on q51; this loop emits each
  * pair string exactly once. Output size is C(k,2) per row: the caller
  * bounds document length upstream (documents are bounded; a 100 TB feed
  * caps the per-doc distinct set), exactly as the HOF form required.
  */
case class PairStrings(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString(8)}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_pairs"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PairStringsUtil.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.PairStringsUtil.pairs($arr);")

  override protected def withNewChildInternal(newChild: Expression): PairStrings =
    copy(child = newChild)
}

object PairStringsUtil {
  private val Space = UTF8String.fromString(" ")

  def pairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // TreeSet gives dedup + UTF8String binary order (= array_sort order)
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.numBytes() > 0) set.add(s)
      }
      i += 1
    }
    val k = set.size()
    val sorted = set.toArray(new Array[UTF8String](k))
    val out = new Array[Any](k * (k - 1) / 2)
    var p = 0
    var a = 0
    while (a < k - 1) {
      var b = a + 1
      while (b < k) {
        out(p) = UTF8String.concat(sorted(a), Space, sorted(b))
        p += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }
}
