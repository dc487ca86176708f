package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document span removal for exact-substring dedup
  * (`TextDedup.substringDedup`, Lee et al. 2021-style) and line dedup
  * (`TextDedup.lineDedup`, n=1 at `sep`="\n"): given a `sep`-separated
  * text and the 0-based start positions of its hot `n`-token windows,
  * drop every token covered by some window `[s, s+n-1]` and reassemble
  * the survivors in order joined by `sep`. Returns
  * `struct(text: string, n_removed: long)`; empty string when
  * everything was covered.
  *
  * Semantics are EXACTLY the relational form it replaces:
  * {{{
  *   covered = explode(sequence(p0+1, p0+n)) per hot window, distinct
  *   kept    = posexploded tokens ANTI-JOIN covered
  *   rebuilt = array_join(sorted collect_list(struct(p, token)), " ")
  * }}}
  * — same `split(text, " ")` (limit -1) tokenization, same coverage
  * arithmetic, same order — but as one O(tokens + starts·log starts)
  * two-pointer sweep per DOCUMENT row instead of three corpus-sized
  * shuffles: the explode emitted `hits×n` position rows before its
  * distinct (≈1.2B rows at the factor-30 heavy corpus, the measured
  * memory-band thrash), the token anti-join re-exploded the corpus, and
  * the rebuild shuffled every surviving token as a (pos, token) struct.
  * Start positions arrive unsorted (`collect_list` order is partition
  * order); the sweep sorts its own copy. Starts beyond the window range
  * are tolerated (cover nothing past the end); the caller never
  * produces them.
  */
case class StripSpans(left: Expression, right: Expression, n: Int,
    sep: String = " ")
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) if n >= 1 && sep.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires n >= 1 and a non-empty separator, " +
            s"got n=$n sep='$sep'")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<int>), got " +
          s"(${l.simpleString(8)}, ${r.simpleString(8)})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  override def prettyName: String = "graft_strip_spans"

  // the token boundary is the LITERAL separator (quoted), split limit -1
  // — identical to split(text, Pattern.quote(sep)); precompiled once,
  // referenced from both eval paths
  @transient private lazy val sepPattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(java.util.regex.Pattern.quote(sep))

  override protected def nullSafeEval(text: Any, starts: Any): Any =
    StripSpansUtil.strip(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], n, sepPattern, sep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("sepPattern", sepPattern,
      "java.util.regex.Pattern")
    val sepRef = ctx.addReferenceObj("sep", sep, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (text, starts) =>
      s"${ev.value} = graft.functions.StripSpansUtil.strip(" +
        s"$text, $starts, $n, $patRef, $sepRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StripSpans =
    copy(left = newLeft, right = newRight)
}

/** Hot loop as a static method shared by interpreted eval and generated
  * code (the NgramDigestUtil idiom).
  */
object StripSpansUtil {
  def strip(text: UTF8String, startsData: ArrayData, n: Int,
      sepPattern: java.util.regex.Pattern, sep: String): InternalRow = {
    // identical tokenization to split(text, Pattern.quote(sep)) limit -1
    val tokens = sepPattern.split(text.toString, -1)
    val m = startsData.numElements()
    val starts = new Array[Int](m)
    var i = 0
    while (i < m) {
      // a null slot would read as 0 and silently cover [0, n-1] — the
      // callers (collect_list over computed ints) never produce one, so
      // treat it as corrupt input and fail loud
      if (startsData.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_strip_spans: null start position at index $i")
      starts(i) = startsData.getInt(i)
      i += 1
    }
    java.util.Arrays.sort(starts)
    val sb = new java.lang.StringBuilder(text.numBytes())
    var kept = 0L
    var idx = 0
    var coverEnd = -1
    i = 0
    while (i < tokens.length) {
      while (idx < m && starts(idx) <= i) {
        val e = starts(idx) + n - 1
        if (e > coverEnd) coverEnd = e
        idx += 1
      }
      if (i > coverEnd) {
        if (kept > 0L) sb.append(sep)
        sb.append(tokens(i))
        kept += 1L
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString),
      java.lang.Long.valueOf(tokens.length - kept)))
  }
}
