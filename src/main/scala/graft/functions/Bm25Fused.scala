package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document query-term probe for the fused BM25 census pass (r10
  * verdict #5): array<string> tokens → array<int> of the DISTINCT query
  * slots the document matches. The join form reached the same census by
  * exploding `graft_tf` over EVERY distinct token of every document and
  * cutting against the broadcast query afterwards — generating
  * corpus-vocabulary row volume to keep Σ_t df(t) candidate rows. This
  * expression emits only the matches, so the census explode is
  * candidate-sized from the start; `count(slot)` over it IS the document
  * frequency (slots are per-doc distinct). Null elements are skipped
  * (the `graft_tf` contract); a null token array yields null.
  */
case class QueryHits(child: Expression,
    qIdx: java.util.HashMap[UTF8String, Integer], nq: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString(8)}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_query_hits"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Bm25FusedUtil.hits(input.asInstanceOf[ArrayData], qIdx, nq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("qIdx", qIdx, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.Bm25FusedUtil.hits($arr, $m, $nq);")
  }

  override protected def withNewChildInternal(newChild: Expression): QueryHits =
    copy(child = newChild)
}

/** Fused quantized BM25 scoring (r10 verdict #5): array<string> tokens →
  * the document's integer bm25q against ONE query whose per-slot document
  * frequencies are inlined (they come out of the [[QueryHits]] census
  * pass — query-sized driver values, the graft_lm_score model idiom).
  * One local tally of matched-slot term frequencies, then per matched
  * slot the exact [[graft.operators.Retrieval]] arithmetic —
  *   tfq = (22·T·tf·q) DIV (10·T·tf + 3·T + 9·N·dl)
  *   idfq = ((2N − 2df + 1)·q) DIV (2df + 1)
  * summed as Σ tfq·idfq in 64-bit integers (operands positive, so Java
  * `/` equals the SQL DIV the join form used — byte-identical scores,
  * oracle hashes unchanged). Documents matching NO query term yield
  * null, reproducing the join form's absent-candidate row set exactly.
  * `dl` is the non-null token count, as `graft_tf.n_terms` was.
  */
case class Bm25Q(child: Expression,
    qIdx: java.util.HashMap[UTF8String, Integer],
    df: Array[Long], nDocs: Long, totTok: Long, quantScale: Long)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString(8)}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_bm25q"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Bm25FusedUtil.score(input.asInstanceOf[ArrayData], qIdx, df, nDocs,
      totTok, quantScale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("qIdx", qIdx, "java.util.HashMap")
    val d = ctx.addReferenceObj("qDf", df, "long[]")
    val r = ctx.freshName("graftBm25r")
    nullSafeCodeGen(ctx, ev, arr =>
      s"""java.lang.Long $r = graft.functions.Bm25FusedUtil.score(
         |  $arr, $m, $d, ${nDocs}L, ${totTok}L, ${quantScale}L);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Bm25Q =
    copy(child = newChild)
}

object Bm25FusedUtil {

  /** Distinct matched query slots, ascending; null-element-skipping.
    * `nq` is the slot count (a flat boolean tally beats a tree/hash set —
    * the slot space is query-sized by construction).
    */
  def hits(arr: ArrayData,
      qIdx: java.util.HashMap[UTF8String, Integer], nq: Int): ArrayData = {
    val n = arr.numElements()
    val seen = new Array[Boolean](nq)
    var found = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = qIdx.get(arr.getUTF8String(i))
        if (v != null && !seen(v.intValue())) {
          seen(v.intValue()) = true
          found += 1
        }
      }
      i += 1
    }
    val out = new Array[Int](found)
    var j = 0
    var k = 0
    while (j < nq) {
      if (seen(j)) { out(k) = j; k += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Null when the document matches no query term (the join form's
    * absent-candidate contract); otherwise the exact quantized score.
    */
  def score(arr: ArrayData, qIdx: java.util.HashMap[UTF8String, Integer],
      df: Array[Long], nDocs: Long, totTok: Long,
      quantScale: Long): java.lang.Long = {
    val n = arr.numElements()
    val tf = new Array[Long](df.length)
    var dl = 0L
    var matched = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        dl += 1
        val v = qIdx.get(arr.getUTF8String(i))
        if (v != null) { tf(v.intValue()) += 1; matched = true }
      }
      i += 1
    }
    if (!matched) return null
    var sum = 0L
    var j = 0
    while (j < tf.length) {
      val t = tf(j)
      if (t > 0) {
        val tfq = (22L * totTok * t * quantScale) /
          (10L * totTok * t + 3L * totTok + 9L * nDocs * dl)
        val idfq = ((2L * nDocs - 2L * df(j) + 1L) * quantScale) /
          (2L * df(j) + 1L)
        sum += tfq * idfq
      }
      j += 1
    }
    java.lang.Long.valueOf(sum)
  }
}
