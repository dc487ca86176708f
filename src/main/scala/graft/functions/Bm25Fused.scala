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

/** Single-pass fused quantized BM25 scoring for a BATCH of queries (r15):
  * array<string> tokens → array<struct<q, bm25q>> holding, for every query
  * with at least one matched term, that query's exact [[Bm25Q]] score.
  * One local tally over the UNION token slot space, one per-slot
  * contribution table, then per query a sum over its own slot list —
  * O(dl + Σ_q |q|) per document instead of the Q-pass form's Q full
  * tokenizations. Score arithmetic is the verbatim [[Bm25FusedUtil.score]]
  * integer form over the same per-slot df values, and a query's
  * contribution set is exactly the slots its own tokens hit, so every
  * (query, doc, score) triple is byte-identical to running [[Bm25Q]] once
  * per query (integer sums are order-insensitive). Documents matching no
  * query at all yield null, so the downstream explode is candidate-sized.
  */
case class Bm25QMulti(child: Expression,
    qIdx: java.util.HashMap[UTF8String, Integer],
    df: Array[Long], querySlots: Array[Array[Int]],
    nDocs: Long, totTok: Long, quantScale: Long)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString(8)}")
    }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("q", IntegerType,
        nullable = false),
      org.apache.spark.sql.types.StructField("bm25q", LongType,
        nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_bm25q_multi"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    Bm25FusedUtil.scoreMulti(input.asInstanceOf[ArrayData], qIdx, df,
      querySlots, nDocs, totTok, quantScale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("qIdx", qIdx, "java.util.HashMap")
    val d = ctx.addReferenceObj("qDf", df, "long[]")
    val qs = ctx.addReferenceObj("querySlots", querySlots, "int[][]")
    val r = ctx.freshName("graftBm25m")
    nullSafeCodeGen(ctx, ev, arr =>
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.Bm25FusedUtil.scoreMulti(
         |    $arr, $m, $d, $qs, ${nDocs}L, ${totTok}L, ${quantScale}L);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Bm25QMulti =
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

  // Reusable per-thread scratch for [[scoreMulti]]: the tf/contrib tallies
  // are slot-space-sized (the UNION vocabulary of all queries — thousands
  // of slots at wide-vocab Q=64), so allocating them per ROW costs tens of
  // KB of garbage per document (see BASELINE.md r15 for the measured
  // A/B). Task threads never share an eval, and the touched-slot list
  // zeroes ONLY the entries a row wrote (try/finally, so a failed row
  // cannot leak garbage into a retry).
  private final class MultiScratch {
    var tf: Array[Long] = new Array[Long](0)
    var touched: Array[Int] = new Array[Int](0)
    var contrib: Array[Long] = new Array[Long](0)
    def ensure(n: Int): Unit = if (tf.length < n) {
      tf = new Array[Long](n)
      touched = new Array[Int](n)
      contrib = new Array[Long](n)
    }
  }
  private val multiScratch = new ThreadLocal[MultiScratch] {
    override def initialValue(): MultiScratch = new MultiScratch
  }

  /** All queries' scores in one pass (see [[Bm25QMulti]]): null when the
    * document matches no query term anywhere; otherwise one (q, bm25q)
    * struct per query with ≥ 1 matched slot. Per-slot contributions
    * tfq·idfq are computed once and shared across queries — the integer
    * sum per query is order-insensitive, so sharing cannot change any
    * score vs the per-query [[score]] call.
    */
  def scoreMulti(arr: ArrayData,
      qIdx: java.util.HashMap[UTF8String, Integer], df: Array[Long],
      querySlots: Array[Array[Int]], nDocs: Long, totTok: Long,
      quantScale: Long): ArrayData = {
    val n = arr.numElements()
    val scratch = multiScratch.get()
    scratch.ensure(df.length)
    val tf = scratch.tf
    val touched = scratch.touched
    val contrib = scratch.contrib
    var nTouched = 0
    try {
      var dl = 0L
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          dl += 1
          val v = qIdx.get(arr.getUTF8String(i))
          if (v != null) {
            val s = v.intValue()
            if (tf(s) == 0L) { touched(nTouched) = s; nTouched += 1 }
            tf(s) += 1
          }
        }
        i += 1
      }
      if (nTouched == 0) return null
      // per-slot contribution, computed once for all queries sharing a
      // slot — only the touched slots are written (and only they are read:
      // the per-query loop gates on tf(s) > 0)
      var j = 0
      while (j < nTouched) {
        val s = touched(j)
        val t = tf(s)
        val tfq = (22L * totTok * t * quantScale) /
          (10L * totTok * t + 3L * totTok + 9L * nDocs * dl)
        val idfq = ((2L * nDocs - 2L * df(s) + 1L) * quantScale) /
          (2L * df(s) + 1L)
        contrib(s) = tfq * idfq
        j += 1
      }
      val hits = new Array[Any](querySlots.length)
      var found = 0
      var q = 0
      while (q < querySlots.length) {
        val slots = querySlots(q)
        var sum = 0L
        var any = false
        var k = 0
        while (k < slots.length) {
          val s = slots(k)
          if (tf(s) > 0) { sum += contrib(s); any = true }
          k += 1
        }
        if (any) {
          hits(found) = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](q, sum))
            : org.apache.spark.sql.catalyst.InternalRow
          found += 1
        }
        q += 1
      }
      if (found == 0) return null
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        if (found == hits.length) hits else hits.take(found))
    } finally {
      var z = 0
      while (z < nTouched) { tf(touched(z)) = 0L; z += 1 }
    }
  }
}
