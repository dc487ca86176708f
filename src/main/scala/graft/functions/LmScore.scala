package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document stupid-backoff bigram-LM scoring with the MODEL inlined
  * — array<string> tokens → struct<n_bigrams, sum_lpq> in one codegen
  * loop. The two lookup tables (bigram → quantized log-prob, word →
  * quantized backoff log-prob) arrive as java HashMaps built ONCE from
  * the trained censuses (model-sized driver values, the bpeEncode-rules
  * idiom), so the scoring side of `TextAnalysis.lmDocScore` becomes a
  * pure projection: no joins, no per-position float work, no aggregate —
  * each position does two hash probes and one long add. Semantics are
  * EXACTLY the composable join form (spec-pinned row identity): position
  * i contributes biMap(tok[i] + " " + tok[i+1]), else wMap(tok[i+1]),
  * else `lpq0`; docs under 2 tokens score (0, 0) and are filtered by the
  * caller exactly as the join form's empty explode dropped them.
  */
case class LmScore(child: Expression,
    biModel: java.util.HashMap[UTF8String, java.lang.Long],
    wModel: java.util.HashMap[UTF8String, java.lang.Long],
    lpq0: Long)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString(8)}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("sum_lpq", LongType, nullable = false)))

  override def prettyName: String = "graft_lm_score"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    LmScoreUtil.score(input.asInstanceOf[ArrayData], biModel, wModel, lpq0)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bi = ctx.addReferenceObj("lmBiModel", biModel, "java.util.HashMap")
    val w = ctx.addReferenceObj("lmWModel", wModel, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.LmScoreUtil.score($arr, $bi, $w, ${lpq0}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): LmScore =
    copy(child = newChild)
}

object LmScoreUtil {
  private val SPACE = UTF8String.fromString(" ")

  def score(arr: ArrayData,
      bi: java.util.HashMap[UTF8String, java.lang.Long],
      w: java.util.HashMap[UTF8String, java.lang.Long],
      lpq0: Long): GenericInternalRow = {
    val n = arr.numElements()
    var sum = 0L
    var i = 0
    while (i < n - 1) {
      val a = arr.getUTF8String(i)
      val b = arr.getUTF8String(i + 1)
      val v = bi.get(UTF8String.concat(a, SPACE, b))
      sum += (if (v != null) v.longValue()
        else {
          val vw = w.get(b)
          if (vw != null) vw.longValue() else lpq0
        })
      i += 1
    }
    new GenericInternalRow(
      Array[Any](if (n >= 2) (n - 1).toLong else 0L, sum))
  }
}
