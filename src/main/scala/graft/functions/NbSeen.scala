package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document Naive-Bayes seen-sums with the MODEL inlined — the
  * [[LmScore]] idiom applied to classification (r10 verdict #5):
  * array<string> tokens → struct<n_d, seen: array<long>> in one codegen
  * loop, where `seen(i)` is the quantized Σ_t tf_t · log₂(c(i,t)+1) the
  * scoring side of `Classification.nbClassifyFromModel` needs per label.
  * Summing lpq over token OCCURRENCES equals summing tf·lpq over
  * distinct tokens, so the join form's explode(graft_tf) → vocabulary
  * lookup join → per-doc hash re-aggregate collapses into a projection:
  * one hash probe and L long adds per token occurrence, no per-token
  * rows, no join, no aggregate. Integer arithmetic identical to the join
  * form (spec-pinned row identity; the oracled td52/td55 hashes are
  * unchanged on either path).
  *
  * The lookup table arrives as a java HashMap built once from the
  * pivoted census (vocabulary-sized — the caller bounds it and falls
  * back to the broadcast-join form above the bound, which remains the
  * 100 TB-vocabulary path). Null elements are skipped and `n_d` counts
  * non-null elements, exactly as `graft_tf` does; a null token array
  * yields a null struct (the join form drops such docs — callers filter).
  */
case class NbSeen(child: Expression,
    lut: java.util.HashMap[UTF8String, Array[Long]],
    nLabels: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString(8)}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_d", LongType, nullable = false),
    StructField("seen", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "graft_nb_seen"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NbSeenUtil.score(input.asInstanceOf[ArrayData], lut, nLabels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("nbLut", lut, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.NbSeenUtil.score($arr, $m, $nLabels);")
  }

  override protected def withNewChildInternal(newChild: Expression): NbSeen =
    copy(child = newChild)
}

object NbSeenUtil {
  def score(arr: ArrayData,
      lut: java.util.HashMap[UTF8String, Array[Long]],
      nLabels: Int): GenericInternalRow = {
    val n = arr.numElements()
    val acc = new Array[Long](nLabels)
    var nTerms = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        nTerms += 1
        val v = lut.get(arr.getUTF8String(i))
        if (v != null) {
          var j = 0
          while (j < nLabels) { acc(j) += v(j); j += 1 }
        }
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](nTerms, UnsafeArrayData.fromPrimitiveArray(acc)))
  }
}
