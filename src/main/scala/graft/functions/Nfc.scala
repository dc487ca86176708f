package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — Spark has no
  * built-in normalizer, and text curation needs one BEFORE hashing or
  * deduplicating: the same visible string can arrive composed (U+00E9) or
  * decomposed (U+0065 U+0301) and would otherwise fingerprint as two
  * different documents. Cross-engine parity: DuckDB's `nfc_normalize`
  * computes the identical canonical form (both implement UAX #15), so
  * normalization stays oracle-checkable. Codegen emits a static call
  * (same pattern as MinHashUtil) so the projection stays inside
  * whole-stage codegen.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString(8)}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NfcUtil.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcUtil {
  /** Static bridge shared by interpreted eval and generated code. Fast
    * path: `Normalizer.isNormalized` is O(n) with no allocation, and real
    * corpora are overwhelmingly already-NFC.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
