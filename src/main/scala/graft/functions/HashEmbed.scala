package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 16-dim hash-projection text embedding — the MODEL-FREE
  * stand-in that closes the text → vector loop in-engine (chunk → embed
  * → index → search) with real Spark plumbing: a production pipeline
  * swaps this expression for an encoder-model UDF and every downstream
  * stage (k-means/IVF assignment, probing, dedup, kNN graphs) is
  * unchanged. NOT a semantic embedding: component i is the sum over
  * whitespace tokens of (byte i of md5(token) − 128) — a random-ish but
  * fully deterministic projection whose collision structure still makes
  * token-overlapping texts nearby, which is exactly enough to exercise
  * and ORACLE the vector infrastructure end-to-end (the DuckDB side
  * recomputes the same integer sums from the same md5 bytes).
  *
  * Tokenization matches `split(text, " ")` with empties KEPT (md5("")
  * is well-defined and identical in both engines), so the expression
  * composes losslessly with [[graft.operators.TextAnalysis
  * .chunkDocuments]] output. Output: array<double> of the 16 integer
  * sums (exact — integers below 2^53 survive the double cast bit-for-
  * bit); null only for null input.
  */
case class HashEmbed(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.simpleString(8)}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_hash_embed"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HashEmbedUtil.embed(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = graft.functions.HashEmbedUtil.embed($text);")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

object HashEmbedUtil {
  final val Dim = 16

  def embed(text: UTF8String): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    val sums = new Array[Long](Dim)
    var t = 0
    while (t < tokens.length) {
      val d = org.apache.commons.codec.digest.DigestUtils.md5(
        tokens(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var i = 0
      while (i < Dim) {
        sums(i) += (d(i) & 0xFF) - 128
        i += 1
      }
      t += 1
    }
    val out = new Array[Any](Dim)
    var i = 0
    while (i < Dim) { out(i) = sums(i).toDouble; i += 1 }
    new GenericArrayData(out)
  }
}
