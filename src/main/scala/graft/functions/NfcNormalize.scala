package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd scalar expression —
  * the canonicalization step every multi-source text pipeline needs
  * before exact dedup or fingerprinting: the same visible text arrives
  * from different sources as precomposed (é = U+00E9) or decomposed
  * (e + U+0301) code-point sequences, which hash/compare as DIFFERENT
  * strings until normalized. The JDK (java.text.Normalizer) and
  * DuckDB's nfc_normalize both implement Unicode TR-15 NFC, so the
  * result is engine-independent and the battery gate can hash it.
  *
  * 100 TB posture: the overwhelming majority of corpus bytes are pure
  * ASCII, which is NFC by definition — the expression detects that
  * case with a byte-vs-char count compare on the UTF8String (no
  * decode, no allocation) and returns the input buffer untouched;
  * only strings that actually contain multi-byte sequences pay the
  * String round-trip through the JDK normalizer. Runs inside
  * WholeStageCodegen via a static call (asserted in
  * NfcNormalizeSpec).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc expects string, got $t")
  }
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object NfcNormalize {

  /** ASCII fast path: numBytes == numChars iff every byte is
    * single-byte UTF-8, and ASCII text is already NFC. */
  def nfc(u: UTF8String): UTF8String =
    if (u.numBytes == u.numChars) u
    else UTF8String.fromString(java.text.Normalizer.normalize(
      u.toString, java.text.Normalizer.Form.NFC))

  def nfc_norm(c: Column): Column =
    GraftSqlShims.column(NfcNormalize(GraftSqlShims.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc", exprs => NfcNormalize(exprs.head), "scala_udf")
}
