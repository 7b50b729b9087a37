package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(text)` — Unicode NFC normalization as a native
  * codegen'd expression. Text normalization is the first pass of every
  * corpus-cleaning pipeline (identical glyphs must hash identically
  * before any exact or near dedup can see them: "é" composed and
  * "e"+U+0301 decomposed are different bytes but the same document).
  *
  * Spark ships no normalizer builtin, so this is the justified
  * expression-level extension: it runs inside whole-stage codegen on
  * UTF8String with a fast path that returns the input object untouched
  * when it is already NFC (Normalizer.isNormalized — true for almost
  * every real document, making the common case allocation-free).
  * Registered via [[GraftExtensions]].
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got $t")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, s => s"$kernel.normalize($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Codegen kernel. ASCII (the overwhelming majority of bytes in a
    * web corpus) short-circuits before any char-sequence work. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
