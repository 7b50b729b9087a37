package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F7 finisher as a native Catalyst expression:
  * `multipart_etag_finish(digestsHex: array<string>, isMultipart: boolean)`
  * → the S3 ETag string (AzureEtagCheck/etag_app.py:104-124 semantics:
  * 1 part + not multipart → plain digest; otherwise
  * `hex(md5(concat(rawDigests))) + "-" + n`, including n == 1 for
  * 1-part multipart uploads).
  *
  * A codegen'd expression, not a Scala UDF: it evaluates inside
  * whole-stage codegen on the expression's internal types (ArrayData /
  * UTF8String) with no serializer round-trip per row — on a 100 TB
  * verification pass the per-row conversion cost of a UDF is the
  * difference between scan-bound and CPU-bound. Registered via
  * [[GraftExtensions]] (SparkSessionExtensions.injectFunction).
  */
case class MultipartEtagFinish(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), BooleanType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"multipart_etag_finish expects (array<string>, boolean), got ($l, $r)")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "multipart_etag_finish"

  override protected def nullSafeEval(digests: Any, isMultipart: Any): Any =
    MultipartEtagFinish.finish(
      digests.asInstanceOf[ArrayData], isMultipart.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = MultipartEtagFinish.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (arr, mp) =>
      s"""
         |${ev.value} = $kernel.finish($arr, $mp);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultipartEtagFinish =
    copy(left = newLeft, right = newRight)
}

object MultipartEtagFinish {

  private def hexDigits(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    b.foreach(x => sb.append("%02x".format(x)))
    sb.toString
  }

  /** Codegen kernel: operates on Spark's internal array/string types. */
  def finish(digestsHex: ArrayData, isMultipart: Boolean): UTF8String = {
    val n = digestsHex.numElements()
    if (n == 0) return null
    var i = 0
    while (i < n) {
      if (digestsHex.isNullAt(i)) return null
      i += 1
    }
    if (n == 1 && !isMultipart) return digestsHex.getUTF8String(0)
    val raw = new Array[Byte](n * 16)
    i = 0
    while (i < n) {
      val hex = digestsHex.getUTF8String(i).toString
      var j = 0
      while (j < 16) {
        raw(i * 16 + j) =
          Integer.parseInt(hex.substring(j * 2, j * 2 + 2), 16).toByte
        j += 1
      }
      i += 1
    }
    val outer = MessageDigest.getInstance("MD5").digest(raw)
    UTF8String.fromString(hexDigits(outer) + "-" + n)
  }
}
