package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `minhash_sig(shingles: array<string>, k) → array<long>` — the
  * k-permutation MinHash signature as one native kernel.
  *
  * The composable form ([[graft.ops.ApproxDedup.minhashSignatureHof]])
  * EXPLODES the shingle set — one row per (doc, shingle) — hashes each
  * shingle with an interpreted md5 → hex → conv chain, and SHUFFLES all
  * of it into a groupBy of k mins. The explode+shuffle moves |corpus| ×
  * |shingles/doc| rows per signature computation; at 100 TB that
  * shuffle IS the MinHash cost. This kernel computes the whole
  * signature row-local in one pass — no explode, no shuffle, the
  * signature step becomes scan-speed — which is exactly how the
  * pair-mining stage stays map-side until the (band, bucket) collision
  * join.
  *
  * Bit-compatible with the composable form (MinhashSigSpec asserts
  * element-for-element equality): per shingle the base hash is the top
  * 4 md5 bytes as an unsigned 32-bit value
  * (= `conv(substr(md5(s),1,8),16,10)`), permutation i is
  * `(h·(2i+1) + 7919·i) mod 4294967311` in signed-64 arithmetic
  * (max h·31 < 2^37 — no overflow), and each output element is the min
  * over shingles. Null elements are skipped (SQL `min` ignores nulls);
  * a null or empty input array yields null — callers replicate the
  * explode form's drop-the-document semantics by filtering, see
  * [[graft.ops.ApproxDedup.minhashSignature]]. */
case class MinhashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs k >= 1, got k=$k")
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string> shingles, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(shingles: Any): Any =
    MinhashSig.sig(shingles.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = MinhashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val result = ctx.freshName("mhSig")
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $result =
         |  $kernel.sig($arr, $k);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $result;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  /** Smallest prime above 2^32 — the classic MinHash modulus
    * ([[graft.ops.ApproxDedup.MinhashPrime]]). */
  val Prime = 4294967311L

  // one digest per thread, reset per use — getInstance("MD5") is an
  // allocation + provider lookup, far too heavy for a per-ROW kernel
  // hot path (same pattern as Cardinality.mdLocal)
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One-pass k-min signature; null on empty / all-null input (the
    * explode form emits nothing / an all-null row there — callers
    * filter, see the expression Scaladoc). */
  def sig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = mdLocal.get()
    var any = false
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        any = true
        md.reset()
        val d = md.digest(shingles.getUTF8String(j).getBytes)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var i = 0
        while (i < k) {
          val p = (h * (2 * i + 1) + 7919L * i) % Prime
          if (p < mins(i)) mins(i) = p
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }
}
