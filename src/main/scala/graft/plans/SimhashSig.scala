package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `simhash_sig(tokens: array<string>, bits) → long` — the SimHash
  * fingerprint as one native kernel.
  *
  * The composable form ([[graft.ops.ApproxDedup.simhashHof]]) EXPLODES
  * the token list — one row per (doc, token) — hashes each token with
  * an interpreted md5 → hex → conv chain, and SHUFFLES all of it into a
  * groupBy carrying `bits` conditional-sum aggregates. The
  * explode+shuffle moves |corpus| × |tokens/doc| rows with a 60-column
  * aggregation state per document; at 100 TB that shuffle IS the
  * SimHash cost. This kernel folds the whole fingerprint row-local in
  * one pass — no explode, no shuffle — so the signature step runs at
  * scan speed and the first exchange in a pair-mining plan is the
  * (band, bucket) collision join, exactly the [[MinhashSig]] shape.
  *
  * Bit-compatible with the composable form (SimhashKernelSpec asserts
  * equality on the driver fixtures): per token the base hash is the
  * top 60 bits of md5 (= `conv(substr(md5(tok),1,15),16,10)` — the
  * first 8 digest bytes big-endian, shifted right 4), bit b of the
  * fingerprint is set when the signed count of tokens with hash-bit b
  * set exceeds the count without (ties → 0, the SQL `sum > 0` rule).
  * Null elements are skipped (SQL aggregation rule); a null or empty
  * input array yields null — callers replicate the explode form's
  * drop-the-document semantics by filtering. */
case class SimhashSig(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if bits >= 1 && bits <= 60 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"simhash_sig needs 1 <= bits <= 60, got bits=$bits")
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash_sig expects array<string> tokens, got $t")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(tokens: Any): Any =
    SimhashSig.sig(tokens.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = SimhashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val result = ctx.freshName("shSig")
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |java.lang.Long $result = $kernel.sig($arr, $bits);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $result.longValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {
  // one digest per thread, reset per use — getInstance("MD5") is an
  // allocation + provider lookup, far too heavy for a per-ROW kernel
  // hot path (same pattern as MinhashSig.mdLocal)
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One-pass SimHash fold; null on empty / all-null input (the explode
    * form emits nothing there — callers filter, see the expression
    * Scaladoc). Boxed return so codegen can see the null. */
  def sig(tokens: ArrayData, bits: Int): java.lang.Long = {
    val n = tokens.numElements()
    if (n == 0) return null
    val counts = new Array[Int](bits)
    val md = mdLocal.get()
    var any = false
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        any = true
        md.reset()
        val d = md.digest(tokens.getUTF8String(j).getBytes)
        // first 15 hex chars of md5 = first 8 bytes big-endian >>> 4
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        h >>>= 4
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    if (!any) return null
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) fp |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }
}
