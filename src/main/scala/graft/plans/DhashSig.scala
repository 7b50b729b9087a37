package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `dhash_sig(px: string) → long` — the 60-bit perceptual dHash of a
  * pixel scanline as one native kernel.
  *
  * The composable form ([[graft.ops.Multimodal.dhashSignaturesHof]])
  * builds, PER ROW, a 66-element `transform` whose every element runs
  * an `aggregate(sequence(st+1, en), …)` — materializing a boxed
  * position array per cell per row and re-walking the scanline through
  * interpreted HOF lambdas. Row-local already (no shuffle), but ~two
  * orders of magnitude off scan speed. This kernel walks the scanline
  * ONCE in a tight loop: box-downsample into the 11×6 grid, then the
  * 60 neighbor comparisons.
  *
  * Bit-compatible with the composable form (DhashKernelSpec asserts
  * equality on the driver fixtures):
  *  - positions are 1-based CODE POINTS (Spark `substr`/`ascii`
  *    semantics — a supplementary character is one position and
  *    contributes its full code point, exactly like `ascii(substr)`);
  *  - cell boundaries are `n·c/66` in exact integer division (the
  *    column form's `floor` over double is exact — the product stays
  *    far below 2^53);
  *  - brightness comparison is cross-multiplied (`sum_a·cnt_b >
  *    sum_b·cnt_a`) — division-free, no rounding, empty cells compare
  *    deterministically false.
  * One documented divergence: a NULL scanline yields NULL here (the
  * standard null-safe expression rule), where the column form's
  * `otherwise(0)` chains collapse a null input to fingerprint 0 — the
  * fixtures carry no null payloads, and a null-payload image has no
  * meaningful fingerprint in either reading. */
case class DhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"dhash_sig expects a string scanline, got $t")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "dhash_sig"

  override protected def nullSafeEval(px: Any): Any =
    DhashSig.sig(px.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = DhashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, px => s"${ev.value} = $kernel.sig($px);")
  }

  override protected def withNewChildInternal(newChild: Expression): DhashSig =
    copy(child = newChild)
}

object DhashSig {
  private final val W = 11
  private final val H = 6
  private final val Cells = W * H // 66
  private final val Bits = (W - 1) * H // 60

  /** One-pass downsample + neighbor-compare fold. */
  def sig(px: UTF8String): Long = {
    val s = px.toString
    val len = s.length
    // n = code points = Spark length()/substr() position space
    val n = s.codePointCount(0, len).toLong
    val bounds = new Array[Long](Cells + 1)
    var c = 0
    while (c <= Cells) { bounds(c) = n * c / Cells; c += 1 }
    val sums = new Array[Long](Cells)
    var i = 0
    var p = 1L // 1-based code-point position
    c = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      while (c < Cells && p > bounds(c + 1)) c += 1
      if (c < Cells) sums(c) += cp
      p += 1
      i += Character.charCount(cp)
    }
    var fp = 0L
    var b = 0
    while (b < Bits) {
      val cell = b / (W - 1) * W + b % (W - 1)
      val sA = sums(cell)
      val cA = bounds(cell + 1) - bounds(cell)
      val sB = sums(cell + 1)
      val cB = bounds(cell + 2) - bounds(cell + 1)
      if (sA * cB > sB * cA) fp |= 1L << b
      b += 1
    }
    fp
  }
}
