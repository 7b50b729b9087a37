package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vec_dot(a: array<double>, b: array<double>) → double` — the ANN
  * hot path as a native codegen'd expression.
  *
  * The composable form (`aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`)
  * is a pair of higher-order functions: per row it allocates the zipped
  * product array and interprets a lambda per element, and higher-order
  * functions don't participate in whole-stage codegen. At 100 TB every
  * brute-force / IVF / near-dup scan pays that per candidate pair, so
  * the dot product is exactly the place the builder guidance's
  * "custom Catalyst Expression beats a UDF" preference order points at.
  *
  * Bit-compatible with the HOF form by construction: one left-to-right
  * fold of `a(i) * b(i)` into a running double — the identical IEEE
  * operation sequence, so every oracle row that matched before matches
  * after (VecDotSpec asserts bitwise equality). Null semantics also
  * replay the HOF form: mismatched lengths or any null element → null
  * (zip_with pads/propagates null, `acc + null` poisons the fold). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = VecDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("dotResult")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double $boxed = $kernel.dot($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {

  /** Codegen kernel: a fused multiply-add loop over the internal array
    * format — no intermediate array, no lambda dispatch. Returns null
    * (boxed) exactly where the HOF form does. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
