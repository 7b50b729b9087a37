package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Cardinality

/** `hll_bucket_rho(key: string) → long` — the HLL register coordinate
  * (bucket, rho) of a key as ONE native kernel, packed as
  * `bucket · 64 + rho` (bucket < 1024, rho ≤ 51: both unpack with a
  * shift and a mask).
  *
  * The composable form ([[graft.ops.Cardinality]]'s column chain) pays
  * per VALUE: an md5 → 32-char hex encode → substring → base-16
  * string parse (`conv`) for the hash, then a binary-string render
  * (`bin`) + length for rho — five string materializations per input
  * row on the sketch path, which at 100 TB IS the sketch cost. This
  * kernel reads the first 8 digest bytes big-endian and counts
  * leading zeros in a register — no string round-trips — by calling
  * the SAME JVM mirror ([[Cardinality.hashLongBytes]] /
  * bucketOfLong / rhoOfLong) the streaming fold uses, so batch,
  * stream, and kernel share one implementation of the hash semantics
  * (HllKernelSpec pins kernel == column chain on the fixtures; the
  * existing stream == batch specs pin the mirror). */
case class HllBucketRho(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hll_bucket_rho expects a string key, got $t")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hll_bucket_rho"

  override protected def nullSafeEval(key: Any): Any =
    HllBucketRho.pack(key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = HllBucketRho.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, key => s"${ev.value} = $kernel.pack($key);")
  }

  override protected def withNewChildInternal(newChild: Expression): HllBucketRho =
    copy(child = newChild)
}

object HllBucketRho {
  def pack(key: UTF8String): Long = {
    val h = Cardinality.hashLongBytes(key.getBytes)
    Cardinality.bucketOfLong(h).toLong * 64L + Cardinality.rhoOfLong(h)
  }
}
