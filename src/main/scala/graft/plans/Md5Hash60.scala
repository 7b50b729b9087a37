package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Cardinality

/** `md5_hash60(key: string) → long` — the engine-wide 60-bit
  * md5-prefix hash ([[Cardinality.hashOf]]'s value) as ONE native
  * kernel.
  *
  * The composable chain (`conv(substring(md5(cast), 1, 15), 16, 10)`)
  * pays an md5 → 32-char hex ENCODE → substring → base-16 string
  * PARSE per input row. On the KMV/CMS sketch paths that hash is the
  * entire per-row cost (the aggregation state is model-sized), so at
  * 100 TB the string round-trips ARE the sketch bill — the same
  * argument that produced [[HllBucketRho]]. The kernel reads the
  * first 8 digest bytes big-endian and drops the low nibble by
  * calling the SAME JVM mirror ([[Cardinality.hashLongBytes]]) the
  * streaming folds use, so batch plans, streams, and SQL oracles
  * (`('0x' || substr(md5(x), 1, 15))::BIGINT`) share one hash
  * definition; KmvKernelSpec pins kernel == chain bitwise on
  * fixtures. */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_hash60 expects a string key, got $t")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "md5_hash60"

  override protected def nullSafeEval(key: Any): Any =
    Md5Hash60.hash(key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = Md5Hash60.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, key => s"${ev.value} = $kernel.hash($key);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  def hash(key: UTF8String): Long = Cardinality.hashLongBytes(key.getBytes)
}
