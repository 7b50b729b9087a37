package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(text, k, w) → array<long>` — winnowing/MOSS document
  * fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) as one native
  * kernel.
  *
  * The composable form hashes every char k-gram with a separate
  * md5 → hex → conv expression chain interpreted per element under two
  * nested higher-order transforms, then takes each window minimum with
  * an O(w) slice+array_min per window — hundreds of expression-tree
  * interpretations and string allocations per document. This kernel
  * makes one pass with a reused MessageDigest and plain loops.
  *
  * Bit-compatible with [[graft.ops.TextAnalysis.winnow]]'s HOF form:
  * grams are 1-based, CHARACTER-addressed (`UTF8String.substring` is
  * code-point based, matching `substr` in both engines), end-clamped;
  * the hash is the top 4 md5 bytes as an unsigned 32-bit value
  * (= `conv(substr(md5(s),1,8),16,10)`); windows slide over
  * `max(nGrams−w+1, 1)` positions with end-clamping; dedupe keeps first
  * occurrence (array_distinct semantics). WinnowSpec asserts equality
  * element-for-element. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure(
        s"winnow_fps needs k >= 1 and w >= 1, got (k=$k, w=$w)")
      case t => TypeCheckResult.TypeCheckFailure(
        s"winnow_fps expects a string column, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(text: Any): Any =
    WinnowFingerprints.winnow(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel =
      WinnowFingerprints.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $kernel.winnow($t, $k, $w);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {

  /** Codegen kernel: gram hashes, window minima, first-occurrence
    * dedupe — one pass, no per-gram expression machinery. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val len = text.numChars()
    val nGrams = math.max(len - (k - 1), 1)
    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      // substr(text, i+1, k): code-point addressed, end-clamped
      val gram = text.substring(i, math.min(i + k, len))
      md.reset()
      val d = md.digest(gram.getBytes)
      hashes(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val nWin = math.max(nGrams - (w - 1), 1)
    // first-occurrence dedupe of the window minima (array_distinct
    // semantics); w is small (a winnowing window), so the O(n·w) scan
    // beats a deque's branchy bookkeeping at these sizes
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nWin) {
      val end = math.min(j + w, nGrams)
      var m = hashes(j)
      var p = j + 1
      while (p < end) {
        if (hashes(p) < m) m = hashes(p)
        p += 1
      }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var q = 0
    while (it.hasNext) { out(q) = it.next(); q += 1 }
    new GenericArrayData(out)
  }
}
