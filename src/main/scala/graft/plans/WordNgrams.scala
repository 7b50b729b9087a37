package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(text, n) → array<string>` — the shingle set of a
  * document as one native kernel.
  *
  * The composable form ([[graft.ops.ApproxDedup.wordNgramsHof]]) is a
  * nest of higher-order functions — `split` → `transform` over a
  * wrapper array → `sequence` + per-shingle `concat_ws` lambda →
  * `array_distinct` — which interprets a lambda per shingle AND forces
  * the whole projection out of whole-stage codegen (the round-7
  * MinhashSig spec documented exactly this: the kernel downstream
  * couldn't stay in a codegen span because its HOF child broke it).
  * Shingling runs on every document on every LSH path (ledger builds,
  * q22/q64/q108/q110), i.e. at corpus scan scale. This kernel
  * tokenizes once and folds the distinct adjacent n-grams in a tight
  * loop, so shingle → minhash_sig now forms one unbroken codegen span.
  *
  * Bit-compatible with the composable form (WordNgramsSpec asserts
  * element-for-element equality on the fixtures): tokens are Java
  * regex `\s+` splits with trailing empties kept (Spark `split`'s
  * limit -1 contract); documents with fewer than n tokens yield ONE
  * shingle — all tokens space-joined (the `concat_ws` fallback, so ""
  * tokenizes to [""]); duplicates collapse to first occurrence
  * (`array_distinct`'s order). One deliberate divergence: null text
  * yields NULL here (the standard null-safe rule), where the HOF
  * chain's `concat_ws` swallows the null into the shingle set of the
  * EMPTY string — which would let a null document near-dup-match
  * every empty document. The fixtures carry no null text; callers
  * that filter on a null signature now drop null docs, which is the
  * defensible reading. */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case StringType => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams needs n >= 1, got n=$n")
      case t => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams expects string text, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(text: Any): Any =
    WordNgrams.shingles(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WordNgrams.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = $kernel.shingles($text, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    // Java regex split with limit -1: Spark split()'s exact contract
    // (leading whitespace yields a leading "", trailing empties kept)
    val toks = text.toString.split("\\s+", -1)
    val out =
      if (toks.length < n) {
        Array[Any](UTF8String.fromString(toks.mkString(" ")))
      } else {
        val seen = new java.util.LinkedHashSet[String](toks.length * 2)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          seen.add(sb.toString)
          i += 1
        }
        val arr = new Array[Any](seen.size())
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
        arr
      }
    new GenericArrayData(out)
  }
}
