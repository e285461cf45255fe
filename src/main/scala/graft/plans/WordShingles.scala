package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for word n-gram shingling. Semantics are identical
  * to the former HOF formulation
  * `array_distinct(transform(sequence(0, W-n), i => concat_ws(" ",
  * slice(words, i+1, n))))` (with the whole text as a single shingle
  * when W < n) — but one pass instead of O(W²): the HOF's lambda body
  * embedded the full `split(...)` subtree, so every shingle
  * re-evaluated the split (measured 12+ s for the shingle step alone
  * at sf0.1).
  */
object ShingleKernel {

  private val SPACE = UTF8String.fromString(" ")

  def shingles(words: ArrayData, n: Int): ArrayData = {
    val w = words.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    // isNullAt guards: UnsafeArrayData.getUTF8String returns "" (not
    // null) for a null slot; concat_ws semantics skip null elements
    def wordAt(i: Int): UTF8String =
      if (words.isNullAt(i)) null else words.getUTF8String(i)
    if (w >= n) {
      var i = 0
      while (i <= w - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = wordAt(i + j); j += 1 }
        seen.add(UTF8String.concatWs(SPACE, parts: _*))
        i += 1
      }
    } else {
      val parts = new Array[UTF8String](w)
      var j = 0
      while (j < w) { parts(j) = wordAt(j); j += 1 }
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** ALL word n-grams in document order, WITH multiplicity — the
    * tf-counting face of shingling (BM25 phrase terms need occurrence
    * counts, which the distinct form above deliberately erases). No
    * whole-text fallback either: a document shorter than n words
    * contains zero n-gram OCCURRENCES, so the result is empty — the
    * fallback exists for the dedup use case where every doc must
    * produce at least one signature unit.
    */
  def ngrams(words: ArrayData, n: Int): ArrayData = {
    val w = words.numElements()
    if (w < n) return new GenericArrayData(Array.empty[Any])
    def wordAt(i: Int): UTF8String =
      if (words.isNullAt(i)) null else words.getUTF8String(i)
    val out = new Array[Any](w - n + 1)
    var i = 0
    while (i <= w - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = wordAt(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: distinct word n-gram shingles (first-
  * occurrence order, matching array_distinct) of an `array<string>`
  * word column, with whole-stage-codegen support.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"graft_word_shingles needs n >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_word_shingles expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleKernel.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Native Catalyst expression: ALL word n-grams with multiplicity (in
  * document order, no dedup, no short-doc fallback) of an
  * `array<string>` word column — see [[ShingleKernel.ngrams]].
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"graft_word_ngrams needs n >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_word_ngrams expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.ngrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleKernel.ngrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}
