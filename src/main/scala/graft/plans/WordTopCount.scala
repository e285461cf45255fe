package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for the per-row word mode count. */
object WordTopCountKernel {

  /** Max multiplicity of any element in `words` — one O(W) pass with
    * a local hash map. The row-local form of the "top word fraction"
    * repetition signal: the groupBy formulation it replaces shuffles
    * one row PER WORD across the cluster just to compute a per-doc
    * statistic (3M exploded rows for 50k docs at sf1, and at 100 TB
    * an exchange the size of the tokenized corpus).
    */
  def topCount(words: ArrayData): Int = {
    val n = words.numElements()
    if (n == 0) return 0
    val m = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      // split() never yields null slots, but stay total: count nulls
      // as the empty string (matches concat_ws-style null handling)
      val w =
        if (words.isNullAt(i)) UTF8String.EMPTY_UTF8
        else words.getUTF8String(i)
      val prev = m.get(w)
      val c = if (prev == null) 1 else prev.intValue() + 1
      m.put(w, Integer.valueOf(c))
      if (c > best) best = c
      i += 1
    }
    best
  }
}

/** Native Catalyst expression: the maximum multiplicity of any
  * element of an `array<string>` column, with whole-stage-codegen
  * support. Semantics match `max(count) over groupBy(element)` of the
  * exploded array, computed row-local.
  */
case class WordTopCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_top_word_count expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_top_word_count"

  override protected def nullSafeEval(input: Any): Any =
    WordTopCountKernel.topCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordTopCountKernel.topCount($c);")

  override protected def withNewChildInternal(newChild: Expression): WordTopCount =
    copy(child = newChild)
}
