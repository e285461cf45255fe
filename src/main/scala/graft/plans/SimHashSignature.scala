package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static kernel for 64-bit SimHash signatures: one pass over the
  * word array replaces the explode + 64-sum hash-aggregate + shuffle
  * shape. Bit-identical to the SQL formulation — per word
  * `h = xxhash64(word)` (seed 42), per bit j the ±1 vote is
  * `(h >> j) & 1`, and bit j of the signature is set when the vote
  * sum is strictly positive (sum = 2·ones − n, so ones·2 > n).
  */
object SimHashKernel {

  def signature(words: ArrayData): Long = {
    val n = words.numElements()
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      // isNullAt, not a null check on getUTF8String: UnsafeArrayData
      // returns "" for a null slot. xxhash64(null) leaves the running
      // hash at its seed
      val h =
        if (words.isNullAt(i)) 42L
        else XXH64.hashUTF8String(words.getUTF8String(i), 42L)
      var j = 0
      while (j < 64) {
        ones(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (2 * ones(j) > n) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Native Catalyst expression: 64-bit SimHash of an `array<string>`
  * word column, with whole-stage-codegen support. Null for an empty
  * word array (the exploded formulation produced no row for it).
  */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else SimHashKernel.signature(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.SimHashKernel.signature($c);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}
