package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Static kernel for MinHash signatures. One pass over the shingle
  * array computes all `perms` permutation minima — replacing the
  * explode + 64-wide hash-aggregate shape, which paid a row per
  * (doc, shingle) plus a shuffle to regroup by doc id.
  *
  * Hash math is bit-identical to the SQL formulation
  * `min(xxhash64(xxhash64(shingle), i))` so signatures (and every
  * LSH band/bucket derived from them) are unchanged:
  * Spark's xxhash64 folds children left-to-right with the running
  * hash as seed, starting at 42 — string → hashUnsafeBytes(bytes, 42),
  * then per permutation hashLong(h, 42) followed by hashInt(i, ·).
  */
object MinHashKernel {

  def signature(shingles: ArrayData, perms: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      // isNullAt, not a null check on getUTF8String: UnsafeArrayData
      // returns "" (not null) for a null slot, which would hash
      // differently from the interpreted path for the same input
      // xxhash64(null) leaves the running hash at its seed
      val h =
        if (shingles.isNullAt(j)) 42L
        else XXH64.hashUTF8String(shingles.getUTF8String(j), 42L)
      val base = XXH64.hashLong(h, 42L)
      var i = 0
      while (i < perms) {
        val v = XXH64.hashInt(i, base)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native Catalyst expression: the `perms` MinHash permutation minima
  * of an `array<string>` shingle set, with whole-stage-codegen
  * support. Returns null for an empty shingle array (the exploded
  * formulation simply produced no row for such a doc — callers filter
  * nulls to keep that behavior).
  */
case class MinHashSignature(child: Expression, perms: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if perms >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"graft_minhash needs perms >= 1, got $perms")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else MinHashKernel.signature(arr, perms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.MinHashKernel.signature($c, $perms);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
