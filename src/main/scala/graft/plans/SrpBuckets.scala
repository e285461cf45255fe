package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Static kernel for signed-random-projection signatures. Kept
  * outside the expression so both the interpreted and generated code
  * paths call one JIT-friendly primitive loop, and so the ±1
  * hyperplane matrix is built once per executor (cached by
  * (planeCount, dim)) instead of being re-derived per row the way the
  * higher-order-function formulation re-hashed every (plane, dim)
  * pair per row.
  */
object SrpKernel {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** splitmix64 finalizer: deterministic, well-mixed 64-bit hash. */
  private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** ±1 weight matrix for `nPlanes` hyperplanes over `dim` dims,
    * derived from a fixed seed — reproducible across executors with
    * no RNG state to ship. The 2^20 stride keeps (plane, dim) seeds
    * collision-free for any realistic dimensionality.
    */
  private def weights(nPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nPlanes, dim), { _ =>
      Array.tabulate(nPlanes, dim) { (p, k) =>
        if ((mix(p.toLong * (1L << 20) + k) & 1L) == 0L) -1.0 else 1.0
      }
    })

  /** All `tables` bucket ids for one vector in a single pass: table t
    * packs the sign bits of planes [t*planes, (t+1)*planes). Called
    * from generated code — must stay a pure static function.
    */
  def buckets(vec: ArrayData, planes: Int, tables: Int): ArrayData = {
    val dim = vec.numElements()
    val w = weights(planes * tables, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val row = w(t * planes + p)
        var proj = 0.0
        var k = 0
        while (k < dim) { proj += vec.getFloat(k) * row(k); k += 1 }
        if (proj > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: `tables` SRP-LSH bucket ids (each
  * `planes` sign bits of deterministic ±1 hyperplane projections) for
  * an `array<float>` embedding, computed in one pass with full
  * whole-stage-codegen support.
  *
  * This is the banded (OR-amplified) form: two vectors are candidate
  * near-duplicates if ANY table assigns them the same bucket, so
  * recall can be tuned via the table count while each table's
  * `planes` AND-bits keep buckets selective. Bucket ids are
  * deterministic functions of the vector — no fitted model to ship.
  */
case class SrpBuckets(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes >= 1 && planes <= 63 && tables >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_srp_buckets needs 1 <= planes <= 63 and tables >= 1, " +
          s"got planes=$planes tables=$tables")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_srp_buckets expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_srp_buckets"

  override protected def nullSafeEval(input: Any): Any =
    SrpKernel.buckets(input.asInstanceOf[ArrayData], planes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SrpKernel.buckets($c, $planes, $tables);")

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}
