package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for per-term token counting. Semantics are
  * bit-identical to the HOF formulation over
  * `split(lower(trim(regexp_replace(text, "\s+", " "))), " ")`
  * (TextFunctions.words): output slot i is
  * `size(filter(words, x -> x = term_i))`, the last slot is
  * `size(words)` (= dl). The identity the spec pins:
  *
  *  - Java regex `\s` is the ASCII set [ \t\n\x0B\f\r], so the
  *    collapse-then-split pipeline's tokens are exactly the maximal
  *    runs of non-[\s] bytes — all five are single-byte ASCII, which
  *    a continuation byte (>= 0x80) can never alias, so a plain byte
  *    scan of the UTF-8 buffer finds the same boundaries;
  *  - `lower` is UTF8String.toLowerCase — the kernel calls the SAME
  *    method on the whole text up front;
  *  - a text with no tokens normalizes to "" whose split is [""], so
  *    dl is 1, not 0 (callers blank-filter first; the kernel matches
  *    the artifact anyway so it can never diverge from the HOF).
  *
  * Why it exists: the HOF pipeline is interpreted (higher-order
  * functions are CodegenFallback), which puts it OUTSIDE whole-stage
  * codegen's subexpression elimination — every tf_<term> column and
  * every pushed-down filter conjunct re-ran the full regex
  * normalization + split. One codegen'd kernel call restores CSE and
  * does one byte scan total.
  */
object TermCountKernel {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** terms are pre-encoded UTF-8 byte arrays (as given — the TEXT is
    * lowercased, the terms are not; identical to `x = lit(term)`).
    */
  def counts(text: UTF8String, terms: Array[Array[Byte]]): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = terms.length
    val out = new Array[Long](n + 1)
    var tokens = 0L
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(bytes(i))) i += 1
        tokens += 1
        val tlen = i - start
        var t = 0
        while (t < n) {
          val tb = terms(t)
          if (tb.length == tlen) {
            var j = 0
            while (j < tlen && tb(j) == bytes(start + j)) j += 1
            if (j == tlen) out(t) += 1
          }
          t += 1
        }
      }
    }
    out(n) = if (tokens == 0) 1L else tokens
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: `graft_term_counts(text, 't1', ...)`
  * returns array<long> of [tf_t1, ..., tf_tn, dl] over the
  * TextFunctions.words token stream, with whole-stage-codegen
  * support (one byte scan per row, CSE-eligible).
  */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if terms.isEmpty =>
      TypeCheckResult.TypeCheckFailure("graft_term_counts needs >= 1 term")
    case StringType if terms.exists(t => t.isEmpty || t.exists(_.isWhitespace)) =>
      TypeCheckResult.TypeCheckFailure(
        "graft_term_counts terms must be non-empty and whitespace-free " +
          "(a term containing whitespace can never equal a token)")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_term_counts expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_term_counts"

  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    TermCountKernel.counts(input.asInstanceOf[UTF8String], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TermCountKernel.counts($c, $termsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}
