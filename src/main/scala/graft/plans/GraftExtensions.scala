package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session extension registering graft's native expressions so they
  * are callable from SQL / `expr(...)`:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * or programmatically via [[GraftExtensions.ensureRegistered]]
  * (idempotent; used by the operators so they work on any session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def strLit(e: Expression, name: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }

  val functions: Seq[FunctionDescription] = Seq(
    (new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (new FunctionIdentifier("graft_srp_buckets"),
      new ExpressionInfo(classOf[SrpBuckets].getName, "graft_srp_buckets"),
      (children: Seq[Expression]) => SrpBuckets(children(0),
        intLit(children(1), "planes"), intLit(children(2), "tables"))),
    (new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinHashSignature(children(0),
        intLit(children(1), "perms"))),
    (new FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      (children: Seq[Expression]) => WordShingles(children(0),
        intLit(children(1), "n"))),
    (new FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      (children: Seq[Expression]) => WordNgrams(children(0),
        intLit(children(1), "n"))),
    (new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashSignature].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashSignature(children(0))),
    (new FunctionIdentifier("graft_top_word_count"),
      new ExpressionInfo(classOf[WordTopCount].getName, "graft_top_word_count"),
      (children: Seq[Expression]) => WordTopCount(children(0))),
    (new FunctionIdentifier("graft_term_counts"),
      new ExpressionInfo(classOf[TermCounts].getName, "graft_term_counts"),
      (children: Seq[Expression]) => TermCounts(children(0),
        children.tail.zipWithIndex.map { case (c, i) => strLit(c, s"term$i") })))

  /** Register into an existing session (no-op if already present). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
  }
}
