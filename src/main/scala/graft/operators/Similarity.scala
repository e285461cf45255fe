package graft.operators

import graft.plans.GraftExtensions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2). Brute-force cosine top-k is the exact baseline (one
  * broadcast of the query vector, zero shuffles, a single global
  * top-k); the SRP-LSH variant prunes candidates by hyperplane
  * bucket so the same query touches only a bucket's worth of rows —
  * the path that survives 100 TB.
  */
object Similarity {

  /** Cosine via the native codegen'd [[graft.plans.CosineSimilarity]]
    * expression (registered on demand); math identical to
    * VectorFunctions.cosine but runs as a primitive loop.
    */
  private def cosineFast(df: DataFrame, a: String, b: String): Column = {
    GraftExtensions.ensureRegistered(df.sparkSession)
    expr(s"graft_cosine(`$a`, `$b`)")
  }

  /** Exact top-k by cosine to one query vector. The query side is a
    * 1-row broadcast; ordering ties resolve by id so results are
    * deterministic.
    */
  def bruteForceTopK(embs: DataFrame, query: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = query.select(col(vecCol).as("q_vec"))
    val joined = embs.crossJoin(broadcast(q))
    joined
      .select(col(idCol), round(cosineFast(joined, vecCol, "q_vec"), 6).as("cos"))
      // zero-norm vectors give NaN, which Spark sorts ABOVE all
      // reals descending — drop them or they'd squat in the top-k
      .filter(!isnan(col("cos")))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** SRP-LSH bucketed ANN: candidates = rows whose `planes`-bit
    * hyperplane signature is within `maxBitDiff` bits of the query's
    * (multi-probe by hamming distance), then exact cosine on the
    * survivors. Recall < 1.0 by design; bump `maxBitDiff` or lower
    * `planes` to trade cost for recall.
    */
  def lshTopK(embs: DataFrame, query: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 12,
              maxBitDiff: Int = 2): DataFrame = {
    GraftExtensions.ensureRegistered(embs.sparkSession)
    // native one-pass signature (codegen'd, cached plane matrix) —
    // the HOF srpBucket re-hashed every (plane, dim) pair per row
    val sig = expr(s"graft_srp_buckets(`$vecCol`, $planes, 1)")(0)
    val bucketed = embs.withColumn("bucket", sig)
    val q = query.select(col(vecCol).as("q_vec"), sig.as("q_bucket"))
    val joined = bucketed.crossJoin(broadcast(q))
      .filter(bit_count(col("bucket").bitwiseXOR(col("q_bucket"))) <= maxBitDiff)
    joined
      .select(col(idCol), round(cosineFast(joined, vecCol, "q_vec"), 6).as("cos"))
      .filter(!isnan(col("cos")))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
