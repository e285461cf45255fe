package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2). Brute-force cosine top-k is the exact baseline (one
  * broadcast of the query vector, zero shuffles, a single global
  * top-k); the SRP-LSH variant prunes candidates by hyperplane
  * bucket so the same query touches only a bucket's worth of rows —
  * the path that survives 100 TB.
  */
object Similarity {

  /** Exact top-k by cosine to one query vector. The query side is a
    * 1-row broadcast; ordering ties resolve by id so results are
    * deterministic.
    */
  def bruteForceTopK(embs: DataFrame, query: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = query.select(col(vecCol).as("q_vec"))
    embs.crossJoin(broadcast(q))
      .select(col(idCol), round(V.cosine(col(vecCol), col("q_vec")), 6).as("cos"))
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
              vecCol: String, k: Int, planes: Int = 12, dims: Int = 64,
              maxBitDiff: Int = 2): DataFrame = {
    val bucketed = embs.withColumn("bucket", V.srpBucket(col(vecCol), planes, dims))
    val q = query.select(col(vecCol).as("q_vec"),
      V.srpBucket(col(vecCol), planes, dims).as("q_bucket"))
    bucketed.crossJoin(broadcast(q))
      .filter(bit_count(col("bucket").bitwiseXOR(col("q_bucket"))) <= maxBitDiff)
      .select(col(idCol), round(V.cosine(col(vecCol), col("q_vec")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
