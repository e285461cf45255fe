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

  /** Build a bucket-partitioned ANN index: embeddings written to
    * parquet PARTITIONED BY their SRP bucket, so the bucket is a
    * storage-layout column rather than something recomputed per
    * query. This is the 100 TB form of [[lshTopK]] — a probe against
    * the index scans only the probed buckets' directories (partition
    * pruning at the file listing, verified in PlanSpec), instead of
    * streaming the whole corpus through a bucket filter.
    */
  def buildLshIndex(embs: DataFrame, idCol: String, vecCol: String,
                    path: String, planes: Int = 8): Unit = {
    GraftExtensions.ensureRegistered(embs.sparkSession)
    embs.select(col(idCol), col(vecCol))
      .withColumn("bucket", expr(s"graft_srp_buckets(`$vecCol`, $planes, 1)")(0))
      .write.mode("overwrite")
      .partitionBy("bucket")
      .parquet(path)
    // the plane count is part of the index layout: persist it next to
    // the data so probes can't silently use a mismatched count (which
    // would probe buckets that don't exist and return wrong neighbors)
    val spark = embs.sparkSession
    val metaPath = new org.apache.hadoop.fs.Path(path, "_graft_lsh_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    try out.write(s"""{"planes":$planes}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Read the plane count a [[buildLshIndex]] index was built with. */
  private def indexPlanes(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String): Int = {
    val metaPath = new org.apache.hadoop.fs.Path(indexPath, "_graft_lsh_meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaPath),
      s"$indexPath has no _graft_lsh_meta.json — not a buildLshIndex index")
    val in = fs.open(metaPath)
    val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    """"planes"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"malformed LSH index metadata: $json"))
  }

  /** Probe a [[buildLshIndex]] index: multi-probe bucket set (all
    * buckets within `maxBitDiff` of the query's) is computed on the
    * driver from the query vector alone, then pushed as a partition
    * filter — the scan lists only those directories. Exact cosine
    * ranks the survivors.
    */
  def lshIndexTopK(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                   query: DataFrame, idCol: String, vecCol: String, k: Int,
                   maxBitDiff: Int = 2): DataFrame = {
    GraftExtensions.ensureRegistered(spark)
    // the plane count comes from the index's own metadata — taking it
    // as a parameter invited silent mismatches with buildLshIndex
    // (wrong-bucket probes returning wrong neighbors with no error)
    val planes = indexPlanes(spark, indexPath)
    val qRow = query.select(col(vecCol).as("q_vec"),
      expr(s"graft_srp_buckets(q_vec, $planes, 1)")(0).as("q_bucket"))
    val qBucket = qRow.select(col("q_bucket")).head().getLong(0)
    // enumerate the multi-probe set: all bucket ids within hamming
    // maxBitDiff of the query's (small: sum of C(planes, d))
    def probes(base: Long, fromBit: Int, budget: Int): Seq[Long] =
      if (budget == 0) Seq(base)
      else Seq(base) ++ (fromBit until planes).flatMap(b =>
        probes(base ^ (1L << b), b + 1, budget - 1))
    val bucketSet = probes(qBucket, 0, maxBitDiff).distinct
    val indexed = spark.read.parquet(indexPath)
      .filter(col("bucket").isin(bucketSet: _*))
      .crossJoin(broadcast(qRow.select(col("q_vec"))))
    indexed
      .select(col(idCol), round(cosineFast(indexed, vecCol, "q_vec"), 6).as("cos"))
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
