package graft.operators

import graft.plans.GraftExtensions
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Shared scaffolding for the batch ("…Each") ANN probes
  * ([[Ann.ivfSearchEach]], [[Similarity.lshIndexTopKEach]],
  * [[Similarity.bruteForceTopKEach]]): collect the driver-sized query
  * batch once, fan each query out to its routing keys (IVF lists /
  * LSH buckets), broadcast the probe frame, and rank each query's
  * candidates with a rank-limited window. Kept in one place so the
  * probe construction and the tie-break contract (cos desc, then id)
  * cannot drift between the three probe families.
  */
private[operators] object BatchProbe {

  /** Collected query rows fanned out to their routing keys as a
    * single-partition, broadcastable probe frame. `qSel`'s first two
    * columns must be (q_id, q_vec); later columns may feed `keysOf`
    * but are not carried. Returns the probe frame (q_id, q_vec, key)
    * and the distinct key list for partition/filter pruning of the
    * corpus side. The collect is driver-sized by contract — the query
    * batch is a probe list, not a corpus.
    */
  def probeFrame(spark: SparkSession, qSel: DataFrame, keyField: StructField,
                 keysOf: Row => Seq[Any]): (DataFrame, Seq[Any]) = {
    val qRows = qSel.collect()
    require(qRows.nonEmpty, "empty query batch")
    val probeRows = qRows.toSeq.flatMap { r =>
      keysOf(r).map(key => Row(r.get(0), r.get(1), key))
    }
    val schema = StructType(qSel.schema.fields.take(2) :+ keyField)
    val probeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(probeRows, 1), schema)
    (probeDf, probeRows.map(_.get(2)).distinct)
  }

  /** Score every routed (corpus row, query) pair with the codegen'd
    * cosine and keep each query's top-k. The `row_number <= k` filter
    * becomes a WindowGroupLimit (map-side group limit), so the window
    * shuffle carries at most k rows per query per map partition.
    * Output: (q_id, idCol, cos).
    */
  def topKPerQuery(joined: DataFrame, idCol: String, vecCol: String,
                   k: Int): DataFrame = {
    GraftExtensions.ensureRegistered(joined.sparkSession)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col(idCol))
    joined
      .select(col("q_id"), col(idCol),
        round(expr(s"graft_cosine(`$vecCol`, q_vec)"), 6).as("cos"))
      // zero-norm vectors give NaN, which sorts ABOVE all reals
      // descending — drop them or they'd squat in every top-k
      .filter(!isnan(col("cos")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("rk")
  }
}
