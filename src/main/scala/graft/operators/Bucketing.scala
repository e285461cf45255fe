package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support (SURVEY §5): pre-partition fact tables on
  * their join key at write time so repeated joins/aggregations on
  * that key skip the shuffle entirely.
  *
  * At 100 TB this is the difference between re-shuffling 100 TB per
  * join and a zero-exchange sort-merge join: both sides read already
  * hash-bucketed files. The write costs one shuffle, amortized over
  * every downstream join on the key.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table — managed by default, or
    * EXTERNAL at `path` (keeps fixtures/lakes outside the session
    * warehouse directory).
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int = 32, path: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys — planner elides
    * both exchanges when bucket specs line up.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
