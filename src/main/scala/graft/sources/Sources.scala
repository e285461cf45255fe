package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch file sources mirroring the reference's ingestion formats
  * (pattern_based_cleaner_watcher.py:163-193: CSV with encoding
  * fallbacks, Excel; plus JSONL and parquet for the lake side).
  *
  * All readers return plain DataFrames so Catalyst keeps pushdown;
  * schemas can be supplied to skip inference (at 100 TB schema
  * inference means an extra full scan — always pass one in
  * production).
  */
object Sources {

  /** CSV with header handling and charset control. The reference
    * tries utf-8 -> utf-8-sig -> latin1 -> cp1252; Spark's reader
    * handles BOM and non-UTF8 via the charset option, so the fallback
    * chain collapses to a charset argument.
    */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
          charset: String = "UTF-8", delimiter: String = ","): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("charset", charset)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
    withSchema(base, schema).csv(path)
  }

  /** JSON-lines. */
  def jsonl(spark: SparkSession, path: String,
            schema: Option[StructType] = None): DataFrame =
    withSchema(spark.read, schema).json(path)

  /** Parquet (the lake format; predicate pushdown + column pruning
    * reach the scan).
    */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private def withSchema(r: DataFrameReader, s: Option[StructType]): DataFrameReader =
    s.fold(r.option("inferSchema", "true"))(r.schema)
}
