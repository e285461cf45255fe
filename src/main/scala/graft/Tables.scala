package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source registry for the driver-generated TPC-H-ish testdata
  * (see TESTDATA.md). One parquet file per table under the scale
  * -factor directory passed to every query.
  *
  * Reads go through `spark.read.parquet` so Catalyst keeps scan-level
  * filter pushdown and column pruning — at 100 TB the same call reads
  * a partitioned parquet lake and only the referenced columns.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across driver
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized parquet
    * reader rejects — read nanos as long, truncate to micros, matching
    * DuckDB/pyarrow's own ns->us truncation) and TIMESTAMP(MICROS)
    * without UTC adjustment (read as TIMESTAMP_NTZ — normalize to the
    * session TimestampType, values unchanged under the UTC session tz).
    * Dispatch on the type actually read so both generations load
    * identically.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
