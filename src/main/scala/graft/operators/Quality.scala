package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality reporting + the processing-log stats surface
  * (enhanced_tasks.py:94-96 null counts; tasks_postgres.py:237-263
  * get_processing_stats).
  */
object Quality {

  /** One-row report: total rows plus per-column null counts
    * (`nulls_<col>`). Single map-side-combinable aggregation —
    * one pass over the data, no matter how wide.
    */
  def nullReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.map(c => count(when(col(c).isNull, 1)).as(s"nulls_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Column profile in LONG form — one row per profiled column with
    * (column, n_rows, n_null, n_distinct, min_str, max_str): the
    * standard first look at an unknown drop-zone table, extending the
    * reference's null counts (enhanced_tasks.py:94) to a real
    * profiler. Values compare as strings so one schema fits every
    * column type; numeric columns profile min/max on their native
    * ordering first, then render.
    *
    * One pass, one aggregation: every per-column statistic is a
    * map-side-combinable agg in a single `agg(...)` (no per-column
    * scans), and the wide one-row result pivots to long form on the
    * driver side of the plan (a `stack`), so profiling a 500-column
    * table at 100 TB still reads the data exactly once. n_distinct
    * is EXACT and therefore shuffles a distinct-set per column; pass
    * `approxDistinct = true` to trade it for an HLL estimate and
    * keep the whole profile map-side.
    */
  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(when(v.isNull, 1)).as(s"__null_$c"),
        (if (approxDistinct) approx_count_distinct(v) else countDistinct(v))
          .as(s"__dist_$c"),
        min(v).cast("string").as(s"__min_$c"),
        max(v).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // explode an array of uniformly-named structs (stack() would
    // type-check the per-column field NAMES against each other)
    val rows = array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"),
        col(s"__max_$c").as("max_str"))
    }: _*)
    wide.select(col("__n").as("n_rows"), explode(rows).as("p"))
      .select(col("p.column").as("column"), col("n_rows"),
        col("p.n_null").as("n_null"), col("p.n_distinct").as("n_distinct"),
        col("p.min_str").as("min_str"), col("p.max_str").as("max_str"))
  }

  /** The reference's ETL-log stats aggregation re-expressed over any
    * log-shaped frame with (status, rows_processed, processing_time)
    * columns — total/successful/failed jobs, total rows, avg seconds.
    */
  def processingStats(log: DataFrame, statusCol: String = "status",
                      rowsCol: String = "rows_processed",
                      timeCol: String = "processing_time_seconds"): DataFrame =
    log.agg(
      count(lit(1)).as("total_jobs"),
      count(when(col(statusCol) === "success", 1)).as("successful_jobs"),
      count(when(col(statusCol) === "error", 1)).as("failed_jobs"),
      sum(col(rowsCol)).cast("long").as("total_rows_processed"),
      round(avg(col(timeCol)), 4).as("avg_processing_time_seconds"))
}
