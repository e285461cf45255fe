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
