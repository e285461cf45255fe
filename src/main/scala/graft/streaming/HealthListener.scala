package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Live pipeline health for streaming ingestion — the Spark-native
  * mapping of the reference's health check + processing-log ops
  * surface (etl-worker/health_check.py:6, fileserver `/health`,
  * tasks_postgres.py get_processing_stats): every micro-batch lands
  * one row in an etl_processing_log-shaped buffer (status,
  * rows_processed, processing_time_seconds, plus the query/batch ids
  * and a reason for failures), and a query that dies with an
  * exception lands a status='error' row. [[frame]] exposes the buffer
  * as a DataFrame that plugs straight into
  * [[graft.operators.Quality.processingStats]], so the same stats
  * query that audits the batch pipeline's failure log reports live
  * stream health.
  *
  * Driver-side state is one small case class per micro-batch, capped
  * at [[maxEvents]] (oldest dropped) — a stream that runs for months
  * cannot grow the driver heap unboundedly. At scale, point
  * [[sinkTo]] at a parquet/JDBC log for durable history; the
  * in-memory buffer is the live-ops window.
  */
final class HealthListener(maxEvents: Int = 10000) extends StreamingQueryListener {

  final case class BatchHealth(queryName: String, queryId: String,
                               batchId: Long, status: String,
                               rowsProcessed: Long, processingTimeSeconds: Double,
                               reason: String)

  private val events = new java.util.concurrent.ConcurrentLinkedDeque[BatchHealth]()
  // ConcurrentLinkedDeque.size is O(n); track it ourselves so the
  // per-event trim stays O(1) on the shared listener-bus thread
  private val count = new java.util.concurrent.atomic.AtomicInteger(0)

  private def add(e: BatchHealth): Unit = {
    events.addLast(e)
    if (count.incrementAndGet() > maxEvents &&
        events.pollFirst() != null) count.decrementAndGet()
  }

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    val secs = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue() / 1000.0).getOrElse(0.0)
    add(BatchHealth(Option(p.name).getOrElse(""), p.id.toString, p.batchId,
      "success", p.numInputRows, secs, ""))
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    event.exception.foreach { reason =>
      // normal stop() has no exception and is not a failure
      add(BatchHealth("", event.id.toString, -1L, "error", 0L, 0.0,
        reason.linesIterator.nextOption().getOrElse("")))
    }

  /** The health log as an etl_processing_log-shaped frame. */
  def frame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    events.iterator().asScala.toSeq
      .map(e => (e.queryName, e.queryId, e.batchId, e.status,
        e.rowsProcessed, e.processingTimeSeconds, e.reason))
      .toDF("query_name", "query_id", "batch_id", "status",
        "rows_processed", "processing_time_seconds", "reason")
  }

  /** Durable history: drain the current buffer to a parquet log —
    * call on a cadence (or at stream stop) for months-long runs.
    * Drains by removal (not snapshot-then-clear) so a batch that
    * completes WHILE the write is in flight stays queued for the next
    * drain instead of being cleared unwritten.
    */
  def sinkTo(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val drained = Iterator.continually(events.pollFirst())
      .takeWhile(_ != null).toSeq
    count.addAndGet(-drained.size)
    if (drained.nonEmpty) {
      drained.map(e => (e.queryName, e.queryId, e.batchId, e.status,
          e.rowsProcessed, e.processingTimeSeconds, e.reason))
        .toDF("query_name", "query_id", "batch_id", "status",
          "rows_processed", "processing_time_seconds", "reason")
        .write.mode("append").parquet(path)
    }
  }
}

object HealthListener {
  /** Attach a fresh listener to the session's stream manager. The
    * caller owns removal (`spark.streams.removeListener`).
    */
  def attach(spark: SparkSession, maxEvents: Int = 10000): HealthListener = {
    val l = new HealthListener(maxEvents)
    spark.streams.addListener(l)
    l
  }
}
