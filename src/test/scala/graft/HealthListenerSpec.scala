package graft

import java.nio.file.Files

import graft.operators.Quality
import graft.streaming.{HealthListener, StreamIngest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

class HealthListenerSpec extends SparkSpec {

  private def awaitEvents(cond: => Boolean, ms: Long = 20000): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
  }

  test("listener feeds processingStats: batches as success, a killed query as failure") {
    val listener = HealthListener.attach(spark)
    try {
      val drop = Files.createTempDirectory("health_drop").toString
      val cp = Files.createTempDirectory("health_cp").toString
      Files.writeString(java.nio.file.Paths.get(s"$drop/f1.csv"),
        "Order Key!,Total Price ($)\n1,9.99\n2,5.00\n3,1.25\n")
      val schema = StructType(Seq(
        StructField("Order Key!", StringType), StructField("Total Price ($)", StringType)))

      // healthy run: one AvailableNow batch lands a success row
      val ok = StreamIngest.fileStream(spark, drop, schema)
        .writeStream.queryName("health_ok")
        .option("checkpointLocation", s"$cp/ok")
        .trigger(Trigger.AvailableNow())
        // the batch must be CONSUMED for the source to report input
        // rows — a no-op sink yields numInputRows=0 progress
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.count(); ()
        }
      ok.start().awaitTermination()

      // killed batch: the sink throws, the query dies with an exception
      val bad = StreamIngest.fileStream(spark, drop, schema)
        .writeStream.queryName("health_bad")
        .option("checkpointLocation", s"$cp/bad")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new RuntimeException("synthetic batch failure")
        }
      val q = bad.start()
      intercept[Exception] { q.awaitTermination() }

      // listener delivery is async on the listener bus — poll
      awaitEvents {
        val f = listener.frame(spark)
        f.filter(col("status") === "error").count() >= 1 &&
          f.filter(col("status") === "success" &&
            col("rows_processed") >= 3).count() >= 1
      }
      val stats = Quality.processingStats(listener.frame(spark)).collect().head
      assert(stats.getAs[Long]("failed_jobs") >= 1,
        s"killed query must surface as failed: $stats")
      assert(stats.getAs[Long]("successful_jobs") >= 1,
        s"healthy batch must surface as success: $stats")
      assert(stats.getAs[Long]("total_rows_processed") >= 3,
        s"success row must carry the batch's input rows: $stats")
      val reasons = listener.frame(spark).filter(col("status") === "error")
        .select("reason").collect().map(_.getString(0))
      assert(reasons.exists(_.nonEmpty), "failure rows carry a reason")

      // durable sink drains the buffer
      val log = Files.createTempDirectory("health_log").toString + "/log"
      listener.sinkTo(spark, log)
      assert(spark.read.parquet(log).count() >= 2)
      assert(listener.frame(spark).isEmpty)
    } finally spark.streams.removeListener(listener)
  }
}
