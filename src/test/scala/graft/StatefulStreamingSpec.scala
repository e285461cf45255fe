package graft

import java.sql.Timestamp

import graft.streaming.{Sessionize, StreamIngest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark removes retried events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    mem.addData(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:00:05")), // duplicate id, retried
      (2L, ts("2024-01-01 10:01:00")))
    val deduped = StreamIngest.dedupWithinWatermark(
      mem.toDF().toDF("event_id", "ts"), "ts", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.sql("SELECT event_id FROM dd").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L))
  }

  test("flatMapGroupsWithState emits sessions closed by a gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessions(spark, mem.toDS(), gapSeconds = 1800)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    // session 1: two events 10 min apart; then a 2h gap closes it
    mem.addData(
      Sessionize.Event(7L, ts("2024-01-01 10:00:00")),
      Sessionize.Event(7L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    mem.addData(Sessionize.Event(7L, ts("2024-01-01 12:30:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT userId, sessionStart, sessionEnd, nEvents FROM sess").collect()
    assert(rows.length == 1, s"expected one closed session, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getLong(0) == 7L)
    assert(r.getTimestamp(1) == ts("2024-01-01 10:00:00"))
    assert(r.getTimestamp(2) == ts("2024-01-01 10:10:00"))
    assert(r.getLong(3) == 2L)
  }
}
