package graft

import java.sql.Timestamp

import graft.operators.Scd
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val current = Seq(
    // key 1: open version + a closed history row beneath it
    (1L, "alice", 10.0, ts("2020-01-01 00:00:00"), Option(ts("2022-01-01 00:00:00"))),
    (1L, "alice", 20.0, ts("2022-01-01 00:00:00"), None),
    (2L, "bob", 30.0, ts("2020-01-01 00:00:00"), None),
    (3L, "carol", 40.0, ts("2020-01-01 00:00:00"), None),
    (4L, "dave", null.asInstanceOf[Double], ts("2020-01-01 00:00:00"), None))
    .toDF("k", "name", "bal", "valid_from", "valid_to")
    // the tuple encoder makes bal non-nullable 0.0; null it explicitly
    .withColumn("bal", when(col("k") === 4L, lit(null).cast("double"))
      .otherwise(col("bal")))

  test("scd2: change closes + reopens, no-op ignored, history untouched, null-change detected") {
    val updates = Seq(
      (1L, "alice", 25.0, ts("2024-01-01 00:00:00")),   // changed bal
      (2L, "bob", 30.0, ts("2024-01-01 00:00:00")),     // no-op
      (4L, "dave", 5.0, ts("2024-01-01 00:00:00")),     // NULL -> value = change
      (9L, "zoe", 99.0, ts("2024-01-01 00:00:00")))     // insert
      .toDF("k", "name", "bal", "ts")
    val out = Scd.scd2Merge(current, updates, Seq("k"), Seq("name", "bal"), "ts")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getTimestamp(3), Option(r.getTimestamp(4)))).toSet
    assert(out == Set(
      // key 1: history row untouched, old open closed at update ts, new open
      (1L, "alice", Some(10.0), ts("2020-01-01 00:00:00"), Some(ts("2022-01-01 00:00:00"))),
      (1L, "alice", Some(20.0), ts("2022-01-01 00:00:00"), Some(ts("2024-01-01 00:00:00"))),
      (1L, "alice", Some(25.0), ts("2024-01-01 00:00:00"), None),
      // key 2: no-op update leaves the open row as-is
      (2L, "bob", Some(30.0), ts("2020-01-01 00:00:00"), None),
      // key 3: no update
      (3L, "carol", Some(40.0), ts("2020-01-01 00:00:00"), None),
      // key 4: NULL -> 5.0 is a change
      (4L, "dave", None, ts("2020-01-01 00:00:00"), Some(ts("2024-01-01 00:00:00"))),
      (4L, "dave", Some(5.0), ts("2024-01-01 00:00:00"), None),
      // key 9: pure insert
      (9L, "zoe", Some(99.0), ts("2024-01-01 00:00:00"), None)), out.toString)
  }

  test("scd2: several updates for one key in a batch — latest timestamp wins") {
    val updates = Seq(
      (2L, "bob", 31.0, ts("2024-01-01 00:00:00")),
      (2L, "bob", 35.0, ts("2024-06-01 00:00:00")))
      .toDF("k", "name", "bal", "ts")
    val out = Scd.scd2Merge(current, updates, Seq("k"), Seq("name", "bal"), "ts")
      .filter(col("k") === 2L)
      .collect().map(r => (Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.getTimestamp(4)))).toSet
    // one closed version (at the LATEST ts) and one open at 35.0 — the
    // intermediate 31.0 version is not materialized (documented)
    assert(out == Set(
      (Some(30.0), Some(ts("2024-06-01 00:00:00"))),
      (Some(35.0), None)), out.toString)
  }
}
