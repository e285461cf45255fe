package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof attaches latest right row at-or-before left time, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 10:00:00"), "e3"), // no right rows for key 2 yet
      (3L, ts("2024-01-01 09:00:00"), "e4")  // key with no right rows at all
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L, 1.0),
      (1L, ts("2024-01-01 11:00:00"), 101L, 2.0),
      (1L, ts("2024-01-01 12:00:00"), 102L, 3.0), // same instant as e2 -> visible
      (2L, ts("2024-01-01 11:00:00"), 200L, 9.0)
    ).toDF("k", "rt", "rid", "rv")

    val out = AsOfJoin.asof(left, right, "k", "t", "rt",
        Seq("rid", "rv"), "rid")
      .collect().map(r => (r.getString(2), Option(r.get(3)).map(_.toString)))
      .toMap
    assert(out("e1") == Some("100"))
    assert(out("e2") == Some("102")) // <= semantics, equal instant wins
    assert(out("e3") == None)        // right row is later than the event
    assert(out("e4") == None)        // key never seen on the right
  }

  test("equal-time right rows resolve to highest tiebreak deterministically") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "e")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L, 0.0),
      (1L, ts("2024-01-01 09:00:00"), 9L, 0.0),
      (1L, ts("2024-01-01 09:00:00"), 8L, 0.0)).toDF("k", "rt", "rid", "rv")
    val out = AsOfJoin.asof(left, right, "k", "t", "rt", Seq("rid"), "rid")
      .collect()
    assert(out.head.getLong(3) == 9L) // cols: k, t, tag, asof_rid
  }
}
