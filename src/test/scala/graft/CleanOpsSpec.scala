package graft

import graft.operators.CleanOps
import org.apache.spark.sql.functions._

class CleanOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cleanName matches the reference's normalization") {
    assert(CleanOps.cleanName("Order Key!") == "order_key")
    assert(CleanOps.cleanName("  Total Price ($)  ") == "total_price")
    assert(CleanOps.cleanName("already_clean") == "already_clean")
    assert(CleanOps.cleanName("CamelCase-Col") == "camelcase_col")
  }

  test("dedupeColumnNames suffixes later duplicates positionally") {
    // reference (dataframe_tasks.py:60-62) renames EVERY occurrence of a
    // duplicated name at global index > 0, not just the later copies
    val df = Seq((1, "a", 2)).toDF("k", "name", "name")
    assert(CleanOps.dedupeColumnNames(df).columns.toSeq == Seq("k", "name_1", "name_2"))
  }

  test("dedupeColumnNames never collides with or steals existing names") {
    val df = Seq((1, 2, 3)).toDF("a", "a", "a_1")
    val out = CleanOps.dedupeColumnNames(df).columns.toSeq
    assert(out.distinct == out, s"still duplicated: $out")
    // the real a_1 column keeps its name; the duplicate gets a fresh one
    assert(out == Seq("a", "a_1_", "a_1"))
  }

  test("dropEmptyRows keeps rows with any non-null checked column") {
    val df = Seq(
      (Some(1), Some("x")), (None, Some("y")), (Option.empty[Int], Option.empty[String]))
      .toDF("a", "b")
    assert(CleanOps.dropEmptyRows(df, Seq("a", "b")).count() == 2)
  }

  test("coerceByName parses date/price-like string columns, errors to null") {
    val df = Seq(
      ("2020-01-02", "12.5"), ("garbage", "nope"))
      .toDF("ship_date", "unit_price")
    val out = CleanOps.coerceByName(df)
    assert(out.schema("ship_date").dataType.typeName == "timestamp")
    assert(out.schema("unit_price").dataType.typeName == "double")
    assert(out.filter(col("ship_date").isNotNull).count() == 1)
    assert(out.filter(col("unit_price").isNotNull).count() == 1)
  }

  test("failureLog audits dropped and degraded rows, and feeds processingStats") {
    val df = Seq(
      ("1", "2020-01-02", "12.5"),   // clean: no log row
      ("2", null, null),             // empty on both checked cols
      ("3", "garbage", "9.99"),      // bad date only
      ("4", "2020-02-03", "nope"))   // bad price only
      .toDF("ID!", "Order Date", "Price ($)")
    val log = CleanOps.failureLog(df, "id", "s.csv", "b1",
      emptyCheckCols = Seq("Order Date", "Price ($)"))
    val byId = log.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byId.keySet == Set("2", "3", "4"), s"wrong rows logged: $byId")
    assert(byId("2") == ("error", "empty_row"))
    assert(byId("3") == ("error", "unparseable_date:order_date"))
    assert(byId("4") == ("error", "unparseable_number:price"))
    // the log is processingStats-shaped: failed counts surface there
    val stats = graft.operators.Quality.processingStats(
      log.withColumn("rows_processed", lit(1L))
        .withColumn("processing_time_seconds", lit(0.0)))
      .collect().head
    assert(stats.getAs[Long]("failed_jobs") == 3L)
    assert(stats.getAs[Long]("successful_jobs") == 0L)
  }

  test("ingestPipeline composes and stamps metadata") {
    val df = Seq(("1", "2020-01-01", "9.99")).toDF("ID!", "Order Date", "Price ($)")
    val out = CleanOps.ingestPipeline(df, "s.csv", "b1")
    assert(out.columns.contains("order_date") && out.columns.contains("price"))
    assert(out.select("source_name", "processing_batch").first().toSeq ==
      Seq("s.csv", "b1"))
  }

  test("Quality.profile: one-pass long-form column profile") {
    val df = Seq(
      (1L, Option("a"), Option(2.5)),
      (2L, None, Option(1.0)),
      (3L, Option("a"), None))
      .toDF("id", "s", "v")
    val out = graft.operators.Quality.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("id") == ((3L, 0L, 3L, "1", "3")))
    assert(out("s") == ((3L, 1L, 1L, "a", "a")))
    assert(out("v") == ((3L, 1L, 2L, "1.0", "2.5")))
    // the whole profile is ONE pass: a single source relation in the
    // plan, never one scan per column
    val plan = graft.operators.Quality.profile(df, Seq("id", "s", "v"))
      .queryExecution.optimizedPlan.toString
    assert("(?i)relation".r.findAllIn(plan).length <= 1,
      s"profile should scan the source once:\n$plan")
    // approx variant (HLL distinct) still reports exact-enough counts
    // on tiny input
    val approx = graft.operators.Quality.profile(df, Seq("id"), approxDistinct = true)
      .collect()
    assert(approx.head.getLong(3) == 3L)
  }
}
