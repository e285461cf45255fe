package graft

import org.apache.spark.sql.functions._

/** Tables.events must read every physical `ts` convention the data
  * generations have used to identical TimestampType values:
  *  - TIMESTAMP(NANOS) / int64 nanos (early driver generations and
  *    the first ladder generation) — read as long, truncated to
  *    micros;
  *  - TIMESTAMP(MICROS) without UTC adjustment (timestamp_ntz — the
  *    current driver and ScaleUp convention) — normalized to the
  *    session TimestampType.
  * ScaleUp now writes timestamp_ntz (the r12 cross-rung run showed
  * int64 breaks every DuckDB oracle using date_trunc/epoch on the
  * raw parquet), so the long branch survives only through this spec.
  */
class TablesSpec extends SparkSpec {
  test("events long-nanos branch reads identically to timestamp_ntz") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_events_conv")
    val base = Tables.events(spark, sf0001).limit(500)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))

    base.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/nanos/events.parquet")
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")

    val fromNanos = Tables.events(spark, s"$dir/nanos")
    val fromNtz = Tables.events(spark, s"$dir/ntz")
    assert(fromNanos.schema("ts").dataType.typeName === "timestamp")
    assert(fromNtz.schema("ts").dataType.typeName === "timestamp")
    val diff = fromNanos.select("event_id", "ts")
      .except(fromNtz.select("event_id", "ts"))
    assert(diff.isEmpty, "nanos and ntz generations must load identically")
    assert(fromNtz.count() === 500)
  }
}
