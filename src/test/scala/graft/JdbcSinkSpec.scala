package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Live JDBC round-trip for the warehouse sink (reference
  * dataframe_tasks.py:78-85: chunked to_sql append into Postgres) —
  * embedded in-memory Derby stands in for the warehouse, so the
  * batched write path is actually executed, not just assembled.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbcAppend writes 1000 rows batched and reads back; append appends") {
    val df = (1 to 1000).map(i => (i.toLong, s"name_$i", i * 1.5))
      .toDF("id", "name", "score")
    Sinks.jdbcAppend(df, url, "etl_rows", user = "app", password = "app",
      batchSize = 100, numPartitions = 4)
    def readBack() = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "etl_rows").load()
    val back = readBack()
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).head.getLong(0) == 500500L)
    assert(back.filter(col("id") === 7).head.getString(1) == "name_7")
    // to_sql(if_exists='append') semantics: a second write adds rows
    Sinks.jdbcAppend(df, url, "etl_rows", user = "app", password = "app")
    assert(readBack().count() == 2000)
  }
}
