package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks re-expressing the reference's load side.
  *
  * The reference appends pandas frames into Postgres in 1000-row
  * chunks (`df.to_sql(..., if_exists='append', chunksize=1000)`,
  * dataframe_tasks.py:78-85). On Spark the moral equivalents are:
  *  - parquet append to a (partitioned) lake path — the scalable
  *    default; partition columns give the same "route to table"
  *    layout the watcher implements with per-table inserts;
  *  - a JDBC batched append for actual warehouse targets.
  */
object Sinks {

  /** Parquet sink; `ifExists` mirrors pandas' to_sql modes
    * (append / replace / fail).
    */
  def parquet(df: DataFrame, path: String, ifExists: String = "append",
              partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(saveMode(ifExists))
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC sink — same contract as [[parquet]]. ORC is the other
    * columnar lake format Spark reads/writes natively (footer stats,
    * predicate pushdown, column pruning all apply); warehouses that
    * standardized on ORC (Hive lineage) get the same routing layout.
    */
  def orc(df: DataFrame, path: String, ifExists: String = "append",
          partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(saveMode(ifExists))
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** CSV export with header — the reference's drop-zone format going
    * the OTHER way (feeding downstream consumers that want flat
    * files). Quoting/escaping is Spark's RFC-4180 writer; one file
    * per partition, so `coalesce` upstream controls the file count.
    */
  def csv(df: DataFrame, path: String, ifExists: String = "append",
          header: Boolean = true): Unit =
    df.write.mode(saveMode(ifExists))
      .option("header", header.toString)
      .csv(path)

  private def saveMode(ifExists: String): SaveMode = ifExists match {
    case "append" => SaveMode.Append
    case "replace" => SaveMode.Overwrite
    case _ => SaveMode.ErrorIfExists
  }

  /** JDBC append with executor-side batching — the direct analogue of
    * the reference's chunked to_sql. Exercised live in JdbcSinkSpec
    * against embedded Derby (write + read-back + append-again); the
    * same options drive any warehouse target on a cluster.
    */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 user: String, password: String,
                 batchSize: Int = 1000, numPartitions: Int = 32): Unit =
    df.write.mode(SaveMode.Append)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      .option("numPartitions", numPartitions)
      .option("isolationLevel", "READ_COMMITTED")
      .save()
}
