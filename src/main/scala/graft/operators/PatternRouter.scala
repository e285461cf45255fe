package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Path-substring → target-table routing, re-expressing the
  * reference's PATTERN_TABLE_MAPPING dispatch
  * (pattern_based_cleaner_watcher.py:34-44,136-157,
  * config/pattern_config.yaml pattern_mappings).
  *
  * The reference decides per *file* on the driver; here routing is a
  * row-level expression, so one Spark job can fan a mixed 100 TB drop
  * zone out to per-table sinks via `partitionBy(routeCol)` with no
  * driver-side loop.
  */
object PatternRouter {

  /** Ordered (substring-pattern, table) mapping; first match wins,
    * like the reference's dict-iteration order.
    */
  val defaultMapping: Seq[(String, String)] = Seq(
    "tel_list"      -> "dim_numbers",
    "customer_data" -> "dim_customers",
    "product_info"  -> "dim_products",
    "sales_data"    -> "fact_sales",
    "inventory"     -> "dim_inventory",
    "transactions"  -> "fact_transactions",
    "reports"       -> "staging_reports")

  /** Routing expression: lowercase substring containment, first match
    * wins, null when nothing matches (reference skips those files).
    */
  def routeExpr(pathCol: Column,
                mapping: Seq[(String, String)] = defaultMapping): Column = {
    val normalized = lower(regexp_replace(pathCol, "\\\\", "/"))
    mapping.foldRight(lit(null).cast("string")) {
      case ((pattern, table), elseCol) =>
        when(normalized.contains(pattern.toLowerCase), lit(table))
          .otherwise(elseCol)
    }
  }

  /** Tag rows with their routed table; unmatched rows are dropped
    * (the watcher ignores unmatched paths).
    */
  def route(df: DataFrame, pathCol: String,
            mapping: Seq[(String, String)] = defaultMapping): DataFrame =
    df.withColumn("target_table", routeExpr(col(pathCol), mapping))
      .filter(col("target_table").isNotNull)

  /** Config-driven routing with schema-QUALIFIED targets: the
    * reference routes `reports` to `staging.staging_reports` while
    * everything else lands in `public.*` (pattern_config.yaml), and a
    * bare table name cannot express that. Emits `target`
    * (schema.table — what a JDBC sink's dbtable wants), plus
    * `target_schema`/`target_table` split out for sinks that take
    * them separately. Reloading the config and re-running is the
    * redeploy-free reconfiguration the reference's hot-reload gives
    * its watcher.
    */
  def route(df: DataFrame, pathCol: String,
            config: graft.PipelineConfig): DataFrame =
    df.withColumn("target", routeExpr(col(pathCol), config.qualifiedMapping))
      .filter(col("target").isNotNull)
      .withColumn("target_schema", substring_index(col("target"), ".", 1))
      .withColumn("target_table", substring_index(col("target"), ".", -1))
}
