package graft

import scala.jdk.CollectionConverters._

/** One pattern → warehouse-target mapping entry
  * (config/pattern_config.yaml `pattern_mappings`): path-substring
  * pattern, bare table, schema, free-text description. The reference
  * routes to schema-qualified targets (`public.*` vs `staging.*`);
  * [[target]] is the qualified name a sink should use.
  */
final case class PatternMapping(pattern: String, table: String,
                                schema: String = "public",
                                description: String = "") {
  def target: String = s"$schema.$table"
}

/** File-level quality gates (pattern_config.yaml `data_quality`,
  * pattern_watcher_configurable.py:75-77,240-253). `extras` carries
  * unrecognized data_quality keys through untouched so deployments
  * can hang their own row-level gate settings off the same file.
  */
final case class QualityGates(maxFileSizeMb: Option[Double] = Some(100.0),
                              requireHeaders: Boolean = true,
                              skipEmptyFiles: Boolean = true,
                              encodingFallbacks: Seq[String] =
                                Seq("utf-8", "utf-8-sig", "latin1", "cp1252"),
                              extras: Map[String, String] = Map.empty)

/** Externalized pipeline configuration, re-expressing the reference's
  * PatternConfig (pattern_config_system.py:1-282): routing patterns
  * with schema-qualified targets, data-quality gates, and the
  * watcher's supported-extension list. Load from YAML or JSON with
  * the reference's exact keys; ordering of `pattern_mappings` is
  * preserved (first match wins downstream, like the reference's
  * dict-iteration order).
  *
  * An operator of the reference system reconfigures routing by
  * editing the file and letting the watcher hot-reload it; the Spark
  * analogue is re-reading the config at job/stream start — mappings
  * become literal expressions in the plan, so a running stream picks
  * up changes on its next restart, and a batch job on its next run.
  */
final case class PipelineConfig(mappings: Seq[PatternMapping],
                                quality: QualityGates,
                                supportedExtensions: Seq[String],
                                pollIntervalSeconds: Option[Int] = None) {
  /** (pattern, schema-qualified target) pairs, config order. */
  def qualifiedMapping: Seq[(String, String)] = mappings.map(m => m.pattern -> m.target)
  /** (pattern, bare table) pairs — the pre-config routing shape. */
  def bareMapping: Seq[(String, String)] = mappings.map(m => m.pattern -> m.table)
}

object PipelineConfig {

  /** The reference's default configuration
    * (pattern_config_system.py:41-108), for callers with no file.
    */
  val default: PipelineConfig = PipelineConfig(
    mappings = Seq(
      PatternMapping("tel_list", "dim_numbers", "public"),
      PatternMapping("customer_data", "dim_customers", "public"),
      PatternMapping("product_info", "dim_products", "public"),
      PatternMapping("sales_data", "fact_sales", "public"),
      PatternMapping("inventory", "dim_inventory", "public"),
      PatternMapping("transactions", "fact_transactions", "public"),
      PatternMapping("reports", "staging_reports", "staging")),
    quality = QualityGates(),
    supportedExtensions = Seq(".csv", ".xlsx", ".xls", ".xlsm"))

  /** Load from a local or Hadoop-visible path; format by extension
    * (.yaml/.yml/.json), like the reference's loader.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): PipelineConfig = {
    val lower = path.toLowerCase
    val yaml = lower.endsWith(".yaml") || lower.endsWith(".yml")
    if (!yaml && !lower.endsWith(".json")) throw new IllegalArgumentException(
      s"unsupported config file format: $path (want .yaml/.yml/.json)")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    if (yaml) parseYaml(text) else parseJson(text)
  }

  def parseYaml(text: String): PipelineConfig =
    fromTree(new com.fasterxml.jackson.databind.ObjectMapper(
        new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
      .readValue(text, classOf[java.util.Map[String, Object]]))

  def parseJson(text: String): PipelineConfig =
    fromTree(new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(text, classOf[java.util.Map[String, Object]]))

  /** Build + validate, collecting every error like the reference's
    * validate_config (pattern_config_system.py:194-225) — a config
    * typo should fail the deploy loudly, not route rows to nowhere.
    */
  private def fromTree(root: java.util.Map[String, Object]): PipelineConfig = {
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val tree = root.asScala

    val mappings: Seq[PatternMapping] = tree.get("pattern_mappings") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.toSeq.flatMap { case (k, v) =>
          val pattern = k.toString
          v match {
            case entry: java.util.Map[_, _] =>
              val e = entry.asScala.map { case (ek, ev) =>
                ek.toString -> Option(ev).map(_.toString).getOrElse("")
              }.toMap
              e.get("table") match {
                case Some(table) =>
                  Some(PatternMapping(pattern, table,
                    e.getOrElse("schema", "public"),
                    e.getOrElse("description", "")))
                case None =>
                  errors += s"pattern $pattern missing required 'table' field"
                  None
              }
            case _ =>
              errors += s"pattern $pattern config must be a mapping"
              None
          }
        }
      case Some(_) =>
        errors += "pattern_mappings must be a mapping"; Seq.empty
      case None =>
        errors += "missing required section: pattern_mappings"; Seq.empty
    }

    val knownQuality = Set("max_file_size_mb", "require_headers",
      "skip_empty_files", "encoding_fallbacks")
    val quality = tree.get("data_quality") match {
      case Some(q: java.util.Map[_, _]) =>
        val e = q.asScala.map { case (k, v) => k.toString -> v }.toMap
        // absent key -> the reference's 100 MB default; an EXPLICIT
        // `max_file_size_mb: null` disables the cap. Treating absence
        // as "unlimited" would silently wave 2 GB junk through for
        // any config that just didn't mention the key.
        val maxMb = e.get("max_file_size_mb") match {
          case None => QualityGates().maxFileSizeMb
          case Some(null) => None
          case Some(n: Number) => Some(n.doubleValue())
          case Some(other) =>
            errors += s"max_file_size_mb must be a number, got: $other"
            QualityGates().maxFileSizeMb
        }
        def bool(key: String, dflt: Boolean): Boolean = e.get(key) match {
          case Some(b: java.lang.Boolean) => b
          case Some(other) =>
            errors += s"$key must be a boolean, got: $other"; dflt
          case None => dflt
        }
        val fallbacks = e.get("encoding_fallbacks") match {
          case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
          case Some(other) =>
            errors += s"encoding_fallbacks must be a list, got: $other"
            QualityGates().encodingFallbacks
          case None => QualityGates().encodingFallbacks
        }
        QualityGates(maxMb, bool("require_headers", dflt = true),
          bool("skip_empty_files", dflt = true), fallbacks,
          extras = e.view.filterKeys(!knownQuality.contains(_))
            .map { case (k, v) => k -> String.valueOf(v) }.toMap)
      // an absent section means defaults; a PRESENT but non-mapping
      // section (mis-indented YAML is the classic cause) is an error —
      // silently defaulting would apply the exact gates the operator
      // was trying to change
      case Some(other) =>
        errors += s"data_quality must be a mapping, got: $other"
        QualityGates()
      case None => QualityGates()
    }

    val watcher = tree.get("watcher_settings") match {
      case Some(w: java.util.Map[_, _]) =>
        w.asScala.toMap.map { case (k, v) => String.valueOf(k) -> v }
      case Some(other) =>
        errors += s"watcher_settings must be a mapping, got: $other"
        Map.empty[String, Object]
      case None => Map.empty[String, Object]
    }
    val extensions = watcher.get("supported_extensions") match {
      case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toSeq
      case Some(other) =>
        errors += s"supported_extensions must be a list, got: $other"
        default.supportedExtensions
      case None => default.supportedExtensions
    }
    // the reference validates poll_interval as an integer
    // (pattern_config_system.py:215); it becomes the stream trigger
    // interval via StreamIngest.triggerFor
    val poll = watcher.get("poll_interval") match {
      case Some(n: Number) => Some(n.intValue())
      case Some(other) =>
        errors += s"poll_interval must be an integer, got: $other"; None
      case None => None
    }

    if (errors.nonEmpty) throw new IllegalArgumentException(
      s"invalid pipeline config:\n  ${errors.mkString("\n  ")}")
    PipelineConfig(mappings, quality, extensions, poll)
  }
}
