package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-hygiene transforms re-expressing the reference's pandas
  * cleaning surface (dataframe_tasks.py:54-67, enhanced_tasks.py:94-167,
  * tasks_postgres.py:98-112) as declarative DataFrame ops.
  *
  * All of these are metadata-only (renames) or narrow row-local
  * projections/filters — no shuffle, fully codegen'd, safe at any
  * scale.
  */
object CleanOps {

  /** Normalize a single column name the way the reference does:
    * non-alphanumeric runs -> '_', strip leading/trailing '_',
    * lowercase. (dataframe_tasks.py:56-57)
    */
  def cleanName(name: String): String =
    name.replaceAll("[^a-zA-Z0-9_]", "_")
      .replaceAll("^_+|_+$", "")
      .toLowerCase

  /** Rename every column via [[cleanName]]. Pure metadata op. */
  def cleanColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(cleanName): _*)

  /** Disambiguate duplicate column names with positional suffixes,
    * mirroring dataframe_tasks.py:60-62 exactly: EVERY occurrence of a
    * duplicated name at position > 0 becomes `name_<position>` — so
    * [x, a, a] -> [x, a_1, a_2] (the reference's list comprehension
    * renames by global index, keeping a name unchanged only at index 0
    * or when it is unique). One deliberate divergence: if a generated
    * suffix collides with a real column (a, a, a_1), we append '_'
    * until free — the reference would silently produce a new duplicate.
    */
  def dedupeColumnNames(df: DataFrame): DataFrame = {
    val counts = df.columns.groupBy(identity).view.mapValues(_.length).toMap
    val used = scala.collection.mutable.HashSet.from(df.columns)
    val renamed = df.columns.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      if (i == 0 || counts(c) == 1) c
      else {
        var candidate = s"${c}_$i"
        while (!used.add(candidate)) candidate += "_"
        candidate
      }
    }
    df.toDF(renamed: _*)
  }

  /** Drop rows where EVERY listed column is null (pandas
    * `dropna(how='all')`, enhanced_tasks.py:99). Row-local filter;
    * pushes to the scan when the columns are scan-level.
    */
  def dropEmptyRows(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val target = if (cols.nonEmpty) cols else df.columns.toSeq
    val anyNotNull = target.map(c => col(c).isNotNull).reduce(_ || _)
    df.filter(anyNotNull)
  }

  /** Name-matched coercion rules: (column, kind, coerced expression).
    * Shared by [[coerceByName]] (applies them) and [[failureLog]]
    * (audits where they fail) so the two can never drift apart.
    */
  private def coercions(df: DataFrame): Seq[(String, String, Column)] =
    df.schema.fields.toSeq.flatMap { f =>
      val n = f.name.toLowerCase
      if (f.dataType.typeName != "string") None
      else if (n.contains("date"))
        Some((f.name, "date", expr(s"try_to_timestamp(`${f.name}`)")))
      else if (n.contains("amount") || n.contains("price"))
        Some((f.name, "number", expr(s"try_cast(`${f.name}` AS DOUBLE)")))
      else None
    }

  /** Name-heuristic type coercion (enhanced_tasks.py:156-167):
    * string columns whose name contains "date" are parsed to
    * timestamp, "amount"/"price" to double; unparseable values
    * become null (pandas errors='coerce' == Spark try_ functions,
    * which also keeps us safe under ANSI mode).
    */
  def coerceByName(df: DataFrame): DataFrame = {
    val rules = coercions(df).map { case (name, _, e) => name -> e }.toMap
    val projected: Seq[Column] = df.schema.fields.toSeq.map { f =>
      rules.get(f.name).map(_.as(f.name)).getOrElse(col(f.name))
    }
    df.select(projected: _*)
  }

  /** Row-level failure audit for the ingest pipeline. The reference
    * records failed work with error messages into etl_processing_log
    * (dataframe_tasks.py:130-140) and its stats count them;
    * [[ingestPipeline]] silently drops empty rows and nulls out
    * unparseable values, losing that audit trail. This emits the
    * missing side: one log row per input row a gate rejected or
    * degraded — `empty_row` for dropEmptyRows victims,
    * `unparseable_<kind>:<col>` per coercion failure (non-null input,
    * null coerced output) — with status='error', so the frame plugs
    * straight into [[Quality.processingStats]]'s failed counts.
    * Row-local projection + filter: no shuffle, safe at any scale.
    */
  def failureLog(df: DataFrame, idCol: String, sourceName: String,
                 batchId: String, emptyCheckCols: Seq[String] = Nil): DataFrame = {
    val cleaned = dedupeColumnNames(cleanColumnNames(df))
    val checkCols =
      if (emptyCheckCols.nonEmpty) emptyCheckCols.map(cleanName)
      else cleaned.columns.toSeq
    val allEmpty = checkCols.map(c => col(c).isNull).reduce(_ && _)
    val coercionErrors = coercions(cleaned).map { case (name, kind, coerced) =>
      when(col(name).isNotNull && coerced.isNull, lit(s"unparseable_$kind:$name"))
    }
    // concat_ws drops the null (non-firing) branches; empty-row wins
    // the first slot so a fully-empty row reads as exactly that rather
    // than as a pile of per-column errors on null input
    val message = concat_ws("; ", when(allEmpty, lit("empty_row")) +: coercionErrors: _*)
    cleaned
      .withColumn("error_message", message)
      .filter(length(col("error_message")) > 0)
      .select(col(idCol),
        lit("error").as("status"),
        col("error_message"),
        lit(sourceName).as("source_name"),
        lit(batchId).as("processing_batch"))
  }

  /** Metadata enrichment (dataframe_tasks.py:65-67). The reference
    * stamps wall-clock times; those are non-deterministic, so the
    * batch id is caller-supplied (at 100 TB you want one batch id per
    * ingest run anyway, minted on the driver once).
    */
  def addMetadata(df: DataFrame, sourceName: String, batchId: String,
                  sheetName: Option[String] = None): DataFrame = {
    val base = df
      .withColumn("source_name", lit(sourceName))
      .withColumn("processing_batch", lit(batchId))
    sheetName.fold(base)(s => base.withColumn("etl_sheet_name", lit(s)))
  }

  /** Row-level validation gates derived from the watcher's file gates
    * (pattern_config.yaml data_quality, pattern_watcher_configurable
    * .py:240): non-null/non-empty payload, bounded size.
    */
  def validateRows(df: DataFrame, textCol: String, maxChars: Long): DataFrame =
    df.filter(col(textCol).isNotNull &&
      length(col(textCol)) > 0 && length(col(textCol)) <= maxChars)

  /** The composed ingest pipeline: clean names -> dedupe names ->
    * drop empty rows -> coerce types -> stamp metadata. Mirrors the
    * reference's flow order (enhanced_tasks.py drops empties at :99
    * BEFORE perform_etl_transformations coerces at :157): dropping
    * AFTER coercion would also delete rows whose checked columns held
    * unparseable-but-present strings.
    */
  def ingestPipeline(df: DataFrame, sourceName: String, batchId: String,
                     emptyCheckCols: Seq[String] = Nil): DataFrame =
    addMetadata(
      coerceByName(dropEmptyRows(dedupeColumnNames(cleanColumnNames(df)),
        emptyCheckCols.map(cleanName))),
      sourceName, batchId)
}
