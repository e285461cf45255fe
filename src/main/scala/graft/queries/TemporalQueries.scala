package graft.queries

import graft.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time operators: as-of join, range (band) join, gap-based
  * sessionization (SURVEY §2), all over the events stream table
  * (orders live in 1995-2001 and events in 2024, so meaningful
  * time-joins are events-to-events).
  *
  * Oracles replicate the semantics in plain SQL (rank / band
  * predicates / window chains).
  */
object TemporalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Time-series resample + forward fill: each user's activity on a
    // dense hourly grid over their own observed span — missing hours
    // carry the last observed hourly total forward and are flagged.
    // Grid generation is row-local (sequence over the per-user span),
    // so the shuffles are the hourly rollup and the fill window, both
    // on the user key. The standard feature-engineering reshape for
    // irregular event streams.
    "resample_ffill" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .filter(col("user_id") <= 10)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(round(sum(col("value")), 2).as("v"), count(lit(1)).as("n"))
      val grid = hourly.groupBy(col("user_id"))
        .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR")))
            .as("hour"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          last(col("v"), ignoreNulls = true).over(w).as("filled_v"),
          col("v").isNull.cast("long").as("was_gap"))
        .orderBy(col("user_id"), col("hour"))
    }),

    // For each purchase event, attach the same user's latest 'view'
    // event at or before it. Single-shuffle union-sort as-of join
    // (see AsOfJoin scaladoc for the cost model).
    // Trailing-7-day distinct actives per day WITHOUT a range join:
    // each (user, active-day) row explodes to the ≤7 future days it
    // contributes to (row-local, constant factor), then one shuffle
    // counts distinct users per target day. The naive days×events
    // band join shuffles the corpus per window width; this shape
    // shuffles it once regardless of width — the sliding-distinct
    // form that survives 100 TB. Days with no events in the trailing
    // week simply don't appear (semi join with observed days).
    "window_sliding_distinct" -> ((s, d) => {
      val act = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = act.select(col("day")).distinct()
      val contrib = act.select(col("user_id"),
        explode(sequence(col("day"),
          date_add(col("day"), 6))).as("day"))
      contrib.join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("u7"))
        .orderBy(col("day"))
    }),

    "asof_join" -> ((s, d) => {
      val purchases = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("user_id") <= 400)
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = Tables.events(s, d)
        .filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"), col("value").as("view_value"))
      AsOfJoin.asof(purchases, views, key = "user_id",
          leftTime = "ts", rightTime = "view_ts",
          rightPayload = Seq("view_id", "view_value"),
          rightTiebreak = "view_id")
        .select(col("event_id"), col("user_id"),
          col("asof_view_id").as("last_view_id"),
          round(col("asof_view_value"), 4).as("last_view_value"))
        .orderBy(col("event_id"))
    }),

    // Band join: same user's clicks within the hour before each
    // purchase. Equi-key + range predicate -> shuffled hash/sort-merge
    // join on user_id with a residual band filter; summarized per
    // purchase so output stays small and deterministic.
    "range_join" -> ((s, d) => {
      val purchases = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("user_id") <= 300)
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = Tables.events(s, d)
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("value").as("c_value"))
      purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("ts"))
        .groupBy(col("event_id"), col("user_id"))
        .agg(count(lit(1)).as("n_clicks"),
          round(sum(col("c_value")), 4).as("click_value"))
        .orderBy(col("event_id"))
    }),

    // Gap-based sessionization: a >30-minute silence starts a new
    // session. One shuffle on user_id; both windows share it.
    // ts IS NOT NULL is part of the operator's contract (r15
    // adversarial-relational rung): a timestamp-less event cannot be
    // placed in a GAP-based session, and engines even disagree on
    // where NULLs sort (Spark ASC = NULLS FIRST, DuckDB = NULLS
    // LAST) — so both engine and oracle exclude them explicitly.
    "sessionize" -> ((s, d) => {
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, d)
        .filter(col("user_id") <= 100 && col("ts").isNotNull)
        .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("new_session")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Strict-order funnel (first-touch): per user, the first view,
    // the first click AFTER that view, the first purchase AFTER that
    // click. Each stage is an aggregate-then-join on user_id — the
    // aggregations and joins share one hash partitioning, so the
    // funnel costs one user shuffle regardless of corpus size.
    "funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_type"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      def stage(df: org.apache.spark.sql.DataFrame, name: String) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), col("n_users"))
      stage(v, "1_view")
        .unionByName(stage(c, "2_click_after_view"))
        .unionByName(stage(p, "3_purchase_after_click"))
        .orderBy(col("stage"))
    }),

    // Weekly cohort retention: cohort = the ISO week of a user's
    // first event; one row per (cohort, week offset) with distinct
    // active users. Week indexes via epoch-seconds arithmetic so the
    // Spark and DuckDB week math cannot drift.
    "retention_cohort" -> ((s, d) => {
      val wk = floor(unix_timestamp(date_trunc("week", col("ts")))
        .cast("double") / 604800).cast("long")
      val uw = Tables.events(s, d)
        .select(col("user_id"), wk.as("wk")).distinct()
      val cohort = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      uw.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_wk"), col("week_offset"))
    }))

  val oracles: Map[String, String] = Map(
    "resample_ffill" ->
      """WITH hourly AS (
        |  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |    round(sum(value), 2) AS v, count(*) AS n
        |  FROM events WHERE user_id <= 10
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id,
        |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM (SELECT user_id, min(hour) AS lo, max(hour) AS hi
        |        FROM hourly GROUP BY user_id)),
        |j AS (
        |  SELECT g.user_id, g.hour, h.v, h.n
        |  FROM grid g LEFT JOIN hourly h
        |    ON g.user_id = h.user_id AND g.hour = h.hour)
        |SELECT user_id, hour,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_events,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v,
        |  CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap
        |FROM j ORDER BY user_id, hour""".stripMargin,

    "window_sliding_distinct" ->
      """WITH act AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM act),
        |x AS (SELECT d.day, a.user_id
        |      FROM days d JOIN act a ON a.day BETWEEN d.day - 6 AND d.day)
        |SELECT day, count(DISTINCT user_id) AS u7
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    // LATERAL, not row_number-over-event_id (r15 adversarial rung):
    // an as-of join emits one row PER LEFT ROW — duplicate purchase
    // rows each get their own output, matching the engine's (and
    // DuckDB's native ASOF JOIN's) multiset semantics, where the old
    // rn=1-per-event_id formulation silently collapsed them
    "asof_join" ->
      """SELECT p.event_id, p.user_id,
        |  v.last_view_id, v.last_view_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase' AND user_id <= 400) p
        |LEFT JOIN LATERAL (
        |  SELECT e.event_id AS last_view_id,
        |    round(e.value, 4) AS last_view_value
        |  FROM events e
        |  WHERE e.event_type = 'view' AND e.user_id = p.user_id
        |    AND e.ts <= p.ts
        |  ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) v ON true
        |ORDER BY event_id""".stripMargin,

    "range_join" ->
      """SELECT p.event_id, p.user_id, count(*) AS n_clicks,
        |  round(sum(c.value), 4) AS click_value
        |FROM events p
        |JOIN events c ON c.user_id = p.user_id AND c.event_type = 'click'
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |WHERE p.event_type = 'purchase' AND p.user_id <= 300
        |GROUP BY p.event_id, p.user_id ORDER BY p.event_id""".stripMargin,

    "sessionize" ->
      """SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM (
        |  SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN prev_ts IS NULL
        |             OR CAST(floor(epoch(ts)) AS BIGINT)
        |                - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800 THEN 1
        |           ELSE 0 END AS new_session
        |    FROM (
        |      SELECT user_id, ts, event_id,
        |        lag(ts, 1) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS prev_ts
        |      FROM events WHERE user_id <= 100 AND ts IS NOT NULL)))
        |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |UNION ALL
        |SELECT '2_click_after_view', count(*) FROM c
        |UNION ALL
        |SELECT '3_purchase_after_click', count(*) FROM p
        |ORDER BY stage""".stripMargin,

    "retention_cohort" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(date_trunc('week', ts)) / 604800) AS BIGINT) AS wk
        |  FROM events),
        |coh AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id)
        |SELECT cohort_wk, wk - cohort_wk AS week_offset,
        |  count(DISTINCT uw.user_id) AS n_users
        |FROM uw JOIN coh ON uw.user_id = coh.user_id
        |GROUP BY cohort_wk, week_offset
        |ORDER BY cohort_wk, week_offset""".stripMargin)
}
