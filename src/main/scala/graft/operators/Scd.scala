package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance: a versioned
  * dimension table (`valid_from`, `valid_to`, NULL = open version)
  * merged with a batch of updates. Changed keys close their open
  * version at the update timestamp and open a new one; no-op updates
  * (every tracked attribute unchanged) are ignored; unknown keys
  * insert as new open versions; closed history rows pass through
  * untouched. The reference loads dimensions by blind append
  * (dataframe_tasks.py:78 `if_exists='append'`) — SCD2 is what a
  * warehouse actually needs for `dim_*` targets, and the engine form
  * is a handful of co-partitioned joins.
  *
  * Shuffle budget: one window shuffle on the key (latest update per
  * key), then the open-side join and both new-version joins reuse
  * that key partitioning — at 100 TB the dimension is the small side
  * and broadcasts.
  *
  * Change detection is null-safe per attribute (`IS DISTINCT FROM`
  * semantics), so NULL → value and value → NULL both count as
  * changes. With several updates for one key in a single batch, the
  * LATEST (by `tsCol`, ties by attribute order) wins and intermediate
  * versions are not materialized — the merge contract is
  * one-version-per-key-per-batch; feed finer-grained history in
  * separate batches if every intermediate must persist.
  */
object Scd {

  def scd2Merge(current: DataFrame, updates: DataFrame, keyCols: Seq[String],
                attrCols: Seq[String], tsCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keyCols/attrCols required")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, struct(attrCols.map(col): _*).desc)
    val latest = updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val history = current.filter(col("valid_to").isNotNull)
    val open = current.filter(col("valid_to").isNull)
    val uSide = latest.select(
      (keyCols.map(col) ++ attrCols.map(c => col(c).as(s"__u_$c")) :+
        col(tsCol).as("__u_ts")): _*)
    val j = open.join(uSide, keyCols, "left")
    // never null: a missing update gives a null __u_ts (isNotNull =
    // false) and <=> is null-safe
    val changed = col("__u_ts").isNotNull &&
      attrCols.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)
    val outCols = (keyCols ++ attrCols ++ Seq("valid_from", "valid_to")).map(col)
    val closed = j.filter(changed)
      .select(((keyCols ++ attrCols).map(col) :+ col("valid_from") :+
        col("__u_ts").as("valid_to")): _*)
    val kept = j.filter(!changed).select(outCols: _*)
    val newOpen = {
      val replacing = latest.join(
        closed.select(keyCols.map(col): _*), keyCols, "left_semi")
      val inserts = latest.join(
        open.select(keyCols.map(col): _*), keyCols, "left_anti")
      replacing.unionByName(inserts)
        .select(((keyCols ++ attrCols).map(col) :+
          col(tsCol).as("valid_from") :+
          lit(null).cast(updates.schema(tsCol).dataType).as("valid_to")): _*)
    }
    history.select(outCols: _*)
      .unionByName(kept)
      .unionByName(closed.select(outCols: _*))
      .unionByName(newOpen)
  }
}
