package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window sequence packing for training-batch assembly: lay
  * documents end to end in a deterministic order and cut the token
  * stream into fixed-size windows (the standard concat-and-chunk
  * pretraining layout). Each document is assigned the window its
  * FIRST token falls in, plus its token offset within that stream, so
  * a downstream tokenizer can materialize the exact window content
  * (including the straddle into the next window) without re-scanning
  * neighbours.
  *
  * Reference analogue: the reference assembles fixed-size processing
  * batches by row count (etl-worker/etl_processor/dataframe_tasks.py
  * chunked inserts); for an LLM corpus the budget is tokens, not
  * rows, and the assignment must be reproducible across engines —
  * hence a pure prefix-sum formulation (one window function, no RNG,
  * no state) that an ANSI SQL oracle replicates verbatim.
  *
  * Scale shape: group/stream keys are LOW-CARDINALITY by nature (a
  * handful of sources), so a `Window.partitionBy(source)` prefix sum
  * would sort each source's whole stream in ONE task — a straggler
  * no cluster size fixes. The offsets therefore come from
  * [[Rank.keyedPrefixSum]]: a range-partitioned parallel sort plus
  * driver-side per-(partition, key) offset totals — task count is
  * the shuffle-partition count regardless of key cardinality, and
  * even the no-group GLOBAL stream is fully distributed. Window
  * assignment is bit-identical to the window formulation (the SQL
  * oracle still uses the window form and hash-matches).
  */
object Packing {

  /** Annotate `docs` with (`stream_offset`, `window_id`): the
    * document's first-token offset in its group's concatenated token
    * stream, and `stream_offset / windowTokens`.
    *
    * @param tokenCol    per-document token count (any non-negative
    *                    integer column)
    * @param orderCol    deterministic within-group order (ties would
    *                    make the offsets engine-dependent, so the
    *                    caller supplies a unique key, typically the
    *                    doc id)
    * @param windowTokens context-window budget in tokens
    * @param groupCols   independent stream per distinct combination;
    *                    empty = one global stream (still fully
    *                    distributed — see scale note above)
    */
  def packWindows(docs: DataFrame, tokenCol: String, orderCol: String,
                  windowTokens: Long,
                  groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive: $windowTokens")
    Rank.keyedPrefixSum(docs, groupCols, Seq(col(orderCol)), tokenCol,
        sumCol = "stream_offset")
      .withColumn("window_id",
        floor(col("stream_offset") / lit(windowTokens)).cast("long"))
  }

  /** Per-window summary of a [[packWindows]] assignment — the frame a
    * batch planner consumes: documents and tokens per window, and the
    * id span for locating the window's members.
    */
  def windowSummary(packed: DataFrame, tokenCol: String, orderCol: String,
                    groupCols: Seq[String]): DataFrame =
    packed.groupBy((groupCols :+ "window_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"))
}
