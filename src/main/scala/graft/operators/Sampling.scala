package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes. A training corpus
  * is assembled by DOWN-weighting over-represented sources and
  * up-keeping scarce ones; the sampling must be reproducible across
  * runs, engines and partitionings or the mix is unauditable.
  *
  * Mechanism: a row is kept when the first 8 hex digits of
  * md5(salt || key) sort lexicographically below the rate's 8-digit
  * hex threshold (fixed-width lowercase hex, so string order ==
  * numeric order). Pure row-local expression: no shuffle, no RNG
  * state, identical decisions on any cluster layout — and replicable
  * verbatim in ANSI SQL (DuckDB's md5 matches Spark's), so the
  * driver oracle verifies the exact kept set, not just its size.
  */
object Sampling {

  /** 8-hex-digit threshold for a rate in [0, 1]. "g" sorts above
    * every hex digit, making rate 1.0 keep all rows.
    */
  private[operators] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    if (rate >= 1.0) "g" else f"${(rate * 4294967296.0).toLong}%08x"
  }

  private def hashPrefix(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** Uniform deterministic sample at `rate`. */
  def deterministic(df: DataFrame, keyCol: String, rate: Double,
                    salt: String = "graft"): DataFrame =
    df.filter(hashPrefix(col(keyCol), salt) < lit(thresholdHex(rate)))

  /** Per-stratum deterministic rates — the data-mixing primitive:
    * strata absent from `rates` keep `defaultRate`.
    */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
                 rates: Map[String, Double], defaultRate: Double = 1.0,
                 salt: String = "graft"): DataFrame = {
    val thresholdCol = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(thresholdHex(defaultRate))) { case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(thresholdHex(r))).otherwise(acc)
      }
    df.filter(hashPrefix(col(keyCol), salt) < thresholdCol)
  }
}
