package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-decimal monetary aggregation.
  *
  * Every monetary column the generator produces (l_extendedprice,
  * l_discount, o_totalprice, p_retailprice, c_acctbal/s_acctbal,
  * events.value) is a 2-decimal value stored as a DOUBLE (measured:
  * max |x*100 - round(x*100)| <= 4e-9 across all tables — pure
  * representation noise). Summing those doubles directly is
  * ORDER-DEPENDENT: float addition is non-associative, the shuffle
  * merge order differs between engines (and between runs of the same
  * engine), and once the accumulated ulp error reaches the half-cent
  * rounding boundary the displayed 2dp value flips. That is not a
  * hypothetical: the r12 cross-rung ORACLE run at testdata-sf10 (10x
  * the driver gate rung) failed q5/q7/q9 by exactly one final cent
  * (49268620.9 vs .89) and changed q15's revenue-tie set — sums of
  * ~1e8 over ~6M rows sit past the boundary where sqrt(n)*ulp noise
  * reaches 0.005. Passing at the driver rung was luck, not margin.
  *
  * The fix is TPC-H's own: the spec types money as DECIMAL(15,2),
  * not FLOAT. Casting the 2dp doubles to decimal snaps them exactly
  * (residuals are 9 orders of magnitude below the half-ulp), and
  * decimal sums are exact integer arithmetic — associative, so
  * merge-order-free, identical in Spark and DuckDB at EVERY scale.
  * The final value casts back to double for a stable output schema;
  * a 2dp decimal up to ~1e11 converts exactly.
  *
  * Scale note: Spark sums decimals in whole-stage codegen with a
  * bounded-precision accumulator — still a map-side partial
  * aggregate, same shuffle shape, no plan change (PLAN_HASHES
  * confirmed no drift). The per-row cost over double sums is noise
  * against the scans/joins that dominate these queries.
  */
object Money {
  /** Snap a 2dp monetary double column to exact DECIMAL(18,2). */
  def m(c: Column): Column = c.cast("decimal(18,2)")

  /** `price * (1 - discount)` in exact decimal (scale 4). */
  def discounted(price: Column, discount: Column): Column =
    m(price) * (lit(1).cast("decimal(3,2)") - discount.cast("decimal(3,2)"))

  /** `round(sum(expr), dp)` as an exact decimal sum, output double. */
  def rsum(c: Column, dp: Int = 2): Column =
    round(sum(c), dp).cast("double")

  /** The common `round(sum(m(col)), 2)` single-column money sum. */
  def msum(c: Column, dp: Int = 2): Column = rsum(m(c), dp)
}
