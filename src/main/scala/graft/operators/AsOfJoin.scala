package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** As-of (latest-before) join — an operator Spark lacks natively.
  *
  * Implemented the scalable way: UNION the two sides tagged by role,
  * hash-partition once on the join key, sort within partitions by
  * event time, and carry the most recent right-side payload forward
  * with `last(..., ignoreNulls)` over an unbounded-preceding window.
  * The payload travels as ONE struct column so legitimately-null
  * payload fields can't bleed across rows.
  *
  * Cost model: ONE shuffle of (left + right), no row-pair explosion —
  * versus the naive join+filter+rank approach whose intermediate is
  * |left| x |matching right| rows. At 100 TB the naive plan is
  * unrunnable for hot keys; this one is a single sort-merge pass.
  *
  * Tie-breaking: right rows at the same timestamp as a left row are
  * visible (<= semantics); among equal-time right rows the highest
  * `rightTiebreak` wins (deterministic).
  */
object AsOfJoin {

  /** @param left          probe side (one output row per input row)
    * @param right         reference side; its latest row at-or-before
    *                      the probe time is attached as `asof_<col>`
    * @param key           equi-join key name (same on both sides)
    * @param leftTime      probe-time column on `left`
    * @param rightTime     effective-time column on `right`
    * @param rightPayload  right columns to attach
    * @param rightTiebreak right column ordering equal-time rows
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightPayload: Seq[String], rightTiebreak: String): DataFrame = {
    require(right.schema(rightTiebreak).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"rightTiebreak '$rightTiebreak' must be numeric " +
        s"(got ${right.schema(rightTiebreak).dataType.simpleString}); " +
        "a silent cast would null it and make tie resolution nondeterministic")
    val leftCols = left.columns.toSeq
    val payloadType = StructType(rightPayload.map(c => right.schema(c)))
    // type-dependent tiebreak cast: integral types keep long (a double
    // would collapse distinct 64-bit ids above 2^53), fractional types
    // keep double (a long would truncate 1.7 and 1.3 both to 1) —
    // either collapse makes equal-time resolution nondeterministic
    val tbType = right.schema(rightTiebreak).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => "long"
      case _ => "double"
    }

    val lAligned = left
      .withColumn("__t", col(leftTime))
      .withColumn("__right", lit(0))
      .withColumn("__tb", lit(null).cast(tbType))
      .withColumn("__r", lit(null).cast(payloadType))
    val rAligned = leftCols.foldLeft(
      right
        // equi-join semantics: a null key matches nothing, so null-
        // key right rows can never contribute payload (left null-key
        // rows still come through with a null payload). A null
        // rightTime is dropped for the same reason: "latest row
        // at-or-before t" is undefined for a timeless row — without
        // this filter Spark's NULLS-FIRST sort would quietly treat it
        // as before-everything and hand its payload to every probe
        // row with no earlier real match (r15 adversarial rung).
        // Left rows with a null probe time still come through with a
        // null payload (nothing can be at-or-before an unknown time).
        .filter(col(key).isNotNull && col(rightTime).isNotNull)
        .withColumn("__t", col(rightTime))
        .withColumn("__right", lit(1))
        .withColumn("__tb", col(rightTiebreak).cast(tbType))
        .withColumn("__r", struct(rightPayload.map(col): _*))
        .select((Seq("__t", "__right", "__tb", "__r", key)).map(col): _*)) {
      (df, c) =>
        if (c == key) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val shape = Seq(key, "__t", "__right", "__tb", "__r") ++ leftCols.filterNot(_ == key)
    val unioned = lAligned.select(shape.map(col): _*)
      .unionByName(rAligned.select(shape.map(col): _*))

    // At equal __t, right rows (__right=1) sort first => visible to
    // left rows at the same instant; equal-time rights resolve by __tb.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__right").desc, col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__right") === 0)
      .select((leftCols.map(col) ++
        rightPayload.map(c => col(s"__asof.$c").as(s"asof_$c"))): _*)
  }
}
