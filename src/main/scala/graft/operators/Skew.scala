package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins (SURVEY §5). AQE's skew-join split
  * handles most cases at runtime; explicit salting remains the tool
  * when one join key dominates so heavily that even split partitions
  * of it won't fit (the classic "null key" / "megacustomer" shape at
  * 100 TB).
  *
  * Shape: the skewed (large) side gets a random-ish salt in
  * [0, buckets); the small side is replicated `buckets` times; the
  * join key becomes (key, salt). One hot key now spreads over
  * `buckets` reducers.
  */
object Skew {

  /** Salt the large side: adds a `__salt` column derived from a hash
    * of the whole row's partition (cheap, deterministic per row via
    * spark_partition_id + monotonic id mix — NOT the join key, so hot
    * keys spread).
    */
  def saltLarge(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)).cast("int"))

  /** Replicate the small side across all salt values. */
  def replicateSmall(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))

  /** Salted equi-join: equivalent rows to `large.join(small, keys)`
    * but with hot keys spread over `buckets` reducers.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int = 16): DataFrame =
    saltLarge(large, buckets)
      .join(replicateSmall(small, buckets), keys :+ "__salt")
      .drop("__salt")
}
