package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT: Z-order (Morton) clustering, so a
  * scan filtered on ANY of the clustered columns skips most files via
  * parquet footer min/max stats. Sorting by a single column makes
  * that column's ranges tight per file but leaves every other
  * column's range spanning the whole domain; interleaving the bits of
  * quantile-bucketed column values gives every clustered column
  * locality at once — the standard lakehouse layout for
  * multi-dimensional point/range lookups over data too large to
  * index. The trade is explicit: on a filter over the single sorted
  * column a plain sort prunes best; z-order is for the MIXED
  * workload, where queries arrive filtered on any one of (or several
  * of) the clustered columns and the worst-case dimension decides
  * scan cost.
  *
  * Everything is built from codegen'd builtin expressions: the
  * quantile bucketing is a fold over a boundary-array literal, the
  * bit interleave is shift/mask arithmetic. The only driver work is
  * one `approxQuantile` pass (bounded: `2^bits - 1` doubles per
  * column) to learn boundaries — the same sketch a warehouse keeps in
  * table stats; quantile bucketing (rather than min/max linear
  * scaling) keeps the grid occupancy uniform under skew.
  *
  * At 100 TB: `zorderWrite`'s range partition on the z-value is one
  * shuffle; each output task writes one z-contiguous file. Re-cluster
  * cadence is an operational choice (the layout degrades as appends
  * arrive, like any clustered table).
  */
object Layout {

  /** Quantile boundaries for every column in ONE sketch pass
    * (`2^bits - 1` interior cut points each): the multi-column
    * `approxQuantile` overload scans the frame once for all columns,
    * where per-column calls would pay D full scans.
    */
  private def boundaries(df: DataFrame, cols: Seq[String],
                         bits: Int): Seq[Array[Double]] = {
    val n = (1 << bits) - 1
    val probs = (1 to n).map(_.toDouble / (1 << bits)).toArray
    df.stat.approxQuantile(cols.toArray, probs, 0.001).toSeq
  }

  /** Bucket index of `c` in [0, 2^bits): the number of boundaries
    * STRICTLY below the value, as a fold over the boundary-array
    * literal (codegen'd; no UDF, no join). Strict comparison matters
    * for discrete columns: duplicated values make quantile boundaries
    * coincide with the values themselves, and `>=` would merge a
    * boundary value with the bucket above it.
    */
  private def bucketExpr(c: Column, bs: Array[Double]): Column =
    aggregate(lit(bs), lit(0),
      (acc, b) => acc + when(c.cast("double") > b, 1).otherwise(0))

  /** Morton interleave of per-column bucket indexes: bit i of
    * dimension d lands at position `i * D + d`. Pure shift/mask
    * column arithmetic, bits*D <= 63.
    */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val d = buckets.length
    val terms = for {
      i <- 0 until bits
      (b, dim) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)),
      i * d + dim)
    terms.reduce(_ + _)
  }

  /** The z-value column for `cols`, learning quantile grids from the
    * frame itself. Null values sort to bucket 0 (below every
    * boundary, since null comparisons are false).
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.size >= 2, "z-ordering one column is just a sort")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits overflows a long z-value")
    val bs = boundaries(df, cols, bits)
    interleave(cols.zip(bs).map { case (c, b) => bucketExpr(col(c), b) }, bits)
  }

  /** Rewrite `df` as `numFiles` parquet files clustered by the
    * z-order of `cols`: range-partition on the z-value (one shuffle;
    * RangePartitioner's reservoir sample is seeded, so the layout is
    * reproducible), sort within each partition, write. Each file
    * covers a contiguous z-range, so its footer min/max on EVERY
    * clustered column spans ~1/numFiles^(1/D) of that column's
    * domain.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  numFiles: Int, bits: Int = 8): Unit =
    df.withColumn("__z", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Before/after footprint of a [[compact]] run. */
  final case class CompactionStats(filesIn: Long, bytesIn: Long,
                                   filesOut: Long, bytesOut: Long)

  /** Small-file compaction — the maintenance pass every streaming
    * sink needs: a file-source stream committing a batch per trigger
    * leaves thousands of KB-sized parquet files, and at 100 TB the
    * scan cost of a table is dominated by file-open/footer overhead
    * long before data volume. Rewrites `inPath` into
    * ~`targetFileBytes` files: the output file count derives from the
    * LISTED on-disk bytes (no data scan), and the rewrite is a
    * `coalesce` — merging adjacent scan partitions without a shuffle,
    * which is the point: compaction moves every byte once, through
    * no exchange.
    *
    * Flat directories only (a hive-partitioned table compacts per
    * partition directory — run one pass per partition, which also
    * keeps each rewrite's failure domain small).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetFileBytes: Long = 128L << 20): CompactionStats = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    def dataFiles(dir: String): Array[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    }
    val in = dataFiles(inPath)
    require(in.nonEmpty, s"$inPath has no data files to compact")
    val bytesIn = in.map(_.getLen).sum
    val nOut = math.max(1L, (bytesIn + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    val out = dataFiles(outPath)
    CompactionStats(in.length.toLong, bytesIn, out.length.toLong, out.map(_.getLen).sum)
  }

  /** Per-file min/max spans of `cols` under `path` — the same stats a
    * parquet reader's footer pruning consults, surfaced as a frame so
    * layouts can be audited (and asserted on in specs). One row per
    * file: (file, n_rows, <c>_min, <c>_max ...).
    */
  def fileSpans(spark: org.apache.spark.sql.SparkSession, path: String,
                cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** How many of `path`'s files a conjunctive box filter
    * `lo(c) <= c <= hi(c)` could skip on footer stats alone:
    * files whose [min, max] span misses the box on ANY clustered
    * column. Returns (n_files, n_skippable).
    */
  def skippableFiles(spark: org.apache.spark.sql.SparkSession, path: String,
                     box: Map[String, (Double, Double)]): (Long, Long) = {
    val spans = fileSpans(spark, path, box.keys.toSeq)
    val overlaps = box.map { case (c, (lo, hi)) =>
      col(s"${c}_max").cast("double") >= lo && col(s"${c}_min").cast("double") <= hi
    }.reduce(_ && _)
    // both counts in one action — two would re-scan the dir per call
    val r = spans.agg(count(lit(1)).as("n"),
      sum(when(overlaps, 1L).otherwise(0L)).as("hit")).head()
    val total = r.getLong(0)
    (total, total - r.getLong(1))
  }
}
