package graft.queries

import graft.Tables
import graft.operators.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout surface: Z-order clustering demo over lineitem.
  * No SQL oracle — the subject is file LAYOUT (which parquet files a
  * footer-pruned scan could skip), which DuckDB over the same logical
  * rows cannot express; LayoutSpec carries the strong assertions.
  */
object LayoutQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Written layouts are built once per (data dir, JVM) — the same
    * memoized-fixture pattern as the stored ANN indexes (per-query
    * construction would leak temp dirs and put the rewrite inside the
    * bench's timed window).
    */
  private val layoutCache = scala.collection.mutable.Map.empty[String, (String, String)]
  private def layoutDirs(s: SparkSession, d: String): (String, String) =
    layoutCache.synchronized {
      layoutCache.getOrElseUpdate(d, {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_quantity"), col("l_extendedprice"))
        val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
        Layout.zorderWrite(li, Seq("l_partkey", "l_suppkey"), zDir, numFiles = 16)
        // the single-column-sort strawman every warehouse starts from:
        // tight l_partkey spans per file, l_suppkey spans the domain
        val linDir = java.nio.file.Files.createTempDirectory("graft_linear").toString
        li.repartitionByRange(16, col("l_partkey"))
          .sortWithinPartitions("l_partkey")
          .write.mode("overwrite").parquet(linDir)
        (zDir, linDir)
      })
    }

  val queries: Map[String, Q] = Map(
    // The mixed-workload trade in numbers: a middle-decile filter on
    // EACH clustered column separately. The partkey-sorted layout
    // prunes partkey filters perfectly and suppkey filters not at
    // all (every file spans the whole suppkey domain); z-order prunes
    // substantially on BOTH — the worst-case dimension is what
    // decides scan cost when queries arrive on either column.
    "layout_zorder" -> ((s, d) => {
      import s.implicits._
      val (zDir, linDir) = layoutDirs(s, d)
      val li = Tables.lineitem(s, d)
      val cols = Seq("l_partkey", "l_suppkey")
      val dims = cols.zip(
        li.stat.approxQuantile(cols.toArray, Array(0.45, 0.55), 0.001)
          .map { case Array(lo, hi) => (lo, hi) })
      val rows = for {
        (layout, dir) <- Seq(("linear_partkey", linDir), ("zorder", zDir))
        (dim, span) <- dims
      } yield {
        val (total, skip) = Layout.skippableFiles(s, dir, Map(dim -> span))
        (layout, dim, total, skip)
      }
      rows.toDF("layout", "filter_dim", "n_files", "n_skippable")
        .orderBy(col("layout"), col("filter_dim"))
    }))

  val oracles: Map[String, String] = Map.empty
}
