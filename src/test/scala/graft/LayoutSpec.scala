package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves quantile buckets: grid neighbours get close z-values") {
    // 4x4 grid, one point per cell; bits=2 -> buckets are the cells
    val pts = (for { x <- 0 until 4; y <- 0 until 4 }
      yield (x * 10.0, y * 10.0)).toDF("x", "y")
    val z = pts.withColumn("z", Layout.zValue(pts, Seq("x", "y"), bits = 2))
      .collect().map(r => ((r.getDouble(0) / 10).toInt, (r.getDouble(1) / 10).toInt) -> r.getLong(2))
      .toMap
    // Morton order: all 16 z-values distinct, and the quadrant bit
    // pattern holds — every cell in the lower-left 2x2 quadrant sorts
    // below every cell in the upper-right quadrant
    assert(z.values.toSeq.distinct.size == 16)
    val lowerLeft = for { x <- 0 to 1; y <- 0 to 1 } yield z((x, y))
    val upperRight = for { x <- 2 to 3; y <- 2 to 3 } yield z((x, y))
    assert(lowerLeft.max < upperRight.min)
  }

  test("zValue guards dimensionality and bit budget") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    intercept[IllegalArgumentException] { Layout.zValue(df, Seq("x")) }
    intercept[IllegalArgumentException] { Layout.zValue(df, Seq("x", "y"), bits = 32) }
  }

  test("z-order prunes on EVERY clustered dim; single-col sort fails its off dim") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val zDir = java.nio.file.Files.createTempDirectory("layout_z").toString
    val linDir = java.nio.file.Files.createTempDirectory("layout_lin").toString
    Layout.zorderWrite(li, Seq("l_partkey", "l_suppkey"), zDir, numFiles = 16)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)
    // same logical rows in both layouts
    assert(spark.read.parquet(zDir).count() == li.count())
    def deciles(c: String) = {
      val Array(lo, hi) = li.stat.approxQuantile(c, Array(0.45, 0.55), 0.001)
      Map(c -> (lo, hi))
    }
    val (zTot, zSkipP) = Layout.skippableFiles(spark, zDir, deciles("l_partkey"))
    val (_, zSkipS) = Layout.skippableFiles(spark, zDir, deciles("l_suppkey"))
    val (lTot, lSkipP) = Layout.skippableFiles(spark, linDir, deciles("l_partkey"))
    val (_, lSkipS) = Layout.skippableFiles(spark, linDir, deciles("l_suppkey"))
    assert(zTot == 16 && lTot == 16)
    // the single-column sort is perfect on its own column and useless
    // on the other: every file spans the whole suppkey domain
    assert(lSkipP >= 12, s"linear partkey skip $lSkipP")
    assert(lSkipS == 0, s"linear suppkey skip $lSkipS")
    // z-order prunes BOTH dims; the worst dim decides mixed-workload
    // cost, so compare minima
    assert(zSkipP >= 4 && zSkipS >= 4, s"z skips: partkey $zSkipP suppkey $zSkipS")
    assert(math.min(zSkipP, zSkipS) > math.min(lSkipP, lSkipS))
  }

  test("compact merges a shattered directory to the target file count, conserving rows") {
    val docs = Tables.documents(spark, sf0001)
    val smallDir = java.nio.file.Files.createTempDirectory("graft_cs").toString
    docs.repartition(32).write.mode("overwrite").parquet(smallDir)
    val outDir = java.nio.file.Files.createTempDirectory("graft_co").toString
    val stats = Layout.compact(spark, smallDir, outDir, targetFileBytes = 1L << 20)
    assert(stats.filesIn == 32, stats.toString)
    // 50 tiny docs fit one 1 MB target file
    assert(stats.filesOut == 1, stats.toString)
    assert(stats.bytesOut > 0)
    val before = docs.select("doc_id").as[Long].collect().sorted.toSeq
    val after = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after == before, "compaction changed the row set")
  }

  test("compact derives the output count from listed bytes (multi-file when over target)") {
    val docs = Tables.documents(spark, sf0001)
    val smallDir = java.nio.file.Files.createTempDirectory("graft_cs2").toString
    docs.repartition(8).write.mode("overwrite").parquet(smallDir)
    // absurdly small target: every output file capped at 4 KB of input
    val outDir = java.nio.file.Files.createTempDirectory("graft_co2").toString
    val stats = Layout.compact(spark, smallDir, outDir, targetFileBytes = 4096)
    assert(stats.filesOut > 1 && stats.filesOut <= 8, stats.toString)
  }

  test("compact refuses an empty directory loudly") {
    val empty = java.nio.file.Files.createTempDirectory("graft_ce").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ceo").toString
    val e = intercept[IllegalArgumentException] {
      Layout.compact(spark, empty, out)
    }
    assert(e.getMessage.contains("no data files"))
  }

  test("null values in a clustered column land in bucket 0 and do not crash") {
    val df = Seq((Some(1.0), 1.0), (None, 2.0), (Some(3.0), 3.0))
      .toDF("x", "y")
    val z = df.withColumn("z", Layout.zValue(df, Seq("x", "y"), bits = 2))
      .collect()
    assert(z.length == 3) // no NPE; null x contributes 0 bits
  }
}
