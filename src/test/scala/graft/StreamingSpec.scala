package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.StreamIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("file stream ingests a CSV drop zone and cleans names") {
    val drop = Files.createTempDirectory("drop").toString
    val out = Files.createTempDirectory("memout").toString
    Files.writeString(java.nio.file.Paths.get(s"$drop/f1.csv"),
      "Order Key!,Total Price ($)\n1,9.99\n2,5.00\n")
    val schema = StructType(Seq(
      StructField("Order Key!", StringType), StructField("Total Price ($)", StringType)))
    val stream = StreamIngest.fileStream(spark, drop, schema)
    assert(stream.isStreaming)
    assert(stream.columns.toSeq.take(2) == Seq("order_key", "total_price"))
    val q = stream.writeStream
      .format("memory").queryName("ingested")
      .option("checkpointLocation", s"$out/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql("SELECT order_key, total_price FROM ingested ORDER BY order_key")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("1", "9.99"), ("2", "5.00")))
  }

  test("backfill catch-up: drains the backlog, self-terminates, second run takes only new files") {
    val drop = Files.createTempDirectory("drop_backfill").toString
    val out = Files.createTempDirectory("backfill_out").toString
    val cp = Files.createTempDirectory("backfill_cp").toString
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("v", StringType)))
    (1 to 3).foreach(i =>
      Files.writeString(java.nio.file.Paths.get(s"$drop/f$i.csv"),
        s"id,v\n${i}a,1\n${i}b,2\n"))
    // maxFilesPerTrigger=1: the 3-file backlog must drain across
    // multiple micro-batches, not one giant batch
    val first = StreamIngest.backfillOnce(spark, drop, schema,
      s"$out/data", s"$cp/c", maxFilesPerTrigger = 1)
    assert(first == 6L, s"first pass ingested $first rows")
    assert(spark.read.parquet(s"$out/data").count() == 6)
    // nothing new: a rerun ingests zero (checkpointed file set)
    val rerun = StreamIngest.backfillOnce(spark, drop, schema,
      s"$out/data", s"$cp/c", maxFilesPerTrigger = 1)
    assert(rerun == 0L, s"rerun ingested $rerun rows")
    // one late file: only IT is picked up
    Files.writeString(java.nio.file.Paths.get(s"$drop/f4.csv"), "id,v\n4a,9\n")
    val second = StreamIngest.backfillOnce(spark, drop, schema,
      s"$out/data", s"$cp/c", maxFilesPerTrigger = 1)
    assert(second == 1L, s"second pass ingested $second rows")
    val ids = spark.read.parquet(s"$out/data")
      .select("id").as[String].collect().sorted.toSeq
    assert(ids == Seq("1a", "1b", "2a", "2b", "3a", "3b", "4a"))
  }

  test("gated routed sink: file gates reject junk, rejects land in the log") {
    val drop = Files.createTempDirectory("drop_gated").toString
    val out = Files.createTempDirectory("gated_out").toString
    val cp = Files.createTempDirectory("gated_cp").toString
    val rejectDir = s"$out/rejects"
    // routes via the config fixture's /src2/ (public.fact_sales)
    Files.createDirectories(java.nio.file.Paths.get(s"$drop/src2"))
    Files.writeString(java.nio.file.Paths.get(s"$drop/src2/good.csv"),
      "Order Key!,Total Price ($)\n1,9.99\n2,5.00\n")
    // oversized under the test-scale cap: its rows must NOT be routed
    Files.writeString(java.nio.file.Paths.get(s"$drop/src2/oversized.csv"),
      "Order Key!,Total Price ($)\n" + "9,1.00\n" * 60)
    // headerless: first line has a blank field
    Files.writeString(java.nio.file.Paths.get(s"$drop/src2/headerless.csv"),
      "a,,c\n7,1,2\n")
    // zero-byte file: contributes NO rows to the batch, so only the
    // source-checkpoint-log path can surface it for the empty_file gate
    Files.writeString(java.nio.file.Paths.get(s"$drop/src2/empty.csv"), "")
    val cfg = PipelineConfig.parseYaml(graft.queries.EtlQueries.configYaml)
    val gatedCfg = cfg.copy(quality = cfg.quality.copy(maxFileSizeMb = Some(0.0002)))
    val schema = StructType(Seq(
      StructField("Order Key!", StringType), StructField("Total Price ($)", StringType)))
    val stream = StreamIngest.fileStream(spark, s"$drop/*/*.csv", schema)
    StreamIngest.runOnce(StreamIngest.gatedRoutedSink(
      stream, s"$out/routed", s"$cp/c1", gatedCfg, rejectDir))
    val routed = spark.read.parquet(s"$out/routed/batch=0")
    assert(routed.select("target").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("public.fact_sales"))
    // only the good file's two rows survive the gate
    assert(routed.count() == 2,
      routed.select("order_key", "__source_file").collect().mkString(", "))
    val rejects = spark.read.parquet(rejectDir)
      .select("source_name", "error_message", "status")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rejects == Set(
      ("oversized.csv", "file_too_large", "error"),
      ("headerless.csv", "missing_header", "error"),
      ("empty.csv", "empty_file", "error")))
  }

  test("write-stability staging: partial files never reach the stream, complete ones do") {
    val landing = Files.createTempDirectory("drop_landing").toString
    val stage = Files.createTempDirectory("drop_stage").toString + "/watched"
    val out = Files.createTempDirectory("stable_out").toString
    val cp = Files.createTempDirectory("stable_cp").toString
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("v", StringType)))
    Files.writeString(java.nio.file.Paths.get(s"$landing/done.csv"),
      "id,v\n1,a\n2,b\n")
    // a producer writing in place: the file is mid-write during pass 1
    val growing = java.nio.file.Paths.get(s"$landing/slow.csv")
    Files.writeString(growing, "id,v\n3,partial")
    def drain(): Unit = {
      val q = StreamIngest.fileStream(spark, stage, schema)
        .select(col("id"), col("v")).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // pass 1: the growing file stays in landing; the stream ingests
    // only the complete file — no partial row is ever committed
    graft.sources.Sources.stableStagingPass(spark, landing, stage,
      stableMillis = 1,
      onWindow = () => Files.writeString(growing, "_resumed,x\n",
        java.nio.file.StandardOpenOption.APPEND))
    drain()
    val afterPass1 = spark.read.parquet(out).select("id").as[String]
      .collect().sorted.toSeq
    assert(afterPass1 == Seq("1", "2"), s"partial rows leaked: $afterPass1")
    // the producer finishes; the next trigger ingests the file COMPLETE
    Files.writeString(growing, "4,c\n",
      java.nio.file.StandardOpenOption.APPEND)
    graft.sources.Sources.stableStagingPass(spark, landing, stage, stableMillis = 1)
    drain()
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("1", "a"), ("2", "b"), ("3", "partial_resumed"), ("4", "c")),
      s"expected the slow file whole on the second trigger: $rows")
  }

  test("gated routed sink logs a warning row when the source log degrades") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("degraded_out").toString
    val cp = Files.createTempDirectory("degraded_cp").toString
    val rejectDir = s"$out/rejects"
    // a real readable file so the row-derived gate path still works
    val drop = Files.createTempDirectory("degraded_drop").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$drop/src2"))
    Files.writeString(java.nio.file.Paths.get(s"$drop/src2/good.csv"), "a,b\n1,2\n")
    // corrupt the file-source metadata log BEFORE the run: reading it
    // throws, the gate degrades to row-derived files, and the sink
    // must say so in the reject log instead of staying silent
    Files.createDirectories(java.nio.file.Paths.get(s"$cp/sources/0"))
    Files.writeString(java.nio.file.Paths.get(s"$cp/sources/0/0"), "not a metadata log")
    val cfg = PipelineConfig.parseYaml(graft.queries.EtlQueries.configYaml)
    val in = MemoryStream[String]
    in.addData(s"file:$drop/src2/good.csv")
    val stream = in.toDF().toDF("__source_file")
      .withColumn("order_key", lit("1"))
    StreamIngest.runOnce(StreamIngest.gatedRoutedSink(
      stream, s"$out/routed", cp, cfg, rejectDir))
    val audit = spark.read.parquet(rejectDir)
      .select("status", "error_message", "source_name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(audit.exists { case (st, msg, src) =>
      st == "warning" && msg.startsWith("source_log_unavailable") &&
        src == "<file source log>"
    }, s"degradation must land in the reject log, got: $audit")
    // the batch itself still routed (degraded, not failed)
    assert(spark.read.parquet(s"$out/routed").count() == 1)
  }

  test("watermarked tumbling window counts per type") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click"),
      (Timestamp.valueOf("2024-01-01 10:40:00"), "click"),
      (Timestamp.valueOf("2024-01-01 11:10:00"), "view"))
    val counts = StreamIngest.windowedCounts(
      mem.toDF().toDF("ts", "event_type"), "ts", "event_type")
    val q = counts.writeStream
      .format("memory").queryName("wc").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT window_start, event_type, n FROM wc ORDER BY 1, 2")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01 10:00:00.0", "click", 2L),
      ("2024-01-01 11:00:00.0", "view", 1L)))
  }

  test("end-to-end reference topology: drop zone -> clean -> JDBC warehouse") {
    val drop = Files.createTempDirectory("drop_jdbc").toString
    val cp = Files.createTempDirectory("cp_jdbc").toString
    Files.writeString(java.nio.file.Paths.get(s"$drop/batch1.csv"),
      "Order Key!,Total Price ($)\n1,9.99\n2,5.00\n3,12.50\n")
    val schema = StructType(Seq(
      StructField("Order Key!", StringType), StructField("Total Price ($)", StringType)))
    val url = "jdbc:derby:memory:graftstream;create=true"
    val stream = StreamIngest.fileStream(spark, drop, schema)
      .select(col("order_key"), col("total_price"))
    StreamIngest.runOnce(StreamIngest.jdbcSink(
      stream, url, "warehouse_orders", "app", "app", cp,
      transform = (df, batchId) => df.withColumn("batch_id", lit(batchId))))
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "warehouse_orders").load()
    assert(back.count() == 3)
    assert(back.columns.toSeq.map(_.toLowerCase).sorted ==
      Seq("batch_id", "order_key", "total_price"))
    // a second file appends (new batch id), nothing replays
    Files.writeString(java.nio.file.Paths.get(s"$drop/batch2.csv"),
      "Order Key!,Total Price ($)\n4,1.00\n")
    StreamIngest.runOnce(StreamIngest.jdbcSink(
      StreamIngest.fileStream(spark, drop, schema)
        .select(col("order_key"), col("total_price")),
      url, "warehouse_orders", "app", "app", cp,
      transform = (df, batchId) => df.withColumn("batch_id", lit(batchId))))
    val all = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "warehouse_orders").load()
    assert(all.count() == 4, "second run must append only the new file's rows")
  }

  test("jdbc upsert sink: replayed batches do not duplicate, updates land") {
    val drop = Files.createTempDirectory("drop_upsert").toString
    val cp = Files.createTempDirectory("cp_upsert").toString
    Files.writeString(java.nio.file.Paths.get(s"$drop/b1.csv"),
      "Order Key!,Total Price ($)\n1,9.99\n2,5.00\n3,1.25\n")
    val schema = StructType(Seq(
      StructField("Order Key!", StringType), StructField("Total Price ($)", StringType)))
    val url = "jdbc:derby:memory:graftupsert;create=true"
    def run(checkpoint: String): Unit =
      StreamIngest.runOnce(StreamIngest.jdbcUpsertSink(
        StreamIngest.fileStream(spark, drop, schema)
          .select(col("order_key"), col("total_price")),
        url, "upsert_target", "upsert_staging", Seq("order_key"),
        "app", "app", checkpoint,
        stagingColumnTypes = Some("order_key VARCHAR(64), total_price VARCHAR(64)")))
    run(s"$cp/c1")
    def readBack() = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "upsert_target").load()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(readBack() == Map("1" -> "9.99", "2" -> "5.00", "3" -> "1.25"))
    // simulate an at-least-once replay: fresh checkpoint reprocesses
    // the same file — merge, not append, so still 3 rows
    run(s"$cp/c2")
    assert(readBack().size == 3, "replay must not duplicate rows")
    // an updated record for an existing key lands as an UPDATE
    Files.writeString(java.nio.file.Paths.get(s"$drop/b2.csv"),
      "Order Key!,Total Price ($)\n2,7.77\n4,3.00\n")
    run(s"$cp/c1") // original checkpoint: only the new file is a new batch
    assert(readBack() == Map(
      "1" -> "9.99", "2" -> "7.77", "3" -> "1.25", "4" -> "3.00"))
    // in-batch duplicate keys collapse to one row (MERGE would insert
    // twice or raise a cardinality violation); null keys are excluded
    Files.writeString(java.nio.file.Paths.get(s"$drop/b3.csv"),
      "Order Key!,Total Price ($)\n5,1.00\n5,2.00\n,9.00\n")
    run(s"$cp/c1")
    val after = readBack()
    assert(after.size == 5, s"dup/null keys must not add extra rows: $after")
    assert(Set("1.00", "2.00").contains(after("5")))
  }

  test("stream-static enrichment joins each micro-batch to a broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "click"), (2L, "view"), (3L, "click"))
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "user_name")
    val enriched = StreamIngest.enrichWithDim(
      mem.toDF().toDF("user_id", "event_type"), dim, Seq("user_id"))
    val q = enriched.writeStream.format("memory").queryName("enriched").start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT user_id, event_type, user_name FROM enriched ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // inner join: user 3 has no dim row and drops out
    assert(got == Seq((1L, "click", "alice"), (2L, "view", "bob")))
  }

  test("stream-stream join matches within the event-time band only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    imps.addData(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (3L, Timestamp.valueOf("2024-01-01 10:00:00")))
    clicks.addData(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00")),  // in band
      (2L, Timestamp.valueOf("2024-01-01 11:30:00")),  // past maxDelay
      (4L, Timestamp.valueOf("2024-01-01 10:02:00")))  // no impression
    val joined = StreamIngest.streamStreamJoin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("click_ad", "click_ts"),
      "ad_id", "click_ad", "imp_ts", "click_ts",
      watermark = "1 hour", maxDelay = "15 minutes")
    val q = joined.writeStream.format("memory").queryName("attributed").start()
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT ad_id FROM attributed").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), s"only the in-band click should attribute: $got")
  }

  test("archive option moves ingested files out of the drop zone after commit") {
    val drop = Files.createTempDirectory("drop_arch").toString
    val archive = Files.createTempDirectory("archive_arch").toString
    val cp = Files.createTempDirectory("cp_arch").toString
    val out = Files.createTempDirectory("out_arch").toString
    val f1 = java.nio.file.Paths.get(s"$drop/first.csv")
    Files.writeString(f1, "amount\n1\n2\n")
    val schema = StructType(Seq(StructField("amount", StringType)))
    // parquet sink: supports checkpoint recovery across runs (the
    // memory sink does not), so the second AvailableNow run resumes
    // the same source state
    def runBatch(): Unit = {
      val stream = StreamIngest.fileStream(spark, drop, schema,
        archiveDir = Some(archive))
      val q = stream.select(col("amount")).writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runBatch()
    // archiving runs on the source's cleaner thread after the batch
    // commits; a second micro-batch run gives it a chance to fire and
    // proves the moved file is not re-ingested
    Files.writeString(java.nio.file.Paths.get(s"$drop/second.csv"), "amount\n3\n")
    runBatch()
    import scala.jdk.CollectionConverters._
    def archivedFiles(): List[String] = {
      val s = Files.walk(java.nio.file.Paths.get(archive))
      try s.filter(Files.isRegularFile(_)).iterator().asScala.map(_.toString).toList
      finally s.close()
    }
    val deadline = System.currentTimeMillis() + 30000
    while ((Files.exists(f1) || archivedFiles().isEmpty) &&
           System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(!Files.exists(f1), "first.csv should have moved out of the drop zone")
    assert(archivedFiles().exists(_.endsWith("first.csv")),
      s"expected first.csv under $archive, found: ${archivedFiles()}")
    // both files ingested exactly once across the two runs (checkpoint
    // + archive together give effective-once ingestion)
    val got = spark.read.parquet(out).collect().map(_.getString(0)).toSeq.sorted
    assert(got == Seq("1", "2", "3"), s"expected each row exactly once: $got")
  }

  test("routed sink fans a mixed drop into per-table partitions") {
    val drop = Files.createTempDirectory("drop2").toString
    val sink = Files.createTempDirectory("sink2").toString
    val cp = Files.createTempDirectory("cp2").toString
    Files.writeString(java.nio.file.Paths.get(s"$drop/sales_data_jan.csv"),
      "amount\n10\n20\n")
    Files.writeString(java.nio.file.Paths.get(s"$drop/customer_data_a.csv"),
      "amount\n5\n")
    Files.writeString(java.nio.file.Paths.get(s"$drop/ignore_me.csv"),
      "amount\n99\n")
    val schema = StructType(Seq(StructField("amount", StringType)))
    val stream = StreamIngest.fileStream(spark, drop, schema)
    StreamIngest.runOnce(
      StreamIngest.routedSink(stream, "__source_file", sink, cp))
    val got = spark.read.parquet(sink)
      .groupBy("target_table").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("fact_sales" -> 2L, "dim_customers" -> 1L))
  }

  test("IVF append sink: appends visible to probes, skew monitor fires the retrain flag (r11)") {
    import graft.operators.Ann
    import org.apache.spark.sql.functions.col
    val embs = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val idx = Files.createTempDirectory("ivfs_idx").toString
    Ann.buildIvfIndex(embs, "vec_id", "embedding", idx, nlist = 4)
    val drop = Files.createTempDirectory("ivfs_drop").toString
    val metrics = Files.createTempDirectory("ivfs_m").toString
    val cp = Files.createTempDirectory("ivfs_cp").toString
    val stream = spark.readStream.schema(embs.schema).parquet(drop)
    val sink = StreamIngest.ivfAppendSink(stream, "vec_id", "embedding",
      idx, metrics, cp) // default trigger: 3/nlist = 0.75
    // the parquet file source lists files at the drop root (no
    // recursion) — stage each batch and move its part file in
    def dropFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("ivfs_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$drop/$name.parquet"))
    }
    // batch 0: 10 ordinary vectors under fresh ids — skew unchanged
    dropFile(embs.orderBy(col("vec_id")).limit(10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")),
      "b0")
    StreamIngest.runOnce(sink)
    val m0 = spark.read.parquet(s"$metrics/batch=0").collect().head
    assert(m0.getAs[Long]("n_appended") == 10L)
    assert(m0.getAs[Long]("n_indexed") == 510L)
    assert(!m0.getAs[Boolean]("retrain_due"),
      s"baseline skew must not fire: $m0")
    // batch 1: a 2000-copy clump of one direction — one frozen list
    // swallows it all and crosses the 0.75 trigger share
    val clump = embs.orderBy(col("vec_id")).limit(1)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.sequence(
          org.apache.spark.sql.functions.lit(1L),
          org.apache.spark.sql.functions.lit(2000L))).as("i"),
        col("embedding"))
      .select((col("i") + 2000000L).as("vec_id"), col("embedding"))
    dropFile(clump, "b1")
    StreamIngest.runOnce(sink)
    val m1 = spark.read.parquet(s"$metrics/batch=1").collect().head
    assert(m1.getAs[Long]("n_appended") == 2000L)
    assert(m1.getAs[Long]("n_indexed") == 2510L)
    assert(m1.getAs[Boolean]("retrain_due"),
      s"2000-copy clump must fire the skew trigger: $m1")
    // appended vectors are probeable against the frozen quantizer
    val q = clump.limit(1)
    val hit = Ann.ivfIndexTopK(spark, idx, q, "vec_id", "embedding",
        k = 1, nprobe = 4)
      .collect().head
    assert(hit.getDouble(1) == 1.0, s"appended clump must self-match: $hit")
  }

  test("topic router: best-topic routing, unmatched floor, frozen stats across batches (r12)") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("topic_out").toString
    val cp = Files.createTempDirectory("topic_cp").toString
    // reference corpus: every taxonomy term occurs, with different df
    val ref = Seq(
      "spark shuffle join runs fast", "spark join plans well",
      "shuffle bytes dominate cost", "image pixel grids decode",
      "audio frames resample", "image audio pipelines",
      "plain filler text here", "more filler words again"
    ).toDF("text")
    val topics = Seq(
      "dataeng" -> Seq("spark", "shuffle", "join"),
      "media" -> Seq("image", "audio", "pixel"))
    def sink(s: org.apache.spark.sql.DataFrame) =
      StreamIngest.topicRouteSink(s, "doc_id", "text", ref, "text",
        topics, minScoreE6 = 100000L, out, cp)
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "spark shuffle join ahead"), (2L, "image audio pixel show"),
      (3L, "completely unrelated babble"))
    StreamIngest.runOnce(sink(in.toDF().toDF("doc_id", "text")))
    // second batch re-sends doc 1's text under a new id: FROZEN stats
    // must give it the identical score in a later batch
    in.addData((4L, "spark shuffle join ahead"))
    StreamIngest.runOnce(sink(in.toDF().toDF("doc_id", "text")))
    val b0 = spark.read.parquet(s"$out/batch=0")
      .collect().map(r => (r.getLong(0), r.getAs[String]("topic"), r.getAs[Long]("score_e6"))).toSeq
    val b1 = spark.read.parquet(s"$out/batch=1")
      .collect().map(r => (r.getLong(0), r.getAs[String]("topic"), r.getAs[Long]("score_e6"))).toSeq
    val byId = (b0 ++ b1).map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(1L)._1 == "dataeng", s"doc 1 routed to ${byId(1L)}")
    assert(byId(2L)._1 == "media", s"doc 2 routed to ${byId(2L)}")
    assert(byId(3L)._1 == "unmatched" && byId(3L)._2 == 0L)
    assert(byId(4L) == byId(1L),
      s"frozen stats must score replayed text identically: ${byId(4L)} vs ${byId(1L)}")
    // reserved name and taxonomy-size preconditions are loud
    intercept[IllegalArgumentException] {
      StreamIngest.topicRouteSink(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", ref, "text",
        Seq("unmatched" -> Seq("x")), 0L, out, cp)
    }
  }

  test("topic router: refresh-due metric flags df-rate drift while the " +
      "routing itself stays frozen (r14 ask #8)") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("topic_drift_out").toString
    val cp = Files.createTempDirectory("topic_drift_cp").toString
    val md = Files.createTempDirectory("topic_drift_md").toString
    val ref = Seq(
      "spark shuffle join runs fast", "spark join plans well",
      "shuffle bytes dominate cost", "image pixel grids decode",
      "audio frames resample", "image audio pipelines",
      "plain filler text here", "more filler words again"
    ).toDF("text")
    val topics = Seq(
      "dataeng" -> Seq("spark", "shuffle", "join"),
      "media" -> Seq("image", "audio", "pixel"))
    def sink(s: org.apache.spark.sql.DataFrame) =
      StreamIngest.topicRouteSink(s, "doc_id", "text", ref, "text",
        topics, minScoreE6 = 100000L, out, cp,
        metricsDir = Some(md))
    val in = MemoryStream[(Long, String)]
    // batch 0 IS the reference distribution (the same 8 texts): every
    // term's batch df-rate equals its reference rate, drift 0
    in.addData(
      (1L, "spark shuffle join runs fast"), (2L, "spark join plans well"),
      (3L, "shuffle bytes dominate cost"), (4L, "image pixel grids decode"),
      (5L, "audio frames resample"), (6L, "image audio pipelines"),
      (7L, "plain filler text here"), (8L, "more filler words again"))
    StreamIngest.runOnce(sink(in.toDF().toDF("doc_id", "text")))
    // batch 1 is a SHIFTED corpus: every doc is term-saturated, the
    // df-rate of every shared term jumps to 1.0 vs the reference's
    // fractional rates — the metric must flag, the routing must not
    // change its contract (same frozen stats, same scores for same
    // text as ever)
    in.addData((10L, "spark shuffle join image audio pixel"),
      (11L, "spark shuffle join image audio pixel"),
      (12L, "spark shuffle join image audio pixel"))
    StreamIngest.runOnce(sink(in.toDF().toDF("doc_id", "text")))
    val m0 = spark.read.parquet(s"$md/batch=0").collect().head
    val m1 = spark.read.parquet(s"$md/batch=1").collect().head
    assert(!m0.getAs[Boolean]("refresh_due"),
      s"reference-shaped batch flagged: $m0")
    assert(m1.getAs[Boolean]("refresh_due"),
      s"saturated batch not flagged: $m1")
    assert(m1.getAs[Long]("df_drift_e6") > m0.getAs[Long]("df_drift_e6"))
    // frozen routing: identical text scores identically across the
    // drift boundary (docs 10-12 are one text, one score, one topic)
    val b1 = spark.read.parquet(s"$out/batch=1")
      .collect().map(r => (r.getAs[String]("topic"), r.getAs[Long]("score_e6")))
      .toSet
    assert(b1.size == 1, s"identical texts diverged: $b1")
  }
}
