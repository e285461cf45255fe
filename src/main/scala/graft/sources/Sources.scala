package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Batch file sources mirroring the reference's ingestion formats
  * (pattern_based_cleaner_watcher.py:163-193: CSV with encoding
  * fallbacks, Excel; plus JSONL and parquet for the lake side).
  *
  * All readers return plain DataFrames so Catalyst keeps pushdown;
  * schemas can be supplied to skip inference (at 100 TB schema
  * inference means an extra full scan — always pass one in
  * production).
  */
object Sources {

  /** CSV with header handling and charset control, for a drop zone
    * with one KNOWN encoding. For mixed/unknown per-file encodings
    * (the reference's fallback-chain scenario) use
    * [[csvAutoCharset]], which detects each file's charset.
    */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
          charset: String = "UTF-8", delimiter: String = ","): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("charset", charset)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
    withSchema(base, schema).csv(path)
  }

  /** CSV ingestion for a drop zone with MIXED (unknown, per-file)
    * encodings — the exact scenario the reference's fallback chain
    * codes for (pattern_based_cleaner_watcher.py:170-178: utf-8 →
    * utf-8-sig → latin1 → cp1252). A single spark.read can decode
    * with only one charset, so mis-encoded files would corrupt
    * silently; instead each file's charset is detected from a prefix
    * (BOM, then strict UTF-8 validation), files are grouped by
    * detected charset, and one read per group unions back together.
    *
    * Scale: detection reads <= 64 KB per file on the driver — the
    * same order of work as the file listing Spark already does, and
    * it runs through the Hadoop FileSystem API so object stores work.
    * One deliberate divergence from the reference: its chain tries
    * latin1 BEFORE cp1252, but latin1 accepts every byte sequence, so
    * cp1252 was unreachable dead code there. Non-UTF-8 files decode
    * as windows-1252 here (identical to latin1 for all printable
    * Western-European bytes, and correct for the 0x80-0x9F range —
    * €, curly quotes, dashes — where latin1 yields control chars).
    */
  def csvAutoCharset(spark: SparkSession, path: String,
                     schema: Option[StructType] = None,
                     delimiter: String = ",",
                     maxRescueBytes: Long = DefaultRescueCapBytes): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = listFiles(fs, path)
    require(files.nonEmpty, s"no files match $path")
    val groups = files.groupBy(f => detectCharset(fs, f))
    groups.map {
      case ("UTF-16", ps) =>
        // BOM'd UTF-16: decoded losslessly through the rescue reader
        // (java's "UTF-16" charset consumes the BOM); Spark's file
        // CSV path splits lines on single \n BYTES, which lands
        // mid-codepoint in UTF-16
        requireRescueSized(fs, ps, maxRescueBytes)
        rescueCsv(spark, fs, ps, schema, delimiter,
          java.nio.charset.StandardCharsets.UTF_16)
      case ("UTF-32", ps) =>
        // BOM'd UTF-32, same treatment (java's "UTF-32" charset also
        // resolves endianness from the BOM and consumes it)
        requireRescueSized(fs, ps, maxRescueBytes)
        rescueCsv(spark, fs, ps, schema, delimiter,
          java.nio.charset.Charset.forName("UTF-32"))
      case (LossyCharset, ps) =>
        // LAST-RESORT lossy load (the reference's final fallback,
        // pattern_based_cleaner_watcher.py:178 errors='ignore'): a
        // file that no detected charset decodes — binary-ish,
        // BOM-less UTF-16, UTF-32 — lands as UTF-8 with U+FFFD
        // replacement marks instead of failing the batch or silently
        // mojibaking through cp1252. Audit with [[lossyDecodeLog]].
        requireRescueSized(fs, ps, maxRescueBytes)
        rescueCsv(spark, fs, ps, schema, delimiter,
          java.nio.charset.StandardCharsets.UTF_8)
      case (charset, ps) =>
        // Spark 4 whitelists CSV charsets (no windows-1252), so the
        // cp1252 group is decoded as latin1 — byte-identical except
        // 0x80-0x9F — and those 27 codepoints are fixed up post-read
        val readCharset = if (charset == "windows-1252") "ISO-8859-1" else charset
        val df = withSchema(spark.read
            .option("header", "true")
            .option("charset", readCharset)
            .option("sep", delimiter)
            .option("mode", "PERMISSIVE"), schema)
          .csv(ps.map(_.toString): _*)
        val decoded = if (charset == "windows-1252") transcodeCp1252(df) else df
        stripBomHeader(decoded)
    }.reduce(_.unionByName(_))
  }

  /** Decode files driver-side with REPLACE-on-malformed semantics and
    * parse the decoded lines with the same CSV options as the file
    * path (per file, so each file's header row stays a header). The
    * escape hatch for encodings Spark's file reader can't split or
    * decode; files here are drop-zone sized by nature and this group
    * is the rare tail of a drop, not the bulk path.
    */
  private def rescueCsv(spark: SparkSession, fs: FileSystem, files: Seq[Path],
                        schema: Option[StructType], delimiter: String,
                        charset: java.nio.charset.Charset): DataFrame = {
    import spark.implicits._
    files.map { f =>
      val text = decodeReplacing(readFully(fs, f), charset)
      val lines = text.split("\r\n|\r|\n", -1).toIndexedSeq
        .filter(_.nonEmpty)
      withSchema(spark.read
          .option("header", "true")
          .option("sep", delimiter)
          .option("mode", "PERMISSIVE"), schema)
        .csv(spark.createDataset(lines))
    }.map(stripBomHeader).reduce(_.unionByName(_))
  }

  /** Audit of the files [[csvAutoCharset]] loads through the lossy
    * last-resort decode: one failure-log-shaped row per such file
    * (status='warning', reason lossy_decode) with the number of
    * replacement characters the decode produced — the rows landed,
    * this is the record of what was mangled. Costs one extra decode
    * of the affected files only.
    */
  def lossyDecodeLog(spark: SparkSession, path: String,
                     batchId: String = "",
                     maxRescueBytes: Long = DefaultRescueCapBytes): DataFrame = {
    import spark.implicits._
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    listFiles(fs, path)
      .filter(f => detectCharset(fs, f) == LossyCharset)
      .map { f =>
        // over-cap files are never buffered: the audit row carries the
        // gate reason instead of a replacement count
        if (fs.getFileStatus(f).getLen > maxRescueBytes)
          ("warning", "file_too_large_for_rescue", f.getName, batchId,
            None: Option[Long])
        else {
          val text = decodeReplacing(readFully(fs, f),
            java.nio.charset.StandardCharsets.UTF_8)
          ("warning", "lossy_decode", f.getName, batchId,
            Some(text.count(_ == '�').toLong))
        }
      }
      .toDF("status", "error_message", "source_name", "processing_batch",
        "n_replacements")
  }

  /** Cap on what the rescue paths ([[rescueCsv]], [[lossyDecodeLog]],
    * the Excel readers) may buffer WHOLE in one JVM's memory. These
    * paths exist for drop-zone-sized files — the same files the
    * reference buffers whole through pandas — but a mis-dropped 10 GB
    * file must fail loudly (`file_too_large_for_rescue`), not OOM the
    * driver. Mirrors the reference's max-file-size gate
    * (pattern_config.yaml data_quality); pipelines using
    * [[fileGate]] with `maxFileSizeMb` reject such files before ever
    * reaching a rescue decode.
    */
  val DefaultRescueCapBytes: Long = 512L * 1024 * 1024

  private def requireRescueSized(fs: FileSystem, ps: Seq[Path], cap: Long): Unit = {
    val over = ps.map(p => p -> fs.getFileStatus(p).getLen).filter(_._2 > cap)
    if (over.nonEmpty) throw new java.io.IOException(
      "file_too_large_for_rescue: " +
        over.map { case (p, len) => s"${p.getName} ($len bytes)" }.mkString(", ") +
        s" exceed the $cap-byte driver rescue-decode cap; reject oversize " +
        "files upstream (fileGate maxFileSizeMb) or raise maxRescueBytes")
  }

  private def readFully(fs: FileSystem, f: Path): Array[Byte] = {
    val in = fs.open(f)
    try in.readAllBytes() finally in.close()
  }

  private def decodeReplacing(bytes: Array[Byte],
                              charset: java.nio.charset.Charset): String = {
    import java.nio.charset.CodingErrorAction
    charset.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
      .decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  /** Per-file charset decisions [[csvAutoCharset]] would make, as an
    * auditable frame (file_name, charset) — the detection is a bounded
    * two-window sample, so a file whose only legacy bytes sit mid-file
    * can be misclassified UTF-8 and silently decode with replacement
    * chars; pipelines that care should audit this report (or count
    * U+FFFD in the decoded output) rather than trusting the sample
    * blindly.
    */
  def charsetReport(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    listFiles(fs, path).map(f => (f.getName, detectCharset(fs, f)))
      .toDF("file_name", "charset")
  }

  // Files matching a literal path, directory, or glob — globStatus
  // handles all three uniformly (a literal glob like /drop/*.csv
  // would make getFileStatus throw). Directory listing is
  // non-recursive — the same contract as Spark's own csv(dir) reader.
  private def listFiles(fs: FileSystem, path: String): Seq[Path] = {
    val matched = Option(fs.globStatus(new Path(path))).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile).map(_.getPath).toSeq
      else Seq(st.getPath)
    }
  }

  /** Detection verdict for files no detected charset decodes: loaded
    * through the UTF-8-with-replacement last resort.
    */
  private[sources] val LossyCharset = "utf-8-lossy"

  /** BOM sniff + strict UTF-8 validation over bounded head AND tail
    * windows. Sampling both ends (rather than the head alone) closes
    * the common miss of a file whose first 64 KB happens to be pure
    * ASCII while legacy-encoded bytes appear later; a file whose ONLY
    * high bytes sit in the unsampled middle can still slip through —
    * the price of not scanning every byte of every file at listing
    * time. Returns the charset to decode the file with: "UTF-8",
    * "windows-1252", "UTF-16" / "UTF-32" (BOM'd, either endianness —
    * the 4-byte UTF-32 BOMs are checked first, since the UTF-32LE BOM
    * starts with the UTF-16LE one), or
    * [[LossyCharset]] for content that is not plausibly single-byte
    * text either (NUL/C0-control dense: BOM-less UTF-16/32, binary) —
    * those land through the lossy last resort rather than silently
    * mojibaking through cp1252. Multibyte legacy encodings without
    * NULs (Shift-JIS, Big5) are indistinguishable from cp1252 in a
    * byte sample and still mojibake — the same limit as the
    * reference's fallback chain, which decoded them as latin1.
    */
  private[sources] def detectCharset(fs: FileSystem, file: Path): String = {
    val window = 65536
    val len = fs.getFileStatus(file).getLen
    def readAt(pos: Long, want: Int): (Array[Byte], Int) = {
      val buf = new Array[Byte](want)
      val in = fs.open(file)
      try {
        if (pos > 0) in.seek(pos)
        var total = 0
        var read = 0
        while (total < want && read >= 0) {
          read = in.read(buf, total, want - total)
          if (read > 0) total += read
        }
        (buf, total)
      } finally in.close()
    }
    val (head, nHead) = readAt(0, window)
    // NUL or C0 control bytes (tab/newlines aside) in the sample:
    // no single-byte TEXT encoding produces them, so past a small
    // tolerance the file is not cp1252-decodable text
    def binaryish(buf: Array[Byte], n: Int): Boolean = {
      var bad = 0; var i = 0
      while (i < n) {
        val b = buf(i) & 0xff
        if (b == 0x00 || (b < 0x20 && b != '\t' && b != '\n' && b != '\r')) bad += 1
        i += 1
      }
      n > 0 && bad.toDouble / n > 0.02
    }
    if (nHead >= 3 && (head(0) & 0xff) == 0xef && (head(1) & 0xff) == 0xbb &&
        (head(2) & 0xff) == 0xbf) "UTF-8" // BOM; stripBomHeader cleans up
    // UTF-32 BOMs BEFORE UTF-16: the UTF-32LE BOM (FF FE 00 00) has
    // the UTF-16LE BOM as a prefix, so the 2-byte check would claim
    // it and decode NUL-riddled UTF-16 rows
    else if (nHead >= 4 &&
        (((head(0) & 0xff) == 0xff && (head(1) & 0xff) == 0xfe &&
          (head(2) & 0xff) == 0x00 && (head(3) & 0xff) == 0x00) ||
          ((head(0) & 0xff) == 0x00 && (head(1) & 0xff) == 0x00 &&
            (head(2) & 0xff) == 0xfe && (head(3) & 0xff) == 0xff)))
      "UTF-32" // BOM'd; java's UTF-32 decoder resolves the endianness
    else if (nHead >= 2 &&
        (((head(0) & 0xff) == 0xff && (head(1) & 0xff) == 0xfe) ||
          ((head(0) & 0xff) == 0xfe && (head(1) & 0xff) == 0xff)))
      "UTF-16" // BOM'd; java's UTF-16 decoder resolves the endianness
    // binaryish FIRST: NUL is a VALID UTF-8 code point, so a BOM-less
    // UTF-16 file passes strict UTF-8 validation and would silently
    // load as NUL-riddled "UTF-8" if this check came second
    else if (binaryish(head, nHead)) LossyCharset
    else if (!isValidUtf8(head, nHead)) "windows-1252"
    else if (len > window) {
      // tail window; skip the first byte — the seek may have landed
      // mid-sequence of a valid multi-byte char
      val (tail, nTail) = readAt(len - window, window)
      var start = 0
      while (start < nTail && (tail(start) & 0xc0) == 0x80) start += 1
      if (binaryish(tail, nTail)) LossyCharset
      else if (isValidUtf8(tail.slice(start, nTail), nTail - start)) "UTF-8"
      else "windows-1252"
    } else "UTF-8"
  }

  /** Strict UTF-8 scan that tolerates ONE truncated trailing sequence
    * (the prefix may cut a multi-byte char at the buffer boundary).
    */
  private def isValidUtf8(buf: Array[Byte], n: Int): Boolean = {
    var i = 0
    while (i < n) {
      val b = buf(i) & 0xff
      val len =
        if (b < 0x80) 1
        else if ((b & 0xe0) == 0xc0 && b >= 0xc2) 2
        else if ((b & 0xf0) == 0xe0) 3
        else if ((b & 0xf8) == 0xf0 && b <= 0xf4) 4
        else return false
      if (i + len > n) return true // truncated at buffer end: accept
      var j = 1
      while (j < len) {
        if ((buf(i + j) & 0xc0) != 0x80) return false
        j += 1
      }
      i += len
    }
    true
  }

  /** cp1252 and latin1 agree on every byte except 0x80-0x9F, where
    * latin1 yields C1 control chars and cp1252 has €, curly quotes,
    * dashes, etc. After a latin1 decode of a cp1252 file those bytes
    * surface as U+0080-U+009F verbatim — a 1:1 `translate` on every
    * string column restores the cp1252 characters. (The five bytes
    * cp1252 leaves undefined stay as-is.)
    */
  private val cp1252Map: Seq[(Int, Int)] = Seq(
    0x80 -> 0x20ac, 0x82 -> 0x201a, 0x83 -> 0x0192, 0x84 -> 0x201e,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02c6,
    0x89 -> 0x2030, 0x8a -> 0x0160, 0x8b -> 0x2039, 0x8c -> 0x0152,
    0x8e -> 0x017d, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201c,
    0x94 -> 0x201d, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02dc, 0x99 -> 0x2122, 0x9a -> 0x0161, 0x9b -> 0x203a,
    0x9c -> 0x0153, 0x9e -> 0x017e, 0x9f -> 0x0178)
  private val c1Latin1 = cp1252Map.map(_._1.toChar).mkString
  private val c1Cp1252 = cp1252Map.map(_._2.toChar).mkString

  private def transcodeCp1252(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, translate}
    import org.apache.spark.sql.types.StringType
    df.schema.fields.filter(_.dataType == StringType).foldLeft(df) { (d, f) =>
      d.withColumn(f.name, translate(col(f.name), c1Latin1, c1Cp1252))
    }
  }

  /** Spark's CSV reader keeps a UTF-8 BOM glued to the first header
    * name; strip it so BOM'd and BOM-less files union cleanly.
    */
  private def stripBomHeader(df: DataFrame): DataFrame = {
    val cols = df.columns
    if (cols.nonEmpty && cols.head.startsWith("﻿"))
      df.withColumnRenamed(cols.head, cols.head.substring(1))
    else df
  }

  /** File-level quality gates (pattern_config.yaml data_quality;
    * pattern_watcher_configurable.py:239-253): size cap, empty-file
    * skip, and a header presence check for CSVs (first line must
    * exist and have no blank field — the re-expression of the
    * reference's post-read `df.columns.isna().any()` reject). Files
    * with unsupported extensions are silently ignored, matching the
    * watcher's is_supported_file pre-filter.
    *
    * Returns (accepted paths, rejected (fileName, reason) pairs) with
    * reasons `file_too_large` / `empty_file` / `missing_header`, for
    * the caller to land in its failure log. Gate work is bounded
    * metadata I/O per file (a stat, plus <= 8 KB of head for the
    * header check) — the same order as the file listing itself.
    */
  def fileGate(spark: SparkSession, path: String, gates: graft.QualityGates,
               extensions: Seq[String] = Seq(".csv")): (Seq[String], Seq[(String, String)]) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = listFiles(fs, path)
      .filter(p => extensions.exists(e => p.getName.toLowerCase.endsWith(e)))
    gateFiles(spark, files.map(_.toString), gates)
  }

  /** [[fileGate]] plus a WRITE-STABILITY window (the reference's
    * in-flight-file skip: pattern_based_watcher.py:282-289 re-stats
    * after a delay and defers files whose mtime moved). Files whose
    * (size, mtime) change across `stableMillis` — or that vanish, a
    * producer's rename-away — are returned as `deferred`: neither
    * accepted nor rejected, so the NEXT pass ingests them complete.
    * A partial CSV being written in place never reaches the read.
    *
    * Returns (accepted, rejected(name, reason), deferred paths). Cost
    * is one extra stat per file plus ONE sleep per pass (not per
    * file), the same order as the listing itself. `onWindow` is a
    * test seam: it runs inside the stability window so specs can
    * grow a file deterministically instead of racing a timer.
    */
  def fileGateStable(spark: SparkSession, path: String, gates: graft.QualityGates,
                     extensions: Seq[String] = Seq(".csv"),
                     stableMillis: Long = 2000,
                     onWindow: () => Unit = () => ())
      : (Seq[String], Seq[(String, String)], Seq[String]) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = listFiles(fs, path)
      .filter(p => extensions.exists(e => p.getName.toLowerCase.endsWith(e)))
      .map(_.toString)
    val (stable, deferred) = partitionByStability(spark, files, stableMillis, onWindow)
    val (accepted, rejected) = gateFiles(spark, stable, gates)
    (accepted, rejected, deferred)
  }

  /** Stability core: stat every file, wait out the window, stat
    * again; a file is stable iff (size, mtime) held and it still
    * exists. Shared by [[fileGateStable]] and [[stableStagingPass]].
    */
  private[graft] def partitionByStability(spark: SparkSession, files: Seq[String],
                                          stableMillis: Long,
                                          onWindow: () => Unit = () => ())
      : (Seq[String], Seq[String]) = {
    def stat(f: String): Option[(Long, Long)] = {
      val p = new Path(f)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      try {
        val st = fs.getFileStatus(p)
        Some((st.getLen, st.getModificationTime))
      } catch { case _: java.io.FileNotFoundException => None }
    }
    val before = files.map(f => f -> stat(f)).toMap
    if (stableMillis > 0) Thread.sleep(stableMillis)
    onWindow()
    files.partition(f => before(f).isDefined && stat(f) == Some(before(f).get))
  }

  /** Pre-source staging pass: rename write-STABLE files from a
    * landing directory into the directory a file stream actually
    * watches, deferring in-flight ones to a later pass. Returns
    * (staged new paths, deferred landing paths). A landing file whose
    * name already exists in the staged dir (a recurring daily drop)
    * is staged under a uuid-suffixed name rather than deferred — the
    * old behavior deferred it on EVERY pass, silently starving a
    * recurring feed.
    *
    * This is the streaming form of the reference's stability skip,
    * and it must run BEFORE the source: Structured Streaming's file
    * source checkpoints a file the moment it lists it, so a file
    * admitted mid-write would have its partial content committed and
    * never be re-read — no foreachBatch-side check can undo the
    * admission. Gating the rename into the watched directory keeps
    * the checkpoint clean: the stream only ever lists complete files,
    * and a deferred file arrives whole on a later pass (spec:
    * StreamingSpec "write-stability staging").
    *
    * Rename is a metadata op on HDFS-like stores. On object stores
    * (S3) rename is a copy — there, prefer producer-side
    * write-temp-then-rename into the watched prefix; this pass is
    * for drop zones where the producer can't be changed (the
    * reference's exact situation).
    */
  def stableStagingPass(spark: SparkSession, landingDir: String, stageDir: String,
                        extensions: Seq[String] = Seq(".csv"),
                        stableMillis: Long = 2000,
                        onWindow: () => Unit = () => ())
      : (Seq[String], Seq[String]) = {
    val landing = new Path(landingDir)
    val fs = landing.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = listFiles(fs, landingDir)
      .filter(p => extensions.exists(e => p.getName.toLowerCase.endsWith(e)))
      .map(_.toString)
    val (stable, unstable) = partitionByStability(spark, files, stableMillis, onWindow)
    val stage = new Path(stageDir)
    fs.mkdirs(stage)
    val deferred = scala.collection.mutable.ListBuffer.empty[String]
    deferred ++= unstable
    val staged = stable.flatMap { f =>
      val src = new Path(f)
      val plain = new Path(stage, src.getName)
      // a same-named file already staged (a recurring drop — daily
      // orders.csv — or one the stream hasn't archived yet): NEVER
      // clobber it, and never defer forever either — the stream has
      // checkpointed the old name, so a deferral would starve the new
      // data on every subsequent pass. First compare content: a
      // producer RETRY of the identical bytes (the reference's mtime
      // set would not reprocess it) is dropped from the landing dir
      // and never becomes a second stream input. Only genuinely NEW
      // bytes under an old name are staged, under a collision-proof
      // name (uuid before the extension); file streams key on path,
      // so the renamed file is a brand-new input.
      if (fs.exists(plain) && sameContent(fs, src, plain)) {
        fs.delete(src, false)
        None
      } else {
        val dst =
          if (!fs.exists(plain)) plain
          else {
            val name = src.getName
            val (stem, ext) = name.lastIndexOf('.') match {
              case -1 => (name, "")
              case i  => (name.substring(0, i), name.substring(i))
            }
            new Path(stage,
              s"$stem-${java.util.UUID.randomUUID.toString.take(8)}$ext")
          }
        if (!fs.rename(src, dst)) { deferred += f; None }
        else Some(dst.toString)
      }
    }
    (staged, deferred.toSeq)
  }

  /** Byte-identical check for the staging pass's benign-retry drop:
    * length compare first (free, from file status — rejects almost
    * every real new-data drop), then a streamed MD5 of each side.
    * The checksum read costs one pass over a file that was about to
    * be ingested anyway, and only runs on a length tie.
    */
  private def sameContent(fs: FileSystem, a: Path, b: Path): Boolean = {
    if (fs.getFileStatus(a).getLen != fs.getFileStatus(b).getLen) return false
    def md5(p: Path): Seq[Byte] = {
      val digest = java.security.MessageDigest.getInstance("MD5")
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](65536)
        var read = in.read(buf)
        while (read > 0) { digest.update(buf, 0, read); read = in.read(buf) }
      } finally in.close()
      digest.digest().toIndexedSeq
    }
    md5(a) == md5(b)
  }

  /** Gate a concrete file list — shared by [[fileGate]] (batch
    * listing) and the streaming sinks (which gate each micro-batch's
    * source files). See [[fileGate]] for semantics.
    */
  private[graft] def gateFiles(spark: SparkSession, files: Seq[String],
                               gates: graft.QualityGates): (Seq[String], Seq[(String, String)]) = {
    val accepted = scala.collection.mutable.ListBuffer.empty[String]
    val rejected = scala.collection.mutable.ListBuffer.empty[(String, String)]
    files.foreach { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val len = fs.getFileStatus(p).getLen
      val tooLarge = gates.maxFileSizeMb.exists(mb => len > mb * 1024 * 1024)
      if (tooLarge) rejected += p.getName -> "file_too_large"
      else if (len == 0 && gates.skipEmptyFiles) rejected += p.getName -> "empty_file"
      else if (gates.requireHeaders && p.getName.toLowerCase.endsWith(".csv") &&
        !hasHeader(fs, p)) rejected += p.getName -> "missing_header"
      else accepted += f
    }
    (accepted.toSeq, rejected.toSeq)
  }

  /** First line exists and has no blank field (<= 8 KB peek). */
  private def hasHeader(fs: FileSystem, p: Path): Boolean = {
    val in = fs.open(p)
    val buf = new Array[Byte](8192)
    val n = try {
      var total = 0; var read = 0
      while (total < buf.length && read >= 0) {
        read = in.read(buf, total, buf.length - total)
        if (read > 0) total += read
      }
      total
    } finally in.close()
    val text = new String(buf, 0, math.max(n, 0), "UTF-8")
    val line = text.takeWhile(c => c != '\n' && c != '\r')
    line.nonEmpty && line.split(",", -1).forall(_.trim.nonEmpty)
  }

  /** JSON-lines. */
  def jsonl(spark: SparkSession, path: String,
            schema: Option[StructType] = None): DataFrame =
    withSchema(spark.read, schema).json(path)

  /** JSON-lines with a corrupt-record audit for hostile drop zones:
    * returns (good rows, audit). A line Jackson cannot parse against
    * `schema` lands in the audit (failure-log shape, one row per
    * corrupt line with the raw text and its file) instead of either
    * failing the batch or turning into an indistinguishable all-null
    * row. Both frames come from ONE permissive read with Spark's
    * columnNameOfCorruptRecord — fully distributed, nothing driver-
    * side; the read is cached because good/audit split the same scan
    * two ways and recomputing a 100 TB scan per side is the bug.
    *
    * Contract pinned by AdversarialSourcesSpec: good.count +
    * audit.count == number of non-blank input lines (Spark skips
    * blank/whitespace-only lines in json-lines mode).
    *
    * Call `release()` once both frames are consumed (written out /
    * aggregated) to drop the shared cached scan; until then it
    * occupies (evictable) cache like any hot table.
    */
  final case class AuditedRead(good: DataFrame, audit: DataFrame,
                               release: () => Unit)

  def jsonlAudited(spark: SparkSession, path: String, schema: StructType,
                   batchId: String = ""): AuditedRead = {
    import org.apache.spark.sql.functions.{col, input_file_name, lit}
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not already declare _corrupt_record")
    val withCorrupt = schema.add("_corrupt_record", StringType)
    // input_file_name() must be captured BEFORE the cache: evaluated
    // after, it runs over the in-memory relation (no file context)
    // and returns empty strings
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .withColumn("_src_file", input_file_name())
      .cache()
    val good = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record", "_src_file")
    val audit = raw.filter(col("_corrupt_record").isNotNull)
      .select(lit("warning").as("status"),
        lit("corrupt_json").as("error_message"),
        col("_src_file").as("source_name"),
        lit(batchId).as("processing_batch"),
        col("_corrupt_record").as("raw_line"))
    AuditedRead(good, audit, () => { raw.unpersist(); () })
  }

  /** Parquet (the lake format; predicate pushdown + column pruning
    * reach the scan).
    */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-file parquet magic-number audit (head and tail "PAR1") for a
    * drop zone that may contain truncated or masquerading files. One
    * corrupt file in a directory fails the WHOLE read loudly (the
    * right default — ignoreCorruptFiles silently drops data), so a
    * pipeline that must make progress quarantines first: read this
    * report, route !ok files to the failure log, read the rest.
    * Bounded driver I/O like [[charsetReport]]: 8 bytes per file via
    * two positioned reads — the same order as the listing itself. A
    * file can still be corrupt PAST the magic (rot mid-body is caught
    * by the reader's checksums at scan time); this gate catches the
    * dominant drop-zone classes — truncation, partial upload, wrong
    * format renamed — before a 1000-task job is launched.
    */
  def parquetMagicReport(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val magic = "PAR1".getBytes("US-ASCII").toSeq
    listFiles(fs, path).map { f =>
      val len = fs.getFileStatus(f).getLen
      // 12 bytes = head magic + the minimal tail (4-byte footer
      // length + tail magic); anything smaller cannot be parquet
      if (len < 12) (f.getName, false, "too_short")
      else {
        val head = new Array[Byte](4); val tail = new Array[Byte](4)
        val in = fs.open(f)
        try {
          in.readFully(0L, head)
          in.readFully(len - 4, tail)
        } finally in.close()
        if (head.toSeq != magic) (f.getName, false, "bad_head_magic")
        else if (tail.toSeq != magic) (f.getName, false, "bad_tail_magic")
        else (f.getName, true, "ok")
      }
    }.toDF("file_name", "ok", "reason")
  }

  /** ORC — Spark-native columnar like parquet (footer stats,
    * pushdown, pruning); the read mirror of [[Sinks.orc]].
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  private def withSchema(r: DataFrameReader, s: Option[StructType]): DataFrameReader =
    s.fold(r.option("inferSchema", "true"))(r.schema)
}
