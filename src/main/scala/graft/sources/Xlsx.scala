package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal pure-JVM XLSX/XLSM support — the reference's primary input
  * format (pattern_based_cleaner_watcher.py:180-182 reads
  * `.xlsx/.xls/.xlsm` with a `sheet_name` param via pandas;
  * enhanced_tasks.py:52). No external deps: OOXML is a zip of XML
  * parts, parsed here with JDK StAX. XLSM is the same container with
  * a macro part we ignore, so it reads transparently. Legacy `.xls`
  * (OLE2/BIFF8 binary) is NOT OOXML — it is detected by magic number
  * and dispatched to the [[Xls]] reader, so all four reference
  * extensions read through this one entry point; pre-BIFF8 files are
  * rejected there with an actionable error.
  *
  * Reader supports shared strings, inline strings, and numeric cells,
  * with A1-reference gap handling and sheet selection by name (the
  * workbook's sheet list + relationships resolve the part name; the
  * default is the first sheet in workbook order, like pandas
  * sheet_name=0). Distribution model: one workbook per task via
  * Spark's binaryFile source — xlsx is not splittable, so parallelism
  * comes from many files (exactly the reference's drop-zone layout).
  * Writer is a driver-side fixture/small-dim utility; large outputs
  * belong in parquet.
  */
object Xlsx {

  /** Read all workbook files matching `path` (glob ok) into a
    * DataFrame of strings; first row of the selected sheet is the
    * header; schema is taken from the lexicographically first file.
    * `sheetName=None` reads each workbook's first sheet.
    *
    * Width handling: rows NARROWER than the header pad with nulls
    * (trailing empty cells are normal xlsx), but a row WIDER than the
    * header means the chosen header file was too narrow and the
    * overflow cells would be silently dropped. `strict=true` fails
    * the read loudly on the first such row (file + widths in the
    * message); the default keeps the truncating behavior for ragged
    * drop zones — audit those with [[truncationLog]].
    *
    * `nrows` caps the DATA rows parsed per file (the reference's
    * preview read, file_access.py:59 `read_excel(nrows=...)`): the
    * StAX loop short-circuits after header + nrows, so previewing a
    * huge workbook does not parse it whole.
    *
    * `skipRows`/`useCols` complete the reference fileserver's
    * parameterized read contract (fileserver.py:201-240
    * `read_excel(sheet_name, nrows, skiprows, usecols)`), applied at
    * PARSE time like pandas, not as a post-read projection:
    *  - `skipRows = n` discards the sheet's first n physical rows
    *    before the header — the header-at-row-N workbook (title +
    *    blank preamble above the real table) that a post-read
    *    `.filter` cannot express, because the junk rows poison the
    *    schema itself;
    *  - `useCols = Some("A:C,E")` keeps only the named Excel column
    *    positions (pandas' usecols string form: letters and
    *    inclusive letter ranges, comma-separated). Positions index
    *    the ORIGINAL sheet columns, header and data alike. With
    *    useCols set, `strict` overflow checking is skipped — row
    *    width beyond the selection is the point of selecting.
    */
  def read(spark: SparkSession, path: String,
           sheetName: Option[String] = None,
           strict: Boolean = false,
           nrows: Option[Int] = None,
           skipRows: Int = 0,
           useCols: Option[String] = None,
           maxFileBytes: Long = Sources.DefaultRescueCapBytes): DataFrame = {
    nrows.foreach(n => require(n >= 0, s"nrows must be >= 0, got $n"))
    require(skipRows >= 0, s"skipRows must be >= 0, got $skipRows")
    val keep = useCols.map(parseUseCols)
    def project(cells: Seq[String]): Seq[String] = keep match {
      case None => cells
      case Some(idx) => idx.map(i => if (i < cells.length) cells(i) else null)
    }
    val files = sizedWorkbooks(spark, path, maxFileBytes)
    import spark.implicits._
    // header: first kept row of the lexicographically first file; only
    // the skipped preamble + that one row is parsed (maxRows
    // short-circuits the StAX loop)
    val firstFile = files.orderBy("path")
      .as[(String, Array[Byte])].take(1).toSeq
    val header = firstFile
      .flatMap { case (p, bytes) =>
        parseSheetRows(bytes, sheetName, maxRows = skipRows + 1, source = p)
          .drop(skipRows).toSeq
      }.headOption.map(project).getOrElse(Seq.empty)
    if (header.isEmpty || header.forall(_ == null)) {
      // a headerless FIRST file defines a width-0 schema for the whole
      // glob — every row of every other file would be dropped. strict
      // mode fails loudly instead of returning that empty frame.
      if (strict && firstFile.nonEmpty) throw new IllegalStateException(
        s"${firstFile.head._1}: selected sheet has no header row, so the " +
          "whole read would return empty; remove the file from the glob " +
          "or read with strict=false")
      return spark.emptyDataFrame
    }
    val maxRows = nrows.map(n =>
      if (n >= Int.MaxValue - 1 - skipRows) Int.MaxValue else skipRows + n + 1)
      .getOrElse(Int.MaxValue)
    val rowsDs = files.as[(String, Array[Byte])].flatMap { case (p, bytes) =>
      parseSheetRows(bytes, sheetName, maxRows = maxRows, source = p)
        .drop(skipRows + 1).map(cells => (p, cells))
    }
    // a selected position past the header row's width has no name —
    // Spark CSV's `_c<i>` convention, not a null/empty field name
    val schema = StructType(header.zipWithIndex.map { case (h, i) =>
      StructField(if (h == null) s"_c$i" else h, StringType, nullable = true)
    })
    val width = header.length
    val checkOverflow = strict && keep.isEmpty
    val rdd = rowsDs.rdd.map { case (p, cells) =>
      if (checkOverflow && cells.length > width) throw new IllegalStateException(
        s"$p: row has ${cells.length} cells but the header (from the " +
          s"lexicographically first file) has $width — overflow cells would " +
          "be dropped; widen the header file or read with strict=false")
      Row.fromSeq(project(cells).padTo(width, null).take(width))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Parse pandas' usecols STRING form for Excel reads: single
    * letters and inclusive letter ranges, comma-separated —
    * "A:C,E" -> Seq(0, 1, 2, 4). Output is sorted and deduplicated
    * (pandas keeps sheet order regardless of spec order).
    */
  private[graft] def parseUseCols(spec: String): Seq[Int] = {
    def idx(ref: String): Int = {
      val t = ref.trim.toUpperCase
      require(t.nonEmpty && t.forall(c => c >= 'A' && c <= 'Z'),
        s"usecols: '$ref' is not an Excel column letter")
      colIndex(t)
    }
    val cols = spec.split(",").filter(_.trim.nonEmpty).flatMap { part =>
      part.split(":", -1) match {
        case Array(one) => Seq(idx(one))
        case Array(a, b) =>
          val (lo, hi) = (idx(a), idx(b))
          require(lo <= hi, s"usecols: descending range '$part'")
          lo to hi
        case _ => throw new IllegalArgumentException(
          s"usecols: malformed range '$part' (expect A, A:C, comma-separated)")
      }
    }
    require(cols.nonEmpty, s"usecols selected no columns: '$spec'")
    cols.distinct.sorted.toSeq
  }

  /** Per-file audit of rows wider than the header — the rows
    * [[read]]'s default mode truncates. Failure-log-shaped
    * (status='warning', one row per affected file with the count), so
    * it unions straight into the pipeline's failure log. Costs a
    * second parse of the workbooks; they are drop-zone-sized by
    * nature.
    */
  def truncationLog(spark: SparkSession, path: String,
                    sheetName: Option[String] = None,
                    batchId: String = "",
                    maxFileBytes: Long = Sources.DefaultRescueCapBytes): DataFrame = {
    import spark.implicits._
    val files = sizedWorkbooks(spark, path, maxFileBytes)
    val header = files.orderBy("path")
      .as[(String, Array[Byte])].take(1).toSeq
      .flatMap { case (p, bytes) =>
        parseSheetRows(bytes, sheetName, maxRows = 1, source = p).toSeq
      }.headOption.getOrElse(Seq.empty)
    val width = header.length
    files.as[(String, Array[Byte])].flatMap { case (p, bytes) =>
      val wide = parseSheetRows(bytes, sheetName, source = p).drop(1)
        .count(_.length > width)
      if (wide > 0) Some((p.split('/').last, wide.toLong)) else None
    }.toDF("source_name", "n_rows")
      .select(org.apache.spark.sql.functions.lit("warning").as("status"),
        org.apache.spark.sql.functions.lit("row_wider_than_header").as("error_message"),
        org.apache.spark.sql.functions.col("source_name"),
        org.apache.spark.sql.functions.lit(batchId).as("processing_batch"),
        org.apache.spark.sql.functions.col("n_rows"))
  }

  /** Sheet names of one workbook, in workbook order — the engine
    * surface for the reference's sheet enumeration
    * (etl-worker/etl_processor/file_access.py:45 get_sheet_names via
    * the fileserver). Pair with [[read]]'s `sheetName` to ingest a
    * chosen sheet.
    */
  def sheetNames(bytes: Array[Byte], source: String = "<bytes>"): Seq[String] = {
    require(bytes.length >= 4, s"$source: truncated workbook (${bytes.length} bytes)")
    if (Xls.isOle2(bytes)) return Xls.sheetNames(bytes, source)
    require(bytes(0) == 'P' && bytes(1) == 'K',
      s"$source is not an OOXML workbook (missing zip magic)")
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var workbookXml: Array[Byte] = null
    attributed(source) {
      var entry = zin.getNextEntry
      val cap = partCap(bytes.length)
      while (entry != null && workbookXml == null) {
        if (entry.getName == "xl/workbook.xml")
          workbookXml = readEntryBounded(zin, entry.getName, source, cap)
        entry = zin.getNextEntry
      }
      zin.close()
    }
    require(workbookXml != null, s"$source: no xl/workbook.xml part")
    val names = ArrayBuffer.empty[String]
    val r = newReader(workbookXml)
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        val n = r.getAttributeValue(null, "name")
        if (n != null) names += n
      }
    }
    r.close()
    names.toSeq
  }

  /** [[sheetNames]] for a file path (local or Hadoop-visible). Capped
    * at [[Sources.DefaultRescueCapBytes]] — a larger workbook must be
    * read via the bytes overload by a caller that accepts the buffer.
    */
  def sheetNames(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    if (len > Sources.DefaultRescueCapBytes) throw new java.io.IOException(
      s"file_too_large_for_rescue: $path ($len bytes) exceeds the " +
        s"${Sources.DefaultRescueCapBytes}-byte workbook buffering cap")
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    sheetNames(bytes, source = path)
  }

  /** Workbook (path, content) frame with the size gate applied BEFORE
    * any content is materialized: a mis-dropped multi-GB workbook
    * fails loudly with `file_too_large_for_rescue` instead of being
    * buffered whole in a task (and, for the header file, the driver).
    * The check reads only binaryFile's metadata columns.
    */
  private def sizedWorkbooks(spark: SparkSession, path: String,
                             maxFileBytes: Long): DataFrame = {
    val meta = spark.read.format("binaryFile").load(path)
    import spark.implicits._
    val over = meta.select("path", "length").as[(String, Long)]
      .filter(_._2 > maxFileBytes).take(20)
    if (over.nonEmpty) throw new java.io.IOException(
      "file_too_large_for_rescue: " +
        over.map { case (p, len) => s"$p ($len bytes)" }.mkString(", ") +
        s" exceed the $maxFileBytes-byte workbook buffering cap; reject " +
        "oversize files upstream (fileGate maxFileSizeMb) or raise maxFileBytes")
    meta.select("path", "content")
  }

  /** Iterate rows of one sheet as cell-string sequences (A1 gaps ->
    * null). OLE2 payloads dispatch to the BIFF8 [[Xls]] reader (so
    * `.xls` drops read transparently alongside `.xlsx/.xlsm`);
    * non-workbook payloads fail loudly.
    */
  def parseSheetRows(bytes: Array[Byte], sheetName: Option[String] = None,
                     maxRows: Int = Int.MaxValue,
                     source: String = "<bytes>"): Iterator[Seq[String]] = {
    require(bytes.length >= 4, s"$source: truncated workbook (${bytes.length} bytes)")
    if (Xls.isOle2(bytes))
      return Xls.parseSheetRows(bytes, sheetName, maxRows, source)
    require(bytes(0) == 'P' && bytes(1) == 'K',
      s"$source is not an OOXML workbook (missing zip magic)")
    // Load the XML parts we may need in one sequential pass (zip
    // entries arrive in archive order). Worksheet parts are kept
    // per-name; workbooks are small by nature — the big-data path is
    // CSV/parquet, this is the drop-zone compatibility reader.
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var sharedXml: Array[Byte] = null
    var workbookXml: Array[Byte] = null
    var relsXml: Array[Byte] = null
    val sheets = scala.collection.mutable.HashMap.empty[String, Array[Byte]]
    attributed(source) {
      val cap = partCap(bytes.length)
      var entry = zin.getNextEntry
      while (entry != null) {
        entry.getName match {
          case "xl/sharedStrings.xml" =>
            sharedXml = readEntryBounded(zin, entry.getName, source, cap)
          case "xl/workbook.xml" =>
            workbookXml = readEntryBounded(zin, entry.getName, source, cap)
          case "xl/_rels/workbook.xml.rels" =>
            relsXml = readEntryBounded(zin, entry.getName, source, cap)
          case n if n.startsWith("xl/worksheets/") && n.endsWith(".xml") =>
            sheets(n) = readEntryBounded(zin, entry.getName, source, cap)
          case _ =>
        }
        entry = zin.getNextEntry
      }
      zin.close()
    }
    val part = resolveSheetPart(workbookXml, relsXml, sheetName, source)
    val sheetXml = sheets.getOrElse(part,
      if (sheetName.isEmpty && sheets.contains("xl/worksheets/sheet1.xml"))
        sheets("xl/worksheets/sheet1.xml")
      else throw new IllegalArgumentException(
        s"$source: worksheet part $part not found (have: ${sheets.keys.toSeq.sorted.mkString(", ")})"))
    val shared = if (sharedXml != null) parseSharedStrings(sharedXml) else Vector.empty
    parseSheet(sheetXml, shared, maxRows).iterator
  }

  /** Decompressed-size cap for one zip part: 64x the COMPRESSED
    * archive size (floor 64 MB so tiny legitimate workbooks never
    * trip it). The file-size gates cap the compressed workbook, but
    * deflate expands up to ~1000:1 — a small crafted archive (zip
    * bomb) could pass every size gate and still inflate one entry
    * past executor memory. Real worksheet XML deflates at ~5-20:1,
    * so 64x is generous headroom while a crafted bomb fails loudly
    * and attributably instead of as an OOM kill. The streamed local
    * headers can't be trusted for this (a bomb lies about sizes, and
    * streaming-mode entries often carry -1), so the guard counts the
    * bytes it actually inflates.
    */
  private def partCap(archiveBytes: Int): Long =
    math.max(64L * 1024 * 1024, 64L * archiveBytes)

  /** Re-throw zip decoding failures with the FILE attributed. A
    * mangled archive surfaces from ZipInputStream as ZipException or
    * a bare EOFException — the latter with a null message, which in a
    * thousand-file drop tells the operator nothing. The guard's own
    * IOExceptions (zip-bomb cap) already carry the source and pass
    * through unwrapped.
    */
  private def attributed[T](source: String)(body: => T): T =
    try body catch {
      case e: java.util.zip.ZipException =>
        throw new java.io.IOException(
          s"$source: unreadable OOXML zip (${e.getMessage})", e)
      case e: java.io.EOFException =>
        throw new java.io.IOException(
          s"$source: truncated OOXML zip (unexpected end of archive)", e)
    }

  private def readEntryBounded(zin: ZipInputStream, entryName: String,
                               source: String, cap: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = zin.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size() > cap) throw new java.io.IOException(
        s"decompressed_too_large: $source!$entryName inflates past the " +
          s"$cap-byte part cap (zip-bomb guard, 64x the archive size); " +
          "a legitimate workbook part never approaches this — " +
          "quarantine the file")
      n = zin.read(buf)
    }
    out.toByteArray
  }

  /** Resolve a sheet name to its zip part via the workbook's sheet
    * list (ordered) and the workbook relationships. None -> first
    * sheet in workbook order (pandas sheet_name=0 semantics).
    */
  private def resolveSheetPart(workbookXml: Array[Byte], relsXml: Array[Byte],
                               sheetName: Option[String], source: String): String = {
    if (workbookXml == null || relsXml == null) {
      require(sheetName.isEmpty,
        s"$source: workbook metadata missing; cannot resolve sheet ${sheetName.get}")
      return "xl/worksheets/sheet1.xml"
    }
    // workbook.xml: ordered <sheet name=".." r:id="rIdN"/>
    val order = ArrayBuffer.empty[(String, String)] // (name, rId)
    val wr = newReader(workbookXml)
    while (wr.hasNext) {
      if (wr.next() == XMLStreamConstants.START_ELEMENT && wr.getLocalName == "sheet") {
        val name = wr.getAttributeValue(null, "name")
        val rid = (0 until wr.getAttributeCount)
          .find(i => wr.getAttributeLocalName(i) == "id")
          .map(wr.getAttributeValue).orNull
        if (name != null && rid != null) order += ((name, rid))
      }
    }
    wr.close()
    // rels: rId -> Target (relative to xl/, or absolute /xl/...)
    val targets = scala.collection.mutable.HashMap.empty[String, String]
    val rr = newReader(relsXml)
    while (rr.hasNext) {
      if (rr.next() == XMLStreamConstants.START_ELEMENT &&
          rr.getLocalName == "Relationship") {
        val id = rr.getAttributeValue(null, "Id")
        val target = rr.getAttributeValue(null, "Target")
        if (id != null && target != null) targets(id) = target
      }
    }
    rr.close()
    val chosen = sheetName match {
      case None =>
        order.headOption.getOrElse(throw new IllegalArgumentException(
          s"$source: workbook declares no sheets"))
      case Some(n) =>
        order.find(_._1 == n).getOrElse(throw new IllegalArgumentException(
          s"$source: no sheet named '$n' (sheets: ${order.map(_._1).mkString(", ")})"))
    }
    val target = targets.getOrElse(chosen._2, throw new IllegalArgumentException(
      s"$source: no relationship for sheet '${chosen._1}' (${chosen._2})"))
    if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
  }

  private def newReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = newReader(bytes)
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var inSi = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          inSi = true; sb.clear()
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          inSi = false; out += sb.toString
        case XMLStreamConstants.START_ELEMENT if inSi && r.getLocalName == "t" =>
          sb.append(r.getElementText)
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** Column index from an A1 reference ("BC12" -> 54). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def parseSheet(bytes: Array[Byte], shared: Vector[String],
                         maxRows: Int = Int.MaxValue): Seq[Seq[String]] = {
    val r = newReader(bytes)
    val rows = ArrayBuffer.empty[Seq[String]]
    var row: ArrayBuffer[String] = null
    var cellType = ""
    var cellCol = 0
    var inIs = false
    while (r.hasNext && rows.length < maxRows) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = ArrayBuffer.empty[String]
          case "c" =>
            val ref = Option(r.getAttributeValue(null, "r"))
            cellCol = ref.map(colIndex).getOrElse(row.length)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
          case "is" => inIs = true
          case "v" | "t" if row != null =>
            val isValue = r.getLocalName == "v" || inIs
            if (isValue) {
              val text = r.getElementText
              val value = if (cellType == "s") shared(text.trim.toInt) else text
              while (row.length < cellCol) row += null
              if (row.length == cellCol) row += value
              else {
                // inline rich-text cells carry one <t> per run —
                // concatenate runs instead of keeping only the last
                val existing = row(cellCol)
                row(cellCol) = if (existing == null) value else existing + value
              }
            }
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "row" => rows += row.toSeq; row = null
          case "is" => inIs = false
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Write one xlsx (single sheet, inline strings) — driver-side
    * fixture/small-output utility.
    */
  def write(path: String, header: Seq[String], rows: Seq[Seq[Any]]): Unit =
    writeSheets(path, Seq(("Sheet1", header, rows)))

  /** Multi-sheet variant: each entry is (sheetName, header, rows). */
  def writeSheets(path: String,
                  sheetsToWrite: Seq[(String, Seq[String], Seq[Seq[Any]])]): Unit = {
    require(sheetsToWrite.nonEmpty, "need at least one sheet")
    val out = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    def put(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    val n = sheetsToWrite.length
    val overrides = (1 to n).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
      .mkString("\n")
    put("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |$overrides
         |</Types>""".stripMargin)
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    val sheetDecls = sheetsToWrite.zipWithIndex.map { case ((name, _, _), i) =>
      s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    put("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>$sheetDecls</sheets>
         |</workbook>""".stripMargin)
    val relDecls = (1 to n).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
      .mkString
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |$relDecls
         |</Relationships>""".stripMargin)
    def cell(v: Any): String = v match {
      case null => ""
      case num: Int => s"<c><v>$num</v></c>"
      case num: Long => s"<c><v>$num</v></c>"
      case num: Double => s"<c><v>$num</v></c>"
      case s0 => s"<c t=\"inlineStr\"><is><t>${xmlEscape(s0.toString)}</t></is></c>"
    }
    sheetsToWrite.zipWithIndex.foreach { case ((_, header, rows), i) =>
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      sb.append("<row>").append(header.map(cell).mkString).append("</row>")
      rows.foreach { r =>
        sb.append("<row>").append(r.map(cell).mkString).append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      put(s"xl/worksheets/sheet${i + 1}.xml", sb.toString)
    }
    out.close()
  }
}
