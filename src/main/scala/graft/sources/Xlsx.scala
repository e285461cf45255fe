package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal pure-JVM XLSX support — the reference's primary input
  * format (pattern_based_cleaner_watcher.py:180-182 reads
  * `.xlsx/.xls/.xlsm` sheet 0 via pandas). No external deps: OOXML is
  * a zip of XML parts, parsed here with JDK StAX.
  *
  * Reader supports shared strings, inline strings, and numeric cells
  * of sheet1, with A1-reference gap handling. Distribution model:
  * one workbook per task via Spark's binaryFile source — xlsx is not
  * splittable, so parallelism comes from many files (exactly the
  * reference's drop-zone layout). Writer is a driver-side fixture/
  * small-dim utility; large outputs belong in parquet.
  */
object Xlsx {

  /** Read all xlsx files matching `path` (glob ok) into a DataFrame
    * of strings; first row of each sheet is the header; schema is
    * taken from the lexicographically first file.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    import spark.implicits._
    // header: first row of the lexicographically first file; only
    // that one row is parsed (maxRows short-circuits the StAX loop)
    val header = files.orderBy("path")
      .as[(String, Array[Byte])].take(1).toSeq
      .flatMap { case (_, bytes) =>
        parseSheetRows(new ByteArrayInputStream(bytes), maxRows = 1).toSeq
      }.headOption.getOrElse(Seq.empty)
    if (header.isEmpty) return spark.emptyDataFrame
    val rowsDs = files.as[(String, Array[Byte])].flatMap { case (_, bytes) =>
      parseSheetRows(new ByteArrayInputStream(bytes)).drop(1)
    }
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val width = header.length
    val rdd = rowsDs.rdd.map { cells =>
      Row.fromSeq(cells.padTo(width, null).take(width))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Iterate sheet1 rows as cell-string sequences (A1 gaps -> null). */
  def parseSheetRows(in: InputStream,
                     maxRows: Int = Int.MaxValue): Iterator[Seq[String]] = {
    val zin = new ZipInputStream(in)
    var shared = Vector.empty[String]
    var sheetXml: Array[Byte] = null
    var sharedXml: Array[Byte] = null
    var entry = zin.getNextEntry
    while (entry != null) {
      entry.getName match {
        case "xl/sharedStrings.xml" => sharedXml = zin.readAllBytes()
        case "xl/worksheets/sheet1.xml" => sheetXml = zin.readAllBytes()
        case _ =>
      }
      entry = zin.getNextEntry
    }
    zin.close()
    if (sharedXml != null) shared = parseSharedStrings(sharedXml)
    if (sheetXml == null) Iterator.empty
    else parseSheet(sheetXml, shared, maxRows).iterator
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

  /** Write one xlsx (sheet1, inline strings) — driver-side fixture/
    * small-output utility.
    */
  def write(path: String, header: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    val out = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    def put(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cell(v: Any): String = v match {
      case null => ""
      case n: Int => s"<c><v>$n</v></c>"
      case n: Long => s"<c><v>$n</v></c>"
      case n: Double => s"<c><v>$n</v></c>"
      case s0 => s"<c t=\"inlineStr\"><is><t>${xmlEscape(s0.toString)}</t></is></c>"
    }
    sb.append("<row>").append(header.map(cell).mkString).append("</row>")
    rows.foreach { r =>
      sb.append("<row>").append(r.map(cell).mkString).append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    put("xl/worksheets/sheet1.xml", sb.toString)
    out.close()
  }
}
