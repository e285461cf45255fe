package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Minimal pure-JVM legacy `.xls` (OLE2 compound file + BIFF8)
  * support — the reference treats `.xls` as a first-class drop-zone
  * format (pattern_based_watcher.py:31 `SUPPORTED_EXTENSIONS =
  * {'.csv','.xlsx','.xls','.xlsm'}`, read via `pd.read_excel`,
  * pattern_based_cleaner_watcher.py:180). Old ERP exports are exactly
  * where `.xls` still lives, so rejecting it loudly (rounds 1-4) left
  * a real gap. No external deps: the container is parsed per the
  * public [MS-CFB] layout (FAT/miniFAT/directory), the workbook per
  * [MS-XLS] BIFF8 records.
  *
  * Reader scope (what `pd.read_excel` surfaces for these files):
  * shared strings incl. CONTINUE spillover, inline labels, NUMBER /
  * RK / MULRK numerics, BOOLERR, cached formula results (numeric,
  * string via the trailing STRING record, boolean; error -> null),
  * date detection via XF -> format mapping with both 1900 and 1904
  * date systems, and sheet selection by name with pandas
  * sheet_name=0 default. Pre-BIFF8 files (Excel 5.0/95 'Book'
  * streams, BIFF BOF versions < 0x0600) are rejected loudly — their
  * record layout differs and silent misreads are worse than an
  * actionable error.
  *
  * The writer is the same class of driver-side fixture utility as
  * [[Xlsx.write]]: it emits a spec-shaped CFB container (regular FAT
  * streams at >=4096 bytes, the mini stream below — both reader
  * paths) and BIFF8 records including SST CONTINUE splits, so specs
  * exercise the reader against real container mechanics. Large
  * outputs belong in parquet.
  *
  * Values surface as strings with the same conventions as the xlsx
  * reader (integral numerics render without a decimal point; dates
  * render ISO), so `.xls` drops union transparently with `.xlsx` in
  * [[Xlsx.read]], which dispatches here on the OLE2 magic number.
  */
object Xls {

  // ---------------------------------------------------------------
  // shared little-endian helpers
  // ---------------------------------------------------------------

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def f64(b: Array[Byte], o: Int): Double =
    ByteBuffer.wrap(b, o, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble

  /** OLE2/CFB magic: D0 CF 11 E0 A1 B1 1A E1. */
  def isOle2(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xe0 &&
      (bytes(4) & 0xff) == 0xa1 && (bytes(5) & 0xff) == 0xb1 &&
      (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0xe1

  // ---------------------------------------------------------------
  // OLE2 compound file: locate and read the Workbook stream
  // ---------------------------------------------------------------

  private case class DirEntry(name: String, entryType: Int,
                              startSector: Int, size: Long)

  /** Extract the BIFF8 `Workbook` stream. Rejects pre-BIFF8 files
    * (`Book` stream) and non-Excel OLE2 files loudly.
    */
  private[graft] def workbookStream(bytes: Array[Byte], source: String): Array[Byte] = {
    require(isOle2(bytes), s"$source: not an OLE2 compound file")
    require(bytes.length >= 512, s"$source: truncated OLE2 file (${bytes.length} bytes)")
    val secShift = u16(bytes, 30)
    require(secShift == 9 || secShift == 12,
      s"$source: unsupported OLE2 sector size 2^$secShift")
    val secSize = 1 << secShift
    val miniSize = 1 << u16(bytes, 32)
    val firstDir = i32(bytes, 48)
    val miniCutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)

    def readSector(sec: Int): Array[Byte] = {
      val off = (sec + 1) * secSize
      require(off >= 0 && off + secSize <= bytes.length,
        s"$source: OLE2 sector $sec out of range (truncated file?)")
      java.util.Arrays.copyOfRange(bytes, off, off + secSize)
    }
    // FAT sector list: 109 DIFAT slots in the header + chained DIFAT
    val fatSectors = ArrayBuffer.empty[Int]
    var i = 0
    while (i < 109) {
      val s = i32(bytes, 76 + i * 4); if (s >= 0) fatSectors += s; i += 1
    }
    var difat = i32(bytes, 68)
    var guard = 0
    while (difat >= 0 && guard < 4096) {
      val d = readSector(difat)
      var j = 0
      while (j < secSize / 4 - 1) {
        val s = i32(d, j * 4); if (s >= 0) fatSectors += s; j += 1
      }
      difat = i32(d, secSize - 4); guard += 1
    }
    val fat: Array[Int] = fatSectors.toArray.flatMap { s =>
      val d = readSector(s); (0 until secSize / 4).map(j => i32(d, j * 4))
    }
    def chain(start: Int, cap: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val maxSec = bytes.length / secSize + 2
      var s = start; var g = 0
      while (s >= 0) {
        require(g <= maxSec, s"$source: OLE2 FAT chain loops")
        out.write(readSector(s))
        require(s < fat.length, s"$source: OLE2 sector $s beyond FAT")
        s = fat(s); g += 1
      }
      val b = out.toByteArray
      if (cap >= 0 && cap < b.length) java.util.Arrays.copyOfRange(b, 0, cap.toInt)
      else b
    }

    val dirBytes = chain(firstDir, -1)
    val entries = (0 until dirBytes.length / 128).map { k =>
      val o = k * 128
      val nameLen = u16(dirBytes, o + 64)
      val name =
        if (nameLen >= 2 && nameLen <= 64)
          new String(dirBytes, o, nameLen - 2, StandardCharsets.UTF_16LE)
        else ""
      DirEntry(name, u8(dirBytes, o + 66), i32(dirBytes, o + 116),
        i32(dirBytes, o + 120).toLong & 0xffffffffL)
    }
    val root = entries.find(_.entryType == 5).getOrElse(throw new IllegalArgumentException(
      s"$source: OLE2 file has no root directory entry"))

    lazy val miniContainer = chain(root.startSector, root.size)
    lazy val miniFat: Array[Int] =
      if (firstMiniFat < 0) Array.empty
      else {
        val b = chain(firstMiniFat, -1)
        (0 until b.length / 4).map(j => i32(b, j * 4)).toArray
      }
    def readStream(e: DirEntry): Array[Byte] =
      if (e.size < miniCutoff) {
        // small streams live in 64-byte mini sectors inside the root
        // entry's stream, chained by the miniFAT
        val out = new java.io.ByteArrayOutputStream()
        var s = e.startSector; var g = 0
        while (s >= 0) {
          require(g <= miniFat.length + 1, s"$source: OLE2 miniFAT chain loops")
          val off = s * miniSize
          require(off + miniSize <= miniContainer.length,
            s"$source: mini sector $s beyond the mini stream")
          out.write(miniContainer, off, miniSize)
          require(s < miniFat.length, s"$source: mini sector $s beyond the miniFAT")
          s = miniFat(s); g += 1
        }
        java.util.Arrays.copyOfRange(out.toByteArray, 0, e.size.toInt)
      } else chain(e.startSector, e.size)

    entries.find(e => e.entryType == 2 && e.name == "Workbook")
      .orElse(entries.find(e => e.entryType == 2 && e.name.equalsIgnoreCase("workbook")))
      .map(readStream)
      .getOrElse {
        if (entries.exists(e => e.entryType == 2 && e.name.equalsIgnoreCase("book")))
          throw new UnsupportedOperationException(
            s"$source is a pre-BIFF8 (Excel 5.0/95) .xls workbook ('Book' stream); " +
              "only Excel 97+ BIFF8 .xls is supported — re-save it in a newer format")
        throw new IllegalArgumentException(
          s"$source: OLE2 file has no Workbook stream (streams: " +
            entries.filter(_.entryType == 2).map(_.name).mkString(", ") + ")")
      }
  }

  // ---------------------------------------------------------------
  // BIFF8 record stream
  // ---------------------------------------------------------------

  private object RecId {
    val Bof = 0x0809; val Eof = 0x000a; val Continue = 0x003c
    val Sst = 0x00fc; val BoundSheet = 0x0085; val DateMode = 0x0022
    val Format = 0x041e; val Xf = 0x00e0
    val Number = 0x0203; val Rk = 0x027e; val MulRk = 0x00bd
    val LabelSst = 0x00fd; val Label = 0x0204; val BoolErr = 0x0205
    val Formula = 0x0006; val StringRec = 0x0207
    val Dimensions = 0x0200; val CodePage = 0x0042
  }

  private final case class Rec(id: Int, data: Array[Byte])

  private def readRecords(stream: Array[Byte], start: Int, source: String): Vector[Rec] = {
    val out = Vector.newBuilder[Rec]
    var off = start
    var done = false
    while (!done && off + 4 <= stream.length) {
      val id = u16(stream, off)
      val len = u16(stream, off + 2)
      if (id == 0) done = true // zero padding after the last EOF
      else {
        val end = math.min(off + 4 + len, stream.length)
        out += Rec(id, java.util.Arrays.copyOfRange(stream, off + 4, end))
        off = off + 4 + len
        if (id == RecId.Eof) done = true
      }
    }
    out.result()
  }

  /** One BIFF substream (globals or one sheet) = records up to and
    * including its EOF.
    */
  private def substreamAt(stream: Array[Byte], offset: Int, source: String): Vector[Rec] = {
    require(offset >= 0 && offset + 4 <= stream.length,
      s"$source: BIFF substream offset $offset out of range")
    readRecords(stream, offset, source)
  }

  // ---------------------------------------------------------------
  // strings
  // ---------------------------------------------------------------

  /** XLUnicodeString / ShortXLUnicodeString inside ONE record:
    * returns (value, bytesConsumed). `lenBytes` is 2 (cch as u16) or
    * 1 (cch as u8).
    */
  private def readUnicode(b: Array[Byte], off: Int, lenBytes: Int): (String, Int) = {
    val cch = if (lenBytes == 2) u16(b, off) else u8(b, off)
    var o = off + lenBytes
    val flags = u8(b, o); o += 1
    val high = (flags & 0x01) != 0
    val rich = (flags & 0x08) != 0
    val ext = (flags & 0x04) != 0
    val cRun = if (rich) { val v = u16(b, o); o += 2; v } else 0
    val cbExt = if (ext) { val v = i32(b, o); o += 4; v } else 0
    val s =
      if (high) new String(b, o, cch * 2, StandardCharsets.UTF_16LE)
      else new String(b, o, cch, StandardCharsets.ISO_8859_1)
    o += cch * (if (high) 2 else 1)
    o += cRun * 4 + cbExt
    (s, o - off)
  }

  /** SST with CONTINUE spillover. Chunks = the SST record's payload
    * followed by its CONTINUE payloads. String headers are atomic
    * within a chunk ([MS-XLS] 2.5.293); character runs may split, and
    * each continuation re-emits the option-flags byte.
    */
  private def parseSst(chunks: IndexedSeq[Array[Byte]], source: String): Vector[String] = {
    val unique = i32(chunks.head, 4)
    var ci = 0
    var off = 8
    def ensure(width: Int): Unit = {
      while (off >= chunks(ci).length && ci < chunks.length - 1) { ci += 1; off = 0 }
      require(off + width <= chunks(ci).length,
        s"$source: malformed SST (field of $width bytes split across CONTINUE)")
    }
    def readU8(): Int = { ensure(1); val v = u8(chunks(ci), off); off += 1; v }
    def readU16(): Int = { ensure(2); val v = u16(chunks(ci), off); off += 2; v }
    def readI32(): Int = { ensure(4); val v = i32(chunks(ci), off); off += 4; v }
    def skip(n: Int): Unit = {
      var r = n
      while (r > 0) {
        while (off >= chunks(ci).length && ci < chunks.length - 1) { ci += 1; off = 0 }
        val take = math.min(r, chunks(ci).length - off)
        require(take > 0, s"$source: malformed SST (ran out of CONTINUE data)")
        off += take; r -= take
      }
    }
    def readString(): String = {
      val cch = readU16()
      val flags = readU8()
      var high = (flags & 0x01) != 0
      val rich = (flags & 0x08) != 0
      val ext = (flags & 0x04) != 0
      val cRun = if (rich) readU16() else 0
      val cbExt = if (ext) readI32() else 0
      val sb = new java.lang.StringBuilder(cch)
      var rem = cch
      while (rem > 0) {
        if (off >= chunks(ci).length) {
          require(ci < chunks.length - 1,
            s"$source: malformed SST (string truncated at CONTINUE boundary)")
          ci += 1; off = 0
          high = (readU8() & 0x01) != 0 // continuation re-states the encoding
        }
        val per = if (high) 2 else 1
        val avail = (chunks(ci).length - off) / per
        val take = math.min(rem, avail)
        require(take > 0, s"$source: malformed SST (no characters available)")
        if (high) sb.append(new String(chunks(ci), off, take * 2, StandardCharsets.UTF_16LE))
        else sb.append(new String(chunks(ci), off, take, StandardCharsets.ISO_8859_1))
        off += take * per
        rem -= take
      }
      skip(cRun * 4 + cbExt)
      sb.toString
    }
    Vector.fill(unique)(readString())
  }

  // ---------------------------------------------------------------
  // workbook globals
  // ---------------------------------------------------------------

  private case class Sheet(name: String, offset: Int, isWorksheet: Boolean)
  private case class Globals(date1904: Boolean, sst: Vector[String],
                             xfFormats: Vector[Int], formats: Map[Int, String],
                             sheets: Seq[Sheet])

  private def parseGlobals(stream: Array[Byte], source: String): Globals = {
    val recs = substreamAt(stream, 0, source)
    require(recs.nonEmpty && recs.head.id == RecId.Bof,
      s"$source: Workbook stream does not start with a BIFF BOF record")
    val ver = u16(recs.head.data, 0)
    if (ver != 0x0600) throw new UnsupportedOperationException(
      f"$source: BIFF version 0x$ver%04x is pre-BIFF8 (Excel 5.0/95 or older); " +
        "only Excel 97+ .xls is supported — re-save it in a newer format")
    var date1904 = false
    var sst = Vector.empty[String]
    val xfFormats = Vector.newBuilder[Int]
    val formats = Map.newBuilder[Int, String]
    val sheets = ArrayBuffer.empty[Sheet]
    var k = 0
    while (k < recs.length) {
      val r = recs(k)
      r.id match {
        case RecId.DateMode => date1904 = u16(r.data, 0) == 1
        case RecId.Xf => xfFormats += u16(r.data, 2)
        case RecId.Format =>
          val id = u16(r.data, 0)
          formats += id -> readUnicode(r.data, 2, lenBytes = 2)._1
        case RecId.BoundSheet =>
          val offset = i32(r.data, 0)
          val dt = u8(r.data, 5) // 0 = worksheet, 2 = chart, 6 = VB module
          val name = readUnicode(r.data, 6, lenBytes = 1)._1
          sheets += Sheet(name, offset, dt == 0)
        case RecId.Sst =>
          val chunks = ArrayBuffer(r.data)
          while (k + 1 < recs.length && recs(k + 1).id == RecId.Continue) {
            k += 1; chunks += recs(k).data
          }
          sst = parseSst(chunks.toIndexedSeq, source)
        case _ =>
      }
      k += 1
    }
    Globals(date1904, sst, xfFormats.result(), formats.result(), sheets.toSeq)
  }

  // ---------------------------------------------------------------
  // value rendering (string surface, xlsx-reader conventions)
  // ---------------------------------------------------------------

  // [MS-XLS] built-in number format ids (not serialized in the file)
  private val builtinDate: Set[Int] = Set(14, 15, 16, 17) ++ (27 to 36) ++ (50 to 58)
  private val builtinTime: Set[Int] = Set(18, 19, 20, 21, 45, 46, 47)
  private val builtinDateTime: Set[Int] = Set(22)

  /** 0 = plain number, 1 = date, 2 = time, 3 = datetime. */
  private def fmtKind(fmtId: Int, formats: Map[Int, String]): Int =
    if (builtinDate(fmtId)) 1
    else if (builtinTime(fmtId)) 2
    else if (builtinDateTime(fmtId)) 3
    else formats.get(fmtId).map { f =>
      val s = stripFmtLiterals(f).toLowerCase
      val hasDate = s.exists(c => c == 'y' || c == 'd') ||
        s.contains("mmm") // month names without y/d (e.g. "mmm")
      val hasTime = s.exists(c => c == 'h') || s.contains("ss")
      if (hasDate && hasTime) 3 else if (hasDate) 1 else if (hasTime) 2 else 0
    }.getOrElse(0)

  /** Drop "quoted", [bracketed] and \-escaped literal sections so
    * literal text can't fake date tokens.
    */
  private def stripFmtLiterals(f: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < f.length) {
      f.charAt(i) match {
        case '"' => i += 1; while (i < f.length && f.charAt(i) != '"') i += 1; i += 1
        case '[' => while (i < f.length && f.charAt(i) != ']') i += 1; i += 1
        case '\\' => i += 2
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def xfKind(xf: Int, g: Globals): Int =
    if (xf >= 0 && xf < g.xfFormats.length) fmtKind(g.xfFormats(xf), g.formats) else 0

  private def renderNumber(v: Double, xf: Int, g: Globals): String = {
    val kind = xfKind(xf, g)
    if (kind == 0) {
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString
    } else {
      // Excel serial: 1900 system day 0 = 1899-12-30 (the convention
      // that matches Excel for serials >= 61 despite its 1900 leap
      // bug); 1904 system day 0 = 1904-01-01
      val epoch = if (g.date1904) java.time.LocalDate.of(1904, 1, 1)
        else java.time.LocalDate.of(1899, 12, 30)
      val days = math.floor(v).toLong
      val secs = math.round((v - days) * 86400.0)
      val dt = epoch.atStartOfDay.plusDays(days).plusSeconds(secs)
      kind match {
        case 1 => dt.toLocalDate.toString
        case 2 => f"${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d"
        case _ => s"${dt.toLocalDate} ${f"${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d"}"
      }
    }
  }

  /** RK = 30-bit value + 2 control bits (int vs IEEE-high-bits,
    * divide-by-100).
    */
  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xfffffffcL) << 32)
    if ((rk & 0x01) != 0) base / 100.0 else base
  }

  // ---------------------------------------------------------------
  // worksheet cells
  // ---------------------------------------------------------------

  private def parseCells(stream: Array[Byte], sheet: Sheet, g: Globals,
                         maxRows: Int, source: String): Seq[Seq[String]] = {
    if (maxRows <= 0) return Seq.empty
    val recs = substreamAt(stream, sheet.offset, source)
    val rows = LinkedHashMap.empty[Int, ArrayBuffer[String]]
    var pendingFormulaString: Option[(Int, Int)] = None // (row, col) awaiting STRING
    var stop = false

    def put(row: Int, colIdx: Int, value: String): Unit = {
      // cells arrive row-major; a row index past the cap ends parsing
      if (!rows.contains(row) && rows.size >= maxRows) { stop = true; return }
      val buf = rows.getOrElseUpdate(row, ArrayBuffer.empty[String])
      while (buf.length < colIdx) buf += null
      if (buf.length == colIdx) buf += value else buf(colIdx) = value
    }

    var k = 0
    while (k < recs.length && !stop) {
      val r = recs(k)
      r.id match {
        case RecId.Number =>
          put(u16(r.data, 0), u16(r.data, 2),
            renderNumber(f64(r.data, 6), u16(r.data, 4), g))
        case RecId.Rk =>
          put(u16(r.data, 0), u16(r.data, 2),
            renderNumber(rkValue(i32(r.data, 6)), u16(r.data, 4), g))
        case RecId.MulRk =>
          val row = u16(r.data, 0); val colFirst = u16(r.data, 2)
          val n = (r.data.length - 6) / 6
          var j = 0
          while (j < n && !stop) {
            val o = 4 + j * 6
            put(row, colFirst + j, renderNumber(rkValue(i32(r.data, o + 2)), u16(r.data, o), g))
            j += 1
          }
        case RecId.LabelSst =>
          val idx = i32(r.data, 6)
          require(idx >= 0 && idx < g.sst.length,
            s"$source: LABELSST index $idx outside the ${g.sst.length}-entry SST")
          put(u16(r.data, 0), u16(r.data, 2), g.sst(idx))
        case RecId.Label =>
          put(u16(r.data, 0), u16(r.data, 2), readUnicode(r.data, 6, lenBytes = 2)._1)
        case RecId.BoolErr =>
          if (u8(r.data, 7) == 0) // error values surface as gaps (pandas NaN)
            put(u16(r.data, 0), u16(r.data, 2), if (u8(r.data, 6) != 0) "TRUE" else "FALSE")
        case RecId.Formula =>
          val row = u16(r.data, 0); val col = u16(r.data, 2); val xf = u16(r.data, 4)
          if (u8(r.data, 12) == 0xff && u8(r.data, 13) == 0xff) {
            u8(r.data, 6) match {
              case 0 => pendingFormulaString = Some((row, col)) // STRING follows
              case 1 => put(row, col, if (u8(r.data, 8) != 0) "TRUE" else "FALSE")
              case 3 => put(row, col, "")
              case _ => // 2 = error result: gap
            }
          } else put(row, col, renderNumber(f64(r.data, 6), xf, g))
        case RecId.StringRec =>
          pendingFormulaString.foreach { case (row, col) =>
            put(row, col, readUnicode(r.data, 0, lenBytes = 2)._1)
          }
          pendingFormulaString = None
        case _ =>
      }
      k += 1
    }
    rows.toSeq.sortBy(_._1).map(_._2.toSeq).take(maxRows)
  }

  // ---------------------------------------------------------------
  // public reader surface (mirrors Xlsx)
  // ---------------------------------------------------------------

  /** Iterate rows of one sheet as cell-string sequences (gaps ->
    * null) — the `.xls` counterpart of [[Xlsx.parseSheetRows]];
    * [[Xlsx.read]] dispatches here on the OLE2 magic.
    */
  def parseSheetRows(bytes: Array[Byte], sheetName: Option[String] = None,
                     maxRows: Int = Int.MaxValue,
                     source: String = "<bytes>"): Iterator[Seq[String]] = {
    val stream = workbookStream(bytes, source)
    val g = parseGlobals(stream, source)
    val worksheets = g.sheets.filter(_.isWorksheet)
    val sheet = sheetName match {
      case None => worksheets.headOption.getOrElse(throw new IllegalArgumentException(
        s"$source: workbook declares no worksheets"))
      case Some(n) => worksheets.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"$source: no sheet named '$n' (sheets: ${worksheets.map(_.name).mkString(", ")})"))
    }
    parseCells(stream, sheet, g, maxRows, source).iterator
  }

  /** Worksheet names in workbook order (chart/module sheets are not
    * readable targets and are excluded, matching what [[parseSheetRows]]
    * can select).
    */
  def sheetNames(bytes: Array[Byte], source: String = "<bytes>"): Seq[String] = {
    val stream = workbookStream(bytes, source)
    parseGlobals(stream, source).sheets.filter(_.isWorksheet).map(_.name)
  }

  // ---------------------------------------------------------------
  // fixture writer: BIFF8 records + CFB container
  // ---------------------------------------------------------------

  /** Cached formula result marker for the fixture writer: BIFF
    * stores the last computed value alongside the formula, and
    * readers (this one, pandas) consume that cached value. `value`
    * may be a String (emits the trailing STRING record), Double,
    * Boolean, or null (error result).
    */
  case class FormulaResult(value: Any)

  private val recordCap = 8224 // max BIFF8 record payload

  private def rec(id: Int, payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= recordCap, s"record $id payload ${payload.length}")
    val b = ByteBuffer.allocate(4 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(id.toShort).putShort(payload.length.toShort).put(payload)
    b.array
  }

  private def le(parts: (ByteBuffer => Unit)*)(size: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    parts.foreach(_(b))
    b.array
  }

  /** XLUnicodeString for single-record contexts (labels, formats,
    * boundsheet names): compressed when latin-1 suffices.
    */
  private def unicodeBytes(s: String, lenBytes: Int): Array[Byte] = {
    val high = s.exists(_ > 0xff)
    val chars =
      if (high) s.getBytes(StandardCharsets.UTF_16LE)
      else s.getBytes(StandardCharsets.ISO_8859_1)
    val b = ByteBuffer.allocate(lenBytes + 1 + chars.length).order(ByteOrder.LITTLE_ENDIAN)
    if (lenBytes == 2) b.putShort(s.length.toShort) else b.put(s.length.toByte)
    b.put((if (high) 1 else 0).toByte).put(chars)
    b.array
  }

  /** SST + CONTINUE payloads under the 8224-byte cap, re-emitting the
    * option-flags byte whenever a string's characters spill into a
    * CONTINUE (the layout [[parseSst]] consumes).
    */
  private def sstPayloads(strings: Seq[String], totalRefs: Int): Seq[Array[Byte]] = {
    val payloads = ArrayBuffer.empty[Array[Byte]]
    var cur = new java.io.ByteArrayOutputStream()
    cur.write(le(_.putInt(totalRefs), _.putInt(strings.length))(8))
    def flush(): Unit = { payloads += cur.toByteArray; cur = new java.io.ByteArrayOutputStream() }
    for (s <- strings) {
      val high = s.exists(_ > 0xff)
      val per = if (high) 2 else 1
      if (recordCap - cur.size < 3 + per) flush() // header + >=1 char atomic
      cur.write(le(_.putShort(s.length.toShort), _.put((if (high) 1 else 0).toByte))(3))
      var i = 0
      while (i < s.length) {
        if (recordCap - cur.size < per) {
          flush()
          cur.write(if (high) 1 else 0) // continuation option-flags byte
        }
        val fit = math.min(s.length - i, (recordCap - cur.size) / per)
        val chunk = s.substring(i, i + fit)
        cur.write(if (high) chunk.getBytes(StandardCharsets.UTF_16LE)
          else chunk.getBytes(StandardCharsets.ISO_8859_1))
        i += fit
      }
    }
    flush()
    payloads.toSeq
  }

  private def excelSerial(d: java.time.LocalDate, date1904: Boolean): Double = {
    val epoch = if (date1904) java.time.LocalDate.of(1904, 1, 1)
      else java.time.LocalDate.of(1899, 12, 30)
    java.time.temporal.ChronoUnit.DAYS.between(epoch, d).toDouble
  }
  private def excelSerial(dt: java.time.LocalDateTime, date1904: Boolean): Double =
    excelSerial(dt.toLocalDate, date1904) + dt.toLocalTime.toSecondOfDay / 86400.0

  // writer XF indices: 15 style XFs then cell XFs general/date/datetime
  private val xfGeneral = 15; private val xfDate = 16; private val xfDateTime = 17

  /** 30-bit signed range an RK integer can carry. */
  private def rkable(i: Int): Boolean = i >= -0x20000000 && i < 0x20000000

  private def cellRecs(row: Int, cells: Seq[Any], sstIdx: collection.Map[String, Int],
                       date1904: Boolean): Seq[Array[Byte]] = {
    def head(col: Int, xf: Int)(rest: (ByteBuffer => Unit)*)(size: Int): Array[Byte] = {
      val h: ByteBuffer => Unit =
        b => { b.putShort(row.toShort); b.putShort(col.toShort); b.putShort(xf.toShort) }
      le((h +: rest): _*)(6 + size)
    }
    def number(col: Int, xf: Int, v: Double): Array[Byte] =
      rec(RecId.Number, head(col, xf)(_.putDouble(v))(8))
    val out = ArrayBuffer.empty[Array[Byte]]
    var c = 0
    while (c < cells.length) {
      cells(c) match {
        case null => c += 1
        case i: Int if rkable(i) =>
          // runs of >=2 RK-able ints become one MULRK (coverage for
          // the dominant numeric layout real writers emit)
          var end = c
          while (end < cells.length &&
            (cells(end) match { case j: Int => rkable(j); case _ => false })) end += 1
          if (end - c >= 2) {
            val b = ByteBuffer.allocate(6 + (end - c) * 6)
              .order(ByteOrder.LITTLE_ENDIAN)
            b.putShort(row.toShort).putShort(c.toShort)
            (c until end).foreach { cc =>
              b.putShort(xfGeneral.toShort)
              b.putInt((cells(cc).asInstanceOf[Int] << 2) | 0x02)
            }
            b.putShort((end - 1).toShort)
            out += rec(RecId.MulRk, b.array)
            c = end
          } else {
            out += rec(RecId.Rk, head(c, xfGeneral)(_.putInt((i << 2) | 0x02))(4))
            c += 1
          }
        case i: Int => out += number(c, xfGeneral, i.toDouble); c += 1
        case l: Long => out += number(c, xfGeneral, l.toDouble); c += 1
        case d: Double => out += number(c, xfGeneral, d); c += 1
        case b: Boolean =>
          out += rec(RecId.BoolErr,
            head(c, xfGeneral)(_.put((if (b) 1 else 0).toByte), _.put(0.toByte))(2))
          c += 1
        case d: java.time.LocalDate =>
          out += number(c, xfDate, excelSerial(d, date1904)); c += 1
        case dt: java.time.LocalDateTime =>
          out += number(c, xfDateTime, excelSerial(dt, date1904)); c += 1
        case FormulaResult(v) =>
          // FORMULA: cached result (8B), grbit(2), chn(4), cce(2)=0
          def formula(cached: Array[Byte]): Array[Byte] =
            rec(RecId.Formula, head(c, xfGeneral)(
              _.put(cached), _.putShort(0.toShort), _.putInt(0), _.putShort(0.toShort))(16))
          v match {
            case d: Double => out += formula(le(_.putDouble(d))(8))
            case s: String =>
              out += formula(Array[Byte](0, 0, 0, 0, 0, 0, -1, -1))
              out += rec(RecId.StringRec, unicodeBytes(s, lenBytes = 2))
            case b: Boolean =>
              out += formula(Array[Byte](1, 0, (if (b) 1 else 0).toByte, 0, 0, 0, -1, -1))
            case null =>
              out += formula(Array[Byte](2, 0, 0x0f, 0, 0, 0, -1, -1)) // #VALUE!
            case other => throw new IllegalArgumentException(
              s"unsupported formula result: $other")
          }
          c += 1
        case s =>
          out += rec(RecId.LabelSst, head(c, xfGeneral)(_.putInt(sstIdx(s.toString)))(4))
          c += 1
      }
    }
    out.toSeq
  }

  /** Write one `.xls` (single sheet) — driver-side fixture/small-dim
    * utility, parity with [[Xlsx.write]].
    */
  def write(path: String, header: Seq[String], rows: Seq[Seq[Any]],
            date1904: Boolean = false): Unit =
    writeSheets(path, Seq(("Sheet1", header, rows)), date1904)

  /** Multi-sheet `.xls` writer: each entry is (sheetName, header,
    * rows). Emits BIFF8 inside a spec-shaped CFB container; the
    * workbook stream lands in the mini stream when < 4096 bytes and
    * in regular FAT sectors otherwise, exactly as [MS-CFB] requires.
    */
  def writeSheets(path: String,
                  sheetsToWrite: Seq[(String, Seq[String], Seq[Seq[Any]])],
                  date1904: Boolean = false): Unit = {
    require(sheetsToWrite.nonEmpty, "need at least one sheet")
    // SST: unique strings across all sheets, in first-seen order
    val sstOrder = LinkedHashMap.empty[String, Int]
    var refs = 0
    def collect(v: Any): Unit = v match {
      case null | _: Int | _: Long | _: Double | _: Boolean |
           _: java.time.LocalDate | _: java.time.LocalDateTime | _: FormulaResult =>
      case s => refs += 1; sstOrder.getOrElseUpdate(s.toString, sstOrder.size)
    }
    sheetsToWrite.foreach { case (_, header, rows) =>
      header.foreach(collect); rows.foreach(_.foreach(collect))
    }

    def bof(dt: Int): Array[Byte] =
      rec(RecId.Bof, le(_.putShort(0x0600.toShort), _.putShort(dt.toShort),
        _.putShort(0x0dbb.toShort), _.putShort(0x07cc.toShort),
        _.putInt(0), _.putInt(0))(16))
    val eof = rec(RecId.Eof, Array.emptyByteArray)

    val sheetBlocks: Seq[Array[Byte]] = sheetsToWrite.map { case (_, header, rows) =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0010))
      val width = (header.length +: rows.map(_.length)).max
      out.write(rec(RecId.Dimensions, le(_.putInt(0), _.putInt(rows.length + 1),
        _.putShort(0.toShort), _.putShort(width.toShort), _.putShort(0.toShort))(14)))
      val allRows = header +: rows
      allRows.zipWithIndex.foreach { case (cells, r) =>
        cellRecs(r, cells, sstOrder, date1904).foreach(out.write)
      }
      out.write(eof)
      out.toByteArray
    }

    def globals(sheetOffsets: Seq[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0005))
      out.write(rec(RecId.CodePage, le(_.putShort(0x04b0.toShort))(2))) // UTF-16
      out.write(rec(RecId.DateMode, le(_.putShort((if (date1904) 1 else 0).toShort))(2)))
      // 15 style XFs + the cell XFs the writer references
      val xfFmts = Seq.fill(15)(0) ++ Seq(0, 14, 22)
      xfFmts.foreach { fmt =>
        out.write(rec(RecId.Xf, le(_.putShort(0.toShort), _.putShort(fmt.toShort),
          _.putShort(0.toShort), _.putShort(0.toShort), _.putShort(0.toShort),
          _.putShort(0.toShort), _.putInt(0), _.putInt(0))(20)))
      }
      sheetsToWrite.zip(sheetOffsets).foreach { case ((name, _, _), off) =>
        val nameBytes = unicodeBytes(name, lenBytes = 1)
        val b = ByteBuffer.allocate(6 + nameBytes.length).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(off).put(0.toByte).put(0.toByte).put(nameBytes)
        out.write(rec(RecId.BoundSheet, b.array))
      }
      if (sstOrder.nonEmpty) {
        val payloads = sstPayloads(sstOrder.keys.toSeq, refs)
        out.write(rec(RecId.Sst, payloads.head))
        payloads.tail.foreach(p => out.write(rec(RecId.Continue, p)))
      }
      out.write(eof)
      out.toByteArray
    }

    // two-pass: globals length does not depend on the offset values
    val globalsLen = globals(Seq.fill(sheetsToWrite.length)(0)).length
    val offsets = sheetBlocks.scanLeft(globalsLen)(_ + _.length).init
    val stream = globals(offsets) ++ sheetBlocks.flatten

    Files.write(Paths.get(path), cfbContainer("Workbook", stream))
  }

  /** Wrap one stream in a minimal [MS-CFB] v3 compound file (512-byte
    * sectors). Streams under the 4096-byte cutoff go through the mini
    * stream + miniFAT (as the spec requires — readers look there);
    * larger streams use regular FAT sectors. Exposed to specs so the
    * BIFF5-rejection path can be fixtured with a 'Book' stream.
    */
  private[graft] def cfbContainer(streamName: String, stream: Array[Byte]): Array[Byte] = {
    val EOC = 0xfffffffe; val FREE = 0xffffffff; val FATSECT = 0xfffffffd
    val secSize = 512; val miniSize = 64; val cutoff = 4096
    val useMini = stream.length < cutoff

    def dirEntry(name: String, entryType: Int, child: Int,
                 start: Int, size: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val nameBytes = name.getBytes(StandardCharsets.UTF_16LE)
      b.put(nameBytes)
      b.position(64); b.putShort((nameBytes.length + 2).toShort)
      b.put(entryType.toByte); b.put(1.toByte) // black
      b.putInt(-1); b.putInt(-1); b.putInt(child)
      b.position(116); b.putInt(start); b.putInt(size.toInt); b.putInt(0)
      b.array
    }
    def freeEntry: Array[Byte] = {
      val b = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      b.position(68); b.putInt(-1); b.putInt(-1); b.putInt(-1)
      b.array
    }
    def intsSector(values: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(secSize).order(ByteOrder.LITTLE_ENDIAN)
      values.take(secSize / 4).foreach(b.putInt)
      (values.length until secSize / 4).foreach(_ => b.putInt(FREE))
      b.array
    }
    def pad(data: Array[Byte], unit: Int): Array[Byte] = {
      val n = (data.length + unit - 1) / unit * unit
      java.util.Arrays.copyOf(data, math.max(n, unit))
    }

    val (sectors, fat, dirSector, firstMiniFat, nMiniFat, rootStart, rootSize,
         streamStart) =
      if (useMini) {
        val container = pad(stream, miniSize)
        val nMini = container.length / miniSize
        val containerPadded = pad(container, secSize)
        val m = containerPadded.length / secSize
        // layout: 0 FAT, 1 dir, 2 miniFAT, 3.. mini-stream container
        val fatVals = Seq(FATSECT, EOC, EOC) ++
          (0 until m).map(j => if (j == m - 1) EOC else 4 + j)
        val miniFatVals = (0 until nMini).map(j => if (j == nMini - 1) EOC else j + 1)
        val secs = ArrayBuffer[Array[Byte]]()
        secs += intsSector(fatVals) // patched below via fat return
        secs += Array.empty // dir placeholder
        secs += intsSector(miniFatVals)
        (0 until m).foreach(j => secs +=
          java.util.Arrays.copyOfRange(containerPadded, j * secSize, (j + 1) * secSize))
        (secs, fatVals, 1, 2, 1, 3, container.length.toLong, 0)
      } else {
        val data = pad(stream, secSize)
        val nData = data.length / secSize
        // layout: 0..nFat-1 FAT, nFat dir, then data
        var nFat = 1
        while (nFat * (secSize / 4) < nFat + 1 + nData) nFat += 1
        require(nFat <= 109, "fixture stream too large for header DIFAT")
        val dataStart = nFat + 1
        val fatVals = Seq.fill(nFat)(FATSECT) ++ Seq(EOC) ++
          (0 until nData).map(j => if (j == nData - 1) EOC else dataStart + j + 1)
        val secs = ArrayBuffer[Array[Byte]]()
        val perSec = secSize / 4
        (0 until nFat).foreach(i =>
          secs += intsSector(fatVals.slice(i * perSec, (i + 1) * perSec)))
        secs += Array.empty // dir placeholder
        (0 until nData).foreach(j => secs +=
          java.util.Arrays.copyOfRange(data, j * secSize, (j + 1) * secSize))
        (secs, fatVals, nFat, EOC, 0, EOC, 0L, dataStart)
      }

    val dir = new java.io.ByteArrayOutputStream()
    dir.write(dirEntry("Root Entry", 5, child = 1, rootStart, rootSize))
    dir.write(dirEntry(streamName, 2, child = -1,
      if (useMini) 0 else streamStart, stream.length.toLong))
    dir.write(freeEntry); dir.write(freeEntry)
    sectors(dirSector) = dir.toByteArray

    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    header.position(24); header.putShort(0x003e.toShort) // minor
    header.putShort(0x0003.toShort) // major (v3 = 512B sectors)
    header.putShort(0xfffe.toShort) // little-endian marker
    header.putShort(9.toShort) // sector shift
    header.putShort(6.toShort) // mini sector shift
    header.position(44)
    val nFatSectors = fat.count(_ == 0xfffffffd)
    header.putInt(nFatSectors)
    header.putInt(dirSector) // first directory sector
    header.putInt(0)
    header.putInt(4096) // mini stream cutoff
    header.putInt(firstMiniFat)
    header.putInt(nMiniFat)
    header.putInt(EOC) // first DIFAT sector
    header.putInt(0) // DIFAT sector count
    (0 until 109).foreach(i =>
      header.putInt(if (i < nFatSectors) i else FREE))

    val out = new java.io.ByteArrayOutputStream()
    out.write(header.array)
    sectors.foreach(out.write)
    out.toByteArray
  }
}
