package graft

import java.nio.file.Files
import java.time.{LocalDate, LocalDateTime}

import graft.sources.{Xls, Xlsx}

class XlsSpec extends SparkSpec {

  private def led(parts: Int*): Array[Byte] = {
    // little-endian u16 sequence helper for hand-built BIFF records
    parts.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
  }

  test("write -> read round trip: strings, RK/MULRK ints, doubles, bools, formulas") {
    val dir = Files.createTempDirectory("xls_spec").toString
    Xls.write(s"$dir/t.xls", Seq("id", "name", "score", "flag", "calc"),
      Seq(
        Seq(1, "a<b>&\"c\"", 1.5, true, Xls.FormulaResult(3.0)),
        Seq(2, "plain", 2.0, false, Xls.FormulaResult("cached string")),
        Seq(3, "ünïcodé €", -12345.678, true, Xls.FormulaResult(false)),
        Seq(4, "err", 7.0, false, Xls.FormulaResult(null))))
    val rows = Xls.parseSheetRows(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/t.xls")), source = "t.xls").toSeq
    assert(rows.head == Seq("id", "name", "score", "flag", "calc"))
    assert(rows(1) == Seq("1", "a<b>&\"c\"", "1.5", "TRUE", "3"))
    assert(rows(2) == Seq("2", "plain", "2", "FALSE", "cached string"))
    assert(rows(3) == Seq("3", "ünïcodé €", "-12345.678", "TRUE", "FALSE"))
    // error formula result surfaces as a gap (null), like pandas NaN
    assert(rows(4) == Seq("4", "err", "7", "FALSE"))
  }

  test("MULRK runs and RK high-magnitude fallback decode correctly") {
    val dir = Files.createTempDirectory("xls_mulrk").toString
    // five consecutive ints -> one MULRK; the big int exceeds RK's
    // 30-bit range and must fall back to a NUMBER record
    Xls.write(s"$dir/m.xls", Seq("a", "b", "c", "d", "e", "big"),
      Seq(Seq(10, 20, 30, 40, 50, 1234567890)))
    val rows = Xls.parseSheetRows(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/m.xls"))).toSeq
    assert(rows(1) == Seq("10", "20", "30", "40", "50", "1234567890"))
  }

  test("dates render ISO in both 1900 and 1904 systems") {
    val dir = Files.createTempDirectory("xls_dates").toString
    for (mode1904 <- Seq(false, true)) {
      val f = s"$dir/d_$mode1904.xls"
      Xls.write(f, Seq("day", "moment"),
        Seq(Seq(LocalDate.of(2021, 3, 14), LocalDateTime.of(1999, 12, 31, 23, 58, 57))),
        date1904 = mode1904)
      val rows = Xls.parseSheetRows(Files.readAllBytes(
        java.nio.file.Paths.get(f)), source = f).toSeq
      assert(rows(1) == Seq("2021-03-14", "1999-12-31 23:58:57"), s"mode1904=$mode1904")
    }
  }

  test("large workbook uses regular FAT sectors; long strings span SST CONTINUE") {
    val dir = Files.createTempDirectory("xls_big").toString
    // one string > 8224 bytes forces a CONTINUE split mid-string, and
    // enough rows push the stream past the 4096-byte mini cutoff
    val longStr = ("lorem-" * 2000).take(10000)
    val uniLong = ("λörem-" * 2000).take(9000) // UTF-16 path across CONTINUE
    val rows = (1 to 200).map(i => Seq[Any](i, s"row_$i"))
    Xls.write(s"$dir/big.xls", Seq("k", "v"),
      rows :+ Seq[Any](9001, longStr) :+ Seq[Any](9002, uniLong))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/big.xls"))
    assert(bytes.length > 4096)
    val out = Xls.parseSheetRows(bytes, source = "big.xls").toSeq
    assert(out.length == 203)
    assert(out(5) == Seq("5", "row_5"))
    assert(out(201) == Seq("9001", longStr))
    assert(out(202) == Seq("9002", uniLong))
  }

  test("multi-sheet: names enumerate in order, selection by name, default first") {
    val dir = Files.createTempDirectory("xls_sheets").toString
    Xls.writeSheets(s"$dir/multi.xls", Seq(
      ("Summary", Seq("metric", "value"), Seq(Seq("rows", 2))),
      ("Detail", Seq("id", "note"), Seq(Seq(1, "first"), Seq(2, "second")))))
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/multi.xls"))
    assert(Xls.sheetNames(bytes) == Seq("Summary", "Detail"))
    assert(Xls.parseSheetRows(bytes).toSeq.head == Seq("metric", "value"))
    val detail = Xls.parseSheetRows(bytes, sheetName = Some("Detail")).toSeq
    assert(detail == Seq(Seq("id", "note"), Seq("1", "first"), Seq("2", "second")))
    val err = intercept[IllegalArgumentException] {
      Xls.parseSheetRows(bytes, sheetName = Some("Nope")).toSeq
    }
    assert(err.getMessage.contains("no sheet named 'Nope'"), err.getMessage)
  }

  test("Xlsx.read dispatches .xls transparently; .xls and .xlsx union in one glob") {
    val dir = Files.createTempDirectory("xls_union").toString
    Xls.write(s"$dir/a_old.xls", Seq("k", "v"), Seq(Seq(1, "legacy"), Seq(2, "erp")))
    Xlsx.write(s"$dir/b_new.xlsx", Seq("k", "v"), Seq(Seq(3, "modern")))
    val df = Xlsx.read(spark, s"$dir/*")
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("legacy", "erp", "modern"))
    // nrows preview caps .xls parsing the same way
    assert(Xlsx.read(spark, s"$dir/a_old.xls", nrows = Some(1)).count() == 1)
    // sheetNames path-level entry dispatches too
    assert(Xlsx.sheetNames(spark, s"$dir/a_old.xls") == Seq("Sheet1"))
  }

  test("pre-BIFF8 and non-Excel OLE2 files fail loudly") {
    // Excel 5.0/95 stores a 'Book' stream: reject by stream name
    val biff5Bof = led(0x0809, 8, 0x0500, 0x0005, 0, 0)
    val book = Xls.cfbContainer("Book", biff5Bof ++ led(0x000a, 0))
    val e1 = intercept[UnsupportedOperationException] {
      Xls.parseSheetRows(book, source = "old95.xls").toSeq
    }
    assert(e1.getMessage.contains("pre-BIFF8"), e1.getMessage)
    // a 'Workbook' stream whose BOF says BIFF5: reject by version
    val fakeWb = Xls.cfbContainer("Workbook", biff5Bof ++ led(0x000a, 0))
    val e2 = intercept[UnsupportedOperationException] {
      Xls.parseSheetRows(fakeWb, source = "odd.xls").toSeq
    }
    assert(e2.getMessage.contains("pre-BIFF8"), e2.getMessage)
    // an OLE2 container without any workbook stream names its streams
    val other = Xls.cfbContainer("WordDocument", new Array[Byte](64))
    val e3 = intercept[IllegalArgumentException] {
      Xls.parseSheetRows(other, source = "doc.doc").toSeq
    }
    assert(e3.getMessage.contains("no Workbook stream"), e3.getMessage)
    // truncated OLE2 garbage fails with a parse error, not a misread
    val garbage = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
      .map(_.toByte) ++ new Array[Byte](64)
    intercept[IllegalArgumentException] {
      Xls.parseSheetRows(garbage, source = "legacy.xls").toSeq
    }
  }

  test("empty cells leave gaps exactly like the xlsx reader") {
    val dir = Files.createTempDirectory("xls_gaps").toString
    Xls.write(s"$dir/g.xls", Seq("a", "b", "c"),
      Seq(Seq(null, "mid", null), Seq("left", null, "right")))
    val rows = Xls.parseSheetRows(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/g.xls"))).toSeq
    assert(rows(1) == Seq(null, "mid"))
    assert(rows(2) == Seq("left", null, "right"))
  }
}
