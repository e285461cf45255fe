package graft

import java.nio.file.Files

import graft.sources.Xlsx

class XlsxSpec extends SparkSpec {

  test("A1 column references") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA12") == 26)
    assert(Xlsx.colIndex("BC3") == 54)
  }

  test("write -> read round trip incl. escapes and numerics") {
    val dir = Files.createTempDirectory("xlsx_spec").toString
    Xlsx.write(s"$dir/t.xlsx", Seq("id", "name", "score"),
      Seq(Seq(1, "a<b>&\"c\"", 1.5), Seq(2, "plain", 2.0)))
    val df = Xlsx.read(spark, s"$dir/t.xlsx")
    assert(df.columns.toSeq == Seq("id", "name", "score"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "a<b>&\"c\"")
    assert(rows(0).getString(2) == "1.5")
  }

  test("multiple files read as one frame") {
    val dir = Files.createTempDirectory("xlsx_spec2").toString
    Xlsx.write(s"$dir/a.xlsx", Seq("k"), Seq(Seq(1), Seq(2)))
    Xlsx.write(s"$dir/b.xlsx", Seq("k"), Seq(Seq(3)))
    assert(Xlsx.read(spark, s"$dir/*.xlsx").count() == 3)
  }

  test("nrows preview caps data rows per file without parsing the rest") {
    val dir = Files.createTempDirectory("xlsx_nrows").toString
    Xlsx.write(s"$dir/a.xlsx", Seq("k"), (1 to 50).map(i => Seq[Any](i)))
    Xlsx.write(s"$dir/b.xlsx", Seq("k"), (51 to 60).map(i => Seq[Any](i)))
    val preview = Xlsx.read(spark, s"$dir/*.xlsx", nrows = Some(3))
    // 3 from the 50-row file, 3 from the 10-row file
    assert(preview.count() == 6)
    assert(Xlsx.read(spark, s"$dir/*.xlsx", nrows = Some(0)).count() == 0)
    assert(Xlsx.read(spark, s"$dir/*.xlsx").count() == 60)
    val e = intercept[IllegalArgumentException] {
      Xlsx.read(spark, s"$dir/*.xlsx", nrows = Some(-1))
    }
    assert(e.getMessage.contains("nrows"))
  }

  test("second sheet round-trips by name; default stays the first sheet") {
    val dir = Files.createTempDirectory("xlsx_sheets").toString
    Xlsx.writeSheets(s"$dir/multi.xlsx", Seq(
      ("Summary", Seq("metric", "value"), Seq(Seq("rows", 2))),
      ("Detail", Seq("id", "note"), Seq(Seq(1, "first"), Seq(2, "second")))))
    val first = Xlsx.read(spark, s"$dir/multi.xlsx")
    assert(first.columns.toSeq == Seq("metric", "value"))
    assert(first.count() == 1)
    val second = Xlsx.read(spark, s"$dir/multi.xlsx", sheetName = Some("Detail"))
    assert(second.columns.toSeq == Seq("id", "note"))
    assert(second.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("first", "second"))
    val err = intercept[Exception] {
      Xlsx.read(spark, s"$dir/multi.xlsx", sheetName = Some("Nope")).collect()
    }
    assert(err.getMessage.contains("no sheet named 'Nope'") ||
      Option(err.getCause).exists(_.getMessage.contains("no sheet named 'Nope'")),
      s"unhelpful error: ${err.getMessage}")
  }

  test("xlsm (same OOXML container) reads transparently") {
    val dir = Files.createTempDirectory("xlsm_spec").toString
    Xlsx.write(s"$dir/macro.xlsm", Seq("k", "v"), Seq(Seq(1, "x")))
    val df = Xlsx.read(spark, s"$dir/macro.xlsm")
    assert(df.columns.toSeq == Seq("k", "v") && df.count() == 1)
  }

  test("OLE2 payloads dispatch to the Xls reader; garbage fails loudly") {
    // truncated OLE2 bytes reach the BIFF8 reader and fail on parse
    // (valid .xls round trips live in XlsSpec)
    val bytes = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
      .map(_.toByte) ++ new Array[Byte](64)
    val err = intercept[IllegalArgumentException] {
      Xlsx.parseSheetRows(bytes, source = "legacy.xls").toSeq
    }
    assert(err.getMessage.contains("OLE2"), err.getMessage)
    // and garbage that is neither OLE2 nor zip also fails loudly
    val garbage = "definitely,not,a,workbook\n1,2,3,4\n".getBytes("UTF-8")
    val err2 = intercept[IllegalArgumentException] {
      Xlsx.parseSheetRows(garbage, source = "notes.txt").toSeq
    }
    assert(err2.getMessage.contains("not an OOXML workbook"), err2.getMessage)
  }

  test("ragged workbooks: strict errors, default truncates with an audit log") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_ragged").toString
    // lexicographically FIRST file supplies the (narrow) header
    Xlsx.write(s"$dir/a_narrow.xlsx", Seq("k", "v"), Seq(Seq("1", "x")))
    // later file has wider rows: the third cell would be dropped
    Xlsx.write(s"$dir/b_wide.xlsx", Seq("k", "v", "extra"),
      Seq(Seq("2", "y", "OVERFLOW"), Seq("3", "z", "OVERFLOW2")))
    // default: truncating read, two files union under the narrow header
    val df = Xlsx.read(spark, s"$dir/*.xlsx")
    assert(df.columns.toSeq == Seq("k", "v"))
    // each file's own first row is its header: 1 + 2 data rows
    assert(df.count() == 3)
    // the audit log names the offending file and counts its wide rows
    val log = Xlsx.truncationLog(spark, s"$dir/*.xlsx", batchId = "b1")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(log.toSeq == Seq(("warning", "row_wider_than_header", "b_wide.xlsx", 2L)),
      log.mkString(", "))
    // strict: the read itself fails loudly, naming the file and widths
    val err = intercept[org.apache.spark.SparkException] {
      Xlsx.read(spark, s"$dir/*.xlsx", strict = true).count()
    }
    val msg = Option(err.getCause).map(_.getMessage).getOrElse(err.getMessage)
    assert(msg.contains("b_wide.xlsx") && msg.contains("overflow cells"), msg)
  }

  test("headerless first file: strict fails loudly, default returns empty") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_nohdr").toString
    // lexicographically first file's sheet has NO rows at all, so it
    // defines a width-0 header and the default read drops every row
    // of every other file in the glob
    Xlsx.write(s"$dir/a_empty.xlsx", Seq.empty, Seq.empty)
    Xlsx.write(s"$dir/b_data.xlsx", Seq("k", "v"), Seq(Seq("1", "x"), Seq("2", "y")))
    assert(Xlsx.read(spark, s"$dir/*.xlsx").count() == 0)
    val err = intercept[IllegalStateException] {
      Xlsx.read(spark, s"$dir/*.xlsx", strict = true)
    }
    assert(err.getMessage.contains("a_empty.xlsx") &&
      err.getMessage.contains("no header row"), err.getMessage)
  }

  test("sheetNames enumerates the workbook in order") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_names").toString
    Xlsx.writeSheets(s"$dir/multi.xlsx", Seq(
      ("summary", Seq("a"), Seq(Seq("1"))),
      ("raw_data", Seq("b"), Seq(Seq("2"))),
      ("notes", Seq("c"), Seq(Seq("3")))))
    assert(Xlsx.sheetNames(spark, s"$dir/multi.xlsx") ==
      Seq("summary", "raw_data", "notes"))
    val garbage = "not,a,workbook".getBytes("UTF-8")
    intercept[IllegalArgumentException] { Xlsx.sheetNames(garbage) }
  }

  test("skipRows: header-at-row-N workbook reads through the preamble") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_skip").toString
    // row 1 = report title, row 2 = blank, row 3 = the real header
    Xlsx.write(s"$dir/r.xlsx", Seq("Quarterly report"),
      Seq(Seq(), Seq("id", "name"), Seq(1, "a"), Seq(2, "b")))
    val df = Xlsx.read(spark, s"$dir/r.xlsx", skipRows = 2)
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
    // skipRows composes with nrows: preview 1 DATA row after the skip
    assert(Xlsx.read(spark, s"$dir/r.xlsx", skipRows = 2,
      nrows = Some(1)).count() == 1)
    val e = intercept[IllegalArgumentException] {
      Xlsx.read(spark, s"$dir/r.xlsx", skipRows = -1)
    }
    assert(e.getMessage.contains("skipRows"))
  }

  test("useCols: pandas letter/range string selects original positions") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_usecols").toString
    Xlsx.write(s"$dir/u.xlsx", Seq("a", "b", "c", "d", "e"),
      Seq(Seq(1, 2, 3, 4, 5), Seq(6, 7, 8, 9, 10)))
    val df = Xlsx.read(spark, s"$dir/u.xlsx", useCols = Some("A:B,D"))
    assert(df.columns.toSeq == Seq("a", "b", "d"))
    assert(df.orderBy("a").collect().map(_.getString(2)).toSeq == Seq("4", "9"))
    // spec order does not matter; duplicates collapse (pandas keeps
    // sheet order)
    assert(Xlsx.read(spark, s"$dir/u.xlsx", useCols = Some("D,A,A"))
      .columns.toSeq == Seq("a", "d"))
    // a selected position past a short row reads null, past the header
    // gets the _c<i> placeholder name
    Xlsx.write(s"$dir/v.xlsx", Seq("k"), Seq(Seq(1)))
    val wide = Xlsx.read(spark, s"$dir/v.xlsx", useCols = Some("A,C"))
    assert(wide.columns.toSeq == Seq("k", "_c1"))
    assert(wide.collect().head.isNullAt(1))
    assert(intercept[IllegalArgumentException] {
      Xlsx.parseUseCols("C:A")
    }.getMessage.contains("descending"))
    assert(intercept[IllegalArgumentException] {
      Xlsx.parseUseCols("1,2")
    }.getMessage.contains("not an Excel column letter"))
  }

  test("skipRows + useCols compose, and dispatch to .xls transparently") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_skip_xls").toString
    graft.sources.Xls.write(s"$dir/r.xls", Seq("Legacy export"),
      Seq(Seq("id", "junk", "name"), Seq(1, "x", "a"), Seq(2, "y", "b")))
    val df = Xlsx.read(spark, s"$dir/r.xls", skipRows = 1,
      useCols = Some("A,C"))
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }
}
