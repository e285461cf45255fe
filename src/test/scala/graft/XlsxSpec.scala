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
}
