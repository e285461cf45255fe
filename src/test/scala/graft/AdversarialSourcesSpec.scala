package graft

import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}

import graft.sources.{Sources, Xls, Xlsx}

/** Adversarial SOURCES rung — the third adversarial family after the
  * r14 text corpus and the r15 relational tables: hostile FILES on
  * the ingestion surface itself, the exact classes a real drop zone
  * serves (the reference is a drop-zone watcher; its whole job is
  * surviving these). Contract per class, pinned here:
  *
  *   (a) the documented permissive/rescue result lands — with every
  *       mangled row ACCOUNTED FOR in an audit frame, or
  *   (b) the read fails LOUDLY with an actionable, file-attributed
  *       error, or
  *   (c) the file gate quarantines the file before a read ever sees
  *       it.
  *
  * Never: silent wrong data, silent row loss, or an unattributable
  * OOM/hang. Crafted fixtures only — no RNG, no timing dependence.
  */
class AdversarialSourcesSpec extends SparkSpec {

  private def dir(): Path = Files.createTempDirectory("graft_advsrc")
  private def put(d: Path, name: String, bytes: Array[Byte]): Path =
    Files.write(d.resolve(name), bytes)
  private def putText(d: Path, name: String, text: String): Path =
    put(d, name, text.getBytes("UTF-8"))

  // ---------------------------------------------------------------
  // CSV: degenerate and mangled files
  // ---------------------------------------------------------------

  test("zero-byte and header-only csv: gate quarantines empty, reader yields no rows") {
    val d = dir()
    putText(d, "empty.csv", "")
    putText(d, "header_only.csv", "id,name,price")
    putText(d, "good.csv", "id,name,price\n1,ok,2.5")

    // the gate (skipEmptyFiles default true) rejects the empty file
    // with a named reason; header-only is structurally fine (a feed
    // that happened to deliver zero rows) and must pass
    val gates = QualityGates()
    val (accepted, rejected) = Sources.fileGate(spark, d.toString, gates)
    assert(rejected == Seq("empty.csv" -> "empty_file"))
    assert(accepted.map(p => Paths.get(p).getFileName.toString).sorted ==
      Seq("good.csv", "header_only.csv"))

    // reading the accepted set: exactly the one data row, no crash on
    // the row-less file
    val counts = accepted.map(p => Sources.csvAutoCharset(spark, p).count())
    assert(counts.sum == 1)
  }

  test("ragged rows under an explicit schema: PERMISSIVE nulls, corrupt column accounts for every mangled line") {
    val d = dir()
    putText(d, "ragged.csv",
      "id,name,price\n" +
        "1,ok,2.5\n" +
        "2,short\n" + // too few fields -> missing columns null
        "3,long,4.5,EXTRA,MORE\n" + // too many fields
        "4,fine,9.0")
    val schema = new StructType()
      .add("id", LongType).add("name", StringType).add("price", DoubleType)
      .add("_corrupt_record", StringType)
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema)
      .csv(d.resolve("ragged.csv").toString)
      .cache()
    import org.apache.spark.sql.functions.col
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0)).sorted
    // both ragged lines are flagged with their raw text; no line is
    // silently reshaped into a clean-looking row
    assert(corrupt.toSeq == Seq("2,short", "3,long,4.5,EXTRA,MORE"))
    assert(df.count() == 4) // every physical line landed somewhere
    df.unpersist()
  }

  test("unclosed quote swallows the file tail VISIBLY (single multiline field), never hangs") {
    val d = dir()
    putText(d, "unclosed.csv",
      "id,name\n1,\"never closed\n2,real\n3,also real")
    // Spark csv (multiLine=false) parses per line: the unclosed quote
    // makes line 1's second field the rest of that LINE; later lines
    // still parse. Pin that the read terminates and every line lands.
    val df = Sources.csv(spark, d.resolve("unclosed.csv").toString)
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.map(_.get(0).toString).toSeq == Seq("1", "2", "3"))
  }

  test("duplicate header names mangle DETERMINISTICALLY (name+ordinal), no column merged or dropped") {
    val d = dir()
    putText(d, "dup.csv", "id,name,id\n1,a,2")
    val df = Sources.csv(spark, d.resolve("dup.csv").toString)
    // Spark disambiguates duplicated header names with the column
    // ordinal (id -> id0/id2) — same spirit as pandas' id/id.1 in the
    // reference. Both payloads survive under distinct, predictable
    // names; a downstream select of the bare "id" fails at ANALYSIS
    // (unresolved column), so nothing resolves silently to the wrong
    // one of the two.
    assert(df.columns.toSeq == Seq("id0", "name", "id2"))
    val row = df.collect()(0)
    assert(row.get(0).toString == "1" && row.get(2).toString == "2")
    intercept[Exception] { df.select("id").collect() }
  }

  test("NUL bytes mid-file pass the sampled charset detector — the DOCUMENTED limit, rows still land") {
    // head and tail windows are clean ASCII; NULs only mid-file. The
    // detector samples both ends, so this decodes as UTF-8 (NUL is
    // valid UTF-8) — charsetReport is the audit surface for it.
    val d = dir()
    val mid = "2,mid\u0000dle,5.0\n"
    putText(d, "nul.csv", "id,name,price\n1,clean,1.0\n" + mid + "3,clean,2.0")
    val rep = Sources.charsetReport(spark, d.toString).collect()
    assert(rep.map(_.getString(1)).toSeq == Seq("UTF-8"))
    val df = Sources.csvAutoCharset(spark, d.toString)
    assert(df.count() == 3) // no row lost; the NUL travels as a data char
  }

  test("binary masquerade (PNG bytes named .csv) routes to the lossy rescue with an audit row") {
    val d = dir()
    // PNG magic + NUL-dense body: binary-ish by detection
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      Array.fill[Byte](256)(0) ++ "IEND".getBytes("US-ASCII")
    put(d, "image.csv", png)
    putText(d, "real.csv", "id,name\n1,ok")
    val rep = Sources.charsetReport(spark, d.toString).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rep("image.csv") == "utf-8-lossy")
    assert(rep("real.csv") == "UTF-8")
    // the union read survives, and the lossy audit names the culprit
    val audit = Sources.lossyDecodeLog(spark, d.toString).collect()
    assert(audit.length == 1 && audit(0).getString(2) == "image.csv")
    assert(audit(0).getString(1) == "lossy_decode")
  }

  // ---------------------------------------------------------------
  // JSONL: corrupt lines must be audited, not absorbed
  // ---------------------------------------------------------------

  test("jsonlAudited: good + corrupt account for every non-blank line, corrupt carries raw text and file") {
    val d = dir()
    putText(d, "mixed.jsonl",
      """{"id":1,"name":"ok"}
        |not json at all
        |{"id":2,"name":"fine"}
        |{"id":3,"name":"unclosed
        |
        |{"id":4,"name":"good"}""".stripMargin)
    val schema = new StructType().add("id", LongType).add("name", StringType)
    val r = Sources.jsonlAudited(spark, d.toString, schema)
    assert(r.good.count() == 3)
    assert(r.good.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
    val bad = r.audit.collect()
    assert(bad.length == 2)
    assert(bad.forall(_.getString(1) == "corrupt_json"))
    assert(bad.forall(_.getString(2).endsWith("mixed.jsonl")))
    val raws = bad.map(_.getString(4)).sorted.toSeq
    assert(raws == Seq("not json at all", """{"id":3,"name":"unclosed"""))
    r.release()
  }

  test("jsonl type conflict across lines: a schema makes the bad line auditable, not a silent null") {
    val d = dir()
    putText(d, "conflict.jsonl",
      """{"id":1,"v":10}
        |{"id":2,"v":{"nested":true}}""".stripMargin)
    val schema = new StructType().add("id", LongType).add("v", LongType)
    val r = Sources.jsonlAudited(spark, d.toString, schema)
    assert(r.good.count() == 1)
    assert(r.audit.count() == 1) // the object-valued v is corrupt under LongType, and says so
    r.release()
  }

  // ---------------------------------------------------------------
  // XLSX / XLS: container hostility
  // ---------------------------------------------------------------

  private def writeWorkbook(d: Path, name: String): Path = {
    val p = d.resolve(name)
    Xlsx.write(p.toString, Seq("id", "name"), Seq(Seq(1, "a"), Seq(2, "b")))
    p
  }

  test("truncated xlsx (zip cut mid-archive) fails loudly with the file named") {
    val d = dir()
    val whole = Files.readAllBytes(writeWorkbook(d, "whole.xlsx"))
    val cut = dir()
    put(cut, "cut.xlsx", whole.take(whole.length / 2))
    val e = intercept[Exception] {
      Xlsx.read(spark, cut.resolve("cut.xlsx").toString).collect()
    }
    assert(e.getMessage.contains("cut.xlsx") ||
      Option(e.getCause).exists(_.getMessage != null))
  }

  test("PK magic followed by garbage fails loudly WITH the file attributed") {
    val d = dir()
    put(d, "fake.xlsx", "PKthis is not actually a zip archive at all".getBytes("UTF-8"))
    val e = intercept[Exception] {
      Xlsx.read(spark, d.resolve("fake.xlsx").toString).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // the raw failure is an EOFException with a NULL message; the
    // reader re-throws it with the file named (attributed())
    assert(messages(e).exists(_.contains("fake.xlsx")),
      s"error must name the file: ${messages(e).mkString(" | ")}")
  }

  test("zip bomb: a small archive inflating past 64x fails as decompressed_too_large, not an OOM") {
    val d = dir()
    val p = d.resolve("bomb.xlsx")
    val out = new ZipOutputStream(Files.newOutputStream(p))
    def put(name: String, content: Array[Byte]): Unit = {
      out.putNextEntry(new ZipEntry(name)); out.write(content); out.closeEntry()
    }
    put("xl/workbook.xml",
      ("""<?xml version="1.0"?><workbook xmlns="x"><sheets>""" +
        """<sheet name="S" r:id="rId1" xmlns:r="r"/></sheets></workbook>""").getBytes("UTF-8"))
    put("xl/_rels/workbook.xml.rels",
      ("""<?xml version="1.0"?><Relationships><Relationship Id="rId1" """ +
        """Target="worksheets/sheet1.xml"/></Relationships>""").getBytes("UTF-8"))
    // ~100 MB of spaces deflates to ~100 KB: an inflation ratio far
    // past the 64x guard on a file this size
    val pad = Array.fill[Byte](100 * 1024 * 1024)(' ')
    put("xl/worksheets/sheet1.xml", pad)
    out.close()
    assert(Files.size(p) < 2L * 1024 * 1024, s"fixture should compress tiny, got ${Files.size(p)}")
    val e = intercept[Exception] {
      Xlsx.read(spark, p.toString).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("decompressed_too_large")),
      s"wanted the zip-bomb guard, got: ${messages(e).mkString(" | ")}")
  }

  test("malformed worksheet XML (valid zip, broken part) fails loudly") {
    val d = dir()
    val whole = writeWorkbook(d, "ok.xlsx")
    // rebuild the archive with the sheet part truncated mid-tag
    val src = Files.readAllBytes(whole)
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(src))
    val broken = dir().resolve("brokenxml.xlsx")
    val out = new ZipOutputStream(Files.newOutputStream(broken))
    var entry = zin.getNextEntry
    while (entry != null) {
      val content = zin.readAllBytes()
      out.putNextEntry(new ZipEntry(entry.getName))
      if (entry.getName.startsWith("xl/worksheets/"))
        out.write(content.take(content.length / 2))
      else out.write(content)
      out.closeEntry()
      entry = zin.getNextEntry
    }
    zin.close(); out.close()
    intercept[Exception] { Xlsx.read(spark, broken.toString).collect() }
  }

  test("truncated xls (OLE2 cut mid-sector) fails loudly with the source named") {
    val d = dir()
    val p = d.resolve("whole.xls")
    Xls.write(p.toString, Seq("id", "name"), Seq(Seq(1, "a"), Seq(2, "b")))
    val whole = Files.readAllBytes(p)
    val cut = dir()
    put(cut, "cut.xls", whole.take(600)) // keeps the OLE2 header, loses sectors
    val e = intercept[Exception] {
      Xlsx.read(spark, cut.resolve("cut.xls").toString).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("cut.xls")),
      s"error must name the file: ${messages(e).mkString(" | ")}")
  }

  // ---------------------------------------------------------------
  // Parquet: corruption must fail the read or be quarantined upfront
  // ---------------------------------------------------------------

  test("corrupt parquet fails the directory read loudly; magic report quarantines it upfront") {
    val d = dir()
    // one good file...
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .coalesce(1).write.parquet(d.resolve("good").toString)
    val goodFile = Files.list(d.resolve("good")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    val zone = dir()
    Files.copy(Paths.get(goodFile), zone.resolve("good.parquet"))
    // ...one truncated copy (footer gone) and one masquerade
    val bytes = Files.readAllBytes(Paths.get(goodFile))
    put(zone, "truncated.parquet", bytes.take(bytes.length - 8))
    putText(zone, "fake.parquet", "id,name\n1,alpha\n2,beta\n3,gamma\n")

    // default read of the mixed zone fails loudly — no silent row loss
    intercept[Exception] {
      Sources.parquet(spark, zone.toString).collect()
    }

    // the report names exactly the bad files with reasons
    val rep = Sources.parquetMagicReport(spark, zone.toString).collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(rep("good.parquet") == (true, "ok"))
    assert(rep("truncated.parquet") == (false, "bad_tail_magic"))
    assert(rep("fake.parquet") == (false, "bad_head_magic"))

    // quarantine recipe: read only the ok files — equals the clean read
    val okFiles = rep.collect { case (n, (true, _)) => zone.resolve(n).toString }.toSeq
    val got = spark.read.parquet(okFiles: _*)
    assert(got.count() == 2)
  }

  test("sub-12-byte parquet is too_short, not a head/tail overlap misread") {
    val d = dir()
    putText(d, "tiny.parquet", "PAR1PAR") // 8 bytes: head magic + garbage
    val rep = Sources.parquetMagicReport(spark, d.toString).collect()
    assert(rep.length == 1 && !rep(0).getBoolean(1) && rep(0).getString(2) == "too_short")
  }
}
