package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Path}
import graft.sources.Sources

/** Mixed-encoding CSV ingestion (reference
  * pattern_based_cleaner_watcher.py:170-178: per-file fallback chain).
  * Each fixture is written in a legacy encoding alongside a UTF-8
  * twin with identical logical content; the auto-charset reader must
  * produce exactly the twin's rows.
  */
class SourcesSpec extends SparkSpec {

  private val header = "id,name,price"
  private val rowsByFile = Map(
    "a.csv" -> Seq("1,café crème,3.50", "2,naïve déjà-vu,8.00"),
    "b.csv" -> Seq("3,smörgåsbord,12.25", "4,jalapeño,2.10"),
    // 0x80 (€) and 0x93/0x94 (curly quotes) exist in cp1252 but are
    // control chars in latin1 — decoding these as latin1 would corrupt
    "c.csv" -> Seq("5,€100 “deal”,99.99", "6,Zürich—Genève,45.00"),
    "d.csv" -> Seq("7,plain ascii,1.00"))

  private def writeFixtures(): (Path, Path) = {
    val mixed = Files.createTempDirectory("graft_csv_mixed")
    val utf8 = Files.createTempDirectory("graft_csv_utf8")
    def write(dir: Path, name: String, charset: Charset, bom: Boolean): Unit = {
      val text = (header +: rowsByFile(name)).mkString("\n")
      val bytes = text.getBytes(charset)
      val out = if (bom) Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ bytes
                else bytes
      Files.write(dir.resolve(name), out)
    }
    write(mixed, "a.csv", Charset.forName("ISO-8859-1"), bom = false)
    write(mixed, "b.csv", Charset.forName("UTF-8"), bom = true) // utf-8-sig
    write(mixed, "c.csv", Charset.forName("windows-1252"), bom = false)
    write(mixed, "d.csv", Charset.forName("UTF-8"), bom = false)
    rowsByFile.keys.foreach(n => write(utf8, n, Charset.forName("UTF-8"), bom = false))
    (mixed, utf8)
  }

  test("csvAutoCharset decodes a mixed latin1/cp1252/utf-8-sig/utf-8 drop zone") {
    val (mixed, utf8) = writeFixtures()
    val got = Sources.csvAutoCharset(spark, mixed.toString)
    val want = Sources.csv(spark, utf8.toString)
    assert(got.columns.toSeq == Seq("id", "name", "price"),
      s"BOM or mis-decode corrupted the header: ${got.columns.toSeq}")
    val g = got.collect().map(_.toSeq).toSet
    val w = want.collect().map(_.toSeq).toSet
    assert(g == w, s"mixed-encoding read diverged from the UTF-8 twins:\n" +
      s"only in mixed: ${g -- w}\nonly in utf8: ${w -- g}")
    assert(g.size == rowsByFile.values.map(_.size).sum)
    // glob patterns resolve the same file set
    val viaGlob = Sources.csvAutoCharset(spark, s"$mixed/*.csv")
      .collect().map(_.toSeq).toSet
    assert(viaGlob == w, "glob path should read the same rows")
  }

  test("csvAutoCharset with an explicit schema skips inference and still unions") {
    val (mixed, _) = writeFixtures()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id INT, name STRING, price DOUBLE")
    val got = Sources.csvAutoCharset(spark, mixed.toString, Some(schema))
    assert(got.schema == schema)
    assert(got.count() == rowsByFile.values.map(_.size).sum)
    val names = got.collect().map(_.getString(1)).toSet
    assert(names.contains("€100 “deal”"), s"cp1252 high bytes corrupted: $names")
    assert(names.contains("café crème"), s"latin1 bytes corrupted: $names")
  }

  test("charsetReport exposes each file's detection decision for audit") {
    val (mixed, _) = writeFixtures()
    val report = Sources.charsetReport(spark, mixed.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(report("a.csv") == "windows-1252") // latin1 bytes, same decode path
    assert(report("b.csv") == "UTF-8")        // BOM'd
    assert(report("c.csv") == "windows-1252")
    assert(report("d.csv") == "UTF-8")
  }

  test("BOM'd UTF-16 decodes losslessly through the rescue reader") {
    val dir = Files.createTempDirectory("graft_utf16")
    // java's "UTF-16" encoder emits a BOM; the file reader must split
    // lines correctly despite \n being two bytes here
    Files.write(dir.resolve("wide.csv"),
      "id,name\n1,Zürich\n2,naïve\n".getBytes("UTF-16"))
    Files.writeString(dir.resolve("plain.csv"), "id,name\n3,ascii\n")
    val report = Sources.charsetReport(spark, dir.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(report("wide.csv") == "UTF-16", report.toString)
    val rows = Sources.csvAutoCharset(spark, dir.toString)
      .selectExpr("cast(id as string) AS id", "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("1", "Zürich"), ("2", "naïve"), ("3", "ascii")))
  }

  test("undecodable files land through the lossy last resort with an audit row") {
    val dir = Files.createTempDirectory("graft_lossy")
    Files.writeString(dir.resolve("clean.csv"), "id,name\n1,ok\n")
    // mixed garbage: valid CSV structure, but NUL-dense with invalid
    // UTF-8 bytes — no detected charset decodes this as text
    val junk = "id,name\n2,".getBytes("UTF-8") ++
      Array[Byte](0, 0, 0, 0xff.toByte, 0xfe.toByte, 0, 0) ++
      "end\n3,fine\n".getBytes("UTF-8")
    Files.write(dir.resolve("garbage.csv"), junk)
    val report = Sources.charsetReport(spark, dir.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(report("garbage.csv") == "utf-8-lossy", report.toString)
    // the batch is not poisoned: every row of every file lands; the
    // mangled value carries U+FFFD replacement marks
    val got = Sources.csvAutoCharset(spark, dir.toString)
      .selectExpr("cast(id as string) AS id", "name")
    assert(got.count() == 3, got.collect().mkString(", "))
    val ids = got.collect().map(_.getString(0)).toSet
    assert(ids == Set("1", "2", "3"))
    val mangled = got.collect().map(_.getString(1)).filter(_ != null)
      .find(_.contains('�'))
    assert(mangled.isDefined, "replacement marks must surface in the data")
    // and the audit row records the file + how much was replaced
    val log = Sources.lossyDecodeLog(spark, dir.toString, batchId = "b9")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(log.length == 1)
    val (st, reason, name, batch, nRepl) = log.head
    assert(st == "warning" && reason == "lossy_decode" &&
      name == "garbage.csv" && batch == "b9" && nRepl > 0, log.toString)
  }

  test("BOM'd UTF-32 routes through the rescue reader, not the UTF-16 branch") {
    val dir = Files.createTempDirectory("graft_utf32")
    // UTF-32LE BOM (FF FE 00 00) has the UTF-16LE BOM as its prefix —
    // the regression ADVICE r5 flagged: the 2-byte check claimed it
    // and produced NUL-riddled rows
    val text = "id,name\n1,Zürich\n2,naïve\n"
    Files.write(dir.resolve("le.csv"),
      Array[Byte](0xff.toByte, 0xfe.toByte, 0, 0) ++ text.getBytes("UTF-32LE"))
    Files.write(dir.resolve("be.csv"),
      Array[Byte](0, 0, 0xfe.toByte, 0xff.toByte) ++
        "id,name\n3,Genève\n".getBytes("UTF-32BE"))
    Files.writeString(dir.resolve("plain.csv"), "id,name\n4,ascii\n")
    val report = Sources.charsetReport(spark, dir.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(report("le.csv") == "UTF-32", report.toString)
    assert(report("be.csv") == "UTF-32", report.toString)
    val rows = Sources.csvAutoCharset(spark, dir.toString)
      .selectExpr("cast(id as string) AS id", "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("1", "Zürich"), ("2", "naïve"),
      ("3", "Genève"), ("4", "ascii")))
    // lossless: no replacement marks anywhere
    assert(!rows.exists(r => r._2 != null && r._2.contains('�')))
  }

  test("oversized rescue files reject loudly instead of buffering on the driver") {
    val dir = Files.createTempDirectory("graft_rescue_cap")
    Files.write(dir.resolve("wide.csv"),
      "id,name\n1,Zürich\n".getBytes("UTF-16"))
    Files.writeString(dir.resolve("plain.csv"), "id,name\n2,ascii\n")
    // cap below the UTF-16 file's size: the read must fail with the
    // gate reason BEFORE any whole-file buffering
    val e = intercept[java.io.IOException] {
      Sources.csvAutoCharset(spark, dir.toString, maxRescueBytes = 8)
    }
    assert(e.getMessage.startsWith("file_too_large_for_rescue"), e.getMessage)
    assert(e.getMessage.contains("wide.csv"), e.getMessage)
    // a real cap admits the same drop
    assert(Sources.csvAutoCharset(spark, dir.toString).count() == 2)

    // lossyDecodeLog: an over-cap lossy file gets the gate reason as
    // its audit row (null replacement count — it was never decoded)
    val junk = "id,name\n9,".getBytes("UTF-8") ++
      Array[Byte](0, 0, 0, 0xff.toByte, 0xfe.toByte, 0, 0) ++
      "end\n".getBytes("UTF-8")
    Files.write(dir.resolve("garbage.csv"), junk)
    val log = Sources.lossyDecodeLog(spark, dir.toString, batchId = "b1",
        maxRescueBytes = 4)
      .collect().map(r => (r.getString(1), r.getString(2), r.isNullAt(4))).toSeq
    assert(log == Seq(("file_too_large_for_rescue", "garbage.csv", true)))
  }

  test("Excel readers reject oversized workbooks before materializing them") {
    val dir = Files.createTempDirectory("graft_xlsx_cap")
    graft.sources.Xlsx.write(dir.resolve("t.xlsx").toString,
      Seq("id", "name"), Seq(Seq("1", "a")))
    val e = intercept[java.io.IOException] {
      graft.sources.Xlsx.read(spark, s"$dir/t.xlsx", maxFileBytes = 16).count()
    }
    assert(e.getMessage.startsWith("file_too_large_for_rescue"), e.getMessage)
    // default cap admits the drop-zone-sized workbook
    assert(graft.sources.Xlsx.read(spark, s"$dir/t.xlsx").count() == 1)
  }

  test("fileGateStable defers in-flight files instead of rejecting them") {
    val dir = Files.createTempDirectory("graft_stable_gate")
    Files.writeString(dir.resolve("complete.csv"), "a,b\n1,2\n")
    Files.writeString(dir.resolve("empty.csv"), "")
    val growing = dir.resolve("inflight.csv")
    Files.writeString(growing, "a,b\n1,2\n")
    val gates = graft.QualityGates(maxFileSizeMb = None,
      skipEmptyFiles = true, requireHeaders = true)
    // the onWindow seam grows the file INSIDE the stability window —
    // deterministic, no timer race
    val (accepted, rejected, deferred) = Sources.fileGateStable(
      spark, dir.toString, gates, stableMillis = 1,
      onWindow = () => Files.writeString(growing, "3,4\n",
        java.nio.file.StandardOpenOption.APPEND))
    assert(accepted.map(p => new org.apache.hadoop.fs.Path(p).getName) ==
      Seq("complete.csv"))
    assert(rejected == Seq("empty.csv" -> "empty_file"))
    assert(deferred.map(p => new org.apache.hadoop.fs.Path(p).getName) ==
      Seq("inflight.csv"))
    // next pass, writer finished: the file gates normally
    val (accepted2, _, deferred2) = Sources.fileGateStable(
      spark, dir.toString, gates, stableMillis = 1)
    assert(deferred2.isEmpty)
    assert(accepted2.map(p => new org.apache.hadoop.fs.Path(p).getName).sorted ==
      Seq("complete.csv", "inflight.csv"))
    // a file deleted inside the window (producer renamed it away) defers
    val vanishing = dir.resolve("vanish.csv")
    Files.writeString(vanishing, "a,b\n9,9\n")
    val (_, _, deferred3) = Sources.fileGateStable(
      spark, dir.toString, gates, stableMillis = 1,
      onWindow = () => Files.delete(vanishing))
    assert(deferred3.map(p => new org.apache.hadoop.fs.Path(p).getName) ==
      Seq("vanish.csv"))
  }

  test("stableStagingPass moves only stable files into the watched dir") {
    val landing = Files.createTempDirectory("graft_landing")
    val stage = Files.createTempDirectory("graft_stage").resolve("watched")
    Files.writeString(landing.resolve("done.csv"), "a\n1\n")
    val growing = landing.resolve("writing.csv")
    Files.writeString(growing, "a\n1\n")
    val (staged, deferred) = Sources.stableStagingPass(
      spark, landing.toString, stage.toString, stableMillis = 1,
      onWindow = () => Files.writeString(growing, "2\n",
        java.nio.file.StandardOpenOption.APPEND))
    assert(staged.map(p => new org.apache.hadoop.fs.Path(p).getName) == Seq("done.csv"))
    assert(deferred.map(p => new org.apache.hadoop.fs.Path(p).getName) == Seq("writing.csv"))
    // the stable file MOVED (rename, not copy): gone from landing
    assert(!Files.exists(landing.resolve("done.csv")))
    assert(Files.exists(stage.resolve("done.csv")))
    // second pass: the writer has finished, the file stages complete
    val (staged2, deferred2) = Sources.stableStagingPass(
      spark, landing.toString, stage.toString, stableMillis = 1)
    assert(staged2.map(p => new org.apache.hadoop.fs.Path(p).getName) == Seq("writing.csv"))
    assert(deferred2.isEmpty)
    assert(Files.readString(stage.resolve("writing.csv")) == "a\n1\n2\n")
  }

  test("stableStagingPass stages a recurring same-named drop under a fresh name") {
    val landing = Files.createTempDirectory("graft_landing_rec")
    val stage = Files.createTempDirectory("graft_stage_rec").resolve("watched")
    // day 1: orders.csv stages under its own name
    Files.writeString(landing.resolve("orders.csv"), "a\n1\n")
    val (staged1, _) = Sources.stableStagingPass(
      spark, landing.toString, stage.toString, stableMillis = 1)
    assert(staged1.map(p => new org.apache.hadoop.fs.Path(p).getName) ==
      Seq("orders.csv"))
    // day 2: a NEW orders.csv lands while the staged one is still
    // there — the old behavior deferred it forever (ADVICE r5);
    // it must stage under a collision-proof name instead
    Files.writeString(landing.resolve("orders.csv"), "a\n2\n")
    val (staged2, deferred2) = Sources.stableStagingPass(
      spark, landing.toString, stage.toString, stableMillis = 1)
    assert(deferred2.isEmpty, s"recurring drop starved: $deferred2")
    assert(staged2.size == 1)
    val newName = new org.apache.hadoop.fs.Path(staged2.head).getName
    assert(newName != "orders.csv" && newName.startsWith("orders-") &&
      newName.endsWith(".csv"), newName)
    // both generations are complete in the watched dir; landing empty
    assert(Files.readString(stage.resolve("orders.csv")) == "a\n1\n")
    assert(Files.readString(stage.resolve(newName)) == "a\n2\n")
    assert(!Files.exists(landing.resolve("orders.csv")))
  }

  test("stableStagingPass drops a byte-identical re-drop, stages changed bytes") {
    val landing = Files.createTempDirectory("graft_landing_retry")
    val stage = Files.createTempDirectory("graft_stage_retry").resolve("watched")
    Files.writeString(landing.resolve("orders.csv"), "a\n1\n")
    val (staged1, _) = Sources.stableStagingPass(
      spark, landing.toString, stage.toString, stableMillis = 1)
    assert(staged1.size == 1)
    // a producer RETRY re-drops the identical bytes: it must ingest
    // ONCE — the retry is consumed from landing and never staged (the
    // reference's mtime set would not reprocess it either)
    Files.writeString(landing.resolve("orders.csv"), "a\n1\n")
    val (staged2, deferred2) = Sources.stableStagingPass(
      spark, landing.toString, stage.toString, stableMillis = 1)
    assert(staged2.isEmpty && deferred2.isEmpty,
      s"identical retry re-ingested: staged=$staged2 deferred=$deferred2")
    assert(!Files.exists(landing.resolve("orders.csv")), "retry not consumed")
    val stagedNames = Files.list(stage).iterator()
    assert({ var n = 0; while (stagedNames.hasNext) { n += 1; stagedNames.next() }; n } == 1,
      "watched dir must hold exactly the one original generation")
    // same name + same LENGTH but different bytes: both must ingest
    Files.writeString(landing.resolve("orders.csv"), "a\n2\n")
    val (staged3, deferred3) = Sources.stableStagingPass(
      spark, landing.toString, stage.toString, stableMillis = 1)
    assert(deferred3.isEmpty && staged3.size == 1,
      s"changed-bytes drop lost: staged=$staged3 deferred=$deferred3")
    val newName = new org.apache.hadoop.fs.Path(staged3.head).getName
    assert(newName != "orders.csv", "changed bytes must not clobber")
    assert(Files.readString(stage.resolve(newName)) == "a\n2\n")
  }
}
