package graft.sources

import graft.pipeline.RunParams
import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.time.LocalDate
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Driver-side ingestion edges (S6/S7/K5) on filesystem fixtures — no
  * network, matching the zero-egress test contract. */
class IngestSpec extends AnyFunSuite {

  test("extractDataArray pulls top-level data[] elements verbatim") {
    val body =
      """{"meta": {"total": 2}, "data": [
        |  {"data": {"CERT": "1", "NAME": "A \"quoted\" bank"}},
        |  {"data": {"CERT": "2", "NAME": "B, [with] {chars}"}}
        |]}""".stripMargin
    val els = Ingest.extractDataArray(body)
    assert(els.size == 2)
    assert(els.head.contains("\"CERT\": \"1\""))
    assert(els(1).contains("{chars}"))
  }

  test("stageFdicResponse appends one {\"data\": ...} JSONL per element") {
    val dir = Files.createTempDirectory("stage")
    val f = dir.resolve("inst.json")
    val body = """{"data": [{"CERT": "1"}, {"CERT": "2"}]}"""
    Ingest.stageFdicResponse(body, f)
    Ingest.stageFdicResponse(body, f) // append accumulates
    val lines = Files.readAllLines(f)
    assert(lines.size == 4)
    assert(lines.get(0) == """{"data": {"CERT": "1"}}""")
  }

  test("FDIC query URLs push filters/fields/sort to the remote API") {
    val u = Ingest.instQuery(0, 10000).url("https://api.example.test")
    assert(u.contains("filters=CERT%3A%5B0+TO+10000%5D"))
    assert(u.contains("sort_by=CERT") && u.contains("limit=10000"))
    val params = RunParams(Some(LocalDate.parse("2020-03-31")),
      LocalDate.parse("2020-06-30"))
    val f = Ingest.finQuery(0, 10000, params).url("https://api.example.test")
    assert(f.contains("REPDTE"))
  }

  test("ingestNcuaZips extracts quarter zips until 404") {
    def zipOf(entries: (String, String)*): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val z = new ZipOutputStream(bos)
      entries.foreach { case (name, content) =>
        z.putNextEntry(new ZipEntry(name))
        z.write(content.getBytes("UTF-8"))
        z.closeEntry()
      }
      z.close()
      bos.toByteArray
    }
    val served = Map(
      "call-report-data-2020-03.zip" -> zipOf("FOICU.txt" -> "CU_NUMBER\n100\n"),
      "call-report-data-2020-06.zip" -> zipOf("FOICU.txt" -> "CU_NUMBER\n100\n"))
    val fetch: String => Option[Array[Byte]] =
      url => served.get(url.split('/').last)
    val staging = Files.createTempDirectory("ncua")
    val dirs = Ingest.ingestNcuaZips(fetch, "https://ncua.example.test",
      staging, LocalDate.parse("2020-03-31"))
    assert(dirs.map(_.getFileName.toString) == Seq("202003", "202006"))
    assert(Files.readString(dirs.head.resolve("FOICU.txt")).startsWith("CU_NUMBER"))
  }

  test("extractZip rejects entries escaping the target dir") {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("ok.txt")); z.write("x".getBytes); z.closeEntry()
    z.close()
    val dir = Files.createTempDirectory("zip")
    Ingest.extractZip(bos.toByteArray, dir)
    assert(Files.exists(dir.resolve("ok.txt")))
  }
}
