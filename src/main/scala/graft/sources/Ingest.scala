package graft.sources

import graft.pipeline.RunParams
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.LocalDate
import java.util.zip.ZipInputStream

/** Driver-side ingestion edges (S6/S7/K5 in SURVEY.md §2.1-§2.2): the
  * HTTP-shaped work that stages raw data for the bronze readers.
  *
  * The transport is an injected function so tests run on filesystem fixtures
  * with zero network (the reference calls `requests` inline and is untestable
  * offline — /root/reference/pipelineApplication/bronzeLayer/BankData.py:59,
  * CreditUnionData.py:49). These run on the DRIVER, not executors: ingestion
  * volume here is bounded by the upstream APIs (≤100k certs × 10k-row pages),
  * not by the 100 TB lakehouse — the cluster-scale path begins at the bronze
  * parquet.
  */
object Ingest {

  /** GET → body string. Status ≥400 raises (BankData.py:60-66). `None` maps
    * a 404 to end-of-data (the NCUA quarter loop's stop condition). */
  type Http = String => Option[String]

  /** Real transport over java.net.http. ONE client per transport, hoisted
    * out of the request lambda: each HttpClient owns selector threads and
    * a connection pool, so a per-request client would re-handshake TLS on
    * every one of the ~20 GETs per ingestion run and leak its threads
    * until GC. */
  def httpTransport: Http = {
    val client = HttpClient.newHttpClient()
    url =>
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 => None
      case s   => throw new RuntimeException(s"GET $url failed: HTTP $s")
    }
  }

  /** S6: FDIC REST query — filters / field projection / sort are pushed TO
    * THE REMOTE API as query params (BankData.py:52-58,102-108): the
    * remote-pushdown analogue of parquet predicate pushdown. */
  final case class FdicQuery(endpoint: String, filters: String, fields: Seq[String],
                             sortBy: String = "CERT", limit: Int = 10000) {
    def url(base: String): String = {
      def enc(s: String) = java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
      s"$base/$endpoint?filters=${enc(filters)}&fields=${enc(fields.mkString(","))}" +
        s"&sort_by=$sortBy&sort_order=ASC&limit=$limit&format=json"
    }
  }

  /** Institutions query for a CERT range (full-range every run — the
    * reference never date-windows institutions, SURVEY.md §2.14.3). */
  def instQuery(lo: Int, hi: Int): FdicQuery =
    FdicQuery("institutions", s"CERT:[$lo TO $hi]",
      Seq("ACTIVE", "CERT", "CITY", "ID", "NAME", "REPDTE", "STNAME", "WEBADDR"))

  /** Financials query: date-windowed incremental on REPDTE
    * (BankData.py:82-83) + CERT range. */
  def finQuery(lo: Int, hi: Int, params: RunParams): FdicQuery = {
    val window = params.previousRun match {
      case Some(prev) => s" AND REPDTE:[${prev.toString} TO ${params.currentRun}]"
      case None       => ""
    }
    FdicQuery("financials", s"CERT:[$lo TO $hi]$window",
      Seq("ASSET", "CERT", "DEP", "ID", "REPDTE"))
  }

  /** K5: append the response's `data` array elements to the local staging
    * JSON, one `{"data": {...}}` object per line (Helpers_FunctionsDicts.py:40-51)
    * — the shape [[graft.pipeline.Bronze.readStagedFdicJson]] expects. */
  def stageFdicResponse(body: String, stagingFile: Path): Unit = {
    // FDIC wraps rows as {"data": [ {...}, ... ]}; re-emit each element
    // wrapped as its own {"data": {...}} line (spark.read.json = JSONL).
    val arr = extractDataArray(body)
    val lines = arr.map(o => s"""{"data": $o}""").mkString("", "\n", "\n")
    if (arr.nonEmpty)
      Files.writeString(stagingFile, lines,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Minimal bracket-matching extraction of the top-level `"data": [...]`
    * array's elements (no JSON library on the offline classpath; the
    * elements are passed through verbatim, not interpreted). */
  private[sources] def extractDataArray(body: String): Seq[String] = {
    val key = "\"data\""
    val ki = body.indexOf(key)
    if (ki < 0) return Nil
    val start = body.indexOf('[', ki)
    if (start < 0) return Nil
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var esc = false
    var elemStart = -1
    var i = start
    var end = -1
    while (i < body.length && end < 0) {
      val c = body.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '[' | '{' =>
          depth += 1
          if (depth == 2 && elemStart < 0) elemStart = i
        case ']' | '}' =>
          depth -= 1
          if (depth == 1 && elemStart >= 0) {
            out += body.substring(elemStart, i + 1); elemStart = -1
          }
          if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** Full FDIC ingestion loop (BuildBronzeLayer.py:169-178): page the CERT
    * ranges, stage institutions + date-windowed financials. */
  def ingestFdic(http: Http, apiBase: String, stagingDir: Path, params: RunParams): Unit = {
    Files.createDirectories(stagingDir)
    RunParams.certRanges().foreach { case (lo, hi) =>
      http(instQuery(lo, hi).url(apiBase))
        .foreach(stageFdicResponse(_, stagingDir.resolve("inst.json")))
      http(finQuery(lo, hi, params).url(apiBase))
        .foreach(stageFdicResponse(_, stagingDir.resolve("fin.json")))
    }
  }

  /** S7: NCUA quarterly call-report ZIP → extracted CSV dir per quarter
    * (CreditUnionData.py:21-67). Walks quarters from `from` until the first
    * 404. Returns the extracted quarter dirs. */
  def ingestNcuaZips(fetch: String => Option[Array[Byte]], urlBase: String,
                     stagingDir: Path, fromQuarterEnd: LocalDate,
                     maxQuarters: Int = 40): Seq[Path] = {
    Files.createDirectories(stagingDir)
    val out = Seq.newBuilder[Path]
    var d = fromQuarterEnd
    var n = 0
    var done = false
    while (n < maxQuarters && !done) {
      val ym = f"${d.getYear}%04d-${d.getMonthValue}%02d"
      fetch(s"$urlBase/call-report-data-$ym.zip") match {
        case None => done = true
        case Some(bytes) =>
          val dir = stagingDir.resolve(ym.replace("-", ""))
          extractZip(bytes, dir)
          out += dir
      }
      d = d.plusMonths(3).withDayOfMonth(1).plusMonths(1).minusDays(1)
      n += 1
    }
    out.result()
  }

  /** Extract a ZIP byte payload to `dir` (java.util.zip; flat layout). */
  def extractZip(bytes: Array[Byte], dir: Path): Unit = {
    Files.createDirectories(dir)
    val zis = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val name = Paths.get(e.getName).getFileName.toString
          val target = dir.resolve(name)
          if (!target.normalize.startsWith(dir.normalize))
            throw new RuntimeException(s"zip entry escapes target dir: ${e.getName}")
          Files.write(target, zis.readAllBytes())
        }
        zis.closeEntry()
        e = zis.getNextEntry
      }
    } finally zis.close()
  }
}
