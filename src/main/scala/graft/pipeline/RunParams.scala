package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.LocalDate
import scala.jdk.CollectionConverters._

/** Incremental-run bookkeeping — the driver-side state object
  * (/root/reference/pipelineApplication/DataRunParams.py:16-81, runLog.txt).
  *
  * The reference's month→quarter map is buggy: it builds dict keys with
  * bitwise OR (`1|2|3: 1` ⇒ key 3), so most quarter-end months resolve to
  * None (SURVEY.md §2.14.1). Rebuilt here as the arithmetic it intended:
  * quarter = (month-1)/3 + 1 — a deliberate, documented fix.
  */
final case class RunParams(previousRun: Option[LocalDate], currentRun: LocalDate) {
  /** Quarter (1-4) of the previous run, if any. */
  def previousQuarter: Option[Int] = previousRun.map(d => (d.getMonthValue - 1) / 3 + 1)
  def previousYear: Option[Int] = previousRun.map(_.getYear)
  /** FDIC financials date-window filter bounds (BankData.py:82-83). */
  def repdteWindow: (Option[LocalDate], LocalDate) = (previousRun, currentRun)
}

object RunParams {
  /** Parse `runLog.txt`: a header line then one yyyy-MM-dd per line; the
    * last line is the previous run (DataRunParams.py:39-48). */
  def fromRunLog(path: String, today: LocalDate): RunParams = {
    val p = Paths.get(path)
    val prev =
      if (Files.exists(p))
        Files.readAllLines(p).asScala.map(_.trim)
          .filter(_.matches("""\d{4}-\d{2}-\d{2}"""))
          .lastOption.map(LocalDate.parse)
      else None
    RunParams(prev, today)
  }

  /** K6: append the current run date (BuildBronzeLayer.py:200-201). */
  def logRun(path: String, params: RunParams): Unit = {
    val p = Paths.get(path)
    if (!Files.exists(p))
      Files.writeString(p, "Previous Run Dates\n", StandardOpenOption.CREATE)
    Files.writeString(p, params.currentRun.toString + "\n", StandardOpenOption.APPEND)
  }

  /** FDIC cert-range pagination cursor (DataRunParams.py:35-36,70-71): the
    * API is paged over CERT ranges of `step` up to `maxCert`. Ranges are
    * DISJOINT inclusive bounds — 0..9999, 10000..19999, … exactly like the
    * reference's certNumStart/certNumStop — because the Elasticsearch
    * filter they render into (`CERT:[lo TO hi]`) is inclusive on both
    * ends: overlapping pages would fetch and stage every boundary CERT
    * twice per run, duplicating those banks in bronze. */
  def certRanges(step: Int = 10000, maxCert: Int = 100000): Seq[(Int, Int)] =
    (0 until maxCert by step).map(lo => (lo, lo + step - 1))
}
