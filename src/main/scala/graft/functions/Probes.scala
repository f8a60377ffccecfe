package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality probes. The reference's `check_columns_for_null` helper
  * (/root/reference/pipelineApplication/Helpers_FunctionsDicts.py:54-63) loops columns and
  * `show()`s each — one job per column, driver-side output only. This is
  * the same check as ONE aggregate over ONE scan, returned as data (one row
  * per column) so it composes: at 100 TB the reference's version is N full
  * scans, this is one. */
object Probes {

  /** Per-column count of NULL-or-empty-string values, one output row per
    * column: (column, n_bad, n_rows). Single job: conditional counts fold
    * into one aggregate row, then `stack` melts it column-per-row.
    *
    * Runs on ARBITRARY frames, so every name the probe feeds back into the
    * parser is escaped: dots/spaces/hyphens would otherwise resolve as
    * struct paths or fail to parse, and a quote in a name would corrupt
    * the stack() string literal. Positional bad_i aliases sidestep the
    * aliasing restrictions entirely. */
  def nullEmptyCounts(df: DataFrame): DataFrame = {
    def esc(c: String) = "`" + c.replace("`", "``") + "`"
    val counts = df.columns.zipWithIndex.map { case (c, i) =>
      sum(when(col(esc(c)).isNull || col(esc(c)).cast("string") === "", 1L)
        .otherwise(0L)).as(s"bad_$i")
    }
    val agg = df.agg(count(lit(1)).as("n_rows"), counts.toSeq: _*)
    val stacked = df.columns.zipWithIndex
      .map { case (c, i) => s"'${c.replace("\\", "\\\\").replace("'", "\\'")}', bad_$i" }
      .mkString(", ")
    agg.selectExpr(
      s"stack(${df.columns.length}, $stacked) AS (column, n_bad)", "n_rows")
  }
}
