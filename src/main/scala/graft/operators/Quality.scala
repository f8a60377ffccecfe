package graft.operators

import graft.Tables
import graft.functions.OracleSafe.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality operators (round 2): malformed-record quarantine and
  * single-pass column profiling — the ingest-edge checks a production
  * pipeline runs continuously (the reference's equivalents are the manual
  * `check_columns_for_null` helper, Helpers_FunctionsDicts.py:54-63, and the
  * regex gates of F4; here they are first-class, scalable operators).
  */
object Quality {

  /** q109: parse-with-quarantine — the bad-records side channel. A
    * deterministic corruption (event_id % 17 → truncated JSON) stands in
    * for real-world dirty input; `from_json` yields NULL on malformed text
    * and the stream splits into a parsed GOOD branch and a QUARANTINE
    * branch in the same single pass (one scan, two aggregates over a
    * conditional tag — never two scans). The quarantined rows keep their
    * raw payload so they can be re-driven after a parser fix; the gate
    * aggregates both branches (count + value sum) to pin every row's
    * routing.
    *
    * Scale shape: tag + parse are map-side; the only shuffle is the final
    * 2-group aggregate. Quarantine rate is observable per batch — the
    * monitoring contract that catches upstream format drift. */
  def q109ParseQuarantine(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("raw",
        when(col("event_id") % 17 === 0,
          concat(lit("{corrupt::"), col("props")))
          .otherwise(col("props")))
      .withColumn("parsed", from_json(col("raw"), lit("k BIGINT")))
      .withColumn("branch",
        when(col("parsed").isNull || col("parsed.k").isNull, "quarantine")
          .otherwise("good"))
      .groupBy("branch")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("parsed.k"), lit(0L))).as("sum_k"),
        min("event_id").as("min_event_id"))
      .orderBy("branch")

  val q109Sql: String =
    """SELECT CASE WHEN event_id % 17 = 0 THEN 'quarantine' ELSE 'good' END AS branch,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN event_id % 17 = 0 THEN 0
      |           ELSE CAST(json_extract(props, '$.k') AS BIGINT) END) AS BIGINT) AS sum_k,
      |  min(event_id) AS min_event_id
      |FROM events GROUP BY 1 ORDER BY branch""".stripMargin

  /** q110: single-pass column profiler — the ANALYZE-TABLE shape: per
    * column, null count, exact distinct count, and min/max rendered to
    * strings. ONE aggregate computes every column's stats simultaneously
    * (one scan — a loop of per-column queries would scan the table once per
    * column, the reference's F3 anti-pattern), then the 1×(4·k) stats row
    * melts to k rows via unpivot arithmetic.
    *
    * Scale shape: count_distinct per column makes this an expand-style
    * multi-distinct aggregate; at 100 TB swap `count_distinct` for
    * `approx_count_distinct` (same plan, sketch state) — kept exact here so
    * the oracle can hash-match. */
  def q110ColumnProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment",
      "c_acctbal")
    val agg = Tables.customer(s, dir).agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}_nulls"),
        count_distinct(col(c)).as(s"${c}_distinct"),
        min(col(c).cast("string")).as(s"${c}_min"),
        max(col(c).cast("string")).as(s"${c}_max"))): _*)
    val stacked = cols.map(c =>
      s"'$c', n_rows, ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max")
      .mkString(", ")
    agg.selectExpr(
      s"stack(${cols.size}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_s, max_s)")
      .orderBy("col_name")
  }

  val q110Sql: String = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment",
      "c_acctbal")
    cols.map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  min(CAST($c AS VARCHAR)) AS min_s, max(CAST($c AS VARCHAR)) AS max_s
         |FROM customer""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q109_parse_quarantine" -> q109ParseQuarantine,
    "q110_column_profile"   -> q110ColumnProfile)

  val oracle: Map[String, String] = Map(
    "q109_parse_quarantine" -> q109Sql,
    "q110_column_profile"   -> q110Sql)
}
