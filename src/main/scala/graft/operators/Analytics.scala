package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment analytics over the event stream: deterministic A/B arm
  * assignment and Welch's two-sample t statistics per metric — the readout
  * a product-analytics pipeline computes over billions of events.
  */
object Analytics {

  /** q149: A/B test readout — users hash-split 50/50 into arms (pure
    * integer arithmetic on user_id: reproducible across engines, reruns,
    * and partitionings — the q75 split convention), then per event_type:
    * per-arm counts, means, sample variances, and Welch's t.
    *
    * Scale shape: ONE aggregation pass — conditional aggregates fold both
    * arms' moment sums (n, Σx, Σx²) in the same map-side combine, so the
    * shuffle carries one row per (event_type) group regardless of event
    * count; everything after the aggregate is per-group scalar math.
    *
    * Determinism: moments accumulate as 6-decimal-quantized DECIMAL(38,6)
    * (order-independent, exact — the [[graft.functions.OracleSafe]]
    * convention); the t statistic derives from those exact sums through one
    * fixed chain of IEEE double ops (sub/mul/div/sqrt are all exact-rounded
    * on identical bits), so both engines compute identical doubles. */
  def q149AbTtest(s: SparkSession, dir: String): DataFrame = {
    // the id is reduced mod a prime BEFORE the Knuth multiply: Spark wraps
    // int64 overflow silently while DuckDB raises on BIGINT overflow, so at
    // large id domains the unreduced form diverges (error vs wrapped
    // bucket) — 1000003 · 2654435761 ≈ 2.7e15 stays well inside int64 for
    // ANY user_id
    val armed = Tables.events(s, dir).selectExpr(
      "event_type",
      "CAST(((user_id % 1000003L) * 2654435761L) % 100 < 50 AS INT) AS a",
      "CAST(round(value, 6) AS DECIMAL(38,6)) AS x",
      "CAST(round(value * value, 6) AS DECIMAL(38,6)) AS xx")
    armed.groupBy("event_type")
      .agg(
        sum(when(col("a") === 1, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("a") === 0, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("a") === 1, col("x"))).as("sxa"),
        sum(when(col("a") === 0, col("x"))).as("sxb"),
        sum(when(col("a") === 1, col("xx"))).as("sxxa"),
        sum(when(col("a") === 0, col("xx"))).as("sxxb"))
      .selectExpr("event_type", "n_a", "n_b",
        "CAST(sxa AS DOUBLE) / n_a AS ma",
        "CAST(sxb AS DOUBLE) / n_b AS mb",
        // sample variance from exact moment sums: (Σx² − (Σx)²/n) / (n−1)
        """(CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE) / n_a)
          | / (n_a - 1) AS va""".stripMargin,
        """(CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE) / n_b)
          | / (n_b - 1) AS vb""".stripMargin)
      .selectExpr("event_type", "n_a", "n_b",
        "round(ma, 6) AS mean_a", "round(mb, 6) AS mean_b",
        "round(va, 6) AS var_a", "round(vb, 6) AS var_b",
        "round((ma - mb) / sqrt(va / n_a + vb / n_b), 6) AS t_stat",
        "CAST(abs((ma - mb) / sqrt(va / n_a + vb / n_b)) > 1.96D AS INT) AS significant")
      .orderBy("event_type")
  }

  val q149Sql: String =
    """WITH armed AS (
      |  SELECT event_type,
      |    CAST(((user_id % 1000003) * 2654435761) % 100 < 50 AS INTEGER) AS a,
      |    CAST(round(value, 6) AS DECIMAL(38,6)) AS x,
      |    CAST(round(value * value, 6) AS DECIMAL(38,6)) AS xx
      |  FROM events),
      |g AS (
      |  SELECT event_type,
      |    CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    sum(CASE WHEN a = 1 THEN x END) AS sxa,
      |    sum(CASE WHEN a = 0 THEN x END) AS sxb,
      |    sum(CASE WHEN a = 1 THEN xx END) AS sxxa,
      |    sum(CASE WHEN a = 0 THEN xx END) AS sxxb
      |  FROM armed GROUP BY event_type),
      |m AS (
      |  SELECT event_type, n_a, n_b,
      |    CAST(sxa AS DOUBLE) / n_a AS ma,
      |    CAST(sxb AS DOUBLE) / n_b AS mb,
      |    (CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE) / n_a)
      |      / (n_a - 1) AS va,
      |    (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE) / n_b)
      |      / (n_b - 1) AS vb
      |  FROM g)
      |SELECT event_type, n_a, n_b,
      |  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
      |  round(va, 6) AS var_a, round(vb, 6) AS var_b,
      |  round((ma - mb) / sqrt(va / n_a + vb / n_b), 6) AS t_stat,
      |  CAST(abs((ma - mb) / sqrt(va / n_a + vb / n_b)) > 1.96 AS INTEGER)
      |    AS significant
      |FROM m ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q149_ab_ttest" -> q149AbTtest)

  val oracle: Map[String, String] = Map(
    "q149_ab_ttest" -> q149Sql)
}
