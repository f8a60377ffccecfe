package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the cardinality/quantile estimators
  * a 100 TB pipeline runs where exact answers would shuffle every distinct
  * value: HyperLogLog++ (`approx_count_distinct`) and KLL-style quantiles
  * (`percentile_approx`). Both are MERGEABLE sketches: partial states
  * combine associatively, so the shuffle carries one fixed-size sketch per
  * (group, task) — same wire cost as a plain count, regardless of
  * cardinality.
  *
  * Oracle design: an approximate value can't hash-match a different
  * engine's sketch, so the gate query emits the EXACT aggregate alongside a
  * deterministic `within-tolerance` flag comparing Spark's sketch to
  * Spark's exact value. DuckDB re-derives the exact columns and pins the
  * flag to TRUE — if the sketch ever drifts outside its error contract, the
  * correctness gate fails, not just a unit test. SketchesSpec additionally
  * checks the error bound on adversarial generated data.
  */
object Sketches {

  def q52ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("hll_parts"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("kll_p50"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("exact_parts"),
        (abs(col("hll_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.05).as("hll_within_5pct"),
        round(col("exact_p50"), 6).as("exact_p50"),
        (abs(col("kll_p50") - col("exact_p50")) <=
          abs(col("exact_p50")) * 0.01).as("kll_within_1pct"))
      .orderBy("l_returnflag", "l_linestatus")

  val q52Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS hll_within_5pct,
      |  round(median(l_extendedprice), 6) AS exact_p50,
      |  TRUE AS kll_within_1pct
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_approx_distinct" -> q52ApproxDistinct)

  val oracle: Map[String, String] = Map(
    "q52_approx_distinct" -> q52Sql)
}
