package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalExt3Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("map battery: map totals reconcile with raw counts and packed is canonical") {
    val out = RelationalExt3.q105MapBattery(spark, dir).cache()
    // high_cnt ≥ urgent_cnt (urgent ⊆ {urgent, high}), n_pri in [1, 5]
    assert(out.filter(col("high_cnt") < col("urgent_cnt")).count() == 0)
    assert(out.filter(col("n_pri") < 1 || col("n_pri") > 5).count() == 0)
    // per-customer total orders reconcile: sum over the doubled packed map
    // halves back to the customer's order count
    val packedSum = out.selectExpr("o_custkey",
      """aggregate(transform(split(packed, ','),
        |  e -> CAST(split(e, '=')[1] AS BIGINT)), 0L, (a, x) -> a + x) / 2
        |  AS n_orders""".stripMargin)
    val raw = graft.Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_raw"))
    val bad = packedSum.join(raw, "o_custkey")
      .filter(col("n_orders") =!= col("n_raw")).count()
    assert(bad == 0)
    // packed keys are sorted (canonical map order)
    val unsorted = out.selectExpr(
      "transform(split(packed, ','), e -> split(e, '=')[0]) AS ks")
      .filter(expr("ks != array_sort(ks)")).count()
    assert(unsorted == 0)
    out.unpersist()
  }

  test("cohort retention: offset-0 retention is 1.0 and ratios stay in (0,1]") {
    val out = RelationalExt3.q106CohortRetention(spark, dir).cache()
    // every user is active in their own first week by construction
    val w0 = out.filter(col("week_offset") === 0)
    assert(w0.count() > 0)
    assert(w0.filter(col("retention") =!= 1.0).count() == 0)
    assert(out.filter(col("retention") <= 0 || col("retention") > 1).count() == 0)
    assert(out.filter(col("n_active") > col("cohort_size")).count() == 0)
    out.unpersist()
  }
}
