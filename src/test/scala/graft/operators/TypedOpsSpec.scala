package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TypedOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("typed Aggregator result equals the untyped groupBy plan") {
    val typed = TypedOps.q80TypedAgg(spark, dir).collect().map(_.toSeq)
    val untyped = graft.Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("floor_total"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey").collect().map(_.toSeq)
    assert(typed.toSeq == untyped.toSeq)
  }

  test("typed aggregation keeps partial (map-side) aggregation in the plan") {
    val plan = TypedOps.q80TypedAgg(spark, dir).queryExecution.executedPlan.toString
    // two HashAggregate levels around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("bloom prefilter never changes results (exact confirm removes FPs)") {
    val got = TypedOps.q76BloomPrefilter(spark, dir).collect().map(_.toSeq)
    val exact = {
      val hot = graft.Tables.customer(spark, dir)
        .filter(col("c_acctbal") > 9000).select(col("c_custkey"))
      graft.Tables.orders(spark, dir)
        .join(hot, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          graft.functions.OracleSafe.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus").collect().map(_.toSeq)
    }
    assert(got.toSeq == exact.toSeq)
  }

  test("bloom prefilter is fully in-plan: native probe, no UDF, no driver build") {
    val qe = TypedOps.q76BloomPrefilter(spark, dir).queryExecution
    val physical = qe.executedPlan.toString
    // the probe is Spark's native BloomFilterMightContain, not a wrapped lambda
    assert(physical.contains("might_contain"), physical)
    assert(!physical.contains("UDF"), physical)
    // the filter side is built by bloom_filter_agg inside a scalar subquery —
    // the sketch flows plan-to-plan, never through the driver
    assert(physical.contains("bloom_filter_agg"), physical)
    assert(physical.contains("Subquery"), physical)
  }

  test("scala UDF tier agrees with its native replacement on every row") {
    // q81 filters on udf==native in-plan; equality of counts with the
    // unfiltered aggregate proves the tiers agreed on every row
    val filtered = TypedOps.q81ScalaUdf(spark, dir)
      .agg(sum("n_orders")).collect().head.getLong(0)
    val total = graft.Tables.orders(spark, dir).count()
    assert(filtered == total)
  }
}
