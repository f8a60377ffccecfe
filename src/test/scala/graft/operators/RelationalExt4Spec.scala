package graft.operators

import graft.SparkSpec

class RelationalExt4Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q123 plans every dimension join as a broadcast") {
    val plan = RelationalExt4.q123RegionalRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3,
      s"expected >=3 broadcast joins (customer/supplier/nation), got $broadcasts:\n$plan")
    // the only sort-merge/shuffle-keyed join allowed is lineitem ⋈ orders
    val smj = "SortMergeJoin".r.findAllIn(plan).size +
      "ShuffledHashJoin".r.findAllIn(plan).size
    assert(smj <= 1, s"fact-side joins must not multiply shuffles:\n$plan")
  }

  test("q124 subqueries rewrite to semi/anti joins, not nested loops") {
    val plan = RelationalExt4.q124SubqueryBattery(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi") || plan.contains("ExistenceJoin"),
      s"IN/EXISTS should become semi/existence joins:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      s"no cartesian fallback expected:\n$plan")
  }

  test("q125 computes all pivot measures in a single aggregate pass") {
    val df = RelationalExt4.q125PivotMultiAgg(spark, sf)
    assert(df.columns.toSeq ===
      Seq("c_mktsegment", "F_n", "F_rev", "O_n", "O_rev", "P_n", "P_rev"))
    // count columns reconcile with the unpivoted total
    val total = df.selectExpr("sum(F_n + O_n + P_n)").head().getLong(0)
    assert(total === graft.Tables.orders(spark, sf).count())
  }

  test("q126 grains reconcile: each level totals the whole table") {
    val rows = RelationalExt4.q126TimeRollup(spark, sf).collect()
    val n = graft.Tables.orders(spark, sf).count()
    // lvl 7 = grand total; lvl 3 = per-year; lvl 1 = per-quarter; 0 = month
    Seq(7L -> 1, 3L -> 0, 1L -> 0, 0L -> 0).foreach { case (lvl, _) =>
      val levelRows = rows.filter(_.getLong(5) == lvl)
      assert(levelRows.map(_.getLong(3)).sum === n, s"level $lvl")
    }
    assert(rows.count(_.getLong(5) == 7L) === 1)
  }
}
