package graft.operators

import graft.SparkSpec

/** Plan-shape assertions for the pretraining-curation batches: the scale
  * claims in the Scaladocs (blocked joins, no doc×doc products, broadcast
  * dimension sides) hold in the PHYSICAL plan, not just in intent. */
class PretrainPlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("chunk/span dedup join by hash keys — no cartesian anywhere") {
    for (q <- Seq(Pretrain.t153LineDedup(spark, sf),
                  Pretrain.t154DupSpans(spark, sf))) {
      val plan = physical(q)
      assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("semdedup blocks the pair scan on the cell key and broadcasts " +
    "the centroid table") {
    val plan = physical(Pretrain.d155SemDedup(spark, sf))
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan) // centroids
    // the pair scan is an equi-join on cell (hash or sort-merge), never
    // a nested loop over the corpus
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("dsir broadcasts both vocabulary-sized LMs; the only nested-loop " +
    "join is the 1-row stats cross join") {
    val plan = physical(Pretrain2.t157BpePairs(spark, sf))
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    val dsir = physical(Pretrain.t156DsirWeights(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(dsir).size >= 2, dsir)
    // two scalar cross joins: stats = (ct, vocab) × (tt), and stats onto
    // the token stream — both 1-row build sides, never corpus × corpus.
    // The rendered string repeats them inside the persisted per-doc
    // aggregate's InMemoryRelation tree, hence ≤ 2 DISTINCT ≤ 4 rendered.
    assert("BroadcastNestedLoopJoin".r.findAllIn(dsir).size <= 4, dsir)
    assert(!dsir.toLowerCase.contains("cartesianproduct"), dsir)
  }

  test("dsir selection is a limit-bounded top-100 cutoff, not an " +
    "unpartitioned corpus-scale row_number") {
    val df = Pretrain.t156DsirWeights(spark, sf)
    // no unkeyed/unbounded windows anywhere in the plan (there is NO
    // window at all post-fix — the top-100 runs as an eager
    // TakeOrderedAndProject whose 100th row becomes a scalar cutoff)
    assert(assertWindowsKeyedOrBounded(df) == 0)
    val plan = physical(df)
    // the output pass flags by codegen'd comparison: no join stage and
    // no sort other than the doc_id presentation sort
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"), plan)
    // it reuses the persisted per-doc aggregate rather than recomputing
    // the token-scan pipeline
    assert(plan.contains("InMemoryTableScan"), plan)
  }

  test("map-only operators stay map-only: one exchange at most (the " +
    "presentation sort) for gopher rules and cdc chunks") {
    for (q <- Seq(Pretrain.t152GopherRules(spark, sf),
                  Pretrain2.t158CdcChunks(spark, sf))) {
      val plan = physical(q)
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"expected map-only + sort, got $exchanges:\n$plan")
    }
  }
}
