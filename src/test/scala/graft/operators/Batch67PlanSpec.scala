package graft.operators

import graft.SparkSpec

/** Plan-shape assertions for batches 6-7: the Scaladoc scale claims
  * (broadcast model/codebook/rule sides, no corpus×corpus products,
  * term-filtered postings joins) hold in the PHYSICAL plan. */
class Batch67PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): String = {
    // plans are asserted CACHE-INDEPENDENT: another suite's persisted
    // subplans would otherwise substitute InMemoryRelations (whose stored
    // plan strings carry their own joins) into the measured shape
    spark.catalog.clearCache()
    df.queryExecution.executedPlan.toString
  }

  test("pq codes: the 32-codeword codebook broadcasts and the corpus " +
    "never enters a nested loop") {
    val plan = physical(Similarity2.s166PqCodes(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("bigram lm: count tables broadcast; the only nested-loop join is " +
    "the 1-row totals cross join") {
    val plan = physical(Pretrain3.t165BigramNll(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
  }

  test("bpe loop: each round's argmax joins back as a 1-row broadcast — " +
    "three rounds, no corpus-sized nested loop sides") {
    val plan = physical(Pretrain3.t164BpeMerges(spark, sf))
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    // the 1-row best-rule cross joins are broadcast nested loops by
    // construction: three rounds, plus the cached-vocab layouts displaying
    // their internal build join once in the plan string — all 1-row build
    // sides, never vocab×vocab
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 4, plan)
  }

  test("phrase search: postings join is an equi-join on (doc, position), " +
    "never a theta join") {
    val plan = physical(Pretrain3.q168PhraseSearch(spark, sf))
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan)
  }

  test("nb langid: the class list and model broadcast; scoring has no " +
    "corpus-sized nested loop") {
    val plan = physical(Curation3.t170NbLangid(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    // three deliberate small nested loops: the two 1-row stats cross
    // joins building `classes`, and the |langs|-row class fan-out over
    // the test tokens; anything more is a regression
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 3, plan)
  }

  test("funnel and calibration: every join keys on doc_id — no nested " +
    "loops at all") {
    for (q <- Seq(Curation3.d171DedupFunnel(spark, sf),
                  Curation3.d172MinhashCalibration(spark, sf))) {
      val plan = physical(q)
      assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("temperature mix: one aggregate to language rows, then a 1-row " +
    "stats cross join only") {
    val plan = physical(Pretrain3.q167TemperatureMix(spark, sf))
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
  }
}
