package graft.operators

import graft.{SparkSpec, Tables}

/** Guards the ONE-definition invariant of the composite quality score
  * ([[Quality.scoreExpr]] / [[Quality.scoreDuck]], hoisted in round 9 from
  * four textual copies): the only remaining structurally different sibling
  * is t35's column-composed form in TextAnalysis (it builds the composite
  * from pre-projected raw ratios rather than directly over `text`). If the
  * kernel and t35 ever diverge — a weight edit, a changed stopword list, a
  * dropped 'D' suffix flipping the arithmetic to DECIMAL — q138/d144/q313/
  * t318 would gate a different corpus than the one t35 reports on. This
  * spec evaluates BOTH over every sf0.001 document and asserts the rounded
  * composites are bit-identical (both are double arithmetic in the same
  * operation order, so exact equality — not tolerance — is the contract).
  */
class QualityScoreParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("t35's column-composed quality_score == round(Quality.scoreExpr, 6)") {
    val viaKernel = Tables.documents(spark, dir)
      .selectExpr("doc_id", s"round(${Quality.scoreExpr()}, 6) AS ks")
    val viaT35 = TextAnalysis.t35Quality(spark, dir)
      .selectExpr("doc_id", "quality_score AS ts")
    val joined = viaKernel.join(viaT35, "doc_id")
    val n = joined.count()
    assert(n > 0, "no documents at sf0.001")
    val diverged = joined.filter("ks IS DISTINCT FROM ts").count()
    assert(diverged === 0L,
      s"$diverged/$n docs where t35's composite != the shared kernel")
  }

  test("threshold constant is the one every gate interpolates") {
    // the literal the oracles render must round-trip: a future change to
    // ScoreThreshold that renders as e.g. "0.55000000000000004" would
    // silently widen/narrow the SQL gates relative to the Scala filters
    assert(Quality.ScoreThreshold.toString === "0.55")
    assert(Curation.q138Sql.contains(s">= ${Quality.ScoreThreshold}"))
    assert(IncrementalCuration.q313Sql.contains(
      s">= ${Quality.ScoreThreshold}"))
    assert(ShardPrep.t318Sql.contains(s">= ${Quality.ScoreThreshold}"))
  }
}
