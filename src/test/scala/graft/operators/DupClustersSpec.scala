package graft.operators

import graft.SparkSpec

/** Connected-components properties the d57 gate query can't exercise (its
  * dup clusters are diameter-1 stars): chains, merging components, and
  * isolated nodes. */
class DupClustersSpec extends SparkSpec {

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    DupClusters.connectedComponents(
        nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain of diameter 5 collapses to one component") {
    val out = cc(1L to 6L, Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    assert(out.values.toSet == Set(1L), s"expected all labels 1, got $out")
  }

  test("two components stay separate; isolated node is its own component") {
    val out = cc(1L to 7L, Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L)))
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(5L) == 5L && out(6L) == 5L && out(7L) == 5L)
    assert(out(4L) == 4L, "isolated node must label itself")
  }

  test("edge direction is irrelevant (symmetrized)") {
    val a = cc(1L to 4L, Seq((4L, 3L), (3L, 2L), (2L, 1L)))
    val b = cc(1L to 4L, Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(a == b && a.values.toSet == Set(1L))
  }

  test("star contraction: 1000-node path converges in O(log n) rounds") {
    import spark.implicits._
    val n = 1000L
    val (out, rounds) = DupClusters.connectedComponentsStar(
      (0L until n).toDF("id"),
      (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst"))
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet == Set(0L), "path must collapse to component 0")
    // min-label would need ~999 rounds on this graph; star contraction is
    // O(log n) — assert well under 2·log2(1000) ≈ 20
    assert(rounds <= 20, s"expected O(log n) convergence, took $rounds rounds")
  }

  test("star contraction matches min-label on mixed shapes") {
    import spark.implicits._
    val nodes = (1L to 12L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L),
      (9L, 10L), (10L, 11L)).toDF("src", "dst")
    val a = DupClusters.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (bDf, _) = DupClusters.connectedComponentsStar(nodes, edges)
    val b = bDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"min-label $a != star $b")
  }

  test("min-label checkpointing: 25-chain at maxRounds=24 converges with bounded lineage") {
    import spark.implicits._
    val nodes = (0L until 25L).toDF("id")
    val edges = (0L until 24L).map(i => (i, i + 1)).toDF("src", "dst")
    val (out, rounds, converged) = DupClusters.minLabelCC(nodes, edges,
      maxRounds = 30, checkpointEvery = 5)
    assert(converged, "30 rounds must converge a 24-diameter chain")
    assert(out.collect().map(_.getLong(1)).toSet == Set(0L))
    assert(rounds >= 24, "a 24-diameter chain needs >= diameter rounds")
    // the checkpoint every 5 rounds truncates lineage: the final plan must
    // reflect at most ~5 rounds of join+agg (each doubling), not all ~25
    val planLines = out.queryExecution.optimizedPlan.numberedTreeString
      .linesIterator.size
    assert(planLines < 400,
      s"lineage not truncated: optimized plan has $planLines nodes")
  }

  test("round-capped min-label falls back to star contraction, not wrong labels") {
    import spark.implicits._
    // a 31-diameter chain cannot converge in 5 min-label rounds; the
    // public API must still return the CORRECT labeling (via the star
    // fallback), never the partially-propagated one
    val nodes = (0L until 32L).toDF("id")
    val edges = (0L until 31L).map(i => (i, i + 1)).toDF("src", "dst")
    val (_, _, converged) = DupClusters.minLabelCC(nodes, edges, maxRounds = 5)
    assert(!converged, "5 rounds must report non-convergence on diameter 31")
    val out = DupClusters.connectedComponents(nodes, edges, maxRounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet == Set(0L),
      s"fallback must produce the converged labeling, got $out")
  }

  test("d57 components agree with per-hash min on the planted corpus") {
    val rows = DupClusters.d57DupComponents(spark, "/root/testdata/sf0.001")
      .collect()
    // every planted copy (id >= 1000000) must share its source's component
    rows.filter(_.getLong(0) >= 1000000L).foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 1000000L,
        s"copy ${r.getLong(0)} should join its source's cluster")
      assert(r.getLong(2) == 2L)
    }
    // non-copied docs are singletons
    val singletons = rows.filter(r => r.getLong(0) < 1000000L && r.getLong(0) % 10 != 0)
    assert(singletons.forall(r => r.getLong(1) == r.getLong(0) && r.getLong(2) == 1L))
  }

  test("incremental repair equals from-scratch labels across every merge " +
    "shape: bridge, fresh clique, first-pair singleton, untouched") {
    import spark.implicits._
    // standing labeling: {1,2,3} → 1, {10,11} → 10, {20,21} → 20 (untouched)
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L)).toDF("id", "component")
    // batch (id ≥ 100): 100 BRIDGES components 1 and 10; 101-102 form a
    // fresh batch-only clique; 103 attaches to standing node 30, which has
    // no prior pair (the label-yourself singleton path)
    val newPairs = Seq((100L, 2L), (100L, 11L), (101L, 102L), (103L, 30L))
      .toDF("id1", "id2")
    val out = DupClusters.incrementalRepair(labels, newPairs, "id >= 100")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expected = Set(
      (1L, 1L, "affected"), (2L, 1L, "affected"), (3L, 1L, "affected"),
      (10L, 1L, "affected"), (11L, 1L, "affected"), (100L, 1L, "batch"),
      (101L, 101L, "batch"), (102L, 101L, "batch"),
      (30L, 30L, "affected"), (103L, 30L, "batch"),
      (20L, 20L, "kept"), (21L, 20L, "kept"))
    assert(out == expected)
  }
}
