package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOps2Spec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  test("pagerank: star graph — the hub dominates every leaf, leaves are " +
    "exactly symmetric") {
    val out = GraphOps2.pagerank3(
      edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L), iters = 3).collect()
    val byNode = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byNode(1L) > byNode(2L) * 2)
    // identical structural position ⇒ identical integer rank, exactly
    assert(Set(byNode(2L), byNode(3L), byNode(4L), byNode(5L)).size == 1)
  }

  test("pagerank: complete graph K4 is exactly uniform, within quantization " +
    "of 1/4") {
    val out = GraphOps2.pagerank3(
      edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L),
      iters = 3).collect()
    // symmetry is EXACT on the integer lattice (all four nodes identical);
    // the value sits within a few picoranks of 1/4 (floor-quantizing the
    // non-representable 1/3 contributions loses ≤1 pico per step)
    val ks = out.map(_.getLong(1)).toSet
    assert(ks.size == 1)
    assert(math.abs(ks.head - 250000000000L) <= 3)
  }

  test("pagerank: path graph — mirror nodes carry exactly equal rank, " +
    "interior beats endpoint") {
    val out = GraphOps2.pagerank3(
      edges(1L -> 2L, 2L -> 3L, 3L -> 4L), iters = 3).collect()
    val byNode = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byNode(1L) == byNode(4L))
    assert(byNode(2L) == byNode(3L))
    assert(byNode(2L) > byNode(1L))
  }

  test("ab ttest: arms partition the events, variances non-negative, and " +
    "a self-vs-self split is not significant") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.q149AbTtest(spark, dir).cache()
    val ev = graft.Tables.events(spark, dir)
    // group counts partition each event_type's rows
    val n = out.selectExpr("n_a + n_b AS n").agg(sum("n")).head().getLong(0)
    assert(n == ev.count())
    assert(out.filter(col("var_a") < 0 || col("var_b") < 0).count() == 0)
    // value is arm-independent by construction (synthetic data), so the
    // null hypothesis holds: no event_type should read significant
    assert(out.filter(col("significant") === 1).count() == 0)
    out.unpersist()
  }

  test("kcore: K4 survives a 3-core peel intact, every node at degree 3") {
    val out = GraphOps2.kcore(
      edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L),
      k = 3, rounds = 4).collect()
    assert(out.length == 4)
    assert(out.forall(_.getLong(1) == 3L))
  }

  test("kcore: a tree peels to nothing at k = 2") {
    val out = GraphOps2.kcore(
      edges(1L -> 2L, 2L -> 3L, 2L -> 4L, 4L -> 5L), k = 2, rounds = 4).collect()
    assert(out.isEmpty)
  }

  test("kcore: clique plus pendant path sheds exactly the path, and one " +
    "extra round is the identity (fixpoint reached)") {
    val e = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L,
      4L -> 5L, 5L -> 6L, 6L -> 7L)
    val r = GraphOps2.kcore(e, k = 3, rounds = 4).collect()
      .map(_.getLong(0)).toSet
    assert(r == Set(1L, 2L, 3L, 4L))
    val r2 = GraphOps2.kcore(e, k = 3, rounds = 5).collect()
      .map(_.getLong(0)).toSet
    assert(r2 == r)
  }

  test("kcore: the q198 round budget reaches the fixpoint on the test " +
    "corpus — an 11th round changes nothing") {
    val e = GraphOps2.coEdges(spark, "/root/testdata/sf0.001")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def run(r: Int) = GraphOps2.kcore(e, GraphOps2.KcoreK, r).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(run(GraphOps2.KcoreRounds) == run(GraphOps2.KcoreRounds + 1))
    e.unpersist()
  }

  test("label propagation: two triangles with one bridge resolve to two " +
    "communities of three under the (count DESC, label ASC) tie-break") {
    // hand-traced through 3 synchronous rounds: {1,2,3} collapses onto
    // label 1, {10,11,12} onto label 3 (the bridge node's round-1 label
    // leaks across and wins the far clique — LPA's documented behavior,
    // deterministic here because ties go to the smallest label)
    val out = GraphOps2.labelProp(
      edges(1L -> 2L, 1L -> 3L, 2L -> 3L,
        10L -> 11L, 10L -> 12L, 11L -> 12L, 3L -> 10L),
      rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L, 1L), (3L, 3L, 10L)),
      s"expected communities 1={1,2,3} and 3={10,11,12}, got ${out.toSeq}")
  }

  test("label propagation: community sizes partition the node set and " +
    "every community id is a member node's id") {
    val e = GraphOps2.coEdges(spark, "/root/testdata/sf0.001")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.selectExpr("u AS n").union(e.selectExpr("v AS n"))
      .distinct().collect().map(_.getLong(0)).toSet
    // unlimited variant of the gate's aggregation, same propagation
    val labels = GraphOps2.labelProp(e, rounds = 3)
    // the gate caps at 20 communities; re-derive the full partition check
    // from the same rounds by removing only the display limit
    val all = labels.collect()
    assert(all.map(_.getLong(1)).sum <= nodes.size,
      "top-20 community sizes cannot exceed the node count")
    assert(all.forall(r => nodes.contains(r.getLong(0))),
      "every community label must be a node id of the graph")
    assert(all.forall(r => nodes.contains(r.getLong(2))),
      "every min_node must be a node id of the graph")
    // sizes are emitted largest-first with the community tie-break
    val sizes = all.map(_.getLong(1)).toSeq
    assert(sizes == sizes.sorted.reverse, "sizes must be non-increasing")
    e.unpersist()
  }
}
