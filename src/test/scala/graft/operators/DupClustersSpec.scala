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
}
