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
}
