package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toSeq.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")

  test("K4 has exactly 4 triangles") {
    val k4 = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    assert(GraphOps.triangleCount(k4) === 4L)
  }

  test("a path and a star have no triangles") {
    assert(GraphOps.triangleCount(edges((1, 2), (2, 3), (3, 4))) === 0L)
    assert(GraphOps.triangleCount(edges((1, 2), (1, 3), (1, 4), (1, 5))) === 0L)
  }

  test("triangle with a pendant edge counts once") {
    assert(GraphOps.triangleCount(edges((1, 2), (2, 3), (1, 3), (3, 4))) === 1L)
  }

  test("two triangles sharing an edge count as two") {
    // {1,2,3} and {2,3,4} share edge (2,3)
    val g = edges((1, 2), (1, 3), (2, 3), (2, 4), (3, 4))
    assert(GraphOps.triangleCount(g) === 2L)
  }

  test("count is orientation-independent: hub-heavy wheel graph") {
    // wheel: hub 0 joined to ring 1..6, ring edges 1-2 .. 6-1 → 6 triangles
    val ring = (1L to 6L).map(i => (i, if (i == 6) 1L else i + 1))
    val spokes = (1L to 6L).map(i => (0L, i))
    assert(GraphOps.triangleCount(edges(ring ++ spokes: _*)) === 6L)
  }

  test("degrees sums to twice the edge count") {
    val g = edges((1, 2), (2, 3), (1, 3), (3, 4))
    val total = GraphOps.degrees(g).agg(org.apache.spark.sql.functions.sum("d"))
      .head().getLong(0)
    assert(total === 8L)
  }

  test("degree broadcast is size-conditional: hint present below the " +
    "threshold, absent above it") {
    val g = edges((1, 2), (2, 3), (1, 3), (3, 4))
    val deg = GraphOps.degrees(g)
    // hinted: the orientation joins must plan as broadcast joins
    val hinted = GraphOps.orientedEdges(g, deg, hintBroadcast = true)
      .queryExecution.executedPlan.toString
    assert(hinted.contains("BroadcastHashJoin") ||
      hinted.contains("BroadcastNestedLoopJoin"))
    // unhinted (the >DegreeBroadcastMaxNodes path): with the auto-broadcast
    // estimator disabled — standing in for a degree table whose size
    // estimate exceeds the threshold — no broadcast exchange may appear
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val unhinted = GraphOps.orientedEdges(g, deg, hintBroadcast = false)
        .queryExecution.executedPlan.toString
      assert(!unhinted.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("adamic-adar: ranked predictions exclude existing edges and a " +
    "driver-side replica reproduces the whole top list") {
    val dir = "/root/testdata/sf0.001"
    val out = GraphOps.q242AdamicAdar(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    assert(out.map(_._1).toSeq == (1 to out.length))
    val edges = GraphOps2.coEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edgeSet = edges.toSet
    out.foreach { p => assert(!edgeSet((p._2, p._3)), s"predicted an edge: $p") }
    // replica: symmetric adjacency, centers capped at deg 64, quantized sums
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val wedge = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
    val adj = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (c, ns) => c -> ns.map(_._2).sorted }
    adj.foreach { case (c, ns) =>
      if (deg(c) <= 64) {
        val c6 = math.floor(1e6 / math.log(deg(c).toDouble) + 0.5).toLong
        for (i <- ns.indices; j <- i + 1 until ns.length) {
          val k = (ns(i), ns(j))
          val (s0, n0) = wedge.getOrElse(k, (0L, 0L))
          wedge(k) = (s0 + c6, n0 + 1)
        }
      }
    }
    val expected = wedge.toSeq
      .filter { case (k, _) => !edgeSet(k) }
      .sortBy { case ((u, w), (s6, _)) => (-s6, u, w) }
      .take(out.length)
      .zipWithIndex
      .map { case (((u, w), (s6, nc)), i) =>
        (i + 1, u, w, nc, math.rint(s6.toDouble / 1e6 * 1e6) / 1e6) }
    assert(out.toSeq.map(t => (t._1, t._2, t._3, t._4)) ==
      expected.map(t => (t._1, t._2, t._3, t._4)))
    out.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 2e-6) }
  }
}
