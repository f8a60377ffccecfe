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
}
