package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash

class DriftSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q120 grid is dense, counts reconcile, total is the term sum") {
    val rows = Drift.q120PsiDrift(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 until 10))
    val orders = graft.Tables.orders(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === orders)
    val sum = BigDecimal(rows.map(r => BigDecimal(r.getDouble(3))).sum.toDouble)
    assert(math.abs(rows.head.getDouble(4) - sum.toDouble) < 1e-9)
    assert(rows.map(_.getDouble(4)).distinct.length === 1)
  }

  test("q121 deciles are near-equal in size with non-overlapping ranges") {
    val rows = Drift.q121EquiDepthHist(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 10))
    val ns = rows.map(_.getLong(1))
    assert(ns.max - ns.min <= 1)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b.getDouble(2) >= a.getDouble(3))
      case _ =>
    }
  }

  test("q121 is the repo's ONE documented unpartitioned-window exception: " +
    "exactly one global ntile, nothing else unkeyed") {
    // q121 is the exact reference implementation equi-depth deciles are
    // validated against (q52's KLL sketch is the 100 TB path) — its global
    // total-order ntile is the documented honest cost, not an oversight.
    // This assert pins the exception to exactly that ONE window so any
    // future unkeyed window added to the plan fails loudly.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = Drift.q121EquiDepthHist(spark, sf)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.size == 1)
    assert(wins.head.partitionSpec.isEmpty)
    assert(wins.head.windowExpressions.map(_.name) == Seq("decile"))
  }

  test("s292 cells partition the embeddings, PSI terms are non-negative, " +
    "and the total is their sum") {
    val rows = Drift.s292EmbeddingDrift(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 until 16))
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === n)
    // (p − q)·ln(p/q) ≥ 0 always — a negative term means broken math
    assert(rows.forall(_.getDouble(3) >= 0.0))
    val sum = rows.map(r => BigDecimal(r.getDouble(3))).sum.toDouble
    assert(math.abs(rows.head.getDouble(4) - sum) < 1e-9)
    assert(rows.map(_.getDouble(4)).distinct.length === 1)
  }

  test("q118 selects exactly the k smallest race keys per group") {
    // driver-side replication of the A-ES race: portable hash -> u -> r
    def poly(s: String): Long =
      s.foldLeft(7L)((h, c) => (h * 31 + c.toLong) % PortableHash.P)
    val orders = graft.Tables.orders(spark, sf)
      .select("o_orderstatus", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = orders
      .map { case (st, k, w) =>
        val u = (poly(k.toString) + 1.0) / (PortableHash.P + 1).toDouble
        (st, k, -math.log(u) / w)
      }
      .groupBy(_._1).view
      .mapValues(_.sortBy(x => (x._3, x._2)).take(10).map(_._2).toSet)
      .toMap
    val got = Curation.q118WeightedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got === expected)
  }
}
