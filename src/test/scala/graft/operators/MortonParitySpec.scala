package graft.operators

import graft.SparkSpec

/** Guards q301's z-range-prune SOUNDNESS invariant: the SQL expressions
  * that lay out the z-ordered table ([[TableOps.normExpr]] /
  * [[TableOps.mortonExpr]]) must stay bit-identical to the Scala twins
  * that compute the query box's corner z-values ([[TableOps.nrm]] /
  * [[TableOps.mortonOf]]). If they ever diverge, pruning can skip a file
  * that holds in-box rows — an error the residual filter cannot recover —
  * so this spec evaluates BOTH sides over a sampled domain (edge values +
  * a deterministic LCG sample, including non-divisible ranges that stress
  * the floor division) and asserts equality. */
class MortonParitySpec extends SparkSpec {

  test("normExpr == nrm and mortonExpr == mortonOf over a sampled domain") {
    import spark.implicits._
    // deterministic sample: edges, near-edges, and 64 LCG points per range
    val ranges = Seq[(Long, Long)](
      (0L, 65535L),       // identity-ish normalization
      (1L, 150000L),      // q301's custkey-like range at sf0.1
      (9131L, 11322L),    // day-number-like range (non-divisible span)
      (7L, 7L),           // degenerate: lo == hi (max(hi-lo,1) guard)
      (0L, 3L))           // tiny range: heavy rounding
    val pts: Seq[(Long, Long, Long)] = ranges.flatMap { case (lo, hi) =>
      val span = math.max(hi - lo, 1L)
      val lcg = Iterator.iterate(88172645463325252L)(x =>
        x * 6364136223846793005L + 1442695040888963407L)
        .drop(1).take(64).map(x => lo + math.floorMod(x, span + 1)).toSeq
      (Seq(lo, hi, lo + span / 2, lo + span / 3, math.min(lo + 1, hi),
        math.max(hi - 1, lo)) ++ lcg).distinct.map(v => (v, lo, hi))
    }
    // one row per (v, lo, hi); evaluate the SQL normalization per range
    val sqlNorm = pts.groupBy(p => (p._2, p._3)).toSeq.flatMap {
      case ((lo, hi), g) =>
        val df = g.map(_._1).toDF("v")
          .selectExpr("v", s"${TableOps.normExpr("v", lo, hi)} AS nsql")
        df.collect().toSeq.map(r => ((r.getLong(0), lo, hi), r.getInt(1).toLong))
    }.toMap
    pts.foreach { case (v, lo, hi) =>
      assert(sqlNorm((v, lo, hi)) === TableOps.nrm(v, lo, hi),
        s"normExpr/nrm diverge at v=$v lo=$lo hi=$hi")
    }

    // morton parity over normalized 16-bit pairs: corners + LCG sample
    val xy = Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L),
      (1L, 2L), (32768L, 32767L)) ++
      Iterator.iterate(0x9E3779B97F4A7C15L)(x =>
        x * 6364136223846793005L + 1442695040888963407L)
        .drop(1).take(64)
        .map(x => (math.floorMod(x, 65536L), math.floorMod(x >> 17, 65536L)))
        .toSeq
    val sqlZ = xy.toDF("x", "y")
      .selectExpr("x", "y", s"${TableOps.mortonExpr("x", "y")} AS z")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    xy.foreach { case (x, y) =>
      assert(sqlZ((x, y)) === TableOps.mortonOf(x, y),
        s"mortonExpr/mortonOf diverge at x=$x y=$y")
    }
  }
}
