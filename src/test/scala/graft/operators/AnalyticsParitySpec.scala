package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash

/** Oracle-independent ground truths for the experimentation/quantile
  * numerics — the SamplingParitySpec program applied to the analytics
  * family: each operator's arithmetic is re-derived in plain Scala over
  * collected rows (BigDecimal where the operator sums decimals), a third
  * implementation the gate's co-modifiable Spark/SQL pair can't drift
  * against. */
class AnalyticsParitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def d6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("q149 Welch t-test matches a BigDecimal-moment replication") {
    val events = graft.Tables.events(spark, sf)
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = events.groupBy(_._1).view.map { case (t, rows) =>
      val armed = rows.map { case (_, uid, v) =>
        val a = ((uid % 1000003L) * 2654435761L) % 100 < 50
        (a, d6(v), d6(v * v))
      }
      val (as, bs) = armed.partition(_._1)
      val (na, nb) = (as.length.toLong, bs.length.toLong)
      val sxa = as.map(_._2).sum; val sxb = bs.map(_._2).sum
      val sxxa = as.map(_._3).sum; val sxxb = bs.map(_._3).sum
      val ma = sxa.toDouble / na; val mb = sxb.toDouble / nb
      val va = (sxxa.toDouble - sxa.toDouble * sxa.toDouble / na) / (na - 1)
      val vb = (sxxb.toDouble - sxb.toDouble * sxb.toDouble / nb) / (nb - 1)
      val tstat = (ma - mb) / math.sqrt(va / na + vb / nb)
      t -> (na, nb, r6(ma), r6(mb), r6(va), r6(vb), r6(tstat),
        if (math.abs(tstat) > 1.96) 1 else 0)
    }.toMap
    val got = Analytics.q149AbTtest(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getInt(8))).toMap
    assert(got === expected)
  }

  test("q191 sample and exact quantiles match a driver-side percentile " +
    "replication") {
    def poly(s: String): Long =
      s.foldLeft(7L)((h, c) => (h * 31 + c.toLong) % PortableHash.P)
    // Spark's percentile(): sorted values, rank q·(n−1), linear interp
    def pct(vs: Array[Double], q: Double): Double = {
      val s = vs.sorted
      val rank = q * (s.length - 1)
      val lo = rank.toInt
      val hi = math.min(lo + 1, s.length - 1)
      s(lo) + (rank - lo) * (s(hi) - s(lo))
    }
    val events = graft.Tables.events(spark, sf)
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val sample = events
      .map { case (id, v) => (poly(id.toString), id, v) }
      .sortBy(x => (x._1, x._2)).take(256).map(_._3)
    val all = events.map(_._2)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val expected = qs.map { q =>
      val e = pct(sample, q); val x = pct(all, q)
      (q, r6(e), r6(x), r6(math.abs(e - x)))
    }
    val got = Sketches.q191SketchQuantiles(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }
}
