package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash

/** Oracle-INDEPENDENT ground truths for the deterministic-sampling family.
  *
  * The driver gate compares Spark against DuckDB running SQL that this repo
  * also authors — so a bug edited into BOTH the Spark expression and the
  * oracle SQL sails through green (it happened: round 5 coarsened q118's
  * race-key quantization in lockstep on both sides and the gate never
  * noticed; only DriftSpec's driver-side A-ES replication caught it).
  * Every operator here selects or weights rows by hash-derived arithmetic
  * that exists identically on both gate sides, so each gets a brute-force
  * replication in plain Scala over collected rows — a third implementation
  * the gate can't co-modify.
  */
class SamplingParitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def lcg(id: Long): Long = (id * 1103515245L + 12345L) % 100
  private def poly(s: String): Long =
    s.foldLeft(7L)((h, c) => (h * 31 + c.toLong) % PortableHash.P)

  test("q93 picks exactly the 20 smallest key hashes per priority") {
    val orders = graft.Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = orders
      .map { case (p, k) => (p, k, poly(k.toString)) }
      .groupBy(_._1).view
      .mapValues(_.sortBy(x => (x._3, x._2)).take(20).map(x => (x._2, x._3)))
      .toMap
    val got = Curation.q93GroupSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    assert(got.keySet === expected.keySet)
    for (p <- expected.keySet)
      assert(got(p).sortBy(x => (x._2, x._1)) ===
        expected(p).sortBy(x => (x._2, x._1)), s"group $p")
  }

  test("q82 per-stratum counts match the LCG membership rule") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).view.map { case (lang, rows) =>
      val rate = if (lang == "en") 50 else 20
      lang -> (rows.length.toLong,
        rows.count { case (id, _) => lcg(id) < rate }.toLong, rate)
    }.toMap
    val got = TrainingPrep2.q82StratifiedSample(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(got === expected)
  }

  test("q75 split membership, extrema and char mass match the LCG rule") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.groupBy { case (id, _) =>
      val h = lcg(id)
      if (h < 80) "train" else if (h < 90) "val" else "test"
    }.view.map { case (s, rows) =>
      s -> (rows.length.toLong, rows.map(_._1).min, rows.map(_._1).max,
        rows.map(_._2).sum)
    }.toMap
    val got = RelationalExt2.q75HashSplit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expected)
  }

  test("t101 thresholds and kept masses match the mixture-budget rule") {
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("source", "doc_id", "size(split(lower(text), ' ')) AS nt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong))
    val totals = docs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val target = totals.values.min
    val expected = docs.groupBy(_._1).view.map { case (src, rows) =>
      val thresh =
        math.floor(target.toDouble / totals(src) * 1048576).toLong
      val kept = rows.filter { case (_, id, _) =>
        (id * 1103515245L + 12345L) % 1048576L < thresh }
      src -> (totals(src), thresh, kept.length.toLong, kept.map(_._3).sum)
    }.toMap
    val got = ShardPrep.t101MixSample(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expected)
  }

  test("q295 group split assigns every source to exactly one split and " +
    "matches the poly-hash rule") {
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("source", "size(split(lower(text), ' ')) AS nt")
      .collect().map(r => (r.getString(0), r.getInt(1).toLong))
    def splitOf(src: String): String = {
      val h = poly(src) % 100
      if (h < 80) "train" else if (h < 90) "val" else "test"
    }
    val expected = docs.groupBy(d => splitOf(d._1)).view.map { case (sp, rows) =>
      sp -> (rows.map(_._1).distinct.length.toLong, rows.length.toLong,
        rows.map(_._2).sum)
    }.toMap
    val got = RelationalExt2.q295GroupSplit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
    // leakage-proofness checked on the SYSTEM's projection (not a
    // test-local replica of the rule): no source appears under two splits
    val leaky = RelationalExt2.groupSplitAssign(spark, sf)
      .select("source", "split").distinct()
      .groupBy("source").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count()
    assert(leaky == 0, s"$leaky sources landed in more than one split")
  }

  test("q220 Hamilton apportionment sums to the budget and matches the " +
    "integer quota arithmetic") {
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val m = docs.groupBy(_._1).view.map { case (src, rows) =>
      val n = rows.length.toLong
      val sx = rows.map(_._2).sum
      val sxx = rows.map(x => x._2 * x._2).sum
      val sd =
        if (n < 2) 0.0
        else math.sqrt((sxx.toDouble - sx.toDouble * sx.toDouble / n) / (n - 1))
      (src, n, sd, math.floor(n * sd * 1e6 + 0.5).toLong)
    }.toSeq.sortBy(_._1)
    val w0 = m.map(_._4).sum
    val budget = 100L
    val quotas = m.map { case (src, n, sd, w6) =>
      val we = if (w0 == 0) 1L else w6
      val w = if (w0 == 0) m.length.toLong else w0
      (src, n, sd, budget * we / w, budget * we % w)
    }
    val leftover = budget - quotas.map(_._4).sum
    val ranked = quotas.sortBy(q => (-q._5, q._1)).zipWithIndex.map {
      case ((src, n, sd, base, _), i) =>
        src -> (n, base + (if (i < leftover) 1L else 0L))
    }.toMap
    val got = Curation.q220NeymanAlloc(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got.values.map(_._2).sum === budget)
    assert(got === ranked)
  }

  test("q280 replicate weights, rank-selected interval and SE match a " +
    "BigDecimal replication") {
    val P = PortableHash.P
    val events = graft.Tables.events(spark, sf)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val B = 32
    def weight(u: Double): Int =
      if (u < 0.367879) 0 else if (u < 0.735759) 1 else if (u < 0.919699) 2
      else if (u < 0.981012) 3 else if (u < 0.996340) 4 else 5
    // replicate means: exact decimal Σ w·v (v = value rounded HALF_UP at 6,
    // the DECIMAL(38,6) cast), one final double division — mirrors the
    // operator's decimal-sum-then-divide, but via an independent code path
    val perType = events.groupBy(_._2).view.map { case (t, rows) =>
      val vs = rows.map { case (id, _, v) =>
        (id, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      }
      val mbs = (0 until B).map { b =>
        var swv = BigDecimal(0)
        var sw = 0L
        vs.foreach { case (id, v) =>
          val h = poly(s"$b:$id")
          val u = ((h * h + h) % P).toDouble / P.toDouble
          val w = weight(u)
          swv += v * w; sw += w
        }
        (b, swv.toDouble / sw)
      }
      val ranked = mbs.sortBy { case (b, mb) => (mb, b) }.map(_._2)
      val lo = ranked(3)
      val hi = ranked(28)
      val q6 = mbs.map(x => math.floor(x._2 * 1e6 + 0.5).toLong)
      val sm = q6.sum.toDouble / 1e6
      val smm =
        mbs.map(x => math.floor(x._2 * x._2 * 1e6 + 0.5).toLong).sum / 1e6
      val se = math.sqrt((smm - sm * sm / B) / (B - 1))
      val pm = (vs.map(_._2).sum.toDouble / vs.length)
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      t -> (r6(pm), r6(lo), r6(hi), r6(se))
    }.toMap
    val got = Analytics.q280PoissonBootstrap(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got === perType)
  }
}
