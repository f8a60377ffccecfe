package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q114 grid is dense and gaps carry the last observed value") {
    val rows = TimeSeries.q114GapFill(spark, sf).collect()
    val types = rows.map(_.getString(0)).distinct
    val hours = rows.map(_.getString(1)).distinct
    assert(rows.length === types.length * hours.length)
    // forward fill: wherever n_events = 0, filled equals the previous row's
    // filled for the same type (grid rows are hour-ordered per type)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getString(1))
      ordered.sliding(2).foreach {
        case Array(prev, cur) if cur.getLong(2) == 0L =>
          assert(cur.getDouble(3) === prev.getDouble(3))
        case _ =>
      }
    }
    // gaps add no events: grid totals reconcile with the raw table
    val total = rows.map(_.getLong(2)).sum
    assert(total === graft.Tables.events(spark, sf).count())
  }

  test("q115 ewma satisfies the recurrence e_t = 0.2 x_t + 0.8 e_(t-1)") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_format(date_trunc("day", col("ts")),
        "yyyy-MM-dd").as("day"))
      .agg(graft.functions.OracleSafe.dsum(col("value")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val ewma = TimeSeries.q115Ewma(spark, sf).collect()
    ewma.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val ordered = rs.sortBy(_.getString(1))
      var acc = 0.0
      ordered.foreach { r =>
        acc = 0.2 * daily((tpe, r.getString(1))) + 0.8 * acc
        assert(math.abs(r.getDouble(2) - acc) < 1e-6,
          s"$tpe ${r.getString(1)}")
      }
    }
  }

  test("q129 transition rows per source state sum to its outgoing total") {
    val rows = TimeSeries.q129EventTransitions(spark, sf).collect()
    // per from_type, probabilities sum to ~1
    rows.groupBy(_.getString(0)).foreach { case (ft, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$ft prob mass $p")
    }
    // total transitions = events minus one per active user
    val ev = graft.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected)
  }

  test("q130 balances step by exactly one order per row within a customer") {
    val rows = TimeSeries.q130RunningBalance(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getLong(3)) // by n_orders
      ordered.zipWithIndex.foreach { case (r, i) =>
        // n_orders is dense from the customer's first order in the window
        if (i > 0) {
          assert(r.getLong(3) === ordered(i - 1).getLong(3) + 1)
          assert(r.getDouble(4) > ordered(i - 1).getDouble(4))
        }
      }
    }
  }

  test("q116 fence count matches a driver-side brute force") {
    val out = TimeSeries.q116IqrOutliers(spark, sf).collect()
    val byType = graft.Tables.events(spark, sf).select("event_type", "value")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { r =>
      val (tpe, n) = (r.getString(0), r.getLong(1))
      val xs = byType(tpe)
      assert(n === xs.length.toLong)
      def quant(p: Double): Double = {
        val pos = (xs.length - 1) * p
        val lo = math.floor(pos).toInt
        xs(lo) + (pos - lo) * (xs(math.min(lo + 1, xs.length - 1)) - xs(lo))
      }
      val (q1, q3) = (quant(0.25), quant(0.75))
      val iqr = q3 - q1
      val brute = xs.count(x => x < q1 - 1.5 * iqr || x > q3 + 1.5 * iqr)
      assert(r.getLong(4) === brute.toLong, tpe)
      assert(math.abs(r.getDouble(2) - q1) < 1e-6)
      assert(math.abs(r.getDouble(3) - q3) < 1e-6)
    }
  }

  test("cusum changepoint: a driver-side clamped-recursion fold reproduces " +
    "every per-type maximum — the prefix-minus-running-min identity holds") {
    val dir = "/root/testdata/sf0.001"
    val out = TimeSeries.q232CusumChangepoint(spark, dir).collect()
    assert(out.nonEmpty)
    // replicate: hourly scaled means → integer stats → clamped CUSUM fold
    val rows = graft.Tables.events(spark, dir)
      .selectExpr("event_type", "CAST(date_trunc('hour', ts) AS STRING) AS h",
        "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val byType = rows.groupBy(_._1)
    out.foreach { r =>
      val et = r.getString(0)
      val hourly = byType(et).groupBy(_._2).toSeq.sortBy(_._1).map {
        case (_, es) =>
          val s6 = es.map(e => math.floor(e._3 * 1e6 + 0.5).toLong).sum
          math.floor(s6.toDouble / 1e6 / es.length * 1e6 + 0.5).toLong
      }
      val n = hourly.length
      val mu = hourly.sum / n
      val sx = hourly.sum.toDouble
      // Σx² exceeds 2^53 — accumulate exactly, convert once (the engines'
      // decimal-sum-then-cast path)
      val sxx = hourly.map(x => BigInt(x) * BigInt(x)).sum.toDouble
      val sigma = math.floor(math.sqrt((sxx - sx * sx / n) / n) + 0.5).toLong
      val k = sigma / 2
      var sPlus = 0L; var best = 0L
      hourly.foreach { x =>
        sPlus = math.max(0L, sPlus + (x - mu - k))
        best = math.max(best, sPlus)
      }
      assert(r.getLong(1) == n, s"$et n_hours")
      assert(r.getLong(4) == best, s"$et: fold gives $best, query ${r.getLong(4)}")
      assert(r.getInt(6) == (if (best > 4 * sigma) 1 else 0))
    }
  }
}
