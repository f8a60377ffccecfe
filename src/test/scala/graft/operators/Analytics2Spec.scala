package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Analytics2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("groupwise ols: r2 bounded, groups partition events, and the slope " +
    "matches Spark's independent regr_slope implementation") {
    val out = Analytics2.q150GroupwiseOls(spark, dir).cache()
    assert(out.filter(col("r2") < 0 || col("r2") > 1 + 1e-9).count() == 0)
    val ev = graft.Tables.events(spark, dir)
    assert(out.agg(sum("n")).head().getLong(0) == ev.count())
    // independent check: Spark's built-in bivariate regression aggregate
    // (different accumulation path) must agree to ~1e-4 on every group
    val expect = ev.selectExpr("event_type",
        "CAST(hour(ts) AS DOUBLE) AS x", "value AS y")
      .groupBy("event_type")
      .agg(expr("regr_slope(y, x)").as("es"), expr("regr_intercept(y, x)").as("ei"))
    val joined = out.join(expect, "event_type")
      .selectExpr("abs(slope - es) AS ds", "abs(intercept - ei) AS di")
      .agg(max("ds"), max("di")).head()
    assert(joined.getDouble(0) < 1e-4 && joined.getDouble(1) < 1e-4)
    out.unpersist()
  }

  test("bm25: exactly the docs containing a query term are scored, scores " +
    "positive, more distinct terms never hurt the hit count") {
    val out = Analytics2.t151Bm25(spark, dir).cache()
    val docs = graft.Tables.documents(spark, dir)
    val expectHits = docs.filter(
      col("text").contains("data") || col("text").contains("spark") ||
        col("text").contains("join")).count()
    // contains() over raw text can over-match substrings of other words in
    // principle, but this corpus's vocabulary is space-separated whole
    // words, so token-level and substring-level hits coincide
    assert(out.count() == expectHits)
    assert(out.filter(col("bm25") <= 0).count() == 0)
    assert(out.filter(col("n_terms_hit") < 1 || col("n_terms_hit") > 3).count() == 0)
    out.unpersist()
  }

  test("t199 quality classifier: the distilled model actually learns — " +
    "accuracy clears the base rate, label-driving features carry positive " +
    "growing weights, balancing keeps the bias near zero") {
    val out = Analytics2.t199QualityClassifier(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 5)
    assert(out.map(_.getString(1)).toSeq ==
      Seq("bias", "len_c", "stop_c", "alpha_c", "mean_len_c"))
    val acc = out.head.getDouble(4)
    assert(out.forall(_.getDouble(4) == acc))
    assert(acc > 0.7, s"train accuracy $acc should clear the ~0.5 base rate")
    val byName = out.map(r => r.getString(1) -> (r.getDouble(2), r.getDouble(3))).toMap
    // the label weights length 0.3 / stop 0.4 — both must come out positive
    // and strengthen from step 1 to step 2 (GD is still descending)
    for (f <- Seq("len_c", "stop_c")) {
      val (w1, w2) = byName(f)
      assert(w1 > 0 && w2 > w1, s"$f: w1=$w1 w2=$w2")
    }
    val (b1, b2) = byName("bias")
    assert(math.abs(b1) < 0.01 && math.abs(b2) < 0.01,
      "class balancing must keep the bias near zero")
  }

  test("t199 weights and accuracy bit-match an independent Scala " +
    "replication of the two GD steps") {
    // third implementation: plain Scala over collected rows, sharing NO
    // code with the gate's Spark expressions or its oracle SQL — the
    // co-modification-proof ground truth (the q118 lesson: a bug edited
    // into both gate sides stays green; a driver replication catches it)
    val sf = "/root/testdata/sf0.001"
    val stop = TextAnalysis.stopEn.toSet
    val docs = graft.Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val feats0 = docs.map { text =>
      val toks = text.toLowerCase.split(" ", -1)
      val nChars = text.length
      val f1 = math.min(nChars / 500.0, 1.0)
      val f2 = math.min(toks.count(stop) / toks.length.toDouble * 5.0, 1.0)
      val f3 = text.toLowerCase.count(c => c >= 'a' && c <= 'z') / nChars.toDouble
      val f4 = math.min(toks.map(_.length).sum / toks.length.toDouble / 10.0, 1.0)
      val y = if (0.3 * f1 + 0.4 * f2 + 0.3 * f3 >= 0.55) 1 else 0
      (y, Array(f1, f2, f3, f4))
    }
    val n = feats0.length
    def mean12(xs: Array[Double]): Double =
      (xs.map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
        .toDouble / n)
    val mu = (0 until 4).map(j => mean12(feats0.map(_._2(j)))).toArray
    val feats = feats0.map { case (y, f) =>
      (y, Array(1.0, f(0) - mu(0), f(1) - mu(1), f(2) - mu(2), f(3) - mu(3)))
    }
    val nPos = feats.count(_._1 == 1).toLong
    val nNeg = n - nPos
    def cw(y: Int): Double =
      if (y == 1) n / (2.0 * nPos) else n / (2.0 * nNeg)
    def gradStep(p: ((Int, Array[Double])) => Double): Array[Double] =
      (0 until 5).map { j =>
        val sg6 = feats.map { case r @ (y, f) =>
          math.floor(cw(y) * (y - p(r)) * f(j) * 1e6 + 0.5).toLong
        }.map(BigDecimal(_)).sum
        sg6.toDouble / n / 1e6
      }.toArray
    val w1 = gradStep(_ => 0.5)
    def dot(f: Array[Double], w: Array[Double]): Double =
      f.lazyZip(w).map(_ * _).foldLeft(0.0)(_ + _)
    val w2 = w1.lazyZip(gradStep { case (_, f) =>
      val z = dot(f, w1)
      0.5 + z / (2.0 * (1.0 + math.abs(z)))
    }).map(_ + _)
    val nOk = feats.count { case (y, f) => (dot(f, w2) >= 0.0) == (y == 1) }
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expAcc = q6(nOk / n.toDouble)
    val got = Analytics2.t199QualityClassifier(spark, sf).collect()
    assert(got.map(_.getDouble(2)).toSeq == w1.map(q6).toSeq, "w_step1")
    assert(got.map(_.getDouble(3)).toSeq == w2.map(q6).toSeq, "w_step2")
    assert(got.map(_.getDouble(4)).distinct.toSeq == Seq(expAcc), "train_acc")
  }

  test("cuped: arms share one pooled theta, users partition, and the " +
    "adjustment never meaningfully hurts (safety property)") {
    val out = Analytics.q276CupedAdjust(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 2)
    assert(out.map(_.getDouble(2)).distinct.length == 1, "pooled theta")
    val nUsers = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id").distinct().count()
    assert(out.map(_.getLong(1)).sum == nUsers)
    // the in-sample guarantee is POOLED (θ = argmin of the pooled residual
    // SS): reconstruct pooled sums of squares from per-arm stats — a
    // single small arm CAN get worse in-sample, the pooled total cannot
    def pooledSS(mean: Int, variance: Int): Double = {
      val n = out.map(_.getLong(1).toDouble)
      val m = out.map(r => r.getDouble(mean))
      val v = out.map(r => r.getDouble(variance))
      val bigM = n.zip(m).map { case (a, b) => a * b }.sum / n.sum
      n.zip(m).zip(v).map { case ((ni, mi), vi) =>
        (ni - 1) * vi + ni * (mi - bigM) * (mi - bigM) }.sum
    }
    assert(pooledSS(5, 6) <= pooledSS(3, 4) * 1.0001,
      "pooled adjusted SS must not exceed the raw pooled SS")
    out.foreach { r =>
      assert(math.abs(r.getDouble(7) - (1.0 - r.getDouble(6) / r.getDouble(4)))
        < 2e-5)
    }
  }

  test("poisson bootstrap: intervals are ordered, contain their point " +
    "estimate, and the replicate spread is in the theoretical ballpark") {
    val dir = "/root/testdata/sf0.001"
    val out = Analytics.q280PoissonBootstrap(spark, dir).collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    out.foreach { r =>
      val (et, pm, lo, hi, se) = (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= hi, s"$et: interval inverted")
      // the decorrelated replicates must bracket the point estimate —
      // exactly what the pre-fix (linear-hash) version FAILED
      assert(lo <= pm && pm <= hi, s"$et: point $pm outside [$lo, $hi]")
      // Poisson bootstrap SE of the mean ≈ √2·σ/√n (E[w²] = 2); allow a
      // wide band for B = 32 replicate noise
      val vs = ev(et).map(_._2)
      val n = vs.length
      val m = vs.sum / n
      val sd = math.sqrt(vs.map(v => (v - m) * (v - m)).sum / (n - 1))
      val theory = math.sqrt(2.0) * sd / math.sqrt(n.toDouble)
      assert(se > theory / 3 && se < theory * 3,
        s"$et: se $se vs theoretical $theory")
    }
  }
}
