package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardPrepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sequence pack: per-source spans are contiguous and cover the corpus") {
    val out = ShardPrep.t100SequencePack(spark, dir).cache()
    // spans tile each source exactly: next start = prev start + prev tokens
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val gaps = out
      .withColumn("prev_end", lag(col("start_pos") + col("n_tokens"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("prev_end") =!= col("start_pos"))
      .count()
    assert(gaps == 0)
    // crosses is exact: a doc crosses iff its span hits a second window
    val badCross = out.filter(
      (expr("(start_pos + n_tokens - 1) div 256") =!= col("pack_id"))
        =!= (col("crosses") === 1)).count()
    assert(badCross == 0)
    out.unpersist()
  }

  test("mix sample: the smallest source keeps everything, kept never exceeds total") {
    val out = ShardPrep.t101MixSample(spark, dir).cache()
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("thresh") <= 1048576L)
    }
    // at least one source has rate 1.0 (the budget-setting one) → keeps all docs
    val full = rows.filter(_.getAs[Long]("thresh") == 1048576L)
    assert(full.nonEmpty)
    out.unpersist()
  }

  test("repetition metrics: bounds hold and one doc checks out by hand") {
    val out = ShardPrep.t102Repetition(spark, dir).cache()
    assert(out.filter(col("distinct_ratio") > 1 || col("distinct_ratio") <= 0).count() == 0)
    assert(out.filter(col("top_token_share") > 1 || col("top_token_share") <= 0).count() == 0)
    assert(out.filter(col("dup_bigram_frac") > 1 || col("dup_bigram_frac") < 0).count() == 0)
    // driver-side recomputation for one document
    val text = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") === 0).select("text").head().getString(0)
    val toks = text.toLowerCase.split(" ").toSeq
    val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
    val gramCounts = grams.groupBy(identity).map(_._2.size)
    val expDup = gramCounts.filter(_ > 1).sum.toDouble / grams.size
    val got = out.filter(col("doc_id") === 0).head()
    assert(got.getAs[Long]("n_tokens") == toks.size)
    assert(math.abs(got.getAs[Double]("dup_bigram_frac") - expDup) < 1e-5)
    assert(math.abs(got.getAs[Double]("distinct_ratio") -
      toks.distinct.size.toDouble / toks.size) < 1e-5)
    out.unpersist()
  }


  test("domain reweight: a full Scala replication of the fixed-point " +
    "multiplicative rounds bit-matches, budget stays normalized, cap holds") {
    // oracle-independent third implementation (the SamplingParitySpec
    // program): per-doc repetition quantization, integer-DIV means,
    // 3 multiply/normalize/cap/renormalize rounds in plain Scala longs
    val docs = graft.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    case class S(nDocs: Long, tokens: Long, srep6: Long)
    val per = docs.groupBy(_._1).view.mapValues { rows =>
      val stats = rows.map { case (_, text) =>
        val toks = text.toLowerCase.split(" ", -1)
        val rep = 1.0 - toks.distinct.length / toks.length.toDouble
        (toks.length.toLong, math.floor(rep * 1e6 + 0.5).toLong)
      }
      S(stats.length.toLong, stats.map(_._1).sum, stats.map(_._2).sum)
    }.toMap
    val nd = per.values.map(_.nDocs).sum
    val tt = per.values.map(_.tokens).sum
    val sr = per.values.map(_.srep6).sum
    val lbar6 = sr / nd
    var w = per.view.mapValues(s =>
      (BigInt(s.tokens) * 1000000 / tt).toLong).toMap
    val e6 = per.view.mapValues(s =>
      math.max(s.srep6 / s.nDocs - lbar6, 0L)).toMap
    for (_ <- 1 to 3) {
      val raw = w.map { case (k, v) => k -> v * (1000000L + 4L * e6(k)) }
      val sraw = raw.values.sum
      w = raw.view.mapValues(r => r * 1000000L / sraw).toMap
      // capped-simplex fixpoint: 4 monotone redistribute passes (skipped
      // in the infeasible |domains|·cap < 1 regime, like the operator)
      if (w.size * 250000L >= 1000000L) {
        for (_ <- 1 to 4) {
          val over = w.values.map(v => math.max(v - 250000L, 0L)).sum
          val uncap = w.values.filter(_ < 250000L).sum
          w = w.view.mapValues { v =>
            if (v >= 250000L) 250000L
            else if (uncap == 0L) v
            else v + over * v / uncap
          }.toMap
        }
      }
    }
    val got = ShardPrep.t291DomainReweight(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6))).toMap
    for ((src, s) <- per) {
      val (gn, gt, gw0, gwf) = got(src)
      assert((gn, gt) == ((s.nDocs, s.tokens)), src)
      assert(gw0 == (BigInt(s.tokens) * 1000000 / tt).toLong / 1e6, src)
      assert(gwf == w(src) / 1e6, s"$src: got $gwf expected ${w(src) / 1e6}")
    }
    // budget: integer-DIV truncation loses < |domains| millionths
    val total = got.values.map(_._4).sum
    assert(total <= 1.0 + 1e-9 && total > 1.0 - got.size * 1e-6,
      s"weights must stay normalized, got $total")
    assert(got.values.forall(_._4 <= 0.25 + 1e-9), "cap must hold")
  }


  test("domain reweight: the 25% cap HOLDS when it binds, and the surplus " +
    "redistributes to the uncapped domains") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    // one dominant source with 60% of the tokens: a single-shot
    // cap-then-renormalize would scale it straight back above the cap
    val d = tmpDir("doremi_cap")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    def doc(id: Long, src: String, words: Int, rep: Boolean) = {
      val txt =
        if (rep) Seq.fill(words)("loop").mkString(" ")
        else (0 until words).map(i => s"w${id}x$i").mkString(" ")
      R(id, txt, "en", src, txt.length.toLong)
    }
    // 6 sources so the capped simplex is FEASIBLE (n·cap = 1.5 ≥ 1); with
    // 3 sources the maximum achievable sum is 0.75 and every domain pins
    // to the cap — the documented degenerate case, not a projection test
    val rows =
      (0 until 60).map(i => doc(i, "big", 200, rep = i % 2 == 0)) ++
        (0 until 5).flatMap(srcI =>
          (0 until 16).map(i =>
            doc(1000L + srcI * 100 + i, s"small$srcI", 100, rep = false)))
    spark.createDataFrame(
        new java.util.ArrayList[R](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      .repartition(1).write.parquet(s"$d/documents.parquet")
    val out = ShardPrep.t291DomainReweight(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(5), r.getDouble(6))).toMap
    assert(out("big")._1 > 0.25, "the dominant source must START above cap")
    for ((src, (_, wf)) <- out)
      assert(wf <= 0.25 + 1e-9, s"$src w_final=$wf violates the cap")
    val total = out.values.map(_._2).sum
    assert(total > 1.0 - out.size * 1e-5 && total <= 1.0 + 1e-9,
      s"projected budget must stay ~normalized, got $total")
  }

  test("domain reweight: under 4 domains the capped simplex is infeasible, " +
    "the projection is skipped, and the budget STILL sums to ~1") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val d = tmpDir("doremi_infeasible")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    def doc(id: Long, src: String, words: Int, rep: Boolean) = {
      val txt =
        if (rep) Seq.fill(words)("loop").mkString(" ")
        else (0 until words).map(i => s"w${id}x$i").mkString(" ")
      R(id, txt, "en", src, txt.length.toLong)
    }
    // 3 sources: 3·0.25 = 0.75 < 1 — pre-fix every domain pinned to the
    // cap and the emitted budget silently summed to 0.75
    val rows =
      (0 until 30).map(i => doc(i, "a", 150, rep = i % 2 == 0)) ++
        (0 until 16).map(i => doc(100L + i, "b", 100, rep = false)) ++
        (0 until 16).map(i => doc(200L + i, "c", 100, rep = false))
    spark.createDataFrame(
        new java.util.ArrayList[R](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      .repartition(1).write.parquet(s"$d/documents.parquet")
    val out = ShardPrep.t291DomainReweight(spark, d).collect()
      .map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(out.size == 3)
    val total = out.values.sum
    assert(total > 1.0 - out.size * 1e-5 && total <= 1.0 + 1e-9,
      s"infeasible regime must fall back to plain normalize, got $total")
    // weights may exceed the (unachievable) cap here — that is the point
    assert(out.values.max > 0.25, "fallback must NOT pin to the cap")
  }

  test("unimax budget: low-resource languages cap at 4 epochs, surplus " +
    "flows to high-resource ones, the budget is exactly exhausted") {
    val out = ShardPrep.t296UnimaxBudget(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val total = out.values.map(_._1).sum
    val budget = total / 2
    out.foreach { case (l, (c, cap, alloc, epochs, share)) =>
      assert(cap == 4 * c, l)
      assert(alloc >= 0 && alloc <= cap, s"$l alloc out of [0, cap]")
      assert(math.abs(epochs - (alloc * 1000000L / c) / 1e6) < 1e-9, l)
      assert(share >= 0.0 && share <= 1.0, l)
    }
    // sum(cap) = 4·total >= budget and the largest capacity alone covers
    // the remainder, so the waterfill must exhaust the budget exactly
    assert(out.values.map(_._3).sum == budget,
      s"budget $budget vs allocated ${out.values.map(_._3).sum}")
    // fairness: a language at the cap never has MORE allocation than an
    // uncapped one's share... and epochs never exceed the cap
    assert(out.values.forall(_._4 <= 4.0 + 1e-9))
  }

  test("unimax budget: a constructed skewed corpus caps the tiny language " +
    "and hands its surplus to the dominant one") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val d = tmpDir("unimax_skew")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    def doc(id: Long, lang: String, words: Int) = {
      val txt = (0 until words).map(i => s"w$i").mkString(" ")
      R(id, txt, lang, "src0", txt.length.toLong)
    }
    // tiny: 40 tokens (cap 160); big: 960 tokens; budget = 500
    val rows = Seq(doc(0, "tiny", 40)) ++
      (0 until 12).map(i => doc(10L + i, "big", 80))
    spark.createDataFrame(
        new java.util.ArrayList[R](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      .repartition(1).write.parquet(s"$d/documents.parquet")
    val out = ShardPrep.t296UnimaxBudget(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getDouble(4))).toMap
    // tiny processes first (smaller capacity): share = 500 // 2 = 250,
    // capped at 160 → 4.0 epochs exactly; big takes the rest: 340
    assert(out("tiny") == ((160L, 4.0)))
    assert(out("big")._1 == 340L)
    assert(out("big")._2 < 1.0, "big language stays under one epoch")
  }

  test("event funnel: stage counts are monotone and delays are positive") {
    val r = ShardPrep.q104EventFunnel(spark, dir).head()
    val (nUsers, nView, nClick, nPurchase) = (r.getAs[Long]("n_users"),
      r.getAs[Long]("n_view"), r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase"))
    assert(nUsers >= nView && nView >= nClick && nClick >= nPurchase)
    assert(nPurchase >= 0)
    if (nClick > 0) assert(r.getAs[Double]("view_to_click_h") > 0)
    if (nPurchase > 0) assert(r.getAs[Double]("click_to_purchase_h") > 0)
  }

  test("pretrain e2e: manifest invariants hold across every stage boundary") {
    val df = ShardPrep.t318PretrainE2e(spark, dir)
    // every packing window is keyed by source (the t100 discipline survives
    // the composition; the registry sweep re-checks this globally)
    assert(assertWindowsKeyedOrBounded(df) >= 1)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, tokens, packs, cross) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("n_packs"),
        r.getAs[Long]("n_cross"))
      // dedup boundary: synthetic re-crawl copies all lose to their
      // originals, so the 'copy' source never reaches the manifest
      assert(r.getAs[String]("source") != "copy")
      // packing boundary: concat-then-chunk means pack count is exactly
      // ceil(tokens/256) — any drift in the cumsum/window arithmetic
      // between stage 5's admitted set and stage 6 breaks this identity
      assert(packs == (tokens + 255) / 256,
        s"pack count != ceil(tokens/256) for ${r.getAs[String]("source")}")
      // a doc crosses at most one boundary per doc
      assert(cross <= nDocs && nDocs >= 1)
      // quality boundary: only score >= 0.55 docs were admitted upstream,
      // so no source's mean can sit below the gate
      assert(r.getAs[Double]("mean_score") >= 0.55)
    }
  }
}
