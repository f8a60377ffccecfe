package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Pretrain3Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("heaps law: cumulative frames are monotone, the fitted exponent is " +
    "a sub-linear power law, and the fit reproduces from the rows") {
    val rows = Pretrain3.t327HeapsLaw(spark, dir).collect()
    assert(rows.length == 8)
    // cumulative token volume strictly grows; vocabulary never shrinks
    // and grows strictly SLOWER (each step adds fewer new types than
    // occurrences — the Heaps premise)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) > a.getLong(1) && b.getLong(2) >= a.getLong(2))
      assert(b.getLong(2) - a.getLong(2) < b.getLong(1) - a.getLong(1))
    }
    // Heaps exponent for natural-ish text: 0 < β < 1 (sub-linear growth)
    val beta = rows.head.getLong(3) / 1e6
    assert(beta > 0 && beta < 1, s"beta=$beta out of the Heaps range")
    assert(rows.map(_.getLong(3)).distinct.length == 1, "beta6 not constant")
    // the closed-form fit reproduces from the emitted observations
    val x = rows.map(r => math.floor(math.log(r.getLong(1)) * 1e6 + 0.5))
    val y = rows.map(r => math.floor(math.log(r.getLong(2)) * 1e6 + 0.5))
    val n = x.length
    val betaRef = (n * x.zip(y).map { case (a, b) => a * b }.sum -
      x.sum * y.sum) / (n * x.map(a => a * a).sum - x.sum * x.sum)
    assert(math.abs(betaRef - beta) < 1e-5, s"$betaRef vs $beta")
  }

  test("bpe merges: three ordered rules, round-1 matches t157's argmax, " +
    "and counts never increase across rounds") {
    val out = Pretrain3.t164BpeMerges(spark, dir).cache()
    assert(out.count() == 3)
    val rows = out.orderBy("round").collect()
    // round 1 is exactly the single-step argmax t157 already verifies,
    // modulo representation (t157 pairs are 2-char substrings "ab"; the
    // loop's symbols are space-joined "a b")
    val t157Top = Pretrain2.t157BpePairs(spark, dir)
      .filter(col("is_merge") === 1).head()
    assert(rows(0).getAs[String]("pair").replace(" ", "") ==
      t157Top.getAs[String]("pair"))
    assert(rows(0).getAs[Long]("n") == t157Top.getAs[Long]("n"))
    // a later merge can never beat an earlier one: the earlier argmax was
    // maximal and merging only removes pair occurrences it overlaps
    assert(rows(0).getAs[Long]("n") >= rows(1).getAs[Long]("n"))
    assert(rows(1).getAs[Long]("n") >= rows(2).getAs[Long]("n"))
    out.unpersist()
  }

  test("temperature mix: shares sum to ~1, flattening moves every share " +
    "toward uniform, and rate preserves total volume") {
    val out = Pretrain3.q167TemperatureMix(spark, dir).cache()
    val n = out.count()
    assert(n >= 2)
    val sums = out.agg(sum("nat_share"), sum("temp_share")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-4)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-4)
    // α = 0.5 flattens: above-average languages shrink, below-average grow
    val bad = out.filter(
      (col("nat_share") > lit(1.0) / n && col("temp_share") > col("nat_share") + 1e-9) ||
        (col("nat_share") < lit(1.0) / n && col("temp_share") < col("nat_share") - 1e-9))
    assert(bad.count() == 0)
    // expected resampled volume Σ rate·n_tok ≈ N
    val total = out.agg(sum("n_tok")).head().getLong(0).toDouble
    val resampled = out.agg(sum(col("rate") * col("n_tok"))).head().getDouble(0)
    assert(math.abs(resampled / total - 1.0) < 1e-3)
    out.unpersist()
  }

  test("phrase search: matches equal the corpus count of the top bigram") {
    val out = Pretrain3.q168PhraseSearch(spark, dir).cache()
    assert(out.count() > 0)
    // total matches across docs = the argmax pair's corpus frequency, which
    // round-1 of the token-level pair count reproduces independently
    val toks = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "posexplode(split(lower(text), ' ')) AS (pos, tok)")
    val top = toks.as("a")
      .join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.tok"), col("b.tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a.tok"), col("b.tok"))
      .head().getAs[Long]("n")
    assert(out.agg(sum("n_match")).head().getLong(0) == top)
    out.unpersist()
  }

  test("bpe encode: fusions are non-negative, bounded by chars, and total " +
    "fused count is positive once rules exist") {
    val out = Pretrain3.t169BpeEncode(spark, dir).cache()
    assert(out.count() ==
      graft.Tables.documents(spark, dir).count())
    assert(out.filter(col("n_symbols") <= 0).count() == 0)
    assert(out.agg(sum("n_fused")).head().getLong(0) > 0)
    out.unpersist()
  }

  test("fertility: language rollup conserves the encode totals and " +
    "fertility sits in (0, max-word-length]") {
    val out = Pretrain3.t180Fertility(spark, dir).cache()
    val enc = Pretrain3.t169BpeEncode(spark, dir)
    assert(out.agg(sum("n_symbols")).head().getLong(0) ==
      enc.agg(sum("n_symbols")).head().getLong(0))
    assert(out.agg(sum("n_docs")).head().getLong(0) ==
      graft.Tables.documents(spark, dir).count())
    // merged symbols can never outnumber words' characters, and every
    // word is at least one symbol
    assert(out.filter(col("fertility") < 1.0 - 1e-9).count() == 0)
    assert(out.filter(col("fusions_per_word") < 0).count() == 0)
    out.unpersist()
  }

  test("bigram nll: per-doc rows, token counts match the unigram kernel, " +
    "and a seen-bigram corpus backs off less than fully") {
    val out = Pretrain3.t165BigramNll(spark, dir).cache()
    val uniKernel = Curation2.t146UnigramLogprob(spark, dir)
      .select("doc_id", "n_tokens")
    // same tokenization → same per-doc token counts
    assert(out.select("doc_id", "n_tokens").exceptAll(uniKernel).count() == 0)
    assert(out.filter(col("n_backoff") > col("n_tokens")).count() == 0)
    assert(out.filter(col("n_backoff") < 0).count() == 0)
    // every bigram in the count table was seen at least once, so SOME doc
    // scores a non-backed-off transition
    assert(out.agg(sum(col("n_tokens") - lit(1) - col("n_backoff")))
      .head().getLong(0) > 0)
    out.unpersist()
  }

  test("exact merge scan: abutting repeats merge greedily, unlike t169's " +
    "padded-replace variant, and non-overlapping inputs agree") {
    import spark.implicits._
    def exact(word: String, rules: Seq[String]): Seq[String] =
      Seq(word).toDF("w")
        .withColumn("rules", typedLit(rules))
        .selectExpr(
          Pretrain3.exactMergeExpr("split(w, '')", "rules") + " AS toks")
        .head().getAs[scala.collection.Seq[String]]("toks").toSeq
    // the documented divergence case: "aaaa" under rule "a a" — greedy
    // leftmost merges pairs 1-2 and 3-4 ([aa, aa]); the padded
    // non-overlapping replace skips the symbol after each match ([aa, a, a])
    assert(exact("aaaa", Seq("a a")) == Seq("aa", "aa"))
    assert(exact("aaa", Seq("a a")) == Seq("aa", "a"))
    // rules apply in rank order, later rules see earlier fusions
    assert(exact("abab", Seq("a b", "ab ab")) == Seq("abab"))
    // a non-matching rule is a no-op; carry flushes at end of word
    assert(exact("abc", Seq("x y")) == Seq("a", "b", "c"))
    // with no abutting repeats the two variants agree document-wide:
    // force a repeat-free comparison by checking totals on words whose
    // split contains no doubled letter
    val t169 = Pretrain3.t169BpeEncode(spark, dir)
    val t182 = Pretrain3.t182BpeEncodeExact(spark, dir)
    // greedy merges at least as often as the skipping variant, per doc
    val joined = t169.select(col("doc_id"), col("n_fused").as("f169"))
      .join(t182.select(col("doc_id"), col("n_fused").as("f182")), "doc_id")
    assert(joined.filter(col("f182") < col("f169")).count() == 0)
    assert(t182.count() == graft.Tables.documents(spark, dir).count())
  }
}
