package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Curation2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("canonical docs: every doc appears once, every cluster keeps exactly " +
    "one member, and the canonical has the cluster's max quality") {
    val out = Curation2.d144CanonicalDocs(spark, dir).cache()
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(out.count() == nDocs)
    // exactly one keep per component, and it is the canonical_id
    val perComp = out.groupBy("component")
      .agg(sum("keep").as("kept"), count(lit(1)).as("n"),
        first("cluster_size").as("sz"))
    assert(perComp.filter(col("kept") =!= 1).count() == 0)
    assert(perComp.filter(col("n") =!= col("sz")).count() == 0)
    // canonical quality >= every member's quality (ties broken by doc_id,
    // so the canonical's (quality, -doc_id) dominates)
    val canon = out.filter(col("keep") === 1)
      .select(col("component"), col("quality").as("cq"),
        col("doc_id").as("cid"))
    val viol = out.join(canon, "component")
      .filter(col("quality") > col("cq") ||
        (col("quality") === col("cq") && col("doc_id") < col("cid")))
    assert(viol.count() == 0)
    // near-dup pairs exist at this SF, so at least one real cluster
    assert(out.filter(col("cluster_size") > 1).count() > 0)
    out.unpersist()
  }

  test("canonical docs: members of one cluster are near-dup-connected " +
    "(component is the min reachable doc_id)") {
    val out = Curation2.d144CanonicalDocs(spark, dir)
    // the component label must be a member of its own cluster, and the
    // minimum doc_id in it (min-label CC invariant)
    val bad = out.groupBy("component").agg(min("doc_id").as("lo"))
      .filter(col("component") =!= col("lo"))
    assert(bad.count() == 0)
  }

  test("unigram logprob: token totals conserve and common-token docs " +
    "score lower NLL than rare-token docs") {
    val out = Curation2.t146UnigramLogprob(spark, dir).cache()
    val docs = graft.Tables.documents(spark, dir)
    assert(out.count() == docs.count())
    // sum of n_tokens over docs == total corpus tokens
    val total = docs
      .selectExpr("size(split(lower(text), ' ')) AS n")
      .agg(sum("n")).head().getLong(0)
    assert(out.agg(sum("n_tokens")).head().getLong(0) == total)
    // all log-probs are negative (every token has cnt < total)
    assert(out.filter(col("sum_lp") >= 0).count() == 0)
    assert(out.filter(col("avg_nll") <= 0).count() == 0)
    // avg_nll is bounded by the rarest/most-common token's NLL
    val mm = out.agg(min("avg_nll"), max("avg_nll")).head()
    assert(mm.getDouble(0) > 0 && mm.getDouble(1) < 20)
    out.unpersist()
  }

  test("nll buckets: three ordered terciles that partition the corpus") {
    val out = Curation2.q147NllBuckets(spark, dir).cache()
    val rows = out.orderBy("bucket").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(rows.map(_.getString(1)).toSeq == Seq("head", "middle", "tail"))
    // doc counts partition the corpus, each bucket ~N/3 (ties may shift
    // boundaries, never by more than one value-group)
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    // score ranges are disjoint and ordered: head < middle < tail
    assert(rows(0).getDouble(6) < rows(1).getDouble(5) + 1e-9)
    assert(rows(1).getDouble(6) < rows(2).getDouble(5) + 1e-9)
    out.unpersist()
  }

  test("pagerank: mass conserves to ~1, every rank positive, and hubs " +
    "outrank the median") {
    val out = GraphOps2.q148Pagerank3(spark, dir).cache()
    assert(out.filter(col("pagerank_p12") <= 0).count() == 0)
    // total mass ~1.0: each of 3 iterations floors once per EDGE
    // contribution and once per node (±0.5e-12 each), so the drift bound is
    // O(edges)·1e-12 — 100·n picoranks (~1e-8 relative) is far above the
    // quantization noise yet far below any real defect (a dangling-mass or
    // double-count bug shifts mass by ~1e-3 relative)
    val n = out.count()
    val mass = out.agg(sum("pagerank_p12")).head().getLong(0)
    assert(math.abs(mass - 1000000000000L) <= 100L * n)
    // degree is a strong prior for rank: the max-degree node must sit in
    // the top decile
    val topDeg = out.orderBy(col("degree").desc).select("pagerank_p12")
      .head().getLong(0)
    val decile = out.selectExpr(
        "percentile(pagerank_p12, 0.9) AS p").head().getDouble(0)
    assert(topDeg >= decile)
    out.unpersist()
  }

  test("bigram lm: scrambling word order leaves the unigram score fixed " +
    "but strictly worsens the bigram NLL — the Markov upgrade t305 buys") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val d = tmpDir("bigram_fix")
    // docs 2-6 establish the corpus phrase statistics; doc 0 is intact
    // prose over those phrases, doc 1 is the SAME MULTISET of tokens
    // scrambled (a permutation, so every unigram count matches doc 0's)
    val intact = "the cat sat on the mat and the dog sat on the rug"
    val salad  = "mat the rug sat the on cat dog the and on sat the"
    val texts = Seq(
      0L -> intact, 1L -> salad,
      2L -> "the cat sat on the mat again and again",
      3L -> "the dog sat on the rug all day long",
      4L -> "a cat and a dog sat on the mat together",
      5L -> "the mat and the rug lay on the floor",
      6L -> "one cat sat on one rug near the mat")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    val rows = texts.map { case (id, t) =>
      Row(id, t, "en", "synthetic", t.length.toLong) }
    spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      .repartition(1).write.parquet(s"$d/documents.parquet")
    val uni = Curation2.t146UnigramLogprob(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_nll")).toMap
    val bi = Curation2.t305BigramLm(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_nll")).toMap
    // permutation invariance of the unigram model
    assert(math.abs(uni(0L) - uni(1L)) < 1e-9,
      s"unigram must not distinguish a permutation: ${uni(0L)} vs ${uni(1L)}")
    // the bigram model must: intact prose scores strictly more fluent
    assert(bi(0L) < bi(1L),
      s"bigram NLL must rank prose over salad: ${bi(0L)} vs ${bi(1L)}")
  }
}
