package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Curation3Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("nb langid: scores every held-out doc, predictions come from " +
    "trained classes, and the argmax is deterministic") {
    // NOTE on what is NOT asserted: the synthetic corpus draws every
    // language's text from one shared vocabulary (verified: per-lang top
    // tokens are identical), so no bag-of-words model can beat the
    // majority class HERE — accuracy assertions belong to real corpora.
    // The value-exact oracle gate carries the model-math correctness.
    val out = Curation3.t170NbLangid(spark, dir).cache()
    val docs = graft.Tables.documents(spark, dir)
    assert(out.count() == docs.filter(col("doc_id") % 2 === 1).count())
    val trainLangs = docs.filter(col("doc_id") % 2 === 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(out.select("pred_lang").distinct().collect()
      .forall(r => trainLangs(r.getString(0))))
    assert(out.filter(col("correct") =!= 0 && col("correct") =!= 1).count() == 0)
    assert(out.filter((col("pred_lang") === col("true_lang")) =!=
      (col("correct") === 1)).count() == 0)
    // decimal-exact scoring ⇒ the same argmax on every execution
    val again = Curation3.t170NbLangid(spark, dir)
    assert(out.exceptAll(again).count() == 0 &&
      again.exceptAll(out).count() == 0)
    out.unpersist()
  }

  test("minhash calibration: one row per verified pair, est on the 1/16 " +
    "grid, and the error column is |est - jac|") {
    val out = Curation3.d172MinhashCalibration(spark, dir).cache()
    val nPairs = Dedup.d31MinhashLsh(spark, dir)
      .filter(col("is_dup") === 1).count()
    assert(out.count() == nPairs && nPairs > 0)
    assert(out.filter(
      (col("est") * 16) =!= round(col("est") * 16, 0)).count() == 0)
    assert(out.filter(
      abs(round(abs(col("est") - col("jac")), 6) - col("abs_err")) > 1e-9)
      .count() == 0)
    // verified pairs have jac >= 0.2, so the sketch should agree somewhere
    assert(out.agg(max("est")).head().getDouble(0) > 0.0)
    out.unpersist()
  }

  test("user sessions: events partition into sessions, spans respect the " +
    "30-minute cut, and sequences are capped at 20") {
    val out = Curation3.q174UserSessions(spark, dir).cache()
    val events = graft.Tables.events(spark, dir)
    assert(out.agg(sum("n_events")).head().getLong(0) == events.count())
    // session_idx starts at 1 per user and is dense
    assert(out.groupBy("user_id").agg(min("session_idx").as("mn"),
        max("session_idx").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
    assert(out.filter(length(col("seq")) >
      least(col("n_events"), lit(20))).count() == 0)
    assert(out.filter(col("duration_ms") < 0).count() == 0)
    // a session's span is consistent with its cut rule: a session of n
    // events has at most (n-1) gaps each <= 30 min
    assert(out.filter(col("duration_ms") >
      (col("n_events") - 1) * 1800000L).count() == 0)
    out.unpersist()
  }

  test("gram novelty: doc 0 is fully novel, totals partition the index, " +
    "and novelty is a valid fraction") {
    val out = Curation3.t176GramNovelty(spark, dir).cache()
    // the smallest doc_id can only contain first-seen grams
    val first = out.orderBy("doc_id").head()
    assert(first.getAs[Long]("n_novel") == first.getAs[Long]("n_grams"))
    assert(out.filter(col("n_novel") > col("n_grams")).count() == 0)
    // every gram is novel in exactly one doc: Σ n_novel = |distinct grams|
    val distinctGrams = Dedup.shingleIndex(spark, dir)
      .select("h").distinct().count()
    assert(out.agg(sum("n_novel")).head().getLong(0) == distinctGrams)
    out.unpersist()
  }

  test("itemset pairs: supports bounded by session count, ranks dense, " +
    "pairs ordered") {
    val out = Curation3.q177ItemsetPairs(spark, dir).cache()
    assert(out.count() <= 10 && out.count() > 0)
    assert(out.filter(col("e1") >= col("e2")).count() == 0)
    val nSessions = Curation3.q174UserSessions(spark, dir).count()
    assert(out.filter(col("support") > nSessions).count() == 0)
    val ranks = out.orderBy("rank").collect().map(_.getAs[Int]("rank"))
    assert(ranks.sameElements(1 to ranks.length))
    out.unpersist()
  }

  test("char entropy: bounded by ln of the alphabet size and zero only " +
    "for single-char docs") {
    val out = Curation3.t178CharEntropy(spark, dir).cache()
    assert(out.count() == graft.Tables.documents(spark, dir).count())
    // 0 <= H <= ln(n_distinct_chars) (+ quantization slack)
    assert(out.filter(col("entropy") < -1e-6).count() == 0)
    assert(out.filter(col("entropy") >
      log(col("n_distinct_chars").cast("double")) + 1e-3).count() == 0)
    assert(out.filter(col("n_distinct_chars") === 1 &&
      col("entropy") =!= 0.0).count() == 0)
    out.unpersist()
  }

  test("prefix filter join: exactly the d30 result at t=0.8 from a " +
    "fraction of the postings") {
    val out = Curation3.d181PrefixFilterJoin(spark, dir).cache()
    val full = Dedup.d30NgramJaccard(spark, dir).filter(col("jac") >= 0.8)
    // completeness AND precision: set equality with the full bucket join
    // restricted to the threshold the prefix index is built for
    assert(out.exceptAll(full).count() == 0)
    assert(full.exceptAll(out).count() == 0)
    assert(out.count() > 0)
    out.unpersist()
  }

  test("df-annotated shingle layout: df counts documents per hash, ns is " +
    "the doc's row count, pos is the rarest-first permutation 1..ns") {
    val rows = Dedup.shingleIndexAnnotated(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    val byHash = rows.groupBy(_._2)
    byHash.foreach { case (h, rs) =>
      assert(rs.forall(_._3 == rs.length.toLong), s"df wrong for h=$h")
    }
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      assert(rs.forall(_._4 == rs.length.toLong), s"ns wrong for doc=$doc")
      // pos is exactly the (df, h) sort order, 1-based, no gaps
      val expect = rs.sortBy(r => (r._3, r._2)).map(_._2)
      val got = rs.sortBy(_._5)
      assert(got.map(_._5).toSeq == (1 to rs.length), s"pos gaps in doc=$doc")
      assert(got.map(_._2).toSeq == expect.toSeq, s"pos order wrong in doc=$doc")
    }
    // and the plain index is exactly its 2-column projection
    assert(Dedup.shingleIndex(spark, dir).columns.toSeq == Seq("doc_id", "h"))
  }

  test("dedup funnel: four monotone stages starting at the full corpus") {
    val out = Curation3.d171DedupFunnel(spark, dir).cache()
    val rows = out.orderBy("stage").collect()
    assert(rows.length == 4)
    assert(rows(0).getAs[Long]("n_docs") ==
      graft.Tables.documents(spark, dir).count())
    for (i <- 1 to 3) {
      assert(rows(i).getAs[Long]("n_docs") <= rows(i - 1).getAs[Long]("n_docs"))
      assert(rows(i).getAs[Long]("n_tokens") <= rows(i - 1).getAs[Long]("n_tokens"))
    }
    // the quality stage agrees with the t152 kernel intersected upstream
    assert(rows(3).getAs[Long]("n_docs") <=
      Pretrain.t152GopherRules(spark, dir).filter(col("pass") === 1).count())
    out.unpersist()
  }

  test("containment join: the asymmetric prefix filter loses nothing " +
    "against the naive all-pairs containment, and pairs exist") {
    val out = Curation3.d225ContainmentJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Dedup.shingleIndex(spark, dir)
    val n = idx.groupBy("doc_id").agg(count(lit(1)).as("ns"))
    val brute = idx.as("a")
      .join(idx.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("cm"))
      .join(n.select(col("doc_id").as("ida"), col("ns")), "ida")
      .filter(col("cm") * 10 >= col("ns") * 9)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == brute)
    assert(out.nonEmpty, "the corpus plants containment pairs")
  }

  test("match evidence: every confirmed pair gets 1-3 ranked rows, the " +
    "cited shingles are genuinely shared, and rarity orders the ranks") {
    val out = Curation3.d268MatchEvidence(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    val pairs = Dedup.dupPairs(spark, dir).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byDoc = Dedup.shingleIndex(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    out.groupBy(p => (p._1, p._2)).foreach { case (pair, rows) =>
      assert(pairs(pair), s"evidence for a non-pair: $pair")
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
      // df non-decreasing in rank (rarest first)
      assert(rows.sortBy(_._3).map(_._5).toSeq ==
        rows.map(_._5).sorted.toSeq)
    }
    // every confirmed pair has at least one evidence row (shares a shingle)
    assert(out.map(p => (p._1, p._2)).toSet == pairs)
    out.foreach { case (id1, id2, _, h, _) =>
      assert(byDoc(id1)(h) && byDoc(id2)(h), s"unshared evidence $h") }
  }
}
