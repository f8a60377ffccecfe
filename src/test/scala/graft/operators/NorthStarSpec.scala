package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Semantic properties of the north-star operators (dedup / similarity /
  * text analysis) on a planted fixture with KNOWN duplicate structure —
  * recall/precision assertions the driver's hash-oracle cannot express.
  * The fixture is written as parquet with the harness schemas, so the
  * operators run their real scan → plan → result path.
  */
class NorthStarSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = tmpDir("northstar")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val texts = Seq(
      // 1 and 2 are exact duplicates; 3 is a one-token edit of them
      1L -> "the quick brown fox jumps over the lazy dog and runs to the green hill",
      2L -> "the quick brown fox jumps over the lazy dog and runs to the green hill",
      3L -> "the quick brown fox jumps over the lazy cat and runs to the green hill",
      // 10 gets an exact planted copy from d29/corpusWithCopies (%10 == 0)
      10L -> "a completely different document about banking regulations and capital",
      // unrelated filler so buckets are not degenerate
      21L -> "uno dos tres cuatro cinco seis siete ocho nueve diez once doce trece",
      22L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu",
      23L -> "numbers 123 and 456 mixed with words plus punctuation marks here now")
    val docRows = texts.map { case (id, t) =>
      Row(id, t, "en", "synthetic", t.length.toLong)
    }
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(docRows).asJava),
        docSchema)
      .repartition(1).write.parquet(s"$d/documents.parquet")

    // 64-dim embeddings: vec 0 (a query: vec_id < 16) and vec 100 are
    // near-identical (cos ≈ 1); vec 30 is planted far from everything.
    // First 3 dims are kept well away from 0 so sign-cell blocking is stable.
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64) { i =>
        val x = math.sin(seed * 97 + i * 13).toFloat
        if (i < 3) (if (x >= 0) x + 0.2f else x - 0.2f) else x
      }
    val near = vec(1).zipWithIndex.map { case (x, i) => x + 0.0005f * (i % 3) }
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType)))
    val embRows =
      Seq[Row](Row(0L, vec(1).toSeq, 0), Row(100L, near.toSeq, 0)) ++
        (1 to 15).map(k => Row(k.toLong, vec(k + 1).toSeq, 1)) ++
        (16 to 29).map(k => Row(k.toLong, vec(k + 40).toSeq, 2)) ++
        // %10 == 0 ids get perturbed copies planted by d33 itself
        Seq(Row(30L, vec(999).toSeq, 3))
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(embRows).asJava),
        embSchema)
      .repartition(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("d293 skeleton dedup catches the digit-varying template family " +
    "that exact dedup is blind to") {
    val out = rows(Dedup.d293SkeletonDedup(spark, dir))
    // doc 10's two ticket variants (ids 1000010 / 2000010) differ only in
    // the 6-digit serial: one skeleton family, two distinct raw texts
    val fam = out.find(_.getLong(0) == 1000010L)
    assert(fam.isDefined, s"template family missing: $out")
    assert(fam.get.getLong(1) == 2 && fam.get.getLong(2) == 2,
      s"family must have 2 members with 2 distinct raws: ${fam.get}")
    // exact dedup on the same corpus CANNOT collapse them (raw bytes
    // differ) — the contrast that motivates the skeleton pass
    assert(fam.get.getLong(2) > 1,
      "n_raw > 1 is exactly what md5-exact grouping cannot merge")
  }

  test("d29 exact dedup collapses identical texts and planted copies") {
    val out = rows(Dedup.d29Exact(spark, dir))
    // doc 1 and 2 share content → one group, keep_id = 1, n_copies = 2
    val dupGroup = out.find(_.getLong(1) == 1L).get
    assert(dupGroup.getLong(2) == 2L)
    // doc 10 gets an exact copy planted at 1000010 → n_copies = 2
    val copyGroup = out.find(_.getLong(1) == 10L).get
    assert(copyGroup.getLong(2) == 2L)
    // singleton docs stay singletons
    assert(out.find(_.getLong(1) == 21L).get.getLong(2) == 1L)
  }

  test("d30 n-gram jaccard: identity pair scores 1.0, near pair high, unrelated absent") {
    val out = rows(Dedup.d30NgramJaccard(spark, dir))
    val j12 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(j12.getDouble(3) == 1.0)
    val j13 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 3L).get
    assert(j13.getDouble(3) > 0.5 && j13.getDouble(3) < 1.0)
    // docs with no shared shingle never pair up
    assert(!out.exists(r => r.getLong(0) == 10L || r.getLong(1) == 10L))
  }

  test("d31 minhash-lsh: identical docs always survive banding; dup verdicts agree with exact jaccard") {
    val lsh = rows(Dedup.d31MinhashLsh(spark, dir))
    // identical minhash signatures ⇒ every band agrees ⇒ (1,2) is a candidate
    val c12 = lsh.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(c12.getDouble(2) == 1.0 && c12.getInt(3) == 1)
    // every pair d31 marks dup must appear in d30's exact output with the same jac
    val exact = rows(Dedup.d30NgramJaccard(spark, dir))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    lsh.filter(_.getInt(3) == 1).foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact.get(key).contains(r.getDouble(2)),
        s"d31 dup pair $key not confirmed by exact jaccard")
    }
  }

  test("d32 simhash: identical docs at hamming 0, one-token edit within threshold") {
    val out = rows(Dedup.d32Simhash(spark, dir))
    val h12 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(h12.getInt(2) == 0)
    out.foreach(r => assert(r.getInt(2) >= 0 && r.getInt(2) <= 2))
  }

  test("d33 embedding dedup finds its planted perturbed copies") {
    val out = rows(Dedup.d33Embedding(spark, dir))
    // ids 0, 10, 20, 30 (%10 == 0) get perturbed copies at id+1000000
    Seq(0L, 10L, 20L, 30L).foreach { v =>
      val hit = out.find(r => r.getLong(0) == v && r.getLong(1) == v + 1000000)
      assert(hit.isDefined, s"planted near-dup of vec $v not found")
      assert(hit.get.getDouble(2) >= 0.98)
    }
  }

  test("d326 semdedup: same-cell planted pairs never BOTH survive, every " +
    "cell's farthest member survives, and pruning actually happened") {
    val out = rows(Dedup.d326Semdedup(spark, dir))
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getInt(3))).toMap
    // every %10==0 vector has a planted perturbed copy at id+1000000,
    // cosine ≈ 0.9999 — when both land in the same cell they are
    // τ-neighbors, so AT MOST one survives (possibly neither: the corpus
    // also carries its own planted twins, e.g. vec 100 ≈ vec 0 per the
    // s38 premise, and a third group member can out-rank both)
    val planted = byId.keys.filter(_ < 1000000).filter(_ % 10 == 0)
    assert(planted.nonEmpty)
    var samePairs = 0
    planted.foreach { v =>
      val (cellO, _, kOrig) = byId(v)
      val (cellC, _, kCopy) = byId(v + 1000000)
      if (cellO == cellC) {
        samePairs += 1
        assert(kOrig + kCopy <= 1,
          s"τ-neighbors ($v, ${v + 1000000}) must not both survive")
      }
    }
    assert(samePairs > 0, "no planted pair landed in one cell — no test")
    assert(byId.values.exists(_._3 == 0), "nothing was pruned")
    // the SemDeDup keep rule: each cell's FARTHEST-from-centroid member
    // (min ccos6, ties to the smaller id) can never be out-ranked → keeps
    byId.toSeq.groupBy(_._2._1).foreach { case (cell, members) =>
      val farthest = members.minBy(m => (m._2._2, m._1))
      assert(farthest._2._3 == 1,
        s"cell $cell: farthest member ${farthest._1} was pruned")
    }
  }

  test("s38 brute-force ANN ranks the planted near-identical vector first") {
    val out = rows(Similarity.s38AnnBrute(spark, dir))
    val top = out.find(r => r.getLong(0) == 0L && r.getInt(1) == 1).get
    assert(top.getLong(2) == 100L, "query 0's nearest neighbor must be its planted twin")
    assert(top.getDouble(3) > 0.999)
    // ranks are dense 1..5 per query with non-increasing cosine
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)) == (1 to sorted.size))
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => a.getDouble(3) >= b.getDouble(3)
        case _         => true
      })
    }
  }

  test("s46 native cosine expression is bit-identical to the HOF fold") {
    assert(rows(Similarity.s46AnnBruteNative(spark, dir)).map(_.toSeq) ==
      rows(Similarity.s38AnnBrute(spark, dir)).map(_.toSeq))
  }

  test("s40 LSH ANN: buckets capture the planted twin; cosines agree with exact") {
    val out = rows(Similarity.s40AnnLsh(spark, dir))
    // near-identical vectors land in the same hyperplane bucket
    val top = out.find(r => r.getLong(0) == 0L && r.getInt(2) == 1).get
    assert(top.getLong(3) == 100L)
    // every reported cosine matches the exact brute-force value
    val exact = rows(Similarity.s38AnnBrute(spark, dir))
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    out.foreach { r =>
      val k = (r.getLong(0), r.getLong(3))
      exact.get(k).foreach(c => assert(c == r.getDouble(4)))
    }
  }

  test("s39 IVF ANN reports true cosines and the planted twin for query 0") {
    val out = rows(Similarity.s39AnnIvf(spark, dir))
    val top = out.find(r => r.getLong(0) == 0L && r.getInt(1) == 1).get
    assert(top.getLong(2) == 100L)
    val exact = rows(Similarity.s38AnnBrute(spark, dir))
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    out.foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      exact.get(k).foreach(c => assert(c == r.getDouble(3)))
    }
  }

  test("t34 token counting matches hand counts") {
    val out = rows(TextAnalysis.t34Tokens(spark, dir))
    val d23 = out.find(_.getLong(0) == 23L).get
    // "numbers 123 and 456 mixed with words plus punctuation marks here now"
    assert(d23.getInt(1) == 12)                    // whitespace tokens
    assert(d23.getLong(3) == Seq("numbers", "123", "and", "456", "mixed", "with",
      "words", "plus", "punctuation", "marks", "here", "now")
      .map(t => math.ceil(t.length / 4.0).toLong).sum) // BPE-ish subwords
  }

  test("t36 language-ID picks English for stopword-rich English text") {
    val out = rows(TextAnalysis.t36LangId(spark, dir))
    assert(out.find(_.getLong(0) == 1L).get.getString(6) == "en")
    // the Spanish-ish numeral doc has no profile hits → 'und'
    assert(out.find(_.getLong(0) == 21L).get.getString(6) == "und")
  }

  test("t35 quality score is bounded and favors stopword-rich prose") {
    val out = rows(TextAnalysis.t35Quality(spark, dir))
    out.foreach { r =>
      val q = r.getDouble(6)
      assert(q >= 0.0 && q <= 1.0)
    }
    val prose = out.find(_.getLong(0) == 1L).get.getDouble(6)
    val symbols = out.find(_.getLong(0) == 23L).get.getDouble(6)
    assert(prose > symbols)
  }

  test("t37 fingerprints: identical content ⇒ identical hashes, distinct content ⇒ distinct md5") {
    val out = rows(TextAnalysis.t37Fingerprint(spark, dir))
    val f1 = out.find(_.getLong(0) == 1L).get
    val f2 = out.find(_.getLong(0) == 2L).get
    assert(f1.getString(1) == f2.getString(1) && f1.getLong(2) == f2.getLong(2))
    assert(out.map(_.getString(1)).distinct.size == out.size - 1) // only 1&2 collide
  }

  test("d302 substring spans: hand-derivable flags, spans, and coverage " +
    "on the planted shared-passage structure") {
    // Docs 1,2 are byte-identical 15-token texts: every 8-token window
    // (starts 1..8) is shared → 8 flags, ONE merged span covering all
    // 15 tokens. Doc 3 edits token 9 ('dog'→'cat'): windows 2..8 all
    // include position 9 and differ, so ONLY window 1 is shared with
    // docs 1/2 → 1 flag, 1 span, 8 tokens covered. Docs 10/21/22/23 are
    // unique → absent entirely.
    val out = rows(Dedup.d302SubstringSpans(spark, dir))
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"unexpected doc set: $out")
    assert(out(1L) == ((8L, 1L, 15L)) && out(2L) == ((8L, 1L, 15L)),
      s"exact-copy pair must flag all windows as one full-coverage span: $out")
    assert(out(3L) == ((1L, 1L, 8L)),
      s"one-token edit must share exactly the prefix window: $out")
  }

  test("t303 pii scrub: planted email/phone counted per source and the " +
    "scrub chain is idempotent and ordered most-specific-first") {
    import org.apache.spark.sql.functions._
    // fixture ids: 21 ≡ 0 (mod 7) gets an email, 22 ≡ 0 (mod 11) a
    // phone; nothing ≡ 0 (mod 13) → no SSNs
    val r = rows(TextAnalysis.t303PiiScrub(spark, dir))
    assert(r.size == 1 && r.head.getAs[String]("source") == "synthetic")
    assert(r.head.getAs[Long]("n_docs") == 7)
    assert(r.head.getAs[Long]("emails") == 1)
    assert(r.head.getAs[Long]("phones") == 1)
    assert(r.head.getAs[Long]("ssns") == 0)
    assert(r.head.getAs[Long]("docs_touched") == 2)

    // the kernel itself: SSN (3-2-4) is eaten before phone (3-3-4) can
    // half-match it, and placeholders are fixpoints (re-scrub is identity)
    import spark.implicits._
    val once = Seq("mail a.b@x.org then 123-45-6789 or 555-123-4567 end")
      .toDF("t").select(TextAnalysis.piiScrubbed(col("t")).as("s"))
    assert(once.head().getString(0) ==
      "mail <EMAIL> then <SSN> or <PHONE> end")
    val twice = once.select(TextAnalysis.piiScrubbed(col("s")))
    assert(twice.head().getString(0) == once.head().getString(0))
  }
}
