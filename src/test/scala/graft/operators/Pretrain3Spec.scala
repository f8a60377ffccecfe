package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Pretrain3Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

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
}
