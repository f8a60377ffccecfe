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

  test("event funnel: stage counts are monotone and delays are positive") {
    val r = ShardPrep.q104EventFunnel(spark, dir).head()
    val (nUsers, nView, nClick, nPurchase) = (r.getAs[Long]("n_users"),
      r.getAs[Long]("n_view"), r.getAs[Long]("n_click"), r.getAs[Long]("n_purchase"))
    assert(nUsers >= nView && nView >= nClick && nClick >= nPurchase)
    assert(nPurchase >= 0)
    if (nClick > 0) assert(r.getAs[Double]("view_to_click_h") > 0)
    if (nPurchase > 0) assert(r.getAs[Double]("click_to_purchase_h") > 0)
  }
}
