package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Pretrain2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bpe pairs: exactly one merge candidate, and it has the max count") {
    val out = Pretrain2.t157BpePairs(spark, dir).cache()
    assert(out.filter(col("is_merge") === 1).count() == 1)
    val mergeN = out.filter(col("is_merge") === 1)
      .head().getAs[Long]("n")
    assert(out.agg(max("n")).head().getLong(0) == mergeN)
    // pair mass conservation: sum over pairs = sum over words of
    // cnt * (len - 1), computed independently
    val expect = graft.Tables.documents(spark, dir)
      .selectExpr("explode(split(lower(text), ' ')) AS w")
      .filter(length(col("w")) >= 2)
      .agg(sum(length(col("w")) - 1)).head().getLong(0)
    assert(out.agg(sum("n")).head().getLong(0) == expect)
    out.unpersist()
  }

  test("cdc chunks: identical text yields identical boundaries, and chunk " +
    "count is cuts-strictly-interior plus one") {
    val out = Pretrain2.t158CdcChunks(spark, dir).cache()
    assert(out.filter(col("n_chunks") > col("n_cuts") + 1).count() == 0)
    assert(out.filter(col("n_chunks") < 1).count() == 0)
    // CDC's defining property (vs fixed-stride): boundaries are a pure
    // function of content — same text, same cuts
    val byText = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("th"))
      .join(out, "doc_id")
      .groupBy("th")
      .agg(countDistinct("n_cuts", "cut_checksum").as("variants"))
    assert(byText.filter(col("variants") =!= 1).count() == 0)
    out.unpersist()
  }

  test("k-anonymity: group sizes sum to the corpus and flags match k=5") {
    val out = Pretrain2.q159KAnonymity(spark, dir).cache()
    assert(out.agg(sum("n")).head().getLong(0) ==
      graft.Tables.documents(spark, dir).count())
    assert(out.filter(
      (col("n") >= 5 && col("k_ok") === 0) ||
        (col("n") < 5 && col("k_ok") === 1)).count() == 0)
    out.unpersist()
  }

  test("source report: doc counts partition the corpus and the downsample " +
    "flag mirrors the pass rate") {
    val out = Pretrain2.q161SourceReport(spark, dir).cache()
    assert(out.agg(sum("n_docs")).head().getLong(0) ==
      graft.Tables.documents(spark, dir).count())
    assert(out.filter(col("n_pass") > col("n_docs")).count() == 0)
    assert(out.filter(
      (col("pass_rate") < 0.5 - 1e-9 && col("downsample") === 0) ||
        (col("pass_rate") >= 0.5 && col("downsample") === 1)).count() == 0)
    // cross-check one source against the composed kernel directly
    val perDoc = Pretrain.t152GopherRules(spark, dir)
      .join(graft.Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .filter(col("source") === "src0")
    val row = out.filter(col("source") === "src0").head()
    assert(row.getAs[Long]("n_docs") == perDoc.count())
    assert(row.getAs[Long]("n_pass") ==
      perDoc.agg(sum("pass")).head().getLong(0))
    out.unpersist()
  }

  test("lsh recall: hits bound by candidates and truth, ratios consistent") {
    val row = Pretrain2.d162LshRecall(spark, dir).head()
    val (nTruth, nCand, nHit) = (row.getAs[Long]("n_truth"),
      row.getAs[Long]("n_cand"), row.getAs[Long]("n_hit"))
    assert(nHit <= nCand && nHit <= nTruth)
    assert(nTruth > 0 && nCand > 0)
    // a verified candidate IS a truth pair (same J measure, same cut), so
    // recall = hits/truth exactly; cross-check hits against the kernels
    val truth = Dedup.d30NgramJaccard(spark, dir).select("id1", "id2")
    val verified = Dedup.d31MinhashLsh(spark, dir)
      .filter(col("is_dup") === 1).select("id1", "id2")
    assert(verified.join(truth, Seq("id1", "id2")).count() == nHit)
    assert(math.abs(row.getAs[Double]("recall") -
      nHit.toDouble / nTruth) < 1e-6 + 1e-9)
  }

  test("frame sample: per-media frame counts match ceil(bytes/256) and " +
    "sampled hex re-reads from the payload") {
    val out = Pretrain2.m160FrameSample(spark, dir).cache()
    val perMedia = out.groupBy("media_id").agg(count(lit(1)).as("nf"),
      max("frame_idx").as("maxIdx"))
    val docs = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id AS media_id",
        "CAST(ceil(length(text) / 256.0D) AS BIGINT) AS expect_nf")
    assert(perMedia.join(docs, "media_id")
      .filter(col("nf") =!= col("expect_nf") ||
        col("maxIdx") =!= col("expect_nf") - 1).count() == 0)
    // every frame's hex equals the hex of the payload slice at its offset
    val media = graft.multimodal.Media.mediaTable(
      graft.Tables.documents(spark, dir))
    val recheck = out.join(media, "media_id")
      .selectExpr("frame_hex",
        "upper(hex(substring(payload, offset, frame_len))) AS expect_hex")
    assert(recheck.filter(col("frame_hex") =!= col("expect_hex")).count() == 0)
    out.unpersist()
  }
}
