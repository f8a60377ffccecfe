package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Similarity2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ann recall: one row per probe, hits bounded by 3, and recall " +
    "agrees with a direct intersection of the two kernels") {
    val out = Similarity2.s163AnnRecall(spark, dir).cache()
    assert(out.count() == 16)
    assert(out.filter(col("n_hit") < 0 || col("n_hit") > 3).count() == 0)
    val truth = Similarity.s38AnnBrute(spark, dir)
      .filter(col("rank") <= 3).select("qid", "nid")
    val got = Similarity.s39AnnIvf(spark, dir).select("qid", "nid")
    val expected = truth.join(got, Seq("qid", "nid")).count()
    assert(out.agg(sum("n_hit")).head().getLong(0) == expected)
    out.unpersist()
  }

  test("pq adc search: 3 ranked rows per probe with monotone distances") {
    val out = Similarity2.s173PqAdcSearch(spark, dir).cache()
    assert(out.count() == 16 * 3)
    assert(out.filter(col("adc") < 0).count() == 0)
    // within a query, rank order IS distance order (ties broken by nid)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy("rank")
    assert(out.withColumn("prev", lag(col("adc"), 1).over(w))
      .filter(col("prev").isNotNull && col("adc") < col("prev"))
      .count() == 0)
    out.unpersist()
  }

  test("pq codes: one row per vector, 8 codes in [0,3], and the error of " +
    "a vector equals the sum of its per-subspace best distances") {
    val out = Similarity2.s166PqCodes(spark, dir).cache()
    val nVecs = graft.Tables.embeddings(spark, dir).count()
    assert(out.count() == nVecs)
    assert(out.filter(size(split(col("codes"), "-")) =!= 8).count() == 0)
    assert(out.filter(exists(transform(split(col("codes"), "-"),
      c => c.cast("int") < 0 || c.cast("int") > 3), identity[org.apache.spark.sql.Column])).count() == 0)
    // reconstruction error is non-negative and zero only if a vector sits
    // exactly on all 8 of its codewords (possible but rare)
    assert(out.filter(col("qerr") < 0).count() == 0)
    out.unpersist()
  }
}
