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

  test("s188 matryoshka rerank replicates a driver-side two-stage search") {
    val vs = graft.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < d) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vs.filter(_._1 < 16).flatMap { case (qid, qv) =>
      val shortlist = vs.filter(_._1 != qid)
        .map { case (nid, cv) => (nid, cos(qv, cv, 8)) }
        .sortBy { case (nid, p) => (-p, nid) }.take(32)
        .zipWithIndex.map { case ((nid, _), i) => (nid, i + 1) }
      shortlist
        .map { case (nid, cr) => (nid, cr, cos(qv, vs.find(_._1 == nid).get._2, 64)) }
        .sortBy { case (nid, _, c) => (-c, nid) }.take(5)
        .zipWithIndex
        .map { case ((nid, cr, c), i) => (qid, i + 1, nid, c, cr) }
    }
    val got = Similarity.s188MatryoshkaRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._5) == (e._1, e._2, e._3, e._5),
        s"ids/ranks differ: got $g expected $e")
      assert(math.abs(g._4 - e._4) <= 1e-6, s"cos differs: got $g expected $e")
    }
    // the rerank must VISIBLY reorder somewhere — otherwise the second
    // stage is dead weight and the demo demonstrates nothing
    assert(got.exists(r => r._2 != r._5))
  }
}
