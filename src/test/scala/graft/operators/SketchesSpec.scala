package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error-bound and mergeability properties of the sketch aggregates that
  * the within-tolerance gate flags rely on. */
class SketchesSpec extends SparkSpec {

  test("HLL estimate is within rsd bounds across cardinality decades") {
    import spark.implicits._
    for (n <- Seq(100, 5000, 50000)) {
      val df = (0 until n).map(i => i % n).toDF("v")
      val Array(exact, approx) = df
        .agg(countDistinct(col("v")), approx_count_distinct(col("v"), rsd = 0.02))
        .head.toSeq.map(_.asInstanceOf[Long].toDouble).toArray
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"n=$n exact=$exact approx=$approx")
    }
  }

  test("HLL is partitioning-invariant (mergeable partial sketches)") {
    import spark.implicits._
    val df = (0 until 20000).map(_ % 7919).toDF("v")
    val a = df.repartition(1).agg(approx_count_distinct(col("v"), 0.02)).head.getLong(0)
    val b = df.repartition(13).agg(approx_count_distinct(col("v"), 0.02)).head.getLong(0)
    assert(a == b, "merged partial sketches must equal the single-partition sketch")
  }

  test("approx percentile within 1% of exact at accuracy 10000") {
    import spark.implicits._
    val df = (0 until 30000).map(i => ((i * 7919) % 104729).toDouble).toDF("v")
    val row = df.agg(
      expr("percentile(v, 0.5)"),
      percentile_approx(col("v"), lit(0.5), lit(10000))).head
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) <= math.abs(exact) * 0.01,
      s"exact=$exact approx=$approx")
  }

  test("KMV aggregator is deterministic under any partitioning") {
    import spark.implicits._
    import graft.functions.KmvSketch
    val df = (0 until 50000).map(i => (i % 3, ((i * 2654435761L) % 1000000007L))).toDF("g", "h")
    def run(parts: Int) = df.repartition(parts).groupBy("g")
      .agg(KmvSketch.kmv(col("h"), 64).as("sk"))
      .select(col("g"), col("sk.kth_hash"), col("sk.est_distinct"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(run(1) == run(17), "merge must be order/partitioning-independent")
  }

  test("KMV matches brute-force k smallest hashes and estimates within 30%") {
    import spark.implicits._
    import graft.functions.KmvSketch
    val hashes = (0 until 20000).map(i => (i * 48271L) % 1000000007L).distinct
    val df = hashes.map(Tuple1(_)).toDF("h")
    val row = df.agg(KmvSketch.kmv(col("h"), 64).as("sk"))
      .select(col("sk.kth_hash"), col("sk.est_distinct")).head
    val expectedKth = hashes.sorted.apply(63)
    assert(row.getLong(0) == expectedKth, "k-th hash must be the exact 64th smallest")
    val est = row.getLong(1).toDouble
    assert(math.abs(est - hashes.size) / hashes.size < 0.30,
      s"estimate $est too far from ${hashes.size}")
  }

  test("KMV small groups: fewer than k values reported exactly") {
    import spark.implicits._
    import graft.functions.KmvSketch
    val df = Seq(5L, 9L, 5L, 13L).map(Tuple1(_)).toDF("h")
    val row = df.agg(KmvSketch.kmv(col("h"), 64).as("sk"))
      .select(col("sk.kth_hash"), col("sk.n_seen"), col("sk.est_distinct")).head
    assert(row.getLong(0) == 13L && row.getInt(1) == 3 && row.getLong(2) == 3L)
  }

  test("q52 gate flags hold at sf0.001") {
    val rows = Sketches.q52ApproxDistinct(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"HLL flag false for ${r.getString(0)}/${r.getString(1)}")
      assert(r.getBoolean(5), s"KLL flag false for ${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("kmv array state: partition-invariant, sorted, distinct, and exactly " +
    "the k smallest distinct inputs") {
    import spark.implicits._
    val data = (1 to 1000).map(i => (i * 37 % 101).toLong) // heavy duplication
    def sk(parts: Int): Seq[Long] = data.toDF("h").repartition(parts)
      .agg(graft.functions.KmvSketch.kmvArr(col("h"), 32)).head().getSeq[Long](0)
    val a = sk(1)
    assert(a == sk(7), "merged partial sketches must equal the 1-partition sketch")
    assert(a.length == 32)
    assert(a == a.sorted && a.distinct == a)
    assert(a == data.distinct.sorted.take(32))
  }

  test("d195 corpus overlap: sketch estimates sit inside KMV error bounds " +
    "of the exact truth the gate row carries") {
    val r = Sketches.d195CorpusOverlap(spark, "/root/testdata/sf0.001").head()
    val (estU, exU) = (r.getLong(3), r.getLong(9))
    val (estJ, exJ) = (r.getLong(6), r.getLong(11))
    assert(exU > 0 && r.getLong(10) > 0, "fixture must actually overlap")
    // k=256 ⇒ rse ≈ 1/√255 ≈ 6.3%; allow 4.5σ
    assert(math.abs(estU - exU) <= 0.3 * exU, s"union est $estU vs exact $exU")
    assert(math.abs(estJ - exJ) <= 1500, s"jaccard est $estJ vs exact $exJ bp")
    // intersection estimate inherits both errors — bound via the union
    assert(math.abs(r.getLong(5) - r.getLong(10)) <= 0.35 * exU)
  }
}
