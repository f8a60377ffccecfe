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

  test("q52 gate flags hold at sf0.001") {
    val rows = Sketches.q52ApproxDistinct(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"HLL flag false for ${r.getString(0)}/${r.getString(1)}")
      assert(r.getBoolean(5), s"KLL flag false for ${r.getString(0)}/${r.getString(1)}")
    }
  }
}
