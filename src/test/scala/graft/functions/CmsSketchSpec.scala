package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class CmsSketchSpec extends SparkSpec {

  private val cms = new CmsSketch(4, 256)

  test("estimates never undercount and are exact for distinct-cell keys") {
    import spark.implicits._
    // 100 distinct keys with known frequencies i+1
    val rows = (0 until 100).flatMap(i => Seq.fill(i + 1)(i.toLong * 7919L))
    val sketch = rows.toDS().select(cms.toColumn).head()
    (0 until 100).foreach { i =>
      val est = cms.estimate(sketch, i.toLong * 7919L)
      assert(est >= i + 1, s"undercount for key $i")
    }
  }

  test("sketch is identical under any partitioning (merge commutativity)") {
    import spark.implicits._
    val rows = (0 until 5000).map(i => (i % 37).toLong)
    val one = rows.toDS().coalesce(1).select(cms.toColumn).head()
    val many = rows.toDS().repartition(13).select(cms.toColumn).head()
    assert(one.toSeq == many.toSeq)
  }

  test("total count is conserved per depth row") {
    import spark.implicits._
    val rows = (0 until 1234).map(_.toLong)
    val sketch = rows.toDS().select(cms.toColumn).head()
    (0 until 4).foreach { d =>
      assert(sketch.slice(d * 256, (d + 1) * 256).sum == 1234L)
    }
  }

  test("d85 gate flags hold on testdata") {
    val out = graft.operators.TrainingPrep2.d85CmsHeavy(spark, "/root/testdata/sf0.001")
    assert(out.filter(!col("never_undercounts") || !col("within_eps")).count() == 0)
    assert(out.count() == 20)
  }

  test("inner product never under-estimates a join size (q119 kernel)") {
    import spark.implicits._
    // skewed multiplicities on both sides, including keys absent from one
    val left = (0 until 400).flatMap(i => Seq.fill(i % 7 + 1)(i.toLong * 31L))
    val right = (200 until 600).flatMap(i => Seq.fill(i % 5 + 1)(i.toLong * 31L))
    val sa = left.toDS().select(cms.toColumn).head()
    val sb = right.toDS().select(cms.toColumn).head()
    val est = (0 until 4).map { d =>
      (0 until 256).map(j => sa(d * 256 + j) * sb(d * 256 + j)).sum
    }.min
    val fa = left.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fb = right.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exact = fa.map { case (k, n) => n * fb.getOrElse(k, 0L) }.sum
    assert(est >= exact)
    val bound = math.ceil(math.E / 256 * left.size.toDouble * right.size).toLong
    assert(est - exact <= bound)
  }

  test("q119 gate flags hold on testdata") {
    val out = graft.operators.Sketches.q119JoinSizeEstimate(
      spark, "/root/testdata/sf0.001")
    assert(out.filter(!col("never_undercounts") || !col("within_slack_bound")).count() == 0)
  }
}
