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
}
