package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("d135 statuses partition the delta and reconcile with a driver-side check") {
    val out = Dedup.d135IncrementalDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val index = docs.filter(_._1 % 7 != 0).map(_._2).toSet
    val delta = docs.filter(_._1 % 7 == 0).sortBy(_._1)
    assert(out.keySet === delta.map(_._1).toSet)
    val seen = scala.collection.mutable.Set[String]()
    delta.foreach { case (id, h) =>
      val expected =
        if (index.contains(h)) "dup_index"
        else if (seen.contains(h)) "dup_delta"
        else "unique"
      if (!index.contains(h)) seen += h
      assert(out(id) === expected, s"doc $id")
    }
  }

  test("q136 windows are full weeks and WAU bounds hold") {
    val rows = TimeSeries.q136SlidingDistinct(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS d")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val days = ev.map(_._2).distinct.sorted
    // one window per start day that has a full 7-day horizon in the data
    assert(rows.length === days.length - 6)
    val byDay = ev.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    rows.foreach { r =>
      val w = java.time.LocalDate.parse(r.getString(0), fmt)
      val expect = (0 until 7).flatMap(i =>
        byDay.getOrElse(w.plusDays(i).format(fmt), Set.empty)).toSet
      assert(r.getLong(1) === expect.size.toLong, s"window $w")
    }
  }

  test("s137 drift is non-negative and covers every label once") {
    val rows = Similarity.s137CentroidDrift(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 until 10))
    rows.foreach(r => assert(r.getDouble(1) >= 0.0))
  }
}
