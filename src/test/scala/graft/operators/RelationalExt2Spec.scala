package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalExt2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cube carries all four grouping combinations and consistent totals") {
    val out = RelationalExt2.q70Cube(spark, dir).cache()
    val grand = out.filter(col("returnflag") === "ALL" && col("linestatus") === "ALL")
      .select("n").collect().map(_.getLong(0))
    val leaves = out.filter(col("returnflag") =!= "ALL" && col("linestatus") =!= "ALL")
      .agg(sum("n")).collect().head.getLong(0)
    val flagMarg = out.filter(col("returnflag") =!= "ALL" && col("linestatus") === "ALL")
      .agg(sum("n")).collect().head.getLong(0)
    assert(grand.length == 1 && grand.head == leaves && leaves == flagMarg)
    out.unpersist()
  }

  test("moment-based stats agree with built-in corr/stddev to float tolerance") {
    val got = RelationalExt2.q71StatsMoments(spark, dir)
      .select("l_returnflag", "corr_qty_price", "stddev_qty")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val ref = graft.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        stddev_samp(col("l_quantity")).as("s"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2)))).toMap
    ref.foreach { case (k, (c, sd)) =>
      val (gc, gs) = got(k)
      assert(math.abs(gc - c) < 1e-6, s"corr $k: $gc vs $c")
      assert(math.abs(gs - sd) < 1e-6, s"stddev $k: $gs vs $sd")
    }
  }

  test("hash split is a pure row function: stable under repartitioning") {
    val a = RelationalExt2.q75HashSplit(spark, dir).collect().map(_.toSeq)
    val docs = graft.Tables.documents(spark, dir).repartition(13)
    docs.createOrReplaceTempView("__docs_reparted")
    val b = docs
      .withColumn("h", (col("doc_id") * 1103515245L + 12345L) % 100)
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("split").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // and the three splits partition the corpus
    val total = a.map(_(1).asInstanceOf[Long]).sum
    assert(total == graft.Tables.documents(spark, dir).count())
  }

  test("mode tie-break picks the lowest value among max counts") {
    import spark.implicits._
    val df = Seq(("A", 5.0), ("A", 5.0), ("A", 2.0), ("A", 2.0), ("A", 9.0))
      .toDF("g", "v")
    val counts = df.groupBy($"g", $"v").agg(count(lit(1)).as("cnt"))
    val mode = counts.groupBy($"g")
      .agg(max(struct($"cnt", (-$"v").as("negv"))).as("m"))
      .select($"g", (-$"m.negv").as("mode_v"), $"m.cnt".as("mode_count"))
      .collect().map(_.toSeq)
    assert(mode.toSeq == Seq(Seq("A", 2.0, 2L)), "2.0 and 5.0 tie at count 2 → lowest wins")
  }

  test("array HOF l1 norm matches a driver-side fold on sample rows") {
    val rows = RelationalExt2.q72ArrayHof(spark, dir).limit(5)
      .join(graft.Tables.embeddings(spark, dir), "vec_id")
      .select("vec_id", "l1_norm", "embedding")
      .collect()
    rows.foreach { r =>
      val want = r.getSeq[Float](2).foldLeft(0.0)((a, x) => a + math.abs(x.toDouble))
      assert(r.getDouble(1) == want, s"vec ${r.getLong(0)}")
    }
  }

  test("datetime battery: month boundaries and day arithmetic agree with java.time") {
    val r = RelationalExt2.q78Datetime(spark, dir)
      .join(graft.Tables.orders(spark, dir), "o_orderkey")
      .select("o_orderkey", "month_start", "month_end", "days_since_95", "o_orderdate")
      .limit(20).collect()
    r.foreach { row =>
      val d = row.getAs[java.time.LocalDateTime](4).toLocalDate
      assert(row.getString(1) == d.withDayOfMonth(1).toString)
      assert(row.getString(2) == d.withDayOfMonth(d.lengthOfMonth).toString)
      assert(row.getInt(3) ==
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(1995, 1, 1), d))
    }
  }
}
