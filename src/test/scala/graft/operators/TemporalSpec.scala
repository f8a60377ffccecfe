package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temporal operators: the as-of merge form must equal the brute-force
  * definition, the bucketized range join must equal the theta join, and the
  * SCD2/CDC outputs must satisfy their structural laws. */
class TemporalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("as-of merge form equals brute-force max(ref.ts <= probe.ts)") {
    val out = Temporal.q66AsofJoin(spark, dir)
    val ev = graft.Tables.events(spark, dir)
    val probes = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val refs = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("r_user"), col("ts").as("pts"))
    // brute force: inequality join then per-probe max — the quadratic
    // definition the merge form must reproduce exactly
    val brute = probes
      .join(refs, col("user_id") === col("r_user") && col("pts") <= col("ts"), "left")
      .groupBy("event_id")
      .agg(max(col("pts")).as("want_ts"))
    val joined = out
      .withColumn("got", col("last_purchase_ts"))
      .join(brute, Seq("event_id"), "left")
      .withColumn("want", date_format(col("want_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    assert(joined.filter(
      (col("got").isNull && col("want").isNotNull) ||
      (col("got").isNotNull && col("want").isNull) ||
      (col("got") =!= col("want"))).count() == 0)
    assert(out.count() == probes.count(), "left semantics: every probe survives")
  }

  test("as-of tie at equal ts is inclusive (<=)") {
    import spark.implicits._
    import java.sql.Timestamp
    val t = Timestamp.valueOf("2024-01-01 10:00:00")
    val rows = Seq(
      (1L, 7L, t, "click", 1.0),
      (2L, 7L, t, "purchase", 5.0)).toDF("event_id", "user_id", "ts", "event_type", "value")
    rows.createOrReplaceTempView("__asof_tie")
    // reproduce the q66 pipeline inline on the tiny frame
    val probes = rows.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts", $"value")
    val refs = rows.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("pvalue"))
    val tagged = refs.select($"user_id", $"ts", lit(1).as("is_ref"),
        struct($"ts".as("pts"), $"pvalue").as("ref"),
        lit(null).cast("long").as("event_id"))
      .unionByName(probes.select($"user_id", $"ts", lit(0).as("is_ref"),
        lit(null).cast("struct<pts:timestamp,pvalue:double>").as("ref"), $"event_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"is_ref".desc)
      .rowsBetween(Long.MinValue, 0)
    val got = tagged.withColumn("last_ref", last($"ref", ignoreNulls = true).over(w))
      .filter($"is_ref" === 0).select($"last_ref.pvalue").as[Option[Double]].head()
    assert(got.contains(5.0), "a purchase at the same instant must match")
  }

  test("bucketized range join equals the theta join") {
    val out = Temporal.q67RangeJoin(spark, dir).collect().map(_.toSeq)
    val ev = graft.Tables.events(spark, dir)
    val ranges = spark.range(60).select(
      col("id").as("r_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,id*12,0,0)").as("r_start"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,id*12+2,0,0)").as("r_end"))
    val theta = ev.join(ranges,
        col("ts") >= col("r_start") && col("ts") < col("r_end"))
      .groupBy("r_id")
      .agg(count(lit(1)).as("n_events"),
        graft.functions.OracleSafe.dsum(col("value")).as("sum_value"))
      .orderBy("r_id").collect().map(_.toSeq)
    assert(out.toSeq == theta.toSeq)
  }

  test("SCD2 laws: one current row per key, contiguous non-overlapping spans") {
    val scd = Temporal.q68Scd2(spark, dir).cache()
    val perKey = scd.groupBy("o_custkey")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
        count(lit(1)).as("n"), max(col("version_n")).as("max_v"))
    assert(perKey.filter(col("n_current") =!= 1).count() == 0, "exactly one current")
    assert(perKey.filter(col("n") =!= col("max_v")).count() == 0, "dense versions")
    // span contiguity: valid_to of version k equals valid_from of k+1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("version_n"))
    val broken = scd.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
    assert(broken.count() == 0, "chained effectivity")
    scd.unpersist()
  }

  test("range frame equals an explicit self-join trailing sum") {
    val out = Temporal.q87RangeFrame(spark, dir)
    val o = graft.Tables.orders(spark, dir)
      .withColumn("day", datediff(col("o_orderdate"), lit("1970-01-01").cast("date")))
      .select(col("o_orderkey"), col("o_custkey"), col("day"), col("o_totalprice"))
    val brute = o.as("a").join(o.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("b.day") <= col("a.day") && col("b.day") >= col("a.day") - 30)
      .groupBy(col("a.o_orderkey").as("o_orderkey"))
      .agg(sum(col("b.o_totalprice").cast("decimal(38,6)")).cast("double").as("want"))
    val bad = out.join(brute, "o_orderkey")
      .filter(col("trail30") =!= col("want"))
    assert(bad.count() == 0)
  }

  test("sweep-line peak equals brute-force point evaluation") {
    import spark.implicits._
    import java.sql.Timestamp
    // known overlap structure: 3 overlapping, then 1 isolated
    val ts = Seq("2024-03-01 10:00:00", "2024-03-01 10:20:00",
      "2024-03-01 10:40:00", "2024-03-01 15:00:00")
      .map(Timestamp.valueOf)
    val ev = ts.zipWithIndex.map { case (t, i) => (i.toLong, t, 1L, "view", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val v = ev.select(col("ts"), (col("ts") + expr("INTERVAL 1 HOUR")).as("te"))
    val deltas = v.select(col("ts").as("t"), lit(1).as("delta"))
      .unionByName(v.select(col("te").as("t"), lit(-1).as("delta")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Long.MinValue, 0)
    val peak = deltas.withColumn("running", sum(col("delta")).over(w))
      .agg(max("running")).collect().head.getLong(0)
    assert(peak == 3, "10:40 sits inside both earlier 1h windows")
  }

  test("q88 sweep: a plain-Scala day-split replica reproduces every " +
    "per-day peak, and the sweep window is day-keyed (no global sort)") {
    val utc = java.time.ZoneOffset.UTC
    val starts = graft.Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "view")
      .select("ts").collect().map(_.getTimestamp(0).toInstant)
    // split each [t, t+1h) at midnight; deltas carry the sub-interval's day
    val deltas = starts.flatMap { t0 =>
      val t1 = t0.plusSeconds(3600)
      val mid = t0.atZone(utc).toLocalDate.plusDays(1).atStartOfDay(utc).toInstant
      val subs =
        if (t1.isAfter(mid)) Seq((t0, mid), (mid, t1)) else Seq((t0, t1))
      subs.flatMap { case (a, b) =>
        val day = a.atZone(utc).toLocalDate
        Seq((day, a, 1), (day, b, -1))
      }
    }
    val expected = deltas.groupBy(_._1).view.mapValues { ds =>
      var run = 0L; var peak = Long.MinValue
      ds.sortBy { case (_, t, d) => (t.getEpochSecond, t.getNano, d) }
        .foreach { case (_, _, d) =>
        run += d; peak = math.max(peak, run)
      }
      peak
    }.toMap.map { case (d, p) => d.toString -> p }
    val got = Temporal.q88SweepConcurrency(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.max >= 2, "the corpus must actually overlap somewhere")
    assert(assertWindowsKeyedOrBounded(
      Temporal.q88SweepConcurrency(spark, dir)) == 1)
  }

  test("CDC apply: highest-seq op wins and deletes remove the key") {
    import spark.implicits._
    val log = Seq(
      (10L, 1L, "I", 1.0), (10L, 5L, "U", 2.0),          // update wins
      (20L, 2L, "I", 1.0), (20L, 9L, "D", 0.0),          // deleted
      (30L, 3L, "I", 7.0)                                // untouched
    ).toDF("key", "seq", "op", "payload")
    val compacted = log.groupBy($"key")
      .agg(max(struct($"seq", $"op", $"payload")).as("last"))
      .filter($"last.op" =!= "D")
      .select($"key", $"last.seq".as("last_seq"), $"last.op".as("op"),
        $"last.payload".as("payload"))
      .orderBy("key").collect().map(_.toSeq)
    assert(compacted.toSeq == Seq(Seq(10L, 5L, "U", 2.0), Seq(30L, 3L, "I", 7.0)))
  }
}
