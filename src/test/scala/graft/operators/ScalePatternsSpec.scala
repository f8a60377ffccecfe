package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The scale patterns change join physics, not join results — asserted
  * directly here (the oracle gate re-checks q49/q50 against DuckDB). */
class ScalePatternsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    val big = (0 until 3000).map(i => (Seq("A", "B", "C")(i % 3), i)).toDF("k", "v")
    val small = Seq(("A", 10), ("B", 20), ("C", 30)).toDF("k", "w")
    val salted = ScalePatterns.saltedEquiJoin(big, small, "k", salt = 8)
      .collect().map(_.toSeq).sortBy(_.toString)
    val plain = big.join(small, "k")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salting spreads a hot key over `salt` shuffle sub-keys") {
    import spark.implicits._
    val big = (0 until 4000).map(i => ("HOT", i)).toDF("k", "v") // one key
    val small = Seq(("HOT", 1)).toDF("k", "w")
    val salted = ScalePatterns.saltedEquiJoin(big, small, "k", salt = 8)
    assert(salted.count() == 4000)
    // the replicated small side must carry every salt value
    val salts = big.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(8)))
      .select("__salt").distinct().count()
    assert(salts == 8, "xxhash64 spread must hit all 8 sub-keys")
  }

  test("q49 matches the unsalted formulation on testdata") {
    val salted = ScalePatterns.q49SaltedJoin(spark, dir)
      .collect().map(_.toSeq)
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val dim = { import spark.implicits._
      Seq(("A", "returned-accepted"), ("N", "not-returned"), ("R", "returned"))
        .toDF("l_returnflag", "flag_desc") }
    val plain = li.join(dim, "l_returnflag")
      .groupBy("l_returnflag", "flag_desc")
      .agg(count(lit(1)).as("n"),
        graft.functions.OracleSafe.dsum(col("l_quantity")).as("sum_qty"),
        graft.functions.OracleSafe.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag").collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("bucketed join plan has no exchange on either side") {
    ScalePatterns.q50BucketedJoin(spark, dir).count() // writes the tables
    val plan = ScalePatterns.bucketedJoinPlan(spark)
      .queryExecution.executedPlan.toString
    // the join itself must consume the bucket layout directly; the only
    // exchange allowed is the one for the FINAL groupBy/orderBy above it
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
    val below = plan.substring(joinIdx)
    assert(!below.contains("Exchange"),
      s"bucketed scan-side exchange found — bucketing not consumed:\n$plan")
  }

  test("partitioned scan prunes on the partition column") {
    ScalePatterns.q64PartitionPruning(spark, dir).count() // writes the layout
    val tmp = graft.SparkSupport.roundtripPath("events_parted", dir)
    val plan = ScalePatterns.partitionPrunedScan(spark, tmp)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition pruning on event_type:\n$plan")
    // the data filter must NOT appear as a post-scan filter on a data column
    assert(plan.contains("(event_type#") || plan.contains("event_type),"),
      s"partition filter should reference the partition column:\n$plan")
  }

  test("z-order layout clusters both dimensions (locality beats linear sort)") {
    import spark.implicits._
    // uniform 64x64 grid, one point per cell
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("xb", "yb")
      .withColumn("z", expr(ScalePatterns.zOrderExpr("xb", "yb")))
    // carve the z-sorted order into 16 equal partitions (what
    // repartitionByRange(z) does) and measure each partition's bounding box
    val ranked = pts.withColumn("rk",
        org.apache.spark.sql.functions.ntile(16)
          .over(org.apache.spark.sql.expressions.Window.orderBy("z")))
    def span(col1: String): Double = ranked.groupBy("rk")
      .agg((max(col(col1)) - min(col(col1))).as("s"))
      .agg(avg("s")).collect().head.getDouble(0)
    val (sx, sy) = (span("xb"), span("yb"))
    // a lexicographic (x, y) sort gives sy = 63 on every slice; the z curve
    // bounds BOTH spans near sqrt(cells-per-slice) = 16
    assert(sx <= 24 && sy <= 24, s"z-order spans: x=$sx y=$sy")
    // and the curve is a bijection on the grid
    assert(pts.select("z").distinct().count() == 64L * 64L)
  }

  test("closed-form z interleave equals the Σ-term HOF form on all 16-bit inputs") {
    import spark.implicits._
    // the oracle keeps the Σ_i ((x≫i&1)≪2i + (y≫i&1)≪(2i+1)) form; the
    // engine's bit-spread must be value-identical across the full domain
    val hof = """aggregate(sequence(0, 15), 0L, (acc, i) ->
                |  acc + (shiftleft(shiftright(xb, i) & 1, 2 * i)
                |       + shiftleft(shiftright(yb, i) & 1, 2 * i + 1)))""".stripMargin
    val n = spark.range(65536)
      .selectExpr("id AS xb", "(id * 2654435761L) % 65536 AS yb")
      .selectExpr(s"sum(CASE WHEN (${ScalePatterns.zOrderExpr("xb", "yb")})" +
        s" = ($hof) THEN 0 ELSE 1 END) AS bad")
      .head().getLong(0)
    assert(n === 0L)
  }

  test("dynamic partition pruning fires from a dim-side filter") {
    import spark.implicits._
    ScalePatterns.q64PartitionPruning(spark, dir).count() // writes the layout
    val tmp = graft.SparkSupport.roundtripPath("events_parted", dir)
    val fact = spark.read.parquet(tmp)
    // the keep flag is only knowable at runtime — static pruning can't help,
    // DPP must inject a subquery filter on the partition column. The dim
    // must be a SOURCE with a visible Filter: a local Seq constant-folds the
    // predicate away and DPP's selectivity check sees no predicate to reuse.
    val dimPath = s"${graft.SparkSupport.scratchDir}/graft_dpp_dim"
    Seq(("click", 1), ("view", 0), ("purchase", 0),
      ("signup", 0), ("error", 0)).toDF("event_type", "keep")
      .write.mode("overwrite").parquet(dimPath)
    val q = fact.join(spark.read.parquet(dimPath).filter($"keep" === 1),
        Seq("event_type"))
      .groupBy("event_type").count()
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the scan:\n$plan")
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a sort-merge join and make the skew detector sensitive enough
      // to fire on test-sized data
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // 90% of left rows share one key — the degenerate histogram q49's
      // salting handles manually; here AQE must detect and split it
      val left = spark.range(200000)
        .select((when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100))
          .as("k"), col("id").as("v"))
      val right = spark.range(100).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      // global aggregate: a groupBy on the join key would REQUIRE the join's
      // hash partitioning, and AQE refuses to split a skewed partition when
      // that breaks a required distribution (it would add a shuffle)
      val q = left.join(right, "k").agg(sum("w").as("s"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (key, Some(v)) => conf.set(key, v)
      case (key, None)    => conf.unset(key)
    }
  }

  test("AQE coalesces post-shuffle partitions at runtime") {
    val q = graft.Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead"),
      s"expected AQE to re-plan the exchange read:\n$plan")
  }

  test("skew demo pair: identical results, salted spreads the hot key, " +
    "neither side broadcasts") {
    val salted = ScalePatterns.q183SkewSalted(spark, dir)
    val unsalted = ScalePatterns.q184SkewUnsalted(spark, dir)
    assert(salted.collect().map(_.toSeq).toSeq ==
      unsalted.collect().map(_.toSeq).toSeq)
    val ps = salted.queryExecution.executedPlan.toString
    val pu = unsalted.queryExecution.executedPlan.toString
    // the demo measures SHUFFLE-join physics: a broadcast would erase the
    // skew both halves exist to compare
    assert(!ps.contains("BroadcastHashJoin"), s"salted half broadcast:\n$ps")
    assert(!pu.contains("BroadcastHashJoin"), s"unsalted half broadcast:\n$pu")
    // the salted plan joins on (k, __salt) — the hot key is spread
    assert(ps.contains("__salt"), s"expected __salt in join keys:\n$ps")
    assert(!pu.contains("__salt"), s"control must not salt:\n$pu")
  }

  test("bucketed join result matches the raw-table join") {
    val bucketed = ScalePatterns.q50BucketedJoin(spark, dir)
      .collect().map(_.toSeq)
    val raw = graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .join(graft.Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.OracleSafe.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_custkey").collect().map(_.toSeq)
    assert(bucketed.toSeq == raw.toSeq)
  }

  test("global ordinals equal the naive single-partition window's, but the " +
    "corpus-sized window is partitioned and only the 32-row offset table " +
    "collapses to one partition") {
    val q = ScalePatterns.q207GlobalOrdinals(spark, dir)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = graft.Tables.orders(spark, dir)
      .withColumn("ordinal", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy("o_orderdate", "o_orderkey")).cast("long"))
      .filter(col("ordinal") % 97 === 1)
      .orderBy("ordinal")
      .select("ordinal", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == naive.toSeq)
    // plan text from a FRESH (un-executed) frame: after execution AQE
    // replaces materialized stages with opaque references and the offset
    // exchange disappears from the printed tree
    val plan = ScalePatterns.q207GlobalOrdinals(spark, dir)
      .queryExecution.executedPlan.toString
    // the corpus-sized rank window runs per range partition (keyed by pid)
    assert(plan.contains("windowspecdefinition(pid"),
      s"expected the big window partitioned by pid:\n$plan")
    // exactly ONE SinglePartition exchange — the |partitions|-row offset
    // prefix-sum — and none feeding directly off a file scan
    val singles = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singles == 1, s"expected exactly one metadata-sized " +
      s"SinglePartition exchange, found $singles:\n$plan")
  }
}
