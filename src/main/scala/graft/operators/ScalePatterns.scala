package graft.operators

import graft.{SparkSupport, Tables}
import graft.functions.OracleSafe.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns from the build guidance exercised as first-class,
  * oracle-checked operators: salting for skewed joins and bucketing for
  * co-located (exchange-free) joins. Both change the PHYSICS of the join
  * without changing its result — exactly the property the DuckDB gate
  * verifies (the oracle runs the plain join).
  */
object ScalePatterns {

  /** Salted equi-join for skewed keys. A hash join on a low-cardinality /
    * hot-keyed column puts each key's entire row set on ONE reduce task —
    * with 3 distinct keys, 29 of 32 tasks idle and the stragglers bound the
    * stage. Salting splits every big-side row into one of `salt` sub-keys
    * (deterministic spread via xxhash64 of a per-row id) and replicates the
    * SMALL side `salt`× so every (key, salt) pair still matches — the
    * shuffle then spreads each hot key over `salt` tasks. Replicating the
    * small side is the whole trick: its cost is |small|·salt rows, the
    * skew relief on the big side is worth orders of magnitude more at
    * 100 TB. (AQE's skew-join split handles sort-merge skew adaptively;
    * explicit salting is the plan-level tool when the key histogram is
    * KNOWN to be degenerate, and works for every join strategy.) */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<long>")))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** q49: lineitem joined to a tiny per-flag dimension on `l_returnflag` —
    * 3 distinct values over ~600k rows, the degenerate-histogram case —
    * through the salted join (16-way spread), then aggregated. The oracle
    * runs the plain join: same result, un-skewed physics. */
  def q49SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val dim = li.sparkSession.createDataFrame(Seq(
      ("A", "returned-accepted"), ("N", "not-returned"), ("R", "returned"))
    ).toDF("l_returnflag", "flag_desc")
    saltedEquiJoin(li, dim, "l_returnflag", salt = 16)
      .groupBy("l_returnflag", "flag_desc")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")
  }

  val q49Sql: String =
    """SELECT l_returnflag, flag_desc, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |JOIN (VALUES ('A', 'returned-accepted'), ('N', 'not-returned'),
      |             ('R', 'returned')) AS dim(l_returnflag, flag_desc)
      |  USING (l_returnflag)
      |GROUP BY l_returnflag, flag_desc ORDER BY l_returnflag""".stripMargin

  /** q50: co-located join via bucketing. Both sides are written
    * `bucketBy(8, key)` + `sortBy(key)` into catalog tables; reading them
    * back, the sort-merge join consumes the bucket layout directly — NO
    * exchange on either side (asserted in ScalePatternsSpec). This is THE
    * repeated-join amortization at 100 TB: pay the shuffle once at write
    * time, join for free forever after. Bucket counts must match (or
    * divide) across tables; 8 here, sized so each bucket file lands near
    * the parquet sweet spot at the target SF. */
  // bucketed-layout guard: the corpus CONTENT (dir + fingerprint) whose
  // layout currently backs the graft_*_b tables. A bucketed table IS
  // one-time physical organization — "pay the shuffle once at write time" —
  // so rebuilding it on every gate query would charge the amortized cost
  // per query; rewrite only when the corpus changes (tests at sf0.001 vs
  // the gate at sf0.01 share a JVM). The key folds in corpusFingerprint:
  // the dir string alone would serve STALE bucketed tables after the
  // driver regenerates the corpus in place (the layoutArtifact lesson).
  // plain var + synchronized (not an AtomicReference getAndSet): a second
  // concurrent caller must BLOCK until the first finishes writing the
  // bucketed tables, exactly like the computeIfAbsent caches — a
  // non-blocking guard would let it plan against half-written layouts
  private val bucketedLock = new Object
  private var bucketedFor: String = _

  def q50BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val key = s"$dir|${SparkSupport.corpusFingerprint(dir)}"
    // the JVM-static key alone is NOT enough: a test suite may stop the
    // SparkContext (GraftExtensionsSpec needs its own extensions session),
    // and the replacement session's in-memory catalog loses the table
    // registrations while bucketedFor still claims them — so re-check the
    // CATALOG too and rebuild into the fresh session when it was reset
    bucketedLock.synchronized { if (bucketedFor != key ||
        !s.catalog.tableExists("graft_lineitem_b") ||
        !s.catalog.tableExists("graft_orders_b")) SparkSupport.timedLayoutBuild {
      val base = s"${SparkSupport.scratchDir}/bucketed"
      // pre-partition on the bucket key so each task owns exactly one bucket:
      // without this, every input task writes a file per bucket it touches —
      // tasks x buckets small files and as many sorts (the small-file
      // amplification bucketed writes are notorious for at scale)
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite")
        .option("path", s"$base/orders_b").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_orders_b")
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_quantity")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite")
        .option("path", s"$base/lineitem_b").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_b")
      bucketedFor = key
    } }
    bucketedJoinPlan(s)
  }

  /** The join over the bucketed tables (separate so the spec can assert its
    * plan shape after the tables exist). The MERGE hint pins the strategy
    * the layout is built for: at the bench SFs the orders side fits under
    * the broadcast threshold and AQE would broadcast it (also fine — and
    * also exchange-free), but sort-merge-over-buckets is the plan that
    * holds when BOTH sides are 100 TB facts. */
  def bucketedJoinPlan(s: SparkSession): DataFrame =
    s.table("graft_lineitem_b")
      .join(s.table("graft_orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_custkey")

  val q50Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** q63: ORC sink + scan roundtrip — the third columnar interchange format
    * after parquet (native tables) and CSV/JSON (q21/q22). Same
    * pushdown/pruning properties as parquet through the DataSource V1 path. */
  def q63OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = SparkSupport.roundtripPath("orc_rt", dir)
    Tables.part(s, dir)
      .select("p_partkey", "p_brand", "p_size", "p_retailprice")
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .filter(col("p_size") >= 25)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("total_price"))
      .orderBy("p_brand")
  }

  val q63Sql: String =
    """SELECT p_brand, COUNT(*) AS n,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
      |FROM part WHERE p_size >= 25
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q64: Hive-style partitioned layout + partition pruning. Events are
    * written `partitionBy(event_type)`; the read-back filter on the
    * partition column prunes whole directories BEFORE any file is opened
    * (`PartitionFilters` on the scan — asserted in ScalePatternsSpec). At
    * 100 TB this is the first and biggest pruning lever: a
    * one-partition query reads one partition's bytes. */
  def q64PartitionPruning(s: SparkSession, dir: String): DataFrame = {
    val tmp = SparkSupport.roundtripPath("events_parted", dir)
    Tables.events(s, dir)
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    partitionPrunedScan(s, tmp)
  }

  /** The pruned read (separate so the spec can assert the scan's
    * PartitionFilters after the layout exists). */
  def partitionPrunedScan(s: SparkSession, tmp: String): DataFrame =
    s.read.parquet(tmp)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id") % 10)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("sum_value"))
      .toDF("user_mod", "n", "sum_value")
      .orderBy("user_mod")

  val q64Sql: String =
    """SELECT user_id % 10 AS user_mod, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_type = 'click'
      |GROUP BY 1 ORDER BY user_mod""".stripMargin

  /** q65: the `spark.sql` entry point — the same engine through SQL text
    * over registered temp views (every other gate query drives the
    * DataFrame API; a complete library exposes both). The statement mixes
    * a join, an aggregate, and a window so the SQL path exercises the
    * planner end-to-end, and the text is ANSI enough to BE its own oracle. */
  def q65SqlApi(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT * FROM (
        |  SELECT c_mktsegment,
        |    c_name,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
        |    COUNT(*) AS n_orders,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) DESC,
        |               c_name) AS rnk
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_mktsegment, c_name)
        |WHERE rnk <= 5
        |ORDER BY c_mktsegment, rnk""".stripMargin)
  }

  val q65Sql: String =
    """SELECT * FROM (
      |  SELECT c_mktsegment,
      |    c_name,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
      |    COUNT(*) AS n_orders,
      |    CAST(row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) DESC,
      |               c_name) AS INTEGER) AS rnk
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_mktsegment, c_name)
      |WHERE rnk <= 5
      |ORDER BY c_mktsegment, rnk""".stripMargin

  /** The 16-bit×2 Morton (Z-order) interleave as a portable expression:
    * z = Σ_i ((x≫i & 1) ≪ 2i) | ((y≫i & 1) ≪ (2i+1)). Pure integer
    * arithmetic — identical in any engine.
    *
    * r15-opt (guide §4): the `aggregate(sequence(0, 15), …)` HOF form ran
    * a 16-step interpreted lambda per row (HOFs are CodegenFallback);
    * this is the closed-form bit spread — (v | v≪8) & 0x00FF00FF,
    * (…≪4) & 0x0F0F0F0F, (…≪2) & 0x33333333, (…≪1) & 0x55555555 — whose
    * masked adds stay inside whole-stage codegen. Value-identical for
    * x, y ∈ [0, 65535] (the masks implement exactly the Σ_i term; the +
    * of the two spreads has disjoint bits, so + ≡ |), pinned by
    * ScalePatternsSpec's exhaustive 16-bit equivalence case. The oracle
    * SQL keeps the Σ form. */
  def zOrderExpr(x: String, y: String): String = {
    def spread(v: String): String = {
      val a = s"(($v | shiftleft($v, 8)) & 16711935L)"      // 0x00FF00FF
      val b = s"(($a | shiftleft($a, 4)) & 252645135L)"     // 0x0F0F0F0F
      val c = s"(($b | shiftleft($b, 2)) & 858993459L)"     // 0x33333333
      s"(($c | shiftleft($c, 1)) & 1431655765L)"            // 0x55555555
    }
    s"(${spread(x)} + shiftleft(${spread(y)}, 1))"
  }

  /** q91: Z-order (Morton-curve) layout — the multi-dimensional clustering
    * pattern behind Delta/Iceberg `OPTIMIZE ZORDER BY`. Interleaving the
    * bits of two bucketized keys gives a 1-D sort key under which points
    * close in EITHER dimension land close in the file order, so min/max
    * row-group stats prune scans filtered on x, on y, or on both — a plain
    * sort by (x, y) prunes only the leading column. Here: orders bucketized
    * to (custkey%256, day%256), z computed map-side, and the gate audits
    * the curve (per-z-range bucket counts + a box query both ways). The
    * layout action at scale is `repartitionByRange(z).sortWithinPartitions
    * (z).write` — exercised in ScalePatternsSpec with a locality assert. */
  def q91ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val z = Tables.orders(s, dir)
      .withColumn("xb", col("o_custkey") % 256)
      .withColumn("yb",
        datediff(col("o_orderdate"), lit("1990-01-01").cast("date")) % 256)
      .withColumn("z", expr(zOrderExpr("xb", "yb")))
    z.groupBy(expr("z div 4096").as("z_range"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("xb").between(10, 60) && col("yb").between(40, 160), 1)
          .otherwise(0)).as("n_in_box"))
      .filter(col("n_in_box") > 0)
      .orderBy("z_range")
  }

  val q91Sql: String =
    """WITH z AS (
      |  SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 16)), (acc, i) ->
      |      acc + (((o_custkey % 256) >> i) & 1) * (1 << (2 * i))
      |          + (((date_diff('day', DATE '1990-01-01', o_orderdate) % 256) >> i) & 1)
      |            * (1 << (2 * i + 1))) AS z,
      |    o_custkey % 256 AS xb,
      |    date_diff('day', DATE '1990-01-01', o_orderdate) % 256 AS yb
      |  FROM orders)
      |SELECT z // 4096 AS z_range, count(*) AS n,
      |  CAST(SUM(CASE WHEN xb BETWEEN 10 AND 60 AND yb BETWEEN 40 AND 160
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_in_box
      |FROM z GROUP BY 1 HAVING n_in_box > 0 ORDER BY z_range""".stripMargin

  /** The 90%-one-key skewed fact the q183/q184 pair joins: lineitem keyed
    * by a degenerate derived key (9 of 10 rows land on k=0, the rest spread
    * over 97 residues). Deterministic arithmetic on l_orderkey so the
    * DuckDB oracle reproduces it exactly. */
  private def skewedFact(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        when(col("l_orderkey") % 10 < 9, lit(0L))
          .otherwise(col("l_orderkey") % 97 + 1).as("k"),
        col("l_extendedprice"))

  /** The 98-key dimension both sides of the pair join to. */
  private def skewDim(s: SparkSession): DataFrame =
    s.range(98).select(col("id").as("k"),
      concat(lit("grp_"), (col("id") % 7).cast("string")).as("grp"))

  /** q183: the SALTED half of the bench-grade skew demonstration
    * (SURVEY §9b.5). Same 90%-one-key fact as q184, same result, but the
    * join runs through [[saltedEquiJoin]] (32-way spread) with the small
    * side shuffle-hash-hinted so the measurement exercises SHUFFLE-join
    * physics — an un-hinted plan would broadcast the 98·32-row dim and
    * no skew would exist to relieve. BENCH_r{N}.json carries q183 vs q184
    * seconds side by side. Measured at sf0.1/local[32]: salted 0.88 s vs
    * unsalted 0.54 s — at THIS scale the hot task (540k cheap probe rows,
    * ~20 ms of real work) sits far below the salt machinery's cost (one
    * extra-wide exchange + 32× dim replication), so the pair honestly
    * exposes the OVERHEAD side of the trade. That is the point of
    * measuring it: salting is not free, and pays only when per-key reduce
    * work dwarfs exchange cost — at 100 TB the unsalted hot task is hours
    * while the salt overhead is unchanged. The scale-invariant evidence is
    * the plan shape (hot key spread over 32 sub-keys vs one task),
    * asserted in ScalePatternsSpec. AQE skew-split stays at default
    * thresholds and does not fire at this scale (hot partition ≪ 256 MB)
    * — the split-based relief is asserted separately in
    * ScalePatternsSpec with sensitized thresholds. */
  def q183SkewSalted(s: SparkSession, dir: String): DataFrame =
    saltedEquiJoin(skewedFact(s, dir), skewDim(s).hint("shuffle_hash"),
        "k", salt = 32)
      .groupBy("k", "grp")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("k")

  /** q184: the UNSALTED control — identical fact, dim, hint, and result;
    * the hot key's entire row set lands on ONE reduce task. Exists to be
    * measured against q183 (see there). */
  def q184SkewUnsalted(s: SparkSession, dir: String): DataFrame =
    skewedFact(s, dir).join(skewDim(s).hint("shuffle_hash"), "k")
      .groupBy("k", "grp")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("k")

  /** One oracle for both halves: the pair differs only in join physics. */
  val q183Sql: String =
    """WITH fact AS (
      |  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
      |              ELSE l_orderkey % 97 + 1 END AS k,
      |    l_extendedprice
      |  FROM lineitem),
      |dim AS (
      |  SELECT i AS k, 'grp_' || CAST(i % 7 AS VARCHAR) AS grp
      |  FROM range(98) t(i))
      |SELECT k, grp, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
      |FROM fact JOIN dim USING (k)
      |GROUP BY k, grp ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q207

  /** q207: global ordinal assignment WITHOUT a single-partition sort — the
    * "give every row a stable global row number" operation (doc-ID
    * assignment, corpus sharding) that naively compiles to
    * `row_number() OVER (ORDER BY …)` = one Exchange SinglePartition = the
    * classic 100 TB scale-killer. The distributed form: range-repartition
    * on the sort key, rank WITHIN each partition (parallel windows), count
    * rows per partition, prefix-sum the |partitions|-sized count table
    * (metadata-sized — its single-partition window is 32 rows, not the
    * corpus), broadcast the offsets back, ordinal = offset + local rank.
    *
    * Determinism: range boundaries come from SAMPLING and differ run to
    * run, but offset + local rank is the global (o_orderdate, o_orderkey)
    * rank under ANY disjoint ordered partitioning — the output is
    * partitioning-invariant even though the partitioning isn't
    * deterministic. The oracle computes the same ordinal with the naive
    * global window, proving the two forms equal; ScalePatternsSpec asserts
    * the corpus-sized side of THIS plan has no SinglePartition exchange.
    * Output sampled every 97th ordinal to keep the gate row count small
    * at any SF. */
  def q207GlobalOrdinals(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint, NOT persist (ADVICE r8, the q147 fix): pid captures
    // spark_partition_id() over a SAMPLED range exchange; a lost-block
    // recompute would re-sample boundaries and mix offsets from one
    // partitioning with local ranks from another. Truncating lineage
    // freezes the pid-tagged rows — loss now fails the job (retryable)
    // instead of silently corrupting ordinals.
    val ranged = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderdate")
      .repartitionByRange(parts, col("o_orderdate"), col("o_orderkey"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // |partitions| rows: counts → exclusive prefix sums (this window's
    // SinglePartition is over 32 rows of metadata, not the table);
    // limit(parts) is identity — pid ∈ [0, parts) caps the group count —
    // and marks the window limit-bounded for the registry-wide plan sweep
    val offsets = ranged.groupBy("pid").agg(count(lit(1)).as("c"))
      .limit(parts)
      .withColumn("off",
        coalesce(sum(col("c")).over(
          Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("pid", "off")
    ranged
      .withColumn("lr", row_number().over(
        Window.partitionBy("pid").orderBy("o_orderdate", "o_orderkey")))
      .join(broadcast(offsets), "pid")
      .selectExpr("off + lr AS ordinal", "o_orderkey", "o_orderdate")
      .filter(expr("(off + lr) % 97 = 1"))
      .orderBy("ordinal")
  }

  val q207Sql: String =
    """SELECT ordinal, o_orderkey, o_orderdate FROM (
      |  SELECT row_number() OVER (ORDER BY o_orderdate, o_orderkey)
      |    AS ordinal, o_orderkey, o_orderdate
      |  FROM orders)
      |WHERE ordinal % 97 = 1 ORDER BY ordinal""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q207_global_ordinals" -> q207GlobalOrdinals,
    "q49_salted_join"      -> q49SaltedJoin,
    "q50_bucketed_join"    -> q50BucketedJoin,
    "q63_orc_roundtrip"    -> q63OrcRoundtrip,
    "q64_partition_pruning" -> q64PartitionPruning,
    "q65_sql_api"          -> q65SqlApi,
    "q91_zorder_layout"    -> q91ZorderLayout,
    "q183_skew_salted"     -> q183SkewSalted,
    "q184_skew_unsalted"   -> q184SkewUnsalted)

  val oracle: Map[String, String] = Map(
    "q207_global_ordinals" -> q207Sql,
    "q49_salted_join"      -> q49Sql,
    "q50_bucketed_join"    -> q50Sql,
    "q63_orc_roundtrip"    -> q63Sql,
    "q64_partition_pruning" -> q64Sql,
    "q65_sql_api"          -> q65Sql,
    "q91_zorder_layout"    -> q91Sql,
    "q183_skew_salted"     -> q183Sql,
    "q184_skew_unsalted"   -> q183Sql)
}
