package graft.operators

import graft.Tables
import graft.functions.OracleSafe.{davg, dsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2.1, §2.3-§2.6, §2.8-§2.9), each as a
  * pure `(SparkSession, sfDir) => DataFrame` demonstrated on the harness
  * TPC-H-ish tables with a DuckDB-checkable oracle.
  *
  * Scale notes (100 TB design stance):
  *  - Filters/projections are plain Catalyst expressions → pushed into the
  *    parquet scan (PushedFilters / ReadSchema), so scans read only the
  *    needed columns/row-groups.
  *  - Dimension joins (`nation`, `region`, small `customer` slices) use an
  *    explicit `broadcast()` hint: at 1000 executors a broadcast hash join
  *    avoids shuffling the fact table entirely.
  *  - Fact-fact joins shuffle on the join key and rely on AQE (enabled in the
  *    session) for skew splitting and shuffle coalescing.
  *  - Aggregations use map-side partial aggregation (automatic for
  *    sum/count/min/max) so the shuffle carries one row per group per task.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: scan → filter → groupBy → 6 aggregates → sort.
    * Reference analogue: the silver-layer cleanse+conform scan (BuildSilverLayer.py:139-269)
    * has no aggregates; this supplies the A-family coverage over testdata. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Row-level projection + multi-predicate filter (P1/P4, F1/F2): predicates
    * and the 5-column ReadSchema reach the parquet scan. */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30 &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  l_extendedprice * (1.0 - l_discount) AS revenue
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND l_quantity >= 30
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q3-shaped: selective dim filter → broadcast join → fact join →
    * agg → top-k (J1, A, O2, limit). `customer` filtered to one segment is
    * small relative to the facts → explicit broadcast keeps the orders scan
    * shuffle-free; at 100 TB only the lineitem↔orders join shuffles. */
  def q03JoinTopk(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Left equi-join on a single key (J1): fact ⟕ dim, dim broadcast. Mirrors
    * institutions ⟕ financials (BuildSilverLayer.py:287-289). */
  def q04LeftJoin(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_name", "c_mktsegment")
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"), "left")
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val q04Sql: String =
    """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** Composite-key (2-col) equi-join (J2): per-(partkey,suppkey) aggregate
    * joined back to the detail rows — the same shape as FOICU ⟕ FS220 ⟕ FS220D
    * on (charter_number, quarter_date) (BuildSilverLayer.py:302-304). The agg
    * and the join share the same keys, so Catalyst reuses one shuffle. */
  def q05CompositeJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ps = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("ps_qty"), count(lit(1)).as("ps_lines"))
    li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .join(ps, Seq("l_partkey", "l_suppkey"), "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("ps_qty"), col("ps_lines"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q05Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS ps_qty,
      |    COUNT(*) AS ps_lines
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT l.l_orderkey, l.l_linenumber, ps.ps_qty, ps.ps_lines
      |FROM lineitem l LEFT JOIN ps
      |  ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin

  /** unionByName with differing column order per side (U1) — positional union
    * would silently mis-assign, exactly the hazard the reference avoids at
    * BuildSilverLayer.py:324. Then distinct + global sort (A2, O1). */
  def q06UnionByName(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
        lit("customer").as("kind"))
    val supp = Tables.supplier(s, dir)
      .select(lit("supplier").as("kind"), col("s_acctbal").as("acctbal"),
        col("s_name").as("name"))
    cust.unionByName(supp).distinct()
      .orderBy(col("kind"), col("name"), col("acctbal"))
  }

  val q06Sql: String =
    """SELECT * FROM (
      |  SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
      |  UNION
      |  SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier)
      |ORDER BY kind, name, acctbal""".stripMargin

  /** Duplicate elimination on a projection (A1/A2 — dropDuplicates/distinct,
    * BuildSilverLayer.py:292,307,325). Full-projection distinct keeps the
    * result deterministic (subset-dropDuplicates keeps an arbitrary row). */
  def q07Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .dropDuplicates()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q07Sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Left-semi + left-anti joins (EXISTS / NOT EXISTS): customers with vs
    * without orders, tagged and unioned. Semi/anti never widen rows, so at
    * scale they beat `IN (subquery)` materialization. */
  def q08SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(s, dir).select("o_custkey")
    val has = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .withColumn("kind", lit("has_orders"))
    val not = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .withColumn("kind", lit("no_orders"))
    has.unionByName(not)
      .select(col("kind"), col("c_custkey"), col("c_nationkey"))
      .orderBy(col("kind"), col("c_custkey"))
  }

  val q08Sql: String =
    """SELECT 'has_orders' AS kind, c_custkey, c_nationkey FROM customer
    |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    |UNION ALL
    |SELECT 'no_orders' AS kind, c_custkey, c_nationkey FROM customer
    |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    |ORDER BY kind, c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_filter_project"  -> q02FilterProject,
    "q03_join_topk"       -> q03JoinTopk,
    "q04_left_join"       -> q04LeftJoin,
    "q05_composite_join"  -> q05CompositeJoin,
    "q06_union_by_name"   -> q06UnionByName,
    "q07_distinct"        -> q07Distinct,
    "q08_semi_anti"       -> q08SemiAnti)

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project"  -> q02Sql,
    "q03_join_topk"       -> q03Sql,
    "q04_left_join"       -> q04Sql,
    "q05_composite_join"  -> q05Sql,
    "q06_union_by_name"   -> q06Sql,
    "q07_distinct"        -> q07Sql,
    "q08_semi_anti"       -> q08Sql)
}
