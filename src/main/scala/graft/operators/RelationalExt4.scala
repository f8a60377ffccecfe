package graft.operators

import graft.Tables
import graft.functions.OracleSafe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth relational battery: the multiway-join/decision-support shapes that
  * round out SQL-surface parity — a TPC-H-Q5-style star join chain, the
  * subquery family (scalar / IN / EXISTS / NOT EXISTS through the SQL
  * parser), multi-measure pivot, and a calendar-hierarchy rollup with
  * grouping_id.
  */
object RelationalExt4 {

  /** q123: regional revenue — the TPC-H Q5 join shape: fact table joined
    * through two FK chains (order→customer→nation and lineitem→supplier→
    * nation) with the classic co-nationality constraint, dims filtered to
    * one region.
    *
    * Scale shape: region/nation/supplier/customer are broadcast (each orders
    * of magnitude under the fact side even at 100 TB — and the broadcasts
    * let the lineitem⋈orders shuffle be the ONLY exchange keyed by data
    * size). Catalyst pushes the region filter through the join chain so
    * pruned nations never reach the probe side; revenue accumulates in
    * decimal for engine-portable totals. */
  def q123RegionalRevenue(s: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      // co-nationality: supplier serves a customer of its own nation
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(OracleSafe.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q123Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)))
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** q124: subquery battery through the SQL parser — scalar subquery
    * (global average), uncorrelated IN, correlated EXISTS, and correlated
    * NOT EXISTS in one statement. Catalyst rewrites these to joins
    * (scalar → cross of a 1-row aggregate; IN → left-semi; EXISTS →
    * left-semi; NOT EXISTS → left-anti), so what executes is the same
    * shuffle algebra as the explicit-join queries — the test here is that
    * the REWRITES hold, not new physical machinery. */
  def q124SubqueryBattery(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "nation").foreach { t =>
      Tables.table(s, dir, t).createOrReplaceTempView(t)
    }
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_rich,
        |  sum(CASE WHEN EXISTS (SELECT 1 FROM orders o
        |                        WHERE o.o_custkey = c.c_custkey
        |                          AND o.o_totalprice > 300000)
        |           THEN 1 ELSE 0 END) AS n_big_spenders,
        |  sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o
        |                            WHERE o.o_custkey = c.c_custkey)
        |           THEN 1 ELSE 0 END) AS n_inactive
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_regionkey <= 2)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  val q124Sql: String =
    """SELECT c_mktsegment, count(*) AS n_rich,
      |  sum(CASE WHEN EXISTS (SELECT 1 FROM orders o
      |                        WHERE o.o_custkey = c.c_custkey
      |                          AND o.o_totalprice > 300000)
      |           THEN 1 ELSE 0 END) AS n_big_spenders,
      |  sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o
      |                            WHERE o.o_custkey = c.c_custkey)
      |           THEN 1 ELSE 0 END) AS n_inactive
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      |  AND c_nationkey IN (SELECT n_nationkey FROM nation
      |                      WHERE n_regionkey <= 2)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q125: multi-measure pivot — one `pivot` carrying several aggregates
    * (count + decimal revenue per status column). Spark emits
    * `<value>_<alias>` composite columns from ONE shuffle over the
    * (segment × status) matrix — where the reference's pivot-by-joins
    * pattern would run a join per measure per status value
    * (BuildGoldLayer.py:110-139). Status domain is pinned in the pivot
    * call: at 100 TB, letting pivot scan for distinct values is a full
    * extra pass. */
  def q125PivotMultiAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"),
        OracleSafe.dsum(col("o_totalprice")).as("rev"))
      .orderBy("c_mktsegment")

  val q125Sql: String =
    """SELECT c_mktsegment,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F_n",
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
      |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS "F_rev",
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O_n",
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
      |    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS "O_rev",
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P_n",
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
      |    FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS "P_rev"
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q126: calendar-hierarchy rollup — year → quarter → month with
    * `grouping_id()` distinguishing the aggregation levels (the reference
    * builds its quarterly gold tables at exactly one fixed grain;
    * BuildGoldLayer.py:92-139). One shuffle computes all four grains;
    * integer date-part extraction keeps every group key engine-portable.
    *
    * Scale shape: rollup multiplies output rows (4 grains), not input scans
    * — partial aggregation collapses each grain map-side before the single
    * exchange. */
  def q126TimeRollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .selectExpr("year(o_orderdate) AS yr", "quarter(o_orderdate) AS qtr",
        "month(o_orderdate) AS mo", "o_totalprice")
      .rollup("yr", "qtr", "mo")
      .agg(count(lit(1)).as("n"),
        OracleSafe.dsum(col("o_totalprice")).as("total"),
        grouping_id().as("lvl"))
      .orderBy(col("yr").asc_nulls_first, col("qtr").asc_nulls_first,
        col("mo").asc_nulls_first)

  val q126Sql: String =
    """SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      |  month(o_orderdate) AS mo, count(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
      |  GROUPING(year(o_orderdate)) * 4 + GROUPING(quarter(o_orderdate)) * 2
      |    + GROUPING(month(o_orderdate)) AS lvl
      |FROM orders
      |GROUP BY ROLLUP(year(o_orderdate), quarter(o_orderdate), month(o_orderdate))
      |ORDER BY yr NULLS FIRST, qtr NULLS FIRST, mo NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_regional_revenue" -> q123RegionalRevenue,
    "q124_subquery_battery" -> q124SubqueryBattery,
    "q125_pivot_multi_agg"  -> q125PivotMultiAgg,
    "q126_time_rollup"      -> q126TimeRollup)

  val oracle: Map[String, String] = Map(
    "q123_regional_revenue" -> q123Sql,
    "q124_subquery_battery" -> q124Sql,
    "q125_pivot_multi_agg"  -> q125Sql,
    "q126_time_rollup"      -> q126Sql)
}
