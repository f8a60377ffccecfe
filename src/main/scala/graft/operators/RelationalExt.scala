package graft.operators

import graft.Tables
import graft.functions.OracleSafe.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Extended operator surface (SURVEY.md §2.3-§2.10, §2.13 + idiomatic
  * rewrites from §4.3): windows, native pivot, rollup/grouping-sets, the full
  * scalar-function battery of the reference's cleanse kernel, JSON
  * flatten/unflatten (the reference's bronze pattern), null
  * handling, set ops, percentiles, CSV/JSON source-sink roundtrips.
  */
object RelationalExt {

  /** Window functions (§2.7 extension): per-nation top-3 customers by
    * balance with row_number/rank + an order-independent running decimal sum.
    * Partition-by keys bound the shuffle; no global sort until the final
    * (small) result. */
  def q09WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_bal",
        sum(col("c_acctbal").cast(DecimalType(38, 6)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .filter(col("rn") <= 3)
      .select(col("c_nationkey"), col("rn"), col("c_custkey"),
        col("c_acctbal"), col("running_bal"))
      .orderBy(col("c_nationkey"), col("rn"))
  }

  val q09Sql: String =
    """SELECT c_nationkey, rn, c_custkey, c_acctbal, running_bal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    CAST(row_number() OVER w AS INTEGER) AS rn,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) OVER
      |      (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_bal
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
      |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin

  /** Native pivot (§4.3 rewrite of the reference's collect()+join-loop pivot,
    * BuildGoldLayer.py:92-139): one shuffle instead of N full-outer joins.
    * Explicit value list keeps the plan deterministic and avoids the extra
    * distinct scan — exactly what the rewrite recommends at 100 TB. */
  def q10Pivot(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .withColumn("qtr", quarter(col("o_orderdate")))
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val nat = Tables.nation(s, dir)
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("qtr", Seq(1, 2, 3, 4))
      .agg(dsum(col("o_totalprice")))
      .withColumnRenamed("1", "q1").withColumnRenamed("2", "q2")
      .withColumnRenamed("3", "q3").withColumnRenamed("4", "q4")
      .orderBy(col("n_name"))
  }

  val q10Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CASE WHEN quarter(o_orderdate)=1 THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS q1,
      |  CAST(SUM(CASE WHEN quarter(o_orderdate)=2 THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS q2,
      |  CAST(SUM(CASE WHEN quarter(o_orderdate)=3 THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS q3,
      |  CAST(SUM(CASE WHEN quarter(o_orderdate)=4 THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS q4
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** ROLLUP hierarchy totals; NULL grouping keys replaced with a sentinel so
    * cross-engine NULL-ordering differences can't bite. */
  def q11Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  val q11Sql: String =
    """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
      |  coalesce(l_linestatus,'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Scalar-function battery (§2.10 X1-X12 + regex): the reference's cleanse
    * kernel vocabulary demonstrated row-level on `part`. All pure Catalyst
    * expressions → whole-stage codegen, no UDFs (§4.3). */
  def q12ScalarBattery(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        lower(col("p_type")).as("type_lo"),
        substring(col("p_name"), 1, 4).as("name4"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        abs(col("p_retailprice") - lit(1000.0)).as("absdev"),
        floor(col("p_retailprice")).as("price_floor"),
        ceil(col("p_retailprice") / lit(10.0)).as("price_ceil10"),
        sqrt(col("p_size").cast("double")).as("size_sqrt"),
        (col("p_size") % 5).as("size_mod"),
        greatest(col("p_size"), lit(25)).as("size_hi"),
        least(col("p_size"), lit(25)).as("size_lo"),
        when(col("p_size") >= 25, "big").otherwise("small").as("size_class"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        coalesce(nullif(col("p_type"), lit("PROMO")), lit("NOT_PROMO")).as("type_np"),
        repeat(col("p_brand"), 2).as("brand2"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"))
      .orderBy(col("p_partkey"))

  val q12Sql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS name_up,
      |  lower(p_type) AS type_lo,
      |  substring(p_name, 1, 4) AS name4,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  CAST(length(p_name) AS INTEGER) AS name_len,
      |  abs(p_retailprice - 1000.0) AS absdev,
      |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(p_retailprice / 10.0) AS BIGINT) AS price_ceil10,
      |  sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
      |  p_size % 5 AS size_mod,
      |  CAST(greatest(p_size, 25) AS INTEGER) AS size_hi,
      |  CAST(least(p_size, 25) AS INTEGER) AS size_lo,
      |  CASE WHEN p_size >= 25 THEN 'big' ELSE 'small' END AS size_class,
      |  regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  coalesce(nullif(p_type, 'PROMO'), 'NOT_PROMO') AS type_np,
      |  repeat(p_brand, 2) AS brand2,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
      |  trim('  ' || p_name || '  ') AS name_trim
      |FROM part ORDER BY p_partkey""".stripMargin

  /** JSON expressions (X3/X4 + from_json): extract from a JSON string column,
    * rebuild JSON from a struct — the reference's bronze flatten vocabulary
    * (BuildBronzeLayer.py:181-190). */
  def q13Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        json_tuple(col("props"), "k").as("k_str"),
        from_json(col("props"), lit("k INT")).getField("k").as("k2"),
        to_json(struct(col("event_id"), col("user_id"))).as("js"))
      .orderBy(col("event_id"))

  val q13Sql: String =
    """SELECT event_id,
      |  CAST(props->>'$.k' AS INTEGER) AS k,
      |  props->>'$.k' AS k_str,
      |  CAST(props->>'$.k' AS INTEGER) AS k2,
      |  to_json(struct_pack(event_id := event_id, user_id := user_id)) AS js
      |FROM events ORDER BY event_id""".stripMargin

  /** Tumbling-window aggregation over the event stream, batch form — the
    * exact plan Structured Streaming produces for
    * `groupBy(window($"ts","1 hour"))` (see graft.streaming). Map-side
    * partial agg means the shuffle carries one row per (hour) per task. */
  def q14EventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n_events"), col("sum_value"), col("n_users"))
      .orderBy(col("hour"))

  val q14Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY hour""".stripMargin

  /** Null imputation pipeline (F5/F6/F7): synthesize nulls, then
    * na.fill + na.replace + na.drop — the silver-layer website imputation
    * (BuildSilverLayer.py:162-163) and dict replace (BuildGoldLayer.py:175). */
  def q15NullHandling(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("seg",
        when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
          .otherwise(col("c_mktsegment")))
      .withColumn("bal",
        when(col("c_acctbal") < 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")))
      .na.fill("Not Provided", Seq("seg"))
      .na.replace("seg", Map("AUTOMOBILE" -> "CAR"))
      .na.drop("any", Seq("bal"))
      .select(col("c_custkey"), col("seg"), col("bal"))
      .orderBy(col("c_custkey"))

  val q15Sql: String =
    """SELECT c_custkey,
      |  CASE WHEN c_mktsegment = 'BUILDING' THEN 'Not Provided'
      |       WHEN c_mktsegment = 'AUTOMOBILE' THEN 'CAR'
      |       ELSE c_mktsegment END AS seg,
      |  c_acctbal AS bal
      |FROM customer WHERE c_acctbal >= 0 ORDER BY c_custkey""".stripMargin

  /** Top-k with deterministic tiebreak (O2 + limit): TakeOrderedAndProject —
    * a per-partition heap + driver merge, never a global sort. */
  def q16TopkPart(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(100)

  val q16Sql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |ORDER BY p_retailprice DESC, p_partkey LIMIT 100""".stripMargin

  /** Cross join (small×small only — at scale this is always a broadcast
    * nested loop; never cross-join two fact tables). */
  def q17CrossJoin(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).select("r_name")
      .crossJoin(broadcast(Tables.nation(s, dir).select("n_name")))
      .orderBy(col("r_name"), col("n_name"))

  val q17Sql: String =
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  /** INTERSECT / EXCEPT set semantics (§2.9 extension). */
  def q18SetOps(s: SparkSession, dir: String): DataFrame = {
    val custN = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val richSuppN = Tables.supplier(s, dir).filter(col("s_acctbal") > 5000)
      .select(col("s_nationkey").as("nationkey"))
    custN.intersect(richSuppN).withColumn("op", lit("intersect"))
      .unionByName(custN.except(richSuppN).withColumn("op", lit("except")))
      .select(col("op"), col("nationkey"))
      .orderBy(col("op"), col("nationkey"))
  }

  val q18Sql: String =
    """SELECT 'intersect' AS op, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT
      |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
      |UNION ALL
      |SELECT 'except' AS op, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT
      |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
      |ORDER BY op, nationkey""".stripMargin

  /** Exact percentile per group (ordered-set aggregate). Rounded to 6dp: the
    * interpolation formula may differ by 1 ulp across engines while the true
    * value has ≤3 decimals. */
  def q19Percentile(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(
        round(expr("percentile(c_acctbal, 0.5)"), 6).as("median_bal"),
        round(expr("percentile(c_acctbal, 0.9)"), 6).as("p90_bal"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))

  val q19Sql: String =
    """SELECT c_nationkey,
      |  round(quantile_cont(c_acctbal, 0.5), 6) AS median_bal,
      |  round(quantile_cont(c_acctbal, 0.9), 6) AS p90_bal,
      |  min(c_acctbal) AS min_bal,
      |  max(c_acctbal) AS max_bal,
      |  COUNT(*) AS n
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** GROUPING SETS through the SQL surface (temp view + spark.sql) —
    * demonstrates the SQL entry path alongside the DataFrame API. */
  def q20GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
        |  COUNT(*) AS n
        |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority), (c_mktsegment), ())
        |ORDER BY segment, priority""".stripMargin)
  }

  val q20Sql: String =
    """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
      |  COUNT(*) AS n
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority), (c_mktsegment), ())
      |ORDER BY segment, priority""".stripMargin

  /** CSV sink + CSV scan with header/inferSchema roundtrip (S2 + K-sinks,
    * BuildBronzeLayer.py:100-143): parquet → CSV → read back → aggregate.
    * Spark's CSV double rendering (shortest roundtrip form) is lossless. */
  def q21CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.SparkSupport.roundtripPath("csv_rt", dir)
    Tables.customer(s, dir)
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").option("header", "true").csv(tmp)
    s.read.option("header", "true").option("inferSchema", "true").csv(tmp)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  val q21Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** JSON staging sink + JSON scan + generator flatten (S1/K5 + P2/P3, the
    * bronze `json_tuple(to_json(col("data")))` pattern at
    * BuildBronzeLayer.py:181-190): nest rows under a `data` struct, write
    * JSON, read back with schema inference, flatten via the json_tuple
    * generator, restore types. */
  def q22JsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.SparkSupport.roundtripPath("json_rt", dir)
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(struct(col("n_nationkey"), col("n_name"), col("r_name")).as("data"))
      .write.mode("overwrite").json(tmp)
    s.read.json(tmp)
      .select(json_tuple(to_json(col("data")), "n_nationkey", "n_name", "r_name"))
      .toDF("nationkey_s", "n_name", "r_name")
      .select(col("nationkey_s").cast(LongType).as("n_nationkey"),
        col("n_name"), col("r_name"))
      .orderBy(col("n_nationkey"))
  }

  val q22Sql: String =
    """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, r_name
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin

  /** The silver cleanse kernel end-to-end on testdata (F4 regex-gated date
    * parse, X5-X12 casing/dates/casts, J4 map lookup via typedLit+element_at
    * — the Catalyst-native replacement for the reference's broadcast-dict
    * Python UDF, §4.3 — and F6 imputation). */
  def q23CleanseKernel(s: SparkSession, dir: String): DataFrame = {
    val priorityMap = typedLit(Map(
      "1-URGENT" -> "P1", "2-HIGH" -> "P2", "3-MEDIUM" -> "P3"))
    Tables.orders(s, dir)
      .withColumn("ds", date_format(col("o_orderdate"), "M/d/yyyy"))
      .withColumn("parsed",
        when(col("ds").rlike("^\\d{1,2}/\\d{1,2}/\\d{4}$"),
          to_date(col("ds"), "M/d/yyyy")))
      .withColumn("yr", year(col("parsed")))
      .withColumn("qtr", quarter(col("parsed")))
      .withColumn("prio", element_at(priorityMap, col("o_orderpriority")))
      .na.fill("OTHER", Seq("prio"))
      .withColumn("status_lc", lower(col("o_orderstatus")))
      .withColumn("price_long", floor(col("o_totalprice")).cast(LongType))
      .select("o_orderkey", "ds", "parsed", "yr", "qtr", "prio",
        "status_lc", "price_long")
      .orderBy(col("o_orderkey"))
  }

  val q23Sql: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%-m/%-d/%Y') AS ds,
      |  CASE WHEN regexp_matches(strftime(o_orderdate, '%-m/%-d/%Y'), '^\d{1,2}/\d{1,2}/\d{4}$')
      |       THEN CAST(strptime(strftime(o_orderdate, '%-m/%-d/%Y'), '%-m/%-d/%Y') AS DATE) END AS parsed,
      |  CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |  CASE o_orderpriority WHEN '1-URGENT' THEN 'P1' WHEN '2-HIGH' THEN 'P2'
      |       WHEN '3-MEDIUM' THEN 'P3' ELSE 'OTHER' END AS prio,
      |  lower(o_orderstatus) AS status_lc,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_long
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** initcap (X5) — DuckDB lacks initcap, so the oracle reconstructs it
    * word-by-word; kept separate from q12 to keep that battery 1:1. */
  def q24Initcap(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        initcap(lower(col("c_mktsegment"))).as("seg_cap"),
        initcap(col("c_name")).as("name_cap"))
      .orderBy(col("c_custkey"))

  val q24Sql: String =
    """SELECT c_custkey,
      |  upper(substr(lower(c_mktsegment),1,1)) || substr(lower(c_mktsegment),2) AS seg_cap,
      |  upper(substr(lower(c_name),1,1)) || substr(lower(c_name),2) AS name_cap
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Null/empty probe (F3, Helpers_FunctionsDicts.py:54-63) as one
    * aggregate over one scan, on a frame with synthesized nulls/empties —
    * see [[graft.functions.Probes.nullEmptyCounts]]. */
  def q47NullProbe(s: SparkSession, dir: String): DataFrame =
    graft.functions.Probes.nullEmptyCounts(
      Tables.customer(s, dir)
        .selectExpr("c_custkey",
          "CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END AS seg",
          "CASE WHEN c_custkey % 5 = 0 THEN '' ELSE c_name END AS name"))
      .orderBy("column")

  val q47Sql: String =
    """WITH src AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END AS seg,
      |    CASE WHEN c_custkey % 5 = 0 THEN '' ELSE c_name END AS name
      |  FROM customer)
      |SELECT col AS "column", n_bad, n_rows FROM (
      |  SELECT 'c_custkey' AS col,
      |    count(*) FILTER (c_custkey IS NULL OR CAST(c_custkey AS VARCHAR) = '') AS n_bad,
      |    count(*) AS n_rows FROM src
      |  UNION ALL
      |  SELECT 'seg', count(*) FILTER (seg IS NULL OR seg = ''), count(*) FROM src
      |  UNION ALL
      |  SELECT 'name', count(*) FILTER (name IS NULL OR name = ''), count(*) FROM src)
      |ORDER BY col""".stripMargin

  /** Full-outer join (the join type the reference's pivot loop used,
    * BuildGoldLayer.py:110-135 — subsumed by pivot there, covered directly
    * here): half the customers ⟗ per-customer order rollups, so the result
    * carries left-only rows (customers without orders), right-only rows
    * (orders of the filtered-out customers), and matches. */
  def q56OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val ord = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_mktsegment"), col("n_orders"), col("total_price"))
      .orderBy("custkey")
  }

  val q56Sql: String =
    """WITH ch AS (
      |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 0),
      |oa AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
      |  FROM orders GROUP BY o_custkey)
      |SELECT coalesce(c_custkey, o_custkey) AS custkey,
      |  c_mktsegment, n_orders, total_price
      |FROM ch FULL OUTER JOIN oa ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_null_probe"     -> q47NullProbe,
    "q09_window_rank"    -> q09WindowRank,
    "q10_pivot"          -> q10Pivot,
    "q11_rollup"         -> q11Rollup,
    "q12_scalar_battery" -> q12ScalarBattery,
    "q13_json"           -> q13Json,
    "q14_events_hourly"  -> q14EventsHourly,
    "q15_null_handling"  -> q15NullHandling,
    "q16_topk_part"      -> q16TopkPart,
    "q17_cross_join"     -> q17CrossJoin,
    "q18_set_ops"        -> q18SetOps,
    "q19_percentile"     -> q19Percentile,
    "q20_grouping_sets"  -> q20GroupingSets,
    "q21_csv_roundtrip"  -> q21CsvRoundtrip,
    "q22_json_roundtrip" -> q22JsonRoundtrip,
    "q23_cleanse_kernel" -> q23CleanseKernel,
    "q24_initcap"        -> q24Initcap,
    "q56_outer_join"     -> q56OuterJoin)

  val oracle: Map[String, String] = Map(
    "q47_null_probe"     -> q47Sql,
    "q09_window_rank"    -> q09Sql,
    "q10_pivot"          -> q10Sql,
    "q11_rollup"         -> q11Sql,
    "q12_scalar_battery" -> q12Sql,
    "q13_json"           -> q13Sql,
    "q14_events_hourly"  -> q14Sql,
    "q15_null_handling"  -> q15Sql,
    "q16_topk_part"      -> q16Sql,
    "q17_cross_join"     -> q17Sql,
    "q18_set_ops"        -> q18Sql,
    "q19_percentile"     -> q19Sql,
    "q20_grouping_sets"  -> q20Sql,
    "q21_csv_roundtrip"  -> q21Sql,
    "q22_json_roundtrip" -> q22Sql,
    "q23_cleanse_kernel" -> q23Sql,
    "q24_initcap"        -> q24Sql,
    "q56_outer_join"     -> q56Sql)
}
