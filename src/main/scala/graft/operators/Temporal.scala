package graft.operators

import graft.Tables
import graft.functions.OracleSafe.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark's API lacks as first-class verbs — as-of join,
  * interval/range join — plus the slowly-changing-dimension and CDC-apply
  * patterns every lakehouse pipeline needs. Each is composed from Spark
  * primitives the way the scale path demands (SURVEY.md §2 preference
  * order (a): compose existing ops), with the join geometry chosen so no
  * step is quadratic in the inputs.
  */
object Temporal {

  private def fmtTs(c: String) =
    date_format(col(c), "yyyy-MM-dd HH:mm:ss.SSSSSS").as(c)

  /** q66: backward as-of join — for every click, the latest purchase by the
    * same user at or before the click.
    *
    * Implementation is the MERGE form, not a range join: tag both sides,
    * union, and take `last(ref, ignoreNulls)` over a per-user window ordered
    * by (ts, refs-first). One shuffle keyed by user_id, linear in
    * |probes|+|refs| — the classic windowed-union as-of that survives 100 TB,
    * vs. an inequality join that explodes to |probes|×|refs| per user before
    * filtering. Refs are pre-deduplicated per (user, ts) so tie rows can't
    * make the carried payload order-dependent; refs-first ordering at equal
    * ts gives `<=` (inclusive) semantics, matching DuckDB's `ASOF ... >=`.
    */
  def q66AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val probes = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val refs = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("pvalue"))
    val tagged = refs
      .select(col("user_id"), col("ts"), lit(1).as("is_ref"),
        struct(col("ts").as("pts"), col("pvalue")).as("ref"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"))
      .unionByName(probes.select(col("user_id"), col("ts"), lit(0).as("is_ref"),
        lit(null).cast("struct<pts:timestamp,pvalue:double>").as("ref"),
        col("event_id"), col("value")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_ref").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_ref", last(col("ref"), ignoreNulls = true).over(w))
      .filter(col("is_ref") === 0)
      .select(col("event_id"), col("user_id"), fmtTs("ts"), col("value"),
        date_format(col("last_ref.pts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("last_purchase_ts"),
        col("last_ref.pvalue").as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  val q66Sql: String =
    """WITH probes AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
      |refs AS (
      |  SELECT user_id, ts AS pts, max(value) AS pvalue
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, p.value,
      |  strftime(r.pts, '%Y-%m-%d %H:%M:%S.%f') AS last_purchase_ts,
      |  r.pvalue AS last_purchase_value
      |FROM probes p ASOF LEFT JOIN refs r
      |  ON p.user_id = r.user_id AND p.ts >= r.pts
      |ORDER BY p.event_id""".stripMargin

  /** q67: interval/range join — events against 2-hour maintenance windows
    * (one window every 12 hours over the event month).
    *
    * A raw `e.ts BETWEEN r.start AND r.end` theta-join plans as a nested
    * loop. The scale path bucketizes: each range explodes to the hour
    * buckets it covers (bounded fan-out = range_len/bucket + 1), events map
    * to their hour bucket map-side, and the join is a plain equi-join on the
    * bucket with the exact range predicate as a residual filter. Shuffle is
    * linear in events + Σ range-buckets; AQE handles bucket skew.
    */
  def q67RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ranges = s.range(60).select(
      col("id").as("r_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,id*12,0,0)").as("r_start"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,id*12+2,0,0)").as("r_end"))
    // each 2h range covers hour buckets [r_start, r_start+1h] — explode both
    val rangeBuckets = ranges.select(col("r_id"), col("r_start"), col("r_end"),
      explode(expr("sequence(date_trunc('hour', r_start), date_trunc('hour', r_end - interval 1 second), interval 1 hour)"))
        .as("bucket"))
    val ev = Tables.events(s, dir)
      .withColumn("bucket", date_trunc("hour", col("ts")))
    ev.join(broadcast(rangeBuckets), Seq("bucket"))
      .filter(col("ts") >= col("r_start") && col("ts") < col("r_end"))
      .groupBy(col("r_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("r_id"))
  }

  val q67Sql: String =
    """WITH ranges AS (
      |  SELECT r_id,
      |    TIMESTAMP '2024-01-01 00:00:00' + r_id * (INTERVAL 12 HOUR) AS r_start,
      |    TIMESTAMP '2024-01-01 00:00:00' + r_id * (INTERVAL 12 HOUR) + INTERVAL 2 HOUR AS r_end
      |  FROM (SELECT unnest(range(0, 60)) AS r_id))
      |SELECT r_id, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
      |FROM events e JOIN ranges r
      |  ON e.ts >= r.r_start AND e.ts < r.r_end
      |GROUP BY r_id ORDER BY r_id""".stripMargin

  /** q68: SCD type-2 build — one version row per (customer, order day) with
    * [valid_from, valid_to) effectivity derived by `lead` over the customer
    * history. One shuffle on the dimension key; the window sort is per-key,
    * never global. The day-grain pre-aggregate makes version rows unique
    * and the result order-independent.
    */
  def q68Scd2(s: SparkSession, dir: String): DataFrame = {
    val versions = Tables.orders(s, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(dsum(col("o_totalprice")).as("day_total"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    versions
      .withColumn("valid_from", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .withColumn("valid_to",
        date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd"))
      .withColumn("version_n", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select("o_custkey", "valid_from", "valid_to", "day_total",
        "version_n", "is_current")
      .orderBy(col("o_custkey"), col("version_n"))
  }

  val q68Sql: String =
    """WITH versions AS (
      |  SELECT o_custkey, o_orderdate,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS day_total
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_custkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
      |  strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
      |  day_total,
      |  CAST(row_number() OVER w AS INTEGER) AS version_n,
      |  (lead(o_orderdate) OVER w) IS NULL AS is_current
      |FROM versions
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
      |ORDER BY o_custkey, version_n""".stripMargin

  /** q69: CDC apply / changelog compaction — a synthetic insert/update/delete
    * stream keyed to ~5k rows, compacted to final state.
    *
    * Latest-wins is a single hash aggregate over `max(struct(seq, op,
    * payload))` — struct ordering leads with the monotonic sequence number,
    * so the partial (map-side) max already discards superseded changes
    * before the shuffle. No per-key window sort, no full-changelog shuffle:
    * exactly the shape MERGE-style compaction needs at 100 TB. Deletes
    * survive compaction and drop the key at the end.
    */
  def q69CdcApply(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        (col("o_orderkey") % 5000).as("key"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 11 === 0, "D")
          .when(col("o_orderkey") % 3 === 0, "U").otherwise("I").as("op"),
        col("o_totalprice").as("payload"))
      .groupBy(col("key"))
      .agg(max(struct(col("seq"), col("op"), col("payload"))).as("last"))
      .filter(col("last.op") =!= "D")
      .select(col("key"), col("last.seq").as("last_seq"),
        col("last.op").as("op"), col("last.payload").as("payload"))
      .orderBy(col("key"))

  val q69Sql: String =
    """SELECT key, seq AS last_seq, op, payload FROM (
      |  SELECT o_orderkey % 5000 AS key, o_orderkey AS seq,
      |    CASE WHEN o_orderkey % 11 = 0 THEN 'D'
      |         WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END AS op,
      |    o_totalprice AS payload,
      |    row_number() OVER (PARTITION BY o_orderkey % 5000
      |                       ORDER BY o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn = 1 AND op <> 'D'
      |ORDER BY key""".stripMargin

  /** q87: value-based window frames — per-customer 30-day TRAILING order
    * total via `rangeBetween` over a day index. The frame is bounded by the
    * ORDER-BY VALUE (peers share one result — no tie nondeterminism), so
    * the per-key state is a sliding 30-day buffer, independent of history
    * length; partitioned by customer, never a global sort. */
  def q87RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, 0)
    Tables.orders(s, dir)
      .withColumn("day", datediff(col("o_orderdate"), lit("1970-01-01").cast("date")))
      .withColumn("trail30",
        sum(col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double"))
      .select("o_orderkey", "o_custkey", "day", "trail30")
      .orderBy("o_orderkey")
  }

  val q87Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS INTEGER) AS day,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail30
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q88: interval-overlap concurrency via sweep line — peak number of
    * simultaneously-open 1-hour view sessions per day. Each interval emits
    * (+1 at start, −1 at end); a running sum over (t, delta) is the exact
    * concurrency curve, and its per-day max is the answer. Work is linear
    * in intervals — never the |I|² pairwise-overlap join.
    *
    * Determinism: ends sort before starts at the same instant (half-open
    * intervals), and permuting identical (t, delta) rows permutes identical
    * prefix-sum values, so max-per-day is well-defined.
    *
    * Scale shape: intervals are SPLIT at day boundaries (a 1-hour session
    * crosses at most one midnight) and each sub-interval's deltas carry
    * its OWN day — the sweep is then a day-KEYED window, one bounded
    * partition per day, never a global sort of the full delta stream
    * through one task. A midnight-crossing interval's carry-over enters
    * the next day as a +1 at 00:00, so each day's curve starts at zero
    * and still evaluates the true open-interval count at every in-day
    * boundary (including 00:00 itself — the carry-over instant the
    * unsplit global sweep never evaluated).
    *
    * OUTPUT-VISIBLE definition change (round 7, intentional): the 00:00
    * carry-over evaluation point means a day whose true concurrency
    * maximum occurs exactly at midnight (carried count exceeding every
    * in-day evaluation) reports that higher — truer — peak, which the
    * pre-round-7 global sweep missed. The oracle implements the same
    * day-split definition, so the gate is apples-to-apples, but q88
    * outputs (and recorded bench rows) from rounds ≤6 used the old
    * definition and can differ. */
  def q88SweepConcurrency(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(s, dir).filter(col("event_type") === "view")
      .select(col("ts"), (col("ts") + expr("INTERVAL 1 HOUR")).as("te"))
      .withColumn("mid", date_add(to_date(col("ts")), 1).cast("timestamp"))
    // half-open [t0, t1) sub-intervals, each inside one calendar day
    val parts = v
      .select(col("ts").as("t0"), least(col("te"), col("mid")).as("t1"))
      .unionByName(v.filter(col("te") > col("mid"))
        .select(col("mid").as("t0"), col("te").as("t1")))
    val deltas = parts
      .select(to_date(col("t0")).as("day"), col("t0").as("t"), lit(1).as("delta"))
      .unionByName(parts
        .select(to_date(col("t0")).as("day"), col("t1").as("t"), lit(-1).as("delta")))
    val w = Window.partitionBy("day").orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("running", sum(col("delta")).over(w))
      .groupBy("day")
      .agg(max(col("running")).as("peak_concurrency"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("peak_concurrency"))
      .orderBy("day")
  }

  val q88Sql: String =
    """WITH v AS (
      |  SELECT ts, ts + INTERVAL 1 HOUR AS te,
      |    CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP) AS mid
      |  FROM events WHERE event_type = 'view'),
      |p AS (
      |  SELECT ts AS t0, least(te, mid) AS t1 FROM v
      |  UNION ALL
      |  SELECT mid AS t0, te AS t1 FROM v WHERE te > mid),
      |deltas AS (
      |  SELECT CAST(t0 AS DATE) AS day, t0 AS t, 1 AS delta FROM p
      |  UNION ALL
      |  SELECT CAST(t0 AS DATE) AS day, t1 AS t, -1 AS delta FROM p),
      |curve AS (
      |  SELECT day, SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      |  FROM deltas)
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  CAST(max(running) AS BIGINT) AS peak_concurrency
      |FROM curve GROUP BY 1 ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_asof_join"         -> q66AsofJoin,
    "q67_range_join"        -> q67RangeJoin,
    "q68_scd2"              -> q68Scd2,
    "q69_cdc_apply"         -> q69CdcApply,
    "q87_range_frame"       -> q87RangeFrame,
    "q88_sweep_concurrency" -> q88SweepConcurrency)

  val oracle: Map[String, String] = Map(
    "q66_asof_join"         -> q66Sql,
    "q67_range_join"        -> q67Sql,
    "q68_scd2"              -> q68Sql,
    "q69_cdc_apply"         -> q69Sql,
    "q87_range_frame"       -> q87Sql,
    "q88_sweep_concurrency" -> q88Sql)
}
