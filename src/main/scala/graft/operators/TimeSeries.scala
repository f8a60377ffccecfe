package graft.operators

import graft.Tables
import graft.functions.OracleSafe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the events stream table: grid resampling with
  * forward fill (the gap-repair step before any windowed model sees the
  * data), exponentially-weighted moving averages (trend smoothing), and
  * IQR outlier detection (robust anomaly flagging).
  *
  * The reference's only time dimension is quarterly report dates
  * (/root/reference/pipelineApplication/goldLayer/BuildGoldLayer.py:92-139);
  * these cover the continuous-time analytics a monitoring/feature pipeline
  * needs. All three are engine-portable-deterministic: sums are
  * decimal-quantized ([[OracleSafe]]), the EWMA is a strict left fold (same
  * IEEE op sequence in any engine), and quartiles are computed by explicit
  * rank selection, not an engine-private percentile kernel.
  */
object TimeSeries {

  /** q114: resample + forward fill — hourly per-type totals joined onto the
    * dense (type × hour) grid, gaps carrying the last observed value forward
    * (`last(ignoreNulls)` over the ordered series; leading gaps → 0).
    *
    * Scale shape: the grid is GENERATED (`sequence` + explode — |types|×|hours|
    * rows, no data shuffle to build it); the join and the fill window both
    * key by series, so every series heals in parallel and the per-task state
    * is one running value. The window's sort is bounded by hours-per-series,
    * not events. */
  def q114GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), OracleSafe.dsum(col("value")).as("v"))
    val bounds = ev.agg(min(date_trunc("hour", col("ts"))).as("lo"),
      max(date_trunc("hour", col("ts"))).as("hi"))
    val grid = ev.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .selectExpr("event_type", "explode(sequence(lo, hi, interval 1 hour)) AS h")
    val fillW = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "h"), "left")
      .withColumn("filled",
        round(coalesce(last(col("v"), ignoreNulls = true).over(fillW),
          lit(0.0)), 6))
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:00").as("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"), col("filled"))
      .orderBy("event_type", "hour")
  }

  val q114Sql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
      |    count(*) AS n, CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS lo,
      |             max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hi FROM events),
      |grid AS (
      |  SELECT t.event_type, g.h
      |  FROM (SELECT DISTINCT event_type FROM events) t,
      |       (SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
      |                                      INTERVAL 1 HOUR)) AS h) g)
      |SELECT grid.event_type, strftime(grid.h, '%Y-%m-%d %H:00') AS hour,
      |  coalesce(n, 0) AS n_events,
      |  round(coalesce(last_value(v IGNORE NULLS) OVER (
      |    PARTITION BY grid.event_type ORDER BY grid.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 6) AS filled
      |FROM grid LEFT JOIN hourly
      |  ON grid.event_type = hourly.event_type AND grid.h = hourly.h
      |ORDER BY 1, 2""".stripMargin

  /** q115: EWMA (α = 0.2) over per-type daily totals. The smoothing is a
    * strict LEFT FOLD (`aggregate` HOF: acc ← 0.2·x + 0.8·acc), so the IEEE
    * operation sequence is pinned — any engine folding the same list gets
    * bit-identical doubles, unlike a windowed SUM whose accumulation tree is
    * engine-private. Per-day values come from prefix folds (O(days²) slices —
    * days-per-series is bounded; an unbounded stream would carry the single
    * running accumulator per key instead, same fold, O(1) state).
    *
    * Scale shape: one (type, day) hash agg shrinks events to |series|×|days|
    * rows; the fold state per series is its day list, never raw events. */
  def q115Ewma(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(OracleSafe.dsum(col("value")).as("v"))
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("d"), col("v")))).as("sv"))
      .selectExpr("event_type",
        "transform(sv, e -> e.d) AS ds",
        "transform(sv, e -> e.v) AS xs")
      .selectExpr("event_type", "ds", "xs",
        "posexplode(sequence(1, size(xs))) AS (p, t)")
      .selectExpr("event_type",
        "date_format(element_at(ds, t), 'yyyy-MM-dd') AS day",
        "round(aggregate(slice(xs, 1, t), 0.0D, (a, x) -> 0.2D * x + 0.8D * a), 6) AS ewma")
      .orderBy("event_type", "day")

  val q115Sql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
      |    CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |l AS (SELECT event_type, list(v ORDER BY d) AS xs, list(d ORDER BY d) AS ds
      |      FROM daily GROUP BY 1),
      |e AS (SELECT event_type, ds, xs,
      |        unnest(generate_series(1, len(xs))) AS t FROM l)
      |SELECT event_type, strftime(ds[t], '%Y-%m-%d') AS day,
      |  round(list_reduce(list_prepend(0.0, xs[1:t]),
      |                    (a, x) -> 0.2 * x + 0.8 * a), 6) AS ewma
      |FROM e ORDER BY 1, 2""".stripMargin

  /** q116: IQR outlier detection — per-type quartiles by EXPLICIT rank
    * selection (row_number → the two straddling ranks → linear
    * interpolation, i.e. type-7 quantiles spelled out), then the classic
    * 1.5·IQR fence count. No engine-private percentile kernel is involved,
    * so any SQL engine reproduces the exact doubles.
    *
    * Scale shape: the rank window partitions by series (parallel across
    * types); only the 4 straddling rows per series survive the selection
    * aggregate, and the fence check is a broadcast join of a |types|-row
    * fence table back onto the data — one full-data window sort is the
    * honest cost of exact quantiles (approximate → q52's KLL sketch). */
  def q116IqrOutliers(s: SparkSession, dir: String): DataFrame = {
    val ranked = Tables.events(s, dir)
      .select("event_type", "value")
      .withColumn("rn",
        row_number().over(Window.partitionBy("event_type").orderBy("value")))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy("event_type")))
    def pick(p: Double, off: Int, as: String) =
      max(when(col("rn") === floor((col("n") - 1) * p) + off, col("value")))
        .as(as)
    val q = ranked.groupBy("event_type", "n")
      .agg(pick(0.25, 1, "q1lo"), pick(0.25, 2, "q1hi"),
        pick(0.75, 1, "q3lo"), pick(0.75, 2, "q3hi"))
      .select(col("event_type"), col("n"),
        (col("q1lo") + ((col("n") - 1) * 0.25 - floor((col("n") - 1) * 0.25)) *
          (col("q1hi") - col("q1lo"))).as("q1"),
        (col("q3lo") + ((col("n") - 1) * 0.75 - floor((col("n") - 1) * 0.75)) *
          (col("q3hi") - col("q3lo"))).as("q3"))
    ranked.select("event_type", "value").join(broadcast(q), Seq("event_type"))
      .groupBy("event_type")
      .agg(max(col("n")).as("n"), round(max("q1"), 6).as("q1"),
        round(max("q3"), 6).as("q3"),
        count(when(col("value") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
          col("value") > col("q3") + lit(1.5) * (col("q3") - col("q1")),
          lit(1))).as("n_outliers"))
      .orderBy("event_type")
  }

  val q116Sql: String =
    """WITH ranked AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |qsel AS (
      |  SELECT event_type, n,
      |    max(CASE WHEN rn = CAST(floor((n-1)*0.25) AS BIGINT)+1 THEN value END) AS q1lo,
      |    max(CASE WHEN rn = CAST(floor((n-1)*0.25) AS BIGINT)+2 THEN value END) AS q1hi,
      |    max(CASE WHEN rn = CAST(floor((n-1)*0.75) AS BIGINT)+1 THEN value END) AS q3lo,
      |    max(CASE WHEN rn = CAST(floor((n-1)*0.75) AS BIGINT)+2 THEN value END) AS q3hi
      |  FROM ranked GROUP BY 1, 2),
      |q AS (
      |  SELECT event_type, n,
      |    q1lo + ((n-1)*0.25 - floor((n-1)*0.25)) * (q1hi - q1lo) AS q1,
      |    q3lo + ((n-1)*0.75 - floor((n-1)*0.75)) * (q3hi - q3lo) AS q3
      |  FROM qsel)
      |SELECT r.event_type, CAST(q.n AS BIGINT) AS n,
      |  round(q.q1, 6) AS q1, round(q.q3, 6) AS q3,
      |  count(CASE WHEN r.value < q.q1 - 1.5*(q.q3-q.q1)
      |               OR r.value > q.q3 + 1.5*(q.q3-q.q1) THEN 1 END) AS n_outliers
      |FROM ranked r JOIN q ON r.event_type = q.event_type
      |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin

  /** q129: event-transition matrix — first-order Markov counts over each
    * user's time-ordered event stream (`lag` per user), with the transition
    * probability against the from-state total. The order within a user is
    * pinned by (ts, event_id) so concurrent events can't flip across
    * engines.
    *
    * Scale shape: the window partitions by user — millions of independent
    * per-user sorts, each bounded by that user's history, never a global
    * order. The matrix aggregate is |types|² groups out of any row count. */
  def q129EventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") /
        sum("n").over(Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  val q129Sql: String =
    """WITH t AS (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS from_type,
      |    event_type AS to_type
      |  FROM events),
      |m AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  round(n / sum(n) OVER (PARTITION BY from_type), 6) AS p
      |FROM m ORDER BY from_type, to_type""".stripMargin

  /** q130: running balance — per-customer cumulative order totals in order
    * date sequence (the account-statement query). The running SUM
    * accumulates in DECIMAL: decimal addition is exact and associative, so
    * unlike a double running sum the prefix values are identical under any
    * engine's window accumulation scheme (Spark folds linearly; other
    * engines use segment trees — only exact arithmetic makes those agree).
    *
    * Scale shape: per-customer windows — parallel across customers, state
    * is one accumulator; emitted rows capped to early 1996 to keep the gate
    * output bounded (the window still spans full history). */
  def q130RunningBalance(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("balance",
        sum(col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double"))
      .withColumn("n_orders", count(lit(1)).over(w))
      .filter(col("o_orderdate") < lit("1995-03-01"))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        col("n_orders"), col("balance"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q130Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS d,
      |  count(*) OVER w AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
      |    AS balance
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |QUALIFY o_orderdate < TIMESTAMP '1995-03-01'
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q136: distinct users per 7-day sliding window (slide 1 day) — the
    * weekly-active-users series. Sliding distinct-count can't use running
    * window state (distinct doesn't decompose), so the scalable form is the
    * BOUNDED MEMBERSHIP EXPLODE: each (user, day) pair joins the ≤7 windows
    * containing it (`sequence` + explode — factor = window/slide, a
    * constant), then one (window, user) distinct and one window count.
    *
    * Scale shape: pre-aggregating to distinct (user, day) BEFORE the
    * explode caps the blow-up at active-user-days × 7, shuffles key by
    * (window, user) then window, and no per-window state ever exceeds the
    * distinct-user count. The same shape computes any sliding DISTINCT
    * aggregate; approximate variant = q52's HLL per window. */
  def q136SlidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    val bounds = Tables.events(s, dir)
      .agg(min(date_trunc("day", col("ts"))).as("lo"),
        max(date_trunc("day", col("ts"))).as("hi"))
    // Explicit ASCENDING step + span guard: with no step, Spark's `sequence`
    // flips to a descending step when start > stop — on a corpus spanning
    // < 7 days (lo > hi-6, which makes start > stop for EVERY d) that emits
    // spurious windows where DuckDB's explicit-step generate_series emits
    // none. The guard reduces to the corpus-level span test (start ≤ stop
    // ⟺ lo ≤ hi-6 here), under which the explicit step can never throw.
    ev.crossJoin(broadcast(bounds))
      .filter(expr("lo <= hi - interval 6 days"))
      .selectExpr("user_id",
        "explode(sequence(greatest(lo, d - interval 6 days), least(d, hi - interval 6 days), interval 1 day)) AS w")
      .groupBy("w")
      .agg(countDistinct(col("user_id")).as("wau"))
      .select(date_format(col("w"), "yyyy-MM-dd").as("window_start"),
        col("wau"))
      .orderBy("window_start")
  }

  val q136Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
      |  FROM events),
      |b AS (SELECT min(date_trunc('day', CAST(ts AS TIMESTAMP))) AS lo,
      |             max(date_trunc('day', CAST(ts AS TIMESTAMP))) AS hi
      |      FROM events),
      |m AS (
      |  SELECT user_id,
      |    unnest(generate_series(greatest(lo, d - INTERVAL 6 DAY),
      |                           least(d, hi - INTERVAL 6 DAY),
      |                           INTERVAL 1 DAY)) AS w
      |  FROM ud, b)
      |SELECT strftime(w, '%Y-%m-%d') AS window_start,
      |  count(DISTINCT user_id) AS wau
      |FROM m GROUP BY w ORDER BY window_start""".stripMargin

  // ---------------------------------------------------------------- q232

  /** q232: CUSUM changepoint detection — per event_type, the one-sided
    * cumulative-sum statistic over the hourly mean series: S⁺_h =
    * max(0, S⁺_{h−1} + (x_h − μ − k)) with slack k = σ/2, the classic
    * Page test for a sustained upward level shift (the monitoring primitive
    * that catches drift EWMA smoothing hides — q115's complement).
    *
    * The clamped recursion is NOT expressed as a fold: S⁺_j = P_j −
    * min_{i≤j} P_i where P is the plain cumulative sum of (x − μ − k) —
    * prefix-minus-running-min turns the reset-at-zero recursion into two
    * stock window functions, each one pass over the series, partitioned
    * per event_type (parallel across series, the monitoring-at-scale
    * shape).
    *
    * Determinism: hourly means quantize to scaled longs; μ, k, and every
    * prefix are INTEGER arithmetic on those (integer-div truncation
    * documented in-line); σ is one sqrt on an exactly-derived double,
    * floor-quantized before use. The alarm threshold compare (max S⁺ >
    * 4σ) is integer-vs-integer. */
  def q232CusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(OracleSafe.qsum6(col("value")).as("sm"), count(lit(1)).as("c"))
      // hourly mean, re-quantized to a scaled long — the series the CUSUM
      // runs on is integer from here down
      .selectExpr("event_type", "h",
        "CAST(floor(sm / c * 1e6D + 0.5D) AS BIGINT) AS x6")
    val byType = Window.partitionBy("event_type")
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x6")).as("sx"),
        // x6² entirely in decimal: casting AFTER a Long multiply would
        // wrap first (x6 > 3e9 ⇒ x6² > 2^63) and then sum the wrapped
        // value exactly — the cast must precede the product. decimal(19,0)
        // operands keep the (38,0) product exact; the oracle widens the
        // SAME way (CAST(x6 AS HUGEINT) * x6 — DuckDB only promotes at
        // sum(), a bare BIGINT product aborts on overflow)
        sum(col("x6").cast("decimal(19,0)") * col("x6").cast("decimal(19,0)"))
          .as("sxx"))
      .selectExpr("event_type", "n",
        "sx DIV n AS mu6", // integer mean (truncating; documented)
        """CAST(floor(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
          |  * CAST(sx AS DOUBLE) / n) / n) + 0.5D) AS BIGINT)
          |AS sigma6""".stripMargin)
    val cus = hourly.join(broadcast(stats), "event_type")
      .withColumn("d", expr("x6 - mu6 - sigma6 DIV 2"))
      .withColumn("p", sum(col("d")).over(byType.orderBy("h")))
      .withColumn("runmin", min(col("p")).over(byType.orderBy("h")))
      .withColumn("cus", col("p") - least(col("runmin"), lit(0L)))
    cus.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        max(col("mu6")).as("mu6"), max(col("sigma6")).as("sigma6"),
        // argmax with LATEST-hour tie-break (struct max is lexicographic)
        max(struct(col("cus"), col("h"))).as("b"))
      .selectExpr("event_type", "n_hours", "mu6", "sigma6",
        "b.cus AS max_cusum6",
        "CAST(b.h AS STRING) AS peak_hour",
        "CAST(b.cus > 4 * sigma6 AS INT) AS alarm")
      .orderBy("event_type")
  }

  val q232Sql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
      |    CAST(floor(
      |      CAST(sum(CAST(floor(value * 1e6 + 0.5e0) AS BIGINT)) AS DOUBLE)
      |        / 1e6 / count(*) * 1e6 + 0.5e0) AS BIGINT) AS x6
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(x6) AS BIGINT) // count(*) AS mu6,
      |    CAST(floor(sqrt((CAST(sum(CAST(x6 AS HUGEINT) * x6) AS DOUBLE)
      |      - CAST(sum(x6) AS DOUBLE) * CAST(sum(x6) AS DOUBLE) / count(*))
      |      / count(*)) + 0.5e0) AS BIGINT) AS sigma6
      |  FROM hourly GROUP BY 1),
      |dd AS (
      |  SELECT h.event_type, h.h, n, mu6, sigma6,
      |    x6 - mu6 - sigma6 // 2 AS d
      |  FROM hourly h JOIN stats USING (event_type)),
      |pp AS (
      |  SELECT *, sum(d) OVER (PARTITION BY event_type ORDER BY h
      |    ROWS UNBOUNDED PRECEDING) AS p
      |  FROM dd),
      |cus AS (
      |  SELECT *, p - least(min(p) OVER (PARTITION BY event_type ORDER BY h
      |    ROWS UNBOUNDED PRECEDING), 0) AS cus
      |  FROM pp),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY cus DESC, h DESC) AS rn
      |  FROM cus)
      |SELECT event_type, CAST(n AS BIGINT) AS n_hours, mu6, sigma6,
      |  CAST(cus AS BIGINT) AS max_cusum6, CAST(h AS VARCHAR) AS peak_hour,
      |  CAST(cus > 4 * sigma6 AS INTEGER) AS alarm
      |FROM ranked WHERE rn = 1 ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_sliding_distinct" -> q136SlidingDistinct,
    "q232_cusum_changepoint" -> q232CusumChangepoint,
    "q114_gap_fill"     -> q114GapFill,
    "q115_ewma"         -> q115Ewma,
    "q116_iqr_outliers" -> q116IqrOutliers,
    "q129_event_transitions" -> q129EventTransitions,
    "q130_running_balance"   -> q130RunningBalance)

  val oracle: Map[String, String] = Map(
    "q136_sliding_distinct" -> q136Sql,
    "q232_cusum_changepoint" -> q232Sql,
    "q114_gap_fill"     -> q114Sql,
    "q115_ewma"         -> q115Sql,
    "q116_iqr_outliers" -> q116Sql,
    "q129_event_transitions" -> q129Sql,
    "q130_running_balance"   -> q130Sql)
}
