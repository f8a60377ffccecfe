package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the harness testdata (TESTDATA.md).
  *
  * Mirrors the reference's declared-schema parquet scans
  * (/root/reference/pipelineApplication/silverLayer/BuildSilverLayer.py:88-136) in
  * spirit: every scan is a plain `spark.read.parquet` so Catalyst gets full
  * predicate-pushdown / column-pruning freedom. At 100 TB these would be
  * partitioned-table scans; the API is identical — the caller's
  * `select`/`filter` drive partition pruning, so nothing here needs to change
  * with scale.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.parquet` has shipped with two `ts` physical types across
    * harness generations: TIMESTAMP(NANOS) — which Spark's parquet reader
    * rejects outright, so it is read as raw longs
    * (`legacy.parquet.nanosAsLong`) and truncated to micros with integer
    * division (`div`, not `/`: epoch-nanos ≈ 1.7e18 exceeds double's 2^53
    * exact-integer range, so float division would corrupt low-order
    * digits) — and plain TIMESTAMP(MICROS), which both Spark and DuckDB
    * read natively. Dispatch on the decoded type so either layout yields
    * the same TIMESTAMP_LTZ micros column and oracle comparisons agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→LTZ cast below reinterprets the wall-clock in the SESSION
    // timezone; the whole oracle contract (and the nanos layout's
    // timestamp_micros) is epoch-UTC, so pin the session rather than rely
    // on every entry point having configured it — a non-UTC host shell
    // would otherwise shift every ts by its local offset silently
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val t = table(s, d, "events")
    t.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        t.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // `timestamp_micros` above yields TIMESTAMP_LTZ; mirror it for the
        // native-read layout (under the UTC session just pinned, the NTZ
        // wall-clock IS the UTC instant) — downstream epoch extractors
        // (unix_millis, unix_micros) accept only LTZ, and the driver's
        // oracle compare normalizes away the remaining flavor difference
        t.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => t
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
