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

  /** `events.parquet` carries TIMESTAMP(NANOS) — a type Spark's parquet
    * reader rejects outright. Read nanos as raw longs and truncate to
    * micros with integer division (`div`, not `/`: epoch-nanos ≈ 1.7e18
    * exceeds double's 2^53 exact-integer range, so float division would
    * corrupt low-order digits). Matches DuckDB's nanos→micros truncation,
    * so oracle comparisons agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
