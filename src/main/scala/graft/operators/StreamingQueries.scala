package graft.operators

import graft.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming transforms — the SAME `DataFrame =>
  * DataFrame` functions run here on the batch events table (Structured
  * Streaming's unification guarantee), hash-checked against DuckDB; the
  * incremental/stateful execution of the identical plans is covered by
  * StreamingSpec with MemoryStream.
  */
object StreamingQueries {

  def q41Sliding(s: SparkSession, dir: String): DataFrame =
    EventStreams.slidingCounts(Tables.events(s, dir))
      .orderBy("wstart")

  val q41Sql: String =
    """SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS wstart, count(*) AS n_events
      |FROM (
      |  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
      |                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS wstart
      |  FROM events)
      |GROUP BY wstart ORDER BY wstart""".stripMargin

  def q42Sessions(s: SparkSession, dir: String): DataFrame =
    EventStreams.sessions(Tables.events(s, dir))
      .orderBy("user_id", "session_start")

  val q42Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 1 DAY THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
      |  FROM marked)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  def q43HourlyByType(s: SparkSession, dir: String): DataFrame =
    EventStreams.hourlyByType(Tables.events(s, dir))
      .orderBy("hour", "event_type")

  val q43Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_sliding_window"  -> q41Sliding,
    "q42_session_window"  -> q42Sessions,
    "q43_hourly_by_type"  -> q43HourlyByType)

  val oracle: Map[String, String] = Map(
    "q41_sliding_window"  -> q41Sql,
    "q42_session_window"  -> q42Sql,
    "q43_hourly_by_type"  -> q43Sql)
}
