package graft.operators

import graft.Tables
import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column operators through the correctness gate. The
  * payload math that IS expressible in ANSI SQL (length, content hash,
  * byte slicing / frame counts, metadata-derived features) gets a full
  * DuckDB oracle; the mapPartitions decode path (m45) returns the typed
  * feature rows and is additionally covered by MediaSpec. */
object MultimodalQueries {

  /** Binary payload features via pure SQL expressions: sizes, md5 of the
    * blob, hex of a sampled byte range, frame count at a 256-byte stride. */
  def m44MediaFeatures(s: SparkSession, dir: String): DataFrame =
    Media.mediaTable(Tables.documents(s, dir))
      .selectExpr(
        "media_id", "kind",
        "CAST(octet_length(payload) AS INTEGER) AS n_bytes",
        "md5(payload) AS content_md5",
        "upper(hex(substring(payload, 1, 8))) AS head_hex",
        "CAST(ceil(octet_length(payload) / 256.0D) AS INTEGER) AS n_frames",
        "round(width / CAST(height AS DOUBLE), 6) AS aspect")
      .orderBy("media_id")

  val m44Sql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
      |    text, encode(text) AS payload,
      |    CAST(n_chars % 640 + 1 AS INTEGER) AS width,
      |    CAST(n_chars % 480 + 1 AS INTEGER) AS height
      |  FROM documents)
      |SELECT media_id, kind,
      |  CAST(octet_length(payload) AS INTEGER) AS n_bytes,
      |  -- this DuckDB build lacks md5(BLOB); payload = encode(text), so
      |  -- md5 over the source varchar hashes the identical bytes
      |  md5(text) AS content_md5,
      |  upper(substr(hex(payload), 1, 16)) AS head_hex,
      |  CAST(ceil(octet_length(payload) / 256.0) AS INTEGER) AS n_frames,
      |  round(width / CAST(height AS DOUBLE), 6) AS aspect
      |FROM media ORDER BY media_id""".stripMargin

  /** The typed mapPartitions decode path (stubbed codec, real batch shape).
    * No SQL oracle — mapPartitions is not SQL-expressible; the driver
    * records the rows>0 check and MediaSpec asserts the feature values. */
  def m45MediaDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Media.decodeStub(
      Media.balanced(Media.mediaTable(Tables.documents(s, dir)), 32)
        .as[Media.MediaRow])
      .toDF()
      .orderBy("media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m44_media_features" -> m44MediaFeatures,
    "m45_media_decode"   -> m45MediaDecode)

  val oracle: Map[String, String] = Map(
    "m44_media_features" -> m44Sql)
}
