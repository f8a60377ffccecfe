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
    * The mapPartitions OPERATOR is not SQL-expressible, but the stub's
    * features are deterministic byte math (mean byte value, frame count at
    * a 256-byte stride, floor-scale-quantized aspect), so DuckDB recomputes
    * every value from the same payload bytes — m45 is value-gated like any
    * other query, with MediaSpec additionally pinning unit fixtures. */
  def m45MediaDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Media.decodeStub(
      Media.balanced(Media.mediaTable(Tables.documents(s, dir)), 32)
        .as[Media.MediaRow])
      .toDF()
      .orderBy("media_id")
  }

  /** The corpus is ASCII (octet_length(payload) = length(text)), so
    * per-CHAR ascii() equals the per-BYTE value the stub folds over. */
  val m45Sql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
      |    text, encode(text) AS payload,
      |    CAST(n_chars % 640 + 1 AS INTEGER) AS width,
      |    CAST(n_chars % 480 + 1 AS INTEGER) AS height
      |  FROM documents)
      |SELECT media_id, kind,
      |  CAST(octet_length(payload) AS INTEGER) AS n_bytes,
      |  CASE WHEN octet_length(payload) = 0 THEN 0.0
      |       ELSE floor(list_reduce(list_transform(string_split(text, ''),
      |              c -> CAST(ascii(c) AS BIGINT)), (a, x) -> a + x)
      |            / CAST(octet_length(payload) AS DOUBLE) * 1e6 + 0.5) / 1e6
      |       END AS mean_byte,
      |  CAST(ceil(octet_length(payload) / 256.0) AS INTEGER) AS n_frames,
      |  floor(width / CAST(height AS DOUBLE) * 1e6 + 0.5) / 1e6 AS aspect
      |FROM media ORDER BY media_id""".stripMargin

  /** m175: interleaved multimodal sequence packing — the vision-language
    * training-prep arithmetic: each document contributes its TEXT tokens
    * plus one placeholder token per media FRAME (the patch-token budget of
    * a VLM: a frame is ceil-of-256-bytes, m44/m160's rule), and the
    * combined streams pack into 512-token context windows per source with
    * t100's concat-then-chunk running offsets. Output per doc: the two
    * token budgets, the pack id, and whether the doc straddles a window.
    *
    * Scale shape: token budgets are map-side byte/array math; the running
    * offset is t100's per-source parallel cumsum — no global sort, no
    * single-partition window. */
  def m175InterleavedPack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // one projection over one scan: the media payload IS encode(text)
    // (Media.mediaTable's linkage contract, media_id = doc_id), so the
    // frame budget derives in place — no doc_id self-join
    Tables.documents(s, dir)
      .selectExpr("source", "doc_id",
        "size(split(lower(text), ' ')) AS n_text_tok",
        "CAST(ceil(octet_length(encode(text, 'UTF-8')) / 256.0D) AS INTEGER)" +
          " AS n_media_tok")
      .selectExpr("source", "doc_id", "n_text_tok", "n_media_tok",
        "n_text_tok + n_media_tok AS n_total")
      .withColumn("start_pos",
        coalesce(sum(col("n_total")).over(w), lit(0L)))
      .selectExpr("source", "doc_id", "n_text_tok", "n_media_tok",
        "start_pos", "start_pos div 512 AS pack_id",
        "CAST((start_pos + n_total - 1) div 512 > start_pos div 512 AS INT)" +
          " AS crosses")
      .orderBy("source", "doc_id")
  }

  val m175Sql: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_text_tok,
      |    CAST(ceil(octet_length(encode(text)) / 256.0) AS INTEGER)
      |      AS n_media_tok
      |  FROM documents),
      |p AS (
      |  SELECT source, doc_id, n_text_tok, n_media_tok,
      |    n_text_tok + n_media_tok AS n_total,
      |    CAST(coalesce(sum(n_text_tok + n_media_tok) OVER (
      |      PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS start_pos
      |  FROM t)
      |SELECT source, doc_id, n_text_tok, n_media_tok, start_pos,
      |  start_pos // 512 AS pack_id,
      |  CAST((start_pos + n_total - 1) // 512 > start_pos // 512 AS INTEGER)
      |    AS crosses
      |FROM p ORDER BY source, doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m44_media_features" -> m44MediaFeatures,
    "m45_media_decode"   -> m45MediaDecode,
    "m175_interleaved_pack" -> m175InterleavedPack)

  val oracle: Map[String, String] = Map(
    "m44_media_features" -> m44Sql,
    "m45_media_decode"   -> m45Sql,
    "m175_interleaved_pack" -> m175Sql)
}
