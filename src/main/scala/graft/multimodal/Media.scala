package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus partition-level decode/feature-extract.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but everything Spark-side is real:
  * the schema (binary payload + metadata struct), the batch shape
  * (mapPartitions processes a whole partition per call, the same contract a
  * vectorized decode UDF would have), and the partitioning (media rows
  * repartition by content-hash range so a skewed source — many tiny
  * thumbnails + a few huge videos — still balances).
  *
  * Scale notes: payloads stay opaque until the last possible operator
  * (predicate pushdown on metadata columns prunes before any byte is
  * touched); per-partition decoding amortizes codec init exactly like a
  * Pandas-UDF batch would; frame sampling reduces payload width BEFORE any
  * shuffle.
  */
object Media {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           mean_byte: Double, n_frames: Int, aspect: Double)

  /** Deterministic media corpus synthesized from the documents table: the
    * payload is the UTF-8 text bytes standing in for encoded media; kind
    * and dimensions derive from doc attributes. Real pipelines read this
    * shape straight from parquet (binary + metadata columns). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"))

  /** STUB decoder — the real one would call an image/audio codec here.
    * Partition-at-a-time (mapPartitions): codec init happens once per
    * partition, not per row; the fake "decode" derives features from the
    * raw bytes deterministically. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    // midpoint-proof floor-scale quantization — the OracleSafe qsum6/qmean6
    // convention: floor(x·1e6 + 0.5)/1e6 on identical IEEE bits cannot
    // diverge between engines, unlike decimal HALF_UP vs an engine round()
    // whose tie-handling differs exactly at 6th-decimal midpoints (and
    // mean_byte = int-sum/int-len can land on one). m45Sql uses the same
    // floor form, so the stub's features stay value-checkable cross-engine.
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    media.mapPartitions { rows =>
      // ??? <- real codec initialization would go here, once per partition
      rows.map { r =>
        val bytes = r.payload
        val mean =
          if (bytes.isEmpty) 0.0
          else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
        val frames = frameSample(bytes, 256).length
        MediaFeatures(r.media_id, r.kind, bytes.length,
          r6(mean), frames, r6(r.width.toDouble / r.height))
      }
    }
  }

  /** "Frame sampling" on the opaque payload: one fixed-size slice every
    * `stride` bytes (a real video path samples I-frames; the slicing/batch
    * mechanics are identical). */
  def frameSample(bytes: Array[Byte], stride: Int): Array[Array[Byte]] =
    bytes.grouped(stride).map(_.take(16)).toArray

  /** "Resize": byte-decimation of the payload to a fraction 1/k — stands in
    * for a real resample while keeping the binary-in/binary-out operator
    * shape and the output-size contract. */
  def resizeStub(media: DataFrame, k: Int): DataFrame = {
    require(k > 0)
    media.withColumn("payload_small",
      expr(s"filter(transform(split(CAST(payload AS STRING), ''), (c, i) -> " +
        s"CASE WHEN i % $k = 0 THEN c ELSE NULL END), c -> c IS NOT NULL)"))
      .withColumn("payload_small", encode(concat_ws("", col("payload_small")), "UTF-8"))
  }

  /** Hash-range repartition of media rows: balances skewed payload sizes
    * across tasks before expensive decode (the shuffle key is a uniform
    * hash, so one task never owns all the large payloads). */
  def balanced(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions, xxhash64(col("media_id")))
}
