package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, partition balance, decode-stub features,
  * frame sampling, resize contract. */
class MediaSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "a" * 300, "en", "src", 300L),
      (1L, "hello world", "en", "src", 11L),
      (2L, "b" * 700, "en", "src", 700L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("mediaTable: binary payload + typed metadata schema") {
    val m = Media.mediaTable(docs)
    val sch = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("payload") == "binary")
    assert(sch("kind") == "string" && sch("width") == "int")
    val kinds = m.select("media_id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(0L -> "image", 1L -> "audio", 2L -> "video"))
  }

  test("decodeStub extracts deterministic per-partition features") {
    import spark.implicits._
    val feats = Media.decodeStub(
      Media.mediaTable(docs).as[Media.MediaRow])
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 11)
    assert(feats(1L).mean_byte ==
      BigDecimal("hello world".getBytes("UTF-8").map(_ & 0xff).sum / 11.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(feats(0L).n_frames == 2) // 300 bytes / 256 stride → 2 slices
    assert(feats(2L).n_frames == 3)
  }

  test("interleaved pack: budgets add up, packs advance with the running " +
    "offset, and crosses marks exactly the straddling docs") {
    val out = graft.operators.MultimodalQueries
      .m175InterleavedPack(spark, "/root/testdata/sf0.001").cache()
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(out.count() == docs.count())
    // media budget = ceil(bytes/256) >= 1, text budget >= 1
    assert(out.filter(col("n_media_tok") < 1 || col("n_text_tok") < 1)
      .count() == 0)
    // the running offset is consistent: within a source, start_pos is
    // strictly increasing by the previous doc's total
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val bad = out
      .withColumn("expect", lag(col("start_pos") + col("n_text_tok") +
        col("n_media_tok"), 1).over(w))
      .filter(col("expect").isNotNull && col("start_pos") =!= col("expect"))
    assert(bad.count() == 0)
    assert(out.filter(col("pack_id") =!= (col("start_pos") / 512)
      .cast("long")).count() == 0)
    out.unpersist()
  }

  test("frameSample slices fixed-width frames at the stride") {
    val frames = Media.frameSample(Array.fill[Byte](600)(1), 256)
    assert(frames.length == 3)
    assert(frames.forall(_.length <= 16))
  }

  test("resizeStub decimates payload to ~1/k") {
    val small = Media.resizeStub(Media.mediaTable(docs), 4)
      .selectExpr("media_id", "octet_length(payload) AS n", "octet_length(payload_small) AS ns")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    small.foreach { case (_, n, ns) => assert(math.abs(ns - (n + 3) / 4) <= 1) }
  }

  test("balanced repartitions by content hash") {
    val parts = Media.balanced(Media.mediaTable(docs), 2).rdd.getNumPartitions
    assert(parts == 2)
  }

  test("m194 df-cap neuters a constant-chunk hot bucket but keeps " +
    "discriminative pairs") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val d = tmpDir("m194cap")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // 150 docs of one constant payload: every sampled pixel equal → bits
    // all 0 → every (c, ck=0) bucket holds all 150 — the degenerate
    // solid-color-frame corpus. Without the cap this alone is
    // C(150,2)·4 = 44 700 bucket pair slots; with the 64-doc ceiling the
    // bucket is dropped entirely. ids ≡ 1 (mod 10) so m194 plants no
    // flipped twins (those would form their own identical-signature group).
    val constant = (0 until 150).map(k =>
      R(10L * k + 1L, "a" * 500, "en", "flat", 500L))
    // one genuine near-dup pair: identical alternating-byte payload whose
    // chunk values are nonzero in every position → private 2-doc buckets
    val varied = "Az" * 250
    val pairDocs = Seq(R(10001L, varied, "en", "real", 500L),
      R(10011L, varied, "en", "real", 500L))
    spark.createDataFrame(
        new java.util.ArrayList[R](scala.jdk.CollectionConverters
          .SeqHasAsJava(constant ++ pairDocs).asJava), schema)
      .repartition(1).write.parquet(s"$d/documents.parquet")
    val out = graft.operators.MultimodalQueries
      .m194AhashNeardup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((10001L, 10011L, 0)))
  }
}
