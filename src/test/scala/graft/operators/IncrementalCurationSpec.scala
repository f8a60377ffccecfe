package graft.operators

import graft.SparkSpec
import graft.sources.TxLog
import org.apache.spark.sql.functions._

/** Drives q313's admission chain across THREE consecutive batches on a
  * fresh state root — the stage-boundary behaviors the single-batch gate
  * can't observe:
  *
  *  1. a normal ingest (batch 1) admits a non-trivial mix;
  *  2. a RE-KEYED RE-CRAWL of batch 1 admits NOTHING (idempotence — the
  *     property incremental curation exists to provide: every re-arriving
  *     doc is caught by the fingerprint index its own admission committed,
  *     by the band index, by within-batch rules, or by the quality gate);
  *  3. a fresh slice (batch 3) admits again, and the stats table after
  *     three TxLog merges equals DIRECT aggregation over
  *     curated-history ∪ admitted₁ ∪ admitted₃ — the IVM invariant
  *     (decimal sums are associative, so incremental == from-scratch
  *     bit-for-bit). */
class IncrementalCurationSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("re-crawl admits nothing; IVM stats equal direct aggregation " +
    "after three commits") {
    val root = tmpDir("incr_cur_spec")
    IncrementalCuration.initState(spark, sf, root)

    // batch 1: the gate's slice
    val b1 = IncrementalCuration.admitBatch(spark, sf, root,
      col("doc_id") % 5 === 3, 0L)
    val adm1 = b1.filter(col("status") === "admitted")
      .select("source", "score", "n_tokens", "doc_id")
      .collect()
    assert(adm1.nonEmpty, "batch 1 admitted nothing — trivial composition")
    assert(b1.count() > adm1.length,
      "batch 1 rejected nothing — no stage exercised")
    val statsAfterB1 = TxLog.read(spark, s"$root/stats")
      .orderBy("source").collect().toSeq

    // batch 2: batch 1 re-keyed (the d185 re-crawl) — nothing may land
    val b2 = IncrementalCuration.admitBatch(spark, sf, root,
      col("doc_id") % 5 === 3, 10000000L)
    assert(b2.filter(col("status") === "admitted").count() === 0,
      "re-crawl admitted a doc the state should have caught")
    // every batch-1 ADMISSION re-arrives as dup_index: its fingerprint
    // was committed by batch 1's own admission
    val admIds1 = adm1.map(r => r.getLong(3) + 10000000L).toSet
    val dupIdx2 = b2.filter(col("status") === "dup_index")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admIds1.subsetOf(dupIdx2),
      s"${(admIds1 -- dupIdx2).size} re-crawled admissions missed the fp index")
    // the empty admit left the stats CONTENT unchanged (a fresh version,
    // same rows)
    val statsAfterB2 = TxLog.read(spark, s"$root/stats")
      .orderBy("source").collect().toSeq
    assert(statsAfterB2 === statsAfterB1)

    // OPTIMIZE the state between batches: fold the accumulated
    // small-generation index files (init + two admits each appended) —
    // the q113 small-file pattern on live state. Compaction must be
    // admission-invariant, and the IVM check alone cannot prove that (a
    // corrupted index would corrupt BOTH sides identically) — so batch 3
    // also runs against a TWIN root that skipped the optimize, and the
    // two per-doc status frames must be identical.
    Seq("fp", "shingles", "bands").foreach { t =>
      TxLog.optimize(spark, s"$root/$t", partFiles = 2)
    }
    val twin = tmpDir("incr_cur_twin")
    IncrementalCuration.initState(spark, sf, twin)
    IncrementalCuration.admitBatch(spark, sf, twin,
      col("doc_id") % 5 === 3, 0L).unpersist()
    IncrementalCuration.admitBatch(spark, sf, twin,
      col("doc_id") % 5 === 3, 10000000L).unpersist()
    val b3Twin = IncrementalCuration.admitBatch(spark, sf, twin,
      col("doc_id") % 5 === 4, 0L)

    // batch 3: a genuinely fresh slice admits again
    val b3 = IncrementalCuration.admitBatch(spark, sf, root,
      col("doc_id") % 5 === 4, 0L)
    assert(b3.orderBy("doc_id").collect().toSeq ===
      b3Twin.orderBy("doc_id").collect().toSeq,
      "compaction changed batch-3 admission decisions")
    b3Twin.unpersist()
    val adm3 = b3.filter(col("status") === "admitted")
      .select("source", "score", "n_tokens")
    assert(adm3.count() > 0, "fresh slice admitted nothing")

    // IVM invariant: three merged commits == one direct aggregation
    val direct = IncrementalCuration.statsOf(
        IncrementalCuration.curatedHistory(spark, sf)
          .select("source", "score", "n_tokens")
          .unionByName(b1.filter(col("status") === "admitted")
            .select("source", "score", "n_tokens"))
          .unionByName(adm3))
      .orderBy("source").collect().toSeq
    val incremental = TxLog.read(spark, s"$root/stats")
      .select("source", "n_docs", "total_tokens", "score6")
      .orderBy("source").collect().toSeq
    assert(incremental === direct)

    Seq(b1, b2, b3).foreach(_.unpersist())
  }
}
