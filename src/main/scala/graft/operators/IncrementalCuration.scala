package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** q313: snapshot-incremental END-TO-END curation — the composition gate
  * for the full incremental admission chain every stage of which exists
  * and is individually verified (d135 exact probe, d142/d185 band-index
  * probe, q138 quality gate, q300 IVM merge, TxLog commits). Stage
  * boundaries are where incremental pipelines actually fail, so this
  * operator drives them TOGETHER across a true state boundary:
  *
  *   standing curated corpus (doc_id % 5 ∈ {0,1,2}, quality-gated)
  *     → persisted state: fingerprint index, LSH band index, shingle
  *       store, per-source IVM stats — each a TxLog table
  *   ingest batch (doc_id % 5 = 3)
  *     → exact probe (md5 vs fingerprint index + within-batch rank)
  *     → near-dup probe (batch bands vs index + within-batch buckets,
  *       candidates verified by exact Jaccard ≥ 0.2 over the shingle
  *       store — history never self-joins, the d142 cost contract)
  *     → quality gate (q138's composite score ≥ 0.55)
  *     → TxLog COMMIT of the admitted set: fingerprints, bands and
  *       shingles APPEND (index maintenance); stats MERGE standing ⊎
  *       admitted partial aggregate (the q300 IVM shape — the base is
  *       never re-aggregated)
  *
  * The gate output is the POST-COMMIT stats table; the oracle re-derives
  * that state FROM SCRATCH (full SQL over `documents` applying the same
  * admission semantics), so any drift at any stage boundary — a missed
  * index append, a double-counted merge, a probe against the wrong
  * generation — breaks the hash. IncrementalCurationSpec drives two
  * FURTHER batches against a fresh state root: a re-keyed re-crawl of
  * batch 1 (must admit NOTHING — the idempotence property) and a fresh
  * slice (stats must equal direct aggregation — the IVM invariant across
  * three merges).
  *
  * Admission semantics (deterministic, order-free within a batch):
  * a batch doc is REJECTED iff any of (1) its md5 is in the fingerprint
  * index, (2) an earlier-id batch doc shares its md5, (3) a verified
  * near-dup pair links it to an index doc or an earlier-id batch doc,
  * (4) quality score < 0.55. Statuses label the FIRST matching reason
  * (dup_index > dup_batch > near_dup > low_quality).
  *
  * Scale shape: batch work is O(batch) hashes + O(batch × bands) probes
  * + Σ C(batch bucket, 2) pairs; verification is candidate-bounded over
  * semi-join-reduced shingle rows; the only history-sized artifacts are
  * columnar index reads; the stats merge touches |sources| rows + the
  * batch. Nothing rescans or rewrites the standing corpus.
  */
object IncrementalCuration {

  private val Threshold = Quality.ScoreThreshold
  private val toksExpr = "split(lower(text), ' ')"

  /** q138's composite quality score — the shared [[Quality.scoreExpr]]
    * kernel (one definition across every consuming gate). */
  private def scoreExpr: String = Quality.scoreExpr(toksExpr)

  /** Scored corpus projection (original ids): doc_id, source, content
    * hash, quality score, token count — everything admission needs
    * without carrying text further. */
  private def scoredDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).selectExpr("doc_id", "source",
      "md5(text) AS h", s"($scoreExpr) AS score",
      s"size($toksExpr) AS n_tokens")

  /** The standing curated corpus: quality-gated history slice (what
    * [[initState]] indexes; exposed so the spec's direct-aggregation
    * ground truth shares the exact same definition). */
  private[operators] def curatedHistory(s: SparkSession, dir: String): DataFrame =
    scoredDocs(s, dir)
      .filter(col("doc_id") % 5 <= 2 && col("score") >= Threshold)

  /** Per-source self-mergeable stats: count, token sum, and the
    * DECIMAL(38,6)-quantized score sum (order-independent — the q300 IVM
    * class: all three merge by addition). */
  private[operators] def statsOf(docs: DataFrame): DataFrame =
    docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"),
      sum(col("score").cast("decimal(38,6)")).as("score6"))

  /** Initialize the standing state under `root`: the curated history
    * (quality-gated doc_id % 5 ∈ {0,1,2}) indexed four ways, each a
    * TxLog table so later admissions are versioned commits. */
  private[operators] def initState(s: SparkSession, dir: String,
      root: String): Unit = {
    import graft.sources.TxLog
    graft.catalyst.GraftFunctions.ensureRegistered(s)
    val histc = curatedHistory(s, dir)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val histShingles = Dedup.shingleIndex(s, dir)
      .join(histc.select("doc_id"), Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    TxLog.append(s, histc.select("h").distinct(), s"$root/fp", partFiles = 2)
    TxLog.append(s, histShingles, s"$root/shingles", partFiles = 2)
    TxLog.append(s, Dedup.bandsOf(histShingles), s"$root/bands", partFiles = 2)
    TxLog.append(s, statsOf(histc), s"$root/stats", partFiles = 1)
    histShingles.unpersist()
    histc.unpersist()
  }

  /** Admit one ingest batch against the state under `root`: probe, gate,
    * COMMIT (fp/shingles/bands append + stats merge), and return the
    * per-doc status frame. `batchPred` selects the batch by ORIGINAL
    * doc_id; `shift` re-keys it (the d185 re-crawl form — content
    * returns under fresh keys, so the persisted shingle index supplies
    * its rows without re-tokenizing). */
  private[operators] def admitBatch(s: SparkSession, dir: String,
      root: String, batchPred: Column, shift: Long): DataFrame = {
    import graft.sources.TxLog
    graft.catalyst.GraftFunctions.ensureRegistered(s)
    val batch = scoredDocs(s, dir).filter(batchPred)
      .withColumn("doc_id", col("doc_id") + shift)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val batchShingles = Dedup.shingleIndex(s, dir).filter(batchPred)
      .select((col("doc_id") + shift).as("doc_id"), col("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val batchBands = Dedup.bandsOf(batchShingles)
      .persist(StorageLevel.MEMORY_AND_DISK) // probe side + within-batch side
    // candidates: batch × index (equi-join on band key — history never
    // self-joins) plus within-batch buckets; reject the LARGER id of a
    // within-batch pair (earlier doc wins, the d135 convention)
    val idxBands = TxLog.read(s, s"$root/bands").withColumnRenamed("doc_id", "oid")
    val candIdx = batchBands.join(idxBands, "band_key")
      .select(col("doc_id").as("bid"), col("oid"))
    val candBatch = batchBands.groupBy("band_key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= Dedup.BandBucketCap) // see BandBucketCap
      .selectExpr(s"${Dedup.pairExplodeExpr} AS p")
      .select(col("p.id2").as("bid"), col("p.id1").as("oid"))
    val cand = candIdx.unionByName(candBatch).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // exact-Jaccard verification, candidate-bounded (the d185 form): the
    // shingle rows come from the persisted store ∪ this batch, semi-join
    // reduced to candidate docs before any per-pair work
    val candDocs = cand
      .select(explode(array(col("bid"), col("oid"))).as("doc_id")).distinct()
    val rows = TxLog.read(s, s"$root/shingles").unionByName(batchShingles)
      .join(candDocs, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val common = cand
      .join(rows.withColumnRenamed("doc_id", "bid"), "bid")
      .join(rows.withColumnRenamed("doc_id", "oid"), Seq("oid", "h"))
      .groupBy("bid", "oid").agg(count(lit(1)).as("common"))
    val n = rows.groupBy("doc_id").agg(count(lit(1)).as("ns"))
    val nearDup = cand.join(common, Seq("bid", "oid"), "left")
      .na.fill(0L, Seq("common"))
      .join(n.withColumnRenamed("doc_id", "bid").withColumnRenamed("ns", "n1"), "bid")
      .join(n.withColumnRenamed("doc_id", "oid").withColumnRenamed("ns", "n2"), "oid")
      .filter(round(col("common") / (col("n1") + col("n2") - col("common")), 6)
        >= 0.2)
      .select(col("bid").as("doc_id")).distinct()
      .withColumn("nd", lit(1))
    val fp = TxLog.read(s, s"$root/fp").withColumn("in_fp", lit(1)).distinct()
    val status = batch
      .join(fp, Seq("h"), "left")
      .withColumn("rk", row_number().over(
        Window.partitionBy("h").orderBy("doc_id")))
      .join(nearDup, Seq("doc_id"), "left")
      .withColumn("status",
        when(col("in_fp") === 1, "dup_index")
          .when(col("rk") > 1, "dup_batch")
          .when(col("nd") === 1, "near_dup")
          .when(col("score") < Threshold, "low_quality")
          .otherwise("admitted"))
      .select("doc_id", "source", "h", "score", "n_tokens", "status")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // COMMIT: index maintenance (appends) + IVM stats merge (the q300
    // shape — the standing rows are read back, never re-derived)
    val admitted = status.filter(col("status") === "admitted")
    val admIds = admitted.select("doc_id")
    TxLog.append(s, admitted.select("h"), s"$root/fp", partFiles = 1)
    TxLog.append(s, batchShingles.join(admIds, Seq("doc_id"), "left_semi"),
      s"$root/shingles", partFiles = 1)
    TxLog.append(s, batchBands.join(admIds, Seq("doc_id"), "left_semi"),
      s"$root/bands", partFiles = 1)
    val merged = TxLog.read(s, s"$root/stats")
      .unionByName(statsOf(admitted))
      .groupBy("source").agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        sum(col("score6")).as("score6"))
    TxLog.overwrite(s, merged, s"$root/stats", partFiles = 1)
    // commits above materialized everything downstream of these persists
    Seq(batch, batchShingles, batchBands, cand, rows).foreach(_.unpersist())
    status
  }

  /** The gate: init + one admitted batch, output the post-commit stats. */
  def q313IncrementalCuration(s: SparkSession, dir: String): DataFrame = {
    val root = graft.SparkSupport.layoutArtifact("incr_curation", dir) { p =>
      initState(s, dir, p)
      admitBatch(s, dir, p, col("doc_id") % 5 === 3, 0L).unpersist()
      java.nio.file.Files.createFile(java.nio.file.Paths.get(p, "_SUCCESS"))
    }
    graft.sources.TxLog.read(s, s"$root/stats")
      .selectExpr("source", "n_docs", "total_tokens",
        "round(CAST(score6 AS DOUBLE) / n_docs, 6) AS mean_score")
      .orderBy("source")
  }

  /** From-scratch re-derivation of the post-commit state: the same
    * admission semantics applied in one SQL pass over `documents`. */
  val q313Sql: String = {
    s"""WITH ${Dedup.bandCtes},
       |sc AS (
       |  SELECT doc_id, source, md5(text) AS h,
       |    ${Quality.scoreDuck()} AS score,
       |    len(string_split(lower(text), ' ')) AS n_tokens
       |  FROM documents),
       |histc AS (SELECT * FROM sc
       |          WHERE doc_id % 5 <= 2 AND score >= $Threshold),
       |batch AS (SELECT * FROM sc WHERE doc_id % 5 = 3),
       |hb AS (SELECT b.doc_id, b.band_key FROM bands b JOIN histc USING (doc_id)),
       |bb AS (SELECT doc_id, band_key FROM bands WHERE doc_id % 5 = 3),
       |bbk AS (
       |  SELECT band_key FROM bb
       |  GROUP BY 1 HAVING count(*) <= ${Dedup.BandBucketCap}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS bid, i.doc_id AS oid
       |  FROM bb a JOIN hb i ON a.band_key = i.band_key
       |  UNION
       |  SELECT DISTINCT a.doc_id AS bid, b.doc_id AS oid
       |  FROM bb a JOIN bb b ON a.band_key = b.band_key AND b.doc_id < a.doc_id
       |  JOIN bbk ON a.band_key = bbk.band_key),
       |n AS (SELECT doc_id, count(*) AS ns FROM s GROUP BY doc_id),
       |common AS (
       |  SELECT bid, oid, count(*) AS common
       |  FROM cand JOIN s sa ON sa.doc_id = bid JOIN s sb ON sb.doc_id = oid
       |  WHERE sa.h = sb.h GROUP BY 1, 2),
       |nd AS (
       |  SELECT DISTINCT bid AS doc_id FROM cand
       |  LEFT JOIN common USING (bid, oid)
       |  JOIN n n1 ON bid = n1.doc_id JOIN n n2 ON oid = n2.doc_id
       |  WHERE round(coalesce(common, 0) * 1.0
       |    / (n1.ns + n2.ns - coalesce(common, 0)), 6) >= 0.2),
       |fp AS (SELECT DISTINCT h FROM histc),
       |st AS (
       |  SELECT b.doc_id, b.source, b.score, b.n_tokens,
       |    CASE WHEN fp.h IS NOT NULL THEN 1 ELSE 0 END AS dup_index,
       |    row_number() OVER (PARTITION BY b.h ORDER BY b.doc_id) AS rk,
       |    CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS near_dup
       |  FROM batch b LEFT JOIN fp ON b.h = fp.h
       |  LEFT JOIN nd ON b.doc_id = nd.doc_id),
       |admitted AS (
       |  SELECT source, score, n_tokens FROM st
       |  WHERE dup_index = 0 AND rk = 1 AND near_dup = 0
       |    AND score >= $Threshold),
       |uni AS (
       |  SELECT source, score, n_tokens FROM histc
       |  UNION ALL SELECT source, score, n_tokens FROM admitted)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  round(CAST(sum(CAST(score AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6)
       |    AS mean_score
       |FROM uni GROUP BY source ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q313_incremental_curation" -> q313IncrementalCuration)

  val oracle: Map[String, String] = Map(
    "q313_incremental_curation" -> q313Sql)
}
