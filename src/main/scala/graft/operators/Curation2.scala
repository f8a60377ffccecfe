package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-curation operators, fourth batch (round 3): canonical-document
  * selection over near-dup clusters and corpus-statistics language-model
  * quality scoring — the two curation steps between "pairs found" (d31)
  * and "corpus written" (q138) that a pretraining pipeline still needs:
  * WHICH copy of each near-dup cluster survives, and how docs rank against
  * the corpus's own token distribution.
  */
object Curation2 {

  /** d144: canonical-document selection — the step AFTER near-dup detection
    * (d31) and clustering (d57's connected components): every document gets
    * its near-dup component, and each component keeps the HIGHEST-QUALITY
    * member (t35's composite score; ties break to the smallest doc_id), not
    * the arbitrary minimum id. Emits the full per-document verdict table:
    * component, cluster size, quality, the cluster's canonical id, and the
    * keep/drop flag — the table a curation pipeline joins against to filter
    * the corpus.
    *
    * Scale shape: pairs come from d31's banded LSH (never all-pairs);
    * components from min-label propagation (O(cluster diameter) rounds —
    * dup clusters are near-cliques, 2-3 rounds); canonical + size resolve in
    * ONE aggregation via `max(struct(quality, -doc_id))` (an argmax without
    * a per-component window sort), and the verdict join is keyed by
    * component — cluster-sized groups, skew-immune. Quality is computed
    * map-side from the text; ranking compares RAW doubles, which are
    * bit-identical cross-engine (per-row IEEE arithmetic only — no
    * transcendental functions), so the argmax cannot flip between engines;
    * the 6-decimal rounding is presentation only. */
  def d144CanonicalDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // the verified pair list is the dedup stage's PERSISTED corpus artifact
    // ([[Dedup.dupPairs]], built once per corpus by the full d31 pipeline) —
    // it feeds the CC's edge set AND its node set without re-running the
    // minhash chain per consumer
    val pairs = Dedup.dupPairs(s, dir)
      .select(col("id1").as("src"), col("id2").as("dst"))
    // CC runs on the DUP SUBGRAPH only (edge endpoints): iterative state is
    // proportional to the duplicate graph — a sliver of any real corpus —
    // not the corpus itself; singleton docs label themselves through the
    // left join below and never enter a propagation round
    val ends = pairs.select(col("src").as("id"))
      .unionByName(pairs.select(col("dst").as("id"))).distinct()
    val sub = DupClusters.connectedComponents(ends, pairs)
    val comp = docs.select(col("doc_id").as("id"))
      .join(sub.withColumnRenamed("component", "c"), Seq("id"), "left")
      .selectExpr("id", "coalesce(c, id) AS component")
    // t35's composite (the shared Quality.scoreExpr kernel), UNROUNDED
    // (the q138 convention): raw doubles make round() midpoint ties
    // measure-zero, and the argmax below compares the raw values so both
    // engines rank the identical bits
    val scored = docs.selectExpr("doc_id",
      s"${Quality.scoreExpr()} AS qr")
    val j = comp.withColumnRenamed("id", "doc_id").join(scored, "doc_id")
      // feeds the canonical argmax AND the output join (multi-consumer
      // persist convention; released by the runner's clearCache)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one aggregation: size + argmax(quality, then min doc_id) per component
    val canon = j.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"),
        max(struct(col("qr"), (-col("doc_id")).as("nid"))).as("b"))
      .select(col("component"), col("cluster_size"),
        (-col("b.nid")).as("canonical_id"))
    j.join(canon, "component")
      .selectExpr("doc_id", "component", "cluster_size",
        "round(qr, 6) AS quality", "canonical_id",
        "CAST(doc_id = canonical_id AS INT) AS keep")
      .orderBy("doc_id")
  }

  val d144Sql: String = {
    s"""WITH RECURSIVE ${Dedup.minhashPairCtes},
       |pairs AS (
       |  SELECT id1, id2
       |  FROM cand LEFT JOIN common USING (id1, id2)
       |  JOIN n n1 ON id1 = n1.doc_id JOIN n n2 ON id2 = n2.doc_id
       |  WHERE round(coalesce(common, 0) * 1.0
       |          / (n1.ns + n2.ns - coalesce(common, 0)), 6) >= 0.2),
       |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
       |          UNION ALL SELECT id2 AS src, id1 AS dst FROM pairs),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS l FROM documents
       |  UNION
       |  SELECT e.dst AS id, r.l FROM reach r JOIN edges e ON e.src = r.id),
       |comp AS (SELECT id AS doc_id, min(l) AS component FROM reach GROUP BY id),
       |scored AS (
       |  SELECT doc_id,
       |    ${Quality.scoreDuck()} AS qr
       |  FROM documents),
       |j AS (SELECT c.doc_id, c.component, s2.qr
       |      FROM comp c JOIN scored s2 USING (doc_id)),
       |ranked AS (
       |  SELECT component, doc_id,
       |    row_number() OVER (PARTITION BY component
       |                       ORDER BY qr DESC, doc_id) AS rn
       |  FROM j),
       |canon AS (
       |  SELECT component, CAST(count(*) AS BIGINT) AS cluster_size,
       |    min(CASE WHEN rn = 1 THEN doc_id END) AS canonical_id
       |  FROM ranked GROUP BY component)
       |SELECT j.doc_id, j.component, canon.cluster_size,
       |  round(j.qr, 6) AS quality, canon.canonical_id,
       |  CAST(j.doc_id = canon.canonical_id AS INTEGER) AS keep
       |FROM j JOIN canon USING (component)
       |ORDER BY j.doc_id""".stripMargin
  }

  /** t146: unigram language-model scoring — each document's negative
    * log-likelihood under the corpus's OWN unigram distribution (the CCNet
    *-style LM quality signal: docs of frequent, typical tokens score low
    * NLL; rare-token / junk docs score high and get filtered or
    * down-weighted).
    *
    * Two-pass dataflow: (1) token frequencies — one map-side-combined
    * groupBy over the exploded tokens; (2) scoring — the frequency table is
    * BROADCAST back (vocabulary follows Heaps' law, sub-linear in corpus
    * size — at 100 TB it is a few-GB table, stageable to parquet and
    * broadcast or bucket-joined by token, while the corpus side never
    * shuffles until the per-doc aggregate). The token explosion is scanned
    * once and persisted for both passes.
    *
    * Determinism: per-token log-probabilities quantize to 6 decimals and
    * accumulate as exact DECIMAL(38,6) (the [[graft.functions.OracleSafe]]
    * convention) — the per-doc sum is order-independent and identical in
    * any engine; `ln` evaluates once per DISTINCT (cnt, total) pair of
    * integer-exact doubles, so a last-ulp libm divergence would need to
    * land within one ulp of a 6-decimal midpoint to flip a hash
    * (measure-zero in practice; the q118 precedent). */
  def t146UnigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", "explode(split(lower(text), ' ')) AS tok")
      // feeds the frequency build AND the scoring join — one corpus scan
      .persist(StorageLevel.MEMORY_AND_DISK)
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).as("total"))
    // r15-opt (guide §4, the t156 form): lp is a function of tok alone —
    // evaluate ln + round + decimal-cast once per VOCAB row and let the
    // broadcast carry the precomputed DECIMAL (bit-identical: lp is
    // constant within a tok).
    val lpTab = freq.crossJoin(tot)
      .selectExpr("tok",
        "CAST(round(ln(cnt / CAST(total AS DOUBLE)), 6) AS DECIMAL(38,6)) AS lp")
    toks.join(broadcast(lpTab), "tok")
      .select("doc_id", "lp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp")).as("slp"))
      .selectExpr("doc_id", "n_tokens",
        "CAST(slp AS DOUBLE) AS sum_lp",
        "round(-CAST(slp AS DOUBLE) / n_tokens, 6) AS avg_nll")
      .orderBy("doc_id")
  }

  val t146Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents),
      |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |tot AS (SELECT sum(cnt) AS total FROM freq),
      |lp AS (
      |  SELECT doc_id,
      |    CAST(round(ln(cnt / CAST(total AS DOUBLE)), 6) AS DECIMAL(38,6)) AS lp
      |  FROM toks JOIN freq USING (tok) CROSS JOIN tot)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(lp) AS DOUBLE) AS sum_lp,
      |  round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_nll
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q147: CCNet-style head/middle/tail bucketing — split the corpus into
    * LM-score terciles (t146's avg NLL: head = most fluent under the corpus
    * unigram model, tail = most atypical) and report each bucket's volume,
    * the sampling table CCNet (Wenzek et al., 2020) uses to keep head+middle
    * and down-weight tail.
    *
    * Scale shape: bucketing happens on the VALUE DOMAIN, not the documents —
    * avg_nll is 6-decimal-quantized, so distinct scores ≪ documents; the
    * per-value (count, token-sum) table aggregates distributed, and its
    * cumulative sum runs DISTRIBUTED too (the q207/q128 ordinal pattern):
    * range-repartition by value, cumsum WITHIN each partition (parallel
    * keyed windows), prefix-sum the |partitions|-row per-split totals
    * (limit-bounded — pid < `parts` by construction), broadcast the
    * offsets back. Global cum = offset + local cum under ANY disjoint
    * ordered partitioning, so the sampled range boundaries don't affect
    * the output. A cumulative cut 3·cum/N per VALUE keeps all
    * equal-scored docs in one bucket — deterministic without a doc-level
    * OR value-level global sort (round-8 registry-sweep hardening; the
    * value-domain window previously ran single-partition). */
  def q147NllBuckets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val perDoc = t146UnigramLogprob(s, dir)
    // localCheckpoint, NOT persist (ADVICE r8): pid captures
    // spark_partition_id() over a range exchange, and a recompute of a
    // lost cached partition would RE-SAMPLE the range boundaries — mixing
    // offsets from one partitioning with local cumsums from another. The
    // eager checkpoint truncates lineage, freezing the pid-tagged rows:
    // a lost block now fails the job (retryable) instead of silently
    // corrupting the prefix sums. The table is value-domain-sized
    // (distinct 6-decimal scores ≪ docs), so the materialization is
    // metadata-weight.
    val vals = perDoc.groupBy("avg_nll")
      .agg(count(lit(1)).as("c"), sum(col("n_tokens")).as("tk"))
      .repartitionByRange(parts, col("avg_nll"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // feeds offsets + the cut pass
    // |partitions| rows of metadata; limit(parts) is identity (pid ∈
    // [0, parts)) and marks the prefix-sum window limit-bounded
    val offsets = vals.groupBy("pid").agg(sum(col("c")).as("pc"))
      .limit(parts)
      .withColumn("off", coalesce(sum(col("pc")).over(
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("pid", "off")
    val total = vals.agg(sum(col("c")).as("n"))
    val cut = vals
      .withColumn("lcum", sum(col("c")).over(
        Window.partitionBy("pid").orderBy("avg_nll")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offsets), "pid")
      .crossJoin(broadcast(total))
      .selectExpr("avg_nll", "c", "tk",
        // bucket by the global cumulative count BEFORE this value: ties
        // share one bucket, cuts land at N/3 boundaries
        "1 + CAST(floor(3.0D * (off + lcum - c) / n) AS INT) AS bucket")
    cut.groupBy("bucket")
      .agg(sum(col("c")).as("n_docs"), sum(col("tk")).as("n_tokens"),
        min(col("avg_nll")).as("nll_lo"), max(col("avg_nll")).as("nll_hi"),
        round(sum(col("avg_nll").cast("decimal(38,6)") * col("c"))
          .cast("double") / sum(col("c")), 6).as("mean_nll"))
      .selectExpr("bucket",
        "element_at(array('head', 'middle', 'tail'), bucket) AS label",
        "n_docs", "n_tokens", "mean_nll", "nll_lo", "nll_hi")
      .orderBy("bucket")
  }

  val q147Sql: String =
    s"""WITH perdoc AS (${t146Sql.replace("ORDER BY doc_id", "")}),
       |vals AS (
       |  SELECT avg_nll, count(*) AS c, sum(n_tokens) AS tk
       |  FROM perdoc GROUP BY avg_nll),
       |cut AS (
       |  SELECT avg_nll, c, tk,
       |    1 + CAST(floor(3.0e0 * (sum(c) OVER (ORDER BY avg_nll
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
       |        / sum(c) OVER ()) AS INTEGER) AS bucket
       |  FROM vals)
       |SELECT bucket,
       |  (['head', 'middle', 'tail'])[bucket] AS label,
       |  CAST(sum(c) AS BIGINT) AS n_docs,
       |  CAST(sum(tk) AS BIGINT) AS n_tokens,
       |  round(CAST(sum(CAST(avg_nll AS DECIMAL(38,6)) * c) AS DOUBLE)
       |    / sum(c), 6) AS mean_nll,
       |  min(avg_nll) AS nll_lo, max(avg_nll) AS nll_hi
       |FROM cut GROUP BY bucket ORDER BY bucket""".stripMargin

  /** t305: BIGRAM language-model scoring — t146's unigram model upgraded
    * to first-order Markov: p(w₂|w₁) = (C(w₁w₂)+1)/(C(w₁·)+V) (Laplace
    * over the corpus's own bigram table — exact integer counts so the
    * oracle reproduces the model bit-for-bit; production CCNet uses KN
    * smoothing, whose discounts are the same count-table joins with
    * different closed-form arithmetic). Per doc: bigram count, summed
    * log-probability, and average NLL — the fluency score that separates
    * scrambled-word-salad from prose, which a unigram model (t146)
    * provably cannot (it is permutation-invariant; Curation2Spec pins
    * exactly that contrast).
    *
    * Determinism: ln() rounded to 6 decimals then DECIMAL-summed (the
    * t146 recipe). Scale shape: bigram emit is one map-only array
    * transform (token array hoisted to a column first — the d302 HOF
    * lesson); the model is two count shuffles; scoring is one join keyed
    * by bigram plus a |vocab|-row context join and a 1-row V broadcast —
    * work ∝ corpus token count throughout. */
  def t305BigramLm(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash.{seqAsc, tokens}
    // measured: SparkSupport.parallelized here costs more than it saves
    // (0.91 → 1.27 s at sf0.1 — the bigram fold is light and the count
    // shuffles already parallelize; the extra exchange only adds stages)
    val t = Tables.documents(s, dir)
      .selectExpr("doc_id", s"$tokens AS toks")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bg = t.filter(size(col("toks")) >= 2)
      .selectExpr("doc_id",
        s"""explode(transform(${seqAsc("2", "size(toks)")},
           |  i -> struct(element_at(toks, i - 1) AS w1,
           |              element_at(toks, i) AS w2))) AS b""".stripMargin)
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy("w1").agg(sum(col("cb")).as("ctx"))
    val v = t.selectExpr("explode(toks) AS tok")
      .agg(countDistinct(col("tok")).as("v"))
    // r15-opt: attach the context totals to the MODEL (bigram-table-sized)
    // before scoring — the old plan joined the corpus bigram stream twice,
    // once keyed (w1, w2) and again keyed w1, i.e. two full-stream
    // exchanges where one suffices (guide §2.4). Same counts either way.
    // r15-opt (guide §4, the t156 form): lp is a function of the MODEL row
    // alone, so the ln + round + decimal-cast run once per (w1, w2) model
    // entry (vocab²-bounded) instead of once per corpus bigram row — the
    // join carries the precomputed DECIMAL. Values are bit-identical (lp
    // is constant within a (w1, w2) group).
    val cbx = cb.join(cu, Seq("w1"))
      .crossJoin(broadcast(v))
      .selectExpr("w1", "w2",
        "CAST(round(ln((cb + 1) / CAST(ctx + v AS DOUBLE)), 6) " +
          "AS DECIMAL(38,6)) AS lp")
    // broadcast like every sibling model join (t146/t156): without the
    // hint AQE only converts to BHJ after materializing BOTH exchanges,
    // i.e. the corpus bigram stream still shuffles once for nothing
    bg.join(broadcast(cbx), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
      // the average divides in EXACT micro-unit integers (floor DIV) —
      // round(double/n, 6) sits on midpoint/ulp edges where the engines'
      // rounding modes can split (the t199 floor-scale discipline)
      .selectExpr("doc_id", "n_bigrams",
        "CAST(slp AS DOUBLE) AS sum_lp",
        "CAST(CAST(-slp * 1000000 AS BIGINT) DIV n_bigrams AS DOUBLE) " +
          "/ 1e6 AS avg_nll")
      .orderBy("doc_id")
  }

  val t305Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, toks[i - 1] AS w1, toks[i] AS w2
      |  FROM t, unnest(range(2, len(toks) + 1)) AS u(i)),
      |cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
      |cu AS (SELECT w1, sum(cb) AS ctx FROM cb GROUP BY 1),
      |vv AS (SELECT count(DISTINCT tok) AS v
      |       FROM (SELECT unnest(toks) AS tok FROM t)),
      |lp AS (
      |  SELECT doc_id,
      |    CAST(round(ln((cb + 1) / CAST(ctx + v AS DOUBLE)), 6)
      |      AS DECIMAL(38,6)) AS lp
      |  FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN vv)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(lp) AS DOUBLE) AS sum_lp,
      |  CAST(CAST(-sum(lp) * 1000000 AS BIGINT) // count(*) AS DOUBLE)
      |    / 1e6 AS avg_nll
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d144_canonical_docs"   -> d144CanonicalDocs,
    "t146_unigram_logprob"  -> t146UnigramLogprob,
    "q147_nll_buckets"      -> q147NllBuckets,
    "t305_bigram_lm"        -> t305BigramLm)

  val oracle: Map[String, String] = Map(
    "d144_canonical_docs"   -> d144Sql,
    "t146_unigram_logprob"  -> t146Sql,
    "q147_nll_buckets"      -> q147Sql,
    "t305_bigram_lm"        -> t305Sql)
}
