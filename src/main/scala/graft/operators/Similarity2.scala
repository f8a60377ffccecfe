package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Similarity-search evaluation and compression: the recall measurement
  * that decides whether an ANN index is good enough to replace exact
  * search, and product quantization — the memory-compression step that
  * makes billion-vector indexes (IVF-PQ) fit in RAM.
  *
  * Both follow the package's determinism discipline: codebooks derive from
  * floor-scale quantized means ([[graft.functions.OracleSafe]]), distances
  * are strict left folds, errors accumulate as exact scaled integers.
  */
object Similarity2 {

  // ---------------------------------------------------------------- s163

  /** s163: ANN recall@3 — per probe query, how many of the exact top-3
    * neighbors (s38's brute-force truth) the IVF index (s39, 2-probe)
    * actually returned. The acceptance metric for index tuning: nprobe and
    * cell count trade recall against scan fraction, and this query is the
    * measurement that trade reads (the d162 premise applied to vectors).
    *
    * Scale shape: composes two verified kernels; the eval join and the
    * per-query count run over 16×3 rows — nothing here scales with the
    * corpus. */
  def s163AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val truth = Similarity.s38AnnBrute(s, dir)
      .filter(col("rank") <= 3).select("qid", "nid")
    val got = Similarity.s39AnnIvf(s, dir).select("qid", "nid")
    truth.join(got.withColumn("hit", lit(1)), Seq("qid", "nid"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("int").as("n_hit"))
      .selectExpr("qid", "n_hit", "round(n_hit / 3.0D, 6) AS recall_at_3")
      .orderBy("qid")
  }

  val s163Sql: String =
    s"""WITH truth AS (
       |  SELECT qid, nid FROM (${Similarity.s38Sql}) WHERE rank <= 3),
       |got AS (SELECT qid, nid FROM (${Similarity.s39Sql})),
       |j AS (
       |  SELECT t.qid, CASE WHEN g.nid IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM truth t LEFT JOIN got g ON g.qid = t.qid AND g.nid = t.nid)
       |SELECT qid, CAST(sum(hit) AS INTEGER) AS n_hit,
       |  round(CAST(sum(hit) AS INTEGER) / 3.0, 6) AS recall_at_3
       |FROM j GROUP BY qid ORDER BY qid""".stripMargin

  // ---------------------------------------------------------------- s166

  /** s166: product quantization — split each 64-dim vector into 8
    * contiguous 8-dim subvectors; per subspace, a 4-codeword codebook
    * (codewords = floor-scale quantized per-dim means over the subspace's
    * sign-cell partition — deterministic stand-ins for trained k-means
    * codewords, the s39/s132 convention); assign each subvector to its
    * nearest codeword by L2² (strict left-fold, ties to the smaller code).
    * Output per vector: the 8-code string (the compressed representation —
    * 8 bytes standing in for 256) and the total reconstruction error.
    *
    * Scale shape: the codebook aggregate is fixed-size (8 subspaces × 4
    * cells × 8 dims) with map-side partial aggregation; assignment
    * broadcasts the 32-codeword table and the corpus never shuffles until
    * the per-vector regroup — the exact IVF-PQ build dataflow. Error sums
    * accumulate as exact scaled longs (order-independent). */
  /** The corpus split into 8 contiguous 8-dim subvectors (vec_id, m, sv). */
  private def pqSub(s: SparkSession, dir: String): DataFrame =
    Similarity.vecs(s, dir)
      .selectExpr("vec_id",
        """explode(transform(sequence(0, 7), m ->
          |  struct(m AS m, slice(v, m * 8 + 1, 8) AS sv))) AS e""".stripMargin)
      .selectExpr("vec_id", "e.m AS m", "e.sv AS sv")

  /** Per-subspace 4-codeword codebook: floor-scale quantized per-dim means
    * over the subspace's sign-cell partition (m, code, cw). */
  private def pqCodebook(sub: DataFrame): DataFrame = sub
    .selectExpr("m",
      "2 * CAST(element_at(sv, 1) >= 0 AS INT) + " +
        "CAST(element_at(sv, 2) >= 0 AS INT) AS code",
      "posexplode(sv) AS (p, x)")
    .groupBy("m", "code", "p")
    .agg(graft.functions.OracleSafe.qmean6(col("x")).as("c"))
    .groupBy("m", "code")
    .agg(expr("transform(sort_array(collect_list(struct(p, c))), e -> e.c)")
      .as("cw"))

  /** Nearest-codeword assignment per (vec_id, m): `b.code` is the code,
    * `b.d2` the subspace reconstruction error. */
  private def pqAssign(sub: DataFrame, cb: DataFrame): DataFrame =
    sub.as("s").join(broadcast(cb).as("b"), col("s.m") === col("b.m"))
      .selectExpr("vec_id", "s.m AS m", "code",
        """aggregate(zip_with(sv, cw, (x, y) -> (x - y) * (x - y)), 0D,
          |  (acc, x) -> acc + x) AS d2""".stripMargin)
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d2"), col("code"))).as("b"))

  def s166PqCodes(s: SparkSession, dir: String): DataFrame = {
    // feeds the codebook aggregate AND the assignment join — one scan
    val sub = pqSub(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
    pqAssign(sub, pqCodebook(sub))
      .groupBy("vec_id")
      .agg(
        expr("""concat_ws('-', transform(
          |  array_sort(collect_list(struct(m, b.code AS code))),
          |  e -> CAST(e.code AS STRING)))""".stripMargin).as("codes"),
        graft.functions.OracleSafe.qsum6(col("b.d2")).as("qerr"))
      .orderBy("vec_id")
  }

  /** The PQ CTE chain (subvectors → codebook → assignment), shared by the
    * s166 code dump and s173's ADC search oracle. */
  private val pqCtes: String =
    s"""e AS (${Similarity.vecsDuck}),
       |sub AS (
       |  SELECT vec_id, m, v[m * 8 + 1 : m * 8 + 8] AS sv
       |  FROM e, (SELECT unnest(range(0, 8)) AS m) ms),
       |cbdim AS (
       |  SELECT m, 2 * CAST(sv[1] >= 0 AS INTEGER)
       |         + CAST(sv[2] >= 0 AS INTEGER) AS code, p,
       |    CAST(sum(CAST(floor(sv[p] * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
       |      / count(*) / 1e6 AS c
       |  FROM sub, (SELECT unnest(range(1, 9)) AS p) ps
       |  GROUP BY 1, 2, 3),
       |cb AS (SELECT m, code, list(c ORDER BY p) AS cw
       |       FROM cbdim GROUP BY 1, 2),
       |d AS (
       |  SELECT vec_id, s.m, b.code,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, 9),
       |      j -> (s.sv[j] - b.cw[j]) * (s.sv[j] - b.cw[j]))),
       |      (x, y) -> x + y) AS d2
       |  FROM sub s JOIN cb b ON s.m = b.m),
       |best AS (
       |  SELECT vec_id, m, code, d2, row_number() OVER (
       |    PARTITION BY vec_id, m ORDER BY d2, code) AS rn
       |  FROM d)""".stripMargin

  val s166Sql: String =
    s"""WITH $pqCtes
       |SELECT vec_id,
       |  string_agg(CAST(code AS VARCHAR), '-' ORDER BY m) AS codes,
       |  CAST(sum(CAST(floor(d2 * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6
       |    AS qerr
       |FROM best WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- s173

  /** s173: PQ asymmetric distance computation (ADC) — the IVF-PQ QUERY
    * path: each probe query precomputes a (subspace × codeword) distance
    * table against the s166 codebooks; a corpus vector's approximate
    * distance is then 8 TABLE LOOKUPS summed over its stored codes —
    * no float arithmetic against corpus data at all. Top-3 per query by
    * ADC distance. This is the step that makes billion-vector search
    * feasible: the scan touches 8 bytes per vector, not 256.
    *
    * Scale shape: the distance table is queries × 8 × 4 = 512 rows —
    * broadcast; the corpus side is the stored code table (8 small ints
    * per vector), scanned once, joined on (m, code), and aggregated by
    * (query, vector) with map-side partials. Per-lookup distances
    * quantize to scaled longs, so ADC sums are exact integers. */
  def s173PqAdcSearch(s: SparkSession, dir: String): DataFrame = {
    val sub = pqSub(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
    val cb = pqCodebook(sub)
    val codes = pqAssign(sub, cb)
      .selectExpr("vec_id", "m", "b.code AS code")
    val dt = sub.filter(col("vec_id") < 16)
      .selectExpr("vec_id AS qid", "m AS qm", "sv AS qsv")
      .join(broadcast(cb), col("qm") === col("m"))
      .selectExpr("qid", "m", "code",
        """CAST(floor(aggregate(zip_with(qsv, cw, (x, y) -> (x - y) * (x - y)),
          |  0D, (acc, x) -> acc + x) * 1e6 + 0.5) AS BIGINT) AS q6""".stripMargin)
    codes.join(broadcast(dt), Seq("m", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg(sum(col("q6")).as("s6"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("s6"), col("vec_id"))))
      .filter(col("rank") <= 3)
      .selectExpr("qid", "rank", "vec_id AS nid",
        "round(CAST(s6 AS DOUBLE) / 1e6, 6) AS adc")
      .orderBy("qid", "rank")
  }

  val s173Sql: String =
    s"""WITH $pqCtes,
       |codes AS (SELECT vec_id, m, code FROM best WHERE rn = 1),
       |dt AS (
       |  SELECT s.vec_id AS qid, b.m, b.code,
       |    CAST(floor(list_reduce(list_prepend(0.0, list_transform(range(1, 9),
       |      j -> (s.sv[j] - b.cw[j]) * (s.sv[j] - b.cw[j]))),
       |      (x, y) -> x + y) * 1e6 + 0.5) AS BIGINT) AS q6
       |  FROM sub s JOIN cb b ON s.m = b.m
       |  WHERE s.vec_id < 16),
       |adc AS (
       |  SELECT dt.qid, c.vec_id, CAST(sum(dt.q6) AS BIGINT) AS s6
       |  FROM codes c JOIN dt ON dt.m = c.m AND dt.code = c.code
       |  WHERE c.vec_id <> dt.qid
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT qid, vec_id, s6, CAST(row_number() OVER (
       |    PARTITION BY qid ORDER BY s6, vec_id) AS INTEGER) AS rank
       |  FROM adc)
       |SELECT qid, rank, vec_id AS nid,
       |  round(CAST(s6 AS DOUBLE) / 1e6, 6) AS adc
       |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- maps

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s163_ann_recall"   -> s163AnnRecall,
    "s166_pq_codes"     -> s166PqCodes,
    "s173_pq_adc_search" -> s173PqAdcSearch)

  val oracle: Map[String, String] = Map(
    "s163_ann_recall"   -> s163Sql,
    "s166_pq_codes"     -> s166Sql,
    "s173_pq_adc_search" -> s173Sql)
}
