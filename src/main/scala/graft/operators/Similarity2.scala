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
  def s166PqCodes(s: SparkSession, dir: String): DataFrame = {
    val sub = Similarity.vecs(s, dir)
      .selectExpr("vec_id",
        """explode(transform(sequence(0, 7), m ->
          |  struct(m AS m, slice(v, m * 8 + 1, 8) AS sv))) AS e""".stripMargin)
      .selectExpr("vec_id", "e.m AS m", "e.sv AS sv")
      // feeds the codebook aggregate AND the assignment join — one scan
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cb = sub
      .selectExpr("m",
        "2 * CAST(element_at(sv, 1) >= 0 AS INT) + " +
          "CAST(element_at(sv, 2) >= 0 AS INT) AS code",
        "posexplode(sv) AS (p, x)")
      .groupBy("m", "code", "p")
      .agg(graft.functions.OracleSafe.qmean6(col("x")).as("c"))
      .groupBy("m", "code")
      .agg(expr("transform(sort_array(collect_list(struct(p, c))), e -> e.c)")
        .as("cw"))
    sub.as("s").join(broadcast(cb).as("b"), col("s.m") === col("b.m"))
      .selectExpr("vec_id", "s.m AS m", "code",
        """aggregate(zip_with(sv, cw, (x, y) -> (x - y) * (x - y)), 0D,
          |  (acc, x) -> acc + x) AS d2""".stripMargin)
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d2"), col("code"))).as("b"))
      .groupBy("vec_id")
      .agg(
        expr("""concat_ws('-', transform(
          |  array_sort(collect_list(struct(m, b.code AS code))),
          |  e -> CAST(e.code AS STRING)))""".stripMargin).as("codes"),
        (sum(floor(col("b.d2") * lit(1e6) + lit(0.5)).cast("decimal(38,0)"))
          .cast("double") / lit(1e6)).as("qerr"))
      .orderBy("vec_id")
  }

  val s166Sql: String =
    s"""WITH e AS (${Similarity.vecsDuck}),
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
       |  FROM d)
       |SELECT vec_id,
       |  string_agg(CAST(code AS VARCHAR), '-' ORDER BY m) AS codes,
       |  CAST(sum(CAST(floor(d2 * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6
       |    AS qerr
       |FROM best WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- maps

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s163_ann_recall" -> s163AnnRecall,
    "s166_pq_codes"   -> s166PqCodes)

  val oracle: Map[String, String] = Map(
    "s163_ann_recall" -> s163Sql,
    "s166_pq_codes"   -> s166Sql)
}
