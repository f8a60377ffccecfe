package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Closed-form ML and retrieval scoring: group-wise OLS regression from
  * moment sums (single-pass trend fitting) and BM25 document scoring (the
  * search-ranking function) — both in the exact-moment determinism
  * discipline the rest of the engine uses.
  */
object Analytics2 {

  /** q150: per-group ordinary least squares — value regressed on
    * hour-of-day per event_type (the "is this metric trending through the
    * day" readout), fit CLOSED-FORM from five moment sums (n, Σx, Σx²,
    * Σy, Σxy, Σy²) in ONE aggregation pass. No iterative solver, no
    * per-group collect: slope, intercept, and r² are scalar arithmetic on
    * the aggregate row — the single-pass shape that fits a trend per key
    * at any scale (the gradient-descent alternative shuffles the corpus
    * once per step; the moment form shuffles one row per group, once).
    *
    * Determinism: x is an exact integer (hour); integer moments sum as
    * BIGINT, y-moments quantize per-row to DECIMAL(38,6)
    * ([[graft.functions.OracleSafe]]); the fit derives from exact sums
    * through one fixed IEEE chain. */
  def q150GroupwiseOls(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .selectExpr("event_type", "CAST(hour(ts) AS BIGINT) AS x",
        "CAST(round(value, 6) AS DECIMAL(38,6)) AS y",
        "CAST(round(value * value, 6) AS DECIMAL(38,6)) AS yy")
      .selectExpr("event_type", "x", "y", "yy",
        "CAST(round(x * CAST(y AS DOUBLE), 6) AS DECIMAL(38,6)) AS xy")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y")).as("sy"), sum(col("xy")).as("sxy"),
        sum(col("yy")).as("syy"))
      .selectExpr("event_type", "n", "sx", "sxx",
        "CAST(sy AS DOUBLE) AS dsy", "CAST(sxy AS DOUBLE) AS dsxy",
        "CAST(syy AS DOUBLE) AS dsyy")
      .selectExpr("event_type", "n",
        "(n * dsxy - sx * dsy) / (n * sxx - sx * sx) AS slope",
        "dsy AS dsy2", "dsxy AS dsxy2", "dsyy AS dsyy2", "sx", "sxx")
      .selectExpr("event_type", "n",
        "round(slope, 6) AS slope",
        "round((dsy2 - slope * sx) / n, 6) AS intercept",
        """round((n * dsxy2 - sx * dsy2) * (n * dsxy2 - sx * dsy2)
          |  / ((n * sxx - sx * sx) * (n * dsyy2 - dsy2 * dsy2)), 6)
          |AS r2""".stripMargin)
      .orderBy("event_type")
  }

  val q150Sql: String =
    """WITH m AS (
      |  SELECT event_type,
      |    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
      |    CAST(round(value, 6) AS DECIMAL(38,6)) AS y,
      |    CAST(round(value * value, 6) AS DECIMAL(38,6)) AS yy,
      |    CAST(round(CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT)
      |      * CAST(CAST(round(value, 6) AS DECIMAL(38,6)) AS DOUBLE), 6)
      |      AS DECIMAL(38,6)) AS xy
      |  FROM events),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y) AS DOUBLE) AS dsy, CAST(sum(xy) AS DOUBLE) AS dsxy,
      |    CAST(sum(yy) AS DOUBLE) AS dsyy
      |  FROM m GROUP BY event_type),
      |f AS (
      |  SELECT event_type, n, sx, sxx, dsy, dsxy, dsyy,
      |    (n * dsxy - sx * dsy) / (n * sxx - sx * sx) AS slope
      |  FROM g)
      |SELECT event_type, n,
      |  round(slope, 6) AS slope,
      |  round((dsy - slope * sx) / n, 6) AS intercept,
      |  round((n * dsxy - sx * dsy) * (n * dsxy - sx * dsy)
      |    / ((n * sxx - sx * sx) * (n * dsyy - dsy * dsy)), 6) AS r2
      |FROM f ORDER BY event_type""".stripMargin

  private val bmTerms = Seq("data", "spark", "join")

  /** t151: BM25 retrieval scoring — every document scored against a fixed
    * query term set with the Okapi BM25 function (k1 = 1.2, b = 0.75), the
    * ranking behind inverted-index search over a curated corpus.
    *
    * Scale shape: the token explosion filters to the QUERY TERMS before any
    * aggregation (the inverted-index access pattern — posting lists, never
    * the full corpus vocabulary), tf aggregates map-side; df and the
    * corpus-wide length stats are term-count- and scalar-sized broadcasts.
    * One shuffle keyed by doc for tf + one for the final per-doc sum.
    *
    * Determinism: idf uses the RATIONAL form (N − df + 0.5)/(df + 0.5)
    * (t59's convention — the log-idf variant would hang the gate on libm);
    * per-(term, doc) contributions quantize to DECIMAL(38,6) before the
    * per-doc sum. */
  def t151Bm25(s: SparkSession, dir: String): DataFrame = {
    val termArr = bmTerms.map(t => s"'$t'").mkString("array(", ", ", ")")
    val docs = Tables.documents(s, dir)
    val toks = docs
      .selectExpr("doc_id", "explode(split(lower(text), ' ')) AS t")
      .persist(StorageLevel.MEMORY_AND_DISK) // feeds lengths AND postings
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("tot"))
    val tf = toks.filter(array_contains(expr(termArr), col("t")))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "t")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .selectExpr("doc_id",
        """CAST(round(
          |  (n_docs - df + 0.5D) / (df + 0.5D) *
          |  tf * 2.2D / (tf + 1.2D * (0.25D + 0.75D * len
          |    / (CAST(tot AS DOUBLE) / n_docs))), 6)
          |AS DECIMAL(38,6)) AS c""".stripMargin)
      .groupBy("doc_id")
      .agg(sum(col("c")).as("sc"), count(lit(1)).as("n_terms_hit"))
      .selectExpr("doc_id", "n_terms_hit",
        "CAST(round(CAST(sc AS DOUBLE), 6) AS DOUBLE) AS bm25")
      .orderBy("doc_id")
  }

  val t151Sql: String = {
    val termList = bmTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
       |  FROM documents),
       |lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n_docs, sum(len) AS tot FROM lens),
       |tf AS (
       |  SELECT doc_id, t, count(*) AS tf FROM toks
       |  WHERE list_contains($termList, t) GROUP BY doc_id, t),
       |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
       |c AS (
       |  SELECT doc_id,
       |    CAST(round(
       |      (n_docs - df + 0.5e0) / (df + 0.5e0) *
       |      tf * 2.2e0 / (tf + 1.2e0 * (0.25e0 + 0.75e0 * len
       |        / (CAST(tot AS DOUBLE) / n_docs))), 6)
       |    AS DECIMAL(38,6)) AS c
       |  FROM tf JOIN df USING (t) JOIN lens USING (doc_id) CROSS JOIN stats)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
       |  round(CAST(sum(c) AS DOUBLE), 6) AS bm25
       |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q150_groupwise_ols" -> q150GroupwiseOls,
    "t151_bm25"          -> t151Bm25)

  val oracle: Map[String, String] = Map(
    "q150_groupwise_ols" -> q150Sql,
    "t151_bm25"          -> t151Sql)
}
