package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space statistics for retrieval/index tuning — the PCA tier
  * above the centroid/quantizer kernels (s122/s132/IVF-PQ): the top
  * principal component and its explained-variance share tell a pipeline
  * whether its embeddings are anisotropic enough to need whitening before
  * cosine retrieval (the common "all vectors share a dominant direction"
  * failure of contrastive encoders).
  */
object EmbeddingOps {

  private val Dims = 64
  // 20 rounds: sf0.001's eigen-gap leaves 10 rounds short of alignment;
  // 20 converges on every gate corpus while the driver solve stays
  // 64×64×20 multiplications
  private val Iters = 20

  /** s329: top principal component by POWER ITERATION over the Gram
    * matrix, with the explained-variance share — the whitening
    * decision-metric for an embedding corpus.
    *
    * Dataflow: ONE corpus pass accumulates the 64×64 Gram matrix
    * G_ij = Σ x_i·x_j — UPPER TRIANGLE ONLY (G is symmetric and the
    * per-row quantized term floor(x_i·x_j·1e12 + 0.5) is symmetric in
    * (i, j), so the j < i half is a bit-exact mirror): the posexplode²
    * generator keeps its codegen'd no-allocation shape and a codegen'd
    * `j >= i` filter halves the rows entering the hash aggregate — 2080
    * keys instead of 4096 probed per input row, and ≤ 2080 rows shuffled
    * per partition regardless of corpus size. (A/B note, r11: rebuilding
    * the triangle with a nested transform+struct+flatten generator to
    * halve GENERATION too was 3× slower — per-element struct allocation
    * dwarfs the saved half; the filter form measured 0.51 s vs 0.65 s
    * for the full square at sf0.1.) The driver
    * mirrors the triangle when materializing the matrix, then the fixed
    * power iterations run on the DRIVER over the collected
    * metadata-sized state (the s315/t296 driver-solve convention). At
    * 100 TB the corpus pass is the only scale-bound stage, and it is
    * embarrassingly partial.
    *
    * Determinism (the cross-engine contract): every sum is a BIGINT sum
    * of floor-quantized terms (Gram on the 1e12 lattice, matvec terms on
    * the 1e9 lattice — per-round quantization error is the loop's
    * convergence ceiling, and 1e6 plateaus Gv/v alignment at ~0.9989
    * where 1e9 converges past 0.9999), so accumulation order cannot
    * matter; every double
    * product is written with the SAME parenthesization both engines
    * evaluate under IEEE; each iteration renormalizes by the max-|s|
    * component and re-quantizes to the 1e6 lattice, so iteration n+1 is
    * a pure function of iteration n's integers. Sign is fixed by making
    * the largest-|component| (ties → smallest dim) positive. The oracle
    * unrolls the identical iterations as CTEs. */
  def s329PcaPower(s: SparkSession, dir: String): DataFrame = {
    val gramUpper = Similarity.vecs(s, dir)
      .selectExpr("v", "posexplode(v) AS (i, xi)")
      .selectExpr("i", "xi", "posexplode(v) AS (j, xj)")
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum(expr("CAST(floor(xi * xj * 1e12 + 0.5) AS BIGINT)")).as("g"))
      .collect()
    // mirror the strict upper triangle driver-side: same IEEE product,
    // same quantization, so G(j,i) ≡ G(i,j) bit-for-bit
    val gram = gramUpper.iterator.flatMap { r =>
      val (i, j, g) = (r.getInt(0), r.getInt(1), r.getLong(2))
      if (i == j) Iterator((i, j) -> g)
      else Iterator((i, j) -> g, (j, i) -> g)
    }.toMap

    // driver power iteration — integers in, integers out each round
    var vq = Array.fill(Dims)(1000000000L)
    for (_ <- 1 to Iters) {
      val sAcc = Array.ofDim[Long](Dims)
      var i = 0
      while (i < Dims) {
        var acc = 0L
        var j = 0
        while (j < Dims) {
          val gd = gram.getOrElse((i, j), 0L).toDouble / 1e12
          val vd = vq(j).toDouble / 1e9
          acc += math.floor(gd * vd * 1e9 + 0.5).toLong
          j += 1
        }
        sAcc(i) = acc
        i += 1
      }
      val m = sAcc.map(math.abs).max.toDouble
      vq = sAcc.map(x => math.floor(x.toDouble / m * 1e9 + 0.5).toLong)
    }
    // sign convention: the largest-|component| (ties → smallest dim) is
    // positive — the same rule the oracle's ORDER BY abs DESC, dim applies
    val lead = vq.zipWithIndex.minBy { case (x, d) => (-math.abs(x), d) }
    if (lead._1 < 0) vq = vq.map(-_)

    // Rayleigh quotient on the final lattice vector, and the explained
    // share against trace(G) — all exact-integer sums + two divisions
    var num = 0L
    var i2 = 0
    while (i2 < Dims) {
      var j2 = 0
      while (j2 < Dims) {
        val gd = gram.getOrElse((i2, j2), 0L).toDouble / 1e12
        num += math.floor(
          ((gd * (vq(i2).toDouble / 1e9)) * (vq(j2).toDouble / 1e9))
            * 1e6 + 0.5).toLong
        j2 += 1
      }
      i2 += 1
    }
    val den = vq.map(x => math.floor(
      ((x.toDouble / 1e9) * (x.toDouble / 1e9)) * 1e6 + 0.5).toLong).sum
    val trace = (0 until Dims).map(d => gram.getOrElse((d, d), 0L)).sum
    val lambdaRaw = num.toDouble / den.toDouble
    val lambda6 = math.floor(lambdaRaw * 1e6 + 0.5).toLong
    val explained6 = math.floor(
      lambdaRaw / (trace.toDouble / 1e12) * 1e6 + 0.5).toLong

    import s.implicits._
    vq.zipWithIndex
      .map { case (x, d) => (d, x, lambda6, explained6) }.toSeq
      .toDF("dim", "v9", "lambda6", "explained6")
      .orderBy("dim")
  }

  val s329Sql: String = {
    // AS MATERIALIZED is load-bearing (the q198/q321 oracle lesson): s$n
    // is referenced TWICE (the max and the renormalize), so plain-CTE
    // inlining would double the chain per iteration — 2^10 copies of the
    // whole recursion, which is where the first draft of this oracle
    // ground to a halt
    def iter(n: Int): String =
      s"""s$n AS MATERIALIZED (
         |  SELECT g.i,
         |    sum(CAST(floor((CAST(g.g AS DOUBLE) / 1e12) *
         |      (CAST(v.vq AS DOUBLE) / 1e9) * 1e9 + 0.5) AS BIGINT)) AS s
         |  FROM gram g JOIN it${n - 1} v ON g.j = v.j GROUP BY 1),
         |m$n AS (SELECT CAST(max(abs(s)) AS DOUBLE) AS m FROM s$n),
         |it$n AS MATERIALIZED (
         |  SELECT i AS j,
         |    CAST(floor(CAST(s AS DOUBLE) / m * 1e9 + 0.5) AS BIGINT) AS vq
         |  FROM s$n CROSS JOIN m$n)""".stripMargin
    s"""WITH e AS (${Similarity.vecsDuck}),
       |gram AS MATERIALIZED (
       |  SELECT a.i - 1 AS i, b.j - 1 AS j,
       |    sum(CAST(floor(v[a.i] * v[b.j] * 1e12 + 0.5) AS BIGINT)) AS g
       |  FROM e, unnest(generate_series(1, $Dims)) AS a(i),
       |       unnest(generate_series(1, $Dims)) AS b(j)
       |  GROUP BY 1, 2),
       |it0 AS (
       |  SELECT i AS j, CAST(1000000000 AS BIGINT) AS vq
       |  FROM (SELECT DISTINCT i FROM gram)),
       |${(1 to Iters).map(iter).mkString(",\n")},
       |sgn AS (
       |  SELECT CASE WHEN vq < 0 THEN -1 ELSE 1 END AS sg
       |  FROM it$Iters ORDER BY abs(vq) DESC, j LIMIT 1),
       |fin AS MATERIALIZED (SELECT j, CAST(vq * sg AS BIGINT) AS vq
       |        FROM it$Iters CROSS JOIN sgn),
       |ray AS (
       |  SELECT
       |    (SELECT sum(CAST(floor(((CAST(g.g AS DOUBLE) / 1e12 *
       |        (CAST(a.vq AS DOUBLE) / 1e9)) * (CAST(b.vq AS DOUBLE) / 1e9))
       |        * 1e6 + 0.5) AS BIGINT))
       |     FROM gram g JOIN fin a ON g.i = a.j JOIN fin b ON g.j = b.j)
       |      AS num,
       |    (SELECT sum(CAST(floor(((CAST(vq AS DOUBLE) / 1e9) *
       |        (CAST(vq AS DOUBLE) / 1e9)) * 1e6 + 0.5) AS BIGINT))
       |     FROM fin) AS den,
       |    (SELECT sum(g) FROM gram WHERE i = j) AS trace),
       |out AS (
       |  SELECT CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS lr, trace
       |  FROM ray)
       |SELECT CAST(fin.j AS INTEGER) AS dim, fin.vq AS v9,
       |  CAST(floor(lr * 1e6 + 0.5) AS BIGINT) AS lambda6,
       |  CAST(floor(lr / (CAST(trace AS DOUBLE) / 1e12) * 1e6 + 0.5)
       |    AS BIGINT) AS explained6
       |FROM fin CROSS JOIN out ORDER BY dim""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s329_pca_power" -> s329PcaPower)

  val oracle: Map[String, String] = Map(
    "s329_pca_power" -> s329Sql)
}
