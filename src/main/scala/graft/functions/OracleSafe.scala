package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers.
  *
  * Double-precision SUM/AVG results depend on accumulation order, which
  * differs between engines (and between runs under different partitionings).
  * To make aggregate results hash-comparable against an external SQL oracle
  * we quantize each row to an exact decimal BEFORE summing: decimal addition
  * is associative/commutative, so the sum is order-independent and identical
  * in any engine. Casting the final exact decimal back to double is a single
  * deterministic IEEE-754 rounding.
  *
  * Per-ROW double arithmetic (a*b, a/b, sqrt) is already deterministic across
  * engines (same IEEE ops on the same bits) and needs no special handling.
  */
object OracleSafe {
  private val D = DecimalType(38, 6)

  /** Order-independent sum of a (possibly computed) double column. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-independent average: exact decimal sum / count, divided in double. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)

  /** Midpoint-proof quantized sum: per-row floor(x·1e6 + 0.5) scaled longs
    * summed exactly, divided back in double. The decimal-cast path (dsum)
    * rounds each raw double HALF_UP at the 6th decimal — an operation whose
    * tie-handling differs between engines when a row lands exactly on a
    * midpoint (observed once at sf0.1: one d² row in ~5k flipped the 6th
    * decimal of a kmeans inertia). floor on identical IEEE bits cannot
    * diverge; integer addition is exact; the two final divisions are single
    * deterministic IEEE ops. Trade-off: truncating quantization (bias
    * < 1e-6·n) instead of round-half-even — fine for gate metrics.
    *
    * The scaled longs accumulate in DECIMAL(38,0) (not Long): a wrapping
    * Long sum would silently saturate once Σ|x|·1e6 passes 2^63 (~9.2e12
    * unit-scale row-sum — a 100 TB corpus reaches it); DuckDB's BIGINT sum
    * already widens to int128, so decimal accumulation keeps both sides
    * exact at any scale.
    *
    * DuckDB twin:
    * {{{ CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 }}} */
  def qsum6(c: Column): Column =
    sum(floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)")).cast("double") /
      lit(1e6)

  /** Midpoint-proof quantized mean — qsum6 / count, all deterministic ops.
    * DuckDB twin appends {{{ / count(*) }}} before the 1e6 division:
    * {{{ CAST(sum(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
    *       / count(*) / 1e6 }}}
    * The divisor is count(1) — ALL rows — to match that twin exactly:
    * count(c) would skip NULLs and silently diverge from the oracle the
    * first time a nullable column reaches this helper (NULL rows already
    * contribute nothing to the numerator on both engines). */
  def qmean6(c: Column): Column =
    sum(floor(c * lit(1e6) + lit(0.5)).cast("decimal(38,0)")).cast("double") /
      count(lit(1)) / lit(1e6)
}
