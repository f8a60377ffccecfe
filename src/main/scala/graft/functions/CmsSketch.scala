package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a typed `Aggregator` — fixed-size mergeable state for
  * approximate frequency counting (heavy hitters) over unbounded key
  * domains.
  *
  * Layout: `depth` rows × `width` counters in one flat Array[Long]. Each
  * input hash h increments cell (i, ((a_i·h + b_i) mod p) mod width) for
  * every row i; a point estimate is the MIN over the depth cells, which
  * over-counts (never under-counts) with error ≤ ε·N at probability
  * 1 − (1/2)^depth for width = ⌈e/ε⌉.
  *
  * Determinism: the row hashes are portable integer arithmetic (same
  * [[PortableHash]] family the dedup suite uses), the per-row hash params
  * are fixed constants, and counter addition is commutative — so the merged
  * sketch is identical under any partitioning, and estimates are
  * reproducible across runs and engines. Buffer adds are associative →
  * Spark runs this as partial (map-side) + final aggregation; only
  * depth×width longs shuffle per partition, regardless of input size — the
  * property that makes sketch aggregation viable at 100 TB.
  */
class CmsSketch(depth: Int, width: Int)
  extends Aggregator[Long, Array[Long], Array[Long]] {

  private val P = 2305843009213693951L // 2^61 - 1 (Mersenne)
  // fixed odd multipliers / offsets per row (splitmix64 of the row index),
  // precomputed ONCE at construction: cell() runs depth times per input
  // row in the hot aggregation loop, and recomputing the three-stage mix
  // there would redo 2·depth hash finalizations per row for constants
  private val as: Array[Long] =
    Array.tabulate(depth)(i => CmsSketch.mix(0x9E3779B97F4A7C15L * (i + 1)) | 1L)
  private val bs: Array[Long] =
    Array.tabulate(depth)(i => CmsSketch.mix(0xBF58476D1CE4E5B9L * (i + 1)))

  def cell(i: Int, h: Long): Int = {
    val m = (as(i) * (h & 0x7FFFFFFFFFFFFFFFL) + bs(i)) % P
    (((m % width) + width) % width).toInt
  }

  def zero: Array[Long] = new Array[Long](depth * width)

  def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < depth) { buf(i * width + cell(i, h)) += 1L; i += 1 }
    buf
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  // flat primitive-array encoding (UnsafeArrayData), not javaSerialization:
  // the buffer crosses the partial→final exchange once per partition and
  // ObjectOutputStream framing is both larger and slower than the unsafe
  // form; the output additionally becomes a real array<bigint> column
  // instead of opaque binary
  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Point estimate from a finished sketch. */
  def estimate(sketch: Array[Long], h: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val v = sketch(i * width + cell(i, h))
      if (v < best) best = v
      i += 1
    }
    best
  }
}

object CmsSketch {
  /** splitmix64 finalizer — deterministic bit mixing. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
