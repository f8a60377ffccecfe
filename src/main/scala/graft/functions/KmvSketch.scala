package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator[IN, BUF, OUT]` — the custom-aggregation tier of the
  * extension ladder (SURVEY.md §7.2), alongside the native-`Expression`
  * tier (`graft.catalyst`) and the custom-plan tier (`graft.plans`).
  *
  * The sketch keeps the k smallest values of a uniform hash of each
  * element: `reduce` inserts with a bounded sorted buffer, `merge` unions
  * two buffers and re-truncates to k. Both are order-independent set
  * operations, so — unlike HLL's register encoding — the result is
  * DETERMINISTIC under any partitioning and bit-identical across engines
  * computing the same hash: the DuckDB oracle re-derives the k-th smallest
  * hash and the estimate exactly (d62). Estimate: D̂ = (k−1)·P / h_k, the
  * standard KMV estimator over hash space [0, P).
  *
  * Scale: the buffer is a fixed k·8 bytes per group regardless of input
  * cardinality; partial aggregation applies (map-side combine), so the
  * shuffle carries one k-array per (group, task). The input is the
  * PRE-HASHED value (a long) — hashing happens once in a codegen'd
  * projection ([[graft.catalyst.PolyHash]] for strings, `pmod` arithmetic
  * for integers), keeping the aggregator itself type-agnostic.
  */
object KmvSketch {
  val P: Long = PortableHash.P

  case class Result(kth_hash: Long, n_seen: Int, est_distinct: Long)

  /** `k` smallest distinct hashes; buffer is a sorted array (ascending). */
  class Agg(k: Int) extends Aggregator[Long, Array[Long], Result] {
    require(k >= 2, "KMV needs k >= 2")

    override def zero: Array[Long] = Array.empty

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present (KMV is over the DISTINCT hashes)
      else if (buf.length < k) {
        val ins = -pos - 1
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (h < buf(k - 1)) {
        val ins = -pos - 1
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted-merge skipping duplicates, truncate to k — order-independent
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
          else { j += 1; b(j - 1) }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(buf: Array[Long]): Result =
      if (buf.length < k) Result(if (buf.isEmpty) -1L else buf.last, buf.length, buf.length)
      else Result(buf(k - 1), k, (k - 1).toLong * P / buf(k - 1))

    // flat primitive-array encoding — see CmsSketch's encoder note
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Result] = Encoders.product[Result]
  }

  /** Column form: `kmv(col, k)` over a pre-hashed long column. */
  def kmv(c: Column, k: Int): Column = udaf(new Agg(k)).apply(c)

  /** Null-tolerant variant: the SENTINEL −1 is skipped by `reduce` —
    * callers encode a null input value as `coalesce(hash, -1L)` (safe
    * because every portable hash lives in [0, P)), and the sketch then
    * matches `count_distinct`'s ignore-nulls contract exactly. Encoding at
    * the call site rather than nullable input keeps the aggregator's
    * primitive-long lane (no boxing in the hot path). */
  class SkipSentinelAgg(k: Int) extends Agg(k) {
    override def reduce(buf: Array[Long], h: Long): Array[Long] =
      if (h == -1L) buf else super.reduce(buf, h)
  }

  /** Column form of [[SkipSentinelAgg]]: `kmvSkipNull(coalesce(h, -1), k)`. */
  def kmvSkipNull(c: Column, k: Int): Column =
    udaf(new SkipSentinelAgg(k)).apply(c)

  /** State-exposing form: the sorted k-minimum hash ARRAY itself, not the
    * finished estimate — the mergeable sketch state that KMV set algebra
    * (d195 union/intersection estimates) consumes downstream. Same bounded
    * reduce/merge as [[Agg]]; `finish` is the identity, so the output is
    * still deterministic under any partitioning. */
  class ArrAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    private val inner = new Agg(k)
    override def zero: Array[Long] = inner.zero
    override def reduce(b: Array[Long], h: Long): Array[Long] = inner.reduce(b, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form: `kmvArr(col, k)` — the sorted k-minimum hash array. */
  def kmvArr(c: Column, k: Int): Column = udaf(new ArrAgg(k)).apply(c)
}
