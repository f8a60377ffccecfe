package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: BANDED Levenshtein distance with cutoff —
  * `lev_within(s1, s2, k)` returns the exact edit distance when it is ≤ k
  * and the sentinel k+1 otherwise.
  *
  * Why a band: entity resolution only ever asks "is the distance ≤ k" for
  * small k, but the built-in `levenshtein` fills the full n×m matrix —
  * O(n·m) per pair. Cells more than k off the diagonal can never belong to
  * a ≤ k alignment, so the DP visits only the 2k+1-wide band — O(k·n) — and
  * EXITS as soon as a whole band row exceeds k (cell values are
  * monotonically non-decreasing along the DP, so no later cell can come
  * back under the cutoff). On a blocked candidate-pair join at 100 TB the
  * verify kernel is the hot loop; for typical name lengths (~25 chars) and
  * k = 1-2 this is ~10× less work per pair, and the length pre-check
  * (|n−m| > k → k+1) rejects most non-candidates without touching the DP.
  *
  * The shared [[BandedLevenshtein.compute]] kernel backs both the
  * interpreted eval and `doGenCode` (a static call inside whole-stage
  * codegen), so the two paths cannot diverge. Reference semantics
  * cross-checked against the built-in in BandedLevenshteinSpec.
  *
  * The cutoff k is pinned at plan time (foldable literal) — it sizes the
  * band buffers once per expression, not per row.
  */
case class BandedLevenshtein(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lev_within"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && k >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lev_within expects (string, string, non-negative int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}, $k)")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BandedLevenshtein.compute(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.catalyst.BandedLevenshtein.compute(" +
        s"$a.toString(), $b.toString(), $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BandedLevenshtein =
    copy(left = newLeft, right = newRight)
}

object BandedLevenshtein {

  /** Banded edit-distance kernel: exact distance if ≤ k, else k+1.
    *
    * Operates on CODE POINTS, not UTF-16 chars: the built-in `levenshtein`
    * this kernel must agree with counts a surrogate pair (emoji, CJK
    * extensions, mathematical alphanumerics) as ONE symbol, so a char-unit
    * kernel would see it as two and report a larger distance — an entity-
    * resolution match present in the unoptimized query would vanish when
    * the banded kernel is swapped in. The BMP fast path (no surrogates —
    * virtually all real identifier data) skips the decode allocation and
    * compares chars directly, which is code-point-identical there. */
  def compute(s: String, t: String, k: Int): Int = {
    def hasSurrogate(x: String): Boolean = {
      var i = 0
      while (i < x.length) {
        if (Character.isHighSurrogate(x.charAt(i))) return true
        i += 1
      }
      false
    }
    if (hasSurrogate(s) || hasSurrogate(t))
      computeCp(s.codePoints().toArray, t.codePoints().toArray, k)
    else computeBmp(s, t, k)
  }

  private def computeCp(s: Array[Int], t: Array[Int], k: Int): Int = {
    val n = s.length; val m = t.length
    if (math.abs(n - m) > k) return k + 1
    if (n == 0) return math.min(m, k + 1)
    if (m == 0) return math.min(n, k + 1)
    val inf = k + 1
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      cur(lo - 1) = if (lo - 1 == 0 && i <= k) i else inf
      var rowMin = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        val del = if (j <= i + k - 1) prev(j) + 1 else inf
        val ins = cur(j - 1) + 1
        val sub = prev(j - 1) + cost
        var v = if (del < ins) del else ins
        if (sub < v) v = sub
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (rowMin > k) return inf
      j = lo - 1
      while (j <= math.min(m, hi + 1)) { prev(j) = cur(j); j += 1 }
      i += 1
    }
    math.min(prev(m), inf)
  }

  private def computeBmp(s: String, t: String, k: Int): Int = {
    val n = s.length; val m = t.length
    if (math.abs(n - m) > k) return k + 1
    if (n == 0) return math.min(m, k + 1)
    if (m == 0) return math.min(n, k + 1)
    val inf = k + 1
    // prev/cur hold one DP row each, but only cells within the band are read
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      cur(lo - 1) = if (lo - 1 == 0 && i <= k) i else inf
      var rowMin = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        val del = if (j <= i + k - 1) prev(j) + 1 else inf // cell above
        val ins = cur(j - 1) + 1                           // cell left
        val sub = prev(j - 1) + cost                       // diagonal
        var v = if (del < ins) del else ins
        if (sub < v) v = sub
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf // right band edge for the next row's reads
      if (rowMin > k) return inf    // monotone DP: can never recover under k
      // swap rows
      j = lo - 1
      while (j <= math.min(m, hi + 1)) { prev(j) = cur(j); j += 1 }
      i += 1
    }
    math.min(prev(m), inf)
  }
}
