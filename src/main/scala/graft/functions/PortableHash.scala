package graft.functions

/** Spark-SQL expression fragments for hashing/shingling that have exact
  * DuckDB twins — pure 64-bit integer arithmetic over character codes, so
  * the SAME values come out of both engines and MinHash/SimHash/fingerprint
  * queries can be hash-compared against the oracle (no Spark-private hash
  * like xxhash64/murmur leaks into results).
  *
  * Everything stays in built-in higher-order functions (transform/aggregate)
  * → Catalyst expressions, codegen-friendly, no UDFs (SURVEY.md §4.3 stance).
  *
  * polyHash(s, seed): fold over chars — h = (h * 31 + code) mod 1e9+7.
  * Bounded: h < 1e9+7, so h*31 + 1114111 < 2^35 — no 64-bit overflow.
  */
object PortableHash {
  val P = 1000000007L

  /** Polynomial rolling hash of string expression `s` (Spark SQL form).
    * DuckDB twin:
    * {{{ list_reduce(list_prepend(CAST(<seed> AS BIGINT),
    *       list_transform(string_split(<s>,''), c -> CAST(ascii(c) AS BIGINT))),
    *     (acc, x) -> (acc * 31 + x) % 1000000007) }}} */
  def polyHash(s: String, seed: Long = 7L): String =
    s"aggregate(transform(split($s, ''), c -> CAST(ascii(c) AS BIGINT)), " +
      s"CAST($seed AS BIGINT), (acc, x) -> (acc * 31 + x) % $P)"

  /** Whitespace tokens of lowercased text. DuckDB: string_split(lower(text),' '). */
  val tokens: String = "split(lower(text), ' ')"

  /** Multiplicative spreader for KMV-style estimators over [[polyHash]]
    * values: a SHORT string's fold never wraps the modulus (a 4-char
    * string folds to < ~2·10⁶), so its hashes cluster at the bottom of
    * [0, P) and the KMV estimate (k−1)·P/h_k — which assumes uniformity
    * over the FULL range — comes out orders of magnitude high.
    * `h·2654435761 mod P` is a bijection on [0, P) (Knuth's constant is
    * coprime to the prime) that spreads any dense interval across the
    * field; the product stays under 2⁶³ (h < 1e9+7 ⇒ < 2.7·10¹⁸), so the
    * same two-operation arithmetic is exact in Spark and DuckDB alike.
    * Equality is preserved (bijection), so distinct counts are unchanged
    * — only the ORDER of hash values is scrambled into uniformity. */
  def kmvSpread(h: String): String = s"(($h) * 2654435761L) % ${P}L"

  /** DuckDB twin of [[kmvSpread]]. */
  def kmvSpreadDuck(h: String): String = s"(($h) * 2654435761) % $P"

  /** An ASCENDING `sequence(lo, hi)` that is EMPTY when hi < lo — the
    * DuckDB `range(lo, hi+1)` contract. Spark's sequence() defaults to
    * step −1 when start > stop, so a window expression like
    * `sequence(1, size(toks) − 4)` DESCENDS on a short doc and the bogus
    * slice start then throws at runtime, killing the whole query (the
    * q136 lesson; see also [[shingles]]). Built as a floor-1 ascending
    * sequence sliced down to its true (possibly zero) length. */
  def seqAsc(lo: String, hi: String): String =
    s"slice(sequence($lo, greatest($hi, $lo)), 1, " +
      s"greatest(($hi) - ($lo) + 1, 0))"

  /** THE deterministic-split LCG — `(id·1103515245 + 12345) mod m` — one
    * definition for the q75/q82/t101/d143 family (the same split rule must
    * hash the same row to the same bucket in every query; a fifth hand
    * copy drifting by one constant would silently de-correlate the splits
    * while each query's own oracle, edited in tandem, stayed green).
    * Id-domain bound: id·1103515245 must not wrap int64 (Spark wraps
    * silently, DuckDB raises) — ids must stay below 2^63/1103515245 ≈
    * 8.3e9; dense row-number ids are orders of magnitude under that, and
    * larger id schemes reduce mod a prime first (q149's form). */
  def lcgSplit(id: String, m: Long = 100L): String =
    s"($id * 1103515245L + 12345L) % ${m}L"

  /** DuckDB twin of [[lcgSplit]] for composing oracle SQL. */
  def lcgSplitDuck(id: String, m: Long = 100L): String =
    s"($id * 1103515245 + 12345) % $m"

  /** THE experiment arm-split hash — `((id mod 1000003)·2654435761) mod
    * 100 < 50` (prime pre-reduction then Knuth's multiplicative constant)
    * — one definition for the q149/q276 family: CUPED's variance
    * adjustment is only valid if its arms are EXACTLY the t-test's, so
    * the expression must be structurally shared, not hand-copied.
    * 1000003·2654435761 ≈ 2.7e15 stays well inside int64 for any id. */
  def knuthArm(id: String): String =
    s"CAST((($id % 1000003L) * 2654435761L) % 100 < 50 AS INT)"

  /** DuckDB twin of [[knuthArm]]. */
  def knuthArmDuck(id: String): String =
    s"CAST((($id % 1000003) * 2654435761) % 100 < 50 AS INTEGER)"

  /** Distinct word n-gram shingles (default 3) of `text`.
    * DuckDB twin:
    * {{{ list_distinct(list_transform(range(1, len(toks) - n + 2),
    *       i -> array_to_string(toks[i:i+n-1], ' '))) }}}
    * A sub-n-token doc yields an EMPTY array on both engines — the window
    * indexes come from [[seqAsc]] (empty when the doc is short, exactly
    * like DuckDB's range()), so one short doc degrades to zero shingles
    * instead of crashing the job. */
  def shingles(n: Int = 3): String = {
    val len = s"size($tokens) - ${n - 1}"
    s"array_distinct(transform(${seqAsc("1", len)}, " +
      s"i -> concat_ws(' ', slice($tokens, i, $n))))"
  }
}
