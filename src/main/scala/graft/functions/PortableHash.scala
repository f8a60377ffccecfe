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

  /** Distinct word n-gram shingles (default 3) of `text`.
    * DuckDB twin:
    * {{{ list_distinct(list_transform(range(1, len(toks) - n + 2),
    *       i -> array_to_string(toks[i:i+n-1], ' '))) }}}
    * Requires size(tokens) >= n (harness documents are all ≥ 20 tokens). */
  def shingles(n: Int = 3): String =
    s"array_distinct(transform(sequence(1, size($tokens) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice($tokens, i, $n))))"
}
