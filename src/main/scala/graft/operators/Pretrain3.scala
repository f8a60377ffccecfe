package graft.operators

import graft.Tables
import graft.functions.PortableHash._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pretraining-corpus curation, sixth batch: the BPE merge LOOP (t157 ran
  * one pair count; t164 learns an ordered rule list) and bigram language-
  * model scoring with stupid backoff (t146's unigram signal upgraded to
  * the context-aware form CCNet-style filters actually deploy).
  *
  * Determinism discipline unchanged: integer-exact counts, quantized
  * log-probs accumulated in DECIMAL, rank ties broken lexicographically.
  */
object Pretrain3 {

  // ---------------------------------------------------------------- t164

  /** t164: BPE merge-rule learning, 3 rounds — the Sennrich et al. 2016
    * training loop: represent each vocabulary word as a space-joined symbol
    * sequence, count adjacent symbol pairs weighted by word frequency, fuse
    * the most frequent pair (ties: lexicographically smaller), re-count,
    * repeat. Output: the ordered rule list (round, pair, n) — the artifact
    * a tokenizer ships.
    *
    * Scale shape: the corpus collapses to the VOCABULARY before the loop
    * (word → count, one map-side-combined shuffle; Heaps' law keeps the
    * vocab sub-linear in corpus size), so each round's pair count runs
    * over distinct words only. The argmax is a 1-row aggregate CROSS-JOINED
    * back (broadcast of one row — no driver collect, the whole loop is one
    * lazy plan). Merge application is a single string replace per word:
    * symbols are space-joined, so fusing pair "a b" is replace(" a b " →
    * " ab ") on the padded sequence.
    *
    * SEMANTICS, precisely: replace scans the ORIGINAL string left-to-right
    * substituting non-overlapping occurrences of the PADDED pattern —
    * identical in the JVM and DuckDB, which is what the gate pins. Because
    * adjacent occurrences share a delimiter space, ABUTTING repeats of the
    * pair ("a b a b") merge alternately within one round rather than
    * exhaustively as strict leftmost-greedy BPE would; the skipped
    * occurrence surfaces as a pair again next round. A deterministic,
    * monotone merge variant — not a bit-exact clone of the reference
    * tokenizer's inner scan. Rounds are a fixed unroll (tokenizer training
    * fixes the merge budget up front); the vocab persists so round k does
    * not recompute rounds 1..k-1. */
  def t164BpeMerges(s: SparkSession, dir: String): DataFrame = {
    val vocab0 = Tables.documents(s, dir)
      .selectExpr(s"explode($tokens) AS w")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .selectExpr("concat_ws(' ', split(w, '')) AS seq", "cnt")
      .persist(StorageLevel.MEMORY_AND_DISK)

    def pairCounts(vocab: DataFrame): DataFrame = vocab
      // guard single-symbol words: sequence(1, 0) would DESCEND (the q136
      // lesson) and element_at(a, 0) throws under ANSI
      .filter("size(split(seq, ' ')) >= 2")
      .selectExpr("cnt",
        """explode(transform(sequence(1, size(split(seq, ' ')) - 1), i ->
          |  concat(element_at(split(seq, ' '), i), ' ',
          |         element_at(split(seq, ' '), i + 1)))) AS pair""".stripMargin)
      .groupBy("pair").agg(sum(col("cnt")).as("n"))

    def best(pc: DataFrame): DataFrame = pc
      .agg(min(struct((-col("n")).as("negn"), col("pair").as("pair"))).as("b"))
      .selectExpr("b.pair AS pair", "-b.negn AS n")

    def applyMerge(vocab: DataFrame, b: DataFrame): DataFrame = vocab
      .crossJoin(broadcast(b))
      .selectExpr(
        """trim(replace(concat(' ', seq, ' '), concat(' ', pair, ' '),
          |  concat(' ', replace(pair, ' ', ''), ' '))) AS seq""".stripMargin,
        "cnt")

    val b1 = best(pairCounts(vocab0))
    val v1 = applyMerge(vocab0, b1).persist(StorageLevel.MEMORY_AND_DISK)
    val b2 = best(pairCounts(v1))
    val v2 = applyMerge(v1, b2).persist(StorageLevel.MEMORY_AND_DISK)
    val b3 = best(pairCounts(v2))
    b1.selectExpr("1 AS round", "pair", "n")
      .unionByName(b2.selectExpr("2 AS round", "pair", "n"))
      .unionByName(b3.selectExpr("3 AS round", "pair", "n"))
      .orderBy("round")
  }

  val t164Sql: String = {
    def pairs(v: String) =
      s"""SELECT pair, CAST(sum(cnt) AS BIGINT) AS n FROM (
         |  SELECT cnt, unnest(list_transform(
         |    range(1, len(string_split(seq, ' '))),
         |    i -> (string_split(seq, ' '))[i] || ' ' ||
         |         (string_split(seq, ' '))[i + 1])) AS pair
         |  FROM $v)
         |GROUP BY pair""".stripMargin
    def best(p: String) =
      s"SELECT pair, n FROM $p ORDER BY n DESC, pair LIMIT 1"
    def apply(v: String, b: String) =
      s"""SELECT trim(replace(' ' || seq || ' ', ' ' || $b.pair || ' ',
         |  ' ' || replace($b.pair, ' ', '') || ' ')) AS seq, cnt
         |FROM $v, $b""".stripMargin
    s"""WITH v0 AS (
       |  SELECT array_to_string(string_split(w, ''), ' ') AS seq,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
       |        FROM documents)
       |  GROUP BY 1),
       |p1 AS (${pairs("v0")}),
       |b1 AS (${best("p1")}),
       |v1 AS (${apply("v0", "b1")}),
       |p2 AS (${pairs("v1")}),
       |b2 AS (${best("p2")}),
       |v2 AS (${apply("v1", "b2")}),
       |p3 AS (${pairs("v2")}),
       |b3 AS (${best("p3")})
       |SELECT 1 AS round, pair, n FROM b1
       |UNION ALL SELECT 2, pair, n FROM b2
       |UNION ALL SELECT 3, pair, n FROM b3
       |ORDER BY round""".stripMargin
  }

  // ---------------------------------------------------------------- t165

  /** t165: bigram LM scoring with stupid backoff (Brants et al. 2007) —
    * each document's NLL under the corpus's own bigram model: p(w|prev) =
    * c(prev,w)/c(prev) when the bigram was seen, else 0.4·c(w)/T; document
    * openers score under the unigram. The context-aware upgrade of t146's
    * quality signal: junk that happens to use frequent tokens in improbable
    * ORDER (boilerplate soup, shuffled scrapes) now scores high-NLL.
    *
    * Scale shape: token adjacency comes from a map-side array transform
    * (no window shuffle, no lag); the count tables are vocabulary- and
    * bigram-vocabulary-sized (Heaps-sublinear; broadcast here, bucket-join
    * by token at 100 TB — the t146 contract). Per-token log-probs quantize
    * to 6 decimals and accumulate as exact DECIMAL — order-independent,
    * engine-identical ([[graft.functions.OracleSafe]] convention; `ln` of
    * exact-integer-ratio doubles, the t146/q118 precedent). */
  def t165BigramNll(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", s"$tokens AS a")
      .selectExpr("doc_id",
        """explode(transform(sequence(1, size(a)), i ->
          |  struct(CASE WHEN i = 1 THEN NULL
          |           ELSE element_at(a, i - 1) END AS prev,
          |         element_at(a, i) AS tok))) AS e""".stripMargin)
      .selectExpr("doc_id", "e.prev AS prev", "e.tok AS tok")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("cu"))
    val tot = uni.agg(sum(col("cu")).as("total"))
    val bi = toks.filter(col("prev").isNotNull)
      .groupBy("prev", "tok").agg(count(lit(1)).as("cb"))
    // r15-opt (guide §4, the t156 form): all three CASE arms are functions
    // of MODEL rows — precompute the unigram arm and the backoff arm once
    // per vocab entry and the bigram arm once per seen (prev, tok), so the
    // ln + round + decimal-casts leave the corpus token stream and one
    // broadcast join (the cprev lookup, now folded into the bigram table)
    // disappears. CASE selection order is unchanged, so values are
    // bit-identical; backed_off ⇔ the bigram-arm lp is absent.
    val uniLp = uni.crossJoin(tot)
      .selectExpr("tok",
        "CAST(round(ln(cu / CAST(total AS DOUBLE)), 6) AS DECIMAL(38,6))" +
          " AS lp_uni",
        "CAST(round(ln(0.4D * cu / CAST(total AS DOUBLE)), 6)" +
          " AS DECIMAL(38,6)) AS lp_back")
    val biLp = bi
      .join(uni.selectExpr("tok AS prev", "cu AS cprev"), Seq("prev"))
      .selectExpr("prev", "tok",
        "CAST(round(ln(cb / CAST(cprev AS DOUBLE)), 6) AS DECIMAL(38,6))" +
          " AS lp_bi")
    toks
      .join(broadcast(uniLp), Seq("tok"))
      .join(broadcast(biLp), Seq("prev", "tok"), "left")
      .selectExpr("doc_id",
        """CASE WHEN prev IS NULL THEN lp_uni
          |  WHEN lp_bi IS NOT NULL THEN lp_bi
          |  ELSE lp_back END AS lp""".stripMargin,
        "CAST(lp_bi IS NULL AND prev IS NOT NULL AS INT) AS backed_off")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("backed_off")).as("n_backoff"),
        sum(col("lp")).as("slp"))
      .selectExpr("doc_id", "n_tokens", "n_backoff",
        "round(-CAST(slp AS DOUBLE) / n_tokens, 6) AS avg_nll")
      .orderBy("doc_id")
  }

  val t165Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CASE WHEN i = 1 THEN NULL ELSE a[i - 1] END AS prev,
      |    a[i] AS tok
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS a
      |        FROM documents),
      |    unnest(generate_series(1, len(a))) AS t(i)),
      |uni AS (SELECT tok, count(*) AS cu FROM toks GROUP BY tok),
      |tot AS (SELECT sum(cu) AS total FROM uni),
      |bi AS (SELECT prev, tok, count(*) AS cb FROM toks
      |       WHERE prev IS NOT NULL GROUP BY prev, tok),
      |lp AS (
      |  SELECT doc_id,
      |    CAST(round(CASE
      |      WHEN t.prev IS NULL THEN ln(u.cu / CAST(total AS DOUBLE))
      |      WHEN b.cb IS NOT NULL THEN ln(b.cb / CAST(p.cu AS DOUBLE))
      |      ELSE ln(0.4 * u.cu / CAST(total AS DOUBLE)) END, 6)
      |    AS DECIMAL(38,6)) AS lp,
      |    CAST(b.cb IS NULL AND t.prev IS NOT NULL AS INTEGER) AS backed_off
      |  FROM toks t
      |  JOIN uni u ON u.tok = t.tok
      |  LEFT JOIN uni p ON p.tok = t.prev
      |  LEFT JOIN bi b ON b.prev = t.prev AND b.tok = t.tok
      |  CROSS JOIN tot)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(backed_off) AS BIGINT) AS n_backoff,
      |  round(-CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_nll
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q167

  /** q167: temperature-scaled language mixing (α = 0.5) — the multilingual
    * pretraining sampler (XLM-R / mBERT convention): languages are sampled
    * proportional to (n_l/N)^α, flattening the natural distribution so
    * low-resource languages aren't starved. Output per language: token
    * volume, natural share, temperature share, and the per-doc sampling
    * rate that realizes the temperature share at constant total volume
    * (rate > 1 = upsample/repeat, the standard low-resource treatment).
    *
    * α is pinned at 0.5 because sqrt is IEEE-754 correctly rounded in
    * every engine — pow(x, 0.3) is libm-dependent and could flip a hash by
    * an ulp. The sqrt weights quantize to scaled longs BEFORE the
    * cross-language sum, so shares are exact-integer quotients.
    *
    * Scale shape: one map-side-combined aggregate to |languages| rows;
    * everything after is arithmetic on a handful of group rows. */
  def q167TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(s, dir)
      .selectExpr("lang", s"size($tokens) AS nt")
      .groupBy("lang").agg(sum(col("nt")).as("n_tok"))
      .withColumn("qw",
        floor(sqrt(col("n_tok").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long"))
    val tot = perLang.agg(sum(col("n_tok")).as("n_total"),
      sum(col("qw")).as("qw_total"))
    perLang.crossJoin(broadcast(tot))
      .selectExpr("lang", "n_tok",
        "round(n_tok / CAST(n_total AS DOUBLE), 6) AS nat_share",
        "round(qw / CAST(qw_total AS DOUBLE), 6) AS temp_share",
        "round(CAST(qw AS DOUBLE) * n_total / qw_total / n_tok, 6) AS rate")
      .orderBy("lang")
  }

  val q167Sql: String =
    """WITH pl AS (
      |  SELECT lang, CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
      |    AS n_tok
      |  FROM documents GROUP BY lang),
      |q AS (
      |  SELECT lang, n_tok,
      |    CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
      |      AS qw
      |  FROM pl),
      |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n_total,
      |               CAST(sum(qw) AS BIGINT) AS qw_total FROM q)
      |SELECT lang, n_tok,
      |  round(n_tok / CAST(n_total AS DOUBLE), 6) AS nat_share,
      |  round(qw / CAST(qw_total AS DOUBLE), 6) AS temp_share,
      |  round(CAST(qw AS DOUBLE) * n_total / qw_total / n_tok, 6) AS rate
      |FROM q CROSS JOIN tot ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q168

  /** q168: positional phrase search — the inverted-index-with-positions
    * join every search engine runs for quoted queries: postings(term →
    * doc, position), phrase hit where the two terms' postings align at
    * adjacent positions. The phrase operand is data-derived (the corpus's
    * most frequent adjacent pair, t164's round-1 argmax over TOKENS — the
    * self-referential probe convention of s38/t92). Output: per-doc match
    * counts for matching docs.
    *
    * Scale shape: postings build map-side (array transform, no window);
    * the phrase join is an equi-join on (doc, position) between two
    * term-filtered postings lists — each side pre-filtered by its term, so
    * join input is posting-list-sized, not corpus-sized. A 100 TB corpus
    * shards this by term with the same plan. */
  def q168PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id", s"$tokens AS a")
      .selectExpr("doc_id",
        "posexplode(a) AS (pos, tok)")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // most frequent adjacent token pair = the phrase operand (1 row);
    // adjacency comes from t165's map-side array transform — the postings
    // self-join is reserved for the term-filtered phrase match below
    val phrase = Tables.documents(s, dir)
      .selectExpr(s"$tokens AS a")
      // single-token docs: sequence(1, 0) would DESCEND (the q136 lesson)
      .filter("size(a) >= 2")
      .selectExpr(
        """explode(transform(sequence(1, size(a) - 1), i ->
          |  struct(element_at(a, i) AS w1,
          |         element_at(a, i + 1) AS w2))) AS e""".stripMargin)
      .groupBy(col("e.w1").as("w1"), col("e.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .agg(min(struct((-col("n")).as("negn"), col("w1").as("w1"),
        col("w2").as("w2"))).as("b"))
      .selectExpr("b.w1 AS w1", "b.w2 AS w2")
    toks.crossJoin(broadcast(phrase))
      .filter(col("tok") === col("w1"))
      .selectExpr("doc_id", "pos + 1 AS nxt", "w2")
      .join(toks.selectExpr("doc_id", "pos AS nxt", "tok AS t2"),
        Seq("doc_id", "nxt"))
      .filter(col("t2") === col("w2"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_match"))
      .orderBy("doc_id")
  }

  val q168Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, i - 1 AS pos, a[i] AS tok
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS a
      |        FROM documents),
      |    unnest(generate_series(1, len(a))) AS t(i)),
      |pairs AS (
      |  SELECT t1.tok AS w1, t2.tok AS w2, count(*) AS n
      |  FROM toks t1 JOIN toks t2
      |    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
      |  GROUP BY 1, 2),
      |phrase AS (SELECT w1, w2 FROM pairs ORDER BY n DESC, w1, w2 LIMIT 1)
      |SELECT t1.doc_id, CAST(count(*) AS BIGINT) AS n_match
      |FROM toks t1 JOIN phrase p ON t1.tok = p.w1
      |JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
      |  AND t2.tok = p.w2
      |GROUP BY t1.doc_id ORDER BY t1.doc_id""".stripMargin

  // ---------------------------------------------------------------- t169

  /** t169: BPE encoding — apply t164's learned rule list, in training
    * order, to every document (train → apply, the full tokenizer round
    * trip). Each token's symbol sequence passes through the three merges
    * as broadcast single-replace maps; output per document: symbol count
    * after merging and how many fusions occurred (chars − symbols).
    *
    * Scale shape: three map-only projections over the corpus with a 1-row
    * broadcast each — no shuffle until the per-doc count; the rule list a
    * production encoder ships is longer but the dataflow is identical
    * (rules fold into one map-side automaton). */
  def t169BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val rules = t164BpeMerges(s, dir)
      .groupBy()
      .agg(expr("""transform(array_sort(collect_list(struct(round, pair))),
        |  e -> e.pair)""".stripMargin).as("rules"))
    val merged = Tables.documents(s, dir)
      .selectExpr("doc_id", s"explode($tokens) AS w")
      .selectExpr("doc_id", "concat_ws(' ', split(w, '')) AS seq")
      .crossJoin(broadcast(rules))
      .selectExpr("doc_id",
        """aggregate(rules, seq, (acc, r) ->
          |  trim(replace(concat(' ', acc, ' '), concat(' ', r, ' '),
          |    concat(' ', replace(r, ' ', ''), ' ')))) AS seq""".stripMargin)
    merged
      .selectExpr("doc_id", "size(split(seq, ' ')) AS n_sym",
        "length(replace(seq, ' ', '')) AS n_char")
      .groupBy("doc_id")
      .agg(sum(col("n_sym")).as("n_symbols"),
        sum(col("n_char") - col("n_sym")).as("n_fused"))
      .orderBy("doc_id")
  }

  val t169Sql: String =
    s"""WITH rulelist AS (
       |  SELECT list(pair ORDER BY round) AS rules FROM ($t164Sql)),
       |seqs AS (
       |  SELECT doc_id,
       |    array_to_string(string_split(w, ''), ' ') AS seq
       |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |        FROM documents)),
       |m AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(seq, rules), (acc, r) ->
       |      trim(replace(' ' || acc || ' ', ' ' || r || ' ',
       |        ' ' || replace(r, ' ', '') || ' '))) AS seq
       |  FROM seqs CROSS JOIN rulelist)
       |SELECT doc_id,
       |  CAST(sum(len(string_split(seq, ' '))) AS BIGINT) AS n_symbols,
       |  CAST(sum(length(replace(seq, ' ', ''))
       |         - len(string_split(seq, ' '))) AS BIGINT) AS n_fused
       |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t182

  /** Exact leftmost-greedy application of ONE merge rule `r` ("x y") to a
    * symbol array — the tokenizer-parity inner scan t169's padded-replace
    * variant approximates. A fold with a one-symbol carry: each element
    * either completes the pair (emit the fused symbol, clear the carry) or
    * flushes the carry and becomes the new one. One pass per rule is exact:
    * a merge can never create a new occurrence of the SAME rule (the fused
    * symbol is strictly longer than either component, so it can't equal x
    * or y), and rules applied in rank order can't resurrect earlier rules
    * (a rule's components predate every later rule's fused symbol).
    *
    * Exposed as a SQL-expression builder so [[t182BpeEncodeExact]] and the
    * abutting-repeat fixtures in Pretrain3Spec share the exact semantics. */
  private[operators] def exactMergeExpr(chars: String, rules: String): String =
    s"""aggregate($rules, $chars, (acc, r) ->
       |  aggregate(acc,
       |    named_struct('out', CAST(array() AS ARRAY<STRING>),
       |                 'carry', CAST(NULL AS STRING)),
       |    (st, t) -> CASE
       |      WHEN st.carry IS NULL
       |        THEN named_struct('out', st.out, 'carry', t)
       |      WHEN st.carry = element_at(split(r, ' '), 1)
       |        AND t = element_at(split(r, ' '), 2)
       |        THEN named_struct(
       |          'out', concat(st.out, array(replace(r, ' ', ''))),
       |          'carry', CAST(NULL AS STRING))
       |      ELSE named_struct(
       |        'out', concat(st.out, array(st.carry)), 'carry', t)
       |      END,
       |    st -> CASE WHEN st.carry IS NULL THEN st.out
       |          ELSE concat(st.out, array(st.carry)) END))""".stripMargin

  /** t182: BPE encoding with the EXACT leftmost-greedy inner scan — the
    * reference-tokenizer semantics (HF/SentencePiece merge application),
    * closing the t169 fidelity gap (SURVEY §9b.1): t169's padded
    * non-overlapping replace merges abutting repeats alternately ("a a a a"
    * under rule "a a" → [aa, a, a]); the exact scan merges greedily
    * ([aa, aa]). Output adds `chk`, an md5 over the full in-order token
    * stream per document, so the gate pins token IDENTITY AND ORDER, not
    * just counts — the two variants would collide on counts whenever no
    * 4+-repeat exists.
    *
    * Scale shape: the corpus collapses to the DISTINCT-WORD vocabulary
    * before the fold (Heaps' law keeps it sub-linear), each vocab word pays
    * the rules×symbols fold exactly once, and the encoded vocabulary joins
    * back to (doc, pos, word) — one vocab-keyed shuffle, the same
    * encode-once-join-back shape a production tokenizer pipeline runs. The
    * per-doc md5 re-assembles tokens in position order via one
    * array_sort(collect_list(struct(pos, toks))), bounded by doc length. */
  def t182BpeEncodeExact(s: SparkSession, dir: String): DataFrame = {
    val rules = t164BpeMerges(s, dir)
      .groupBy()
      .agg(expr("""transform(array_sort(collect_list(struct(round, pair))),
        |  e -> e.pair)""".stripMargin).as("rules"))
    val docWords = Tables.documents(s, dir)
      .selectExpr("doc_id", s"posexplode($tokens) AS (pos, w)")
    val encoded = docWords.select("w").distinct()
      .crossJoin(broadcast(rules))
      .selectExpr("w", s"${exactMergeExpr("split(w, '')", "rules")} AS toks")
    docWords.join(encoded, "w")
      .groupBy("doc_id")
      .agg(
        sum(size(col("toks"))).as("n_symbols"),
        sum(length(col("w")) - size(col("toks"))).as("n_fused"),
        expr("""md5(concat_ws(' ', flatten(transform(
          |  array_sort(collect_list(struct(pos, toks))),
          |  e -> e.toks))))""".stripMargin).as("chk"))
      .orderBy("doc_id")
  }

  /** DuckDB can't fold with a struct accumulator (`list_reduce` requires
    * accumulator type = element type), so the oracle simulates the exact
    * scan as a recursive CTE merging ONE leftmost occurrence per step over
    * the distinct-word vocabulary — equivalent to the carry fold because
    * same-rule merges never create earlier same-rule occurrences, so
    * repeated leftmost single merges visit occurrences left-to-right
    * exactly as the greedy pass does. */
  val t182Sql: String =
    s"""WITH RECURSIVE
       |rl AS (SELECT list(pair ORDER BY round) AS rules FROM ($t164Sql)),
       |words AS (
       |  SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents),
       |enc AS (
       |  SELECT w,
       |    ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS seq,
       |    1 AS ri
       |  FROM words
       |  UNION ALL
       |  SELECT w,
       |    CASE WHEN pos > 0
       |         THEN substr(seq, 1, pos - 1) || ' ' || fused || ' ' ||
       |              substr(seq, pos + length(pat))
       |         ELSE seq END,
       |    CASE WHEN pos > 0 THEN ri ELSE ri + 1 END
       |  FROM (
       |    SELECT w, seq, ri, pat, fused, strpos(seq, pat) AS pos
       |    FROM (
       |      SELECT e.w, e.seq, e.ri,
       |        ' ' || rules[e.ri] || ' ' AS pat,
       |        replace(rules[e.ri], ' ', '') AS fused
       |      FROM enc e, rl
       |      WHERE e.ri <= len(rules)))),
       |done AS (
       |  SELECT w, string_split(trim(seq), ' ') AS toks
       |  FROM enc, rl WHERE ri = len(rules) + 1),
       |dw AS (
       |  SELECT doc_id, i, a[i] AS w
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS a
       |        FROM documents),
       |    unnest(generate_series(1, len(a))) AS t(i))
       |SELECT doc_id,
       |  CAST(sum(len(toks)) AS BIGINT) AS n_symbols,
       |  CAST(sum(length(w) - len(toks)) AS BIGINT) AS n_fused,
       |  md5(string_agg(array_to_string(toks, ' '), ' ' ORDER BY i)) AS chk
       |FROM dw JOIN done USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- t180

  /** t180: tokenizer fertility report — per language, symbols-per-word
    * under the learned BPE vocabulary (t169's encoding): the metric
    * multilingual tokenizer papers report, and the fairness check a
    * shared-vocab deployment runs — a language with high fertility pays
    * more context window per word. Closes the tokenizer loop: t164
    * trains, t169 encodes, t180 evaluates.
    *
    * Scale shape: one |languages|-row aggregate over t169's per-doc
    * output joined to the doc dimension — group rows only; ratios are
    * exact-integer quotients. */
  def t180Fertility(s: SparkSession, dir: String): DataFrame = {
    val enc = t169BpeEncode(s, dir)
    val dim = Tables.documents(s, dir)
      .selectExpr("doc_id", "lang", s"size($tokens) AS n_words")
    enc.join(dim, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_symbols")).as("n_symbols"),
        sum(col("n_fused")).as("n_fused"))
      .selectExpr("lang", "n_docs", "n_words", "n_symbols", "n_fused",
        "round(n_symbols / CAST(n_words AS DOUBLE), 6) AS fertility",
        "round(n_fused / CAST(n_words AS DOUBLE), 6) AS fusions_per_word")
      .orderBy("lang")
  }

  val t180Sql: String =
    s"""WITH enc AS ($t169Sql),
       |dim AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_words
       |  FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_words) AS BIGINT) AS n_words,
       |  CAST(sum(n_symbols) AS BIGINT) AS n_symbols,
       |  CAST(sum(n_fused) AS BIGINT) AS n_fused,
       |  round(CAST(sum(n_symbols) AS BIGINT)
       |    / CAST(CAST(sum(n_words) AS BIGINT) AS DOUBLE), 6) AS fertility,
       |  round(CAST(sum(n_fused) AS BIGINT)
       |    / CAST(CAST(sum(n_words) AS BIGINT) AS DOUBLE), 6)
       |    AS fusions_per_word
       |FROM enc JOIN dim USING (doc_id)
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- maps

  /** t327: HEAPS-LAW vocabulary-growth fit — the scaling-law regression
    * every tokenizer/corpus-planning pass runs before committing to a
    * vocab size: distinct-vocabulary growth follows the power law
    * V(N) ≈ K·N^β (Heaps/Herdan), so a log-log least-squares fit over
    * ingest checkpoints forecasts how many distinct tokens a 100 TB crawl
    * will surface from the first slices — the same fit shape (log-log
    * OLS over cumulative-scale checkpoints) used for loss scaling laws.
    *
    * Checkpoints: docs bucketed by doc_id % 8 stand in for ingest order;
    * per step, cumulative type volume N_k (running sum of occurrences)
    * and cumulative type vocabulary V_k (each type attributed to its
    * FIRST step — min(step) per type — so V_k needs no re-distinct per
    * step). The TYPE is the 3-gram word shingle, not the bare token: the
    * synthetic corpus draws from a ~31-word pool, so token vocabulary
    * saturates in the first slice (β would be 0 and the fit vacuous),
    * while shingle types keep appearing corpus-long — and shingles are
    * the dedup unit this engine's n-gram stack (d30/d141) already speaks.
    * Fit: x=ln N, y=ln V quantized to micro-ln BIGINTs (the d171
    * round-then-lattice discipline for libm values), then closed-form
    * OLS over exact integer sums — slope/intercept are single double
    * divisions of identical integers in both engines.
    *
    * Scale shape: one shingle-occurrence aggregate, one min-per-type
    * aggregate (both map-side partial, shuffle keyed by shingle), an
    * 8-row window, and a 1-row fit broadcast back — nothing after the
    * two aggregates scales with the corpus. */
  def t327HeapsLaw(s: SparkSession, dir: String): DataFrame = {
    // volume axis WITHOUT the explode: occurrences per doc is just the
    // window count max(size−2, 0) — a map-side scalar per row, so the
    // corpus-wide token-volume pass ships one long per doc
    val tc = Tables.documents(s, dir)
      .selectExpr("doc_id % 8 AS step",
        s"greatest(size($tokens) - 2, 0) AS nw")
      .groupBy("step").agg(sum(col("nw")).cast("long").as("tc"))
    // type axis: per-doc DISTINCT shingles first (array_distinct inside
    // the row — a valid pre-reduction for min-step-per-type), THEN the
    // one explode this operator genuinely needs; seqAsc keeps
    // sub-3-token docs at zero windows
    val dst = s"array_distinct(transform(${seqAsc("1", s"size($tokens) - 2")}, " +
      s"i -> concat_ws(' ', slice($tokens, i, 3))))"
    val nv = Tables.documents(s, dir)
      .selectExpr("doc_id % 8 AS step", s"explode($dst) AS tok")
      .groupBy("tok").agg(min(col("step")).as("step"))
      .groupBy("step").agg(count(lit(1)).as("nv"))
    // 8-row cumulative frame as a TRIANGULAR SELF-JOIN, not a global
    // window: the frame is checkpoint-count-sized (8 rows at any SF), so
    // the ≤ 8×8 join is constant work — and it keeps the registry-wide
    // "no unpartitioned window over an unbounded input" invariant
    // STRUCTURAL (RegistryWindowSpec) instead of argued in a comment
    val byStep = tc.join(nv, Seq("step"), "left")
      .selectExpr("step", "tc", "coalesce(nv, 0L) AS nv")
    val steps = byStep.as("a")
      // declared broadcast side (RegistryJoinSpec's non-equi discipline):
      // the frame is 8 rows at any SF — checkpoint count, not corpus
      .join(broadcast(byStep.as("b")), col("b.step") <= col("a.step"))
      .groupBy(col("a.step").cast("int").as("step"))
      .agg(sum(col("b.tc")).cast("long").as("n_cum"),
        sum(col("b.nv")).cast("long").as("v_cum"))
      .selectExpr("step", "n_cum", "v_cum",
        "CAST(floor(ln(CAST(n_cum AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x",
        "CAST(floor(ln(CAST(v_cum AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y")
    val fit = steps.agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .selectExpr(
        "CAST(n * sxy - sx * sy AS DOUBLE) / " +
          "CAST(n * sxx - sx * sx AS DOUBLE) AS beta_raw",
        "n", "sx", "sy")
      .selectExpr(
        "CAST(floor(beta_raw * 1e6 + 0.5) AS BIGINT) AS beta6",
        """CAST(floor((CAST(sy AS DOUBLE) - beta_raw * CAST(sx AS DOUBLE))
          |  / n + 0.5) AS BIGINT) AS alpha6""".stripMargin)
    steps.crossJoin(broadcast(fit))
      .select("step", "n_cum", "v_cum", "beta6", "alpha6")
      .orderBy("step")
  }

  val t327Sql: String =
    """WITH tc AS (
      |  SELECT doc_id % 8 AS step,
      |    CAST(sum(greatest(len(string_split(lower(text), ' ')) - 2, 0))
      |      AS BIGINT) AS tc
      |  FROM documents GROUP BY 1),
      |st AS (
      |  SELECT doc_id % 8 AS step, unnest(list_distinct(list_transform(
      |    range(1, len(string_split(lower(text), ' ')) - 1),
      |    i -> array_to_string(string_split(lower(text), ' ')[i:i+2], ' '))))
      |    AS tok
      |  FROM documents),
      |nv AS (
      |  SELECT step, count(*) AS nv FROM (
      |    SELECT tok, min(step) AS step FROM st GROUP BY 1)
      |  GROUP BY 1),
      |bystep AS MATERIALIZED (
      |  SELECT step, tc, coalesce(nv, 0) AS nv
      |  FROM tc LEFT JOIN nv USING (step)),
      |steps AS (
      |  SELECT CAST(a.step AS INTEGER) AS step,
      |    CAST(sum(b.tc) AS BIGINT) AS n_cum,
      |    CAST(sum(b.nv) AS BIGINT) AS v_cum
      |  FROM bystep a JOIN bystep b ON b.step <= a.step
      |  GROUP BY 1),
      |xy AS (
      |  SELECT step, n_cum, v_cum,
      |    CAST(floor(ln(CAST(n_cum AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(v_cum AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
      |  FROM steps),
      |f AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx
      |  FROM xy),
      |b AS (
      |  SELECT CAST(n * sxy - sx * sy AS DOUBLE) /
      |      CAST(n * sxx - sx * sx AS DOUBLE) AS beta_raw, n, sx, sy
      |  FROM f)
      |SELECT CAST(xy.step AS INTEGER) AS step, xy.n_cum, xy.v_cum,
      |  CAST(floor(beta_raw * 1e6 + 0.5) AS BIGINT) AS beta6,
      |  CAST(floor((CAST(sy AS DOUBLE) - beta_raw * CAST(sx AS DOUBLE))
      |    / n + 0.5) AS BIGINT) AS alpha6
      |FROM xy CROSS JOIN b ORDER BY step""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t327_heaps_law"      -> t327HeapsLaw,
    "t164_bpe_merges"     -> t164BpeMerges,
    "t165_bigram_nll"     -> t165BigramNll,
    "q167_temperature_mix" -> q167TemperatureMix,
    "q168_phrase_search"  -> q168PhraseSearch,
    "t169_bpe_encode"     -> t169BpeEncode,
    "t180_fertility"      -> t180Fertility,
    "t182_bpe_exact"      -> t182BpeEncodeExact)

  val oracle: Map[String, String] = Map(
    "t327_heaps_law"      -> t327Sql,
    "t164_bpe_merges"     -> t164Sql,
    "t165_bigram_nll"     -> t165Sql,
    "q167_temperature_mix" -> q167Sql,
    "q168_phrase_search"  -> q168Sql,
    "t169_bpe_encode"     -> t169Sql,
    "t180_fertility"      -> t180Sql,
    "t182_bpe_exact"      -> t182Sql)
}
