package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Silver-layer cleanse/conform kernel — pure `DataFrame => DataFrame`
  * functions, one per bronze input, plus the consolidation joins/union.
  *
  * Re-expresses the reference's silver layer
  * (/root/reference/pipelineApplication/silverLayer/BuildSilverLayer.py:139-327) as
  * side-effect-free transforms: every function takes the bronze frame and
  * returns the conformed columns, so each is unit-testable with in-memory
  * rows and composable under one lazy Catalyst plan (the whole silver build
  * is a single job with one action at the write).
  *
  * Scale notes:
  *  - All transforms are built-in Catalyst expressions (when/rlike/to_date/
  *    initcap/upper/lower/element_at) → whole-stage codegen, full predicate
  *    pushdown through the projections. The reference's one Python UDF (state
  *    lookup) is replaced by `element_at(typedLit(...))` per SURVEY.md §4.3.
  *  - The institutions⟕financials join key (`charter_number`) is also the
  *    dedup key prefix, so Catalyst reuses one shuffle for join + distinct.
  *  - `dropDuplicates()`/`na.drop()` placement matches the reference exactly
  *    (BuildSilverLayer.py:292,307) so row sets agree (SURVEY.md §7.3.6).
  */
object Silver {

  /** Regex gate + parse: the reference's date-validation idiom (F4,
    * BuildSilverLayer.py:154-159 etc.) — `when` without `otherwise` yields
    * NULL on regex mismatch, and the later `na.drop` quarantines the row. */
  private def gatedDate(c: String, pattern: String, fmt: String) =
    when(col(c).rlike(pattern), to_date(col(c), fmt))

  /** Render to the silver interchange string form `yyyy-MM-dd` (the
    * reference keeps silver dates as strings until the final cast,
    * BuildSilverLayer.py:290,305). */
  private def quarterDateString(c: String, pattern: String, fmt: String) =
    date_format(gatedDate(c, pattern, fmt), "yyyy-MM-dd")

  /** FDIC institutions (BuildSilverLayer.py:139-164): keep ACTIVE==1, type
    * the charter key, canonicalize city/name/state casing, impute website. */
  def cleanseBankInstitutions(df: DataFrame): DataFrame =
    df.filter(col("ACTIVE") === "1")
      .withColumn("charter_number", col("CERT").cast(IntegerType))
      .withColumn("city", initcap(col("CITY")))
      .withColumn("name", upper(col("NAME")))
      .withColumn("quarter_date",
        quarterDateString("REPDTE", """^\d{1,2}/\d{1,2}/\d{4}$""", "M/d/yyyy"))
      .withColumn("state", initcap(col("STNAME")))
      .withColumn("website", lower(col("WEBADDR")))
      .na.fill("Not Provided", Seq("website"))
      .na.replace("website", Map("" -> "Not Provided"))
      .select("charter_number", "city", "name", "quarter_date", "state", "website")

  /** FDIC financials (BuildSilverLayer.py:167-192): type the measures, gate
    * the compact `yyyyMMdd` date form (different from institutions). */
  def cleanseBankFinancials(df: DataFrame): DataFrame =
    df.withColumn("charter_number", col("CERT").cast(IntegerType))
      .withColumn("assets_total", col("ASSET").cast(LongType))
      .withColumn("deposits_total", col("DEP").cast(LongType))
      .withColumn("quarter_date",
        quarterDateString("REPDTE", """^\d{8}$""", "yyyyMMdd"))
      .select("charter_number", "assets_total", "deposits_total", "quarter_date")

  private val cycleDatePattern = """^\d{1,2}/\d{1,2}/\d{4} 0:00:00$"""
  private val cycleDateFmt = "M/dd/yyyy H:mm:ss"

  /** NCUA FOICU (BuildSilverLayer.py:195-218): identity/location columns.
    * State abbreviation → full name via a foldable literal map — the
    * Catalyst-native replacement for the reference's broadcast-dict UDF. */
  def cleanseFoicu(df: DataFrame): DataFrame =
    df.withColumnRenamed("CU_NUMBER", "charter_number")
      .withColumn("name", upper(col("CU_NAME")))
      .withColumn("city", initcap(col("CITY")))
      .withColumn("state", element_at(typedLit(StateMap.abbrevToName), col("STATE")))
      .withColumn("quarter_date",
        quarterDateString("CYCLE_DATE", cycleDatePattern, cycleDateFmt))
      .select("charter_number", "name", "city", "state", "quarter_date")

  /** NCUA FS220 (BuildSilverLayer.py:221-243): the balance-sheet measures.
    * `ACCT_671` is poisoned upstream and must be dropped at the read edge
    * (BuildSilverLayer.py:126) — handled in [[Bronze.readFs220]]. */
  def cleanseFs220(df: DataFrame): DataFrame =
    df.withColumnRenamed("CU_NUMBER", "charter_number")
      .withColumn("assets_total", col("ACCT_010").cast(LongType))
      .withColumn("deposits_total", col("ACCT_018").cast(LongType))
      .withColumn("quarter_date",
        quarterDateString("CYCLE_DATE", cycleDatePattern, cycleDateFmt))
      .select("charter_number", "assets_total", "deposits_total", "quarter_date")

  /** NCUA FS220D (BuildSilverLayer.py:246-268): website with the same
    * null/empty imputation as banks. `Acct_891` is mixed-case — the session
    * must run `spark.sql.caseSensitive=true` (SURVEY.md §1.3). */
  def cleanseFs220d(df: DataFrame): DataFrame =
    df.withColumnRenamed("CU_NUMBER", "charter_number")
      .withColumn("website", lower(col("Acct_891")))
      .na.fill("Not Provided", Seq("website"))
      .na.replace("website", Map("" -> "Not Provided"))
      .withColumn("quarter_date",
        quarterDateString("CYCLE_DATE", cycleDatePattern, cycleDateFmt))
      .select("charter_number", "website", "quarter_date")

  /** Banks: institutions ⟕ financials on the charter key (J1,
    * BuildSilverLayer.py:287-292). 1:N — each institution row picks up every
    * quarterly financial row; institution attrs are quarter-invariant. */
  def bankData(inst: DataFrame, fin: DataFrame): DataFrame =
    inst.drop("quarter_date")
      .join(fin, Seq("charter_number"), "left")
      .withColumn("institution_type", lit("bank"))
      .withColumn("quarter_date", col("quarter_date").cast("date"))
      .dropDuplicates()
      .na.drop()

  /** Credit unions: FOICU ⟕ FS220D ⟕ FS220 on the composite
    * (charter_number, quarter_date) key (J2, BuildSilverLayer.py:302-307). */
  def creditUnionData(foicu: DataFrame, fs220d: DataFrame, fs220: DataFrame): DataFrame =
    foicu.join(fs220d, Seq("charter_number", "quarter_date"), "left")
      .join(fs220, Seq("charter_number", "quarter_date"), "left")
      .withColumn("institution_type", lit("credit union"))
      .withColumn("quarter_date", col("quarter_date").cast("date"))
      .dropDuplicates()
      .na.drop()

  /** Unified silver: banks ∪ credit unions by NAME (U1 — the two sides
    * derive columns in different orders, positional union would mis-assign;
    * BuildSilverLayer.py:312-327), then cluster by locality for the write.
    *
    * Two of the reference's shuffles are provably dead work and dropped:
    *  - the global sort before repartition (the repartition destroys it,
    *    SURVEY.md §2.14.7);
    *  - the distinct-after-union (BuildSilverLayer.py:325): both inputs are
    *    already deduplicated by [[bankData]]/[[creditUnionData]], and the
    *    sides are row-disjoint by construction (each carries a different
    *    `institution_type` literal), so distinct(union(A, B)) = union(A, B)
    *    — at 100 TB that is a full-width shuffle of the entire silver table
    *    for nothing. Callers composing `unified` from frames that are NOT
    *    per-side deduplicated must dedup first.
    *
    * `numPartitions` is the write fan-out: 100 in the reference
    * (BuildSilverLayer.py:326); at 100 TB size it so each output file lands
    * near the parquet sweet spot (~128-512 MB). */
  def unified(bank: DataFrame, cu: DataFrame, numPartitions: Int = 100): DataFrame =
    conformed(bank, cu).repartition(numPartitions, col("state"), col("city"))

  /** The conformed silver rows WITHOUT the write-layout repartition — what a
    * gold consumer observes after reading silver back from storage: parquet
    * file splits carry no hash-partitioning guarantee, so downstream plans
    * must not rely on (and should not pay for) the write fan-out. In-plan
    * consumers (the gold gate queries) compose from here; only the actual
    * silver WRITE applies [[unified]]'s locality repartition. */
  def conformed(bank: DataFrame, cu: DataFrame): DataFrame =
    bank.select(Schemas.silver.fieldNames.map(col).toSeq: _*)
      .unionByName(cu.select(Schemas.silver.fieldNames.map(col).toSeq: _*))
}
