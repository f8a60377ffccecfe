package graft.pipeline

import org.apache.spark.sql.types._

/** Declared schemas for the banking-domain medallion pipeline.
  *
  * Mirrors the reference's explicit bronze read contracts
  * (/root/reference/pipelineApplication/silverLayer/BuildSilverLayer.py:62-78) and the
  * conformed 9-column silver/gold contract
  * (/root/reference/pipelineApplication/goldLayer/BuildGoldLayer.py:52-62).
  * Declaring schemas on read (instead of inferring) skips the inference scan
  * and gives Catalyst exact column types for pushdown — at 100 TB an
  * inference pass over bronze would itself be a full scan.
  */
object Schemas {

  /** FDIC institutions as staged in bronze — everything lands as string
    * (the API returns JSON strings; typing happens in the silver cleanse). */
  val bankInstitutions: StructType = StructType(Seq(
    StructField("ACTIVE", StringType, nullable = true),
    StructField("CERT", StringType, nullable = true),
    StructField("CITY", StringType, nullable = true),
    StructField("ID", StringType, nullable = true),
    StructField("NAME", StringType, nullable = true),
    StructField("REPDTE", StringType, nullable = true),
    StructField("STNAME", StringType, nullable = true),
    StructField("WEBADDR", StringType, nullable = true)))

  /** FDIC financials as staged in bronze. */
  val bankFinancials: StructType = StructType(Seq(
    StructField("ASSET", StringType, nullable = true),
    StructField("CERT", StringType, nullable = true),
    StructField("DEP", StringType, nullable = true),
    StructField("ID", StringType, nullable = true),
    StructField("REPDTE", StringType, nullable = true)))

  /** Conformed silver/gold contract: one row per institution × quarter. */
  val silver: StructType = StructType(Seq(
    StructField("charter_number", IntegerType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("quarter_date", DateType, nullable = false),
    StructField("state", StringType, nullable = false),
    StructField("website", StringType, nullable = false),
    StructField("assets_total", LongType, nullable = false),
    StructField("deposits_total", LongType, nullable = false),
    StructField("institution_type", StringType, nullable = false)))

  /** JSON field order of the staged FDIC institutions payload (the
    * `json_tuple` flatten lists fields positionally). */
  val bankInstitutionFields: Seq[String] =
    Seq("ACTIVE", "CERT", "CITY", "ID", "NAME", "REPDTE", "STNAME", "WEBADDR")

  val bankFinancialFields: Seq[String] =
    Seq("ASSET", "CERT", "DEP", "ID", "REPDTE")
}
