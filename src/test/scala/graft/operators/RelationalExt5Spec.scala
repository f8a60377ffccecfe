package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spark 4 SQL-surface features: VARIANT typed extraction and native
  * recursive CTEs (values cross-checked against DuckDB by the gate; these
  * tests pin the semantics that the oracle compare can't express). */
class RelationalExt5Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("variant: typed path extraction matches the classic get_json_object " +
    "path, and a missing path is null for every row") {
    val out = RelationalExt5.q209VariantJson(spark, dir).cache()
    // every event's props lacks '$.missing' → n_missing_path == n per row
    assert(out.filter(col("n_missing_path") =!= col("n")).count() == 0)
    // bucket counts partition the events table
    val ev = graft.Tables.events(spark, dir)
    assert(out.agg(sum("n")).head().getLong(0) == ev.count())
    // the variant-extracted sum equals the classic schema-on-read sum
    val classic = ev.selectExpr(
        "event_type", "CAST(get_json_object(props, '$.k') AS INT) AS k")
      .groupBy("event_type").agg(sum("k").as("sk"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byType = out.groupBy("event_type").agg(sum("sum_k").as("sk"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == classic)
    out.unpersist()
  }

  test("recursive cte: depth-0 is the seed alone with one walk, depths stay " +
    "within the bound, and depth-1 nodes are exactly the seed's neighbors") {
    val out = RelationalExt5.q210RecursiveCte(spark, dir).cache()
    val d0 = out.filter(col("depth") === 0).collect()
    // exactly one node sits at depth 0 (the anchor); its walk count also
    // includes depth-2 cycle RETURNS (0→x→0) — that multiplicity surviving
    // the cross-engine compare is what makes this a recursion test
    assert(d0.length == 1 && d0.head.getLong(2) >= 1L)
    val seed = d0.head.getLong(0)
    assert(out.filter(col("depth") < 0 || col("depth") > 3).count() == 0)
    // independent neighbor derivation from the same edge definition
    val hi = graft.Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 40)
      .select("l_orderkey", "l_partkey").distinct()
    val e = hi.as("a").join(hi.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val nbrs = e.filter(col("u") === seed).select(col("v").as("n"))
      .unionByName(e.filter(col("v") === seed).select(col("u").as("n")))
      .collect().map(_.getLong(0)).toSet
    val gotD1 = out.filter(col("depth") === 1).collect().map(_.getLong(0)).toSet
    assert(gotD1 == nbrs -- Set(seed))
    out.unpersist()
  }
}
