package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Registry-wide JOIN discipline: the structural form of the per-round
  * manual crossJoin/nested-loop audit. For every gate query's optimized
  * logical plan, each join must be either (a) an equi-join — hash/merge
  * joinable, never a product — or (b) a product with at least one side
  * SMALL BY CONSTRUCTION (a limit, a grouping-free aggregate — ≤1 row —
  * a small LocalRelation/Range, or compositions thereof). That is the
  * repo's broadcast-tiny-side contract: products are fine exactly when
  * one side is provably metadata-sized in the PLAN, not just in intent.
  *
  * Allowlist: the deliberate brute-force ground-truth kernels (exact
  * all-pairs the ANN/recall/near-dup evals compare against) — each is
  * the documented truth side of an approximate operator's evaluation,
  * corpus² by DESIGN. Any other exception must be argued here by name. */
class RegistryJoinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val allow: Set[String] = Set(
    // exact all-pairs truth kernels (each feeds a recall/calibration gate)
    "s38_ann_brute", "s46_ann_brute_native", "s48_ann_topk_plan",
    "d33_dedup_embedding", "d155_semdedup")

  /** ≤ bounded rows by plan construction: limits, scalar aggregates,
    * literal relations, small ranges, and compositions of those. */
  private def smallByConstruction(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case l: LocalRelation => l.data.lengthCompare(4096) <= 0
    case _: OneRowRelation => true
    case r: Range => r.numElements.isValidLong && r.numElements.toLong <= 4096L
    case _ if p.children.isEmpty => false
    case _ => p.children.forall(smallByConstruction)
  }

  /** An equi-join: some conjunct equates attributes from both sides —
    * plannable as hash/sort-merge, never a product. */
  private def hasEquiKeys(j: Join): Boolean = j.condition.exists { cond =>
    import org.apache.spark.sql.catalyst.expressions._
    def splitConjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
      case other     => Seq(other)
    }
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    splitConjuncts(cond).exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(leftOut) && b.references.subsetOf(rightOut)) ||
          (a.references.subsetOf(rightOut) && b.references.subsetOf(leftOut))
      case EqualNullSafe(a, b) =>
        (a.references.subsetOf(leftOut) && b.references.subsetOf(rightOut)) ||
          (a.references.subsetOf(rightOut) && b.references.subsetOf(leftOut))
      case _ => false
    }
  }

  test("all registry queries: every non-equi join has a side that is " +
    "small by construction (brute-force truth kernels allowlisted)") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!allow(name)) {
        val joins = fn(spark, sf).queryExecution.optimizedPlan.collect {
          case j: Join => j
        }
        joins.foreach { j =>
          val ok = hasEquiKeys(j) ||
            smallByConstruction(j.left) || smallByConstruction(j.right)
          if (!ok)
            failures += s"$name: non-equi join, neither side bounded:\n" +
              s"  ${j.joinType} cond=${j.condition}"
        }
        spark.catalog.clearCache()
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} unbounded non-equi joins:\n${failures.mkString("\n")}")
  }
}
