package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Registry-wide JOIN discipline: the structural form of the per-round
  * manual crossJoin/nested-loop audit. For every gate query's optimized
  * logical plan, each join must be (a) an equi-join — hash/merge
  * joinable, never a product — or (b) a product with a side SMALL BY
  * CONSTRUCTION (a limit, a grouping-free aggregate — ≤1 row — a small
  * LocalRelation/Range, or compositions thereof), or (c) a product that
  * DECLARES its broadcast side (`broadcast()` hint in Join.hint). (c)
  * covers data-tiny sides no structural rule can prove (1-row query
  * vectors, centroid tables, truth kernels' bounded probe sets): the
  * checkable discipline is that every product NAMES the side it intends
  * to broadcast — an accidental product with no declared small side
  * fails.
  *
  * Holds with ZERO allowlisted exceptions across the whole registry —
  * even the deliberate brute-force truth kernels declare their broadcast
  * probe side. Any future exception must be argued here by name. */
class RegistryJoinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val allow: Set[String] = Set.empty

  /** ≤ bounded rows by plan construction: limits, scalar aggregates,
    * literal relations, small ranges, and compositions of those.
    * Only GlobalLimit counts as a bound (ADVICE r8): a bare LocalLimit
    * caps rows PER PARTITION, so its total is n × partitions — an
    * effectively unbounded 'small' side. (LocalLimit directly under a
    * GlobalLimit is covered by the GlobalLimit case recursing.) */
  private def smallByConstruction(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit => true
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

  /** A side the plan DECLARES broadcast (the `broadcast()` hint survives
    * into Join.hint). Tininess of e.g. a 1-row query-vector filter or an
    * 8-row centroid aggregate is data knowledge no structural rule can
    * prove — but the discipline "every product must NAME its broadcast
    * side" is checkable, and an accidental product with no declared
    * small side fails here. */
  private def declaresBroadcast(j: Join): Boolean = {
    def bc(h: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo]) =
      h.exists(_.strategy.contains(
        org.apache.spark.sql.catalyst.plans.logical.BROADCAST))
    bc(j.hint.leftHint) || bc(j.hint.rightHint)
  }

  test("all registry queries: every non-equi join either bounds a side " +
    "structurally or declares its broadcast side — zero exceptions") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!allow(name)) {
        val joins = fn(spark, sf).queryExecution.optimizedPlan.collect {
          case j: Join => j
        }
        joins.foreach { j =>
          val ok = hasEquiKeys(j) || declaresBroadcast(j) ||
            smallByConstruction(j.left) || smallByConstruction(j.right)
          if (!ok)
            failures += s"$name: non-equi join, no bounded or declared-" +
              s"broadcast side:\n  ${j.joinType} cond=${j.condition}"
        }
        spark.catalog.clearCache()
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} undisciplined non-equi joins:\n${failures.mkString("\n")}")
  }
}
