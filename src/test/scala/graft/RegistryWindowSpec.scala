package graft

/** Registry-wide structural invariant: EVERY gate query's optimized plan
  * has only keyed-or-bounded windows (`assertWindowsKeyedOrBounded` — no
  * unpartitioned corpus-scale row_number/rank/cumsum anywhere). Rounds
  * 4-7 enforced this per-operator (Similarity2Spec, PretrainPlanSpec,
  * DriftSpec); this sweep makes it a property no FUTURE operator can
  * regress: a new query lands in SparkEntry.queries and is checked here
  * by construction.
  *
  * Allowlist: q121_equidepth_hist — the repo's ONE documented exact
  * unpartitioned-window exception (the exact reference that validates the
  * KLL sketch path; DriftSpec pins its plan and the Scaladoc carries the
  * scale argument). Any other exception must be argued here by name. */
class RegistryWindowSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val allow = Set("q121_equidepth_hist")

  test("all registry queries: every window keyed or limit-bounded " +
    "(q121 the sole allowlisted exception)") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!allow(name)) {
        try assertWindowsKeyedOrBounded(fn(spark, sf))
        catch {
          case e: org.scalatest.exceptions.TestFailedException =>
            failures += s"$name: ${e.getMessage}"
        }
        spark.catalog.clearCache()
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries with unkeyed unbounded windows:\n" +
        failures.mkString("\n"))
  }
}
