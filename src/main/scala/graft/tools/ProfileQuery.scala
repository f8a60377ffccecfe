package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query profiler — the dev-loop companion to [[graft.Bench]]: runs
  * one registered gate query hot (3 warm + 5 timed) and prints min/median
  * wall time plus the job/stage counts that decide whether a measurement
  * is data-bound or scheduling floor (the r11/r12 q110/q128 method:
  * count the jobs before touching the plan).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.ProfileQuery q110_column_profile [more...]"`
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <queryName> [queryName ...]")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("profile_query").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val sc = s.sparkContext
    args.foreach { name =>
      val q = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      def run(): Unit = {
        q(s, dir).collect()
        s.sharedState.cacheManager.clearCache()
      }
      (1 to 3).foreach(_ => run())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      sc.setJobGroup(name, name)
      run()
      sc.clearJobGroup()
      val jobs = sc.statusTracker.getJobIdsForGroup(name)
      val stages = jobs.flatMap(id =>
        sc.statusTracker.getJobInfo(id).map(_.stageIds().length)).sum
      println(f"[profile] $name%-34s min=${ts.min}%.3f " +
        f"med=${ts.sorted.apply(2)}%.3f jobs=${jobs.length} stages=$stages")
    }
    s.stop()
  }
}
