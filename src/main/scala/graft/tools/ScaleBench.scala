package graft.tools

import org.apache.spark.sql.SparkSession

/** Time the dedup/ANN family + the iterative-graph quartet on a
  * [[ScaleCorpus]]-generated corpus — the measurement half of
  * SCALING.md (VERDICT r14 directive 1). NOT part of the gate.
  *
  * Same session shape as [[graft.Bench]] (local[cpus], cpu-count
  * shuffle partitions, AQE on), same discipline: one untimed warm-up
  * pass (JIT + persisted layout builds), then min-of-N timed reps, with
  * per-query job/stage counts so a floor model can be applied when
  * reading exponents off small scales.
  *
  * Usage: runMain graft.tools.ScaleBench <corpusDir> [queriesCsv] [reps]
  *   [shufflePartitions]
  * Prints one JSON line {"dir":…,"queries":{name:sec},"jobs":{…},
  * "stages":{…},"floor_sec":…,"stage_floor_incr_sec":…}. The optional
  * shuffle-partition override separates partition-size pressure from
  * algorithmic growth when reading large-scale exponents (a cluster
  * re-sizes partitions with data; the fixed local default does not).
  */
object ScaleBench {
  private val DefaultQueries = Seq(
    "d29_dedup_exact", "d30_dedup_ngram_jaccard", "d141_capped_jaccard",
    "d31_dedup_minhash_lsh", "d181_prefix_filter_join",
    "d225_containment_join", "d57_dup_components", "s206_ivfpq_search",
    "s38_ann_brute", "q198_kcore_peel", "q321_label_prop",
    "q242_adamic_adar", "q148_pagerank3")

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse(
      sys.error("usage: ScaleBench <corpusDir> [queriesCsv] [reps]"))
    val names = args.lift(1).filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSeq).getOrElse(DefaultQueries)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = Runtime.getRuntime.availableProcessors()
    val shufflePartitions = args.lift(3).map(_.toInt).getOrElse(cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.SparkSupport.scratchDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = names.map(n => n -> graft.SparkEntry.queries.getOrElse(n,
      sys.error(s"unknown query $n")))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
      })

    def runAll(): Map[String, (Double, Int, Int)] =
      qs.map { case (name, fn) =>
        org.apache.spark.GraftSchedulerBridge.drainListenerBus(
          spark.sparkContext)
        jobs.set(0); stages.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSchedulerBridge.drainListenerBus(
          spark.sparkContext)
        spark.catalog.clearCache()
        System.err.println(f"[scale-bench] $name%-28s $dt%8.3f s")
        name -> ((dt, jobs.get(), stages.get()))
      }.toMap

    runAll() // warm-up: JIT + persisted layout builds, untimed
    val best = (1 to reps).map(_ => runAll())
      .reduce((a, b) => a.map { case (k, v) =>
        k -> (if (v._1 <= b(k)._1) v else b(k)) })
    def minOf5(body: => Unit): Double = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min
    val floor = minOf5(spark.range(1000000L).count())
    val incr = math.max(
      minOf5(spark.range(1000L).repartition(2).count()) -
        minOf5(spark.range(1000L).count()), 0.0)
    def m(f: ((Double, Int, Int)) => Any): String =
      names.map(n => s""""$n":${f(best(n))}""").mkString("{", ",", "}")
    println(s"""{"dir":"$dir","queries":${m(v => f"${v._1}%.3f")},""" +
      s""""jobs":${m(_._2)},"stages":${m(_._3)},""" +
      f""""floor_sec":$floor%.4f,"stage_floor_incr_sec":$incr%.4f}""")
    spark.stop()
  }
}
