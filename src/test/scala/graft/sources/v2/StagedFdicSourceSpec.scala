package graft.sources.v2

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StagedFdicSourceSpec extends SparkSpec {

  private def fmt = classOf[StagedFdicSource].getName

  private def stage(lines: Seq[String], n: Int = 1): String = {
    val dir = Files.createTempDirectory("staged_fdic")
    lines.grouped(math.max(1, math.ceil(lines.size / n.toDouble).toInt))
      .zipWithIndex.foreach { case (chunk, i) =>
        Files.writeString(dir.resolve(s"part$i.json"),
          chunk.mkString("", "\n", "\n"))
      }
    dir.toString
  }

  private val sample = Seq(
    """{"data": {"CERT": "1", "NAME": "ALPHA BANK", "STALP": "GA", "ASSET": 1200}}""",
    """{"data": {"CERT": "2", "NAME": "BETA \"B\" CU", "STALP": "TX", "ASSET": null}}""",
    """{"data": {"CERT": "3", "NAME": "GAMMA TRUST", "STALP": "GA", "ASSET": 77}}""")

  test("reads staged lines with inferred schema; values match json_tuple rendering") {
    val dir = stage(sample)
    val df = spark.read.format(fmt).load(dir)
    assert(df.columns.toSeq == Seq("CERT", "NAME", "STALP", "ASSET"))
    val rows = df.orderBy("CERT").collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("ALPHA BANK", "BETA \"B\" CU", "GAMMA TRUST"))
    // numbers render as written, JSON null is SQL NULL — json_tuple parity
    assert(rows(0).getString(3) == "1200" && rows(1).isNullAt(3))
  }

  test("column pruning reaches the scan") {
    val dir = stage(sample)
    val df = spark.read.format(fmt).option("fields", "CERT,NAME,STALP,ASSET")
      .load(dir).select("CERT", "STALP")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadFields: [CERT,STALP]"), plan)
    assert(df.collect().map(_.getString(1)).sorted.toSeq == Seq("GA", "GA", "TX"))
  }

  test("EqualTo pushes into the reader and shows in the plan") {
    val dir = stage(sample)
    val df = spark.read.format(fmt).load(dir)
      .filter(col("STALP") === "GA").select("CERT")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("EqualTo(STALP,GA)"), plan)
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("1", "3"))
  }

  test("one input partition per staged file") {
    val dir = stage((1 to 90).map(i => s"""{"data": {"CERT": "$i", "V": "x"}}"""), 3)
    val df = spark.read.format(fmt).option("fields", "CERT,V").load(dir)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 90)
  }

  test("V2 write: roundtrip through the staging sink, overwrite truncates, append adds") {
    import spark.implicits._
    val dir = Files.createTempDirectory("staged_w").toString
    val df = Seq(("1", "ALPHA \"A\" BANK", "GA"), ("2", null, "TX"))
      .toDF("CERT", "NAME", "STALP")
    df.write.format(fmt).mode("overwrite").save(dir)
    val back = spark.read.format(fmt)
      .option("fields", "CERT,NAME,STALP").load(dir)
    assert(back.orderBy("CERT").collect().toSeq == df.orderBy("CERT").collect().toSeq)
    // no staging residue after commit
    assert(Files.list(java.nio.file.Paths.get(dir)).noneMatch(
      p => p.getFileName.toString.startsWith(".staging")))
    // append accumulates (K1's quarterly-load semantics), overwrite resets
    df.write.format(fmt).mode("append").save(dir)
    assert(spark.read.format(fmt).option("fields", "CERT").load(dir).count() == 4)
    df.write.format(fmt).mode("overwrite").save(dir)
    assert(spark.read.format(fmt).option("fields", "CERT").load(dir).count() == 2)
  }

  test("streaming write commits per epoch; re-committed epochs replace, not duplicate") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("staged_stream").toString
    val ckpt = Files.createTempDirectory("staged_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = in.toDF().toDF("CERT", "NAME")
      .writeStream.format(fmt)
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    in.addData(("1", "ALPHA"), ("2", "BETA"))
    q.processAllAvailable()
    in.addData(("3", "GAMMA"))
    q.processAllAvailable()
    q.stop()
    // both epochs visible, epoch-tagged files, no staging residue
    val back = spark.read.format(fmt).option("fields", "CERT,NAME").load(dir)
    assert(back.orderBy("CERT").collect().map(_.getString(0)).toSeq ==
      Seq("1", "2", "3"))
    val files = StagedFdicSource.listFiles(dir).map(_.getFileName.toString)
    assert(files.nonEmpty && files.forall(_.startsWith("epoch-")), files)
    assert(files.map(_.split("-")(1)).distinct.size == 2) // two epochs
    // idempotence: re-commit epoch 0 as the SAME QUERY would after a
    // restart (a fresh StreamingWrite instance, same queryId — recovered
    // from the file tag here) — the write replaces that epoch's files
    // instead of appending duplicates
    val tag = files.head.split("-")(2) // epoch-<id>-<queryTag>-part-...
    val w = StagedFdicStreamingWrite(dir, Array("CERT", "NAME"), tag)
    val before = spark.read.format(fmt).option("fields", "CERT").load(dir).count()
    w.commit(0L, Array.empty) // epoch 0 redelivered with no rows
    val after = spark.read.format(fmt).option("fields", "CERT").load(dir).count()
    val epoch0Gone = StagedFdicSource.listFiles(dir)
      .forall(!_.getFileName.toString.startsWith(s"epoch-0-$tag-"))
    assert(epoch0Gone && after < before)
    // the OTHER direction: a DIFFERENT query's epoch-0 commit must NOT
    // touch this query's surviving files (cross-query appends accumulate)
    val other = StagedFdicStreamingWrite(dir, Array("CERT", "NAME"),
      "deadbeef-0000")
    other.commit(0L, Array.empty)
    assert(spark.read.format(fmt).option("fields", "CERT").load(dir).count()
      == after, "a foreign query's epoch replace must not delete our files")
  }

  test("V2 write output is byte-compatible with Ingest.stageFdicResponse lines") {
    import spark.implicits._
    val dir = Files.createTempDirectory("staged_compat").toString
    Seq(("7", "DELTA TRUST")).toDF("CERT", "NAME")
      .coalesce(1).write.format(fmt).mode("overwrite").save(dir)
    val line = Files.readAllLines(
      StagedFdicSource.listFiles(dir).head.toFile.toPath).get(0)
    assert(line == """{"data": {"CERT": "7", "NAME": "DELTA TRUST"}}""", line)
  }

  test("size statistics make a small staged table a broadcast-join candidate") {
    import spark.implicits._
    val dir = stage(sample)
    val staged = spark.read.format(fmt).load(dir)
    val big = (1 to 1000).map(i => (i.toString, i)).toDF("CERT", "x")
    val plan = big.join(staged, Seq("CERT"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("agrees with the V1 json_tuple read path on the same staging dir") {
    val dir = stage(sample)
    val v2 = spark.read.format(fmt).load(dir)
      .select("CERT", "NAME", "STALP", "ASSET")
    val v1 = graft.pipeline.Bronze.readStagedFdicJson(
      spark, dir, Seq("CERT", "NAME", "STALP", "ASSET"))
    assert(v2.orderBy("CERT").collect().toSeq ==
      v1.orderBy("CERT").collect().toSeq)
  }

  test("aggregate pushdown: grouped count/min/max fold inside the reader, " +
    "partial rows merge correctly across files, plan shows PushedAggregates") {
    // 90 records over 3 files so every group SPANS files — the partial
    // (per-file) rows must re-reduce to the exact global answer
    val lines = (1 to 90).map { i =>
      s"""{"data": {"CERT": "$i", "NAME": "BANK${f"$i%03d"}", "STALP": "S${i % 4}"}}"""
    }
    val dir = stage(lines, 3)
    val df = spark.read.format(fmt).option("fields", "CERT,NAME,STALP")
      .load(dir)
      .groupBy("STALP")
      .agg(count(lit(1)).as("n"), min("NAME").as("lo"), max("NAME").as("hi"))
      .orderBy("STALP")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates:"), s"aggregation must push:\n$plan")
    assert(plan.contains("GroupBy: [STALP]"), plan)
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    val expect = (1 to 90).groupBy(i => s"S${i % 4}").toSeq.sortBy(_._1)
      .map { case (g, is) =>
        (g, is.size.toLong, f"BANK${is.min}%03d", f"BANK${is.max}%03d")
      }
    assert(rows.toSeq == expect)
  }

  test("aggregate pushdown: composes with a pushed filter; count(field) " +
    "skips nulls; a global count over a filtered-to-empty table is 0") {
    val dir = stage(sample)
    val filtered = spark.read.format(fmt)
      .option("fields", "CERT,NAME,STALP,ASSET").load(dir)
      .filter(col("STALP") === "GA")
      .agg(count(col("ASSET")).as("n_asset"), count(lit(1)).as("n"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates:") &&
      plan.contains("""EqualTo(STALP,GA)"""), plan)
    val r = filtered.head()
    assert((r.getLong(0), r.getLong(1)) == (2L, 2L)) // both GA rows have ASSET
    val empty = spark.read.format(fmt)
      .option("fields", "CERT,NAME,STALP,ASSET").load(dir)
      .filter(col("STALP") === "ZZ")
      .agg(count(lit(1)).as("n"))
    assert(empty.head().getLong(0) == 0L,
      "a global count over zero matching rows must merge to 0, not NULL")
  }

  test("limit pushdown: the reader stops after n accepted rows per file, " +
    "Spark's final limit keeps the answer exact, plan shows PushedLimit") {
    val lines = (1 to 90).map(i =>
      s"""{"data": {"CERT": "$i", "STALP": "S${i % 4}"}}""")
    val dir = stage(lines, 3)
    val df = spark.read.format(fmt).option("fields", "CERT,STALP").load(dir)
      .limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 5"), s"limit must push:\n$plan")
    assert(df.collect().length == 5)
    // composes with a pushed filter: "n ACCEPTED rows" is the stop rule,
    // so the limited result still honors the filter exactly
    val filtered = spark.read.format(fmt).option("fields", "CERT,STALP")
      .load(dir).filter(col("STALP") === "S1").limit(4)
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("PushedLimit: 4") &&
      fplan.contains("EqualTo(STALP,S1)"), fplan)
    val rows = filtered.collect()
    assert(rows.length == 4 && rows.forall(_.getString(1) == "S1"))
  }

  test("top-N pushdown: plan shows PushedTopN; result matches the un-pushed " +
    "plan exactly across files, including ties and DESC") {
    // 90 records over 3 files, with deliberate TIES on the sort key (V
    // repeats every 9) so the heap's tie-eviction is exercised: the pushed
    // answer must equal the un-pushed answer as a SET at the limit boundary
    val lines = (1 to 90).map(i =>
      s"""{"data": {"CERT": "$i", "V": "v${f"${i % 9}%02d"}"}}""")
    val dir = stage(lines, 3)
    def staged = spark.read.format(fmt).option("fields", "CERT,V").load(dir)
    val pushedDf = staged.orderBy(col("V").desc, col("CERT")).limit(7)
    val plan = pushedDf.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: [V DESC NULLS LAST,CERT ASC NULLS FIRST] limit 7"),
      s"top-N must push:\n$plan")
    // un-pushed reference: same data through the V1 json path, same sort
    val unpushed = graft.pipeline.Bronze.readStagedFdicJson(
      spark, dir, Seq("CERT", "V"))
      .orderBy(col("V").desc, col("CERT")).limit(7)
    assert(pushedDf.collect().toSeq == unpushed.collect().toSeq)
  }

  test("top-N pushdown: NULLS FIRST and NULLS LAST both honored by the " +
    "per-file heap") {
    val lines = Seq(
      """{"data": {"CERT": "1", "V": "b"}}""",
      """{"data": {"CERT": "2", "V": null}}""",
      """{"data": {"CERT": "3", "V": "a"}}""",
      """{"data": {"CERT": "4", "V": null}}""",
      """{"data": {"CERT": "5", "V": "c"}}""")
    val dir = stage(lines, 2)
    def staged = spark.read.format(fmt).option("fields", "CERT,V").load(dir)
    // asc_nulls_first: the two nulls must SURVIVE the per-file heap at n=3
    val nf = staged.orderBy(col("V").asc_nulls_first, col("CERT")).limit(3)
    assert(nf.queryExecution.executedPlan.toString.contains("V ASC NULLS FIRST"))
    assert(nf.collect().map(_.getString(0)).toSeq == Seq("2", "4", "3"))
    // desc_nulls_last: the nulls must be EVICTED in favor of values
    val nl = staged.orderBy(col("V").desc_nulls_last, col("CERT")).limit(3)
    assert(nl.queryExecution.executedPlan.toString.contains("V DESC NULLS LAST"))
    assert(nl.collect().map(_.getString(0)).toSeq == Seq("5", "1", "3"))
  }

  test("top-N pushdown composes with a pushed filter; n larger than the " +
    "file's accepted rows emits them all") {
    val lines = (1 to 90).map(i =>
      s"""{"data": {"CERT": "${f"$i%02d"}", "STALP": "S${i % 4}"}}""")
    val dir = stage(lines, 3)
    val df = spark.read.format(fmt).option("fields", "CERT,STALP").load(dir)
      .filter(col("STALP") === "S1")
      .orderBy(col("CERT")).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN:") && plan.contains("EqualTo(STALP,S1)"),
      plan)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      (1 to 90).filter(_ % 4 == 1).map(i => f"$i%02d").sorted.take(5))
    assert(rows.forall(_.getString(1) == "S1"))
    // n=50 > the ~8 accepted rows per file: everything accepted survives
    val wide = spark.read.format(fmt).option("fields", "CERT,STALP").load(dir)
      .filter(col("STALP") === "S1").orderBy(col("CERT")).limit(50)
    assert(wide.count() == 23) // |{1..90 : i % 4 == 1}|
  }

  test("top-N pushdown refuses when an aggregate is pushed (and vice versa " +
    "for limit) — the builder keeps the pushes mutually exclusive") {
    val dir = stage(sample)
    // ORDER BY + LIMIT over an aggregate: the agg pushes, the TopN must NOT
    val df = spark.read.format(fmt).option("fields", "CERT,NAME,STALP")
      .load(dir)
      .groupBy("STALP").agg(count(lit(1)).as("n"))
      .orderBy(col("STALP")).limit(2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates:") && !plan.contains("PushedTopN:"),
      s"TopN above a pushed aggregate must stay in Spark:\n$plan")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("GA", 2L), ("TX", 1L)))
    // builder-level guard symmetry (pushLimit after pushTopN refuses)
    val b = new StagedFdicScanBuilder(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("CERT",
          org.apache.spark.sql.types.StringType))), dir)
    import org.apache.spark.sql.connector.expressions.Expressions
    assert(b.pushTopN(Array(Expressions.sort(Expressions.column("CERT"),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)), 3))
    assert(!b.pushLimit(5),
      "pushLimit must refuse once a TopN is pushed — mutual exclusion")
  }

  test("the q323 gate's plan actually pushes its top-N") {
    val df = graft.operators.RelationalExt3.q323Dsv2TopNPushdown(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN: [c_name DESC NULLS LAST] limit 10"),
      s"the gate must run through the pushed path:\n$plan")
  }

  test("the q322 gate's plan actually pushes its aggregation") {
    val df = graft.operators.RelationalExt3.q322Dsv2AggPushdown(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [count_star(*),min(c_name)," +
      "max(c_name)]") && plan.contains("GroupBy: [c_mktsegment]"),
      s"the gate must run through the pushed path:\n$plan")
  }

  test("aggregate pushdown rejects DISTINCT — Spark falls back to its own " +
    "aggregate over the plain scan, values unchanged") {
    val dir = stage(sample)
    val df = spark.read.format(fmt).option("fields", "CERT,NAME,STALP")
      .load(dir)
      .agg(countDistinct(col("STALP")).as("n_states"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregates:"),
      s"DISTINCT must not push:\n$plan")
    assert(df.head().getLong(0) == 2L)
  }
}
