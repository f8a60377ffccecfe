package graft.sources.v2

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AvroInterchangeSourceSpec extends SparkSpec {

  private def fmt = classOf[AvroInterchangeSource].getName

  test("write/read roundtrip across the supported type battery, " +
    "including nulls") {
    import spark.implicits._
    val dir = Files.createTempDirectory("avro_rt").toString
    val df = Seq(
      (1L, "alpha", 10, 1.5d, 2.5f, true, Array[Byte](1, 2)),
      (2L, null.asInstanceOf[String], 20, -0.25d, 0f, false, Array[Byte]()),
      (3L, "gamma", -7, 0d, -1f, true, Array[Byte](-128, 127)))
      .toDF("id", "name", "n", "d", "f", "b", "bin")
    df.write.format(fmt).mode("overwrite").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val rows = back.orderBy("id").collect()
    val exp = df.orderBy("id").collect()
    rows.zip(exp).foreach { case (r, e) =>
      (0 to 5).foreach(i => assert(r.get(i) == e.get(i), s"col $i"))
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]](6), e.getAs[Array[Byte]](6)))
    }
    // no staging residue after the two-phase commit
    assert(Files.list(java.nio.file.Paths.get(dir)).noneMatch(
      p => p.getFileName.toString.startsWith(".staging")))
  }

  test("column pruning reaches the decode schema; filters push and show " +
    "in the plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("avro_pf").toString
    (1 to 90).map(i => (i.toLong, s"n$i", s"S${i % 4}"))
      .toDF("id", "name", "seg")
      .repartition(3).write.format(fmt).mode("overwrite").save(dir)
    val df = spark.read.format(fmt).load(dir)
      .filter(col("seg") === "S1").select("id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadFields: [id]"), plan)
    assert(plan.contains("EqualTo(seg,S1)"), plan)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      (1 to 90).filter(_ % 4 == 1).map(_.toLong))
    // non-string equality pushes too (typed comparison in the reader)
    val one = spark.read.format(fmt).load(dir).filter(col("id") === 7L)
    assert(one.queryExecution.executedPlan.toString.contains("EqualTo(id,7)"))
    assert(one.collect().map(_.getString(1)).toSeq == Seq("n7"))
  }

  test("limit pushdown: the reader stops decoding after n accepted rows " +
    "per file, composes with a pushed filter, answer exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("avro_lim").toString
    (1 to 90).map(i => (i.toLong, s"S${i % 4}")).toDF("id", "seg")
      .repartition(3).write.format(fmt).mode("overwrite").save(dir)
    val df = spark.read.format(fmt).load(dir).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 5"), s"limit must push:\n$plan")
    assert(df.collect().length == 5)
    val filtered = spark.read.format(fmt).load(dir)
      .filter(col("seg") === "S1").limit(4)
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("PushedLimit: 4") &&
      fplan.contains("EqualTo(seg,S1)"), fplan)
    val rows = filtered.collect()
    assert(rows.length == 4 && rows.forall(_.getString(1) == "S1"))
  }

  test("one input partition per container file; append accumulates; " +
    "overwrite truncates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("avro_parts").toString
    val df = (1 to 30).map(i => (i.toLong, s"x$i")).toDF("id", "v")
    df.repartition(3).write.format(fmt).mode("overwrite").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.rdd.getNumPartitions == 3)
    assert(back.count() == 30)
    df.repartition(2).write.format(fmt).mode("append").save(dir)
    assert(spark.read.format(fmt).load(dir).count() == 60)
    df.repartition(1).write.format(fmt).mode("overwrite").save(dir)
    assert(spark.read.format(fmt).load(dir).count() == 30)
  }

  test("size statistics make a small Avro drop a broadcast-join candidate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("avro_bc").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.format(fmt).mode("overwrite").save(dir)
    val small = spark.read.format(fmt).load(dir)
    val big = (1 to 1000).map(i => (i.toLong, i)).toDF("id", "x")
    val plan = big.join(small, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("files written by a FOREIGN producer (plain avro-core, different " +
    "record name) read fine — projection derives from the writer schema") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = Files.createTempDirectory("avro_foreign")
    val sch = SchemaBuilder.record("UpstreamEvent").namespace("com.example")
      .fields()
      .requiredLong("id").optionalString("payload").requiredInt("kind")
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, dir.resolve("drop-0.avro").toFile)
    (1 to 5).foreach { i =>
      val r = new GenericData.Record(sch)
      r.put("id", i.toLong)
      r.put("payload", if (i % 2 == 0) null else s"p$i")
      r.put("kind", i % 3)
      w.append(r)
    }
    w.close()
    val back = spark.read.format(fmt).load(dir.toString)
    assert(back.schema.fieldNames.toSeq == Seq("id", "payload", "kind"))
    assert(back.schema("payload").nullable && !back.schema("id").nullable)
    val rows = back.select("payload", "kind").orderBy("id").collect()
    assert(rows.map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("p1"), None, Some("p3"), None, Some("p5")))
    // pruned read of a foreign file: only `kind` decodes
    val k = spark.read.format(fmt).load(dir.toString).select("kind")
    assert(k.queryExecution.executedPlan.toString.contains(
      "ReadFields: [kind]"))
    assert(k.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 1, 2, 2))
  }

  test("NESTED roundtrip: struct/array/map columns survive write + read " +
    "with nullability at every level") {
    import spark.implicits._
    val dir = Files.createTempDirectory("avro_nested").toString
    val df = Seq(
      (1L, ("a", Some(1.5)), Seq(1L, 2L, 3L), Map("x" -> "1", "y" -> "2")),
      (2L, ("b", None), Seq.empty[Long], Map.empty[String, String]),
      (3L, ("c", Some(-0.25)), Seq(7L), Map("z" -> "9")))
      .toDF("id", "info", "ks", "tags")
    df.write.format(fmt).mode("overwrite").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema("info").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
    assert(back.schema("ks").dataType.isInstanceOf[
      org.apache.spark.sql.types.ArrayType])
    assert(back.schema("tags").dataType.isInstanceOf[
      org.apache.spark.sql.types.MapType])
    val rows = back.selectExpr("id", "info._1", "info._2", "ks",
        "tags['x']", "tags['z']", "size(tags)")
      .orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows.map(r => Option(r.get(2))).toSeq ==
      Seq(Some(1.5), None, Some(-0.25)))
    assert(rows.map(_.getSeq[Long](3)).toSeq ==
      Seq(Seq(1L, 2L, 3L), Seq.empty, Seq(7L)))
    assert(rows.map(r => Option(r.getString(4))).toSeq ==
      Seq(Some("1"), None, None))
    assert(rows.map(r => Option(r.getString(5))).toSeq ==
      Seq(None, None, Some("9")))
    assert(rows.map(_.getInt(6)).toSeq == Seq(2, 0, 1))
  }

  test("a NESTED file written by PLAIN avro-core (record-in-record, " +
    "array, map — no Spark near the writer) reads through the connector") {
    import org.apache.avro.{Schema => ASchema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("avro_foreign_nested")
    val header = SchemaBuilder.record("Header").namespace("com.example")
      .fields().requiredString("host").optionalInt("status").endRecord()
    val sch = SchemaBuilder.record("Crawl").namespace("com.example")
      .fields()
      .requiredLong("id")
      .name("header").`type`(header).noDefault()
      .name("tokens").`type`().array().items()
        .`type`(ASchema.create(ASchema.Type.LONG)).noDefault()
      .name("meta").`type`().map().values()
        .`type`(ASchema.create(ASchema.Type.STRING)).noDefault()
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, dir.resolve("crawl-0.avro").toFile)
    (1 to 3).foreach { i =>
      val h = new GenericData.Record(header)
      h.put("host", s"h$i.example.com")
      h.put("status", if (i == 2) null else Integer.valueOf(200 + i))
      val r = new GenericData.Record(sch)
      r.put("id", i.toLong)
      r.put("header", h)
      r.put("tokens", (1 to i).map(j => java.lang.Long.valueOf(j * 10L))
        .asJava)
      r.put("meta", Map("lang" -> s"l$i").asJava)
      w.append(r)
    }
    w.close()
    val back = spark.read.format(fmt).load(dir.toString)
    val rows = back.selectExpr("id", "header.host", "header.status",
        "tokens", "meta['lang']")
      .orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("h1.example.com", "h2.example.com", "h3.example.com"))
    assert(rows.map(r => Option(r.get(2))).toSeq ==
      Seq(Some(201), None, Some(203)))
    assert(rows.map(_.getSeq[Long](3)).toSeq ==
      Seq(Seq(10L), Seq(10L, 20L), Seq(10L, 20L, 30L)))
    assert(rows.map(_.getString(4)).toSeq == Seq("l1", "l2", "l3"))
    // top-level pruning skips the whole nested column at decode
    val pruned = spark.read.format(fmt).load(dir.toString).select("id")
    assert(pruned.queryExecution.executedPlan.toString.contains(
      "ReadFields: [id]"))
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("LOGICAL types roundtrip (date / timestamp-micros / decimal) and a " +
    "FOREIGN file with a fixed-backed decimal reads; millis upscales exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("avro_logical").toString
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-02-29"),
        java.sql.Timestamp.valueOf("2024-02-29 12:34:56.789012"),
        new java.math.BigDecimal("12345.67")),
      (2L, java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.0"),
        new java.math.BigDecimal("-0.01")))
      .toDF("id", "d", "ts", "price")
      .withColumn("price", col("price").cast("decimal(12,2)"))
    df.write.format(fmt).mode("overwrite").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema("d").dataType ==
      org.apache.spark.sql.types.DateType)
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(back.schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    val rows = back.orderBy("id").collect()
    val exp = df.orderBy("id").collect()
    rows.zip(exp).foreach { case (r, e) =>
      (0 to 3).foreach(i => assert(r.get(i) == e.get(i), s"col $i")) }

    // foreign writer: decimal over FIXED (the schema-registry default for
    // fixed-width money columns) plus a date — plain avro-core
    import org.apache.avro.{LogicalTypes, Schema => ASchema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val fdir = Files.createTempDirectory("avro_logical_foreign")
    val decFixed = LogicalTypes.decimal(10, 3).addToSchema(
      ASchema.createFixed("Money", null, "com.example", 6))
    val dateT = LogicalTypes.date().addToSchema(
      ASchema.create(ASchema.Type.INT))
    val sch = SchemaBuilder.record("Txn").namespace("com.example").fields()
      .requiredLong("id")
      .name("amount").`type`(decFixed).noDefault()
      .name("day").`type`(dateT).noDefault()
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, fdir.resolve("txn-0.avro").toFile)
    def fixedOf(unscaled: Long): GenericData.Fixed = {
      val b = java.nio.ByteBuffer.allocate(8)
      b.putLong(unscaled)
      // sign-extended 6-byte big-endian two's complement
      new GenericData.Fixed(decFixed,
        java.util.Arrays.copyOfRange(b.array(), 2, 8))
    }
    val r1 = new GenericData.Record(sch)
    r1.put("id", 1L); r1.put("amount", fixedOf(1234567L)) // 1234.567
    r1.put("day", Integer.valueOf(19782)) // 2024-02-29 epoch days
    w.append(r1)
    val r2 = new GenericData.Record(sch)
    r2.put("id", 2L); r2.put("amount", fixedOf(-500L)) // -0.500
    r2.put("day", Integer.valueOf(-1)) // 1969-12-31
    w.append(r2)
    w.close()
    val fb = spark.read.format(fmt).load(fdir.toString).orderBy("id")
      .collect()
    assert(fb.map(_.getDecimal(1).toPlainString).toSeq ==
      Seq("1234.567", "-0.500"))
    assert(fb.map(_.getDate(2).toString).toSeq ==
      Seq("2024-02-29", "1969-12-31"))

    // timestamp-millis — the Kafka-ecosystem default flavor — reads as
    // TimestampType via an exact ×1000 upscale; local-timestamp-millis
    // as TimestampNTZType; and a millis long NESTED inside a record and
    // an array takes the same schema-threaded decode path. A nullable
    // millis field with a null exercises the union unwrap.
    val msT = LogicalTypes.timestampMillis().addToSchema(
      ASchema.create(ASchema.Type.LONG))
    val lmsT = LogicalTypes.localTimestampMillis().addToSchema(
      ASchema.create(ASchema.Type.LONG))
    val innerSch = SchemaBuilder.record("Inner").namespace("com.example")
      .fields().name("seen").`type`(msT).noDefault().endRecord()
    val msSch = SchemaBuilder.record("Ms").namespace("com.example").fields()
      .requiredLong("id")
      .name("t").`type`(msT).noDefault()
      .name("lt").`type`().optional().`type`(lmsT)
      .name("hdr").`type`(innerSch).noDefault()
      .name("ts_arr").`type`().array().items(msT).noDefault()
      .endRecord()
    val mdir = Files.createTempDirectory("avro_millis")
    val mw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](msSch))
    mw.create(msSch, mdir.resolve("m-0.avro").toFile)
    def msRec(id: Long, t: Long, lt: java.lang.Long): GenericRecord = {
      val rec = new GenericData.Record(msSch)
      rec.put("id", id); rec.put("t", java.lang.Long.valueOf(t))
      rec.put("lt", lt)
      val inner = new GenericData.Record(innerSch)
      inner.put("seen", java.lang.Long.valueOf(t + 1))
      rec.put("hdr", inner)
      rec.put("ts_arr", java.util.Arrays.asList(
        java.lang.Long.valueOf(t), java.lang.Long.valueOf(t + 2)))
      rec
    }
    mw.append(msRec(1L, 1700000000123L, java.lang.Long.valueOf(86400001L)))
    mw.append(msRec(2L, -1L, null)) // pre-epoch millis: -1 ms → -1000 µs
    mw.close()
    val mdf = spark.read.format(fmt).load(mdir.toString)
    assert(mdf.schema("t").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(mdf.schema("lt").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val got = mdf.orderBy("id")
      .selectExpr("unix_micros(t)", "lt", "unix_micros(hdr.seen)",
        "unix_micros(ts_arr[1])")
      .collect()
    assert(got(0).getLong(0) == 1700000000123000L)
    assert(got(0).getAs[java.time.LocalDateTime](1) ==
      java.time.LocalDateTime.parse("1970-01-02T00:00:00.001"))
    assert(got(0).getLong(2) == 1700000000124000L)
    assert(got(0).getLong(3) == 1700000000125000L)
    assert(got(1).getLong(0) == -1000L)
    assert(got(1).isNullAt(1))
  }

  test("streaming write commits per epoch; redelivered epochs replace " +
    "their own files; a foreign query's epochs are untouched") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("avro_stream").toString
    val ckpt = Files.createTempDirectory("avro_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "name")
      .writeStream.format(fmt)
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    in.addData((1L, "alpha"), (2L, "beta"))
    q.processAllAvailable()
    in.addData((3L, "gamma"))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format(fmt).load(dir)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("alpha", "beta", "gamma"))
    val files = StagedFdicSource.listFiles(dir).map(_.getFileName.toString)
    assert(files.nonEmpty && files.forall(_.startsWith("epoch-")), files)
    assert(files.map(_.split("-")(1)).distinct.size == 2) // two epochs
    // redelivery: same query tag, epoch 0 re-commits empty → replaces
    val tag = files.head.split("-")(2)
    val w = AvroStreamingWrite(dir,
      back.schema, tag)
    val before = spark.read.format(fmt).load(dir).count()
    w.commit(0L, Array.empty)
    val after = spark.read.format(fmt).load(dir).count()
    assert(after < before)
    assert(StagedFdicSource.listFiles(dir)
      .forall(!_.getFileName.toString.startsWith(s"epoch-0-$tag-")))
    // a different query's epoch-0 commit must not delete our files
    AvroStreamingWrite(dir, back.schema, "feedc0de-0000").commit(0L, Array.empty)
    assert(spark.read.format(fmt).load(dir).count() == after)
  }

  test("streaming READ: a micro-batch per newly-arrived container file; " +
    "restart from checkpoint reads only what arrived since") {
    import spark.implicits._
    val dir = Files.createTempDirectory("avro_tail").toString
    val ckpt = Files.createTempDirectory("avro_tail_ckpt").toString
    val sink = Files.createTempDirectory("avro_tail_sink").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.format(fmt).mode("append").save(dir)
    def run(): Unit = {
      val q = spark.readStream.format(fmt).load(dir)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(spark.read.parquet(sink).count() == 2)
    // a new drop lands between runs: the restarted stream reads ONLY it
    Seq((3L, "c")).toDF("id", "v")
      .coalesce(1).write.format(fmt).mode("append").save(dir)
    run()
    val rows = spark.read.parquet(sink)
    assert(rows.count() == 3, "restart must pick up exactly the new file")
    assert(rows.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b", "c"))
    // replaying with nothing new emits nothing
    run()
    assert(spark.read.parquet(sink).count() == 3)
  }

  test("the q324 gate's plan prunes and pushes through the Avro scan") {
    val df = graft.operators.RelationalExt3.q324AvroRoundtrip(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AvroInterchangeScan") &&
      plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"the gate must run through the pushed path:\n$plan")
  }
}
