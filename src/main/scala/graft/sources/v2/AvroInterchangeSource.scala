package graft.sources.v2

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for Avro object-container files, built directly
  * on avro-core (the classpath ships no spark-avro datasource; the
  * container format itself needs only the core library). Avro is the
  * interchange format training-data pipelines meet at their edges —
  * upstream crawlers and log pipelines hand off Avro, downstream
  * consumers expect it — so the engine reads and writes it as a
  * first-class table:
  *
  *  - '''column pruning''' ([[SupportsPushDownRequiredColumns]]) maps to
  *    Avro's own reader-schema resolution: the datum reader is given a
  *    projection schema, so non-requested writer fields are SKIPPED at the
  *    decode level (Avro resolution skips them without materializing) —
  *    the same "don't decode what you don't read" property a parquet scan
  *    gets from its column chunks;
  *  - '''filter pushdown''' ([[SupportsPushDownFilters]]): `EqualTo` /
  *    `IsNotNull` evaluate inside the reader on decoded primitives, so
  *    filtered records never become rows;
  *  - '''two-phase-commit write''' ([[StagedFdicBatchWrite]]'s discipline,
  *    shared via the same temp-dir + atomic-rename protocol): task files
  *    land hidden, the driver's job commit publishes them atomically, and
  *    a failed task never leaves partial data visible.
  *
  * Type mapping (both directions): string↔StringType, long↔LongType,
  * int↔IntegerType, double↔DoubleType, float↔FloatType,
  * boolean↔BooleanType, bytes↔BinaryType; nullability is the standard
  * `union {null, T}`. NESTED types map recursively — record↔StructType
  * (fields resolved by name), array↔ArrayType, string-keyed
  * map↔MapType — the shapes real interchange files carry (crawler
  * payloads with header structs, token-id arrays, tag maps). LOGICAL
  * types map where the encodings coincide exactly: `date`↔DateType,
  * `timestamp-micros`↔TimestampType,
  * `local-timestamp-micros`↔TimestampNTZType, `decimal` (bytes or
  * fixed)↔DecimalType; `timestamp-millis`/`local-timestamp-millis`
  * (the Kafka-ecosystem default flavor) READ via an exact ×1000
  * upscale, while writes always emit micros. Column
  * pruning stays TOP-LEVEL (a pruned nested field skips the whole
  * column at decode; sub-field pruning would need Avro's reader-schema
  * recursion — deliberate scope cut, documented here). Enums, fixed,
  * multi-branch unions, and non-string map keys have no canonical image
  * and fail loud rather than guessing.
  *
  * Parallelism is one [[InputPartition]] per container file — Avro files
  * are block-splittable in principle, but interchange drops arrive as
  * many files (one per producer task), so file-level parallelism is the
  * scale unit, mirroring [[StagedFdicSource]].
  *
  * Usage: `spark.read.format(classOf[AvroInterchangeSource].getName)
  * .load(dir)` (schema from the first file's writer schema), and
  * `df.write.format(...).save(dir)`.
  */
class AvroInterchangeSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  /** ServiceLoader-registered short name: `format("graft-avro")`. */
  override def shortName(): String = "graft-avro"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = StagedFdicSource.listFiles(options.get("path"))
    files.headOption match {
      case None => StructType(Nil)
      case Some(f) =>
        val r = new DataFileReader[GenericRecord](
          f.toFile, new GenericDatumReader[GenericRecord]())
        try AvroInterchange.toSparkSchema(r.getSchema)
        finally r.close()
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new AvroInterchangeTable(schema, properties.get("path"))
}

private[v2] object AvroInterchange {

  def toSparkSchema(s: AvroSchema): StructType = {
    require(s.getType == AvroSchema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${s.getType}")
    recordStruct(s)
  }

  private def recordStruct(s: AvroSchema): StructType =
    StructType(s.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = unwrap(f.schema())
      StructField(f.name(), t, nullable)
    })

  /** Unwraps `union {null, T}` to (T, nullable=true); plain T to
    * (T, nullable=false). */
  private def unwrap(s: AvroSchema): (DataType, Boolean) = s.getType match {
    case AvroSchema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != AvroSchema.Type.NULL)
      require(nonNull.length == 1 && branches.length <= 2,
        s"only union {null, T} is supported, got $s")
      (sparkType(nonNull.head), true)
    case _ => (sparkType(s), false)
  }

  /** Avro type → Spark type, RECURSIVE: records map to structs, arrays
    * to ArrayType, (string-keyed) maps to MapType — the nested shapes
    * real interchange files carry. LOGICAL types map where the internal
    * encodings coincide exactly: `date` (int days since epoch = Spark's
    * DateType internal), `timestamp-micros` (long micros = Spark's
    * TimestampType internal), and `decimal` over bytes or fixed
    * (two's-complement unscaled + declared scale). `timestamp-millis` /
    * `local-timestamp-millis` — the flavor Kafka-ecosystem producers
    * default to, and so the one real schema registries hand out most —
    * READ as TimestampType/TimestampNTZType through an exact ×1000
    * millis→micros upscale at decode ([[toCatalystResolved]]); the write
    * side always emits micros (never a downscale, which would be lossy).
    * Enums and multi-branch unions have no canonical image and fail
    * loud rather than guessing. */
  private def sparkType(s: AvroSchema): DataType = {
    import org.apache.avro.LogicalTypes
    s.getLogicalType match {
      case _: LogicalTypes.Date if s.getType == AvroSchema.Type.INT =>
        return DateType
      case _: LogicalTypes.TimestampMicros
          if s.getType == AvroSchema.Type.LONG =>
        return TimestampType
      case _: LogicalTypes.TimestampMillis
          if s.getType == AvroSchema.Type.LONG =>
        return TimestampType
      case _: LogicalTypes.LocalTimestampMicros
          if s.getType == AvroSchema.Type.LONG =>
        return TimestampNTZType
      case _: LogicalTypes.LocalTimestampMillis
          if s.getType == AvroSchema.Type.LONG =>
        return TimestampNTZType
      case d: LogicalTypes.Decimal =>
        return DecimalType(d.getPrecision, d.getScale)
      case null => ()
      case other => throw new IllegalArgumentException(
        s"unsupported Avro logical type for the interchange tier: $other " +
          s"over ${s.getType}")
    }
    s.getType match {
      case AvroSchema.Type.STRING  => StringType
      case AvroSchema.Type.LONG    => LongType
      case AvroSchema.Type.INT     => IntegerType
      case AvroSchema.Type.DOUBLE  => DoubleType
      case AvroSchema.Type.FLOAT   => FloatType
      case AvroSchema.Type.BOOLEAN => BooleanType
      case AvroSchema.Type.BYTES   => BinaryType
      case AvroSchema.Type.RECORD  => recordStruct(s)
      case AvroSchema.Type.ARRAY =>
        val (et, n) = unwrap(s.getElementType)
        ArrayType(et, containsNull = n)
      case AvroSchema.Type.MAP =>
        val (vt, n) = unwrap(s.getValueType)
        MapType(StringType, vt, valueContainsNull = n)
      case other => throw new IllegalArgumentException(
        s"unsupported Avro type for the interchange tier: $other")
    }
  }

  /** Spark type → Avro type, RECURSIVE. Nested record names derive from
    * the field path (Avro requires every record named, unique within the
    * schema); Avro map keys are strings by definition, so a non-string
    * Spark map key fails loud. */
  private def avroType(dt: DataType, path: String): AvroSchema = dt match {
    case StringType  => AvroSchema.create(AvroSchema.Type.STRING)
    case LongType    => AvroSchema.create(AvroSchema.Type.LONG)
    case IntegerType => AvroSchema.create(AvroSchema.Type.INT)
    case DoubleType  => AvroSchema.create(AvroSchema.Type.DOUBLE)
    case FloatType   => AvroSchema.create(AvroSchema.Type.FLOAT)
    case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
    case BinaryType  => AvroSchema.create(AvroSchema.Type.BYTES)
    case DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(AvroSchema.create(AvroSchema.Type.INT))
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
    case TimestampNTZType =>
      org.apache.avro.LogicalTypes.localTimestampMicros()
        .addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(AvroSchema.create(AvroSchema.Type.BYTES))
    case st: StructType => buildRecord(st, path)
    case ArrayType(et, n) =>
      AvroSchema.createArray(wrapNullable(avroType(et, s"${path}_item"), n))
    case MapType(StringType, vt, n) =>
      AvroSchema.createMap(wrapNullable(avroType(vt, s"${path}_value"), n))
    case MapType(k, _, _) => throw new IllegalArgumentException(
      s"Avro maps are string-keyed; cannot write map key type $k")
    case other => throw new IllegalArgumentException(
      s"unsupported Spark type for Avro interchange: $other")
  }

  private def wrapNullable(base: AvroSchema, nullable: Boolean): AvroSchema =
    if (nullable)
      AvroSchema.createUnion(AvroSchema.create(AvroSchema.Type.NULL), base)
    else base

  private def buildRecord(s: StructType, name: String): AvroSchema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    s.fields.foldLeft(fields) { (fs, f) =>
      val base = avroType(f.dataType, s"${name}_${f.name}")
      val t = wrapNullable(base, f.nullable)
      val named = fs.name(f.name).`type`(t)
      if (f.nullable) named.withDefault(null)
      else f.dataType match {
        // non-null PRIMITIVES get a typed default for reader-schema
        // projection resolution; nested types carry no default (our
        // reader only projects fields the writer actually has)
        case StringType  => named.withDefault("")
        case BinaryType  => named.withDefault(java.nio.ByteBuffer.allocate(0))
        case BooleanType => named.withDefault(java.lang.Boolean.FALSE)
        case IntegerType | LongType | FloatType | DoubleType =>
          named.withDefault(java.lang.Integer.valueOf(0))
        case _ => named.noDefault()
      }
    }.endRecord()
  }

  def toAvroSchema(s: StructType, name: String): AvroSchema =
    buildRecord(s, name)

  /** Avro decoded value → Catalyst internal value for `dt`, RECURSIVE:
    * records become InternalRows (fields resolved BY NAME against the
    * Spark struct — Avro field order is the writer's, not ours), arrays
    * become GenericArrayData, maps ArrayBasedMapData. */
  def toCatalyst(v: AnyRef, dt: DataType): Any = v match {
    case null => null
    // decimal FIRST: its wire form (bytes/fixed) collides with BinaryType's
    // and only the target type disambiguates. Date (int days) and
    // timestamp-micros (long) need no conversion at all — Avro's logical
    // encodings ARE Spark's internal encodings, so they box through the
    // primitive pass-through below.
    case b: java.nio.ByteBuffer if dt.isInstanceOf[DecimalType] =>
      val d = dt.asInstanceOf[DecimalType]
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(new java.math.BigInteger(a), d.scale),
        d.precision, d.scale)
    case f: org.apache.avro.generic.GenericFixed
        if dt.isInstanceOf[DecimalType] =>
      val d = dt.asInstanceOf[DecimalType]
      org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(
          new java.math.BigInteger(f.bytes()), d.scale),
        d.precision, d.scale)
    case s: org.apache.avro.util.Utf8 => UTF8String.fromBytes(s.getBytes.clone().take(s.getByteLength))
    case s: String => UTF8String.fromString(s)
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case r: GenericRecord =>
      val st = dt.asInstanceOf[StructType]
      InternalRow.fromSeq(st.fields.toSeq.map(f =>
        toCatalyst(r.get(f.name), f.dataType)))
    case l: java.util.Collection[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        l.asScala.map(e => toCatalyst(e.asInstanceOf[AnyRef], et)).toArray)
    case m: java.util.Map[_, _] =>
      val vt = dt.asInstanceOf[MapType].valueType
      val entries = m.asScala.toSeq
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        entries.map(e => toCatalyst(e._1.asInstanceOf[AnyRef], StringType))
          .toArray,
        entries.map(e => toCatalyst(e._2.asInstanceOf[AnyRef], vt)).toArray)
    case other => other // int/long/float/double/boolean box directly
  }

  /** True when any node of the (resolved) Avro schema carries a MILLIS
    * timestamp logical type — the one mapping whose internal encodings
    * do NOT coincide (Spark timestamps are micros), so decode needs the
    * schema-threaded [[toCatalystResolved]] instead of the zero-overhead
    * [[toCatalyst]] pass-through. Computed once per reader, never per
    * record. */
  def needsLogicalDecode(s: AvroSchema): Boolean = {
    import org.apache.avro.LogicalTypes
    s.getType match {
      case AvroSchema.Type.UNION  => s.getTypes.asScala.exists(needsLogicalDecode)
      case AvroSchema.Type.RECORD =>
        s.getFields.asScala.exists(f => needsLogicalDecode(f.schema()))
      case AvroSchema.Type.ARRAY  => needsLogicalDecode(s.getElementType)
      case AvroSchema.Type.MAP    => needsLogicalDecode(s.getValueType)
      case _ => s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis      => true
        case _: LogicalTypes.LocalTimestampMillis => true
        case _                                    => false
      }
    }
  }

  /** [[toCatalyst]] with the writer's Avro schema threaded alongside the
    * Spark type, so logical types whose encodings differ from Spark's
    * internals convert exactly: `timestamp-millis` /
    * `local-timestamp-millis` longs upscale ×1000 to micros (exact —
    * micros strictly refine millis). Containers recurse with the
    * corresponding element/value/field schema; everything else delegates
    * to the plain converter. Only installed when [[needsLogicalDecode]]
    * says the file needs it. */
  def toCatalystResolved(v: AnyRef, dt: DataType, avro: AvroSchema): Any = {
    import org.apache.avro.LogicalTypes
    if (v == null) return null
    val s = nonNullBranch(avro)
    s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.LocalTimestampMillis =>
        return java.lang.Long.valueOf(
          Math.multiplyExact(v.asInstanceOf[java.lang.Long].longValue(), 1000L))
      case _ => ()
    }
    (v, dt) match {
      case (r: GenericRecord, st: StructType) =>
        InternalRow.fromSeq(st.fields.toSeq.map { f =>
          toCatalystResolved(r.get(f.name), f.dataType, s.getField(f.name).schema())
        })
      case (l: java.util.Collection[_], at: ArrayType) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          l.asScala.map(e => toCatalystResolved(
            e.asInstanceOf[AnyRef], at.elementType, s.getElementType)).toArray)
      case (m: java.util.Map[_, _], mt: MapType) =>
        val entries = m.asScala.toSeq
        org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          entries.map(e => toCatalyst(e._1.asInstanceOf[AnyRef], StringType))
            .toArray,
          entries.map(e => toCatalystResolved(
            e._2.asInstanceOf[AnyRef], mt.valueType, s.getValueType)).toArray)
      case _ => toCatalyst(v, dt)
    }
  }

  /** Catalyst internal value → Avro datum for `dt` under `avro` (the
    * field's non-null branch schema), RECURSIVE — the write-side mirror
    * of [[toCatalyst]]. */
  def toAvro(v: Any, dt: DataType, avro: AvroSchema): AnyRef = v match {
    case null => null
    case u: UTF8String => u.toString
    case d: org.apache.spark.sql.types.Decimal =>
      // Decimal with DecimalType(p, s) carries exactly scale s, matching
      // the declared avro decimal scale — unscaled two's-complement bytes
      java.nio.ByteBuffer.wrap(
        d.toJavaBigDecimal.unscaledValue().toByteArray)
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case row: InternalRow =>
      val st = dt.asInstanceOf[StructType]
      val rs = nonNullBranch(avro)
      val rec = new GenericData.Record(rs)
      var i = 0
      while (i < st.length) {
        val f = st.fields(i)
        val fv = if (row.isNullAt(i)) null else row.get(i, f.dataType)
        rec.put(f.name,
          toAvro(fv, f.dataType, rs.getField(f.name).schema()))
        i += 1
      }
      rec
    case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
      val et = dt.asInstanceOf[ArrayType].elementType
      val es = nonNullBranch(avro).getElementType
      val out = new java.util.ArrayList[AnyRef](arr.numElements())
      var i = 0
      while (i < arr.numElements()) {
        out.add(
          if (arr.isNullAt(i)) null
          else toAvro(arr.get(i, et), et, es))
        i += 1
      }
      out
    case m: org.apache.spark.sql.catalyst.util.MapData =>
      val vt = dt.asInstanceOf[MapType].valueType
      val vs = nonNullBranch(avro).getValueType
      val out = new java.util.HashMap[String, AnyRef](m.numElements())
      val ks = m.keyArray(); val vals = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        out.put(ks.getUTF8String(i).toString,
          if (vals.isNullAt(i)) null else toAvro(vals.get(i, vt), vt, vs))
        i += 1
      }
      out
    case other => other.asInstanceOf[AnyRef] // boxed primitives pass through
  }

  private def nonNullBranch(s: AvroSchema): AvroSchema =
    if (s.getType == AvroSchema.Type.UNION)
      s.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL).get
    else s
}

private[v2] class AvroInterchangeTable(schema: StructType, path: String)
  extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"avro_interchange($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(schema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(path, info.schema(), info.queryId())
}

private[v2] class AvroScanBuilder(fullSchema: StructType, path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var pushedLimit: Option[Int] = None

  /** PARTIAL limit pushdown (the [[StagedFdicScanBuilder]] contract): each
    * file's reader stops DECODING after n accepted records; Spark keeps
    * its own global LIMIT above, so the answer is exact at any file
    * split while a LIMIT 10 over a terabyte drop decodes ~10 records per
    * container file. */
  override def pushLimit(n: Int): Boolean = { pushedLimit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // filters evaluate on decoded values with plain equality — meaningful
  // for top-level primitives only (nested comparisons stay Spark-side;
  // date/timestamp/decimal literals arrive in EXTERNAL Java forms that
  // would need a per-type internal conversion before comparing against
  // the decoded representation, so they stay Spark-side too)
  private def filterable(attr: String): Boolean =
    fullSchema.fields.exists(f => f.name == attr && (f.dataType match {
      case _: StructType | _: ArrayType | _: MapType => false
      case DateType | TimestampType | TimestampNTZType |
           _: DecimalType => false
      case _ => true
    }))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(attr, _) => filterable(attr)
      case IsNotNull(attr)  => filterable(attr)
      case _                => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    AvroScan(path, fullSchema, required, pushed, pushedLimit)
}

private[v2] case class AvroScan(path: String, fullSchema: StructType,
                                required: StructType, pushed: Array[Filter],
                                limit: Option[Int] = None)
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Streaming read: a micro-batch per NEWLY-ARRIVED container file — the
    * landing-zone tail a training pipeline runs over an interchange drop
    * directory. The offset is the SNAPSHOT of consumed file names (a
    * set-diff contract, not a monotone counter — interchange producers
    * name files arbitrarily, so a later file can sort before an earlier
    * one and any high-watermark scheme would silently skip it); each
    * batch reads exactly `end.files − start.files`. Drops are assumed
    * append-only (the interchange shape; files deleted mid-stream are
    * simply never re-read). At production file counts the offset JSON
    * grows with the directory — the standard fix is the file-source
    * compaction log; at the landing-zone cadence this source targets,
    * the explicit set keeps replay exactly-once with zero bookkeeping. */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AvroMicroBatchStream(path, fullSchema, required, pushed)

  /** Same rationale as [[StagedFdicScan.estimateStatistics]]: file-size
    * statistics make a small interchange drop a broadcast-join candidate
    * instead of the V2 default "unknown size". */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes =
      StagedFdicSource.listFiles(path).map(f => Files.size(f)).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def description(): String =
    s"AvroInterchangeScan ReadFields: " +
      s"${required.fieldNames.mkString("[", ",", "]")}, " +
      s"PushedFilters: ${pushed.mkString("[", ",", "]")}" +
      limit.fold("")(n => s", PushedLimit: $n")

  override def planInputPartitions(): Array[InputPartition] =
    StagedFdicSource.listFiles(path)
      .map(f => StagedFilePartition(f.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    AvroReaderFactory(fullSchema, required, pushed, limit)
}

private[v2] case class AvroReaderFactory(fullSchema: StructType,
                                         required: StructType,
                                         pushed: Array[Filter],
                                         limit: Option[Int] = None)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(
      p.asInstanceOf[StagedFilePartition].file, fullSchema, required, pushed,
      limit)
}

private[v2] class AvroPartitionReader(file: String,
                                      fullSchema: StructType,
                                      required: StructType,
                                      pushed: Array[Filter],
                                      limit: Option[Int] = None)
  extends PartitionReader[InternalRow] {

  private var emitted = 0

  // decode schema = required columns ∪ pushed-filter columns (a fully
  // pushed filter's column is pruned OUT of `required` by Spark — the
  // StagedFdicPartitionReader lesson); everything else is skipped by
  // Avro's reader-schema resolution, never materialized
  private val decodeFields: Array[StructField] =
    (required.fields ++ pushed.flatMap {
      case EqualTo(attr, _) => fullSchema.fields.find(_.name == attr)
      case IsNotNull(attr)  => fullSchema.fields.find(_.name == attr)
      case _                => None
    }).distinctBy(_.name)
  // Avro schema resolution matches the reader record to the writer record
  // BY FULL NAME, so the projection must be derived from the file's own
  // writer schema (same name/namespace, same per-field schemas), not
  // synthesized — a fresh header read costs one small block
  private val decodeSchema = {
    val header = new DataFileReader[GenericRecord](
      Paths.get(file).toFile, new GenericDatumReader[GenericRecord]())
    val writerSchema = try header.getSchema finally header.close()
    val proj = AvroSchema.createRecord(writerSchema.getName,
      writerSchema.getDoc, writerSchema.getNamespace, false)
    proj.setFields(decodeFields.toSeq.map { f =>
      val wf = writerSchema.getField(f.name)
      require(wf != null, s"column ${f.name} absent from Avro file $file")
      new AvroSchema.Field(wf.name(), wf.schema(), wf.doc(), wf.defaultVal())
    }.asJava)
    proj
  }
  private val fieldIdx = decodeFields.map(_.name).zipWithIndex.toMap
  private val outIdx: Array[Int] =
    required.fieldNames.map(fieldIdx)

  // filter RHS pre-converted to the Catalyst representation once, so the
  // per-record check is a plain equals (UTF8String vs UTF8String, boxed
  // primitives otherwise)
  private val checks: Array[(Int, Any)] = pushed.collect {
    case EqualTo(attr, v) =>
      val dt = fullSchema(attr).dataType
      val cv = v match {
        case s: String => UTF8String.fromString(s)
        case other     => AvroInterchange.toCatalyst(
          other.asInstanceOf[AnyRef], dt)
      }
      (fieldIdx(attr), cv)
  }
  private val notNulls: Array[Int] = pushed.collect {
    case IsNotNull(attr) => fieldIdx(attr)
  }

  private val reader = new DataFileReader[GenericRecord](
    Paths.get(file).toFile,
    new GenericDatumReader[GenericRecord](null, decodeSchema))
  private var current: InternalRow = _

  // per-field decoder, chosen ONCE per reader: the schema-threaded
  // converter only where the field actually carries a millis timestamp
  // somewhere (×1000 upscale to Spark's micros); the zero-overhead plain
  // converter everywhere else
  private val fieldDecode: Array[AnyRef => Any] =
    decodeFields.map { f =>
      val fs = decodeSchema.getField(f.name).schema()
      if (AvroInterchange.needsLogicalDecode(fs))
        (v: AnyRef) => AvroInterchange.toCatalystResolved(v, f.dataType, fs)
      else
        (v: AnyRef) => AvroInterchange.toCatalyst(v, f.dataType)
    }

  override def next(): Boolean = {
    current = null
    if (limit.exists(emitted >= _)) return false // pushed LIMIT: stop early
    while (current == null && reader.hasNext) {
      val rec = reader.next()
      val vals = new Array[Any](decodeFields.length)
      var i = 0
      while (i < decodeFields.length) {
        vals(i) = fieldDecode(i)(rec.get(decodeFields(i).name))
        i += 1
      }
      val ok = notNulls.forall(j => vals(j) != null) &&
        checks.forall { case (j, cv) => vals(j) != null && (vals(j) match {
          case b: Array[Byte] => java.util.Arrays.equals(
            b, cv.asInstanceOf[Array[Byte]])
          case x => x == cv
        })}
      if (ok) { current = InternalRow.fromSeq(outIdx.toSeq.map(vals)); emitted += 1 }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** Serializable micro-batch offset: the set of file names consumed so
  * far. JSON form is a sorted array — deterministic, so checkpoint
  * equality is textual equality. */
private[v2] case class AvroFilesOffset(files: Set[String])
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.writeValueAsString(files.toSeq.sorted.toArray)
  }
}

private[v2] object AvroFilesOffset {
  def fromJson(json: String): AvroFilesOffset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    AvroFilesOffset(mapper.readValue(json,
      classOf[Array[String]]).toSet)
  }
}

private[v2] class AvroMicroBatchStream(path: String, fullSchema: StructType,
                                       required: StructType,
                                       pushed: Array[Filter])
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.{Offset => StreamOffset}

  private def currentFiles: Set[String] =
    StagedFdicSource.listFiles(path).map(_.getFileName.toString).toSet

  override def initialOffset(): StreamOffset = AvroFilesOffset(Set.empty)
  override def latestOffset(): StreamOffset = AvroFilesOffset(currentFiles)
  override def deserializeOffset(json: String): StreamOffset =
    AvroFilesOffset.fromJson(json)

  override def planInputPartitions(start: StreamOffset,
                                   end: StreamOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[AvroFilesOffset].files
    val e = end.asInstanceOf[AvroFilesOffset].files
    (e -- s).toSeq.sorted
      .map(f => StagedFilePartition(s"$path/$f"): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    AvroReaderFactory(fullSchema, required, pushed, None)

  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
}

/** Write side: the staged sink's two-phase commit protocol verbatim
  * (hidden temp dir, task files atomically renamed in at job commit,
  * truncate snapshots-old/moves-new/deletes-last), writing Avro container
  * files with deflate compression — the interchange default. */
private[v2] class AvroWriteBuilder(path: String, schema: StructType,
                                   queryId: String)
  extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = AvroBatchWrite(path, schema, doTruncate)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      AvroStreamingWrite(path, schema, queryId)
  }
}

/** Streaming Avro sink: the [[StagedFdicStreamingWrite]] protocol on Avro
  * container files — per-EPOCH two-phase commit, task files named
  * `epoch-<id>-<queryTag>-part-<pid>-<tid>.avro`, and a re-delivered
  * epoch REPLACES its own prior files (delete-then-rename keyed on the
  * stable streaming queryId) instead of duplicating them — idempotent,
  * effectively exactly-once file output under the at-least-once epoch
  * redelivery every long-lived stream eventually sees. Appends across
  * epochs and across queries accumulate; the batch reader lists epoch
  * files like any other container file. */
private[v2] case class AvroStreamingWrite(path: String, schema: StructType,
                                          queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val stagingDir = s"$path/.staging-stream-${java.util.UUID.randomUUID()}"
  private val runTag = queryId.take(8)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    Files.createDirectories(Paths.get(stagingDir))
    AvroStreamingWriterFactory(stagingDir, schema, runTag)
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val target = Paths.get(path)
    Files.createDirectories(target)
    StagedFdicSource.listFiles(path)
      .filter(_.getFileName.toString.startsWith(s"epoch-$epochId-$runTag-"))
      .foreach(Files.delete)
    messages.foreach { case StagedTaskCommit(tmp) =>
      val f = Paths.get(tmp)
      Files.move(f, target.resolve(f.getFileName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    StagedFdicSource.dropStaging(stagingDir)
}

private[v2] case class AvroStreamingWriterFactory(stagingDir: String,
                                                  schema: StructType,
                                                  runTag: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(
      s"$stagingDir/epoch-$epochId-$runTag-part-$partitionId-$taskId.avro",
      schema)
}

private[v2] case class AvroBatchWrite(path: String, schema: StructType,
                                      truncate: Boolean)
  extends BatchWrite {

  private val stagingDir = s"$path/.staging-${java.util.UUID.randomUUID()}"
  private val jobTag = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(stagingDir))
    AvroWriterFactory(stagingDir, schema, jobTag)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = Paths.get(path)
    Files.createDirectories(target)
    val old =
      if (truncate) StagedFdicSource.listFiles(path)
      else Seq.empty[java.nio.file.Path]
    messages.foreach { case StagedTaskCommit(tmp) =>
      val f = Paths.get(tmp)
      Files.move(f, target.resolve(f.getFileName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    old.foreach(Files.deleteIfExists)
    StagedFdicSource.dropStaging(stagingDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    StagedFdicSource.dropStaging(stagingDir)
}

private[v2] case class AvroWriterFactory(stagingDir: String,
                                         schema: StructType, jobTag: String)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(
      s"$stagingDir/part-$partitionId-$taskId-$jobTag.avro", schema)
}

private[v2] class AvroDataWriter(file: String, schema: StructType)
  extends DataWriter[InternalRow] {

  private val avroSchema = AvroInterchange.toAvroSchema(schema, "row")
  private val writer = new DataFileWriter[GenericRecord](
    new GenericDatumWriter[GenericRecord](avroSchema))
  writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
  writer.create(avroSchema, Paths.get(file).toFile)

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val v: AnyRef =
        if (row.isNullAt(i)) null
        else f.dataType match {
          // primitives stay on the direct accessor fast path; nested
          // types go through the recursive converter
          case StringType  => row.getUTF8String(i).toString
          case LongType    => java.lang.Long.valueOf(row.getLong(i))
          case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
          case DoubleType  => java.lang.Double.valueOf(row.getDouble(i))
          case FloatType   => java.lang.Float.valueOf(row.getFloat(i))
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
          case BinaryType  => java.nio.ByteBuffer.wrap(row.getBinary(i))
          case dt => AvroInterchange.toAvro(
            row.get(i, dt), dt, avroSchema.getField(f.name).schema())
        }
      rec.put(f.name, v)
      i += 1
    }
    writer.append(rec)
  }

  override def commit(): WriterCommitMessage = {
    writer.close(); StagedTaskCommit(file)
  }
  override def abort(): Unit = {
    writer.close(); Files.deleteIfExists(Paths.get(file))
  }
  override def close(): Unit = ()
}
