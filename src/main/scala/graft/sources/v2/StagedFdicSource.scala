package graft.sources.v2

import java.nio.file.{Files, Path, Paths}
import java.util.stream.Collectors

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for the FDIC staging format: JSONL files whose every
  * line is `{"data": {"FIELD": value, ...}}` (the shape
  * [[graft.sources.Ingest.stageFdicResponse]] writes and the reference
  * appends at Helpers_FunctionsDicts.py:40-51). The V1 path reads these with
  * `spark.read.json` + a `json_tuple` generator projection
  * ([[graft.pipeline.Bronze.readStagedFdicJson]]); this connector is the
  * same scan as a first-class table with the two pushdowns that matter at
  * the ingest edge:
  *
  *  - '''column pruning''' ([[SupportsPushDownRequiredColumns]]): only the
  *    requested fields are extracted per line — the generic JSON reader
  *    tokenizes every field of every record no matter the projection;
  *  - '''filter pushdown''' ([[SupportsPushDownFilters]]): `EqualTo` /
  *    `IsNotNull` on string fields evaluate inside the reader, so filtered
  *    records never become rows (`PushedFilters` is visible in
  *    `explain`, mirroring the parquet scans).
  *
  * Parallelism is one [[InputPartition]] per staged file — ingest staging
  * produces one file per (cert-range × quarter) request, so file count
  * scales with ingest width and no single file needs splitting (real
  * analytical reads happen after the immediate bronze-parquet landing;
  * this source exists to make the landing itself distributed instead of a
  * driver loop). All values surface as strings, exactly like the
  * `json_tuple` path (bronze is schema-on-read; silver applies the declared
  * schemas).
  *
  * Usage: `spark.read.format(classOf[StagedFdicSource].getName)
  * .option("fields", "CERT,NAME,...").load(path)` — `fields` optional; when
  * absent the schema is inferred from the first line's keys.
  */
class StagedFdicSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val fields = Option(options.get("fields")) match {
      case Some(fs) => fs.split(",").map(_.trim).toSeq
      case None =>
        // peek at the first line of the first NON-EMPTY staged file: the
        // V2 writer commits zero-row part files (an empty input partition
        // still opens its file), and they sort arbitrarily among the data
        // files — stopping at the first file would silently infer a
        // zero-column schema for a table that has data
        StagedFdicSource.listFiles(options.get("path")).iterator
          .flatMap { f =>
            val s = Files.lines(f) // close the stream — driver-side leak
            try s.findFirst().map[Option[String]](Some(_)).orElse(None)
            finally s.close()
          }
          .nextOption()
          .map(line => StagedJsonLine.keys(line))
          .getOrElse(Seq.empty)
    }
    StructType(fields.map(StructField(_, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new StagedFdicTable(schema, properties.get("path"))
}

object StagedFdicSource {
  /** Directory listing with the stream CLOSED — one shared definition
    * (graft.sources.TxLog.listDir); a second copy here had already begun
    * to drift in its iterator conversion. */
  private[v2] def listDir(p: Path): Seq[Path] =
    graft.sources.TxLog.listDir(p)

  private[v2] def listFiles(path: String): Seq[Path] = {
    val p = Paths.get(path)
    if (Files.isDirectory(p))
      listDir(p)
        .filter { f =>
          val n = f.getFileName.toString
          // skip writer metadata (_SUCCESS, .crc, hidden files)
          !n.startsWith("_") && !n.startsWith(".") && !n.endsWith(".crc") &&
            Files.isRegularFile(f)
        }
        .sortBy(_.toString)
    else if (Files.exists(p)) Seq(p)
    else Seq.empty
  }

  /** Delete a staging dir and anything left in it (crashed tasks leave
    * orphan temp files whose abort() never ran — a plain delete of a
    * non-empty dir would throw AFTER data was already published). */
  private[v2] def dropStaging(dir: String): Unit = {
    val d = Paths.get(dir)
    if (Files.exists(d)) {
      listDir(d).foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(d)
    }
  }
}

private[v2] class StagedFdicTable(schema: StructType, path: String)
  extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"staged_fdic($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StagedFdicScanBuilder(schema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new StagedFdicWriteBuilder(path, info.schema(), info.queryId())
}

/** A pushed aggregation in the source's own vocabulary: group fields plus
  * (op, field) aggregate specs — op ∈ count_star | count | min | max. */
private[v2] case class PushedAggregation(groups: Seq[String],
                                         funcs: Seq[(String, Option[String])])

/** A pushed top-N sort key: field, descending?, nulls-first? — enough to
  * rebuild the exact row ordering on UTF8String values in the reader. */
private[v2] case class PushedSortKey(field: String, desc: Boolean,
                                     nullsFirst: Boolean)

private[v2] class StagedFdicScanBuilder(fullSchema: StructType, path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  /** Both limit and top-N pushes are PARTIAL: the reader bounds each
    * file's output; Spark keeps its own global LIMIT /
    * TakeOrderedAndProject above, so the answer is exact at any file
    * split. (Explicit override required — SupportsPushDownLimit and
    * SupportsPushDownTopN both declare this default method.) */
  override def isPartiallyPushed(): Boolean = true
  private var pushedAgg: Option[PushedAggregation] = None
  private var pushedLimit: Option[Int] = None
  private var pushedTopN: Option[(Seq[PushedSortKey], Int)] = None

  /** PARTIAL top-N pushdown ([[SupportsPushDownTopN]], completing the V2
    * pushdown family): each file's reader keeps a bounded n-row heap
    * under the pushed sort keys instead of emitting every record;
    * `isPartiallyPushed` stays at its default `true`, so Spark's final
    * TakeOrderedAndProject re-sorts the ≤ n-per-file survivors — exact at
    * any split, and an ORDER BY name LIMIT 10 over terabytes of staging
    * ships 10 rows per file. String fields only (this source's whole
    * schema), compared as UTF8String so the heap agrees byte-for-byte
    * with Spark's final sort on non-ASCII data too. */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    if (pushedAgg.isDefined || pushedLimit.isDefined) return false
    val keys = orders.toSeq.map { o =>
      o.expression() match {
        case fr: NamedReference if fr.fieldNames.length == 1 &&
          fullSchema.fieldNames.contains(fr.fieldNames()(0)) =>
          Some(PushedSortKey(fr.fieldNames()(0),
            o.direction() == SortDirection.DESCENDING,
            o.nullOrdering() == NullOrdering.NULLS_FIRST))
        case _ => None
      }
    }
    if (keys.exists(_.isEmpty)) return false
    pushedTopN = Some((keys.flatten, n))
    true
  }

  /** PARTIAL limit pushdown ([[SupportsPushDownLimit]]): each file's
    * reader stops after `n` accepted records — Spark keeps its own final
    * LIMIT above (isPartiallyPushed stays at its default `true`), so the
    * answer is exact while a `LIMIT 10` over terabytes of staging reads
    * ~10 records per file instead of all of them. Spark only offers the
    * push when every filter below the limit is itself pushed, so "n
    * accepted records" is the correct stopping rule. Never combined with
    * a pushed aggregation (a limit above an aggregate must see all
    * groups; Spark doesn't offer that shape, and the guard keeps the
    * invariant local). */
  override def pushLimit(n: Int): Boolean =
    if (pushedAgg.isDefined || pushedTopN.isDefined) false
    else { pushedLimit = Some(n); true }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(_, _: String) => true
      case IsNotNull(_)          => true
      case _                     => false
    }
    pushed = accepted
    rejected // Spark re-evaluates these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** PARTIAL aggregate pushdown ([[SupportsPushDownAggregates]], the
    * third V2 pushdown — the JDBC-connector shape): COUNT(*)/COUNT(f)/
    * MIN(f)/MAX(f), optionally grouped by source fields, fold INSIDE the
    * per-file reader, so a grouped count over a staged table ships one
    * row per (file, group) to Spark instead of one row per record.
    * `supportCompletePushDown` stays false (the default): Spark plans the
    * final merge (counts summed, min/max re-reduced) above the partial
    * rows — exactly-correct across any file/partition split. Rejected
    * shapes (DISTINCT, AVG/SUM — meaningless on schema-on-read strings,
    * nested refs, expression group keys) return false and Spark falls
    * back to a plain scan + its own aggregate. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    def fieldOf(e: V2Expression): Option[String] = e match {
      case fr: NamedReference if fr.fieldNames.length == 1 &&
        fullSchema.fieldNames.contains(fr.fieldNames()(0)) =>
        Some(fr.fieldNames()(0))
      case _ => None
    }
    val groups = agg.groupByExpressions.toSeq.map(fieldOf)
    if (groups.exists(_.isEmpty)) return false
    val funcs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(("count_star", None: Option[String]))
      case c: Count if !c.isDistinct =>
        fieldOf(c.column).map(f => ("count", Some(f)))
      case m: Min => fieldOf(m.column).map(f => ("min", Some(f)))
      case m: Max => fieldOf(m.column).map(f => ("max", Some(f)))
      case _ => None
    }
    if (funcs.exists(_.isEmpty)) return false
    pushedAgg = Some(PushedAggregation(groups.flatten, funcs.flatten))
    true
  }

  /** Scan output under a pushed aggregation: group columns (their source
    * type — strings here) followed by one column per aggregate, LongType
    * for counts, the field's type for min/max — the positional/type
    * contract Spark's final-merge rewrite expects. */
  private def aggSchema(p: PushedAggregation): StructType =
    StructType(
      p.groups.map(g => StructField(g, StringType, nullable = true)) ++
        p.funcs.zipWithIndex.map { case ((op, f), i) =>
          val dt = if (op.startsWith("count")) LongType else StringType
          StructField(s"agg_${i}_${op}${f.fold("")("_" + _)}", dt,
            nullable = !op.startsWith("count"))
        })

  override def build(): Scan = pushedAgg match {
    case Some(p) => StagedFdicScan(path, aggSchema(p), pushed, Some(p))
    case None =>
      StagedFdicScan(path, required, pushed, None, pushedLimit, pushedTopN)
  }
}

private[v2] case class StagedFdicScan(path: String, required: StructType,
                                      pushed: Array[Filter],
                                      agg: Option[PushedAggregation] = None,
                                      limit: Option[Int] = None,
                                      topN: Option[(Seq[PushedSortKey], Int)] = None)
  extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** File-size statistics let the planner treat small staged tables as
    * broadcast candidates (the same decision parquet scans get from their
    * footers) — without this a V2 scan defaults to "unknown size" and a
    * dimension-sized staging table would sort-merge join. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes =
      StagedFdicSource.listFiles(path).map(f => Files.size(f)).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  override def description(): String =
    s"StagedFdicScan ReadFields: ${required.fieldNames.mkString("[", ",", "]")}, " +
      s"PushedFilters: ${pushed.mkString("[", ",", "]")}" +
      agg.fold("") { p =>
        val fs = p.funcs.map { case (op, f) => s"$op(${f.getOrElse("*")})" }
        s", PushedAggregates: ${fs.mkString("[", ",", "]")}" +
          s", GroupBy: ${p.groups.mkString("[", ",", "]")}"
      } + limit.fold("")(n => s", PushedLimit: $n") +
      topN.fold("") { case (keys, n) =>
        val ks = keys.map(k => k.field +
          (if (k.desc) " DESC" else " ASC") +
          (if (k.nullsFirst) " NULLS FIRST" else " NULLS LAST"))
        s", PushedTopN: ${ks.mkString("[", ",", "]")} limit $n"
      }

  override def planInputPartitions(): Array[InputPartition] =
    StagedFdicSource.listFiles(path)
      .map(f => StagedFilePartition(f.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    StagedFdicReaderFactory(required.fieldNames, pushed, agg, limit, topN)
}

private[v2] case class StagedFilePartition(file: String) extends InputPartition

private[v2] case class StagedFdicReaderFactory(fields: Array[String],
                                               pushed: Array[Filter],
                                               agg: Option[PushedAggregation],
                                               limit: Option[Int] = None,
                                               topN: Option[(Seq[PushedSortKey], Int)] = None)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[StagedFilePartition].file
    (agg, topN) match {
      case (Some(a), _) => new StagedFdicAggregatingReader(file, a, pushed)
      case (None, Some((keys, n))) =>
        new StagedFdicTopNReader(file, fields, pushed, keys, n)
      case _ => new StagedFdicPartitionReader(file, fields, pushed, limit)
    }
  }
}

private[v2] class StagedFdicPartitionReader(file: String,
                                            fields: Array[String],
                                            pushed: Array[Filter],
                                            limit: Option[Int] = None)
  extends PartitionReader[InternalRow] {

  private var emitted = 0

  // A fully-pushed filter's column is pruned OUT of the read schema by
  // Spark (the scan is trusted to apply it), so the line parser must
  // extract filter attributes in addition to the output fields.
  private val parseFields: Array[String] = (fields ++ pushed.flatMap {
    case EqualTo(attr, _) => Seq(attr)
    case IsNotNull(attr)  => Seq(attr)
    case _                => Seq.empty
  }).distinct

  private val lines = Files.lines(Paths.get(file))
  private val it = lines.iterator()
  private var current: InternalRow = _

  private def accepts(vals: Map[String, String]): Boolean = pushed.forall {
    case EqualTo(attr, v: String) => vals.get(attr).exists(x => x != null && x == v)
    case IsNotNull(attr)          => vals.get(attr).exists(_ != null)
    case _                        => true
  }

  override def next(): Boolean = {
    current = null
    if (limit.exists(emitted >= _)) return false // pushed LIMIT: stop early
    while (current == null && it.hasNext) {
      val line = it.next()
      if (line.nonEmpty) {
        val vals = StagedJsonLine.extract(line, parseFields)
        if (accepts(vals)) {
          current = InternalRow.fromSeq(fields.toSeq.map(f =>
            vals.get(f).filter(_ != null).map(UTF8String.fromString).orNull))
          emitted += 1
        }
      }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

/** The partial top-N reader: scans the file's filtered records through a
  * BOUNDED n-row heap ordered by the pushed sort keys, then emits the
  * survivors in sorted order — ≤ n rows leave the file no matter its size.
  * Exactness contract: `isPartiallyPushed` is true, so Spark's
  * TakeOrderedAndProject re-sorts and re-limits the per-file survivors;
  * the per-file top-n is a superset of that file's contribution to the
  * global top-n UP TO KEY TIES (any globally-selected row is ≥ its file's
  * n-th best), so the final answer is a VALID top-N under Spark's own tie
  * nondeterminism: the heap rejects an incoming row that ties the
  * boundary on every sort key, so when tied rows differ in non-key output
  * columns the pushed plan may surface a different — equally correct —
  * member of the tie group than the un-pushed plan would (exactly the
  * freedom Spark's final sort itself has across partition orderings; an
  * ORDER BY whose keys don't fully determine the row never promises a
  * unique answer). Set-equality tests must therefore compare on the sort
  * keys, not on full rows, when tied data is present (see the
  * StagedFdicSourceSpec tie cases). Comparisons are [[UTF8String]] byte
  * order — the SAME ordering Spark's final sort applies to string
  * columns — so heap eviction can never disagree with the final sort on
  * non-ASCII data. Sort-key fields are parsed even when pruned from the
  * output projection (Spark keeps them in `required` for its final sort,
  * but the reader must not depend on that). */
private[v2] class StagedFdicTopNReader(file: String,
                                       fields: Array[String],
                                       pushed: Array[Filter],
                                       keys: Seq[PushedSortKey],
                                       n: Int)
  extends PartitionReader[InternalRow] {

  private val parseFields: Array[String] =
    (fields ++ keys.map(_.field) ++ pushed.flatMap {
      case EqualTo(attr, _) => Seq(attr)
      case IsNotNull(attr)  => Seq(attr)
      case _                => Seq.empty
    }).distinct

  private def accepts(vals: Map[String, String]): Boolean = pushed.forall {
    case EqualTo(attr, v: String) => vals.get(attr).exists(x => x != null && x == v)
    case IsNotNull(attr)          => vals.get(attr).exists(_ != null)
    case _                        => true
  }

  /** Output-order comparator over (sortKeyValues, outputRow) pairs:
    * negative ⇒ `a` sorts before `b`. NULLS FIRST means null precedes
    * non-null in the OUTPUT order regardless of ASC/DESC (Spark's
    * NullOrdering is resolved, not relative to direction). */
  private def cmp(a: Array[UTF8String], b: Array[UTF8String]): Int = {
    var i = 0
    while (i < keys.length) {
      val k = keys(i); val x = a(i); val y = b(i)
      val c =
        if (x == null && y == null) 0
        else if (x == null) { if (k.nullsFirst) -1 else 1 }
        else if (y == null) { if (k.nullsFirst) 1 else -1 }
        else { val c0 = x.compareTo(y); if (k.desc) -c0 else c0 }
      if (c != 0) return c
      i += 1
    }
    0
  }

  // max-heap under the output order: the root is the WORST retained row,
  // evicted when a better one arrives — classic bounded top-n, O(file·log n)
  private val heap = new java.util.PriorityQueue[(Array[UTF8String], InternalRow)](
    math.max(1, n),
    (p: (Array[UTF8String], InternalRow), q: (Array[UTF8String], InternalRow)) =>
      -cmp(p._1, q._1))

  locally {
    val lines = Files.lines(Paths.get(file))
    try {
      val it = lines.iterator()
      while (it.hasNext) {
        val line = it.next()
        if (line.nonEmpty) {
          val vals = StagedJsonLine.extract(line, parseFields)
          if (accepts(vals)) {
            val kv = keys.map(k =>
              vals.get(k.field).filter(_ != null)
                .map(UTF8String.fromString).orNull).toArray
            if (heap.size < n) {
              heap.add((kv, InternalRow.fromSeq(fields.toSeq.map(f =>
                vals.get(f).filter(_ != null).map(UTF8String.fromString).orNull))))
            } else if (n > 0 && cmp(kv, heap.peek()._1) < 0) {
              heap.poll()
              heap.add((kv, InternalRow.fromSeq(fields.toSeq.map(f =>
                vals.get(f).filter(_ != null).map(UTF8String.fromString).orNull))))
            }
          }
        }
      }
    } finally lines.close()
  }

  private val out = {
    val arr = new Array[(Array[UTF8String], InternalRow)](heap.size)
    var i = arr.length - 1
    while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // drain worst-first → sorted
    arr.iterator.map(_._2)
  }
  private var current: InternalRow = _
  override def next(): Boolean = {
    current = if (out.hasNext) out.next() else null
    current != null
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** The partial-aggregation reader: folds the pushed COUNT/MIN/MAX specs
  * over the file's filtered records and emits ONE row per group (group
  * key columns first, then aggregate columns — the [[StagedFdicScan]]
  * schema contract). MIN/MAX compare as [[UTF8String]] (byte order), the
  * SAME ordering Spark's final merge applies — a Java-String comparison
  * here could disagree with the final reduce on non-ASCII data. For a
  * GLOBAL aggregate (no group keys) exactly one row is emitted even from
  * an empty file, so a count over an empty table merges to 0, not NULL.
  * State is |groups-in-this-file| accumulator rows — the whole point of
  * the pushdown: a grouped count over 100 TB of staging ships
  * |files| × |groups| rows to Spark instead of every record. */
private[v2] class StagedFdicAggregatingReader(file: String,
                                              agg: PushedAggregation,
                                              pushed: Array[Filter])
  extends PartitionReader[InternalRow] {

  private val parseFields: Array[String] =
    (agg.groups ++ agg.funcs.flatMap(_._2) ++ pushed.flatMap {
      case EqualTo(attr, _) => Seq(attr)
      case IsNotNull(attr)  => Seq(attr)
      case _                => Seq.empty
    }).distinct.toArray

  private def accepts(vals: Map[String, String]): Boolean = pushed.forall {
    case EqualTo(attr, v: String) => vals.get(attr).exists(x => x != null && x == v)
    case IsNotNull(attr)          => vals.get(attr).exists(_ != null)
    case _                        => true
  }

  // group key (null-safe) -> one accumulator slot per aggregate spec:
  // counts as Long, min/max as UTF8String (null until a value is seen)
  private val acc =
    scala.collection.mutable.LinkedHashMap[Seq[UTF8String], Array[Any]]()
  private def freshSlots(): Array[Any] = agg.funcs.map {
    case (op, _) if op.startsWith("count") => 0L: Any
    case _                                 => null: Any
  }.toArray
  if (agg.groups.isEmpty) acc(Seq.empty) = freshSlots() // global: 1 row always

  locally {
    val lines = Files.lines(Paths.get(file))
    try {
      val it = lines.iterator()
      while (it.hasNext) {
        val line = it.next()
        if (line.nonEmpty) {
          val vals = StagedJsonLine.extract(line, parseFields)
          if (accepts(vals)) {
            val key = agg.groups.map(g =>
              vals.get(g).filter(_ != null).map(UTF8String.fromString).orNull)
            val slots = acc.getOrElseUpdate(key, freshSlots())
            var i = 0
            agg.funcs.foreach { case (op, f) =>
              val v = f.flatMap(vals.get).filter(_ != null)
              op match {
                case "count_star" => slots(i) = slots(i).asInstanceOf[Long] + 1L
                case "count" =>
                  if (v.isDefined) slots(i) = slots(i).asInstanceOf[Long] + 1L
                case "min" => v.map(UTF8String.fromString).foreach { u =>
                  val cur = slots(i).asInstanceOf[UTF8String]
                  if (cur == null || u.compareTo(cur) < 0) slots(i) = u
                }
                case "max" => v.map(UTF8String.fromString).foreach { u =>
                  val cur = slots(i).asInstanceOf[UTF8String]
                  if (cur == null || u.compareTo(cur) > 0) slots(i) = u
                }
              }
              i += 1
            }
          }
        }
      }
    } finally lines.close()
  }

  private val out = acc.iterator.map { case (key, slots) =>
    InternalRow.fromSeq(key ++ slots.toSeq)
  }
  private var current: InternalRow = _
  override def next(): Boolean = {
    current = if (out.hasNext) out.next() else null
    current != null
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Write side: the K5 staging sink as a distributed V2 write with a
  * two-phase commit. Each task writes its partition to a hidden temp file
  * (`.staging-<jobId>/part-<pid>-<tid>.json`); the driver's job-level
  * `commit` atomically renames all task files into the target directory
  * (truncating it first under overwrite mode), and `abort` deletes the temp
  * dir — a failed or speculative task never leaves partial data visible.
  * String columns only (bronze staging is schema-on-read by design). */
private[v2] class StagedFdicWriteBuilder(path: String, schema: StructType,
                                         queryId: String)
  extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      StagedFdicBatchWrite(path, schema.fieldNames, doTruncate)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      StagedFdicStreamingWrite(path, schema.fieldNames, queryId)
  }
}

private[v2] case class StagedTaskCommit(tempFile: String)
  extends WriterCommitMessage

private[v2] case class StagedFdicBatchWrite(path: String,
                                            fields: Array[String],
                                            truncate: Boolean)
  extends BatchWrite {

  private val stagingDir = s"$path/.staging-${java.util.UUID.randomUUID()}"
  // per-JOB tag in the data-file names: task ids restart at 0 in every
  // application, so bare part-<pid>-<tid>.json names from a later append
  // run would ATOMIC_MOVE-replace (rename(2) semantics) an earlier run's
  // files — silent data loss across runs
  private val jobTag = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(stagingDir))
    StagedFdicWriterFactory(stagingDir, fields, jobTag)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = Paths.get(path)
    Files.createDirectories(target)
    // truncate ordering: snapshot the OLD file list, move the NEW files in
    // (the job tag guarantees their names can't collide with old files),
    // and delete the old set LAST. Deleting first would make a mid-commit
    // IOException destructive — the k-th move failing triggers abort(),
    // which drops the unmoved staged files, leaving neither old nor new
    // data. With this ordering the worst mid-commit outcome is old+partial-
    // new visible together (recoverable duplicates), never data loss.
    val old =
      if (truncate) StagedFdicSource.listFiles(path) else Seq.empty[Path]
    messages.foreach { case StagedTaskCommit(tmp) =>
      val f = Paths.get(tmp)
      Files.move(f, target.resolve(f.getFileName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    old.foreach(Files.deleteIfExists)
    // crashed tasks can leave orphans whose abort() never ran — the
    // staging teardown must tolerate them (deleteIfExists on a non-empty
    // dir would fail the job AFTER its data became visible)
    StagedFdicSource.dropStaging(stagingDir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    StagedFdicSource.dropStaging(stagingDir)
}

private[v2] case class StagedFdicWriterFactory(stagingDir: String,
                                               fields: Array[String],
                                               jobTag: String)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new StagedFdicDataWriter(
      s"$stagingDir/part-$partitionId-$taskId-$jobTag.json", fields)
}

/** Streaming write: the same two-phase commit, per EPOCH. Task files are
  * named `epoch-<id>-part-<pid>-<tid>.json`; the epoch-level `commit` first
  * DELETES any already-visible files of that epoch, then atomically renames
  * the new ones in — so a re-delivered epoch (failure between the sink
  * commit and the checkpoint write, the classic streaming at-least-once
  * window) REPLACES its previous output instead of duplicating it. Combined
  * with the engine's checkpoint tracking this gives idempotent, effectively
  * exactly-once file output — the property every streaming sink at scale
  * must provide, because epoch redelivery is a certainty over enough
  * machine-hours. Appends across epochs accumulate (the K1 quarterly-load
  * shape); the V2 reader lists epoch files like any other staged file. */
private[v2] case class StagedFdicStreamingWrite(path: String,
                                                fields: Array[String],
                                                queryId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val stagingDir = s"$path/.staging-stream-${java.util.UUID.randomUUID()}"
  // per-QUERY tag (Spark's streaming queryId — stable across RESTARTS of
  // the same checkpoint, distinct for a new query): epoch ids restart at 0
  // for a fresh checkpoint, so a bare epoch-<id>- replace key would make a
  // later query's epoch-0 commit delete an EARLIER query's accumulated
  // epoch-0 files as presumed redelivery. A random per-instance tag would
  // fail the OTHER direction — a restarted query builds a new
  // StreamingWrite, and its redelivered epoch must still replace the
  // pre-crash attempt's files. The queryId is exactly the key with both
  // properties; cross-query appends accumulate (the K1 quarterly-load
  // shape).
  private val runTag = queryId.take(8)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    Files.createDirectories(Paths.get(stagingDir))
    StagedFdicStreamingWriterFactory(stagingDir, fields, runTag)
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val target = Paths.get(path)
    Files.createDirectories(target)
    // idempotence: a re-committed epoch replaces ITS OWN prior output
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

private[v2] case class StagedFdicStreamingWriterFactory(stagingDir: String,
                                                        fields: Array[String],
                                                        runTag: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new StagedFdicDataWriter(
      s"$stagingDir/epoch-$epochId-$runTag-part-$partitionId-$taskId.json",
      fields)
}

private[v2] class StagedFdicDataWriter(file: String, fields: Array[String])
  extends DataWriter[InternalRow] {

  private val out = Files.newBufferedWriter(Paths.get(file))

  override def write(row: InternalRow): Unit = {
    val body = fields.indices.map { i =>
      val v = if (row.isNullAt(i)) "null"
        else "\"" + StagedJsonLine.escape(row.getUTF8String(i).toString) + "\""
      "\"" + fields(i) + "\": " + v
    }.mkString("{", ", ", "}")
    out.write(s"""{"data": $body}""")
    out.newLine()
  }

  override def commit(): WriterCommitMessage = { out.close(); StagedTaskCommit(file) }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(Paths.get(file)) }
  override def close(): Unit = ()
}

/** Minimal scanner for one staged line `{"data": {k: v, ...}}`. Values
  * surface as strings exactly as `json_tuple` renders them: quoted strings
  * unescaped, numbers/booleans as written, `null` as SQL NULL. Flat objects
  * only — the staging writer never nests (Ingest.stageFdicResponse). */
private[v2] object StagedJsonLine {

  /** JSON string escape for the write side (inverse of [[readString]]).
    * ALL control chars must escape (RFC 8259): a raw backspace or NUL in the
    * line is invalid JSON that the V1 spark.read.json path turns into a
    * _corrupt_record, breaking the V1/V2 equivalence the connector is
    * specified against. */
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\t' => "\\t"
    case '\r' => "\\r"
    case '\b' => "\\b"
    case '\f' => "\\f"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c    => c.toString
  }

  def keys(line: String): Seq[String] = {
    val inner = innerObject(line)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < inner.length) {
      i = skipWs(inner, i)
      if (i < inner.length && inner(i) == '"') {
        val (k, after) = readString(inner, i)
        out += k
        i = skipWs(inner, after)
        if (i < inner.length && inner(i) == ':') i = skipValue(inner, i + 1)
      } else i += 1
    }
    out.toSeq
  }

  /** Extract the requested fields' values (null for JSON null / absent). */
  def extract(line: String, wanted: Array[String]): Map[String, String] = {
    val inner = innerObject(line)
    val want = wanted.toSet
    var out = Map.empty[String, String]
    var i = 0
    while (i < inner.length && out.size < want.size) {
      i = skipWs(inner, i)
      if (i < inner.length && inner(i) == '"') {
        val (k, after) = readString(inner, i)
        var j = skipWs(inner, after)
        if (j < inner.length && inner(j) == ':') {
          j = skipWs(inner, j + 1)
          val (v, next) = readValue(inner, j)
          if (want.contains(k)) out += (k -> v)
          i = next
        } else i = j
      } else i += 1
    }
    out
  }

  private def innerObject(line: String): String = {
    val start = line.indexOf("\"data\"")
    if (start < 0) return ""
    val open = line.indexOf('{', start)
    if (open < 0) return ""
    var depth = 0; var i = open; var inStr = false; var esc = false
    while (i < line.length) {
      val c = line(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) return line.substring(open + 1, i)
        case _ =>
      }
      i += 1
    }
    ""
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && (s(i) == ' ' || s(i) == '\t' || s(i) == ',')) i += 1
    i
  }

  /** Returns (unescaped content, index after closing quote). Decodes the
    * full RFC 8259 escape set — \uXXXX in particular, which ASCII-safe
    * JSON writers (Jackson with escapeNonAscii, many producers) emit for
    * any non-ASCII character: dropping the backslash would silently
    * corrupt the value and diverge from the V1 json_tuple path. */
  private def readString(s: String, from: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = from + 1; var esc = false
    while (i < s.length) {
      val c = s(i)
      if (esc) {
        c match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
          case 'b' => sb += '\b'; case 'f' => sb += '\f'
          case 'u' if i + 4 < s.length &&
              s.substring(i + 1, i + 5).forall(ch =>
                Character.digit(ch, 16) >= 0) =>
            sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
            i += 4
          // malformed escape (non-hex digits, or truncated so the closing
          // quote falls inside the 4-char window): keep the characters
          // literally instead of throwing — one corrupt staged line must
          // degrade like the V1 json reader does, not fail the whole scan
          case other => sb += other
        }
        esc = false
      } else if (c == '\\') esc = true
      else if (c == '"') return (sb.toString, i + 1)
      else sb += c
      i += 1
    }
    (sb.toString, i)
  }

  /** Returns (rendered value or null, index after the value). */
  private def readValue(s: String, from: Int): (String, Int) = {
    if (from >= s.length) return (null, from)
    if (s(from) == '"') { val (v, n) = readString(s, from); (v, n) }
    else {
      var i = from
      while (i < s.length && s(i) != ',' && s(i) != '}') i += 1
      val raw = s.substring(from, i).trim
      (if (raw == "null" || raw.isEmpty) null else raw, i)
    }
  }

  private def skipValue(s: String, from: Int): Int =
    readValue(s, skipWs(s, from))._2
}
