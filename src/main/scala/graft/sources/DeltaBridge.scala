package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Delta-protocol interchange WITHOUT the Delta jar: the reference's gold
  * layer writes Delta tables (BuildGoldLayer.py:219-234); this classpath
  * ships no delta-spark, but the Delta transaction-log format itself is an
  * open specification — JSON action files under `_delta_log/` plus
  * parquet checkpoints — so the engine speaks it at the protocol level:
  *
  *  - [[exportLog]] materializes a [[TxLog]] table's commit history as a
  *    spec-compliant `_delta_log` (protocol + metaData at version 0, one
  *    `add`/`remove` action per file per commit, per-add data-skipping
  *    `stats` lifted from the parquet footers), so ANY Delta reader —
  *    delta-spark, delta-rs, DuckDB's delta extension, Trino — can mount
  *    the table, prune on its statistics, and time-travel its history;
  *  - [[read]] reconstructs a snapshot from any protocol-v1 `_delta_log`
  *    written by a real Delta writer: `_last_checkpoint` bootstrap (the
  *    checkpoint is itself parquet — Spark reads it natively), JSON action
  *    replay above the checkpoint, `versionAsOf` time travel, and the
  *    metaData `schemaString` applied as the read schema (it IS a Spark
  *    schema JSON — the one part of the format that is Spark-native).
  *
  * PARTITIONED tables (the reference's actual gold shape —
  * `partitionBy(institution_type, state)` / `(year, quarter, state)`,
  * BuildGoldLayer.py:217-226) are first-class: [[TxLog.appendPartitioned]]
  * stages Hive-layout files, exportLog parses the `col=value` path
  * segments into per-add `partitionValues` and records `partitionColumns`
  * in metaData (the delta-rs/delta-spark wire shape), and [[read]] prunes
  * add actions against a `partitionFilter` at the METADATA level — the
  * same log-level pruning a real Delta reader performs before planning
  * any scan — then reconstructs partition columns from the layout.
  *
  * Scale: the log is metadata — actions are O(files), the checkpoint
  * bootstrap reads one parquet, and data files are never touched until
  * the returned DataFrame's own scan. Partition pruning happens twice,
  * both metadata-priced: once against the action list here, once more by
  * Catalyst's own partition-directory pruning inside the scan. This is
  * exactly how production Delta readers behave; nothing here is a toy
  * shortcut.
  */
object DeltaBridge {

  private val mapper = new ObjectMapper()

  private def deltaLogDir(table: String): Path =
    Paths.get(table, "_delta_log")

  private def deltaVersionFile(table: String, v: Long): Path =
    deltaLogDir(table).resolve(f"$v%020d.json")

  // -------------------------------------------------- Hive path parsing

  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Unescape Spark/Hive partition-dir percent-encoding (the inverse of
    * ExternalCatalogUtils.escapePathName — '%XX' hex sequences). */
  private[sources] def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split a staged relative path into (non-partition prefix, trailing
    * `col=value` run) — the TRAILING consecutive `k=v` directories
    * immediately above the file, which is exactly the run Spark's own
    * bottom-up partition-discovery walk collects (a `k=v`-shaped segment
    * higher up, below a non-`k=v` one, is part of the opaque prefix).
    * Values unescape Hive percent-encoding; `__HIVE_DEFAULT_PARTITION__`
    * maps to null. */
  private[sources] def splitHivePath(path: String)
      : (String, Seq[(String, String)]) = {
    val dirs = path.split('/').dropRight(1).toSeq
    var i = dirs.length
    while (i > 0 && dirs(i - 1).indexOf('=') > 0) i -= 1
    val pvs = dirs.drop(i).map { seg =>
      val eq = seg.indexOf('=')
      val v = unescapePathName(seg.substring(eq + 1))
      (unescapePathName(seg.substring(0, eq)),
        if (v == HiveDefaultPartition) null else v)
    }
    (dirs.take(i).mkString("/"), pvs)
  }

  /** The trailing `col=value` segments of a staged relative path —
    * (column, unescaped value or null). */
  private[sources] def pathPartitionValues(path: String): Seq[(String, String)] =
    splitHivePath(path)._2

  // ------------------------------------------------------------- export

  /** Write `table`'s TxLog history as a Delta `_delta_log`. TxLog version
    * i (ascending commit order) becomes Delta version i-minus-first —
    * Delta versions MUST start at 0 and be contiguous (the protocol's
    * replay rule), while TxLog versions just ascend. Re-export is
    * idempotent AND identity-stable: existing version files are left in
    * place (they are immutable once published — the same contract TxLog's
    * own createLink arbitration enforces), and an export EXTENDING a
    * published log re-reads version 0's metaData `id` and the latest
    * published `schemaString` instead of minting fresh ones — the Delta
    * spec makes the table id immutable for the log's lifetime (streaming/
    * CDC readers key on it), and a redundant metaData action on an
    * unchanged schema would be spec noise. Partitioned TxLog tables
    * (Hive-layout entries from [[TxLog.appendPartitioned]]) export with
    * `partitionColumns` in metaData and per-add `partitionValues`; the
    * partition column SET is fixed at version 0 and a later commit whose
    * layout disagrees fails loud. Returns the number of Delta versions. */
  def exportLog(spark: SparkSession, table: String): Int = {
    val vs = TxLog.versions(table)
    require(vs.nonEmpty, s"exportLog: $table has no commits")
    Files.createDirectories(deltaLogDir(table))

    // one table id across re-exports: version files are immutable, so a
    // later export extending the log must agree with version 0's id and
    // compare schemas against the latest PUBLISHED metaData, not null —
    // seed both from the existing log through the reader path. The seed
    // is CACHED per table, validated against (head, checkpoint) so a
    // streaming sink's per-micro-batch export pays the checkpoint-parquet
    // read + JSON replay once, not once per batch (r12 review finding);
    // any foreign commit or new checkpoint misses the frontier check and
    // re-seeds, and version files are immutable so a stale hit is
    // impossible. ONE entry per table — keying by frontier would grow an
    // entry per micro-batch on exactly the streaming path the memo exists
    // for (r12 second-pass finding).
    val published = versions(table)
    val ckptSeed = lastCheckpointVersion(table)
    val frontier = (published.lastOption.getOrElse(-1L),
      ckptSeed.getOrElse(-1L))
    val seed: Option[(String, String, Seq[String])] =
      if (published.nonEmpty || ckptSeed.isDefined)
        Some(Option(exportSeedCache.get(table))
          .collect { case (f, v) if f == frontier => v }
          .getOrElse {
            val st = readState(spark, table, None)
            val v = (st.metaId, st.schemaJson, st.partitionCols)
            exportSeedCache.put(table, (frontier, v))
            v
          })
      else None
    val tableId = seed.flatMap(s => Option(s._1))
      .getOrElse(java.util.UUID.randomUUID().toString)
    var lastSchemaJson: String = seed.map(_._2).orNull
    var partCols: Seq[String] = seed.map(_._3).getOrElse(Seq.empty)
    var partColsFixed: Boolean = seed.isDefined

    // schema of one staged add path, from its parquet footer (partition
    // columns appended Hive-style for partitioned layouts)
    def schemaOfAdd(p: String): String =
      if (pathPartitionValues(p).isEmpty) spark.read.parquet(s"$table/$p").schema.json
      else {
        val (prefix, _) = splitHivePath(p)
        val bp = if (prefix.isEmpty) table else s"$table/$prefix"
        spark.read.option("basePath", bp).parquet(s"$table/$p").schema.json
      }

    // version 0 MUST carry a metaData action (the spec: every snapshot
    // resolves exactly one) — but a ZERO-ADD first commit (an empty first
    // micro-batch, an empty quarterly refresh) has no files to derive a
    // schema from. Borrow it from the FIRST commit that has adds, fixing
    // the partition layout from the same commit; with no data anywhere
    // yet, DEFER the whole export — a schema-less version 0 would be
    // unreadable by every Delta reader including this bridge (r12 review
    // finding).
    var borrowedSchema: String = null
    if (lastSchemaJson == null) {
      val firstAdd = vs.iterator
        .map(v => TxLog.commitActions(table, v)._1)
        .find(_.nonEmpty)
        .flatMap(_.headOption.map(TxLog.entryPath))
      firstAdd match {
        case None => return 0 // nothing but empty commits — export later
        case Some(p) =>
          borrowedSchema = schemaOfAdd(p)
          if (!partColsFixed) {
            partCols = pathPartitionValues(p).map(_._1)
            partColsFixed = true
          }
      }
    }

    // LOG RETENTION boundary: versions at or below a published checkpoint
    // are SERVED by it — when [[vacuumLog]] has deleted their JSON, the
    // export leaves them deleted (recreating them would undo retention,
    // and their data files may themselves be vacuumed).
    val retainCkptV: Option[Long] = lastCheckpointVersion(table)
    def ckptCovered(v: Long): Boolean = retainCkptV.exists(v <= _)
    val publishedSet = published.toSet

    // FAST PATH (r12 review finding): start the walk at the first version
    // that actually needs CREATING — for every export-extending call,
    // including the streaming sink's per-micro-batch one, that skips the
    // whole published/covered prefix instead of re-parsing every
    // published file (which made per-batch export O(total versions),
    // quadratic over a stream's lifetime). Sound only when NO published
    // version lies above the start point: the seed (head state) is then
    // exactly the schema cursor there. Recreating torn mid-log versions
    // behind published ones still takes the full cursor walk.
    val firstToCreate: Long = (0L until vs.length.toLong)
      .find(v => !publishedSet.contains(v) && !ckptCovered(v))
      .getOrElse(vs.length.toLong)
    val startDv: Int =
      if (published.forall(_ < firstToCreate)) firstToCreate.toInt else 0

    // whether the deletionVectors reader/writer features are already
    // advertised at the walk's position — a DV-bearing commit below an
    // un-upgraded protocol would be unreadable by spec-strict readers.
    // Walk-local; re-advertising after the fast-path skip is spec-legal
    // (a protocol action may appear in any commit, last-replay-wins).
    var dvAdvertised = false
    var sawCoveredAbsent = false
    vs.zipWithIndex.drop(startDv).foreach { case (txv, dv) =>
      val out = deltaVersionFile(table, dv.toLong)
      if (!Files.exists(out) && ckptCovered(dv.toLong)) {
        // vacuumed under the checkpoint: leave deleted; the cursor is
        // re-anchored from the checkpoint at the end of the covered range
        sawCoveredAbsent = true
      } else if (!Files.exists(out)) {
        val (add, remove) = TxLog.commitActions(table, txv)
        val hasDv = add.exists(e => TxLog.entryDv(e).isDefined)
        // partition columns come from the staged layout itself; fixed at
        // the first exported version, enforced on every later add
        val addPaths = add.map(TxLog.entryPath)
        if (!partColsFixed && addPaths.nonEmpty) {
          partCols = pathPartitionValues(addPaths.head).map(_._1)
          partColsFixed = true
        }
        val addPvs: Seq[Map[String, String]] = addPaths.map { p =>
          val pvs = pathPartitionValues(p)
          require(pvs.map(_._1) == partCols,
            s"exportLog: $table commit $txv file $p has partition layout " +
              s"${pvs.map(_._1).mkString(",")}, table is " +
              s"[${partCols.mkString(",")}] — mixed layouts cannot share " +
              "one Delta log")
          pvs.toMap
        }
        // schema per version, from that commit's own added files — a
        // commit whose schema CHANGED must carry a fresh metaData action
        // (this is exactly how Delta encodes overwriteSchema; time travel
        // then resolves each version under the schema it was written
        // with). One footer read per schema probe, metadata-priced; for a
        // partitioned table the basePath read appends the partition
        // columns (types re-inferred Hive-style — the same inference any
        // Spark reader applies to the layout).
        val schemaJson = addPaths.headOption.map(schemaOfAdd)
          // a zero-add version 0 still declares a schema so the exported
          // log satisfies the spec's metaData-per-snapshot requirement:
          // the one borrowed from the first data-bearing commit, or (when
          // recreating a vacuumed v0 behind a published suffix) the seed
          // cursor's schema
          .getOrElse(if (dv == 0) Option(borrowedSchema).getOrElse(lastSchemaJson)
                     else null)
        val sb = new StringBuilder
        def protocolLine(withDv: Boolean): String =
          // moving to table features (writer 7) must ENUMERATE the legacy
          // features the replaced minWriterVersion=2 implied (appendOnly,
          // invariants) — the spec's upgrade rule, and what delta-spark
          // lists on the same (1,2)→(3,7) step; reader 1 implies none, so
          // readerFeatures carries only the new feature (ADVICE r14)
          if (withDv) mapper.writeValueAsString(Map(
            "protocol" -> Map[String, AnyRef](
              "minReaderVersion" -> Integer.valueOf(3),
              "minWriterVersion" -> Integer.valueOf(7),
              "readerFeatures" -> java.util.List.of("deletionVectors"),
              "writerFeatures" -> java.util.List.of(
                "appendOnly", "invariants", "deletionVectors")
            ).asJava).asJava)
          else mapper.writeValueAsString(Map(
            "protocol" -> Map(
              "minReaderVersion" -> 1, "minWriterVersion" -> 2).asJava
          ).asJava)
        if (dv == 0) {
          sb.append(protocolLine(hasDv)).append('\n')
          if (hasDv) dvAdvertised = true
        } else if (hasDv && !dvAdvertised) {
          // mid-log protocol UPGRADE — exactly how delta-spark introduces
          // a feature into an existing table's log
          sb.append(protocolLine(withDv = true)).append('\n')
          dvAdvertised = true
        }
        if (schemaJson != null &&
            (dv == 0 || schemaJson != lastSchemaJson)) {
          sb.append(mapper.writeValueAsString(Map(
            "metaData" -> Map(
              "id" -> tableId,
              "format" -> Map("provider" -> "parquet",
                "options" -> Map.empty[String, String].asJava).asJava,
              "schemaString" -> schemaJson,
              "partitionColumns" -> partCols.asJava,
              "configuration" -> Map.empty[String, String].asJava
            ).asJava
          ).asJava)).append('\n')
        }
        if (schemaJson != null) lastSchemaJson = schemaJson
        // a streaming commit's (appId, batchId) republishes as the
        // spec's SetTransaction action — foreign engines then share the
        // TxLog's exactly-once frontier (ADVICE r14: the bridge never
        // emitted txn; checkpoints now preserve it, so emit it too)
        TxLog.commitTxn(table, txv).foreach { case (aid, bid) =>
          sb.append(mapper.writeValueAsString(Map(
            "txn" -> Map[String, AnyRef](
              "appId" -> aid,
              "version" -> java.lang.Long.valueOf(bid),
              "lastUpdated" -> java.lang.Long.valueOf(
                System.currentTimeMillis())
            ).asJava).asJava)).append('\n')
        }
        remove.foreach { entry =>
          sb.append(mapper.writeValueAsString(Map(
            "remove" -> Map[String, AnyRef](
              "path" -> TxLog.entryPath(entry),
              // dates the tombstone so checkpoint retention filtering
              // ([[tombstoneRetentionMs]]) and foreign vacuums can age it
              "deletionTimestamp" -> java.lang.Long.valueOf(
                System.currentTimeMillis()),
              "dataChange" -> java.lang.Boolean.TRUE
            ).asJava
          ).asJava)).append('\n')
        }
        add.zip(addPvs).foreach { case (entry, pv) =>
          val p = TxLog.entryPath(entry)
          val f = Paths.get(table, p)
          val base = Map[String, AnyRef](
            "path" -> p,
            "partitionValues" -> pv.asJava,
            "size" -> java.lang.Long.valueOf(Files.size(f)),
            "modificationTime" -> java.lang.Long.valueOf(
              Files.getLastModifiedTime(f).toMillis),
            "dataChange" -> java.lang.Boolean.TRUE)
          val withStats = fileStatsJson(spark, f,
              tight = TxLog.entryDv(entry).isEmpty) match {
            case Some(stats) => base + ("stats" -> stats)
            case None        => base
          }
          // writer-side DVs republish as spec descriptors ("u" relative
          // sidecar) — numRecords in stats stays the file's PHYSICAL
          // count, the spec's shape for DV'd adds
          val withDv = TxLog.entryDv(entry) match {
            case Some(ref) =>
              val d = ref.descriptor
              withStats + ("deletionVector" -> Map[String, AnyRef](
                "storageType" -> d.storageType,
                "pathOrInlineDv" -> d.pathOrInlineDv,
                "offset" -> Integer.valueOf(d.offset.get),
                "sizeInBytes" -> Integer.valueOf(d.sizeInBytes),
                "cardinality" -> java.lang.Long.valueOf(d.cardinality)
              ).asJava)
            case None => withStats
          }
          sb.append(mapper.writeValueAsString(Map(
            "add" -> withDv.asJava).asJava)).append('\n')
        }
        // same publish discipline as TxLog: write-temp + atomic link, so a
        // concurrent exporter can't half-write a version file
        val tmp = Files.createTempFile(deltaLogDir(table), ".tmp-", ".json")
        Files.writeString(tmp, sb.toString)
        try Files.createLink(out, tmp)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
        finally Files.deleteIfExists(tmp)
      } else {
        // SKIPPED (already-published) version: keep the schema cursor
        // honest — it must always hold the latest metaData AT OR BEFORE
        // the current version. The seed starts it at the published HEAD
        // schema, but re-creating vacuumed earlier versions walks the
        // cursor back through history; without this update, a published
        // mid-log schema change would be invisible to the comparison and
        // a later new version could omit a required metaData (readers
        // would then resolve it under the wrong schema).
        Files.readAllLines(out).asScala.filter(_.nonEmpty).foreach { line =>
          val m = mapper.readValue(line,
            classOf[java.util.Map[String, AnyRef]])
          Option(m.get("metaData")).foreach { md =>
            lastSchemaJson = md.asInstanceOf[java.util.Map[String, AnyRef]]
              .get("schemaString").asInstanceOf[String]
          }
          // a published protocol already advertising deletionVectors
          // means later new versions need no re-upgrade
          Option(m.get("protocol")).foreach { p =>
            val features = Option(p.asInstanceOf[java.util.Map[String, AnyRef]]
                .get("readerFeatures"))
              .map(_.asInstanceOf[java.util.List[String]].asScala.toSeq)
              .getOrElse(Seq.empty)
            if (features.contains("deletionVectors")) dvAdvertised = true
          }
        }
      }
      // end of a covered range with HOLES: vacuumed versions may have
      // carried metaData the cursor never saw — re-anchor at the
      // checkpoint's own state, which is by construction the latest
      // metaData at or before ckptV
      if (sawCoveredAbsent && retainCkptV.contains(dv.toLong)) {
        val st = LogState()
        bootstrapFromCheckpoint(spark, table, dv.toLong, st)
        if (st.schemaJson != null) lastSchemaJson = st.schemaJson
        partCols = st.partitionCols
        partColsFixed = true
        sawCoveredAbsent = false
      }
    }
    // checkpoint discipline (the protocol's log-compaction half): every
    // CheckpointInterval versions, snapshot the live state into one
    // checkpoint parquet + _last_checkpoint, so (a) readers of a
    // long-lived table bootstrap in O(live files) instead of replaying
    // every JSON, and (b) the JSON prefix becomes vacuum-able — exactly
    // what real Delta writers emit every 10 commits. Idempotent like the
    // version files (skip if present).
    val head = vs.length - 1
    val ckptV = (head / CheckpointInterval) * CheckpointInterval
    // never BELOW an already-published checkpoint: an explicit CALL
    // graft.checkpoint can pin a version above the cadence boundary, and
    // writing the cadence checkpoint afterwards would REGRESS
    // _last_checkpoint — after a vacuumLog, to a version the log can no
    // longer even reconstruct (review r15: empty checkpoint, table
    // bricked)
    if (ckptV > 0 &&
        lastCheckpointVersion(table).forall(_ < ckptV))
      writeCheckpoint(spark, table, ckptV.toLong)
    // prime the seed cache with the post-export head state: the next
    // export (the streaming sink's next micro-batch) seeds without any
    // replay at all
    exportSeedCache.put(table,
      ((head.toLong, lastCheckpointVersion(table).getOrElse(-1L)),
        (tableId, lastSchemaJson, partCols)))
    vs.length
  }

  /** Export-seed memo: table → ((last published version, checkpoint
    * version), (tableId, head schemaString, partitionColumns)). A hit
    * requires the stored frontier to match what the directory shows NOW —
    * sound because published version files are immutable, so an equal
    * frontier implies an identical replay. One entry per table (bounded),
    * replaced on every export; exists so per-micro-batch exports are
    * O(new versions) instead of a full state replay each call. */
  private val exportSeedCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      ((Long, Long), (String, String, Seq[String]))]()

  /** Checkpoint cadence — the delta-spark default. */
  private val CheckpointInterval = 10

  /** Per-add `stats` JSON — the Delta data-skipping payload
    * (`numRecords` + per-column `minValues`/`maxValues`/`nullCount`)
    * external readers (delta-rs, DuckDB delta, delta-spark) prune files
    * on, computed from the parquet FOOTER alone (row-group metadata —
    * never a data scan, so export stays metadata-priced). Columns
    * covered: top-level int/long (as JSON numbers), float/double (as
    * numbers, NaN-bearing groups skipped — NaN bounds are unordered and
    * a reader skipping on them would be unsound), and UTF-8 strings
    * (parquet's truncation keeps truncated bounds SOUND: min truncates
    * down, max rounds up). Other types contribute nullCount only.
    * Best-effort: any footer surprise yields an add without stats —
    * stats are an optimization, never a correctness dependency. */
  private def fileStatsJson(spark: SparkSession, f: Path,
                            tight: Boolean = true): Option[String] = try {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.toUri),
      spark.sessionState.newHadoopConf())
    val r = ParquetFileReader.open(in)
    try {
      val footer = r.getFooter
      val msgType = footer.getFileMetaData.getSchema
      val blocks = footer.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val mins = new java.util.LinkedHashMap[String, AnyRef]()
      val maxs = new java.util.LinkedHashMap[String, AnyRef]()
      val nulls = new java.util.LinkedHashMap[String, AnyRef]()
      // top-level primitive columns only (nested stats need the full
      // dotted-path schema walk delta-spark does — scope cut)
      msgType.getFields.asScala.filter(_.isPrimitive).foreach { field =>
        val name = field.getName
        val chunks = blocks.flatMap(_.getColumns.asScala.filter { c =>
          c.getPath.size() == 1 && c.getPath.toDotString == name })
        val stats = chunks.map(_.getStatistics)
        if (stats.nonEmpty && stats.forall(s =>
            s != null && !s.isEmpty && s.isNumNullsSet)) {
          nulls.put(name,
            java.lang.Long.valueOf(stats.map(_.getNumNulls).sum))
          val valued = stats.filter(_.hasNonNullValue)
          if (valued.nonEmpty) {
            val prim = field.asPrimitiveType().getPrimitiveTypeName
            val logical = field.asPrimitiveType().getLogicalTypeAnnotation
            prim match {
              // SIGNED ints only: parquet ranks an UNSIGNED-annotated
              // column unsigned, so genericGetMin/Max reinterpreted as
              // signed longs can invert (max = -1 for a column holding
              // 2^32-1) and a later statsExclude would "prove"
              // disjointness and UNSOUNDLY drop the file. Unreachable
              // via Spark-written stages, but TxLog commits carry opaque
              // paths — foreign parquet can enter — so unsigned falls to
              // nullCount-only coverage (skipping may only under-prune).
              case INT32 | INT64
                  if logical == null || (logical match {
                    case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
                      i.isSigned
                    case _ => false
                  }) =>
                val lo = valued.map(
                  _.genericGetMin.asInstanceOf[Number].longValue()).min
                val hi = valued.map(
                  _.genericGetMax.asInstanceOf[Number].longValue()).max
                mins.put(name, java.lang.Long.valueOf(lo))
                maxs.put(name, java.lang.Long.valueOf(hi))
              case FLOAT | DOUBLE =>
                val los = valued.map(
                  _.genericGetMin.asInstanceOf[Number].doubleValue())
                val his = valued.map(
                  _.genericGetMax.asInstanceOf[Number].doubleValue())
                if (!los.exists(_.isNaN) && !his.exists(_.isNaN)) {
                  mins.put(name, java.lang.Double.valueOf(los.min))
                  maxs.put(name, java.lang.Double.valueOf(his.max))
                }
              case BINARY
                  if logical.isInstanceOf[
                    LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                def byteMin(a: Array[Byte], b: Array[Byte]): Array[Byte] =
                  if (java.util.Arrays.compareUnsigned(a, b) <= 0) a else b
                val lo = valued.map(_.genericGetMin
                  .asInstanceOf[org.apache.parquet.io.api.Binary]
                  .getBytes).reduce(byteMin)
                val hi = valued.map(_.genericGetMax
                  .asInstanceOf[org.apache.parquet.io.api.Binary]
                  .getBytes).reduce((a, b) =>
                    if (java.util.Arrays.compareUnsigned(a, b) >= 0) a else b)
                mins.put(name, new String(lo, "UTF-8"))
                maxs.put(name, new String(hi, "UTF-8"))
              case _ => () // nullCount-only coverage
            }
          }
        }
      }
      val payload = new java.util.LinkedHashMap[String, AnyRef]()
      payload.put("numRecords", java.lang.Long.valueOf(numRecords))
      payload.put("minValues", mins)
      payload.put("maxValues", maxs)
      payload.put("nullCount", nulls)
      // DV'd adds: numRecords stays the file's PHYSICAL count, but the
      // footer min/max may be loose over the LIVE rows (the extreme row
      // may be deleted) — the spec's tightBounds=false says exactly that
      if (!tight) payload.put("tightBounds", java.lang.Boolean.FALSE)
      Some(mapper.writeValueAsString(payload))
    } finally r.close()
  } catch { case scala.util.control.NonFatal(_) => None }

  /** `delta.deletedFileRetentionDuration` parsed per the spec's
    * CalendarInterval subset real writers emit (`interval N unit`);
    * absent or unparseable → delta's 1-week default. */
  private[sources] def tombstoneRetentionMs(
      configuration: Map[String, String]): Long = {
    val Default = 7L * 24 * 3600 * 1000
    configuration.get("delta.deletedFileRetentionDuration") match {
      case None => Default
      case Some(raw) =>
        val Pat = """(?i)\s*interval\s+(\d+)\s+(\w+?)s?\s*""".r
        raw match {
          case Pat(n, unit) =>
            val ms = unit.toLowerCase match {
              case "millisecond"        => 1L
              case "second"             => 1000L
              case "minute"             => 60L * 1000
              case "hour"               => 3600L * 1000
              case "day"                => 24L * 3600 * 1000
              case "week"               => 7L * 24 * 3600 * 1000
              case _                    => -1L
            }
            if (ms < 0) Default else n.toLong * ms
          case _ => Default
        }
    }
  }

  /** Action rows per checkpoint part — one part up to here (the classic
    * single-file form); above it the spec's multi-part layout. */
  private val CheckpointPartRows = 100000

  private[sources] def writeCheckpoint(spark: SparkSession, table: String,
                                       cv: Long,
                                       partRows: Int = CheckpointPartRows): Unit = {
    require(partRows > 0, s"writeCheckpoint: partRows $partRows must be > 0")
    val path = deltaLogDir(table).resolve(f"$cv%020d.checkpoint.parquet")
    if (Files.exists(path)) return
    // an already-DECLARED multi-part checkpoint at cv is complete by
    // the publish order below (parts before _last_checkpoint) — done;
    // an undeclared partial part-set re-publishes idempotently (sound
    // because the rows — and so the chunk boundaries — are a pure
    // function of cv: the tombstone horizon below is pinned to the
    // commit's own timestamp, never the retry's wall clock)
    if (lastCheckpointMeta(table).exists { case (v, parts) =>
        v == cv && parts > 1 }) return
    // reconstruct the state AT cv through the READER path — bootstrapping
    // from the PREVIOUS published checkpoint when the JSON prefix has been
    // vacuumed (readState enforces version contiguity above the bootstrap,
    // so a vacuumed-past-recovery log fails loud instead of silently
    // omitting live files from the new checkpoint). Previously-published
    // checkpoints are immutable; only the one being written here is new.
    val st = readState(spark, table, Some(cv))
    // an unreconstructible cv (its JSON vacuumed and no usable
    // bootstrap) replays to an EMPTY state — publishing that would
    // brick every later reader (review r15); refuse instead
    require(st.schemaJson != null,
      s"checkpoint: version $cv of $table cannot be reconstructed from " +
        "the surviving log (vacuumed past it?); checkpoint the head")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ckptSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType))))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType),
        StructField("deletionVector", StructType(Seq(
          StructField("storageType", StringType),
          StructField("pathOrInlineDv", StringType),
          StructField("offset", IntegerType),
          StructField("sizeInBytes", IntegerType),
          StructField("cardinality", LongType))))))),
      // the spec's two non-file state carriers a checkpoint must keep
      // (ADVICE r14): SetTransaction idempotence state and in-retention
      // remove tombstones (vacuum's worklist)
      StructField("txn", StructType(Seq(
        StructField("appId", StringType),
        StructField("version", LongType),
        StructField("lastUpdated", LongType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("deletionTimestamp", LongType),
        StructField("dataChange", BooleanType))))))
    // protocol / configuration republish VERBATIM: a checkpoint that
    // silently downgraded a feature-bearing table (DVs, column mapping)
    // would let a later reader mis-read it
    // tombstone retention: keep removes younger than the table's
    // deletedFileRetentionDuration (default 1 week — delta's own), plus
    // undated ones (conservative: a foreign writer that logs no
    // deletionTimestamp must not have its vacuum worklist truncated).
    // The horizon anchors to the CHECKPOINTED COMMIT's own timestamp
    // (its JSON mtime — the same clock timestampAsOf resolves against),
    // not the writer's wall clock: a crash-interrupted multi-part set
    // retried hours later must recompute IDENTICAL rows, or the shifted
    // chunk boundaries would mix old and new parts under the
    // keep-on-collision publish and silently drop tombstones
    // (review r15). Fallback to wall clock only when the JSON is
    // already gone (then the single idempotence risk is gone with it).
    val retainMs = tombstoneRetentionMs(st.configuration)
    val anchor =
      if (Files.exists(deltaVersionFile(table, cv)))
        Files.getLastModifiedTime(deltaVersionFile(table, cv)).toMillis
      else System.currentTimeMillis()
    val horizon = anchor - retainMs
    val keptTombstones = st.tombstones.toSeq.filter { case (_, (ts, _)) =>
      ts.forall(_ >= horizon) }
    val rows =
      Row(Row(st.minReader, st.minWriter,
        if (st.readerFeatures.isEmpty) null else st.readerFeatures,
        if (st.writerFeatures.isEmpty) null else st.writerFeatures),
        null, null, null, null) +:
      Row(null, Row(st.metaId, st.schemaJson, st.partitionCols,
        st.configuration), null, null, null) +:
      (st.live.toSeq.map { case (p, e) =>
        val f = Paths.get(table, p)
        Row(null, null, Row(p, e.pv, Files.size(f),
          Files.getLastModifiedTime(f).toMillis, true,
          e.stats.orNull,
          e.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
            d.offset.map(Int.box).orNull, d.sizeInBytes,
            d.cardinality)).orNull), null, null)
      } ++
      st.txns.toSeq.map { case (appId, (v, lu)) =>
        Row(null, null, null, Row(appId, v, lu.map(Long.box).orNull), null)
      } ++
      keptTombstones.map { case (p, (ts, dc)) =>
        Row(null, null, null, null, Row(p, ts.map(Long.box).orNull, dc))
      })
    def writeOne(dest: Path, chunk: Seq[Row]): Unit = {
      val tmpDir = Files.createTempDirectory(deltaLogDir(table), ".ckpt-")
      spark.createDataFrame(
          spark.sparkContext.parallelize(chunk, 1), ckptSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      val part = TxLog.listDir(tmpDir).map(_.getFileName.toString)
        .find(_.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException("checkpoint write empty"))
      try Files.createLink(dest, tmpDir.resolve(part))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      finally {
        TxLog.listDir(tmpDir).foreach(Files.deleteIfExists)
        Files.deleteIfExists(tmpDir)
      }
    }
    // MULTI-PART above the row threshold — the spec's layout for
    // checkpoints too large to be one parquet write
    // (`N.checkpoint.<part>.<parts>.parquet`, 1-based, every part
    // required): at 10⁶ live files one single-file checkpoint is a
    // single-task bottleneck and a single atomic publish of a very
    // large object; parts keep each write bounded. Readers
    // ([[checkpointFiles]] + the bootstrap) already consume this
    // layout. Part files publish BEFORE `_last_checkpoint` names them,
    // so a crash mid-set leaves dangling part files, never a declared
    // checkpoint with missing parts.
    val nParts = math.max(1,
      math.ceil(rows.length.toDouble / partRows).toInt)
    if (nParts == 1) writeOne(path, rows)
    else rows.grouped(partRows).zipWithIndex.foreach { case (chunk, i) =>
      writeOne(deltaLogDir(table).resolve(
        f"$cv%020d.checkpoint.${i + 1}%010d.$nParts%010d.parquet"), chunk)
    }
    // _last_checkpoint points readers at the newest checkpoint; plain
    // overwrite-in-place is the protocol's own convention for this file
    val meta = Map[String, AnyRef](
      "version" -> java.lang.Long.valueOf(cv),
      "size" -> java.lang.Long.valueOf(rows.length.toLong)) ++
      (if (nParts > 1) Map[String, AnyRef](
        "parts" -> Integer.valueOf(nParts)) else Map.empty)
    Files.writeString(deltaLogDir(table).resolve("_last_checkpoint"),
      mapper.writeValueAsString(meta.asJava))
  }

  // --------------------------------------------------------------- read

  /** Replayed per-file state: partition values plus the add action's raw
    * `stats` JSON (None for stats-less adds and for files bootstrapped
    * from pre-round-14 checkpoints of this bridge, which did not carry
    * stats — such files are simply never skipped, the conservative
    * direction; checkpoints written now preserve them). */
  private case class AddEntry(pv: Map[String, String],
                              stats: Option[String],
                              dv: Option[DeletionVectors.Descriptor] = None)

  private case class LogState(
      var schemaJson: String = null,
      var metaId: String = null,
      var partitionCols: Seq[String] = Seq.empty,
      var configuration: Map[String, String] = Map.empty,
      // the replayed protocol (last wins) — republished verbatim by
      // [[writeCheckpoint]] so a checkpoint never silently downgrades a
      // feature-bearing table
      var minReader: Int = 1,
      var minWriter: Int = 2,
      var readerFeatures: Seq[String] = Seq.empty,
      var writerFeatures: Seq[String] = Seq.empty,
      live: scala.collection.mutable.LinkedHashMap[String, AddEntry] =
        scala.collection.mutable.LinkedHashMap.empty,
      // SetTransaction state (appId → latest version, lastUpdated) and
      // remove TOMBSTONES (path → deletionTimestamp, dataChange): read-
      // irrelevant for a snapshot, but the Delta spec requires a
      // checkpoint to preserve both — dropping txn loses a foreign
      // streaming writer's idempotence state (duplicate batch on
      // restart), dropping in-retention removes breaks its VACUUM
      // (ADVICE r14). Replayed here, republished by [[writeCheckpoint]].
      txns: scala.collection.mutable.LinkedHashMap[String, (Long, Option[Long])] =
        scala.collection.mutable.LinkedHashMap.empty,
      tombstones: scala.collection.mutable.LinkedHashMap[String, (Option[Long], Boolean)] =
        scala.collection.mutable.LinkedHashMap.empty)

  /** The reader features this bridge actually implements; a protocol
    * asking for anything else still refuses loudly. `timestampNtz` needs
    * only the TIMESTAMP_NTZ type (native to this Spark — the schemaString
    * parses and parquet reads it); `vacuumProtocolCheck` imposes reader
    * obligations of exactly nothing (it gates WRITER vacuum discipline —
    * per the spec, readers pass through). */
  private val SupportedReaderFeatures =
    Set("deletionVectors", "columnMapping", "timestampNtz",
      "vacuumProtocolCheck")

  private def requireReadable(mr: Int, features: Seq[String]): Unit =
    if (mr == 2) () // column mapping (legacy reader-version form)
    else if (mr == 3) {
      val unsupported = features.toSet -- SupportedReaderFeatures
      require(unsupported.isEmpty,
        s"Delta table needs reader features ${unsupported.mkString(",")}; " +
          s"this bridge speaks ${SupportedReaderFeatures.mkString(",")}")
    } else require(mr <= 1,
      s"Delta table needs reader version $mr; this bridge speaks 1-3 " +
        s"(features: ${SupportedReaderFeatures.mkString(",")})")

  private def applyAction(st: LogState, m: java.util.Map[String, AnyRef]): Unit = {
    Option(m.get("protocol")).foreach { p =>
      val pm = p.asInstanceOf[java.util.Map[String, AnyRef]]
      val mr = pm.get("minReaderVersion").asInstanceOf[Number].intValue()
      val features = Option(pm.get("readerFeatures"))
        .map(_.asInstanceOf[java.util.List[String]].asScala.toSeq)
        .getOrElse(Seq.empty)
      requireReadable(mr, features)
      st.minReader = mr
      st.minWriter = Option(pm.get("minWriterVersion"))
        .map(_.asInstanceOf[Number].intValue()).getOrElse(st.minWriter)
      st.readerFeatures = features
      st.writerFeatures = Option(pm.get("writerFeatures"))
        .map(_.asInstanceOf[java.util.List[String]].asScala.toSeq)
        .getOrElse(Seq.empty)
    }
    Option(m.get("metaData")).foreach { md =>
      val mm = md.asInstanceOf[java.util.Map[String, AnyRef]]
      st.schemaJson = mm.get("schemaString").asInstanceOf[String]
      st.metaId = mm.get("id").asInstanceOf[String]
      st.partitionCols = Option(mm.get("partitionColumns"))
        .map(_.asInstanceOf[java.util.List[String]].asScala.toSeq)
        .getOrElse(Seq.empty)
      st.configuration = Option(mm.get("configuration"))
        .map(_.asInstanceOf[java.util.Map[String, String]].asScala.toMap)
        .getOrElse(Map.empty)
    }
    Option(m.get("add")).foreach { a =>
      val am = a.asInstanceOf[java.util.Map[String, AnyRef]]
      val pv = Option(am.get("partitionValues"))
        .map(_.asInstanceOf[java.util.Map[String, String]].asScala.toMap)
        .getOrElse(Map.empty[String, String])
      val stats = Option(am.get("stats")).map(_.asInstanceOf[String])
      val dv = Option(am.get("deletionVector")).map { d =>
        val dm = d.asInstanceOf[java.util.Map[String, AnyRef]]
        DeletionVectors.Descriptor(
          dm.get("storageType").asInstanceOf[String],
          dm.get("pathOrInlineDv").asInstanceOf[String],
          Option(dm.get("offset")).map(_.asInstanceOf[Number].intValue()),
          dm.get("sizeInBytes").asInstanceOf[Number].intValue(),
          Option(dm.get("cardinality")).map(_.asInstanceOf[Number].longValue())
            .getOrElse(-1L))
      }
      val path = am.get("path").asInstanceOf[String]
      st.live += (path -> AddEntry(pv, stats, dv))
      st.tombstones -= path // a re-added path is live, not a tombstone
    }
    Option(m.get("remove")).foreach { r =>
      val rm = r.asInstanceOf[java.util.Map[String, AnyRef]]
      val path = rm.get("path").asInstanceOf[String]
      st.live -= path
      st.tombstones += (path -> (
        Option(rm.get("deletionTimestamp"))
          .map(_.asInstanceOf[Number].longValue()),
        Option(rm.get("dataChange"))
          .forall(_.asInstanceOf[Boolean])))
    }
    Option(m.get("txn")).foreach { tx =>
      val tm = tx.asInstanceOf[java.util.Map[String, AnyRef]]
      st.txns += (tm.get("appId").asInstanceOf[String] -> (
        tm.get("version").asInstanceOf[Number].longValue(),
        Option(tm.get("lastUpdated"))
          .map(_.asInstanceOf[Number].longValue())))
    }
    // commitInfo / cdc: read-irrelevant, skipped
  }

  private val DeltaVersionName = "(\\d{20})\\.json".r

  /** Delta versions present as JSON action files, ascending. */
  def versions(table: String): Seq[Long] = {
    val ld = deltaLogDir(table)
    if (!Files.isDirectory(ld)) Seq.empty
    else TxLog.listDir(ld).map(_.getFileName.toString)
      .collect { case DeltaVersionName(d) => d.toLong }
      .sorted
  }

  /** Latest version the log can SERVE, −1 for an empty log: the max of
    * the JSON action versions and the `_last_checkpoint` version — a log
    * whose expired JSON commits were cleaned up past a checkpoint has
    * `versions` empty but still snapshots fine (checkpoint bootstrap), so
    * version arithmetic must not treat it as empty (r12 review finding:
    * the streaming source silently served nothing on such a log). */
  private[sources] def headVersion(table: String): Long =
    (versions(table) ++ lastCheckpointVersion(table)).foldLeft(-1L)(_ max _)

  /** DESCRIBE HISTORY — one row per surviving log version: (version,
    * commit timestamp = the action file's mtime, the same clock
    * [[versionAtTimestamp]] resolves against, add/remove action counts,
    * whether the version re-declared a schema). METADATA-ONLY: reads the
    * JSON action files, never a data file, so auditing a 100 TB table's
    * history costs its log. Versions vacuumed past the retention horizon
    * (JSON deleted under a checkpoint by [[vacuumLog]]) are absent —
    * delta's own DESCRIBE HISTORY retention behavior. */
  def history(spark: SparkSession, table: String)
      : org.apache.spark.sql.DataFrame = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import spark.implicits._
    // Same running-max monotonization as [[versionAtTimestamp]], so the
    // published history and timestamp resolution always agree.
    var runMax = Long.MinValue
    // `checkpointed` surfaces the `_last_checkpoint` state per row: a
    // version at or below it is served by the checkpoint and its JSON is
    // log-retention-eligible (the lifecycle fact a maintenance operator
    // reads history for)
    val ckpt = lastCheckpointVersion(table)
    versions(table).map { v =>
      var adds = 0L; var removes = 0L; var meta = false
      Files.readAllLines(deltaVersionFile(table, v)).asScala
        .filter(_.nonEmpty).foreach { line =>
          val m = mapper.readValue(line,
            classOf[java.util.Map[String, AnyRef]])
          if (m.containsKey("add")) adds += 1
          else if (m.containsKey("remove")) removes += 1
          else if (m.containsKey("metaData")) meta = true
        }
      runMax = math.max(runMax,
        Files.getLastModifiedTime(deltaVersionFile(table, v)).toMillis)
      (v, runMax, adds, removes, meta, ckpt.exists(v <= _))
    }.toDF("version", "timestamp_ms", "n_adds", "n_removes",
      "schema_changed", "checkpointed").orderBy("version")
  }

  /** Resolve a `timestampAsOf` instant to a version — delta-spark's
    * rule: a commit's timestamp IS its `_delta_log` JSON file's
    * modification time, and the resolved version is the LATEST commit
    * at-or-before the instant. Delta-parity errors: an instant before
    * the earliest available commit (or one older than the log-retention
    * horizon left behind) and an instant after the latest commit both
    * fail loud — time travel never silently rounds outside the log. */
  def versionAtTimestamp(table: String, tsMillis: Long): Long = {
    // Monotonize mtimes over version order (running max): clock skew or
    // a copied/restored _delta_log can make raw mtimes non-monotone, and
    // the head/last bound checks below assume sortedness — delta-spark's
    // DeltaHistoryManager monotonizes commit timestamps for this reason.
    var runMax = Long.MinValue
    val stamped = versions(table).map { v =>
      val raw = Files.getLastModifiedTime(deltaVersionFile(table, v)).toMillis
      runMax = math.max(runMax, raw)
      v -> runMax
    }
    require(stamped.nonEmpty,
      s"$table: no JSON commits to resolve a timestamp against (log " +
        "vacuumed past the retention horizon?); use versionAsOf")
    require(tsMillis >= stamped.head._2,
      s"$table: timestamp $tsMillis predates the earliest available " +
        s"commit (${stamped.head._2}, version ${stamped.head._1})")
    require(tsMillis <= stamped.last._2,
      s"$table: timestamp $tsMillis is after the latest commit " +
        s"(${stamped.last._2}, version ${stamped.last._1}); " +
        "read the head without timestampAsOf instead")
    stamped.filter(_._2 <= tsMillis).map(_._1).max
  }

  /** LOG RETENTION — the log-cleanup half of VACUUM: delete exported JSON
    * versions a published checkpoint covers (≤ `_last_checkpoint`).
    * Readers bootstrap from the checkpoint, so the head and any
    * `versionAsOf ≥ checkpoint` stay readable; time travel below it is
    * forfeited — delta's own log-retention trade. [[exportLog]] leaves
    * covered versions deleted instead of recreating them. Returns the
    * deleted versions. Pair with [[TxLog.vacuum]] for the data-file half:
    * log first, then data, so no surviving JSON references deleted files. */
  def vacuumLog(table: String): Seq[Long] =
    lastCheckpointVersion(table) match {
      case None => Seq.empty
      case Some(cv) =>
        versions(table).filter(_ <= cv).map { v =>
          Files.deleteIfExists(deltaVersionFile(table, v)); v
        }
    }

  /** State reconstruction at `versionAsOf` (None = head) — ONE replay
    * path shared by [[read]], [[writeCheckpoint]] and [[exportLog]]'s
    * identity seeding: bootstrap from `_last_checkpoint` when present AND
    * usable (checkpoint version ≤ asOf), then JSON replay above it, with
    * the protocol's CONTIGUITY rule enforced — replayed versions must
    * start exactly at bootstrap+1 (or 0 with no bootstrap) and run gap-
    * free, because a vacuumed or torn log replayed across a gap yields a
    * silently wrong snapshot (live files dropped). */
  private def readState(spark: SparkSession, table: String,
                        versionAsOf: Option[Long]): LogState = {
    val st = LogState()
    val vs = versions(table)
    require(vs.nonEmpty || lastCheckpointVersion(table).isDefined,
      s"$table has no _delta_log")

    val ckpt = lastCheckpointVersion(table)
      .filter(cv => versionAsOf.forall(cv <= _))
    ckpt.foreach { cv => bootstrapFromCheckpoint(spark, table, cv, st) }

    val replay = vs
      .filter(v => ckpt.forall(v > _))
      .filter(v => versionAsOf.forall(v <= _))
    // the protocol's replay rule: versions are contiguous; a gap means the
    // log was vacuumed past our bootstrap and the snapshot would be wrong
    val expectedStart = ckpt.map(_ + 1).getOrElse(0L)
    require(replay.isEmpty || replay.head == expectedStart,
      s"$table: _delta_log starts at ${replay.headOption.getOrElse(-1L)}, " +
        s"needs $expectedStart (vacuumed log without a usable checkpoint)")
    require(replay.isEmpty ||
        replay == (replay.head to replay.last),
      s"$table: _delta_log has internal gaps in ${replay.mkString(",")}")
    replay.foreach { v =>
      val actions = Files.readAllLines(deltaVersionFile(table, v)).asScala
        .filter(_.nonEmpty)
        .map(mapper.readValue(_, classOf[java.util.Map[String, AnyRef]]))
        .toSeq
      applyVersion(st, actions)
    }
    st
  }

  /** Apply ONE version's actions with the protocol's order-free file
    * reconciliation: within a commit, a path that is both removed and
    * (re-)added stays live under the add — the exact shape a foreign
    * DV-rewriting DELETE emits (`remove(f, oldDv)` + `add(f, newDv)`,
    * line order unspecified by the spec). Applying lines in file order
    * would silently drop the file whenever the add serialized first
    * (review finding r13). Non-file actions (protocol, metaData) carry
    * no such ambiguity and apply directly. */
  private def applyVersion(st: LogState,
                           actions: Seq[java.util.Map[String, AnyRef]]): Unit = {
    val addPaths: Set[String] = actions.flatMap(a =>
      Option(a.get("add")).map(_.asInstanceOf[java.util.Map[String, AnyRef]]
        .get("path").asInstanceOf[String])).toSet
    // removes first (skipping paths the same version re-adds — those
    // stay live, so no tombstone either), adds last
    actions.foreach { m =>
      Option(m.get("remove")).foreach { r =>
        val rm = r.asInstanceOf[java.util.Map[String, AnyRef]]
        val p = rm.get("path").asInstanceOf[String]
        if (!addPaths.contains(p)) {
          st.live -= p
          st.tombstones += (p -> (
            Option(rm.get("deletionTimestamp"))
              .map(_.asInstanceOf[Number].longValue()),
            Option(rm.get("dataChange"))
              .forall(_.asInstanceOf[Boolean])))
        }
      }
    }
    actions.foreach { m =>
      if (m.get("remove") == null) applyAction(st, m)
    }
  }

  /** Snapshot a Delta table at `versionAsOf` (None = head), optionally
    * pruned by exact-match partition values. Bootstraps from
    * `_last_checkpoint` when present AND usable; JSON actions above the
    * bootstrap replay in order.
    *
    * `partitionFilter` prunes ADD ACTIONS before any scan is planned —
    * the metadata-level pruning a real Delta reader performs (and the
    * reason partitionValues live in the log at all): a filtered read of a
    * 10⁵-partition table plans a scan over only the matching partitions'
    * files. Partition columns are reconstructed on read (Delta data files
    * do not store them): Hive-layout logs (this exporter's, delta-spark's)
    * read through Spark's own partition discovery rooted at the table —
    * one scan, Catalyst prunes directories natively; a foreign log whose
    * file layout does not encode its partitionValues falls back to one
    * scan branch per live partition tuple (correct for any layout; the
    * plan grows with the post-filter partition count, so filter first). */
  def read(spark: SparkSession, table: String,
           versionAsOf: Option[Long] = None,
           partitionFilter: Map[String, String] = Map.empty,
           statsFilter: Option[(String, Any, Any)] = None): DataFrame = {
    val st = readState(spark, table, versionAsOf)
    require(st.schemaJson != null, s"$table: no metaData action in log")
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    val badKeys = partitionFilter.keySet -- st.partitionCols.toSet
    require(badKeys.isEmpty,
      s"$table: partitionFilter on non-partition columns " +
        s"${badKeys.mkString(",")} (partitioned by " +
        s"${st.partitionCols.mkString(",")})")
    val mapping = columnMappingMode(st)
    // under column mapping the log's partitionValues / stats keys are
    // PHYSICAL names — translate the caller's logical names once
    val physOf: String => String =
      if (mapping == "none") identity
      else {
        val m = schema.fields.map(f => f.name -> physicalName(f)).toMap
        n => m.getOrElse(n, n)
      }
    // metadata-level pruning: drop non-matching add actions before the
    // scan — partition values exactly, then stats bounds (files are kept
    // unless their stats PROVE disjointness — sound for stats-less adds)
    val live = st.live.toSeq.filter { case (_, e) =>
      partitionFilter.forall { case (k, v) =>
        e.pv.get(physOf(k)).contains(v) } &&
        !statsFilter.exists { case (c, lo, hi) =>
          e.stats.exists(statsProveDisjoint(_, physOf(c), lo, hi)) }
    }
    if (mapping == "none" && live.forall(_._2.dv.isEmpty))
      buildDataFrame(spark, table, schema, st.partitionCols,
        live.map { case (p, e) => (p, e.pv) })
    else
      extendedRead(spark, table, schema, mapping, st.partitionCols, live)
  }

  private def columnMappingMode(st: LogState): String =
    st.configuration.getOrElse("delta.columnMapping.mode", "none")

  private def physicalName(f: StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** The schema the DATA FILES store under a column-mapped table:
    * every field (recursively) renamed to its logged physical name; in
    * `id` mode each field additionally carries its `parquet.field.id`
    * so Spark's reader matches by field id (the mode's contract — names
    * in id-mode files are not required to match at all). */
  private def physicalField(f: StructField, idMode: Boolean): StructField = {
    def physType(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(physicalField(_, idMode)))
      case a: org.apache.spark.sql.types.ArrayType =>
        a.copy(elementType = physType(a.elementType))
      case m: org.apache.spark.sql.types.MapType =>
        m.copy(keyType = physType(m.keyType),
          valueType = physType(m.valueType))
      case other => other
    }
    val meta =
      if (idMode && f.metadata.contains("delta.columnMapping.id"))
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id",
            f.metadata.getLong("delta.columnMapping.id"))
          .build()
      else org.apache.spark.sql.types.Metadata.empty
    StructField(physicalName(f), physType(f.dataType), f.nullable, meta)
  }

  /** Snapshot read for tables using reader features the FAST path can't
    * serve — column mapping and/or deletion vectors:
    *
    *  - data files read under the PHYSICAL schema (name mode: physical
    *    names match the parquet columns; id mode: `parquet.field.id`
    *    metadata + Spark's field-id matching), then each top-level
    *    column casts back to its logical field — struct casts rename
    *    nested fields positionally, so nested mapping comes free;
    *  - a file with a deletion vector reads with `_metadata.row_index`
    *    and drops exactly the indices the DV stores (sorted-array
    *    binary-search predicate — DV cardinality is bounded by the
    *    file's row count, metadata-sized next to the data);
    *  - partition columns attach from the log's partitionValues as
    *    typed literals (the layout-agnostic branch — a mapped table's
    *    directory names are physical and untrustworthy for discovery).
    *
    * One scan branch per (partition tuple) plus one per DV'd file; DV'd
    * files are the copy-on-write minority by construction, so the plan
    * stays metadata-sized. */
  private def extendedRead(spark: SparkSession, table: String,
                           schema: StructType, mapping: String,
                           partitionCols: Seq[String],
                           live: Seq[(String, AddEntry)]): DataFrame = {
    import org.apache.spark.sql.functions.udf
    val idMode = mapping == "id"
    // field-id matching is conf-gated in the parquet reader and consulted
    // lazily at scan time FROM THE RELATION'S OWN SESSION — so id-mode
    // data files read through a cloned session carrying the flag, and
    // the caller's session conf is never mutated (a save-and-restore here
    // would revert before the lazy scan runs; a permanent set would
    // silently flip any later read whose explicit schema carries
    // parquet.field.id metadata — ADVICE r13)
    val rspark =
      if (idMode) org.apache.spark.sql.GraftSqlBridge.sessionWithConf(
        spark, "spark.sql.parquet.fieldId.read.enabled", "true")
      else spark
    val dataFields = schema.fields.filterNot(f => partitionCols.contains(f.name))
    val physDataSchema = StructType(dataFields.map(f =>
      if (mapping == "none") f else physicalField(f, idMode)))
    val physOfData: Map[String, String] = dataFields.map(f =>
      f.name -> (if (mapping == "none") f.name else physicalName(f))).toMap
    val physOfPart: Map[String, String] = partitionCols.map { c =>
      c -> (if (mapping == "none") c else physicalName(schema(c)))
    }.toMap
    def finishBranch(raw: DataFrame, pv: Map[String, String]): DataFrame = {
      val withParts = partitionCols.foldLeft(raw) { (df, c) =>
        val dt = schema(c).dataType
        df.withColumn(c,
          Option(pv.getOrElse(physOfPart(c), null))
            .map(v => lit(v).cast(dt))
            .getOrElse(lit(null).cast(dt)))
      }
      withParts.select(schema.fields.toIndexedSeq.map { f =>
        if (partitionCols.contains(f.name)) col(f.name)
        else col(s"`${physOfData(f.name)}`").cast(f.dataType).as(f.name)
      }: _*)
    }
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val (clean, dvd) = live.partition(_._2.dv.isEmpty)
    val cleanBranches = clean.groupBy(_._2.pv).toSeq.map { case (pv, files) =>
      finishBranch(
        rspark.read.schema(physDataSchema)
          .parquet(files.map { case (p, _) => s"$table/$p" }: _*), pv)
    }
    val dvBranches = dvd.map { case (p, e) =>
      finishBranch(
        dvFilteredScan(rspark, table, physDataSchema, p, e.dv.get), e.pv)
    }
    (cleanBranches ++ dvBranches).reduce(_ unionByName _)
  }

  /** ONE definition of the per-file vector filter (shared by the
    * extended read and the streaming builder): scan the file under
    * `dataSchema` and drop rows whose PHYSICAL `_metadata.row_index`
    * the loaded deletion vector marks. */
  private def dvFilteredScan(s: SparkSession, table: String,
                             dataSchema: StructType, path: String,
                             d: DeletionVectors.Descriptor): DataFrame = {
    import org.apache.spark.sql.functions.udf
    val deleted = DeletionVectors.load(table, d)
    val dropped = udf((i: Long) =>
      java.util.Arrays.binarySearch(deleted, i) >= 0)
    s.read.schema(dataSchema).parquet(s"$table/$path")
      .filter(!dropped(col("_metadata.row_index")))
  }

  /** Construct the DataFrame over a set of (path, partitionValues) files
    * under `schema` — shared by the snapshot [[read]] and the streaming
    * source's per-version batches. */
  private[sources] def buildDataFrame(
      spark: SparkSession, table: String, schema: StructType,
      partitionCols: Seq[String],
      live: Seq[(String, Map[String, String])]): DataFrame = {
    if (partitionCols.isEmpty) {
      if (live.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else
        spark.read.schema(schema)
          .parquet(live.map { case (p, _) => s"$table/$p" }: _*)
    } else {
      val ordered: Seq[Column] = schema.fieldNames.toSeq.map(col)
      if (live.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else if (live.forall { case (p, pv) =>
          pathPartitionValues(p).toMap == pv &&
            pathPartitionValues(p).map(_._1) == partitionCols }) {
        // Hive-consistent layout: partition columns come back through
        // Spark's own discovery (types per the declared schema — the
        // user-specified schema overrides inference), with directory
        // pruning handled by Catalyst. Discovery demands ONE consistent
        // root above the k=v run, so files group by their non-partition
        // PREFIX (the TxLog stage dir; empty for delta-spark's layout,
        // which puts partition dirs at the table root) — one scan branch
        // per commit's stage, NOT per partition, metadata-sized.
        splitByPrefix(live).map { case (prefix, files) =>
          val basePath = if (prefix.isEmpty) table else s"$table/$prefix"
          spark.read.schema(schema).option("basePath", basePath)
            .parquet(files.map(p => s"$table/$p"): _*)
            .select(ordered: _*)
        }.reduce(_ unionByName _)
      } else {
        // layout-agnostic fallback: the log's partitionValues are
        // authoritative — group files by partition tuple, attach the
        // values as typed literals, union. One scan branch per live
        // tuple: correct for any foreign layout, sized by the
        // POST-FILTER partition count.
        val dataSchema = StructType(
          schema.fields.filterNot(f => partitionCols.contains(f.name)))
        val byTuple = live.groupBy(_._2).toSeq
        byTuple.map { case (pv, files) =>
          val base = spark.read.schema(dataSchema)
            .parquet(files.map { case (p, _) => s"$table/$p" }: _*)
          partitionCols.foldLeft(base) { (df, c) =>
            val dt = schema(c).dataType
            df.withColumn(c,
              Option(pv.getOrElse(c, null))
                .map(v => lit(v).cast(dt))
                .getOrElse(lit(null).cast(dt)))
          }
        }.reduce(_ unionByName _).select(ordered: _*)
      }
    }
  }

  /** One version's actions, parsed for the streaming source: its add
    * files (path, partitionValues, deletion-vector descriptor — a DV
    * delete's re-published add is a LOGICAL remove+add, and the stream
    * must emit its post-DV row set, never the raw physical rows),
    * whether it carried removes (a non-append change the stream must
    * refuse without `ignoreChanges` — delta-spark's contract), and its
    * metaData schemaString if the version re-declared one. */
  private[sources] case class VersionDelta(
      adds: Seq[(String, Map[String, String],
        Option[DeletionVectors.Descriptor])],
      hasRemoves: Boolean,
      schemaJson: Option[String])

  private[sources] def versionDelta(table: String, v: Long): VersionDelta = {
    // vacuumLog makes missing low versions a REACHABLE state (a stream
    // with startingVersion below the retention horizon, or a paced
    // backfill racing a log vacuum) — fail with the contract, not a raw
    // NoSuchFileException
    if (!Files.exists(deltaVersionFile(table, v)))
      throw new IllegalStateException(
        s"$table version $v is not in the log (vacuumed past the " +
          "retention horizon, or never exported); stream from the head " +
          "snapshot (default start) or startingVersion=latest instead")
    val st = LogState()
    var removes = false
    Files.readAllLines(deltaVersionFile(table, v)).asScala
      .filter(_.nonEmpty).foreach { line =>
        val m = mapper.readValue(line, classOf[java.util.Map[String, AnyRef]])
        if (m.containsKey("remove")) removes = true
        applyAction(st, m)
      }
    VersionDelta(st.live.toSeq.map { case (p, e) => (p, e.pv, e.dv) },
      removes, Option(st.schemaJson))
  }

  /** THE stats-bound comparator — EXACT for every JSON number: Long vs
    * Long boundaries above 2⁵³ must not collapse under a double cast (a
    * wrongly-"proven" bound is an UNSOUND file drop, the one failure mode
    * data skipping can never have), so mixed numbers compare as
    * BigDecimal of their decimal rendering (driver-side, metadata-sized
    * — cost is irrelevant). Strings compare in UTF-8 byte order (what
    * parquet ranked the rows by). NaN or a type mismatch is
    * incomparable: None, the caller keeps the file. */
  private def numCmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: java.lang.Double, _) if x.isNaN => None
    case (_, y: java.lang.Double) if y.isNaN => None
    case (x: java.lang.Float, _) if x.isNaN  => None
    case (_, y: java.lang.Float) if y.isNaN  => None
    // Float literals WIDEN before rendering: stats for float columns are
    // logged through doubleValue() (the exact value Spark compares rows
    // at after its own float→double promotion), so a float literal must
    // meet them in the same domain — BigDecimal("1.1") vs the logged
    // "1.100000023841858" would wrongly "prove" a file of exact matches
    // disjoint and unsoundly drop it (r12 review finding).
    case (x: java.lang.Float, y) => numCmp(java.lang.Double.valueOf(x.doubleValue()), y)
    case (x, y: java.lang.Float) => numCmp(x, java.lang.Double.valueOf(y.doubleValue()))
    case (x: Number, y: Number) =>
      Some(new java.math.BigDecimal(x.toString)
        .compareTo(new java.math.BigDecimal(y.toString)))
    case (x: String, y: String) =>
      Some(java.util.Arrays.compareUnsigned(
        x.getBytes("UTF-8"), y.getBytes("UTF-8")))
    case _ => None
  }

  /** Replayed snapshot state for external composition —
    * [[DeltaBridgeSource]]'s FileIndex builds Catalyst-native partition
    * pruning and stats skipping on top of exactly this. */
  private[sources] case class Snapshot(
      schemaJson: String,
      partitionCols: Seq[String],
      live: Seq[(String, Map[String, String], Option[String])])

  /** Shared replay + refusals behind both snapshot flavors: a usable
    * snapshot needs a metaData action, and NEITHER flavor can plan a
    * column-mapped table (physical-name scans). The DV refusal is
    * [[snapshot]]'s alone — [[streamSnapshot]] serves vectors. */
  private def replayForSnapshot(spark: SparkSession, table: String,
                                versionAsOf: Option[Long]): LogState = {
    val st = readState(spark, table, versionAsOf)
    require(st.schemaJson != null, s"$table: no metaData action in log")
    require(columnMappingMode(st) == "none",
      s"$table: column-mapped snapshots have no parquet-index form — " +
        "batch mounts serve them via the extended read (DeltaBridge.mount);" +
        " streaming over a mapped table is unsupported")
    st
  }

  private[sources] def snapshot(spark: SparkSession, table: String,
                                versionAsOf: Option[Long]): Snapshot = {
    // the native relation / catalog paths plan through Spark's V2
    // parquet scan under LOGICAL names with no row-index filtering —
    // serving a mapped or DV'd snapshot there would silently mis-read;
    // those tables route through [[extendedSchema]] + [[read]]'s
    // extended branch instead (the relation/catalog mounts probe it
    // FIRST and fall back to that path)
    val st = replayForSnapshot(spark, table, versionAsOf)
    require(st.live.values.forall(_.dv.isEmpty),
      s"$table: DV'd snapshots have no parquet-index form — batch mounts " +
        "serve them via the extended read (DeltaBridge.mount); the " +
        "streaming source uses streamSnapshot's vector-aware path")
    Snapshot(st.schemaJson, st.partitionCols,
      st.live.toSeq.map { case (p, e) => (p, e.pv, e.stats) })
  }

  /** The STREAMING flavor of [[snapshot]] — tolerates deletion vectors
    * (the stream serves their post-DV row sets through
    * [[buildDataFrameWithDvs]]; a batch-zero or recovery snapshot over a
    * table that took a DV delete must not brick the stream — VERDICT r14
    * directive 6) but still refuses column mapping, whose physical-name
    * scans the streaming source cannot plan. */
  private[sources] case class StreamSnapshot(
      schemaJson: String,
      partitionCols: Seq[String],
      live: Seq[(String, Map[String, String],
        Option[DeletionVectors.Descriptor])])

  private[sources] def streamSnapshot(spark: SparkSession, table: String,
                                      versionAsOf: Option[Long])
      : StreamSnapshot = {
    val st = replayForSnapshot(spark, table, versionAsOf)
    StreamSnapshot(st.schemaJson, st.partitionCols,
      st.live.toSeq.map { case (p, e) => (p, e.pv, e.dv) })
  }

  /** [[buildDataFrame]] extended with per-file deletion-vector
    * filtering: DV-free files go through the shared builder untouched
    * (one scan branch per stage prefix); each DV'd file reads its data
    * schema with `_metadata.row_index` filtered against the loaded
    * vector (the extended-read discipline), partition columns attached
    * as typed literals from the log. The DV branches are bounded by the
    * batch's own DV'd-file count — a streaming micro-batch shape, never
    * O(table). */
  private[sources] def buildDataFrameWithDvs(
      spark: SparkSession, table: String, schema: StructType,
      partitionCols: Seq[String],
      files: Seq[(String, Map[String, String],
        Option[DeletionVectors.Descriptor])]): DataFrame = {
    import org.apache.spark.sql.functions.udf
    val (dvd, clean) = files.partition(_._3.isDefined)
    val cleanDf = buildDataFrame(spark, table, schema, partitionCols,
      clean.map { case (p, pv, _) => (p, pv) })
    if (dvd.isEmpty) cleanDf
    else {
      val dataSchema = StructType(
        schema.filterNot(f => partitionCols.contains(f.name)))
      val ordered: Seq[Column] = schema.fieldNames.toSeq.map(col)
      val branches = dvd.map { case (p, pv, d) =>
        val base = dvFilteredScan(spark, table, dataSchema, p, d.get)
        partitionCols.foldLeft(base) { (df, c) =>
          val dt = schema(c).dataType
          df.withColumn(c,
            Option(pv.getOrElse(c, null))
              .map(v => lit(v).cast(dt))
              .getOrElse(lit(null).cast(dt)))
        }.select(ordered: _*)
      }
      ((if (clean.nonEmpty) Seq(cleanDf) else Seq.empty) ++ branches)
        .reduce(_ unionByName _)
    }
  }

  /** Some(logical schema) iff the snapshot needs the EXTENDED read path —
    * column mapping or deletion vectors, features the parquet-index scan
    * cannot serve natively; None means the fast index path applies. The
    * relation and catalog mounts branch on this so mapped/DV'd foreign
    * tables mount through the SAME `format("graft-delta")` / SQL surface
    * as plain ones (VERDICT r13 directive 2) instead of refusing. */
  private[sources] def extendedSchema(spark: SparkSession, table: String,
                                      versionAsOf: Option[Long])
      : Option[StructType] =
    mount(spark, table, versionAsOf).left.toOption.map(_._1)

  /** ONE log replay deciding the mount: Right(snapshot) for the fast
    * parquet-index path, Left(logical schema, partition columns) when
    * the snapshot needs the extended read — the relation and catalog
    * branch on this single call instead of probing and then replaying
    * again. */
  private[sources] def mount(spark: SparkSession, table: String,
                             versionAsOf: Option[Long])
      : Either[(StructType, Seq[String]), Snapshot] = {
    val st = readState(spark, table, versionAsOf)
    require(st.schemaJson != null, s"$table: no metaData action in log")
    if (columnMappingMode(st) != "none" ||
        st.live.values.exists(_.dv.isDefined))
      Left((DataType.fromJson(st.schemaJson).asInstanceOf[StructType],
        st.partitionCols))
    else Right(Snapshot(st.schemaJson, st.partitionCols,
      st.live.toSeq.map { case (p, e) => (p, e.pv, e.stats) }))
  }

  /** True iff `statsJson` PROVES no value of `column` satisfies
    * `column <op> v` — the planner-facing generalization of
    * [[statsProveDisjoint]] ([[DeltaBridgeSource]]'s file skipping).
    * Comparisons follow the same Number/UTF-8-string rules; anything
    * unprovable keeps the file. */
  private[sources] def statsExclude(statsJson: String, column: String,
                                    op: String, v: Any): Boolean = try {
    val stats = mapper.readValue(statsJson,
      classOf[java.util.Map[String, AnyRef]])
    def bound(key: String): Option[AnyRef] =
      Option(stats.get(key))
        .map(_.asInstanceOf[java.util.Map[String, AnyRef]])
        .flatMap(m => Option(m.get(column)))
    def cmp(a: Any, b: Any): Option[Int] = numCmp(a, b)
    (bound("minValues"), bound("maxValues")) match {
      case (Some(mn), Some(mx)) => op match {
        case "="  => cmp(mx, v).exists(_ < 0) || cmp(mn, v).exists(_ > 0)
        case ">"  => cmp(mx, v).exists(_ <= 0)
        case ">=" => cmp(mx, v).exists(_ < 0)
        case "<"  => cmp(mn, v).exists(_ >= 0)
        case "<=" => cmp(mn, v).exists(_ > 0)
        case _    => false
      }
      case _ => false
    }
  } catch { case scala.util.control.NonFatal(_) => false }

  /** Stats-pruned snapshot read over `[lo, hi)` of `column` — the READER
    * half of Delta data skipping, consuming the same per-add `stats`
    * payload [[exportLog]] emits (or any foreign writer's): an add whose
    * logged bounds PROVE `max < lo ∨ min >= hi` is dropped before the
    * scan is planned; adds without usable stats for the column (foreign
    * stats-less writers, non-comparable types, files that round-tripped
    * through this bridge's stats-less checkpoint rows) are kept
    * conservatively — every drop is proof-backed, so pruning is sound
    * for any log. Bounds compare numerically when the logged values and
    * the given bounds are both numbers, and in UTF-8 byte order when
    * both are strings (the order parquet ranked the rows by). The caller
    * still applies the row-level filter — pruning is file-granular, the
    * same contract as [[TxLog.readPruned]] and every production Delta
    * reader. */
  def readPruned(spark: SparkSession, table: String, column: String,
                 lo: Any, hi: Any,
                 versionAsOf: Option[Long] = None): DataFrame =
    read(spark, table, versionAsOf, Map.empty, Some((column, lo, hi)))

  /** True iff `statsJson` PROVES `column`'s values all fall outside
    * `[lo, hi)`. Unparseable stats, absent columns, and type mismatches
    * yield false (keep the file). */
  private def statsProveDisjoint(statsJson: String, column: String,
                                 lo: Any, hi: Any): Boolean = try {
    val stats = mapper.readValue(statsJson,
      classOf[java.util.Map[String, AnyRef]])
    def bound(key: String): Option[AnyRef] =
      Option(stats.get(key))
        .map(_.asInstanceOf[java.util.Map[String, AnyRef]])
        .flatMap(m => Option(m.get(column)))
    (bound("minValues"), bound("maxValues")) match {
      case (Some(mn), Some(mx)) =>
        def lt(a: Any, b: Any): Option[Boolean] = numCmp(a, b).map(_ < 0)
        lt(mx, lo).contains(true) || lt(mn, hi).contains(false)
      case _ => false
    }
  } catch { case scala.util.control.NonFatal(_) => false }

  /** Group live (path, pv) entries by their non-partition path prefix,
    * preserving first-seen order on both levels. */
  private def splitByPrefix(live: Seq[(String, Map[String, String])])
      : Seq[(String, Seq[String])] = {
    val out = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.Buffer[String]]()
    live.foreach { case (p, _) =>
      out.getOrElseUpdate(splitHivePath(p)._1,
        scala.collection.mutable.Buffer.empty) += p
    }
    out.toSeq.map { case (k, v) => (k, v.toSeq) }
  }

  private def lastCheckpointVersion(table: String): Option[Long] =
    lastCheckpointMeta(table).map(_._1)

  /** `_last_checkpoint` content: (version, parts) — `parts` absent means
    * a single-file checkpoint (the spec's default). */
  private def lastCheckpointMeta(table: String): Option[(Long, Int)] = {
    val lc = deltaLogDir(table).resolve("_last_checkpoint")
    if (!Files.exists(lc)) None
    else {
      val m = mapper.readValue(Files.readString(lc),
        classOf[java.util.Map[String, AnyRef]])
      Some((m.get("version").asInstanceOf[Number].longValue(),
        Option(m.get("parts")).map(_.asInstanceOf[Number].intValue())
          .getOrElse(1)))
    }
  }

  /** The parquet file(s) of checkpoint `cv` — one `N.checkpoint.parquet`
    * for the classic form, or the spec's multi-part layout
    * `N.checkpoint.<part>.<parts>.parquet` (part indices 1-based, every
    * part REQUIRED: a missing part would silently drop live files, so the
    * resolution fails loud instead). */
  private def checkpointFiles(table: String, cv: Long): Seq[Path] = {
    val single = deltaLogDir(table).resolve(f"$cv%020d.checkpoint.parquet")
    if (Files.exists(single)) Seq(single)
    else lastCheckpointMeta(table) match {
      case Some((v, parts)) if v == cv && parts > 1 =>
        val files = (1 to parts).map(i =>
          deltaLogDir(table).resolve(
            f"$cv%020d.checkpoint.$i%010d.$parts%010d.parquet"))
        val missing = files.filterNot(Files.exists(_))
        require(missing.isEmpty,
          s"$table: _last_checkpoint names a $parts-part checkpoint at " +
            s"version $cv but ${missing.map(_.getFileName).mkString(",")} " +
            "is missing — a partial multi-part checkpoint cannot replay")
        files
      case _ => throw new IllegalArgumentException(
        s"$table: _last_checkpoint names version $cv but " +
          s"${single.getFileName} is missing and no multi-part layout is " +
          "declared")
    }
  }

  /** EXPLICIT checkpoint of the exported log's HEAD — the maintenance
    * verb behind `CALL graft.checkpoint(path)`: snapshots the live state
    * into one checkpoint parquet + `_last_checkpoint` (idempotent — an
    * existing checkpoint file at the head is kept), so readers bootstrap
    * in O(live files) and [[vacuumLog]] may retire the covered JSON
    * prefix. [[exportLog]] still checkpoints automatically every 10
    * versions; this pins one at the current head on demand. Above
    * `partRows` action rows the checkpoint lands in the spec's
    * MULTI-PART layout (each part a bounded parquet write; parts
    * publish before `_last_checkpoint` declares them). Returns the
    * checkpointed version. */
  def checkpoint(spark: SparkSession, table: String,
                 partRows: Int = CheckpointPartRows): Long = {
    require(partRows > 0, s"checkpoint: partRows $partRows must be > 0")
    val head = headVersion(table)
    require(head >= 0, s"checkpoint: $table has no exported _delta_log")
    writeCheckpoint(spark, table, head, partRows)
    head
  }

  /** A Delta checkpoint is parquet whose rows each carry at most one
    * action as a nested struct column — Spark reads it natively (all
    * parts as one scan for the multi-part form). Rows stream to the
    * driver through `toLocalIterator` — one partition in memory at a
    * time, never the whole manifest as a second driver-side array (the
    * replayed `st.live` + tombstone maps are the only O(files) driver
    * state, and they are the reader's product). Bootstraps into a FRESH
    * state only; remove tombstones are no-ops for the LIVE set by
    * construction (a fresh replay holds exactly the checkpoint's own
    * adds, and the protocol's order-free rule says an add beats a
    * tombstone for the same path within one checkpoint) but are carried
    * as state — with txn actions — so a later checkpoint republishes
    * them (ADVICE r14: dropping either broke foreign writers' vacuum /
    * streaming idempotence across this bridge's log cleanup). */
  private def bootstrapFromCheckpoint(spark: SparkSession, table: String,
                                      cv: Long, st: LogState): Unit = {
    require(st.live.isEmpty && st.schemaJson == null,
      "bootstrapFromCheckpoint expects a fresh LogState")
    val files = checkpointFiles(table, cv)
    val rows = spark.read.parquet(files.map(_.toString): _*)
    val cols = rows.columns.toSet
    val it = rows.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      def struct(name: String): Option[org.apache.spark.sql.Row] =
        if (cols.contains(name) && !r.isNullAt(r.fieldIndex(name)))
          Some(r.getStruct(r.fieldIndex(name)))
        else None
      // a foreign checkpoint may omit optional struct fields entirely
      // (its parquet schema simply lacks them) — absent ≠ null
      def field[T](row: org.apache.spark.sql.Row, name: String): Option[T] =
        if (row.schema != null && row.schema.fieldNames.contains(name) &&
            !row.isNullAt(row.fieldIndex(name)))
          Some(row.getAs[T](name))
        else None
      struct("protocol").foreach { p =>
        val features = field[scala.collection.Seq[String]](p, "readerFeatures")
          .map(_.toSeq).getOrElse(Seq.empty)
        requireReadable(p.getAs[Int]("minReaderVersion"), features)
        st.minReader = p.getAs[Int]("minReaderVersion")
        st.minWriter = field[Int](p, "minWriterVersion").getOrElse(st.minWriter)
        st.readerFeatures = features
        st.writerFeatures =
          field[scala.collection.Seq[String]](p, "writerFeatures")
            .map(_.toSeq).getOrElse(Seq.empty)
      }
      struct("metaData").foreach { md =>
        st.schemaJson = md.getAs[String]("schemaString")
        // Row.getAs surfaces arrays as a MUTABLE Seq — convert, don't cast
        st.partitionCols =
          field[scala.collection.Seq[String]](md, "partitionColumns")
            .map(_.toSeq).getOrElse(Seq.empty)
        field[String](md, "id").foreach(st.metaId = _)
        st.configuration =
          field[scala.collection.Map[String, String]](md, "configuration")
            .map(_.toMap).getOrElse(Map.empty)
      }
      struct("add").foreach { a =>
        val pv =
          field[scala.collection.Map[String, String]](a, "partitionValues")
            .map(_.toMap).getOrElse(Map.empty[String, String])
        val dv = field[org.apache.spark.sql.Row](a, "deletionVector")
          .map { d =>
            DeletionVectors.Descriptor(
              d.getAs[String]("storageType"),
              d.getAs[String]("pathOrInlineDv"),
              field[Int](d, "offset"),
              d.getAs[Int]("sizeInBytes"),
              field[Long](d, "cardinality").getOrElse(-1L))
          }
        st.live += (a.getAs[String]("path") ->
          AddEntry(pv, field[String](a, "stats"), dv))
      }
      // remove tombstones: no-ops for the LIVE set in a fresh bootstrap
      // (see Scaladoc) but carried as state so a LATER checkpoint built
      // on this bootstrap republishes them (the spec's retention chain;
      // a path also added in this checkpoint stays live — defensive, a
      // conformant checkpoint never carries both)
      struct("remove").foreach { r =>
        val p = r.getAs[String]("path")
        if (!st.live.contains(p))
          st.tombstones += (p -> (
            field[Long](r, "deletionTimestamp"),
            field[Boolean](r, "dataChange").getOrElse(true)))
      }
      struct("txn").foreach { tx =>
        st.txns += (tx.getAs[String]("appId") -> (
          tx.getAs[Long]("version"), field[Long](tx, "lastUpdated")))
      }
    }
    // the add-beats-tombstone rule, order-free: a foreign checkpoint
    // may serialize a path's remove row before its add row
    st.live.keysIterator.foreach(st.tombstones -= _)
  }
}
