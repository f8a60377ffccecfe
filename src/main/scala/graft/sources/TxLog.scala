package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** A minimal parquet TRANSACTION LOG — the Delta/Iceberg commit protocol
  * re-implemented on plain files, closing SURVEY §2's K4 row (the gold
  * layer's transactional writes) functionally while the environment lacks
  * a lake-format jar. Everything is the real protocol in miniature:
  *
  *  - A table is a directory; each write lands its parquet part-files in a
  *    fresh `stage-*` subdirectory (data files are IMMUTABLE — never
  *    appended to, never deleted by writers).
  *  - State is the replay of `_graft_log/vNNNNN.json` commit records, each
  *    holding `add` / `remove` file lists (relative paths). Version k's
  *    snapshot = replay of v1..vk.
  *  - A commit is published by ATOMIC_MOVE of a temp file onto its version
  *    name — the filesystem is the arbiter: two writers racing for version
  *    k cannot both win the rename, the loser re-reads the log and retries
  *    at k+1 (optimistic concurrency, the Delta protocol's core).
  *  - Readers never lock: a snapshot is a pure function of the immutable
  *    log prefix, so TIME TRAVEL (`read(asOf = k)`) and concurrent-writer
  *    isolation come for free. Half-written commits are invisible (temps
  *    live under a name the replay ignores).
  *
  * At 100 TB the same design holds because commits are metadata-sized (file
  * LISTS, not data) and data files are immutable: the only serialization
  * point is the version-name rename. Cited shape: the reference gold layer
  * writes Delta (BuildGoldLayer.py:219-235); this supplies the semantics
  * those writes rely on (atomic replace, schema-stable appends, versioned
  * reads) without the jar.
  */
object TxLog {

  private val LogDir = "_graft_log"

  private def logPath(table: String): Path = Paths.get(table, LogDir)

  private def versionFile(table: String, v: Int): Path =
    logPath(table).resolve(f"v$v%05d.json")

  /** Committed versions, ascending (replay order). */
  def versions(table: String): Seq[Int] = {
    val lp = logPath(table)
    if (!Files.isDirectory(lp)) Seq.empty
    else Files.list(lp).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.matches("v\\d{5}\\.json") =>
        n.substring(1, 6).toInt }
      .toSeq.sorted
  }

  /** Live data files (relative to the table root) at `asOf` (None = HEAD). */
  def liveFiles(table: String, asOf: Option[Int] = None): Seq[String] = {
    val vs = versions(table)
    val replay = asOf match {
      case Some(v) => vs.filter(_ <= v)
      case None    => vs
    }
    val live = scala.collection.mutable.LinkedHashSet[String]()
    replay.foreach { v =>
      val (add, remove) = readCommit(table, v)
      remove.foreach(live -= _)
      add.foreach(live += _)
    }
    live.toSeq
  }

  /** Snapshot read; empty-schema-safe only when the table has data. */
  def read(spark: SparkSession, table: String,
           asOf: Option[Int] = None): DataFrame = {
    val files = liveFiles(table, asOf).map(f => s"$table/$f")
    require(files.nonEmpty, s"no live files in $table at $asOf")
    spark.read.parquet(files: _*)
  }

  /** Append `df` as a new commit; returns the committed version. */
  def append(spark: SparkSession, df: DataFrame, table: String,
             partFiles: Int = 2): Int =
    commit(table, add = stage(df, table, partFiles), remove = Seq.empty)

  /** Replace the table contents atomically; returns the version. */
  def overwrite(spark: SparkSession, df: DataFrame, table: String,
                partFiles: Int = 2): Int = {
    val staged = stage(df, table, partFiles)
    // remove is computed INSIDE the commit loop: on a retry the live set
    // may have grown, and an overwrite must replace whatever is live at
    // ITS version, not at the version it first observed
    commitWith(table) { () => (staged, liveFiles(table)) }
  }

  /** Write df's part-files into a fresh immutable stage dir; returns their
    * table-relative paths. */
  private def stage(df: DataFrame, table: String, partFiles: Int): Seq[String] = {
    val name = s"stage-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = Paths.get(table, name)
    df.coalesce(partFiles).write.mode("errorifexists").parquet(dir.toString)
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && n.startsWith("part-"))
      .toSeq.sorted
      .map(f => s"$name/$f")
  }

  /** Optimistic-concurrency commit: claim the next version by atomic
    * rename; on a collision re-read and retry. */
  def commit(table: String, add: Seq[String], remove: Seq[String]): Int =
    commitWith(table)(() => (add, remove))

  private def commitWith(table: String)
                        (actions: () => (Seq[String], Seq[String])): Int = {
    Files.createDirectories(logPath(table))
    var attempts = 0
    while (attempts < 100) {
      attempts += 1
      val (add, remove) = actions()
      val v = versions(table).lastOption.getOrElse(0) + 1
      val tmp = Files.createTempFile(logPath(table), ".tmp-", ".json")
      Files.writeString(tmp, commitJson(v, add, remove))
      try {
        // ATOMIC_MOVE without REPLACE_EXISTING: the filesystem arbitrates —
        // exactly one writer's rename lands on vNNNNN.json
        Files.move(tmp, versionFile(table, v), StandardCopyOption.ATOMIC_MOVE)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race — re-read, retry
      }
    }
    throw new IllegalStateException(s"commit to $table: too many conflicts")
  }

  private def commitJson(v: Int, add: Seq[String], remove: Seq[String]): String = {
    def arr(xs: Seq[String]) = xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    s"""{"version":$v,"add":${arr(add)},"remove":${arr(remove)}}"""
  }

  private def readCommit(table: String, v: Int): (Seq[String], Seq[String]) = {
    val txt = Files.readString(versionFile(table, v))
    def list(key: String): Seq[String] = {
      val m = s""""$key":\\[([^\\]]*)\\]""".r.findFirstMatchIn(txt)
      m.map(_.group(1)).filter(_.nonEmpty)
        .map(_.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")))
        .getOrElse(Seq.empty)
    }
    (list("add"), list("remove"))
  }
}
