package graft.sources.v2

import graft.sources.{DeltaBridge, TxLog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertAction, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, V2CommandExec}

/** SQL `UPDATE … SET` and `MERGE INTO` for graft-delta catalog tables.
  *
  * Spark's native row-level path (`RewriteUpdateTable` /
  * `RewriteMergeIntoTable`) rewrites these statements only for
  * `SupportsRowLevelOperations` connectors, whose GROUP-BASED
  * copy-on-write rewrites every scanned group — the WHOLE table unless
  * the connector also implements runtime group filtering. This engine
  * already owns a file-granular transactional kernel
  * ([[graft.sources.TxLog.updateWhere]] / [[graft.sources.TxLog.merge]]:
  * only files containing a matched row rewrite, OCC-safe, partition-
  * aware), so the statements plan straight onto it through this strategy
  * instead: `experimental.extraStrategies` runs BEFORE the built-in
  * planner (whose `BasicOperators` would throw TABLE_OPERATION
  * unsupported), the same precedence contract `injectPlannerStrategy`
  * gives [[graft.plans.TopKPerKeyStrategy]].
  *
  * CLOSED-WORLD like the DELETE path: the WHERE condition goes through
  * Spark's own expression→V2 translator (`DataSourceV2Strategy
  * .translateFilterV2` — the exact translator the DSv2 pushdown trusts)
  * into [[V2PredicateSql]]'s proven SQL renderer, and SET values through
  * [[CatalystSetSql]]'s proven renderer; anything either cannot prove it
  * renders exactly fails the STATEMENT loudly — never a wrong update.
  * The rendered SQL is parsed back by THIS Spark session (TxLog evaluates
  * it with `expr`/`where`), so the round trip is parser-exact, not
  * cross-engine-approximate.
  *
  * MERGE accepts the TxLog-provable shape — `ON t.k = s.k` with
  * unconditional `WHEN MATCHED THEN UPDATE SET *` + `WHEN NOT MATCHED
  * THEN INSERT *` (star or the equivalent explicit full-row column list)
  * — and refuses everything else loudly. SQL MERGE cardinality holds: a
  * source with duplicate join keys is refused (delta-spark raises the
  * same error), because the kernel would insert both copies.
  */
object GraftDmlStrategy extends SparkStrategy {

  /** Idempotent imperative registration on a live session — the same
    * dual-path contract as `GraftFunctions.ensureRegistered`: the
    * extensions class injects this strategy at build time, and sessions
    * built without it (the catalog-conf-only deployment) get it the
    * first time the catalog initializes. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(GraftDmlStrategy))
      em.extraStrategies = em.extraStrategies :+ GraftDmlStrategy
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case UpdateTable(rel, assignments, condition) =>
      graftTable(rel).map { t =>
        planUpdate(t, assignments, condition)
      }.toSeq
    case m: MergeIntoTable =>
      graftTable(m.targetTable).map { t =>
        planMerge(t, m)
      }.toSeq
    case _ => Nil
  }

  /** The strategy fires only on OUR table; every other relation falls
    * through to the built-in planner untouched. */
  private def graftTable(plan: LogicalPlan): Option[GraftDeltaTable] =
    plan match {
      case SubqueryAlias(_, child) => graftTable(child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftDeltaTable => Some(t)
        case _                  => None
      }
      // by planning time V2ScanRelationPushDown has turned the relation
      // into its scan form — the original table rides along on .relation
      case s: org.apache.spark.sql.execution.datasources.v2
                .DataSourceV2ScanRelation =>
        graftTable(s.relation)
      case _ => None
    }

  // ------------------------------------------------------------- UPDATE

  private def planUpdate(table: GraftDeltaTable,
                         assignments: Seq[Assignment],
                         condition: Option[Expression]): SparkPlan =
    GraftDmlExec("UPDATE", { spark =>
      table.assertMutable("UPDATE")
      val condSql = condition.map(conditionSql(table, "UPDATE", _))
        .getOrElse("true")
      val set = assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => refuse(table, "UPDATE",
            s"SET target $other is not a top-level column")
        }
        val value = CatalystSetSql.toSql(fold(a.value)).getOrElse(refuse(
          table, "UPDATE",
          s"SET value ${a.value.sql} is outside the proven " +
            "expression set (literals, columns, arithmetic, CAST, " +
            "upper/lower/concat/coalesce)"))
        name -> value
      }
      // a duplicate SET target must not silently last-win through toMap
      val dup = set.groupBy(_._1).collect { case (n, vs) if vs.size > 1 => n }
      if (dup.nonEmpty) refuse(table, "UPDATE",
        s"duplicate SET targets ${dup.mkString(",")}")
      TxLog.updateWhere(spark, table.dmlPath, condSql, set.toMap)
      DeltaBridge.exportLog(spark, table.dmlPath)
    })

  // -------------------------------------------------------------- MERGE

  private def planMerge(table: GraftDeltaTable,
                        m: MergeIntoTable): SparkPlan =
    GraftDmlExec("MERGE", { spark =>
      table.assertMutable("MERGE")
      require(!m.withSchemaEvolution,
        s"MERGE on ${table.name()}: WITH SCHEMA EVOLUTION is not " +
          "supported (the table schema is fixed by the log)")
      require(m.notMatchedBySourceActions.isEmpty,
        s"MERGE on ${table.name()}: WHEN NOT MATCHED BY SOURCE clauses " +
          "are outside the proven shape")
      val targetOut = m.targetTable.outputSet
      val sourceOut = m.sourceTable.outputSet
      // ON t.k = s.k — one equi-key, same column name on both sides
      val key = m.mergeCondition match {
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            a: AttributeReference, b: AttributeReference) =>
          val (tk, sk) =
            if (targetOut.contains(a) && sourceOut.contains(b)) (a, b)
            else if (targetOut.contains(b) && sourceOut.contains(a)) (b, a)
            else refuse(table, "MERGE",
              s"ON ${m.mergeCondition.sql} must compare one target " +
                "column with one source column")
          if (!tk.name.equalsIgnoreCase(sk.name)) refuse(table, "MERGE",
            s"ON compares ${tk.name} with ${sk.name}; the proven shape " +
              "is the same column name on both sides")
          tk
        case other => refuse(table, "MERGE",
          s"ON ${other.sql} is outside the proven shape (one equality " +
            "between a target and a source column)")
      }
      // WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *
      // (resolved: full-row target := source assignments)
      val upAssigns = m.matchedActions match {
        case Seq(UpdateAction(None, as, _)) => as
        case other => refuse(table, "MERGE",
          s"matched actions $other: the proven shape is exactly one " +
            "unconditional UPDATE SET *")
      }
      val insAssigns = m.notMatchedActions match {
        case Seq(InsertAction(None, as)) => as
        case other => refuse(table, "MERGE",
          s"not-matched actions $other: the proven shape is exactly one " +
            "unconditional INSERT *")
      }
      def fullRow(as: Seq[Assignment], what: String)
          : Seq[(Attribute, Expression)] = {
        val pairs = as.map {
          case Assignment(t: AttributeReference, v) =>
            if (!v.references.subsetOf(sourceOut)) refuse(table, "MERGE",
              s"$what assignment for ${t.name} references target " +
                "columns; the proven shape assigns from the source row")
            (t: Attribute) -> v
          case a => refuse(table, "MERGE",
            s"$what target ${a.key} is not a top-level column")
        }
        val names = pairs.map(_._1.name.toLowerCase).toSet
        val all = m.targetTable.output.map(_.name.toLowerCase).toSet
        if (names != all) refuse(table, "MERGE",
          s"$what must cover every table column (SET * / INSERT *); " +
            s"got ${names.mkString(",")} of ${all.mkString(",")}")
        pairs
      }
      val up = fullRow(upAssigns, "UPDATE")
      val ins = fullRow(insAssigns, "INSERT")
      // TxLog.merge writes ONE projection for both verbs (matched keys
      // replaced by it, unmatched keys insert it), so the proven shape
      // requires the UPDATE and INSERT lists to assign the SAME source
      // expression per column — `SET * / INSERT *` trivially does.
      // Diverging lists must refuse, or inserted rows would silently
      // take the UPDATE list's values (review finding r13).
      val insByName = ins.map { case (t, v) => t.name.toLowerCase -> v }.toMap
      up.foreach { case (t, v) =>
        val iv = insByName(t.name.toLowerCase)
        if (!v.semanticEquals(iv)) refuse(table, "MERGE",
          s"UPDATE assigns ${t.name} = ${v.sql} but INSERT assigns " +
            s"${iv.sql}; the proven shape uses one projection for both " +
            "(SET * / INSERT *)")
      }
      // one source projection named as the target's columns, evaluated
      // from the resolved source plan — TxLog.merge replaces matched
      // keys with these rows and inserts the unmatched ones
      val projected = Project(
        up.map { case (t, v) => Alias(v, t.name)() }, m.sourceTable)
      // evaluate the source ONCE: the cardinality check plus merge's own
      // two passes (hit semi-join, rewrite union) would otherwise run an
      // expensive — or non-deterministic — source plan three times
      // (review finding r13)
      val src = org.apache.spark.sql.GraftSqlBridge.ofRows(spark, projected)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // SQL MERGE cardinality: at most one source row per NON-NULL key
        // (NULL keys never match anything — they all insert, legally)
        val dup = src
          .filter(org.apache.spark.sql.functions.col(key.name).isNotNull)
          .groupBy(key.name).count()
          .filter(org.apache.spark.sql.functions.col("count") > 1)
          .limit(1).count()
        require(dup == 0,
          s"MERGE on ${table.name()}: the source has multiple rows for " +
            "the same join key — SQL MERGE cardinality violation")
        TxLog.merge(spark, src, table.dmlPath, key.name)
      } finally src.unpersist(blocking = false)
      DeltaBridge.exportLog(spark, table.dmlPath)
    })

  // ---------------------------------------------------------- rendering

  /** Collapse every deterministic foldable subtree to its literal —
    * analyzed commands carry shapes like `cast(1 as bigint)` that the
    * optimizer would fold for ordinary queries; folding first keeps the
    * proven renderer small without losing exactness. */
  private def fold(e: Expression): Expression = e.transformUp {
    case x if x.foldable && x.deterministic =>
      // some foldable shapes only evaluate after their own optimizer
      // rule runs (current_date and friends) — keep the node on any
      // evaluation failure so the CLOSED-WORLD renderer refuses it with
      // its own message instead of an eval stack trace
      try Literal.create(x.eval(null), x.dataType)
      catch { case scala.util.control.NonFatal(_) => x }
  }

  private def conditionSql(table: GraftDeltaTable, verb: String,
                           cond: Expression): String = {
    val v2 = org.apache.spark.sql.GraftSqlBridge.translateFilterV2(fold(cond))
    v2.flatMap(V2PredicateSql.toSql).getOrElse(refuse(table, verb,
      s"WHERE ${cond.sql} is outside the proven predicate set"))
  }

  private def refuse(table: GraftDeltaTable, verb: String,
                     why: String): Nothing =
    throw new UnsupportedOperationException(
      s"$verb on ${table.name()}: $why — rewrite the statement inside " +
        "the proven set, or use the TxLog API directly")
}

/** UPDATE SET values render through ONE closed-world pipeline — Spark's
  * own catalyst→V2 scalar translator ([[org.apache.spark.sql
  * .GraftSqlBridge.translateExpressionV2]], the `V2ExpressionBuilder`
  * the DSv2 pushdown machinery trusts) into [[V2PredicateSql]]'s proven
  * SQL renderer — the exact path WHERE conditions take, so the two
  * surfaces cannot drift (review finding r13: a hand-rolled second
  * renderer had already diverged on ABS/CONCAT). The rendered string is
  * evaluated by the SAME Spark session (TxLog's `expr`), so every
  * accepted form's round trip is parser-exact; None for everything
  * outside the proven set. */
private[v2] object CatalystSetSql {
  def toSql(e: Expression): Option[String] =
    org.apache.spark.sql.GraftSqlBridge.translateExpressionV2(e)
      .flatMap(V2PredicateSql.toSql)
}

/** Eager command execution node (the `V2CommandExec` contract: `run()`
  * fires once, from the driver, when the command result is collected). */
private[v2] case class GraftDmlExec(verb: String,
                                    body: SparkSession => Unit)
  extends V2CommandExec with org.apache.spark.sql.execution.LeafExecNode {
  override def run(): Seq[InternalRow] = {
    body(session.asInstanceOf[SparkSession])
    Nil
  }
  override def output: Seq[Attribute] = Nil
  override def simpleString(maxFields: Int): String = s"GraftDmlExec $verb"
}
