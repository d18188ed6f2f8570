package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StructType}

import graft.sources.CommitLog

/** Injected SQL statements for the table layer's MAINTENANCE commands
  * (r10) — the Delta split exactly: standard statements (SELECT with
  * VERSION AS OF, INSERT INTO, CREATE TABLE) flow through the V2
  * catalog ([[graft.sources.GraftCatalog]]); the commands ANSI SQL
  * has no words for ride a delegating parser extension
  * (SparkSessionExtensions.injectParser — Delta's DeltaSqlParser
  * pattern):
  *
  *   RESTORE TABLE cat.tbl TO VERSION [AS OF] n
  *   VACUUM cat.tbl RETAIN n VERSIONS
  *   OPTIMIZE cat.tbl ZORDER BY (colA, colB, ...)
  *
  * Anything unmatched delegates VERBATIM to Spark's parser, so the
  * extension is invisible to every other statement. Each command is a
  * LeafRunnableCommand — driver-side metadata work returning its
  * counters as rows (the data movement, if any, runs as ordinary
  * distributed jobs inside the CommitLog call). */
object GraftSqlParser {
  private val onEqRe =
    """(?is)(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)""".r

  /** Validate a MERGE ON clause: every equality binds one side to the
    * target, one to the source, and names the SAME column (the log's
    * merge keys on shared column names); multiple AND-joined
    * equalities form a composite key (r11). Returns the key columns. */
  /** The table's system-computed columns: GENERATED (derived),
    * IDENTITY (allocated) and DEFAULT (constant-filled). An INSERT
    * column list omitting any of them routes through the graft
    * command so the write path computes them (r13). */
  private[plans] def computedColsOf(props: Map[String, String]): Set[String] =
    props.keys.collect {
      case k if k.startsWith("generated.") => k.stripPrefix("generated.")
      case k if k.startsWith("identity.") => k.stripPrefix("identity.")
      case k if k.startsWith("default.") => k.stripPrefix("default.")
    }.toSet

  private[plans] def mergeKeyColsOf(onClause: String, tAlias: String,
      sAlias: String): Seq[String] =
    onEqRe.findAllMatchIn(onClause).map { m =>
      val (q1, c1, q2, c2) = (m.group(1), m.group(2), m.group(3), m.group(4))
      val (tCol, sCol) =
        if (q1 == tAlias && q2 == sAlias) (c1, c2)
        else if (q1 == sAlias && q2 == tAlias) (c2, c1)
        else throw new IllegalArgumentException(
          s"MERGE ON must equate target and source columns, got $q1.$c1 = $q2.$c2")
      require(tCol == sCol,
        s"graft MERGE keys on shared column names, got $tCol vs $sCol")
      tCol
    }.toSeq
}

class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  private val restoreRe =
    """(?is)\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+VERSION\s+(?:AS\s+OF\s+)?(\d+)\s*;?\s*""".r
  private val vacuumRe =
    """(?is)\s*VACUUM\s+([\w.]+)\s+RETAIN\s+(\d+)\s+VERSIONS(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val vacuumHoursRe =
    """(?is)\s*VACUUM\s+([\w.]+)\s+RETAIN\s+(\d+)\s+HOURS\s*;?\s*""".r
  private val optimizeRe =
    """(?is)\s*OPTIMIZE\s+([\w.]+)\s+ZORDER\s+BY\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)\s*;?\s*""".r
  private val optimizeWhereRe =
    """(?is)\s*OPTIMIZE\s+([\w.]+)\s+WHERE\s+(\w+)\s*=\s*'([^']*)'\s*;?\s*""".r
  // OPTIMIZE t MIGRATE LAYOUT [LIMIT n] — bounded partition-spec
  // convergence (r13): rewrite up to n old-generation files under the
  // current spec (CommitLog.migrateLayout)
  private val optimizeMigrateRe =
    """(?is)\s*OPTIMIZE\s+([\w.]+)\s+MIGRATE\s+LAYOUT(?:\s+LIMIT\s+(\d+))?\s*;?\s*""".r
  // DELETE / MERGE are statements Spark PARSES natively but cannot
  // EXECUTE against a plain V2 catalog table (they need the row-level
  // operation API) — so the graft forms intercept here and route to
  // the commit log's CoW writes, and gate on the identifier actually
  // naming a registered graft catalog: anything else delegates
  // verbatim, keeping Spark's own DELETE/MERGE semantics for every
  // other table. MERGE supports the canonical upsert shape
  // (UPDATE SET * / INSERT *) — exactly CommitLog.merge's contract.
  private val historyRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.]+)\s*;?\s*""".r
  private val detailRe =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([\w.]+)\s*;?\s*""".r
  private val showPartitionsRe =
    """(?is)\s*SHOW\s+PARTITIONS\s+([\w.]+)\s*;?\s*""".r
  // PRUNE ESTIMATE t WHERE <predicates> (r15, VERDICT item 7): the
  // scan's file-skipping decision as an inspectable statement —
  // zero data I/O, zero partition planning
  private val pruneEstimateRe =
    """(?is)\s*PRUNE\s+ESTIMATE\s+([\w.]+)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val cloneRe =
    ("""(?is)\s*CREATE\s+TABLE\s+([\w.]+)\s+SHALLOW\s+CLONE\s+([\w.]+)""" +
      """(?:\s+VERSION\s+(?:AS\s+OF\s+)?(\d+))?\s*;?\s*""").r
  private val deleteRe =
    """(?is)\s*DELETE\s+FROM\s+([\w.]+)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val updateRe =
    """(?is)\s*UPDATE\s+([\w.]+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val reorgRe =
    """(?is)\s*REORG\s+TABLE\s+([\w.]+)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""".r
  // the canonical incrementally-maintainable aggregate shape (per-key
  // COUNT + SUM — IncrementalView's contract), aliased n/total
  private val createMvRe =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s+AS\s+SELECT\s+(\w+)\s*,\s*""" +
      """COUNT\s*\(\s*\*\s*\)\s+AS\s+n\s*,\s*SUM\s*\(\s*(\w+)\s*\)\s+AS\s+total\s+""" +
      """FROM\s+([\w.]+)\s+GROUP\s+BY\s+(?:1|\w+)\s*;?\s*""").r
  // the MULTI-aggregate form (r11): one or more group keys, COUNT(*),
  // then per measure the canonical 4-aggregate family aliased
  // nv_/total_/mn_/mx_<measure> — IncrementalViewMulti's restricted
  // canonical form, like the MERGE statement's UPDATE SET * shape
  private val createMvMultiRe =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s+AS\s+SELECT\s+""" +
      """((?:\w+\s*,\s*)+)COUNT\s*\(\s*\*\s*\)\s+AS\s+n\s*,\s*(.+?)\s+""" +
      """FROM\s+([\w.]+)\s+GROUP\s+BY\s+([\w\s,]+?)\s*;?\s*""").r
  // one canonical measure aggregate: COUNT/SUM/MIN/MAX/AVG — and,
  // since r13 (VERDICT item 4), STDDEV_POP/VAR_POP, and since r14
  // (VERDICT item 3) the SAMPLE forms STDDEV/STDDEV_SAMP/VARIANCE/
  // VAR_SAMP — over a single column, aliased nv_/total_/mn_/mx_/
  // avg_/std_/var_/stds_/vars_<column>. The family may appear in ANY
  // order and as ANY subset per measure (r12, VERDICT item 2 — exact
  // tiling was the r11 rule; the first statement a real analyst
  // writes has an AVG and skips MIN/MAX); AVG derives as total/nv,
  // the variance families from ONE maintained exact sum-of-squares —
  // population at n, sample with the n/(n−1) Bessel factor, both at
  // read, no extra folded state. What remains refused is what is
  // genuinely unmaintainable here: FILTER clauses, DISTINCT
  // aggregates, expressions.
  private val mvItemRe =
    ("""(?is)\s*(COUNT|SUM|MIN|MAX|AVG|STDDEV_POP|STDDEV_SAMP|STDDEV|""" +
      """VAR_POP|VAR_SAMP|VARIANCE)\s*\(\s*(\w+)\s*\)\s+AS\s+(\w+)\s*""").r
  // the arm guard: at least one CANONICAL alias present — this is
  // what lets `SUM(v) AS total` (the 2-column form) fall through
  private val mvCanonAliasRe =
    """(?is)\bAS\s+(?:nv_|total_|mn_|mx_|avg_|stds_|std_|vars_|var_)\w+""".r

  /** Parse a multi-view measure list into (measure columns in
    * first-mention order, AVG-declared measures, population
    * second-moment measures, sample second-moment measures). Throws
    * with the statement-contract message on anything outside the
    * canonical families (a FILTER clause, a DISTINCT aggregate, a
    * mis-aliased aggregate, an expression). */
  private def parseMvMeasures(aggBlob: String)
      : (Seq[String], Seq[String], Seq[String], Seq[String]) = {
    val items = aggBlob.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val parsed = items.map {
      case mvItemRe(func, colName, alias) =>
        val prefix = func.toUpperCase match {
          case "COUNT" => "nv_"
          case "SUM" => "total_"
          case "MIN" => "mn_"
          case "MAX" => "mx_"
          case "AVG" => "avg_"
          case "STDDEV_POP" => "std_"
          case "VAR_POP" => "var_"
          case "STDDEV" | "STDDEV_SAMP" => "stds_"
          case "VARIANCE" | "VAR_SAMP" => "vars_"
        }
        require(alias == prefix + colName,
          s"materialized-view aggregates use canonical aliases " +
            s"($prefix$colName), got '$alias' for $func($colName)")
        (prefix, colName)
      case other => throw new IllegalArgumentException(
        s"materialized view supports COUNT(*) AS n plus per-measure " +
          s"COUNT/SUM/MIN/MAX/AVG/STDDEV_POP/VAR_POP/STDDEV/" +
          s"STDDEV_SAMP/VARIANCE/VAR_SAMP (canonical aliases, any " +
          s"order or subset; FILTER clauses, DISTINCT aggregates and " +
          s"expressions are not incrementally maintainable here); " +
          s"unsupported aggregates remain: '$other'")
    }
    (parsed.map(_._2).distinct,
      parsed.filter(_._1 == "avg_").map(_._2).distinct,
      parsed.filter(p => p._1 == "std_" || p._1 == "var_")
        .map(_._2).distinct,
      parsed.filter(p => p._1 == "stds_" || p._1 == "vars_")
        .map(_._2).distinct)
  }
  // the JOIN form (r11): FROM fact JOIN dim ON f.k = d.k — routes to
  // IncrementalViewMulti.createJoined (pinned dimension, delta rule
  // for an immutable join side)
  private val createMvJoinRe =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s+AS\s+SELECT\s+""" +
      """((?:\w+\s*,\s*)+)COUNT\s*\(\s*\*\s*\)\s+AS\s+n\s*,\s*(.+?)\s+""" +
      """FROM\s+([\w.]+)\s+JOIN\s+([\w.]+)\s+ON\s+(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s+""" +
      """GROUP\s+BY\s+([\w\s,]+?)\s*;?\s*""").r
  private val refreshMvRe =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s*;?\s*""".r
  // the ON clause is one or more AND-joined qualified equalities —
  // composite keys route to CommitLog.mergeKeyed (r11)
  private val mergeRe =
    ("""(?is)\s*MERGE\s+(?:(WITH)\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+USING\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?""" +
      """\s+ON\s+((?:\w+\s*\.\s*\w+\s*=\s*\w+\s*\.\s*\w+)(?:\s+AND\s+\w+\s*\.\s*\w+\s*=\s*\w+\s*\.\s*\w+)*)""" +
      """\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
      """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r
  // the MIXED-clause form (r12): a conditional DELETE clause ahead of
  // the canonical upsert pair, plus an optional insert guard — the
  // CDC-apply statement (source rows carry an op marker; matched
  // deletes drop, the guard keeps unmatched delete-markers from
  // inserting — the documented Delta CDC MERGE pattern)
  // WITH SCHEMA EVOLUTION (r15, VERDICT item 5 — Delta's clause and
  // placement): legal on the canonical upsert form, where `UPDATE SET
  // * / INSERT *` makes the source schema the intended new shape; the
  // mixed CDC form REFUSES it (its source carries routing markers —
  // e.g. `op` — that must never evolve into the table, and the
  // statement has no way to say which columns are markers).
  private val mergeDeleteRe =
    ("""(?is)\s*MERGE\s+(?:(WITH)\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+USING\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?""" +
      """\s+ON\s+((?:\w+\s*\.\s*\w+\s*=\s*\w+\s*\.\s*\w+)(?:\s+AND\s+\w+\s*\.\s*\w+\s*=\s*\w+\s*\.\s*\w+)*)""" +
      """\s+WHEN\s+MATCHED\s+AND\s+(.+?)\s+THEN\s+DELETE""" +
      """\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
      """\s+WHEN\s+NOT\s+MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+INSERT\s+\*\s*;?\s*""").r
  private val onEqRe =
    """(?is)(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)""".r
  // INSERT INTO t (a, b) SELECT/VALUES ... — intercepted ONLY when
  // the target is a graft table with generated columns the column
  // list OMITS (r13, VERDICT item 3): Spark's analysis null-fills
  // omitted columns BEFORE any V1 writer sees the frame, so the
  // omission-means-compute contract can only be honored where the
  // omission is still visible — the statement's own column list.
  // Everything else (no column list, generated column supplied,
  // non-graft target) delegates verbatim: supplied values still
  // VALIDATE in the write path, so an explicit NULL fails by name.
  private val insertColsRe =
    """(?is)\s*INSERT\s+INTO\s+([\w.]+)\s*\(\s*([\w\s,]+?)\s*\)\s+((?:SELECT|VALUES|WITH|TABLE|FROM)\b.+?)\s*;?\s*""".r

  private def insertOmitsGenerated(ident: String, colsBlob: String): Boolean =
    SparkSession.getActiveSession.exists { s =>
      try {
        val root = GraftSqlCommands.rootOf(s, ident.split('.').toSeq)
        val cols = colsBlob.split(',').map(_.trim.toLowerCase(java.util.Locale.ROOT)).toSet
        GraftSqlParser.computedColsOf(
          graft.sources.CommitLog.tableProperties(root))
          .exists(c => !cols.contains(c.toLowerCase(java.util.Locale.ROOT)))
      } catch { case scala.util.control.NonFatal(_) => false }
    }

  private def isGraftCatalog(ident: String): Boolean = {
    val parts = ident.split('.')
    parts.length == 2 && SparkSession.getActiveSession.exists(
      _.conf.getOption(s"spark.sql.catalog.${parts.head}")
        .contains("graft.sources.GraftCatalog"))
  }

  // CREATE TABLE with ANSI/Delta COLUMN-DEFINITION clauses for the
  // computed-column trio (r14, VERDICT item 8):
  //   id  BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1000 INCREMENT BY 2)
  //   day BIGINT GENERATED ALWAYS AS (event_id % 7)
  //   src STRING DEFAULT 'x'
  // — one statement, parsed down to the EXISTING TBLPROPERTIES
  // encoding (identity.<col>/generated.<col>/default.<col>); no
  // behavior change underneath, the write-path kernels are the
  // authority. Intercepted ONLY when a graft-catalog target carries
  // at least one trio clause; every other CREATE TABLE delegates to
  // Spark's parser and the V2 catalog verbatim.
  private val createColsRe =
    ("""(?is)\s*CREATE\s+TABLE\s+([\w.]+)\s*\((.+?)\)""" +
      """(?:\s+PARTITIONED\s+BY\s*\(\s*([\w\s,]+?)\s*\))?""" +
      """(?:\s+TBLPROPERTIES\s*\(\s*(.+?)\s*\))?\s*;?\s*""").r
  private val typeRe = """\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?"""
  private val colIdentityRe =
    ("""(?is)\s*(\w+)\s+(""" + typeRe + """)\s+GENERATED\s+ALWAYS\s+AS\s+""" +
      """IDENTITY(?:\s*\(\s*START\s+WITH\s+(-?\d+)\s+INCREMENT\s+BY\s+(-?\d+)\s*\))?\s*""").r
  private val colGeneratedRe =
    ("""(?is)\s*(\w+)\s+(""" + typeRe + """)\s+GENERATED\s+ALWAYS\s+AS\s*\((.+)\)\s*""").r
  private val colDefaultRe =
    ("""(?is)\s*(\w+)\s+(""" + typeRe + """)\s+DEFAULT\s+(.+?)\s*""").r
  private val tblPropRe = """'([^']+)'\s*=\s*'([^']*)'""".r

  /** Split a column-definition (or property) blob on TOP-LEVEL commas
    * — commas inside parens (DECIMAL(18,4), generation expressions)
    * and single-quoted strings never split. */
  private def splitTopLevel(blob: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0; var quoted = false
    blob.foreach {
      case '\'' => quoted = !quoted; sb += '\''
      case '(' if !quoted => depth += 1; sb += '('
      case ')' if !quoted => depth -= 1; sb += ')'
      case ',' if !quoted && depth == 0 => out += sb.toString; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) out += sb.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** (cleaned "name type" DDL fragments, derived trio properties) —
    * or None when no definition carries a trio clause (the statement
    * then delegates untouched). */
  private def parseTrioColumns(colsBlob: String)
      : Option[(Seq[String], Seq[(String, String)])] = {
    val defs = splitTopLevel(colsBlob)
    var any = false
    val parsed = defs.map {
      case colIdentityRe(name, tpe, start, step) =>
        any = true
        (s"$name $tpe", Seq(s"identity.$name" ->
          s"${Option(start).getOrElse("1")},${Option(step).getOrElse("1")}"))
      case colGeneratedRe(name, tpe, exprSql) =>
        any = true
        (s"$name $tpe", Seq(s"generated.$name" -> exprSql.trim))
      case colDefaultRe(name, tpe, dflt) =>
        any = true
        (s"$name $tpe", Seq(s"default.$name" -> dflt.trim))
      case plain => (plain, Nil)
    }
    if (any) Some((parsed.map(_._1), parsed.flatMap(_._2))) else None
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    // every graft statement gates on the identifier actually naming a
    // registered graft catalog — an unmatched RESTORE/VACUUM/OPTIMIZE
    // delegates verbatim, so another extension (e.g. Delta) that owns
    // the same syntax keeps its tables (r11, ADVICE)
    case restoreRe(ident, v) if isGraftCatalog(ident) =>
      RestoreTableCommand(ident.split('.').toSeq, v.toLong)
    case vacuumRe(ident, n, dry) if isGraftCatalog(ident) =>
      VacuumTableCommand(ident.split('.').toSeq, n.toLong, dry != null)
    case vacuumHoursRe(ident, h) if isGraftCatalog(ident) =>
      VacuumHoursCommand(ident.split('.').toSeq, h.toLong)
    case optimizeRe(ident, cols) if isGraftCatalog(ident) =>
      OptimizeZorderCommand(ident.split('.').toSeq,
        cols.split(',').map(_.trim).toSeq)
    case optimizeMigrateRe(ident, limit) if isGraftCatalog(ident) =>
      OptimizeMigrateLayoutCommand(ident.split('.').toSeq,
        Option(limit).map(_.toInt).getOrElse(8))
    case optimizeWhereRe(ident, partCol, value) if isGraftCatalog(ident) =>
      OptimizeWhereCommand(ident.split('.').toSeq, partCol, value)
    case historyRe(ident) if isGraftCatalog(ident) =>
      DescribeHistoryCommand(ident.split('.').toSeq)
    case pruneEstimateRe(ident, cond) if isGraftCatalog(ident) =>
      PruneEstimateCommand(ident.split('.').toSeq, cond)
    case showPartitionsRe(ident) if isGraftCatalog(ident) =>
      ShowGraftPartitionsCommand(ident.split('.').toSeq)
    case detailRe(ident) if isGraftCatalog(ident) =>
      DescribeDetailCommand(ident.split('.').toSeq)
    case cloneRe(target, source, v) if isGraftCatalog(target) && isGraftCatalog(source) =>
      ShallowCloneCommand(target.split('.').toSeq, source.split('.').toSeq,
        Option(v).map(_.toLong))
    case deleteRe(ident, cond) if isGraftCatalog(ident) =>
      DeleteFromGraftCommand(ident.split('.').toSeq, cond)
    case updateRe(ident, sets, cond) if isGraftCatalog(ident) =>
      UpdateGraftCommand(ident.split('.').toSeq, sets, cond)
    case reorgRe(ident) if isGraftCatalog(ident) =>
      ReorgTableCommand(ident.split('.').toSeq)
    case createMvJoinRe(view, keysBlob, aggBlob, factT, dimT,
        q1, c1, q2, c2, groupBlob)
        if isGraftCatalog(view) && isGraftCatalog(factT) &&
          isGraftCatalog(dimT) &&
          mvCanonAliasRe.findFirstIn(aggBlob).isDefined =>
      val (fAls, dAls) = (factT.split('.').last, dimT.split('.').last)
      // the ON equality binds fact and dim on ONE shared column name
      // (createJoined's contract), qualified by the table names
      val (fCol, dCol) =
        if (q1 == fAls && q2 == dAls) (c1, c2)
        else if (q1 == dAls && q2 == fAls) (c2, c1)
        else throw new IllegalArgumentException(
          s"JOIN ON must equate fact and dim columns, got $q1.$c1 = $q2.$c2")
      require(fCol == dCol,
        s"graft join views key on one shared column name, got $fCol vs $dCol")
      val keyCols = keysBlob.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val (units, avgs, moments, samples) = parseMvMeasures(aggBlob)
      val grouped = groupBlob.split(',').map(_.trim).toSeq
      require(grouped == keyCols ||
        grouped == keyCols.indices.map(i => (i + 1).toString),
        s"GROUP BY must list the selected keys (or their positions), " +
          s"got $grouped vs $keyCols")
      CreateMaterializedViewJoinCommand(view.split('.').toSeq,
        factT.split('.').toSeq, dimT.split('.').toSeq, fCol, keyCols,
        units, avgs, moments, samples)
    // guard on a canonical alias so the canonical COUNT+SUM pair
    // falls through to the 2-column form below; every item must then
    // parse — an unsupported aggregate (STDDEV, a stray alias) fails
    // the statement, never silently drops (r11 review; r12 widened
    // acceptance to any order/subset + derived AVG)
    case createMvMultiRe(view, keysBlob, aggBlob, srcT, groupBlob)
        if isGraftCatalog(view) && isGraftCatalog(srcT) &&
          mvCanonAliasRe.findFirstIn(aggBlob).isDefined =>
      val keyCols = keysBlob.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val (units, avgs, moments, samples) = parseMvMeasures(aggBlob)
      val grouped = groupBlob.split(',').map(_.trim).toSeq
      require(grouped == keyCols ||
        grouped == keyCols.indices.map(i => (i + 1).toString),
        s"GROUP BY must list the selected keys (or their positions), " +
          s"got $grouped vs $keyCols")
      CreateMaterializedViewMultiCommand(view.split('.').toSeq,
        srcT.split('.').toSeq, keyCols, units, avgs, moments, samples)
    case createMvRe(view, key, value, srcT)
        if isGraftCatalog(view) && isGraftCatalog(srcT) =>
      CreateMaterializedViewCommand(view.split('.').toSeq,
        srcT.split('.').toSeq, key, value)
    case refreshMvRe(view) if isGraftCatalog(view) =>
      RefreshMaterializedViewCommand(view.split('.').toSeq)
    case createColsRe(ident, colsBlob, partCol, propsBlob)
        if isGraftCatalog(ident) && parseTrioColumns(colsBlob).isDefined =>
      val (cleaned, trio) = parseTrioColumns(colsBlob).get
      val extra = Option(propsBlob).toSeq.flatMap(splitTopLevel).map {
        case tblPropRe(k, v) => k -> v
        case other => throw new IllegalArgumentException(
          s"TBLPROPERTIES entries are 'k' = 'v' pairs, got '$other'")
      }
      CreateGraftTableCommand(ident.split('.').toSeq,
        cleaned.mkString(", "),
        Option(partCol).map(_.split(',').map(_.trim)
          .filter(_.nonEmpty).mkString(",")),
        trio ++ extra)
    case insertColsRe(ident, colsBlob, query)
        if isGraftCatalog(ident) && insertOmitsGenerated(ident, colsBlob) =>
      InsertIntoGraftGeneratedCommand(ident.split('.').toSeq,
        colsBlob.split(',').map(_.trim).filter(_.nonEmpty).toSeq, query)
    // the MIXED-clause form first (more specific): conditional DELETE
    // + upsert + optional insert guard (r12, the CDC-apply statement)
    case mergeDeleteRe(evo, ident, tAls, src, sAls, onClause, delCond, insCond)
        if isGraftCatalog(ident) =>
      require(evo == null,
        "MERGE WITH SCHEMA EVOLUTION supports the canonical upsert form " +
          "only — a mixed-clause CDC source carries routing markers the " +
          "table must not absorb; widen the schema explicitly " +
          "(ALTER TABLE ADD COLUMNS) before a CDC merge")
      val tAlias = Option(tAls).getOrElse(ident.split('.').last)
      val sAlias = Option(sAls).getOrElse(src.split('.').last)
      MergeIntoGraftCommand(ident.split('.').toSeq, src,
        GraftSqlParser.mergeKeyColsOf(onClause, tAlias, sAlias),
        sourceAlias = sAlias, deleteCond = Option(delCond),
        insertCond = Option(insCond))
    case mergeRe(evo, ident, tAls, src, sAls, onClause) if isGraftCatalog(ident) =>
      val tAlias = Option(tAls).getOrElse(ident.split('.').last)
      val sAlias = Option(sAls).getOrElse(src.split('.').last)
      MergeIntoGraftCommand(ident.split('.').toSeq, src,
        GraftSqlParser.mergeKeyColsOf(onClause, tAlias, sAlias),
        schemaEvolution = evo != null)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

private object GraftSqlCommands {
  /** `<catalog>.<table>` → the table root under the catalog's base
    * dir (the same resolution GraftCatalog runs, without forcing the
    * command through catalog table loading — maintenance must work on
    * tables whose head state a normal load would reject). */
  def rootOf(s: SparkSession, parts: Seq[String]): String = {
    require(parts.length == 2,
      s"graft maintenance commands address tables as <catalog>.<table>, got ${parts.mkString(".")}")
    val base = s.conf.getOption(s"spark.sql.catalog.${parts.head}.base")
      .getOrElse(throw new IllegalArgumentException(
        s"'${parts.head}' is not a registered graft catalog " +
          s"(missing spark.sql.catalog.${parts.head}.base)"))
    new java.io.File(base, parts.last).toString
  }
  def attr(name: String): AttributeReference =
    AttributeReference(name, LongType, nullable = false)()
}

/** RESTORE TABLE t TO VERSION n — CommitLog.restore as a statement.
  * Returns the new head version. */
case class RestoreTableCommand(parts: Seq[String], toVersion: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(GraftSqlCommands.attr("head_version"))
  override def run(s: SparkSession): Seq[Row] =
    Seq(Row(CommitLog.restore(GraftSqlCommands.rootOf(s, parts), toVersion)))
}

/** VACUUM t RETAIN n VERSIONS [DRY RUN] — keep the newest n snapshots
  * readable, reclaim files referenced only by older ones. Returns
  * (files_removed, files_kept). DRY RUN (r12, Delta's contract)
  * reports the SAME counts without deleting anything — the operator's
  * pre-flight check before an irreversible reclaim. */
case class VacuumTableCommand(parts: Seq[String], retainVersions: Long,
    dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(GraftSqlCommands.attr("files_removed"), GraftSqlCommands.attr("files_kept"))
  override def run(s: SparkSession): Seq[Row] = {
    require(retainVersions >= 1, "VACUUM must retain at least the head version")
    val root = GraftSqlCommands.rootOf(s, parts)
    val head = CommitLog.latestVersion(root).getOrElse(
      sys.error(s"cannot vacuum an empty table at $root"))
    val retainFrom = math.max(0L, head - retainVersions + 1)
    val (removed, kept) =
      if (dryRun) CommitLog.vacuumDryRun(root, retainFrom)
      else CommitLog.vacuum(root, retainFrom)
    Seq(Row(removed, kept))
  }
}

/** DESCRIBE HISTORY cat.tbl — one row per RETAINED version (vacuumed
  * manifests are gone and do not row): (version, operation, n_files).
  * Pure log metadata, zero data I/O — the audit surface every public
  * table format ships. */
/** DESCRIBE DETAIL cat.tbl — the Delta table-metadata summary, one
  * row from the log alone (no data I/O): head version, live file
  * count, partition column (empty = unpartitioned), files carrying
  * deletion vectors, retained version count, and property count. */
case class DescribeDetailCommand(parts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("head_version"),
    GraftSqlCommands.attr("n_files"),
    AttributeReference("partition_col", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    GraftSqlCommands.attr("n_files_with_vectors"),
    GraftSqlCommands.attr("n_versions_retained"),
    GraftSqlCommands.attr("n_properties"),
    GraftSqlCommands.attr("n_foreign_layout_files"),
    // r15 additions (appended AFTER the r10 columns: existing readers
    // index positionally): physical size from manifest-recorded file
    // sizes (stat-call fallback for pre-r15 files), metadata row
    // count (−1 when any live file lacks a recorded count — an
    // honest "unknown", never a partial sum), and the columns the
    // head snapshot carries typed stats for
    GraftSqlCommands.attr("n_bytes"),
    AttributeReference("n_rows_metadata", LongType, nullable = false)(),
    AttributeReference("stats_columns", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def run(s: SparkSession): Seq[Row] = {
    val root = GraftSqlCommands.rootOf(s, parts)
    val head = CommitLog.latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"no table at $root"))
    val aux = CommitLog.auxOf(root, head)
    // READABLE versions only: checkpointed history keeps rows of
    // vacuumed versions (log vs data retention), but this column
    // promises versions a read can still pin (r11 review)
    val retained = CommitLog.history(root)
      .count { case (v, _, _) => CommitLog.manifestExists(root, v) }.toLong
    // SEGMENTED tables (r17): the summary answers from the manifest's
    // per-segment totals — zero segment-file reads (the old path threw
    // the flat-manifest refusal at the user). No layouts, no vectors,
    // no foreign files by construction; byte/row totals report -1 when
    // any segment predates the r17 counts (an honest unknown — opening
    // 10^6 files to rescue a legacy table's DESCRIBE is the exact cost
    // this layout exists to avoid).
    if (CommitLog.isSegmented(root, head)) {
      val segs = CommitLog.segmentsOf(root, head)
      return Seq(Row(head,
        segs.map(_.nFiles.toLong).sum,
        "",
        0L,
        retained,
        CommitLog.tableProperties(root).size.toLong,
        0L,
        if (segs.forall(_.nBytes.isDefined)) segs.flatMap(_.nBytes).sum else -1L,
        CommitLog.segmentedCountStar(root, head).getOrElse(-1L),
        CommitLog.segmentStatsCol(root, head).getOrElse("")))
    }
    // spec-evolution backlog (r13): files NOT laid out under the
    // current spec — an older generation's column, or no layout entry
    // at all (e.g. a CoW rewrite that dropped its entries) — exactly
    // the set OPTIMIZE ... MIGRATE LAYOUT works off; 0 on a converged
    // (or never-partitioned) table
    val foreign = aux.partCol.map { cur =>
      val curCols = cur.split(',').toSeq
      CommitLog.snapshotFiles(root, head).count { f =>
        val jf = new java.io.File(f)
        aux.layoutOf(jf.getParentFile.getName + "/" + jf.getName) match {
          case Some(pairs) => pairs.map(_._1) != curCols
          case None => true
        }
      }.toLong
    }.getOrElse(0L)
    Seq(Row(head,
      CommitLog.snapshotFiles(root, head).size.toLong,
      aux.partCol.getOrElse(""),
      aux.dvs.count(_._2.nonEmpty).toLong,
      retained,
      CommitLog.tableProperties(root).size.toLong,
      foreign, {
        val rel = CommitLog.snapshotFiles(root, head).map { f =>
          val jf = new java.io.File(f)
          jf.getParentFile.getName + "/" + jf.getName
        }
        rel.map(r => aux.sizes.getOrElse(r,
          new java.io.File(root, r).length())).sum
      }, {
        val rel = CommitLog.snapshotFiles(root, head).map { f =>
          val jf = new java.io.File(f)
          jf.getParentFile.getName + "/" + jf.getName
        }
        // LIVE counts (r16): footer minus manifest-carried masked
        // counts — a merge-on-read table must not present a footer
        // overcount as its row total
        if (rel.forall(f => CommitLog.liveRowsOf(aux, f).isDefined))
          rel.map(f => CommitLog.liveRowsOf(aux, f).get).sum
        else -1L
      },
      aux.statsTags.keys.toSeq.sorted.mkString(",")))
  }
}

/** PRUNE ESTIMATE cat.tbl WHERE <predicates> (r15, VERDICT item 7) —
  * the file-skipping decision as ONE inspectable row, zero data I/O:
  * the statement plans the equivalent filtered SELECT through the
  * ordinary optimizer (so the pushdown translation is EXACTLY the one
  * a real query gets — one pruning engine, no parallel estimator),
  * finds the catalog scan in the optimized plan, and reads its
  * metadata-only prune accounting: (head_version, n_files_total,
  * n_files_read, n_pushed_filters). A predicate the translation
  * cannot act on simply skips nothing — the estimate is exact for
  * the files a real execution would plan (before runtime filters). */
case class PruneEstimateCommand(parts: Seq[String], whereText: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("head_version"),
    GraftSqlCommands.attr("n_files_total"),
    GraftSqlCommands.attr("n_files_read"),
    GraftSqlCommands.attr("n_pushed_filters"))
  override def run(s: SparkSession): Seq[Row] = {
    val df = s.table(parts.mkString("."))
      .where(org.apache.spark.sql.functions.expr(whereText))
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.scan.isInstanceOf[graft.sources.GraftBatchScan] =>
        r.scan.asInstanceOf[graft.sources.GraftBatchScan]
    }
    require(scans.size == 1,
      s"PRUNE ESTIMATE expects one graft scan, found ${scans.size}")
    val (v, total, read, nPushed) = scans.head.pruneAccounting
    Seq(Row(v, total.toLong, read.toLong, nPushed.toLong))
  }
}

/** SHOW PARTITIONS cat.tbl (r15) — the live partition inventory from
  * the MANIFEST alone (zero data I/O, no directory listing): one row
  * per distinct recorded layout tuple among the head's files, Hive
  * spelling (`day=3/bucket=0`), with its file count, byte size
  * (manifest-recorded, stat fallback) and metadata row count (−1
  * when any of the tuple's files lacks a recorded count). Files
  * without a layout entry (pre-partitioning generations, CoW
  * rewrites that dropped theirs) group under the explicit
  * `<unpartitioned>` row rather than disappearing — the inventory
  * always accounts for every live file. */
case class ShowGraftPartitionsCommand(parts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    GraftSqlCommands.attr("n_files"),
    GraftSqlCommands.attr("n_bytes"),
    AttributeReference("n_rows_metadata", LongType, nullable = false)())
  override def run(s: SparkSession): Seq[Row] = {
    val root = GraftSqlCommands.rootOf(s, parts)
    val head = CommitLog.latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"no table at $root"))
    val aux = CommitLog.auxOf(root, head)
    // SEGMENTED tables record no layouts — the inventory is one
    // "<unpartitioned>" row from the manifest's per-segment totals
    // (r17; the old path threw the flat-manifest refusal)
    if (CommitLog.isSegmented(root, head)) {
      val segs = CommitLog.segmentsOf(root, head)
      return Seq(Row("<unpartitioned>",
        segs.map(_.nFiles.toLong).sum,
        if (segs.forall(_.nBytes.isDefined)) segs.flatMap(_.nBytes).sum else -1L,
        CommitLog.segmentedCountStar(root, head).getOrElse(-1L)))
    }
    val rel = CommitLog.snapshotFiles(root, head).map { f =>
      val jf = new java.io.File(f)
      jf.getParentFile.getName + "/" + jf.getName
    }
    rel.groupBy(f => aux.layoutOf(f) match {
      case Some(pairs) => pairs.map { case (c, v) => s"$c=$v" }.mkString("/")
      case None => "<unpartitioned>"
    }).toSeq.sortBy(_._1).map { case (part, fs) =>
      Row(part,
        fs.size.toLong,
        fs.map(f => aux.sizes.getOrElse(f,
          new java.io.File(root, f).length())).sum,
        if (fs.forall(f => CommitLog.liveRowsOf(aux, f).isDefined))
          fs.map(f => CommitLog.liveRowsOf(aux, f).get).sum
        else -1L)
    }
  }
}

/** DESCRIBE HISTORY cat.tbl — one row per history summary row. The
  * row SET is checkpoint-phase-dependent by design (log vs data
  * retention: a checkpoint snapshots summary rows that survive the
  * manifests' vacuum, so vacuumed versions below the checkpoint keep
  * their rows while vacuumed versions above it disappear); rather
  * than pretend otherwise, `is_readable` states per row whether a
  * read can still pin that version — two tables with identical
  * commit+vacuum histories agree on every is_readable=true row
  * (r12, ADVICE). */
case class DescribeHistoryCommand(parts: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("version"),
    AttributeReference("operation", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    GraftSqlCommands.attr("n_files"),
    AttributeReference("is_readable", org.apache.spark.sql.types.BooleanType,
      nullable = false)())
  override def run(s: SparkSession): Seq[Row] = {
    val root = GraftSqlCommands.rootOf(s, parts)
    CommitLog.history(root)
      .map { case (v, op, n) => Row(v, op, n, CommitLog.manifestExists(root, v)) }
  }
}

/** VACUUM t RETAIN n HOURS — time-based retention (the public
  * formats' actual retention contract is a PERIOD, Delta's default 7
  * days): the floor resolves to the oldest version committed within
  * the last n hours (head always retained), then the version-based
  * vacuum runs. Returns (retain_from, files_removed, files_kept). */
case class VacuumHoursCommand(parts: Seq[String], hours: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("retain_from"),
    GraftSqlCommands.attr("files_removed"), GraftSqlCommands.attr("files_kept"))
  override def run(s: SparkSession): Seq[Row] = {
    val root = GraftSqlCommands.rootOf(s, parts)
    val floor = CommitLog.versionFloorByAge(root,
      hours * 3600L * 1000L, System.currentTimeMillis())
    val (removed, kept) = CommitLog.vacuum(root, floor)
    Seq(Row(floor, removed, kept))
  }
}

/** OPTIMIZE cat.tbl WHERE part = 'v' — partition-scoped compaction
  * (Delta's OPTIMIZE ... WHERE), routed to
  * CommitLog.compactPartitions: only the named partition's files
  * rewrite (into one file); everything else carries verbatim. The
  * daily small-file cleanup for a partitioned ingest table. Returns
  * (head_version, files_selected, files_staged). */
case class OptimizeWhereCommand(parts: Seq[String], partCol: String,
    value: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("head_version"),
    GraftSqlCommands.attr("files_selected"),
    GraftSqlCommands.attr("files_staged"))
  override def run(s: SparkSession): Seq[Row] = {
    val (v, sel, staged) = CommitLog.compactPartitions(s,
      GraftSqlCommands.rootOf(s, parts), partCol, Seq(value),
      filesPerPartition = 1)
    Seq(Row(v, sel, staged))
  }
}

/** OPTIMIZE cat.t MIGRATE LAYOUT [LIMIT n] — bounded partition-spec
  * convergence (r13): rewrite up to n files whose recorded layout
  * differs from the current spec under the current partition column
  * (CommitLog.migrateLayout — data-neutral, rebase-looped). Run it
  * repeatedly until files_remaining hits 0; each run is bounded
  * maintenance, never a table-sized rewrite. */
case class OptimizeMigrateLayoutCommand(parts: Seq[String], limit: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("head_version"),
    GraftSqlCommands.attr("files_migrated"),
    GraftSqlCommands.attr("files_remaining"))
  override def run(s: SparkSession): Seq[Row] = {
    val (v, m, rem) = CommitLog.migrateLayout(s,
      GraftSqlCommands.rootOf(s, parts), maxFiles = limit)
    Seq(Row(v, m, rem))
  }
}

/** CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF n] — the
  * zero-copy table fork (Delta's statement), routed to
  * CommitLog.shallowClone: the clone's v0 references the source
  * snapshot's files without copying a byte; schema, partition values,
  * column stats and table properties carry. Returns (head_version,
  * n_files_referenced). */
case class ShallowCloneCommand(target: Seq[String], source: Seq[String],
    version: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("head_version"),
    GraftSqlCommands.attr("n_files_referenced"))
  override def run(s: SparkSession): Seq[Row] = {
    val dst = GraftSqlCommands.rootOf(s, target)
    val v0 = CommitLog.shallowClone(
      GraftSqlCommands.rootOf(s, source), dst, version)
    Seq(Row(v0, CommitLog.snapshotFiles(dst, v0).size.toLong))
  }
}

/** DELETE FROM cat.tbl WHERE cond — the commit log's copy-on-write
  * delete as the standard SQL statement: the predicate text re-parses
  * through the session's own expression parser (functions.expr), so
  * any deterministic SQL predicate works; clean files carry over
  * byte-identical, dirty files rewrite without matching rows, one
  * atomic commit. Returns (head_version, files_carried,
  * files_rewritten). */
case class DeleteFromGraftCommand(parts: Seq[String], condSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("head_version"),
    GraftSqlCommands.attr("files_carried"),
    GraftSqlCommands.attr("files_rewritten"))
  override def run(s: SparkSession): Seq[Row] = {
    val root = GraftSqlCommands.rootOf(s, parts)
    val cond = org.apache.spark.sql.functions.expr(condSql)
    // the Delta property split: tables that opted into deletion
    // vectors get the merge-on-read write (zero rewrites — every file
    // carries, the vectors mask); everyone else the copy-on-write
    if (CommitLog.tableProperty(root, "enableDeletionVectors").contains("true")) {
      val (v, _, _) = CommitLog.deleteMergeOnRead(s, root, cond)
      Seq(Row(v, CommitLog.snapshotFiles(root, v).size.toLong, 0L))
    } else {
      val (v, carried, rewritten) = CommitLog.delete(s, root, cond)
      Seq(Row(v, carried, rewritten))
    }
  }
}

/** UPDATE cat.tbl SET col = expr[, ...] WHERE cond — the commit log's
  * copy-on-write update as the standard SQL statement, completing the
  * row-level DML trio (DELETE / MERGE / UPDATE): assignment
  * right-hand sides and the predicate re-parse through the session's
  * own expression parser (functions.expr), so any deterministic SQL
  * expression works; clean files carry over byte-identical, dirty
  * files rewrite with the assignments applied only to matching rows,
  * one atomic commit. Returns (head_version, files_carried,
  * files_rewritten). */
case class UpdateGraftCommand(parts: Seq[String], setSql: String,
    condSql: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("head_version"),
    GraftSqlCommands.attr("files_carried"),
    GraftSqlCommands.attr("files_rewritten"))
  /** Top-level comma split of the SET list — commas inside parens or
    * single-quoted literals belong to the assignment expression
    * (`SET x = greatest(a, b), y = 'a,b'` is two assignments). */
  private def splitAssignments(sets: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false
    sets.foreach { ch =>
      if (inStr) { cur += ch; if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => inStr = true; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c => cur += c
      }
    }
    out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }
  override def run(s: SparkSession): Seq[Row] = {
    val asgRe = """(?s)\s*(\w+)\s*=\s*(.+)""".r
    val assignments = splitAssignments(setSql).map {
      case asgRe(name, rhs) => name -> org.apache.spark.sql.functions.expr(rhs)
      case other => throw new IllegalArgumentException(
        s"UPDATE SET expects <column> = <expression>, got '$other'")
    }
    val root = GraftSqlCommands.rootOf(s, parts)
    val cond = org.apache.spark.sql.functions.expr(condSql)
    // same property split as DELETE: vectored tables mask old rows
    // and append new ones (zero rewrites), the rest copy-on-write
    if (CommitLog.tableProperty(root, "enableDeletionVectors").contains("true")) {
      val (v, _, _) = CommitLog.updateMergeOnRead(s, root, cond, assignments)
      // carried = the PRIOR snapshot (every file rides through); the
      // head additionally holds the appended post-image files
      Seq(Row(v, CommitLog.snapshotFiles(root, v - 1).size.toLong, 0L))
    } else {
      val (v, carried, rewritten) = CommitLog.update(s, root, cond, assignments)
      Seq(Row(v, carried, rewritten))
    }
  }
}

/** CREATE MATERIALIZED VIEW cat.v AS SELECT key, COUNT(*) AS n,
  * SUM(val) AS total FROM cat.t GROUP BY key — the canonical
  * incrementally-maintainable aggregate as a statement, routed to
  * [[graft.sources.IncrementalView.create]]: a full compute at the
  * source head, with the source root and folded version recorded so
  * REFRESH folds only the changelog. Returns the view's version 0. */
case class CreateMaterializedViewCommand(view: Seq[String],
    source: Seq[String], keyCol: String, valCol: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(GraftSqlCommands.attr("view_version"))
  override def run(s: SparkSession): Seq[Row] =
    Seq(Row(graft.sources.IncrementalView.create(s,
      GraftSqlCommands.rootOf(s, view), GraftSqlCommands.rootOf(s, source),
      keyCol, valCol)))
}

/** CREATE MATERIALIZED VIEW (multi-aggregate form, r11): one or more
  * group keys and per measure the canonical COUNT/SUM/MIN/MAX family —
  * routes to IncrementalViewMulti.createKeyed (composite-key MERGE
  * folds, MIN/MAX bounded recompute under deletes). */
case class CreateMaterializedViewMultiCommand(view: Seq[String],
    source: Seq[String], keyCols: Seq[String], valCols: Seq[String],
    avgCols: Seq[String] = Nil, momentCols: Seq[String] = Nil,
    sampleCols: Seq[String] = Nil)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(GraftSqlCommands.attr("view_version"))
  override def run(s: SparkSession): Seq[Row] =
    Seq(Row(graft.sources.IncrementalViewMulti.createKeyed(s,
      GraftSqlCommands.rootOf(s, view), GraftSqlCommands.rootOf(s, source),
      keyCols, valCols, avgCols = avgCols, momentCols = momentCols,
      sampleCols = sampleCols)))
}

/** CREATE MATERIALIZED VIEW (JOIN form, r11): an aggregate over
  * FACT ⋈ DIM with the dimension pinned at create — routes to
  * IncrementalViewMulti.createJoined; REFRESH folds only the fact
  * deltas enriched by one join against the pinned dim. */
case class CreateMaterializedViewJoinCommand(view: Seq[String],
    fact: Seq[String], dim: Seq[String], dimKey: String,
    keyCols: Seq[String], valCols: Seq[String],
    avgCols: Seq[String] = Nil, momentCols: Seq[String] = Nil,
    sampleCols: Seq[String] = Nil)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(GraftSqlCommands.attr("view_version"))
  override def run(s: SparkSession): Seq[Row] =
    Seq(Row(graft.sources.IncrementalViewMulti.createJoined(s,
      GraftSqlCommands.rootOf(s, view), GraftSqlCommands.rootOf(s, fact),
      GraftSqlCommands.rootOf(s, dim), dimKey, keyCols, valCols,
      avgCols = avgCols, momentCols = momentCols,
      sampleCols = sampleCols)))
}

/** INSERT INTO cat.t (a, b) SELECT/VALUES ... where the column list
  * OMITS one of the table's GENERATED columns (r13, VERDICT item 3):
  * the omitted generated column COMPUTES from its expression instead
  * of null-filling. Spark's own analysis resolves missing columns to
  * NULL before any V1 writer runs, erasing the omission — so the
  * statement is intercepted while the column list is still visible,
  * the query runs as written, listed columns cast to the table's
  * types (ordinary INSERT coercion), omitted NON-generated columns
  * null-fill (ordinary INSERT semantics), and the omitted generated
  * columns are left for the write path to compute — the same
  * fill-or-validate kernel every API write runs. A column list that
  * SUPPLIES the generated column delegates to the normal DSv2 path,
  * where an explicit NULL or divergent value fails validation by
  * name. Returns the committed head version. */
/** CREATE TABLE with ANSI/Delta column-definition clauses for the
  * computed-column trio (r14, VERDICT item 8) — `id BIGINT GENERATED
  * ALWAYS AS IDENTITY (START WITH s INCREMENT BY k)`, `day T
  * GENERATED ALWAYS AS (expr)`, `src T DEFAULT lit` — parsed down to
  * the EXISTING TBLPROPERTIES encoding (identity./generated./
  * default.<col>) plus the statement's own TBLPROPERTIES; the
  * write-path fill/validate/allocate kernels are untouched. The
  * declared columns stay IN the schema (writes compute them). One
  * empty v0 manifest publishes the schema, exactly the V2 catalog's
  * createTable contract. */
case class CreateGraftTableCommand(parts: Seq[String], schemaDdl: String,
    partCol: Option[String], props: Seq[(String, String)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(GraftSqlCommands.attr("head_version"))
  override def run(s: SparkSession): Seq[Row] = {
    val root = GraftSqlCommands.rootOf(s, parts)
    require(CommitLog.latestVersion(root).isEmpty,
      s"table ${parts.mkString(".")} already exists")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    partCol.toSeq.flatMap(_.split(',')).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"partition column '$c' is not in the table schema"))
    val v = CommitLog.commit(root, Nil, expected = None,
      schemaJson = Some(schema.json))
    partCol.foreach(c => CommitLog.setTableProperty(root, "partitionColumn", c))
    props.foreach { case (k, pv) => CommitLog.setTableProperty(root, k, pv) }
    Seq(Row(v))
  }
}

case class InsertIntoGraftGeneratedCommand(parts: Seq[String],
    cols: Seq[String], query: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(GraftSqlCommands.attr("head_version"))
  override def run(s: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val root = GraftSqlCommands.rootOf(s, parts)
    val head = CommitLog.latestVersion(root)
      .getOrElse(sys.error(s"cannot insert into an empty table at $root"))
    val tblSchema = CommitLog.read(s, root, head).schema
    // Spark SQL resolution is case-insensitive by default — the column
    // list resolves against the table schema the same way, then the
    // SCHEMA's canonical casing is used everywhere downstream (r14,
    // ADVICE: a mixed-case list must not fail with 'unknown column')
    val byLower = tblSchema.fields
      .map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f).toMap
    val resolved = cols.map { c =>
      byLower.getOrElse(c.toLowerCase(java.util.Locale.ROOT),
        throw new IllegalArgumentException(
          s"INSERT INTO ${parts.mkString(".")}: unknown column '$c'")).name
    }
    val byName = tblSchema.fields.map(f => f.name -> f).toMap
    val df0 = s.sql(query)
    require(df0.columns.length == resolved.length,
      s"INSERT INTO ${parts.mkString(".")}: column list has " +
        s"${resolved.length} columns but the query produces ${df0.columns.length}")
    val computed = GraftSqlParser.computedColsOf(CommitLog.tableProperties(root))
    // listed columns cast to the table's types (INSERT coercion);
    // omitted plain columns null-fill; omitted GENERATED/IDENTITY/
    // DEFAULT columns stay absent so the append's compute kernels
    // fill them (derive / allocate / default respectively)
    val named = df0.toDF(resolved: _*)
      .select(resolved.map(c => col(c).cast(byName(c).dataType).as(c)): _*)
    val filled = tblSchema.fields
      .filterNot(f => resolved.contains(f.name) || computed.contains(f.name))
      .foldLeft(named)((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))
    val n = s.conf.getOption("spark.graft.insert.files").map(_.toInt).getOrElse(2)
    val v = CommitLog.tableProperty(root, "partitionColumn") match {
      case Some(c) => CommitLog.appendPartitioned(s, root, filled, c,
        filesPerPartition = 1)
      case None => CommitLog.append(s, root, filled, nFiles = n)
    }
    Seq(Row(v))
  }
}

/** REFRESH MATERIALIZED VIEW cat.v — fold the source's changelog
  * since the last refresh into the view (cost ∝ changed rows, never
  * the source). Dispatches on the view's recorded shape: multi-
  * aggregate views (graft.view.valCols) fold through
  * IncrementalViewMulti, the canonical COUNT+SUM pair through
  * IncrementalView. Returns (view_version, rows_folded). */
case class RefreshMaterializedViewCommand(view: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("view_version"),
    GraftSqlCommands.attr("rows_folded"))
  override def run(s: SparkSession): Seq[Row] = {
    val root = GraftSqlCommands.rootOf(s, view)
    val (v, n) =
      if (CommitLog.tableProperty(root, "graft.view.valCols").isDefined) {
        val (v1, n1, _) = graft.sources.IncrementalViewMulti.refresh(s, root)
        (v1, n1)
      } else graft.sources.IncrementalView.refresh(s, root)
    Seq(Row(v, n))
  }
}

/** REORG TABLE cat.tbl APPLY (PURGE) — the selective physical purge:
  * rewrite only the files carrying deletion vectors, carry the rest
  * byte-identical; data-neutral. Returns (head_version,
  * files_carried, files_rewritten). */
case class ReorgTableCommand(parts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("head_version"),
    GraftSqlCommands.attr("files_carried"),
    GraftSqlCommands.attr("files_rewritten"))
  override def run(s: SparkSession): Seq[Row] = {
    val (v, carried, rewritten) =
      CommitLog.reorgPurge(s, GraftSqlCommands.rootOf(s, parts))
    Seq(Row(v, carried, rewritten))
  }
}

/** MERGE INTO cat.tbl t USING src s ON t.k = s.k WHEN MATCHED THEN
  * UPDATE SET * WHEN NOT MATCHED THEN INSERT * — the canonical upsert
  * as a statement, routed to CommitLog.merge: matched keys replaced by
  * their source rows, unmatched source rows inserted, one atomic
  * commit. `src` is a table or view visible to the session. Insert
  * file count: `spark.graft.insert.files` (default 2). Returns
  * (head_version, files_carried, files_rewritten). */
case class MergeIntoGraftCommand(parts: Seq[String], source: String,
    keyCols: Seq[String], sourceAlias: String = "",
    deleteCond: Option[String] = None,
    insertCond: Option[String] = None,
    schemaEvolution: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    GraftSqlCommands.attr("head_version"),
    GraftSqlCommands.attr("files_carried"),
    GraftSqlCommands.attr("files_rewritten"))
  override def run(s: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{coalesce, col, expr, lit, not}
    val root = GraftSqlCommands.rootOf(s, parts)
    val n = s.conf.getOption("spark.graft.insert.files").map(_.toInt).getOrElse(2)
    val srcRaw = s.table(source)
    // MULTIPLE SOURCE ROWS MATCHING ONE TARGET ROW fail the statement
    // (r13, ADVICE — the Delta/ANSI MERGE cardinality error): a CDC
    // batch carrying both an op='D' and an op='U' row for one key, or
    // two update images for one key, has no deterministic sequential
    // meaning — silently routing it (upsert-wins / duplicate target
    // rows) can diverge from a sequential apply. Duplicate UNMATCHED
    // keys stay legal: each inserts, the documented MERGE contract.
    // ONE distributed count — duplicate source keys semi-restricted
    // to keys present in the target — and limit(1): metadata-sized.
    def requireNoDupMatches(effectiveSrc: org.apache.spark.sql.DataFrame): Unit = {
      val head = CommitLog.latestVersion(root)
        .getOrElse(sys.error(s"cannot merge into an empty table at $root"))
      val kc = keyCols.map(col)
      val dup = effectiveSrc.select(kc: _*)
        .groupBy(kc: _*).count().filter(col("count") > 1)
        .join(CommitLog.read(s, root, head).select(kc: _*).distinct(),
          keyCols, "left_semi")
        .limit(1).collect()
      if (dup.nonEmpty) throw new IllegalArgumentException(
        s"MERGE INTO ${parts.mkString(".")}: multiple source rows match " +
          s"the target row with ${keyCols.mkString("(", ", ", ")")} = " +
          dup(0).toSeq.dropRight(1).mkString("(", ", ", ")") +
          " — a MERGE cannot apply two images to one target row; " +
          "de-duplicate the source (e.g. keep the last image per key) " +
          "before merging")
    }
    val (v, carried, rewritten) = deleteCond match {
      case None =>
        // WITH SCHEMA EVOLUTION (r15): one metadata-only widening
        // commit for the source's NEW columns (retypes refuse by
        // name inside), then the ordinary shared merge path —
        // identity/generated columns ride it unchanged
        if (schemaEvolution)
          CommitLog.evolveToInclude(s, root, srcRaw.schema,
            "MERGE INTO ... WITH SCHEMA EVOLUTION")
        requireNoDupMatches(srcRaw)
        CommitLog.mergeKeyed(s, root, srcRaw, keyCols, nInsertFiles = n)
      case Some(dc) =>
        // the MIXED-clause routing (r12): source rows matching the
        // DELETE condition drop their matched targets (unmatched
        // delete-markers are a no-op — a clause for them would have
        // to be the insert guard's business); the rest upsert, with
        // the optional NOT MATCHED guard filtering which UNMATCHED
        // rows may insert (matched rows always update — the guard is
        // an insert guard, not an update guard, per the statement's
        // clause structure). Conditions reference source columns via
        // the source alias; exact MERGE semantics, fully distributed
        // (the matched-ness split is one left-semi/anti against the
        // target's key projection).
        val src = srcRaw.as(sourceAlias)
        val head = CommitLog.latestVersion(root)
          .getOrElse(sys.error(s"cannot merge into an empty table at $root"))
        val tgt = CommitLog.read(s, root, head)
        val delSide = src.filter(coalesce(expr(dc), lit(false)))
        val nonDel = src.filter(not(coalesce(expr(dc), lit(false))))
        val ups = insertCond match {
          case None => nonDel
          case Some(ic) =>
            val tgtKeys = tgt
              .select(keyCols.map(org.apache.spark.sql.functions.col): _*)
            nonDel.join(tgtKeys, keyCols, "left_semi")
              .unionByName(nonDel.join(tgtKeys, keyCols, "left_anti")
                .filter(coalesce(expr(ic), lit(false))))
        }
        // cardinality check over the EFFECTIVE source — delete-side ∪
        // upsert-side — so a key carried by both an op='D' row and an
        // op='U'/'I' row (or by two update images) fails rather than
        // silently resolving upsert-wins (r13, ADVICE). Guarded-out
        // unmatched rows are already excluded from `ups`.
        requireNoDupMatches(
          delSide.select(keyCols.map(col): _*)
            .unionByName(ups.select(keyCols.map(col): _*)))
        // the conditions see the source's marker columns (s.op); the
        // WRITE sees the TARGET's schema — clause-only columns project
        // away here, exactly the Delta CDC-apply shape where `op`
        // drives routing but never lands
        val tgtShape = ups.select(
          tgt.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
        CommitLog.mergeKeyed(s, root, tgtShape, keyCols, nInsertFiles = n,
          deleteKeys = Some(delSide
            .select(keyCols.map(org.apache.spark.sql.functions.col): _*)))
    }
    Seq(Row(v, carried, rewritten))
  }
}

/** OPTIMIZE t ZORDER BY (a, b, ...) — multi-dimensional cluster
  * rewrite through SQL. Cutoffs derive from one per-column MIN/MAX
  * scalar agg (metadata-grade): each dimension splits into 4 equal
  * integer ranges, so k columns tile into 4^k cells (one file per
  * cell), stats recorded on every dimension — the same
  * CommitLog.optimizeClustered the Scala API exposes, with the grid
  * choice the statement form has to make for you. Returns
  * (head_version, n_files). */
case class OptimizeZorderCommand(parts: Seq[String], cols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(GraftSqlCommands.attr("head_version"), GraftSqlCommands.attr("n_files"))
  override def run(s: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, max, min}
    val root = GraftSqlCommands.rootOf(s, parts)
    val head = CommitLog.latestVersion(root).getOrElse(
      sys.error(s"cannot optimize an empty table at $root"))
    val cur = CommitLog.read(s, root, head)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val r = cur.agg(aggs.head, aggs.tail: _*).collect()(0)
    val dims = cols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (r.getLong(2 * i), r.getLong(2 * i + 1))
      // 4 equal integer ranges per dimension; a constant column
      // degenerates to one bucket (empty cutoff list)
      val cuts = (1 to 3).map(k => lo + (hi - lo) * k / 4)
        .filter(c0 => c0 > lo && c0 < hi).distinct
      c -> cuts
    }
    val v = CommitLog.optimizeClustered(s, root, dims, filesPerCell = 1)
    Seq(Row(v, CommitLog.snapshotFiles(root, v).size.toLong))
  }
}
