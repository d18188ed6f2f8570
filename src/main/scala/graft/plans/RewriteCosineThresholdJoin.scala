package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.functions.{CosineSimilarity, SrpSignature}

/** Opt-in optimizer rule (SURVEY.md §7.5 `RewriteSimilarityTopK`):
  * rewrites a brute-force similarity join
  *
  *   Filter(cosine_sim(a, b) >= τ, Join(A, B, inner/cross))
  *
  * into the banded SRP-LSH candidate join —
  *
  *   Deduplicate(Project(Filter(cosine_sim >= τ ∧ origCond,
  *     Join(posexplode(srp_sig(a)) ⋈ posexplode(srp_sig(b))
  *          ON band-index AND band-key))))
  *
  * turning the O(|A|·|B|) cross product into an O(n·tables) shuffle of
  * band keys, with the original cosine threshold re-verified on
  * candidates (the Deduplicate collapses multi-band collisions).
  *
  * APPROXIMATE by design: pairs whose vectors collide in no band are
  * dropped, so recall < 1 (geometry-dependent) — hence opt-in via
  * `spark.graft.lsh.rewrite.enabled` (spark.-prefixed so it passes
  * runtime conf validation), the same contract as choosing
  * q_sim_lsh_bucketed over q_sim_cosine_topk explicitly. Rows of A/B
  * must be distinct (band collisions are collapsed by Deduplicate over
  * the join output).
  *
  * Usage: `spark.experimental.extraOptimizations ++= Seq(RewriteCosineThresholdJoin)`
  * (runtime) or `spark.sql.extensions=graft.plans.GraftExtensions`
  * (config); then set the flag per query.
  */
object RewriteCosineThresholdJoin extends Rule[LogicalPlan] with PredicateHelper {
  val Flag = "spark.graft.lsh.rewrite.enabled"
  val Tables = 32
  val Bits = 6

  private def enabled: Boolean =
    SQLConf.get.getConfString(Flag, "false").toBoolean

  /** Idempotence marker on rewritten joins. A TreeNodeTag survives the
    * optimizer's node copies (makeCopy propagates tags) and — unlike
    * the r1 `__graft_` attribute-name sniff — cannot be spoofed by
    * user columns that happen to carry that prefix. */
  private[plans] val RewrittenTag =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.lsh.rewritten")

  private def alreadyRewritten(j: Join): Boolean =
    j.getTagValue(RewrittenTag).contains(true)

  /** find a `cosine_sim(a, b) >= τ` conjunct with a on the left side
    * and b on the right (or swapped); return (leftVec, rightVec). */
  private def extractCos(cond: Expression, j: Join): Option[(Expression, Expression)] =
    splitConjunctivePredicates(cond).collectFirst {
      case GreaterThanOrEqual(CosineSimilarity(a, b), Literal(_, _))
          if a.references.subsetOf(j.left.outputSet) &&
            b.references.subsetOf(j.right.outputSet) => (a, b)
      case GreaterThanOrEqual(CosineSimilarity(a, b), Literal(_, _))
          if b.references.subsetOf(j.left.outputSet) &&
            a.references.subsetOf(j.right.outputSet) => (b, a)
    }

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // filter folded into the join condition (post-pushdown shape)
      case j @ Join(_, _, Inner | Cross, Some(cond), _)
          if !alreadyRewritten(j) && extractCos(cond, j).isDefined =>
        val (lv, rv) = extractCos(cond, j).get
        rewrite(None, lv, rv, j)
      // filter still above the join (pre-pushdown shape)
      case Filter(cond, j @ Join(_, _, Inner | Cross, _, _))
          if !alreadyRewritten(j) && extractCos(cond, j).isDefined =>
        val (lv, rv) = extractCos(cond, j).get
        rewrite(Some(cond), lv, rv, j)
    }
  }

  /** Rebuild as banded join; `extraFilter` holds a not-yet-pushed
    * predicate to re-apply above the new join. */
  private def rewrite(extraFilter: Option[Expression], leftVec: Expression,
      rightVec: Expression, j: Join): LogicalPlan = {
    def banded(child: LogicalPlan, vec: Expression, tag: String) = {
      val tbl = AttributeReference(s"__graft_tbl_$tag", IntegerType, nullable = false)()
      val key = AttributeReference(s"__graft_key_$tag", LongType, nullable = true)()
      (Generate(PosExplode(SrpSignature(vec, Tables, Bits)), Nil,
        outer = false, None, Seq(tbl, key), child), tbl, key)
    }
    val (gl, tl, kl) = banded(j.left, leftVec, "l")
    val (gr, tr, kr) = banded(j.right, rightVec, "r")
    val bandCond = And(EqualTo(tl, tr), EqualTo(kl, kr))
    val newJoin = Join(gl, gr, Inner,
      Some(j.condition.map(And(_, bandCond)).getOrElse(bandCond)), JoinHint.NONE)
    newJoin.setTagValue(RewrittenTag, true)
    val body = extraFilter.map(Filter(_, newJoin)).getOrElse(newJoin)
    // distinct over the original join output (collapses multi-band
    // collisions); emitted as Aggregate directly because this rule runs
    // after ReplaceDeduplicateWithAggregate
    Aggregate(j.output, j.output, Project(j.output, body))
  }
}

/** Session-extension injection point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` wires the
  * LSH rewrite rule (flag-gated), and (r10) the table-maintenance SQL
  * statements (RESTORE / VACUUM / OPTIMIZE ZORDER BY — the Delta
  * DeltaSqlParser pattern) into every session built from that config.
  * The harness mains and the test session all register it, so the
  * SQL front-end is on everywhere. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteCosineThresholdJoin)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // table_changes('cat.tbl', from, to) — the Delta CDF table-valued
    // function: resolves to the commit log's row-level changelog plan
    // (graft.sources.CommitLog.changesRows). Resolution reads
    // manifests only; data reading stays lazy in the plan. Bounds are
    // VERSIONS (numeric literals) or TIMESTAMPS (r12 — string
    // literals, 'yyyy-MM-dd HH:mm:ss[.SSS]' or ISO-8601, read as UTC
    // like every engine timestamp): a timestamp bound resolves to the
    // greatest retained version committed at or before that instant
    // (CommitLog.versionAtTime — the Delta "snapshot as of" rule), so
    // a timestamp FROM means "changes SINCE the snapshot at that
    // instant" (exclusive, like a version FROM) and a timestamp TO
    // means "changes up to the snapshot at that instant" (inclusive).
    ext.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftExtensions].getName, "table_changes"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 3,
          "table_changes(table, from, to) takes 3 arguments " +
            "(versions as numbers, timestamps as strings)")
        def evalOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Any = {
          require(e.foldable, s"table_changes arguments must be literals, got $e")
          e.eval()
        }
        def tsMillis(raw: String): Long = {
          val t = raw.trim
          scala.util.Try(java.time.Instant.parse(t).toEpochMilli)
            .orElse(scala.util.Try(
              java.time.LocalDateTime.parse(t.replace(' ', 'T'))
                .toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
            .getOrElse(throw new IllegalArgumentException(
              s"table_changes: '$raw' is neither a version number nor a " +
                "timestamp ('yyyy-MM-dd HH:mm:ss[.SSS]' or ISO-8601, UTC)"))
        }
        val ident = String.valueOf(evalOf(args(0)))
        val s = org.apache.spark.sql.SparkSession.active
        val root = GraftSqlCommands.rootOf(s, ident.split('.').toSeq)
        def boundOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
          evalOf(e) match {
            case n: Number => n.longValue()
            case other => graft.sources.CommitLog.versionAtTime(
              root, tsMillis(String.valueOf(other)))
          }
        graft.sources.CommitLog.changesRows(s, root,
          boundOf(args(1)), boundOf(args(2)))
          .queryExecution.logical
      }))
  }
}
