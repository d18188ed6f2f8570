package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity between two ARRAY<DOUBLE> columns as a native
  * Catalyst expression with whole-stage codegen (SURVEY.md §7.5).
  *
  * This is the hot inner loop of the similarity/dedup operators: at
  * 100 TB the candidate-pair relation is billions of rows, and a
  * codegen'd tight loop (no lambda-function interpretation, no per-
  * element boxing as with the `aggregate`/`zip_with` HOF formulation)
  * keeps it inside the WholeStageCodegen span of the join it feeds.
  *
  * Numerics contract: one sequential pass, index order, independent
  * double accumulators for Σab, Σaa, Σbb, result = Σab/(√Σaa·√Σbb).
  * This is bit-identical to the HOF formulation AND to the DuckDB
  * oracle's `list_sum(list_transform(...))` (verified sequential).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must already be ARRAY<DOUBLE> (callers cast explicitly;
  // AbstractDataType/ExpectsInputTypes is private[sql] so declarative
  // input typing isn't available to third-party expressions)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i); double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Register `cosine_sim(a, b)` on the session (idempotent); callers
    * then use it via `expr("cosine_sim(a, b)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", (args: Seq[Expression]) => CosineSimilarity(args.head, args(1)),
      "built-in")
}
