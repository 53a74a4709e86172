package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Cosine similarity as a native Catalyst expression with whole-stage
 * codegen — the hot inner loop of the similarity-search operators
 * (SURVEY.md §7.5). A Scala UDF here would box every array element and
 * break codegen; this compiles to a tight primitive loop inside the
 * generated stage, which is what makes brute-force scoring of millions of
 * candidate pairs viable per-executor at scale.
 *
 * Formula (pinned for oracle parity with DuckDB SQL):
 *   dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))
 * accumulated sequentially in double over the element index, which matches
 * DuckDB's list_dot_product evaluation order bit-for-bit.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double> (callers cast array<float> up);
  // AbstractDataType is private[sql], so no ImplicitCastInputTypes here.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"${VectorFunctions.CosineName} expects array<double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true // zero-norm or mismatched dims → null

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // Mismatched dimensions are malformed data: return NULL (detectable
    // downstream) rather than a plausible-looking similarity over the
    // common prefix. The DuckDB oracle's list_dot_product errors here, so
    // silence would also be a parity divergence.
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  val CosineName = "graft_cosine"
  val TopKName = "graft_topk"

  /** Idempotent per-session registration; call before using `cosine`/`topk`.
    * Arity guards run in the builders (= at analysis time) so malformed
    * SQL calls fail resolution with a message, not an index error. */
  def register(spark: SparkSession): Unit = {
    def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
      if (exprs.length != n)
        throw new IllegalArgumentException(
          s"$name takes exactly $n arguments, got ${exprs.length}")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CosineName, exprs => {
        arity(CosineName, 2, exprs); CosineSimilarity(exprs(0), exprs(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKName, exprs => {
        arity(TopKName, 3, exprs); TopKPairs(exprs(0), exprs(1), exprs(2))
      }, "built-in")
  }

  /** Column-API face of [[CosineSimilarity]] (requires `register`). */
  def cosine(a: Column, b: Column): Column = call_function(CosineName, a, b)

  /** Column-API face of [[TopKPairs]]: array of (score,id) structs,
    * best-first (requires `register`). */
  def topk(score: Column, id: Column, k: Int): Column =
    call_function(TopKName, score, id, org.apache.spark.sql.functions.lit(k))
}
