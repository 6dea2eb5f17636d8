package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: Σ aᵢ·bᵢ over two array<double> columns.
  *
  * Why a custom Expression: Spark's higher-order functions (`aggregate`,
  * `zip_with`) are interpreted per-element with boxed lambdas — fine for
  * occasional use, but the inner loop of ANN search / embedding dedup
  * runs it millions of times per partition. This expression participates
  * in whole-stage codegen with a tight primitive loop (same left-to-right
  * summation order as the HOF version, so results are bit-identical and
  * the DuckDB oracle comparison is unaffected).
  *
  * Mismatched lengths dot the common prefix; null input → null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (SketchExpressions.isVec(left.dataType) && SketchExpressions.isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<float|double> arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  // accepting float arrays directly matters: wrapping the hot path in a
  // `transform(v, cast)` HOF puts an interpreted per-element allocation on
  // EVERY candidate pair once the similarity filter is pushed into a join
  // condition (measured ~266 µs/pair vs ~0.1 µs for this loop)
  private lazy val leftFloat = SketchExpressions.isFloatVec(left.dataType)
  private lazy val rightFloat = SketchExpressions.isFloatVec(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val gx = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val gy = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $gx * $gy;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: v / ‖v‖₂ in ONE pass (all-zero vectors pass
  * through unchanged; null → null). Output is always array<double>.
  *
  * Why a custom Expression and not `transform(v, x -> x / norm(v))`: the
  * HOF shape references the norm INSIDE a lambda, and once projection
  * collapsing inlines the producing expression the Σx² re-evaluates per
  * ELEMENT — measured as a 64× (= dim) per-row blowup on the SemDeDup
  * projection, multiplied again when the input vector is itself a
  * non-trivial expression (`dedup_semantic`'s perturbed branch ran at
  * ~21 ms/row for d=64). Here the child is evaluated exactly once per row
  * and the normalize is a tight two-pass primitive loop inside
  * whole-stage codegen.
  *
  * Arithmetic order matches the HOF version bit-for-bit: norm is the same
  * left-to-right Σxᵢ·xᵢ as [[DotProduct]](v,v) under `sqrt`, and each
  * output element is the same double division — so oracle comparisons are
  * unaffected by the swap.
  */
case class UnitNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_unit_normalize"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (SketchExpressions.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_unit_normalize requires array<float|double>, got ${child.dataType.sql}")
  }

  private lazy val isFloat = SketchExpressions.isFloatVec(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = xi
      s += xi * xi
      i += 1
    }
    val nrm = math.sqrt(s)
    if (nrm != 0.0) {
      i = 0
      while (i < n) { out(i) = out(i) / nrm; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      val gx = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $gx;
         |  $s += $out[$i] * $out[$i];
         |}
         |double $nrm = java.lang.Math.sqrt($s);
         |if ($nrm != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] = $out[$i] / $nrm; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitNormalize =
    copy(child = newChild)
}
