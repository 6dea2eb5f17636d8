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

/** Native Catalyst expression: integer dot product of two sparse term
  * vectors, each an array<struct<token:string, tf:long>> SORTED by token
  * (distinct tokens per array) — Σ tf_a·tf_b over the token intersection
  * via a two-pointer merge.
  *
  * Why: the exact tf-cosine verify previously computed the dot as a
  * pairs×terms posting join + SUM aggregate — ~|pairs|·|terms/doc| rows
  * through two Exchanges (1.1M rows at sf0.1, the suite's top cost).
  * Attaching each doc's (token,tf) array once per pair side and merging
  * in-row does the identical integer arithmetic with zero extra
  * shuffles. Long addition is order-independent, so the result is
  * bit-identical to the aggregate form.
  *
  * Token comparison is UTF8String binary order — the same ordering
  * `sort_array` applies to StringType under the default binary
  * collation, which is what makes the merge's equality test exhaustive.
  */
case class TfDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.{LongType, StringType, StructType}

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_tf_dot"

  private def isTermArray(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      s.fields.length == 2 && s.fields(0).dataType == StringType &&
        s.fields(1).dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (isTermArray(left.dataType) && isTermArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tf_dot requires two array<struct<string,long>> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var s = 0L
    var i = 0
    var j = 0
    while (i < n && j < m) {
      val rx = x.getStruct(i, 2)
      val ry = y.getStruct(j, 2)
      val c = rx.getUTF8String(0).compareTo(ry.getUTF8String(0))
      if (c == 0) { s += rx.getLong(1) * ry.getLong(1); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |long $s = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $n && $j < $m) {
         |  org.apache.spark.sql.catalyst.InternalRow $rx = $a.getStruct($i, 2);
         |  org.apache.spark.sql.catalyst.InternalRow $ry = $b.getStruct($j, 2);
         |  int $c = $rx.getUTF8String(0).compareTo($ry.getUTF8String(0));
         |  if ($c == 0) { $s += $rx.getLong(1) * $ry.getLong(1); $i++; $j++; }
         |  else if ($c < 0) $i++;
         |  else $j++;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TfDotProduct =
    copy(left = newLeft, right = newRight)
}
