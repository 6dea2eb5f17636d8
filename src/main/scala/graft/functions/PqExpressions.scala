package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftColumns
import org.apache.spark.sql.types._

/** Product-quantization kernels as native codegen expressions.
  *
  * Why not HOFs: the assignment loop is J·C·K ≈ 2k multiply-adds per
  * vector and the ADC loop J·K per candidate pair — Spark's
  * `transform`/`aggregate` evaluate those interpreted with boxed
  * lambdas (measured ~0.26 M vec/s on 16 cores for assignment; the
  * tight primitive loop below is the whole-stage-codegen answer).
  * Fold order and tie rule replicate the HOF form EXACTLY (left-to-
  * right double sums, first strict minimum), so results — and the
  * recall invariant — are bit-identical to the SQL-mirrorable version
  * `vec_pq` proves against DuckDB.
  *
  * The flattened codebook (cb[((j·C + c)·K + k)]) rides in the plan as
  * a reference object, not a 1024-literal array expression.
  */
object PqKernel {
  def codes(vec: ArrayData, cb: Array[Double], J: Int, C: Int, K: Int,
      isFloat: Boolean): ArrayData = {
    val out = new Array[Int](J)
    var j = 0
    while (j < J) {
      var best = Double.MaxValue
      var idx = -1
      var c = 0
      while (c < C) {
        var dist = 0.0
        var k = 0
        val base = (j * C + c) * K
        val voff = j * K
        while (k < K) {
          val x = if (isFloat) vec.getFloat(voff + k).toDouble else vec.getDouble(voff + k)
          val diff = x - cb(base + k)
          dist += diff * diff
          k += 1
        }
        if (dist < best) { best = dist; idx = c }
        c += 1
      }
      out(j) = idx
      j += 1
    }
    new GenericArrayData(out)
  }

  def adc(q: ArrayData, codes: ArrayData, cb: Array[Double], J: Int, C: Int, K: Int,
      isFloat: Boolean): Double = {
    var s = 0.0
    var j = 0
    while (j < J) {
      val base = (j * C + codes.getInt(j)) * K
      val voff = j * K
      var k = 0
      while (k < K) {
        val x = if (isFloat) q.getFloat(voff + k).toDouble else q.getDouble(voff + k)
        val diff = x - cb(base + k)
        s += diff * diff
        k += 1
      }
      j += 1
    }
    s
  }
}

/** `pq_codes(vec)` → array<int> of J nearest-centroid codes. */
case class PqCodes(child: Expression, codebook: Array[Double], subspaces: Int, nCodes: Int)
    extends UnaryExpression {
  private val sub = codebook.length / (subspaces * nCodes)
  require(codebook.length == subspaces * nCodes * sub, "codebook shape mismatch")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchExpressions.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_codes requires array<float|double>, got ${child.dataType.sql}")

  private lazy val isFloat = SketchExpressions.isFloatVec(child.dataType)

  override def nullSafeEval(input: Any): Any =
    PqKernel.codes(input.asInstanceOf[ArrayData], codebook, subspaces, nCodes, sub, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernel.codes($c, $cb, $subspaces, $nCodes, $sub, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** `pq_adc(q_vec, codes)` → asymmetric L2² distance to the reconstruction. */
case class PqAdc(left: Expression, right: Expression, codebook: Array[Double],
    subspaces: Int, nCodes: Int)
    extends BinaryExpression {
  private val sub = codebook.length / (subspaces * nCodes)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchExpressions.isVec(left.dataType) &&
      right.dataType.isInstanceOf[ArrayType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc requires (array<float|double>, array<int>), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  private lazy val isFloat = SketchExpressions.isFloatVec(left.dataType)

  override def nullSafeEval(q: Any, codes: Any): Any =
    PqKernel.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      codebook, subspaces, nCodes, sub, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.functions.PqKernel.adc($q, $c, $cb, $subspaces, $nCodes, $sub, $isFloat)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pqCodes(vec: Column, codebook: Array[Double], subspaces: Int, nCodes: Int): Column =
    GraftColumns.column(PqCodes(GraftColumns.expression(vec), codebook, subspaces, nCodes))
  def pqAdc(q: Column, codes: Column, codebook: Array[Double], subspaces: Int, nCodes: Int): Column =
    GraftColumns.column(PqAdc(GraftColumns.expression(q), GraftColumns.expression(codes),
      codebook, subspaces, nCodes))
}
