package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftColumns
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as an EXACT RATIONAL — a native codegen
  * kernel (the PqKernel precedent: a per-row two-pointer matching loop
  * is not a Catalyst-expressible computation, and an HOF emulation
  * would be interpreted per character).
  *
  * Why rational: jw = num/den with integer num, den derived from the
  * match count m, half-transpositions t, lengths l1,l2 and the common
  * prefix ℓ — so THRESHOLD DECISIONS (keep pairs with jw ≥ θ = p/q)
  * become exact integer cross-multiplications `q·num ≥ p·den` with no
  * floating-point boundary anywhere, while the reported similarity is
  * ONE final double division (identically rounded on any IEEE engine).
  *
  * Semantics pinned to the common reference implementation (verified
  * against DuckDB's jaro_winkler_similarity on boundary probes):
  *  - match window = max(l1,l2)/2 − 1 (integer division, may be 0);
  *  - t = (mismatched matched-position count)/2, INTEGER floor;
  *  - jaro = [m²(l1+l2) + (m−t)·l1·l2] / [3·l1·l2·m];
  *  - Winkler boost only when jaro > 0.7 (exact: 10·num > 7·den),
  *    prefix ℓ ≤ 4, weight 1/10:  jw = [(10−ℓ)·num + ℓ·den] / [10·den];
  *  - any empty input (and m = 0) → 0/1 (the DuckDB convention: even
  *    "" vs "" scores 0).
  */
object StringSimKernel {
  /** Returns {num, den}: jaroWinkler(a, b) = num/den exactly, den > 0. */
  def jaroWinklerParts(a: UTF8String, b: UTF8String): GenericArrayData = {
    val s = a.toString
    val t = b.toString
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 || l2 == 0) return new GenericArrayData(Array(0L, 1L))
    // clamped at 0 (the commons-text/RapidFuzz convention): for two
    // 1-char strings max/2-1 = -1 would find zero matches and score
    // identical chars 0, where DuckDB's jaro_winkler('a','a') = 1.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val sMatch = new Array[Boolean](l1)
    val tMatch = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return new GenericArrayData(Array(0L, 1L))
    // half-transpositions: mismatches between the two matched sequences
    var mism = 0
    var si = 0
    var tj = 0
    i = 0
    while (i < m) {
      while (!sMatch(si)) si += 1
      while (!tMatch(tj)) tj += 1
      if (s.charAt(si) != t.charAt(tj)) mism += 1
      si += 1; tj += 1
      i += 1
    }
    val tr = mism / 2
    val mL = m.toLong
    val num = mL * mL * (l1 + l2) + (mL - tr) * l1 * l2
    val den = 3L * l1 * l2 * mL
    // common prefix, capped at 4
    var p = 0
    while (p < 4 && p < l1 && p < l2 && s.charAt(p) == t.charAt(p)) p += 1
    if (p > 0 && 10L * num > 7L * den)
      new GenericArrayData(Array((10L - p) * num + p * den, 10L * den))
    else new GenericArrayData(Array(num, den))
  }
}

/** `jaro_winkler_parts(s, t)` → array<long> {num, den}. */
case class JaroWinklerParts(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_jaro_winkler_parts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler_parts requires (string, string), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernel.jaroWinklerParts(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimKernel.jaroWinklerParts($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerParts =
    copy(left = newLeft, right = newRight)
}

object StringSimFunctions {
  def jaroWinklerParts(a: Column, b: Column): Column =
    GraftColumns.column(JaroWinklerParts(
      GraftColumns.expression(a), GraftColumns.expression(b)))
}
