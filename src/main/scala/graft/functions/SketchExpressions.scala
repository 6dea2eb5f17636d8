package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Precompiled sketch kernels called from generated code.
  *
  * Design note (the codegen-size lesson of round 1): building MinHash /
  * SimHash / hyperplane-LSH signatures out of `functions._` trees produces
  * either optimizer blowups (CollapseProject inlining ~10⁴-node chains) or
  * very large Janino classes whose HotSpot recompilation backs up the C2
  * queue and slows the WHOLE JVM for minutes (observed: a 3s query timing
  * at 270s when run after a codegen-heavy one). A native expression whose
  * `doGenCode` is a one-line call into this precompiled object keeps
  * generated classes tiny, keeps the hot loop JIT-compiled ONCE and shared
  * across queries, and needs no explode+groupBy barrier — signature
  * computation becomes pure map-side work, which is also the better shape
  * at 100 TB (no shuffle at all for the signature pass).
  *
  * All kernels are deterministic (seeded xxhash64, same constants as the
  * round-1 Column-expression formulations, reference semantics from the
  * public MinHash/SimHash literature — see SURVEY.md §2 rows 36-37, 41).
  */
object SketchKernels {

  /** MinHash signature over 64-bit shingle hashes: sig[i] = min_h
    * xxh64(i, xxh64(h, 42)). Matches Spark's `xxhash64(h, i)` two-operand
    * chain so round-1 signatures are preserved. Empty input → Long.Max
    * (never collides with a real band). */
  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val base = XXH64.hashLong(hashes.getLong(j), 42L)
      var i = 0
      while (i < k) {
        val p = XXH64.hashLong(i.toLong, base)
        if (p < sig(i)) sig(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Distinct hashed word n-gram shingles of a token array: each shingle
    * is n consecutive tokens joined by ' ' (≤ n tokens → one shingle of
    * the whole array, matching TextFunctions.shinglesFromTokens), hashed
    * with xxh64(utf8-bytes, 42) — identical to Spark's `xxhash64(shingle)`
    * so the DuckDB string-shingle oracle sees the same set cardinalities.
    * First-occurrence order, like `array_distinct`.
    *
    * Why native: the Column formulation nests the tokenizer inside a
    * `transform(sequence(...), i -> slice(tokens, i, n))` lambda; when the
    * token chain is not a materialized attribute, interpreted evaluation
    * re-runs trim+regexp+lower+split per ELEMENT (measured 21 ms/row —
    * ~50× re-evaluation). Here the token array is evaluated exactly once
    * as the expression's child. */
  /** Non-overlapping w-token segments of a token array: [0,w), [w,2w), …
    * (final segment may be shorter); empty input → empty array. The
    * segment unit for line-granular operators on corpora without newline
    * structure — native for the same reason as the sketch kernels: a
    * `transform(sequence, slice+concat_ws)` HOF tree is CodegenFallback,
    * and exploding it measured ~6× the cost of this kernel at sf0.1. */
  def tokenSegments(tokens: ArrayData, w: Int): ArrayData = {
    val nt = tokens.numElements()
    if (nt == 0) return new GenericArrayData(Array.empty[Any])
    val space = UTF8String.fromString(" ")
    val nSeg = (nt + w - 1) / w
    val out = new Array[Any](nSeg)
    var s = 0
    while (s < nSeg) {
      val start = s * w
      val len = math.min(w, nt - start)
      val win = new Array[UTF8String](len)
      var j = 0
      while (j < len) { win(j) = tokens.getUTF8String(start + j); j += 1 }
      out(s) = UTF8String.concatWs(space, win: _*)
      s += 1
    }
    new GenericArrayData(out)
  }

  def hashedShingles(tokens: ArrayData, n: Int): ArrayData = {
    val nt = tokens.numElements()
    val space = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (nt <= n) {
      val toks = new Array[UTF8String](nt)
      var i = 0
      while (i < nt) { toks(i) = tokens.getUTF8String(i); i += 1 }
      val s = UTF8String.concatWs(space, toks: _*)
      seen.add(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L))
    } else {
      val toks = new Array[UTF8String](nt)
      var i = 0
      while (i < nt) { toks(i) = tokens.getUTF8String(i); i += 1 }
      val win = new Array[UTF8String](n)
      i = 0
      while (i <= nt - n) {
        var j = 0
        while (j < n) { win(j) = toks(i + j); j += 1 }
        val s = UTF8String.concatWs(space, win: _*)
        seen.add(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a token array: token hashed once (xxh64 of its
    * UTF-8 bytes, seed 42 — same as Spark's `xxhash64(token)`), bit j of
    * the signature set when more than half the tokens have bit j set. */
  def simhash(tokens: ArrayData, maxTokens: Int): Long = {
    val counts = new Array[Int](64)
    val n = math.min(tokens.numElements(), maxTokens)
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < 64) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) * 2 > n) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Random-hyperplane LSH bucket: bit b of the bucket set when
    * Σ_i v_i·w(seed,b,i) ≥ 0 with w = posmod(xxh64-chain, 2000001)/1e6 − 1
    * in [−1, 1) — same derivation as the round-1 HOF formulation (weights
    * need no broadcast state; replays are stable). */
  def hyperplaneBucket(v: ArrayData, isFloat: Boolean, nBits: Int, seed: Int): Long = {
    val proj = new Array[Double](nBits)
    val n = v.numElements()
    val hSeed = XXH64.hashLong(seed.toLong, 42L)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var b = 0
      while (b < nBits) {
        val h = XXH64.hashLong(i.toLong, XXH64.hashLong(b.toLong, hSeed))
        val m = h % 2000001L
        val pm = if (m < 0) m + 2000001L else m
        proj(b) += x * (pm.toDouble / 1000000d - 1d)
        b += 1
      }
      i += 1
    }
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      if (proj(b) >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
}

private[functions] object SketchExpressions {
  def isVec(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _                                                  => false
  }
  def isFloatVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
}

/** sig = minhash signature (array<long> of length k) of an array<long>
  * of shingle hashes. Map-side only; no shuffle, no explode. */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<bigint> and k > 0, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhashSig(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Distinct hashed word n-gram shingles (array<long>) of an
  * array<string> token column. */
/** Non-overlapping w-token segments of an array<string> token column. */
case class TokenSegments(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_segments"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_token_segments requires array<string> and w > 0, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchKernels.tokenSegments(input.asInstanceOf[ArrayData], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.tokenSegments($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): TokenSegments =
    copy(child = newChild)
}

case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_shingles requires array<string> and n > 0, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchKernels.hashedShingles(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.hashedShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<string> token column. */
case class SimHash64(child: Expression, maxTokens: Int = 1 << 20) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash(input.asInstanceOf[ArrayData], maxTokens)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.simhash($c, $maxTokens)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** nBits-bit random-hyperplane LSH bucket of an array<float|double>. */
case class HyperplaneBucket(child: Expression, nBits: Int, seed: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bucket"

  private lazy val isFloat = SketchExpressions.isFloatVec(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (SketchExpressions.isVec(child.dataType) && nBits > 0 && nBits <= 62) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bucket requires array<float|double> and 0 < nBits ≤ 62, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    SketchKernels.hyperplaneBucket(input.asInstanceOf[ArrayData], isFloat, nBits, seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.hyperplaneBucket($c, $isFloat, $nBits, $seed)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** Codepoints at `count` evenly-spaced character positions —
  * out[i] = codepoint at char index ⌊i·(n−1)/(count−1)⌋, n = char count;
  * empty string → all zeros. Bit-identical to the Column formulation
  * `ascii(substr(payload, 1 + floor(i·(n−1)/(count−1)), 1))` (integer
  * division equals the double floor while i·(n−1) < 2⁵³), which is what
  * the DuckDB oracle replays.
  *
  * Why native: each `substr(pos, 1)` scans the UTF-8 bytes to `pos`, so
  * the Column form costs O(count·n/2) per row — and the projection is
  * consumed by TWO aggregates (mean + bit fold), doubling it. This
  * kernel walks the string ONCE per row (positions are non-decreasing).
  */
object SampleCodepointsKernel {
  def sample(s: UTF8String, count: Int): ArrayData = {
    val str = s.toString
    val out = new Array[Long](count)
    val n = str.codePointCount(0, str.length)
    if (n > 0) {
      var i = 0
      var charIdx = 0
      var off = 0
      while (i < count) {
        val pos = (i.toLong * (n - 1) / (count - 1)).toInt
        while (charIdx < pos) {
          off += Character.charCount(str.codePointAt(off)); charIdx += 1
        }
        out(i) = str.codePointAt(off).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

case class SampleCodepoints(child: Expression, count: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sample_codepoints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if count >= 2 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sample_codepoints requires a string and count >= 2, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SampleCodepointsKernel.sample(input.asInstanceOf[UTF8String], count)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SampleCodepointsKernel.sample($c, $count)")

  override protected def withNewChildInternal(newChild: Expression): SampleCodepoints =
    copy(child = newChild)
}
