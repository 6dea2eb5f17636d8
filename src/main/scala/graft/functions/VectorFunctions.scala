package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float|double>` columns.
  *
  * Pure `aggregate`/`zip_with` expressions — codegen-friendly, no UDF, no
  * MLlib VectorUDT boxing. All math is done in double after an explicit
  * element cast so results are reproducible across engines (the DuckDB
  * oracle mirrors the same left-to-right summation order).
  */
object VectorFunctions {

  /** Elementwise cast to double. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ (left-to-right) — native codegen'd expression (the HOF
    * `aggregate(zip_with(...))` form is interpreted per element; the
    * native loop is the hot path of ANN search and embedding dedup).
    * Accepts array<float|double> directly — no `transform` cast wrapper,
    * which would run interpreted per candidate PAIR once a similarity
    * filter is pushed into a join condition. Identical summation order →
    * bit-identical results across engines.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.GraftColumns
    GraftColumns.column(DotProduct(GraftColumns.expression(a), GraftColumns.expression(b)))
  }

  /** ‖v‖₂. */
  def norm(v: Column): Column = {
    import org.apache.spark.sql.graft.GraftColumns
    val vd = GraftColumns.expression(v)
    sqrt(GraftColumns.column(DotProduct(vd, vd)))
  }

  /** v / ‖v‖₂ as array<double> in one native pass (all-zero vectors pass
    * through; see [[UnitNormalize]] for why this must not be a HOF). */
  def unitNormalize(v: Column): Column = {
    import org.apache.spark.sql.graft.GraftColumns
    GraftColumns.column(UnitNormalize(GraftColumns.expression(v)))
  }

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Per-vector scalar int8 quantization: codes[i] = round((x[i]−lo)·255/
    * (hi−lo)) with (lo, hi) = the vector's own min/max — the standard
    * 4×-compression storage layout for embedding tables (codes ride as
    * array<int> for engine-portable arithmetic; a production sink would
    * pack to binary). Constant vectors (hi = lo) map to code 0.
    * Returns struct(lo, hi, codes). Pure Column arithmetic in a fixed
    * operation order, so an oracle reproduces it bit-for-bit.
    */
  def quantize8(v: Column): Column = {
    val lo = array_min(v)
    val hi = array_max(v)
    val scale = hi - lo
    val codes = transform(v, x =>
      when(scale === 0d, 0).otherwise(round((x - lo) * 255d / scale).cast("int")))
    struct(lo.as("lo"), hi.as("hi"), codes.as("codes"))
  }

  /** Reconstruction of `quantize8` output: x̂[i] = lo + codes[i]·(hi−lo)/255. */
  def dequantize8(q: Column): Column = {
    val lo = q.getField("lo")
    val scale = q.getField("hi") - lo
    transform(q.getField("codes"), c =>
      when(scale === 0d, lo).otherwise(lo + c.cast("double") * scale / 255d))
  }

  /** Random-hyperplane LSH bucket: `nBits`-bit signature from the sign of
    * projections onto pseudo-random hyperplanes. The "hyperplanes" are
    * derived deterministically from (seed, bit, dim) via a hash → [-1,1)
    * weight, so executors need no broadcast state and replays are stable.
    * Native expression (SketchKernels.hyperplaneBucket): the HOF
    * formulation evaluated nBits×nTables interpreted projections with a
    * per-element xxhash64 Column chain — ~48 interpreted passes per row.
    */
  def hyperplaneBucket(v: Column, nBits: Int, seed: Int = 0): Column = {
    import org.apache.spark.sql.graft.GraftColumns
    GraftColumns.column(HyperplaneBucket(GraftColumns.expression(v), nBits, seed))
  }
}
