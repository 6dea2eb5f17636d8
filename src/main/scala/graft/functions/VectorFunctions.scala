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
    * Identical summation order → bit-identical results.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.GraftColumns
    GraftColumns.column(DotProduct(GraftColumns.expression(asDouble(a)), GraftColumns.expression(asDouble(b))))
  }

  /** ‖v‖₂. */
  def norm(v: Column): Column = {
    import org.apache.spark.sql.graft.GraftColumns
    val vd = GraftColumns.expression(asDouble(v))
    sqrt(GraftColumns.column(DotProduct(vd, vd)))
  }

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Random-hyperplane LSH bucket: `nBits`-bit signature from the sign of
    * projections onto pseudo-random hyperplanes. The "hyperplanes" are
    * derived deterministically from (bit, dim) via a hash → [-1,1) weight,
    * so executors need no broadcast state and replays are stable.
    */
  def hyperplaneBucket(v: Column, nBits: Int, seed: Int = 0): Column = {
    val vd = asDouble(v)
    val bits = (0 until nBits).map { b =>
      // projection = Σ_i w(seed,b,i)·v_i with w in [-1,1) from xxhash64
      val proj = aggregate(
        zip_with(
          vd,
          sequence(lit(0), size(vd) - 1),
          (x, i) => x * (pmod(xxhash64(lit(seed), lit(b), i), lit(2000001L)).cast("double") / 1000000d - 1d)
        ),
        lit(0.0),
        (acc, x) => acc + x
      )
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
