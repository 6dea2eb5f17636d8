package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational linear algebra over an embedding column — the pieces of
  * corpus-level spectral analysis that survive 100 TB because the matrix
  * never materializes anywhere: each step is a projection plus a
  * dim-sized aggregation.
  *
  * Determinism contract (the same one kmeansStep/meanPool pin): per-row
  * dot products are fixed left-fold HOFs (identical IEEE sequence in
  * DuckDB's list_reduce), cross-row sums go through DECIMAL (order
  * independent), and every remaining double expression is closed-form
  * and mirrored token-for-token by the oracle.
  *
  * Reference scope: the reference ships generic SQL transforms only; this
  * extends the vector surface on the engine side (SURVEY §2 row 166).
  */
object LinAlgOps {

  /** One power-iteration step toward the corpus Gram matrix's top
    * eigenvector: v₁ = Xᵀ(X·v₀), with v₀ = the embedding of the smallest
    * `idCol` (deterministic seed, no RNG — same convention as
    * kmeansStep's init centroids).
    *
    * Shape: v₀ (unit-normalized seed) rides as a ONE-ROW broadcast;
    * y = X·v₀ is a pure projection (fixed-fold dot product per row);
    * Xᵀy explodes each row to (component index, xⱼ·yᵢ) and DECIMAL-sums
    * per index — dim output rows, one shuffle keyed on the component
    * index. With ‖v₀‖ = 1, ‖v₁‖ estimates the top eigenvalue of XᵀX as
    * iterations proceed; the head components fold over the SORTED
    * dim-row list, so every double op has a fixed order.
    *
    * Returns one row: (dim, lambda_est, c0..c3 of v₁/‖v₁‖).
    */
  def powerIterationStep(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val x = embeddings.select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("x"))
    val v0 = x.orderBy("__id").limit(1)
      .withColumn("__n0", sqrt(aggregate(col("x"), lit(0.0), (s, e) => s + e * e)))
      .select(transform(col("x"), e => e / col("__n0")).as("v0"))
    val dot = aggregate(zip_with(col("x"), col("v0"), (a, b) => a * b), lit(0.0), (s, e) => s + e)
    val y = x.crossJoin(broadcast(v0)).select(col("x"), dot.as("y"))
    val comps = y
      .select(posexplode(col("x")).as(Seq("j", "xj")), col("y"))
      .groupBy("j")
      .agg(sum((col("xj") * col("y")).cast("decimal(28,12)"))
        .cast("decimal(38,12)").cast("double").as("vj"))
    comps
      .agg(sort_array(collect_list(struct(col("j"), col("vj")))).as("jv"))
      .select(transform(col("jv"), e => e.getField("vj")).as("v1"))
      .withColumn("norm",
        sqrt(aggregate(col("v1"), lit(0.0), (s, e) => s + e * e)))
      .select(
        size(col("v1")).cast("long").as("dim"),
        col("norm").as("lambda_est"),
        (element_at(col("v1"), 1) / col("norm")).as("c0"),
        (element_at(col("v1"), 2) / col("norm")).as("c1"),
        (element_at(col("v1"), 3) / col("norm")).as("c2"),
        (element_at(col("v1"), 4) / col("norm")).as("c3"))
  }
}
