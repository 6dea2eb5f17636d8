package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 additions: the DECIMAL-output tripwire and this round's
  * new operators. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  test("Verify decimal tripwire: DecimalType leaves are found at any nesting") {
    // a deliberately-decimal result schema must trip (round-11 verdict
    // item 2: the driver's canonical hash diverges on DECIMAL — rounds
    // 1 and 11 both burned on it while the local value-compare passed)
    val df = Seq((1, BigDecimal(1.5))).toDF("id", "amt")
      .select(col("id"), col("amt").cast(DecimalType(18, 2)).as("amt"),
        struct(col("amt").cast(DecimalType(12, 2)).as("inner")).as("s"),
        array(col("amt").cast(DecimalType(10, 1))).as("arr"))
    val hits = df.schema.fields.toSeq.flatMap(f => Verify.decimalCols(f.dataType, f.name))
    assert(hits == Seq("amt", "s.inner", "arr[]"), hits.toString)
    // and a clean DOUBLE/BIGINT schema must not
    val ok = Seq((1L, 1.5)).toDF("id", "v")
      .select(col("id"), col("v"), struct(col("v").as("x")).as("s"))
    assert(ok.schema.fields.toSeq.flatMap(f => Verify.decimalCols(f.dataType, f.name)).isEmpty)
  }

  test("IVF-PQ drift monitor arms the rebuild escape hatch; rebuild retrains the codebook") {
    import graft.operators.{BucketOps, VectorIndexOps}
    val pfx = "graft_r12_pqdrift"
    Seq("_cells", "_centroids", "_codebook").foreach(s => BucketOps.dropTable(spark, s"$pfx$s"))
    // base: two tight 8-dim clusters around e1 and e5 (small residuals)
    def v(axis: Int, wob: Int): Seq[Double] =
      (0 until 8).map(i => (if (i == axis) 1.0 else 0.0) + (if (i == (axis + wob) % 8) 0.08 * wob else 0.0))
    val base = (0 until 8).map(i => (i.toLong, v(if (i % 2 == 0) 1 else 5, i % 4))).toDF("id", "vec")
    val idx = VectorIndexOps.buildIvfPqIndex(base, "id", "vec", pfx,
      nCells = 2, numBuckets = 2, subspaces = 4, codes = 4, iters = 4)
    // delta: a DIFFERENT pair of directions (e3 / e7) — residuals the
    // frozen codebook never saw, so qerr must rise vs base
    val delta = (0 until 8).map(i => (100L + i, v(if (i % 2 == 0) 3 else 7, i % 4))).toDF("id", "vec")
    val tagged = base.withColumn("side", lit("base"))
      .unionByName(delta.withColumn("side", lit("delta")))
    val cells = VectorIndexOps.ivfPqDriftCells(tagged, "side", "id", "vec", idx)
    assert(cells.count() == 16)
    val rep = VectorIndexOps.ivfPqDriftReport(cells).collect()(0)
    assert(rep.getAs[Long]("n_base") == 8 && rep.getAs[Long]("n_delta") == 8)
    assert(rep.getAs[Double]("qerr_ratio") > 1.5,
      s"unseen-direction delta must inflate quantization error: $rep")
    assert(rep.getAs[Boolean]("rebuild"), s"monitor must fire: $rep")
    // fold the delta in and REBUILD: centroids + codebook retrain on the
    // persisted vectors, so the delta's residuals are now in-model and
    // the same monitor no longer fires on the qerr signal
    VectorIndexOps.appendToIvfPqIndex(delta, "id", "vec", idx, numBuckets = 2)
    val idx2 = VectorIndexOps.rebuildIvfPqIndex(spark, idx, nCells = 2, numBuckets = 2)
    val cells2 = VectorIndexOps.ivfPqDriftCells(tagged, "side", "id", "vec", idx2)
    val rep2 = VectorIndexOps.ivfPqDriftReport(cells2).collect()(0)
    assert(rep2.getAs[Double]("delta_mean_qerr") < rep.getAs[Double]("delta_mean_qerr"),
      s"rebuild must cut the delta quantization error: before=$rep after=$rep2")
    assert(rep2.getAs[Double]("qerr_ratio") <= 1.5,
      s"qerr signal must clear after retrain: $rep2")
    Seq("_cells", "_centroids", "_codebook").foreach(s => BucketOps.dropTable(spark, s"$pfx$s"))
  }
}
