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

  test("fleissKappa: the Fleiss 1971 agreement algebra on a hand table; varying n fails loudly") {
    import graft.operators.StatsOps
    // 4 items × 3 raters, 2 categories. n_ij rows: item1 (3,0),
    // item2 (2,1), item3 (1,2), item4 (3,0).
    val ratings = Seq(
      (1, 1, "a"), (1, 2, "a"), (1, 3, "a"),
      (2, 1, "a"), (2, 2, "a"), (2, 3, "b"),
      (3, 1, "a"), (3, 2, "b"), (3, 3, "b"),
      (4, 1, "a"), (4, 2, "a"), (4, 3, "a")).toDF("item", "rater", "lab")
    val r = StatsOps.fleissKappa(ratings, "item", "rater", "lab").collect()(0)
    // sum nij² = 9 + (4+1) + (1+4) + 9 = 28; Po = (28−12)/(12·2) = 2/3
    // tots: a=9, b=3 → sum_tot_sq = 90; Pe = 90/144 = 0.625
    // kappa = (2/3 − 0.625)/(1 − 0.625) = 1/9
    assert(r.getAs[Long]("n_items") == 4 && r.getAs[Long]("n_raters") == 3)
    assert(r.getAs[Long]("sum_nij_sq") == 28 && r.getAs[Long]("sum_cat_tot_sq") == 90)
    assert(math.abs(r.getAs[Double]("po") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("pe") - 0.625) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - 1.0 / 9.0) < 1e-12)
    // a 4th rating on one item breaks the fixed-n contract LOUDLY
    val uneven = ratings.unionByName(Seq((1, 4, "b")).toDF("item", "rater", "lab"))
    val ex = intercept[Exception] {
      StatsOps.fleissKappa(uneven, "item", "rater", "lab").collect()
    }
    assert(ex.getMessage.contains("fixed n"), ex.getMessage)
  }

  test("degreeAssortativity: hand-checked P4 path graph gives r = -0.5") {
    import graft.operators.GraphOps
    // path 1-2-3-4: degrees (1,2,2,1); 2m=6 samples → r = (6·16−100)/(6·18−100) = −0.5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 1L) /* dup orientation collapses */)
      .toDF("a", "b")
    val r = GraphOps.degreeAssortativity(edges, "a", "b").collect()(0)
    assert(r.getAs[Long]("n_edges") == 3)
    assert(math.abs(r.getAs[Double]("assortativity") + 0.5) < 1e-12)
  }

  test("DGIM closed form equals the sequential cascade simulation for n = 1..512") {
    // the identity events_dgim rides: after n ones, the cascade-merge
    // bucket sizes are n's digits in the redundant base-2 system with
    // digits ∈ {1,2}, and r_i = (n+1)/2^i − 1 yields d_i = 2 − r_i%2
    // with the digit's newest-member position n − r_i·2^i + (t−1)·2^i + 1
    def closedForm(n: Long): Seq[(Long, Long)] = // (size, newestPos) newest-first
      (0 until 40).flatMap { i =>
        val p2 = 1L << i
        val r = (n + 1) / p2 - 1
        if (r < 1) Seq.empty
        else (1 to (2 - (r % 2).toInt)).map(t => (p2, n - r * p2 + (t - 1) * p2 + 1))
      }
    def simulate(n: Long): Seq[(Long, Long)] = {
      // buckets newest-first as (size, newestPos); merging combines the
      // two OLDEST of a size into one of 2·size keeping the NEWER's
      // newest position (the DGIM merge rule)
      var bk = Vector.empty[(Long, Long)]
      for (pos <- 1L to n) {
        // new one arrives: existing buckets age by one position
        bk = (1L, 1L) +: bk.map { case (sz, np) => (sz, np + 1) }
        var sz = 1L
        var done = false
        while (!done) {
          val idx = bk.zipWithIndex.filter(_._1._1 == sz).map(_._2)
          if (idx.length >= 3) {
            val (a, b) = (idx(idx.length - 2), idx(idx.length - 1)) // two oldest
            val merged = (sz * 2, bk(a)._2) // newer of the two = a
            bk = (bk.take(a) :+ merged) ++ bk.drop(b + 1)
            sz *= 2
          } else done = true
        }
      }
      bk.map { case (s2, np) => (s2, np) }
    }
    for (n <- 1L to 512L) {
      val cf = closedForm(n).sortBy(_._2)
      val sim = simulate(n).sortBy(_._2)
      assert(cf == sim, s"n=$n closed=$cf sim=$sim")
      assert(cf.map(_._1).sum == n, s"sizes must sum to n=$n")
    }
  }

  test("fdrBhRandomization: exact rational p-values and a downward-closed BH rejection set") {
    import graft.operators.StatsOps
    // two groups: 'signal' has a huge arm gap only if md5 splits happen
    // to separate values — we assert the INVARIANTS, not a verdict:
    // p = (n_ge+1)/65 ∈ [1/65, 1], ranks are a permutation, and the
    // rejection set is downward-closed in rank (step-up contract)
    val units = (1 to 40).map(i => ("g1", i.toLong, i.toLong * 100))
      .union((1 to 40).map(i => ("g2", 1000L + i, 50L)))
      .toDF("g", "unit", "v")
    val out = StatsOps.fdrBhRandomization(units, "g", "unit", "v", "sp:", k = 64)
      .collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getAs[Long]("p_den") == 65L))
    assert(out.forall { r =>
      val n = r.getAs[Long]("p_num"); n >= 1L && n <= 65L })
    assert(out.map(_.getAs[Long]("bh_rank")).sorted.toSeq == Seq(1L, 2L))
    val byRank = out.sortBy(_.getAs[Long]("bh_rank"))
    if (byRank(1).getAs[Boolean]("rejected"))
      assert(byRank(0).getAs[Boolean]("rejected"), "step-up must be downward-closed")
  }
}
