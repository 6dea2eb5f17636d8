package graft

import graft.operators.RankOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The banded global-rank core must be EXACTLY the single-partition
  * Window.orderBy it replaces — rank, running pre-sums, and the
  * closed-form ntile — across skewed/tied/adversarial inputs and
  * independent of input partitioning.
  */
class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  // skewed with heavy ties: many rows share v (the tf=1 vocab class),
  // ids are unique, weights vary
  private lazy val rows = {
    val r = new scala.util.Random(7)
    (1 to 997).map { id =>
      val v = if (r.nextInt(10) < 6) 1L else 1L + r.nextInt(50)
      (id.toLong, v, 1L + r.nextInt(1000))
    }
  }

  test("bandedRankCum reproduces the single-partition window exactly") {
    val df = rows.toDF("id", "v", "w").repartition(7)
    val banded = RankOps
      .bandedRankCum(
        df.withColumn("sub", RankOps.idiv(col("id"), 64)),
        bandCols = Seq("v", "sub"),
        bandSort = Seq(col("v").desc, col("sub").asc),
        rowSort = Seq(col("id").asc),
        cumCols = Seq("w"))
      .select(col("id"), col("rank"), col("cum_before_w"))
    val w = Window.orderBy(col("v").desc, col("id").asc)
    val expected = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_before_w",
        coalesce(sum("w").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), col("rank"), col("cum_before_w"))
    assert(banded.except(expected).isEmpty && expected.except(banded).isEmpty)
  }

  test("near-unique numeric banding (value div 2^k) matches too") {
    val df = rows.map { case (id, v, w) => (id, v * 977 + id % 13, w) }
      .toDF("id", "v", "w").repartition(5)
    val banded = RankOps
      .bandedRankCum(
        df.withColumn("vb", RankOps.idiv(col("v"), 1L << 10)),
        bandCols = Seq("vb"),
        bandSort = Seq(col("vb").asc),
        rowSort = Seq(col("v").asc, col("id").asc),
        cumCols = Seq("w"))
      .select(col("id"), col("rank"), col("cum_before_w"))
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val expected = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_before_w",
        coalesce(sum("w").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), col("rank"), col("cum_before_w"))
    assert(banded.except(expected).isEmpty && expected.except(banded).isEmpty)
  }

  test("broadcast gate off (broadcastMaxBands=0) produces identical results") {
    // round-8 verdict item 4: the forced broadcast hint is gated on
    // spark.graft.bandedRank.broadcastMaxBands — the fallback plain
    // join must be result-identical (AQE may still broadcast at
    // runtime; only the FORCED hint is dropped)
    val df = rows.toDF("id", "v", "w").repartition(7)
      .withColumn("sub", RankOps.idiv(col("id"), 64))
    def run(): org.apache.spark.sql.DataFrame = RankOps
      .bandedRankCum(df, bandCols = Seq("v", "sub"),
        bandSort = Seq(col("v").desc, col("sub").asc),
        rowSort = Seq(col("id").asc), cumCols = Seq("w"))
      .select(col("id"), col("rank"), col("cum_before_w"))
    def runGrouped(): org.apache.spark.sql.DataFrame = RankOps
      .groupedBandedRank(df, groupCols = Seq("v"), bandCols = Seq("sub"),
        bandSort = Seq(col("sub").asc), rowSort = Seq(col("id").asc),
        rankName = "rk")
      .select(col("id"), col("rk"))
    val (hinted, hintedG) = (run(), runGrouped())
    spark.conf.set("spark.graft.bandedRank.broadcastMaxBands", "0")
    try {
      val (plain, plainG) = (run(), runGrouped())
      assert(plain.except(hinted).isEmpty && hinted.except(plain).isEmpty)
      assert(plainG.except(hintedG).isEmpty && hintedG.except(plainG).isEmpty)
      // and the gate really did drop the hint from the logical plan
      def hasHint(q: org.apache.spark.sql.DataFrame): Boolean =
        q.queryExecution.analyzed.collectFirst {
          case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
        }.nonEmpty
      assert(hasHint(hinted) && !hasHint(plain))
    } finally spark.conf.unset("spark.graft.bandedRank.broadcastMaxBands")
  }

  test("ntileFromRank ≡ Spark ntile for every n in 1..40, k in 1..7") {
    for (k <- 1 to 7) {
      val n = 40
      val df = (1 to n).map(i => (i.toLong, i.toLong)).toDF("id", "ord")
      val expected = df
        .withColumn("t", ntile(k).over(Window.orderBy("ord")))
        .withColumn("n_all", count(lit(1)).over(
          Window.orderBy("ord").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // check at every prefix size n' by filtering: tile of rank i among
      // first n' rows must equal the closed form at (i, n')
      val got = (1 to n).flatMap { nPrime =>
        df.filter(col("id") <= nPrime)
          .withColumn("i", row_number().over(Window.orderBy("ord")).cast("long"))
          .withColumn("t_spark", ntile(k).over(Window.orderBy("ord")))
          .withColumn("t_closed", RankOps.ntileFromRank(col("i"), lit(nPrime.toLong), k))
          .filter(col("t_spark") =!= col("t_closed"))
          .collect()
      }
      assert(got.isEmpty, s"k=$k mismatches: ${got.take(3).mkString(";")}")
    }
  }
}
