package graft

import graft.operators.{ResampleOps, StatsOps}
import org.apache.spark.sql.functions._

class StatsResampleSpec extends SparkSpec {
  import spark.implicits._

  test("exactStats matches the closed-form reference bit-for-bit") {
    val rows = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.5), ("a", 3.0, 5.5), ("a", 4.0, 9.0),
      ("b", 10.0, 1.0), ("b", 20.0, 2.0), ("b", 30.0, 3.0))
    val got = StatsOps.exactStats(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .orderBy("g").as[(String, Long, Double, Double, Double)].collect().toSeq
    def ref(xs: Seq[(Double, Double)]): (Long, Double, Double, Double) = {
      val n = xs.size.toDouble
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum; val syy = xs.map(p => p._2 * p._2).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      (xs.size.toLong, sx / n,
        math.sqrt((sxx - sx * sx / n) / (n - 1d)),
        (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    }
    val byG = rows.groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))).toMap
    for ((g, n, mx, sd, c) <- got) {
      val (rn, rmx, rsd, rc) = ref(byG(g))
      assert(n == rn && mx == rmx && sd == rsd && c == rc, s"group $g")
    }
    // corr of a perfectly linear group is exactly ±1 up to fp — sanity
    assert(math.abs(got.find(_._1 == "b").get._5 - 1.0) < 1e-12)
  }

  test("exactStats is complete-case on nullable inputs: n counts non-null pairs") {
    val rows = Seq(
      ("a", Some(1.0), Some(2.0)), ("a", Some(3.0), Some(4.0)),
      ("a", None, Some(9.0)), ("a", Some(9.0), None)) // half-null rows excluded entirely
    val got = StatsOps.exactStats(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .as[(String, Long, Double, Double, Double)].head()
    assert(got._2 == 2L, "n must count complete pairs only")
    assert(got._3 == 2.0, "mean over complete pairs (1+3)/2")
  }

  test("resampleFfill drops a key whose bucket span exceeds the cap (mirrored in the oracle)") {
    val df = Seq((1L, 10L, 1.0), (1L, 12L, 2.0), (2L, 0L, 1.0), (2L, 500L, 2.0))
      .toDF("k", "b", "v")
    val got = ResampleOps.resampleFfill(df, "k", col("b"), Seq("sv" -> sum("v")),
        maxBucketsPerKey = 100L)
      .select("k").distinct().as[Long].collect().toSet
    assert(got == Set(1L), "key 2 spans 501 buckets > cap 100 and must be dropped, not truncated")
  }

  test("resampleFfill densifies the grid, forward-fills, flags gaps") {
    val df = Seq((1L, 10L, 5.0), (1L, 10L, 3.0), (1L, 13L, 7.0), (2L, 100L, 1.0))
      .toDF("k", "b", "v")
    val got = ResampleOps.resampleFfill(df, "k", col("b"), Seq("sv" -> sum("v")))
      .select("k", "bucket", "n", "sv", "gap").orderBy("k", "bucket")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, 2L, 8.0, false),
      (1L, 11L, 0L, 8.0, true),   // gap rows carry the last seen aggregate
      (1L, 12L, 0L, 8.0, true),
      (1L, 13L, 1L, 7.0, false),
      (2L, 100L, 1L, 1.0, false)))
  }
}
