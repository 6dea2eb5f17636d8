package graft

import graft.plans.RangeJoinBucketing
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](widthConf: Option[Long])(body: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(RangeJoinBucketing))
      spark.experimental.extraOptimizations ++= Seq(RangeJoinBucketing)
    widthConf.foreach(w => spark.conf.set(RangeJoinBucketing.WidthConf, w.toString))
    try body
    finally spark.conf.unset(RangeJoinBucketing.WidthConf)
  }

  // points spread over [-250, 250); intervals cover boundary cases:
  // same-bucket, bucket-straddling, much wider than W, empty, negative
  private lazy val points = (0L until 1000L).map(i => (i, i * 7 % 500 - 250)).toDF("pid", "p")
  private lazy val intervals = Seq(
    (0L, 10L, 30L), (1L, 25L, 26L), (2L, -40L, 5L), (3L, 100L, 100L),
    (4L, -250L, 250L), (5L, 246L, 260L)).toDF("iid", "s", "e")

  private val q = "SELECT pid, iid FROM rj_pts JOIN rj_ivs ON p >= s AND p < e"

  test("bucketized range join matches the naive result exactly") {
    points.createOrReplaceTempView("rj_pts")
    intervals.createOrReplaceTempView("rj_ivs")
    val naive = spark.sql(q).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    val got = withRule(Some(32L)) {
      val df = spark.sql(q)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Generate"), s"expected bucket explode in:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"range join must not be a nested-loop join:\n$plan")
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == naive)
  }

  test("rule is a no-op without the width conf and on non-range joins") {
    points.createOrReplaceTempView("rj_pts")
    intervals.createOrReplaceTempView("rj_ivs")
    withRule(None) {
      spark.conf.unset(RangeJoinBucketing.WidthConf)
      val plan = spark.sql(q).queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"), "no conf → untouched plan")
    }
    withRule(Some(32L)) {
      // equi joins keep their shape (no spurious Generate)
      val eq = points.as("a").join(points.as("b"), col("a.pid") === col("b.pid"))
      assert(!eq.queryExecution.executedPlan.toString.contains("Generate"))
    }
  }

  test("guard: the already-bucketized manual rangeJoin is not re-rewritten") {
    import graft.operators.JoinOps
    val points = Seq(("a", 5L), ("a", 15L)).toDF("k", "p")
    val ivs = Seq(("a", 0L, 10L, "i1"), ("a", 10L, 20L, "i2")).toDF("k", "s", "e", "tag")
    withRule(Some(10L)) {
      val df = JoinOps.rangeJoin(points, ivs, Seq("k"), "p", "s", "e", bucketWidth = 10L)
      val out = df.select("p", "tag").orderBy("p")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(out == Seq((5L, "i1"), (15L, "i2")))
      // exactly ONE Generate (the manual bucket explode): the rule's
      // __graft_ guard must not stack a second bucketization on top
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.split("Generate").length - 1 == 1, s"double bucketization:\n$plan")
    }
  }

  test("extra equi conjuncts survive and narrow the bucket join") {
    val pts = Seq((1L, "k1", 15L), (2L, "k2", 15L)).toDF("pid", "key", "p")
    val ivs = Seq((10L, "k1", 10L, 20L)).toDF("iid", "key", "s", "e")
    pts.createOrReplaceTempView("rj_pts2")
    ivs.createOrReplaceTempView("rj_ivs2")
    val out = withRule(Some(16L)) {
      spark.sql("SELECT pid, iid FROM rj_pts2 JOIN rj_ivs2 ON rj_pts2.key = rj_ivs2.key AND p >= s AND p < e")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(out == Set((1L, 10L)))
  }
}
