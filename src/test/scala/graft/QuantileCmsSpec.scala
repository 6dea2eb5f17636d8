package graft

import graft.functions.{CmsKernel, QDigestKernel}
import graft.functions.CountMinSketch._
import graft.functions.QuantileSketch._
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Q-digest and count-min mergeable-aggregate contracts, pinned on
  * adversarial distributions (heavy point masses, zipf keys, skewed
  * partitioning) the driver's uniform-ish events table can't exercise.
  */
class QuantileCmsSpec extends SparkSpec {
  import spark.implicits._

  private val W = 16
  private val K = 128

  /** exact rank band check: count(≤est) ≥ qn−εn and count(<est) ≤ qn+εn */
  private def checkQuantile(sorted: IndexedSeq[Long], est: Long, q: Double, eps: Double): Unit = {
    val n = sorted.size
    val le = sorted.count(_ <= est)
    val lt = sorted.count(_ < est)
    assert(le >= q * n - eps * n, s"q=$q est=$est: count(<=est)=$le below ${q * n - eps * n}")
    assert(lt <= q * n + eps * n, s"q=$q est=$est: count(<est)=$lt above ${q * n + eps * n}")
  }

  test("qdigest: rank error <= W/k on a lumpy distribution, across 8 partitions") {
    // 60% point mass at 1000, a uniform tail, and a far outlier cluster
    val vals = Seq.fill(6000)(1000L) ++ (0 until 3000).map(i => (i * 17L) % 50000) ++
      Seq.fill(1000)(60000L)
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle(vals)
    val est = data.toDF("v").repartition(8)
      .agg(qdigest(col("v"), W, K).as("sk"))
      .select(
        qdigestQuantile(col("sk"), 0.1, W).as("e10"),
        qdigestQuantile(col("sk"), 0.5, W).as("e50"),
        qdigestQuantile(col("sk"), 0.99, W).as("e99"))
      .as[(Long, Long, Long)].head()
    val sorted = data.sorted.toIndexedSeq
    val eps = W.toDouble / K
    checkQuantile(sorted, est._1, 0.1, eps)
    checkQuantile(sorted, est._2, 0.5, eps)
    checkQuantile(sorted, est._3, 0.99, eps)
  }

  test("qdigest merge tree preserves the bound and determinism") {
    // three disjoint slices sketched separately, merged via qdigestMerge —
    // the PODS'12 claim: error still <= W/k after the merge
    val a = (0 until 4000).map(i => (i % 97L) * 3)
    val b = (0 until 4000).map(i => 30000L + (i % 41L))
    val c = Seq.fill(2000)(5L)
    val df = (a.map(("a", _)) ++ b.map(("b", _)) ++ c.map(("c", _))).toDF("slice", "v")
    val perSlice = df.repartition(8).groupBy("slice").agg(qdigest(col("v"), W, K).as("sk"))
    def estOnce() = perSlice.agg(qdigestMerge(col("sk"), W, K).as("sk"))
      .select(qdigestQuantile(col("sk"), 0.5, W), qdigestQuantile(col("sk"), 0.9, W))
      .as[(Long, Long)].head()
    val (e50, e90) = estOnce()
    assert(estOnce() == ((e50, e90)), "merged sketch must be replay-deterministic")
    val sorted = (a ++ b ++ c).sorted.toIndexedSeq
    val eps = W.toDouble / K
    checkQuantile(sorted, e50, 0.5, eps)
    checkQuantile(sorted, e90, 0.9, eps)
  }

  test("qdigest kernel: compressed size stays <= 3k") {
    val buf = mutable.HashMap.empty[Long, Long]
    (0 until 50000).foreach { i =>
      val leaf = QDigestKernel.leaf((i * 2654435761L) % 65536, W)
      buf(leaf) = buf.getOrElse(leaf, 0L) + 1
    }
    QDigestKernel.compress(buf, W, K)
    assert(buf.size <= 3 * K, s"q-digest size ${buf.size} exceeds 3k=${3 * K}")
  }

  test("cms: est >= true always, est == true for isolated keys, zipf stream") {
    val D = 4; val Wd = 512
    val rows = (0 until 300).flatMap(j => Seq.fill(9000 / (j + 1))(j.toLong))
    val rnd = new scala.util.Random(3)
    val data = rnd.shuffle(rows)
    val truth = data.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val probes = truth.keys.toSeq.sorted
    val sk = data.toDF("k").repartition(8)
      .agg(cms(col("k"), D, Wd).as("sk"))
    val ests = sk.select(probes.map(p => cmsEstimate(col("sk"), lit(p), D, Wd).as(s"p$p")): _*)
      .head()
    probes.zipWithIndex.foreach { case (p, i) =>
      val est = ests.getLong(i)
      assert(est >= truth(p), s"key $p: est $est below true ${truth(p)} — CMS can never undercount")
      assert(est <= truth(p) + 3L * data.size / Wd,
        s"key $p: est $est above true+3n/w=${truth(p) + 3L * data.size / Wd}")
    }
  }

  test("cms merge is element-wise exact: merged sketch == whole-data sketch") {
    val D = 2; val Wd = 64
    val xs = (0 until 500).map(i => (i % 37).toLong)
    val (l, r) = xs.splitAt(250)
    def sketch(v: Seq[Long]) = v.toDF("k").agg(cms(col("k"), D, Wd)).as[Seq[Long]].head()
    val merged = sketch(l).zip(sketch(r)).map { case (x, y) => x + y }
    assert(merged == sketch(xs), "CMS must merge by pure vector addition")
    // kernel probe agrees with the expression path
    val est = CmsKernel.estimate(merged.toArray, 5L, D, Wd)
    assert(est >= xs.count(_ == 5L))
  }
}
