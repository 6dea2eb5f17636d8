package graft

import graft.operators.{ClusterOps, CorpusOps}
import org.apache.spark.sql.functions._

/** Round-6 batch 3: relational k-means step, cluster-size stats,
  * leakage-safe grouped split, BPE pair mining, plus the SparkEntry-side
  * hopping-window / debounce / co-occurrence semantics on tiny frames.
  */
class Round6cOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("kmeansStep: assignment to nearest init centroid, decimal-exact means") {
    // k=2 → init centroids = vecs 1 (0,0) and 2 (10,10).
    // (0,1) and (1,0) join cluster 1; (9,10) joins cluster 2.
    val d = vecs(
      (1L, Seq(0.0, 0.0)), (2L, Seq(10.0, 10.0)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(1.0, 0.0)), (5L, Seq(9.0, 10.0)))
    val got = ClusterOps.kmeansStep(d, "vec_id", "embedding", k = 2)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, (0.0 + 0.0 + 1.0) / 3, (0.0 + 1.0 + 0.0) / 3),
      (2L, 2L, (10.0 + 9.0) / 2, (10.0 + 10.0) / 2)))
  }

  test("kmeansStep: equidistant point breaks tie to the smaller centroid id") {
    val d = vecs((1L, Seq(0.0)), (2L, Seq(2.0)), (3L, Seq(1.0)))
    val got = ClusterOps.kmeansStep(d, "vec_id", "embedding", k = 2)
      .select("cluster_id", "n_members").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 1L))) // vec 3 (dist 1 to both) → cid 1
  }

  test("kmeansStep plan: corpus is never shuffled for assignment (single Exchange for the k-row update)") {
    val d = vecs((1L, Seq(0.0, 0.0)), (2L, Seq(5.0, 5.0)), (3L, Seq(1.0, 1.0)))
    val plan = ClusterOps.kmeansStep(d, "vec_id", "embedding", k = 2)
      .queryExecution.executedPlan.toString
    // one shuffle for the final k-row groupBy (+ its orderBy); the
    // assignment itself must ride on BroadcastExchange
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }

  test("clusterSizeStats: histogram with singleton row from corpus total") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // components: {1,2,3} and {4,5} → sizes 3 and 2; doc 6 unclustered
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "cluster_id")
    val got = ClusterOps.clusterSizeStats(docs, comp)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("clusterSizeStats: fully-clustered corpus emits no singleton row") {
    val docs = Seq(1L, 2L).toDF("doc_id")
    val comp = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")
    val got = ClusterOps.clusterSizeStats(docs, comp).as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L)))
  }

  test("groupedSplit: cluster members share the representative's fold; loners represent themselves") {
    val docs = Seq(10L, 11L, 12L, 99L).toDF("doc_id")
    val comp = Seq((10L, 10L), (11L, 10L), (12L, 10L)).toDF("id", "cluster_id")
    val got = ClusterOps.groupedSplit(docs, "doc_id", comp)
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    val clusterSplits = got.filter(_._2 == 10L).map(_._3).distinct
    assert(clusterSplits.size == 1)            // no straddling
    assert(got.map(_._1) == Seq(10L, 11L, 12L, 99L))
    assert(got.find(_._1 == 99L).get._2 == 99L) // self-representative
    // fold matches SplitOps.assignSplit of the REP id, not the member id
    val expected = Seq(10L, 99L).toDF("k")
      .select(col("k"), graft.operators.SplitOps.assignSplit(col("k")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got.forall { case (_, rep, s) => expected(rep) == s })
  }

  test("bpePairCounts: frequency-weighted char pairs over the vocab, within-word repeats count") {
    val d = Seq((1, "aab aab ccc"), (2, "aab xy")).toDF("doc_id", "text")
    // vocab: aab tf=3, ccc tf=1, xy tf=1
    // aab → "a a"(3), "a b"(3); ccc → "c c" twice per word → 2·1=2; xy → "x y"(1)
    val got = CorpusOps.bpePairCounts(d, "text", topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a a", 3L, 1L), ("a b", 3L, 1L), ("c c", 2L, 1L), ("x y", 1L, 1L)))
  }

  test("bpePairCounts: 1-char tokens contribute no pairs (sequence guard)") {
    val d = Seq((1, "a b cd")).toDF("doc_id", "text")
    val got = CorpusOps.bpePairCounts(d, "text", topK = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("c d", 1L, 1L)))
  }

  test("hopping window semantics: each event lands in exactly width/slide windows") {
    // mirror the events_hopping shape on a controlled frame
    val e = Seq(
      (1L, 100L * 1000000000L), // 100s → windows starting at -300 .. 0 (600s width, 300s slide)
      (2L, 700L * 1000000000L)
    ).toDF("event_id", "ts")
    val got = e
      .groupBy(window(timestamp_micros(expr("ts div 1000")), "600 seconds", "300 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("s"), col("n"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((-300L, 1L), (0L, 1L), (300L, 1L), (600L, 1L)))
  }

  test("debounce semantics: first event kept, close follower dropped, distant follower kept") {
    import org.apache.spark.sql.expressions.Window
    val day = 86400L * 1000000000L
    val e = Seq(
      (1L, 0L, 7L, "click"), (2L, 1L * day, 7L, "click"), (3L, 4L * day, 7L, "click"),
      (4L, 0L, 8L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts").asc, col("event_id").asc)
    val kept = e.withColumn("us", expr("ts div 1000"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNull || col("us") - col("prev_us") > lit(172800000000L))
      .select("event_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 3L, 4L)) // 2 is 1 day after 1 → dropped; 3 is 3 days after 2 → kept
    // (a gap EXACTLY equal to the threshold is dropped — strict >)
  }

  test("co-occurrence pair expansion: unordered pairs once per user, no self-pairs") {
    val e = Seq((7L, "a"), (7L, "b"), (7L, "b"), (7L, "c"), (8L, "a"), (8L, "b"), (9L, "a"))
      .toDF("user_id", "event_type")
    val pairs = flatten(transform(col("t"), a =>
      filter(transform(col("t"), b => struct(a.as("type_a"), b.as("type_b"))),
        p => p.getField("type_a") < p.getField("type_b"))))
    val got = e.groupBy("user_id").agg(sort_array(collect_set("event_type")).as("t"))
      .select(explode(pairs).as("p"))
      .groupBy(col("p.type_a").as("a"), col("p.type_b").as("b"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(got == Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
  }
}
