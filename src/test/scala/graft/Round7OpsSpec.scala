package graft

import graft.operators.{BucketOps, ClusterOps, DedupOps, GraphOps, IntervalOps}
import org.apache.spark.sql.functions._

/** Round-7 levers: the shared (localCheckpointed) component frame feeding
  * the whole dedup-apply side, the appendBucketed bucket-spec contract,
  * and the adaptive events.ts reader surviving both physical layouts.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog today"),
    (3L, "an entirely different document about spark"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "yet another unrelated text body")
  ).toDF("doc_id", "text")

  test("materializeComponents: one precomputed frame feeds survivors, stats and split identically") {
    val docs = docsDF
    val pairs = DedupOps.minhashDupPairs(docs, "text", "doc_id", threshold = 0.7,
      shingleSize = 2, numBands = 32, rowsPerBand = 3)
    val comp = ClusterOps.materializeComponents(pairs)

    val inline = DedupOps.applyPairDedup(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    val shared = DedupOps.applyPairDedup(docs, "doc_id", pairs, components = Some(comp))
      .select("doc_id").as[Long].collect().toSet
    assert(shared == inline)

    val inlineQ = DedupOps.applyPairDedupPreferring(docs, "doc_id", pairs, score = length(col("text")))
      .select("doc_id").as[Long].collect().toSet
    val sharedQ = DedupOps.applyPairDedupPreferring(docs, "doc_id", pairs,
        score = length(col("text")), components = Some(comp))
      .select("doc_id").as[Long].collect().toSet
    assert(sharedQ == inlineQ)

    val statsShared = ClusterOps.clusterSizeStats(docs, comp).as[(Long, Long)].collect().toSeq
    val statsInline = ClusterOps.clusterSizeStats(docs,
      GraphOps.connectedComponents(pairs, "a_id", "b_id")).as[(Long, Long)].collect().toSeq
    assert(statsShared == statsInline)

    val splitShared = ClusterOps.groupedSplit(docs, "doc_id", comp)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val splitInline = ClusterOps.groupedSplit(docs, "doc_id",
        GraphOps.connectedComponents(pairs, "a_id", "b_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(splitShared == splitInline)
  }

  test("applyPairDedup: default (no components) plan is unchanged — still runs the CC path") {
    // the optional parameter must be plan-neutral when absent: same
    // result as before and no checkpoint node in the analyzed plan
    val docs = docsDF
    val pairs = DedupOps.minhashDupPairs(docs, "text", "doc_id", threshold = 0.7,
      shingleSize = 2, numBands = 32, rowsPerBand = 3)
    val kept = DedupOps.applyPairDedup(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    // 1,2,4 are near-dups → one survivor (min id 1); 3 and 5 survive
    assert(kept.contains(3L) && kept.contains(5L) && kept.contains(1L)
      && !kept.contains(4L))
  }

  test("appendBucketed: mismatched numBuckets is rejected, table layout intact") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    BucketOps.writeBucketed(base, "graft_r7_bspec", numBuckets = 4, keys = Seq("k"))
    try {
      val more = Seq((4L, "d")).toDF("k", "v")
      val e = intercept[IllegalArgumentException] {
        BucketOps.appendBucketed(more, "graft_r7_bspec", numBuckets = 8, keys = Seq("k"))
      }
      assert(e.getMessage.contains("bucket spec mismatch"))
      // mismatched key set is rejected too
      val e2 = intercept[IllegalArgumentException] {
        BucketOps.appendBucketed(more, "graft_r7_bspec", numBuckets = 4, keys = Seq("v"))
      }
      assert(e2.getMessage.contains("bucket spec mismatch"))
      // a MATCHING append still lands
      BucketOps.appendBucketed(more, "graft_r7_bspec", numBuckets = 4, keys = Seq("k"))
      assert(spark.table("graft_r7_bspec").count() == 4)
    } finally BucketOps.dropTable(spark, "graft_r7_bspec")
  }

  test("mergeIntervalsTyped matches mergeIntervals on overlap/touch/disjoint shapes") {
    implicit val s = spark
    val rows = Seq(
      IntervalOps.Interval(1L, 0L, 10L), IntervalOps.Interval(1L, 5L, 12L), // overlap
      IntervalOps.Interval(1L, 12L, 20L),                                   // touch-merge
      IntervalOps.Interval(1L, 30L, 40L),                                   // disjoint
      IntervalOps.Interval(2L, 100L, 110L))
    val typed = IntervalOps.mergeIntervalsTyped(rows.toDS()).collect().toSeq
      .sortBy(m => (m.k, m.island))
    val cols = IntervalOps.mergeIntervals(rows.toDF(), "k", "s", "e")
      .select(col("k"), col("island"), col("s"), col("e"), col("n"))
      .as[IntervalOps.MergedSpan].collect().toSeq.sortBy(m => (m.k, m.island))
    assert(typed == cols)
    assert(typed.map(m => (m.k, m.s, m.e, m.n)) ==
      Seq((1L, 0L, 20L, 3L), (1L, 30L, 40L, 1L), (2L, 100L, 110L, 1L)))
  }
}
