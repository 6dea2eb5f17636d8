package graft

import graft.operators.{BucketOps, CorpusOps, DriftOps, MaintOps, StatsOps}
import org.apache.spark.sql.functions._

/** Round-6 batch 2: corpus drift/overlap, linear-model scoring, n-gram
  * mining, hybrid-retrieval fusion, incremental aggregate maintenance,
  * robust spread (MAD).
  */
class Round6bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Int, String, String)*) =
    rows.toSeq.toDF("doc_id", "lang", "text")

  test("tokenDrift: exact cross-multiplied deltas, zero-fill, direction") {
    // ref slice: "alpha alpha beta" (tot 3); cur slice: "beta beta gamma" (tot 3)
    // alpha: |2*3-0*3|=6 down; beta: |1*3-2*3|=3 up; gamma: |0*3-1*3|=3 up
    val d = docs((1, "en", "alpha alpha beta"), (2, "de", "beta beta gamma"))
    val got = DriftOps.tokenDrift(d, "text", "lang", "en", "de", topK = 10)
      .select("token", "tf_ref", "tf_cur", "delta_scaled", "direction")
      .as[(String, Long, Long, java.math.BigDecimal, String)].collect().toSeq
      .map { case (t, a, b, ds, dir) => (t, a, b, ds.longValueExact(), dir) }
    assert(got == Seq(
      ("alpha", 2L, 0L, 6L, "down"),
      ("beta", 1L, 2L, 3L, "up"),
      ("gamma", 0L, 1L, 3L, "up")))
  }

  test("corpusSignatures are mergeable: sig(A∪B) == elementwise min") {
    val a = docs((1, "a", "red green blue"), (2, "a", "cyan red"))
    val b = docs((3, "b", "green yellow"), (4, "b", "magenta"))
    val union = a.union(b).withColumn("lang", lit("u"))
    val k = 16
    val sigA = DriftOps.corpusSignatures(a, "text", "lang", k)
    val sigB = DriftOps.corpusSignatures(b, "text", "lang", k)
    val merged = sigA.select("seed", "min_h").union(sigB.select("seed", "min_h"))
      .groupBy("seed").agg(min("min_h").as("min_h"))
      .as[(Int, Long)].collect().toMap
    val direct = DriftOps.corpusSignatures(union, "text", "lang", k)
      .select("seed", "min_h").as[(Int, Long)].collect().toMap
    assert(merged == direct && direct.size == k)
  }

  test("overlapEstimates: identical slices exact=est=1, disjoint slices exact=0") {
    val d = docs(
      (1, "x", "one two three"), (2, "y", "one two three"),
      (3, "z", "four five six"))
    val got = DriftOps.overlapEstimates(d, "text", "lang", k = 32, bound = 0.5)
      .select("slice_a", "slice_b", "est_jaccard", "exact_jaccard", "ok")
      .as[(String, String, Double, Double, Boolean)].collect().toSeq.sortBy(r => (r._1, r._2))
    val xy = got.find(r => r._1 == "x" && r._2 == "y").get
    assert(xy._3 == 1.0 && xy._4 == 1.0 && xy._5)
    val xz = got.find(r => r._1 == "x" && r._2 == "z").get
    assert(xz._4 == 0.0 && xz._5)
    assert(got.size == 3)
  }

  test("linearModelScore: weights bounded, verdict = sign, layout-independent, ≤2 shuffles") {
    val d = docs((1, "en", "alpha beta gamma alpha"), (2, "en", "delta epsilon"), (3, "en", ""))
    val out = CorpusOps.linearModelScore(d, "doc_id", "text", dim = 8)
    val rows = out.as[(Int, Long, Boolean)].collect().toSeq.sortBy(_._1)
    // empty doc has no features → absent (the oracle twin agrees)
    assert(rows.map(_._1) == Seq(1, 2))
    assert(rows.forall { case (_, s, kept) => kept == (s > 0) })
    // score bound: |score| ≤ Σtf · 1000
    assert(rows.forall { case (_, s, _) => math.abs(s) <= 4000 })
    val re = CorpusOps.linearModelScore(d.repartition(7), "doc_id", "text", dim = 8)
      .as[(Int, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(re == rows, "scores must be partitioning-independent (exact integer arithmetic)")
    assert(BucketOps.countExchanges(out) <= 2)
  }

  test("rankFromScore == row_number(score desc, id asc) without a global window") {
    val d = Seq((10, 5.0), (11, 7.0), (12, 5.0), (13, 1.0)).toDF("id", "s")
    val got = CorpusOps.rankFromScore(d, "id", "s").as[(Int, Int)].collect().toMap
    assert(got == Map(11 -> 1, 10 -> 2, 12 -> 3, 13 -> 4))
  }

  test("rrfFuse: hand-checked fusion of two lists, decimal-stable") {
    val l1 = Seq((1, 1), (2, 2)).toDF("id", "rank")
    val l2 = Seq((2, 1), (3, 2)).toDF("id", "rank")
    val got = CorpusOps.rrfFuse(Seq(l1, l2), "id", "rank", k = 10, c = 60)
      .as[(Int, Long, Double)].collect().toSeq
    // id 2: 1/62 + 1/61 = 0.016129 + 0.016393; id 1: 1/61; id 3: 1/62
    assert(got.map(_._1) == Seq(2, 1, 3))
    assert(got.head._2 == 2L && math.abs(got.head._3 - 0.032522) < 1e-9)
  }

  test("mergeState == full recompute; fold order irrelevant; one-sided keys survive") {
    val ev = Seq(
      (1, 0, 2.5), (1, 0, -1.0), (1, 1, 4.0),
      (2, 0, 7.0), (3, 1, 0.0), (4, 2, -3.25)
    ).toDF("user_id", "day", "value")
    val keys = Seq("user_id")
    def st(dayFilter: org.apache.spark.sql.Column) =
      MaintOps.aggState(ev.filter(dayFilter), keys, "value")
    val full = MaintOps.aggState(ev, keys, "value")
      .orderBy("user_id").collect().toSeq
    val fold01 = MaintOps.mergeState(
      MaintOps.mergeState(st(col("day") === 0), st(col("day") === 1), keys),
      st(col("day") === 2), keys).orderBy("user_id").collect().toSeq
    val fold21 = MaintOps.mergeState(
      MaintOps.mergeState(st(col("day") === 2), st(col("day") === 1), keys),
      st(col("day") === 0), keys).orderBy("user_id").collect().toSeq
    assert(fold01 == full, "state fold must equal full recompute")
    assert(fold21 == full, "fold order must not matter (mergeable components)")
    val derived = MaintOps.withDerived(MaintOps.aggState(ev, keys, "value"))
    assert(derived.columns.contains("avg_v"))
  }

  test("madByKey: hand-checked medians and deviations") {
    // key a: values 1,2,3,100 → med 2.5; |dev| = 1.5,0.5,0.5,97.5 → mad 1.0
    // key b: values 5 → med 5, mad 0
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0), ("b", 5.0))
      .toDF("k", "v")
    val a = StatsOps.madByKey(d, "k", "v").orderBy("k").collect()
    assert(a(0).getString(0) == "a" && a(0).getDouble(1) == 2.5 && a(0).getDouble(2) == 1.0)
    assert(a(1).getString(0) == "b" && a(1).getDouble(1) == 5.0 && a(1).getDouble(2) == 0.0)
  }

  test("ngramTopK: occurrences vs df, tie-break, whole-doc shingle for short docs") {
    val d = docs(
      (1, "en", "the cat sat on the mat"),   // grams incl "the cat sat", "cat sat on", …
      (2, "en", "the cat sat on the mat"),
      (3, "en", "tiny doc"))                 // < n tokens → one whole-doc shingle
    val got = CorpusOps.ngramTopK(d, "doc_id", "text", n = 3, k = 100)
      .as[(String, Long, Long)].collect().toSeq
    val m = got.map(g => g._1 -> (g._2, g._3)).toMap
    assert(m("the cat sat") == (2L, 2L))
    assert(m("tiny doc") == (1L, 1L))
    // ordering: occurrences desc then gram asc
    assert(got == got.sortBy(g => (-g._2, g._1)))
  }
}
