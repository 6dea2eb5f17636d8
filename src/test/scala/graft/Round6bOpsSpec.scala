package graft

import graft.operators.{BucketOps, CorpusOps, DriftOps, MaintOps, PackingOps, SimilarityOps, StatsOps}
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

  test("winsorizeByKey: values clipped to key-local quantiles, rows conserved") {
    val d = Seq(("a", 0.0), ("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 1000.0),
      ("b", 5.0)).toDF("k", "v")
    val out = StatsOps.winsorizeByKey(d, "k", "v", 0.25, 0.75)
    assert(out.count() == 6, "winsorize must keep every row")
    val a = out.filter(col("k") === "a").select("v", "v_w")
      .as[(Double, Double)].collect().toMap
    // key a quantiles: p25 = 10, p75 = 30 → 0 clips up to 10, 1000 down to 30
    assert(a(0.0) == 10.0 && a(1000.0) == 30.0 && a(20.0) == 20.0)
    val b = out.filter(col("k") === "b").select("v_w").as[Double].collect()
    assert(b.toSeq == Seq(5.0), "single-value key clips to itself")
  }

  test("diversitySample: cell cap respected, deterministic, bucket = sign code") {
    val vecs = Seq(
      (1, Array(1.0, 1.0)), (2, Array(1.0, 1.0)), (3, Array(1.0, 1.0)),
      (4, Array(-1.0, 1.0)), (5, Array(1.0, -1.0))
    ).toDF("id", "vec")
    val out = SimilarityOps.diversitySample(vecs, "id", "vec", signDims = 2, perBucket = 2, seed = "s")
      .as[(Int, Int, Int)].collect().toSeq.sortBy(r => (r._2, r._3))
    // bucket 3 (both positive) holds ids 1,2,3 → capped at 2; others keep 1 each
    assert(out.count(_._2 == 3) == 2)
    assert(out.count(_._2 == 2) == 1 && out.count(_._2 == 1) == 1)
    val again = SimilarityOps.diversitySample(vecs.repartition(5), "id", "vec", 2, 2, "s")
      .as[(Int, Int, Int)].collect().toSeq.sortBy(r => (r._2, r._3))
    assert(again == out, "seeded sample must be partitioning-independent")
  }

  test("randomProjection: linearity in the input and replay stability") {
    val vecs = Seq((1, Array(1.0f, 2.0f, 0.0f)), (2, Array(2.0f, 4.0f, 0.0f))).toDF("id", "vec")
    val out = SimilarityOps.randomProjection(vecs, "id", "vec", dim = 3, outDims = 3, seed = "t")
      .as[(Int, Int, Double)].collect().toSeq
    assert(out.size == 6)
    val m = out.map { case (id, j, c) => (id, j) -> c }.toMap
    // vec 2 = 2 × vec 1 → every component doubles (signs cancel identically)
    (0 until 3).foreach(j => assert(math.abs(m((2, j)) - 2 * m((1, j))) < 1e-9))
    val re = SimilarityOps.randomProjection(vecs.repartition(4), "id", "vec", 3, 3, "t")
      .as[(Int, Int, Double)].collect().toSeq
    assert(re.toSet == out.toSet, "components must be partition-order stable")
    assert(BucketOps.countExchanges(SimilarityOps.randomProjection(vecs, "id", "vec", 3, 3, "t")) == 0,
      "projection must plan zero shuffles")
  }

  test("paddingWaste: integer accounting, truncation at context, bucket floors") {
    val d = Seq(3, 32, 33, 500).toDF("n_tok") // buckets: 32, 32, 64, 256(trunc)
    val got = PackingOps.paddingWaste(d, "n_tok", contextLen = 256, step = 32)
      .select("bucket_len", "n_docs", "real_tokens", "padded_slots", "waste", "naive_waste")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (32L, 2L, 35L, 64L, 29L, 477L),   // 3+32 real; naive: 2*256-35
      (64L, 1L, 33L, 64L, 31L, 223L),
      (256L, 1L, 256L, 256L, 0L, 0L)))  // 500 truncates to 256 → zero pad waste
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
