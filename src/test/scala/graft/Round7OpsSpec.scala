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

  test("intervalOverlapJoin: equals the naive quadratic join, each pair exactly once") {
    // randomized-but-seeded spans; the bucketized emit-once join must
    // match a plain theta join on the half-open overlap predicate
    val rnd = new scala.util.Random(7)
    val left = (1L to 40L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, s, s + 1 + rnd.nextInt(120))
    }.toDF("lid", "ls", "le")
    val right = (1L to 40L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, s, s + 1 + rnd.nextInt(120))
    }.toDF("rid", "rs", "re")
    val got = graft.operators.JoinOps
      .intervalOverlapJoin(left, right, Nil, "ls", "le", "rs", "re", bucketWidth = 64L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val naive = left.join(right, col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size, "a pair was emitted more than once")
    assert(got.toSet == naive.toSet)
    assert(got.size == naive.size)
  }

  test("intervalOverlapJoin: key columns scope the match; touching spans don't overlap") {
    val l = Seq((1L, 0L, 10L), (2L, 0L, 10L)).toDF("k1", "ls", "le")
    val r = Seq((1L, 10L, 20L), (1L, 9L, 20L), (2L, 5L, 6L)).toDF("k2", "rs", "re")
    val got = graft.operators.JoinOps
      .intervalOverlapJoin(l, r.withColumnRenamed("k2", "k1"), Seq("k1"),
        "ls", "le", "rs", "re", bucketWidth = 8L)
      .select(col("rs"), col("re")).as[(Long, Long)].collect().toSeq.sorted
    // [0,10) vs [10,20): touch, NOT overlap; key 1 [0,10) vs [9,20):
    // overlap; key 2 [0,10) only matches its own [5,6)
    assert(got == Seq((5L, 6L), (9L, 20L)))
  }

  test("timeSplit: strict boundaries — trainEnd goes to embargo, testStart to test") {
    val df = Seq((1L, 99L), (2L, 100L), (3L, 150L), (4L, 200L), (5L, 201L)).toDF("id", "us")
    val got = graft.operators.SplitOps.timeSplit(df, "us", 100L, 200L)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "train", 2L -> "embargo", 3L -> "embargo", 4L -> "test", 5L -> "test"))
    intercept[IllegalArgumentException] {
      graft.operators.SplitOps.timeSplit(df, "us", 300L, 200L)
    }
  }

  test("oovRate: in-vocab doc scores 0, all-OOV doc scores 1, stopword-only doc drops out") {
    val docs = Seq(
      (1L, "alpha alpha alpha beta"), // alpha, beta in top-2 vocab
      (2L, "gamma delta"),            // both OOV vs top-2
      (3L, "the and of")              // stopwords only → no content tokens
    ).toDF("doc_id", "text")
    val got = graft.operators.CorpusOps.oovRate(docs, "doc_id", "text", topV = 2)
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 4L, 0L, 0.0), (2L, 2L, 2L, 1.0)))
  }

  test("rollingDistinctEstimate: exact at tiny cardinalities, windows compose day rows") {
    val df = Seq(
      (1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (5L, 13L)
    ).toDF("day", "uid")
    val got = graft.operators.StatsOps.rollingDistinctEstimate(df, "day", "uid", window = 2)
      .as[(Long, Double)].collect().toMap
    // day 1: {10,11}=2; day 2: day1∪day2 {10,11,12}=3; day 5: {13}=1 (4 is empty, not a row)
    assert(got == Map(1L -> 2.0, 2L -> 3.0, 5L -> 1.0))
  }

  test("rollingZScore: constant baseline flags the spike, cold window stays silent") {
    // key 1: nine 10.0s then a 200.0 — window n reaches 10 at the spike,
    // variance floor keeps z finite; key 2: only 3 events → below minN
    val rows = (1 to 9).map(i => (1L, i.toLong, i.toLong * 10, 10.0)) ++
      Seq((1L, 10L, 100L, 200.0)) ++
      (1 to 3).map(i => (2L, (10 + i).toLong, i.toLong * 10, 999.0))
    val df = rows.toDF("user_id", "event_id", "ts_us", "value")
    val got = graft.operators.StatsOps
      .rollingZScore(df, "user_id", Seq("ts_us", "event_id"), "value",
        window = 20, minN = 10, zThresh = 2.0)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L)))
  }

  test("rollingZScore: exact z value for a hand-computable window") {
    val rows = (1 to 10).map(i => (1L, i.toLong, i.toLong, if (i == 10) 110.0 else 10.0))
    val df = rows.toDF("user_id", "event_id", "ts_us", "value")
    val z = graft.operators.StatsOps
      .rollingZScore(df, "user_id", Seq("ts_us", "event_id"), "value",
        window = 20, minN = 10, zThresh = 2.0)
      .select("z").as[Double].collect().head
    // window: nine 10s + one 110 → mean 20, var = (9·100 + 12100)/10 − 400 = 900 → z = 90/30 = 3
    assert(math.abs(z - 3.0) < 1e-12)
  }

  test("powerIterationStep: recovers the dominant axis of an axis-aligned corpus") {
    // vectors hug e1 with a small e2 component; one step from the v0 seed
    // must land (normalized) overwhelmingly on c0, and lambda_est > 0
    val d = Seq(
      (1L, Seq(10.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Seq(9.0f, -1.0f, 0.0f, 0.0f)),
      (3L, Seq(11.0f, 0.5f, 0.0f, 0.0f)),
      (4L, Seq(10.5f, -0.5f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = graft.operators.LinAlgOps.powerIterationStep(d, "vec_id", "embedding")
      .as[(Long, Double, Double, Double, Double, Double)].collect().head
    val (dim, lam, c0, c1, c2, c3) = r
    assert(dim == 4L && lam > 0.0)
    assert(math.abs(c0) > 0.99, s"c0=$c0 should dominate")
    assert(math.abs(c1) < 0.15 && c2 == 0.0 && c3 == 0.0)
    // unit-norm head: components are of v1/||v1||
    assert(c0 * c0 + c1 * c1 + c2 * c2 + c3 * c3 <= 1.0 + 1e-9)
  }

  test("persisted IVF index: full-probe equals brute force, scan is bucket-pruned, append lands") {
    import graft.operators.{BucketOps, SimilarityOps, VectorIndexOps}
    val rnd = new scala.util.Random(11)
    def vec() = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
    val corpus = (1L to 60L).map(i => (i, vec())).toDF("vec_id", "vec")
    val idx = VectorIndexOps.buildIvfIndex(corpus, "vec_id", "vec", "graft_r7_ivf",
      nCells = 4, numBuckets = 4)
    try {
      val queries = corpus.filter(col("vec_id") <= 3)
      // probing ALL cells makes IVF exhaustive — must equal brute force
      val full = VectorIndexOps.probeIvf(spark, queries, "vec_id", "vec", idx, k = 5, nProbe = 4)
        .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
      val bf = SimilarityOps.bruteForceTopK(corpus, queries, "vec_id", "vec", 5)
        .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
      assert(full == bf)
      // a 1-cell probe must bucket-prune the index scan
      val pruned = VectorIndexOps.probeIvf(spark, queries.limit(1), "vec_id", "vec", idx,
        k = 5, nProbe = 1)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"), s"no bucket pruning in plan:\n$plan")
      assert(!plan.contains("SelectedBucketsCount: 4 out of 4"), "probe read every bucket")
      // append a new generation with the SAME spec; the probe must see it
      // (1,0,…) is already unit-norm — append it straight into cell 0
      val assigned2 = Seq((1000L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0), 0))
        .toDF("neighbor_id", "unit", "cell")
      BucketOps.appendBucketed(assigned2, idx.cellsTable, numBuckets = 4, keys = Seq("cell"),
        sortKeys = Seq("cell"))
      assert(spark.table(idx.cellsTable).filter(col("neighbor_id") === 1000L).count() == 1)
    } finally {
      BucketOps.dropTable(spark, idx.cellsTable)
      BucketOps.dropTable(spark, idx.centroidsTable)
    }
  }

  test("boundedEwma: bit-identical to the naive fixed-order fold on random series") {
    // the determinism claim is EXACT double equality, not approximate:
    // weights are powers of two and the chain order is fixed
    val rnd = new scala.util.Random(13)
    val rows = for (key <- 1L to 5L; i <- 1L to 40L) yield (key, i, rnd.nextDouble() * 1000 - 500)
    val got = graft.operators.StatsOps
      .boundedEwma(rows.toDF("k", "seq", "v"), "k", Seq("seq"), "v", k = 16)
      .select("k", "seq", "ewma").as[(Long, Long, Double)].collect()
      .map { case (k, s, e) => (k, s) -> e }.toMap
    val byKey = rows.groupBy(_._1)
    for (((k, seq), ewma) <- got) {
      val series = byKey(k).filter(_._2 <= seq).sortBy(-_._2).take(16).map(_._3)
      var num = 0.0
      var den = 0.0
      for ((v, j) <- series.zipWithIndex) {
        num += v * math.pow(0.5, j) // += replays Spark's left-to-right chain
        den += math.pow(0.5, j)
      }
      assert(ewma == num / den, s"key $k seq $seq: $ewma != ${num / den}")
    }
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

  test("prefixFilterJaccardPairs equals the quadratic pair set (zero false negatives)") {
    // 60 docs around 6 templates with word-level perturbations — enough
    // near-dup structure that a broken prefix bound would drop pairs
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val docs = (0 until 60).map { i =>
      val base = (0 until 12).map(j => words((i / 10 + j) % words.length))
      val mut = if (i % 10 < 5) base else base.updated(i % 12, words((i * 7) % words.length))
      (i.toLong, mut.mkString(" "))
    }.toDF("doc_id", "text")
    val got = DedupOps.prefixFilterJaccardPairs(docs, "text", "doc_id",
        threshold = 0.6, shingleSize = 2)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    val sh = docs.select(col("doc_id"), DedupOps.hashedShingleSet(col("text"), 2).as("sh"))
    val want = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("jaccard", DedupOps.jaccardSets(col("a.sh"), col("b.sh")))
      .filter(col("jaccard") >= 0.6)
      .select(col("a.doc_id"), col("b.doc_id"), round(col("jaccard"), 4))
      .as[(Long, Long, Double)].collect().toSet
    assert(want.nonEmpty, "test corpus must actually contain near-dup pairs")
    assert(got == want)
  }

  test("triangleStats equals brute-force triangle count on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 400).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.toDF("x", "y")
    val row = GraphOps.triangleStats(edges, "x", "y").collect().head
    val e = edges.select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
    val tri = e.as("ab").join(e.as("bc"), col("ab.b") === col("bc.a"))
      .join(e.as("ac"), col("ac.a") === col("ab.a") && col("ac.b") === col("bc.b"))
      .count()
    assert(row.getAs[Long]("n_triangles") == tri)
    assert(row.getAs[Long]("n_edges") == e.count())
    // 3·T ≤ W always (every triangle contributes 3 closed wedges)
    assert(3 * row.getAs[Long]("n_triangles") <= row.getAs[Long]("n_wedges"))
  }
}
