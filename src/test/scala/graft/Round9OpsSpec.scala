package graft

import graft.functions.StringSimKernel
import graft.operators.{CorpusOps, DedupOps, GraphOps, PrivacyOps}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double = {
    val parts = StringSimKernel
      .jaroWinklerParts(UTF8String.fromString(a), UTF8String.fromString(b))
    parts.getLong(0).toDouble / parts.getLong(1).toDouble
  }

  test("jaro-winkler kernel: 1-char and short-string boundary cases (window clamp)") {
    // round-8 advisor item 1: unclamped window max(l1,l2)/2-1 = -1 on
    // 1-char pairs found zero matches — DuckDB scores 'a'~'a' = 1.0
    assert(jw("a", "a") == 1.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ab") == 1.0)
    assert(jw("a", "ab") > 0.0 && jw("a", "ab") < 1.0)
    assert(jw("", "a") == 0.0)
    assert(jw("", "") == 0.0) // the DuckDB convention: empty scores 0
    // classic textbook probe: MARTHA/MARHTA = 0.961 (3 decimals)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111) < 1e-6)
  }

  test("jaroWinklerPairs ≡ the naive within-block quadratic") {
    // two-word names from a small vocab (the part.p_name shape), some
    // identical, some one-word-apart, brands independent of names
    // word1 from a pairwise-DISSIMILAR set, word2 from a cluster of
    // near-variants: high-JW pairs then always share word1 (the
    // deletion-1 contract family — two simultaneous word substitutions
    // cannot reach 0.9 when word1 alternatives are this far apart)
    val r = new scala.util.Random(11)
    val w1 = Seq("amber", "slate", "indigo", "maroon")
    val w2 = Seq("coral", "corol", "corral", "plum", "pluum")
    val rows = (1 to 160).map { id =>
      val n = s"${w1(r.nextInt(w1.size))} ${w2(r.nextInt(w2.size))}"
      (id.toLong, n, s"B${r.nextInt(4)}")
    }
    val df = rows.toDF("id", "name", "blk").repartition(5)
    val got = DedupOps.jaroWinklerPairs(df, "name", "id", "blk", 9, 10)
      .select("blk", "a_id", "b_id", "similarity")
    val a = df.select(col("blk"), col("id").as("a_id"), col("name").as("n1"))
    val b = df.select(col("blk"), col("id").as("b_id"), col("name").as("n2"))
    val naive = a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
      .withColumn("p", graft.functions.StringSimFunctions.jaroWinklerParts(col("n1"), col("n2")))
      .filter(element_at(col("p"), 1) * 10 >= element_at(col("p"), 2) * 9)
      .select(col("blk"), col("a_id"), col("b_id"),
        round(element_at(col("p"), 1).cast("double") /
          element_at(col("p"), 2).cast("double"), 6).as("similarity"))
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty,
      "deletion-1 word blocking must reproduce the full quadratic on " +
        "one-word-apart vocab names")
    assert(got.count() > 0, "probe must be non-trivial")
  }

  test("calibrateByKey checkTies: non-total (key, score, tie) fails loud") {
    val ok = Seq((1L, "a", 0.5, 1L), (2L, "a", 0.5, 2L), (3L, "b", 0.1, 3L))
      .toDF("doc", "k", "score", "tie")
    // fine without the flag, fine with the flag on a total order
    spark.conf.set("spark.graft.calibrate.checkTies", "true")
    try {
      assert(CorpusOps.calibrateByKey(ok, "k", "score", "tie").count() == 3)
      val dup = Seq((1L, "a", 0.5, 7L), (2L, "a", 0.5, 7L))
        .toDF("doc", "k", "score", "tie")
      val e = intercept[IllegalArgumentException] {
        CorpusOps.calibrateByKey(dup, "k", "score", "tie").count()
      }
      assert(e.getMessage.contains("not a total order"))
      // and without the flag the legacy permissive path still runs
      spark.conf.unset("spark.graft.calibrate.checkTies")
      assert(CorpusOps.calibrateByKey(dup, "k", "score", "tie").count() == 2)
    } finally spark.conf.unset("spark.graft.calibrate.checkTies")
  }

  test("streaming IVF index maintenance ≡ batch append, and replay-safe") {
    import graft.operators.VectorIndexOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // clustered corpus: 3 archetypes + deterministic per-id jitter
    def vec(arch: Int, id: Long): Seq[Double] = {
      val base = Array.fill(8)(0.05)
      base(arch * 2) = 1.0
      base((arch * 2 + 5) % 8) = 0.4
      base(id.toInt % 8) += 0.13
      base.toSeq
    }
    def rows(ids: Range) = ids.map(i => (i.toLong, vec(i % 3, i.toLong)))
    val day0 = rows(0 until 30).toDF("id", "v")
    val delta1 = rows(30 until 45)
    val delta2 = rows(45 until 60)
    // two independently-built indexes from the SAME day-0 corpus (the
    // deterministic trainer gives identical centroids), one maintained
    // by the stream, one by one batch append of the union
    val live = VectorIndexOps.buildIvfIndex(day0, "id", "v", "graft_r9_sivf",
      nCells = 3, numBuckets = 2, iters = 3)
    val truth = VectorIndexOps.buildIvfIndex(day0, "id", "v", "graft_r9_sivf_b",
      nCells = 3, numBuckets = 2, iters = 3)
    VectorIndexOps.appendToIvfIndex((delta1 ++ delta2).toDF("id", "v"),
      "id", "v", truth, numBuckets = 2)
    val commitDir = java.nio.file.Files.createTempDirectory("graft-r9-ivf-commits").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val q = in.toDF().toDF("id", "v").writeStream
      .foreachBatch(VectorIndexOps.ivfIndexMaintenanceSink(
        live, "id", "v", numBuckets = 2, commitDir = commitDir))
      .start()
    try {
      in.addData(delta1: _*); q.processAllAvailable()
      in.addData(delta2: _*); q.processAllAvailable()
    } finally q.stop()
    // cell codes bit-identical to the batch append (same frozen centroids)
    val a = spark.table(live.cellsTable).select(col("neighbor_id"), col("cell"))
    val b = spark.table(truth.cellsTable).select(col("neighbor_id"), col("cell"))
    assert(a.count() == 60 && a.except(b).isEmpty && b.except(a).isEmpty)
    // a replayed micro-batch id must be skipped (commit marker)
    val sink = VectorIndexOps.ivfIndexMaintenanceSink(
      live, "id", "v", numBuckets = 2, commitDir = commitDir)
    sink(delta1.toDF("id", "v"), 0L)
    assert(spark.table(live.cellsTable).count() == 60, "replay of batch 0 must be a no-op")
    // and probes against the maintained index equal probes of the truth
    val queries = rows(0 until 4).toDF("id", "v")
    val pa = VectorIndexOps.probeIvf(spark, queries, "id", "v", live, k = 3, nProbe = 2)
    val pb = VectorIndexOps.probeIvf(spark, queries, "id", "v", truth, k = 3, nProbe = 2)
    assert(pa.except(pb).isEmpty && pb.except(pa).isEmpty)
  }

  test("kcore fails fast when maxIter stops before the fixpoint") {
    // path graph at k=2 peels two endpoints per round: depth Θ(n), so
    // maxIter=2 on a 12-node path cannot converge and must THROW (an
    // over-included "core" would silently violate the min-degree
    // invariant — round-8 advisor item 2)
    val path = (1 to 11).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      GraphOps.kcore(path, "a", "b", 2, maxIter = 2).count()
    }
    assert(e.getMessage.contains("fixpoint"))
    // with enough rounds the 2-core of a path is empty — and no throw
    assert(GraphOps.kcore(path, "a", "b", 2, maxIter = 50).isEmpty)
  }

  test("semanticDedup ≡ naive prune replay; keeps the outlier of each dup pair") {
    import graft.operators.SimilarityOps
    import graft.functions.VectorFunctions
    // 40 base vectors in 4 loose groups + a near-copy of each base vector
    // (cosine ≈0.998 — same dup structure the driver query synthesizes)
    val r = new scala.util.Random(7)
    val dim = 16
    val base = (0 until 40).map { i =>
      val center = Array.tabulate(dim)(j => if (j % 4 == i % 4) 1.0 else 0.0)
      (i.toLong, center.map(x => x + 0.3 * r.nextGaussian()).toSeq)
    }
    val copies = base.map { case (id, v) =>
      (id + 1000, v.zipWithIndex.map { case (x, j) => x + 0.05 * v((j + 1) % dim) })
    }
    val df = (base ++ copies).toDF("id", "vec").repartition(4)
    val got = SimilarityOps.semanticDedup(df, "id", "vec", nCells = 4, tau = 0.99)
    // naive replay of the published rule over the SAME cells projection
    val cells = SimilarityOps.semanticCells(df, "id", "vec", nCells = 4)
    val a = cells.select(col("cell"), col("id").as("a_id"), col("unit").as("av"), col("cent_sim").as("acs"))
    val b = cells.select(col("cell"), col("id").as("b_id"), col("unit").as("bv"), col("cent_sim").as("bcs"))
    val drops = a.join(b, Seq("cell")).filter(col("a_id") =!= col("b_id"))
      .filter(round(VectorFunctions.dot(col("av"), col("bv")), 6) >= 0.99)
      .filter(col("bcs") < col("acs") || (col("bcs") === col("acs") && col("b_id") < col("a_id")))
      .select(col("a_id").as("id")).distinct()
    val naive = cells.join(drops, Seq("id"), "left_anti").select("id", "cell", "cent_sim")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
    val kept = got.count()
    assert(kept > 0 && kept < 80, "some but not all must be pruned")
    // keep-the-outlier: for every same-cell dup pair with distinct
    // cent_sim, the survivor is the member with the LOWER cent_sim
    val pairs = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(round(VectorFunctions.dot(col("av"), col("bv")), 6) >= 0.99)
      .filter(col("acs") =!= col("bcs"))
      .withColumn("pref", when(col("acs") < col("bcs"), col("a_id")).otherwise(col("b_id")))
      .withColumn("other", when(col("acs") < col("bcs"), col("b_id")).otherwise(col("a_id")))
    assert(pairs.count() > 0, "distinct-cent_sim dup pairs must exist")
    assert(pairs.join(got, pairs("other") === got("id"), "inner").isEmpty,
      "the member closer to its centroid must never survive a dup pair")
  }

  test("kmv sketch: exact below k, partition-invariant, composable set estimates") {
    import graft.functions.SketchAggregates._
    val k = 64
    // below k: the sketch IS the distinct hash set → estimates exact
    val small = (1 to 40).flatMap(i => Seq(i, i)).toDF("v") // dups collapse
    val e = small.select(kmvEstimate(kmvSketch(col("v"), k), k).as("e")).head().getDouble(0)
    assert(e == 40.0)
    // merge is partition-order-invariant: same sketch from 1 and 13 parts
    val big = (1 to 5000).map(_ * 7).toDF("v")
    val s1 = big.repartition(1).select(kmvSketch(col("v"), k)).head().getSeq[Long](0)
    val s13 = big.repartition(13).select(kmvSketch(col("v"), k)).head().getSeq[Long](0)
    assert(s1 == s13 && s1.length == k && s1 == s1.sorted)
    // estimator accuracy at 5000 distinct, k=64: within 3σ ≈ 38%
    val est = big.select(kmvEstimate(kmvSketch(col("v"), k), k).as("e")).head().getDouble(0)
    assert(math.abs(est / 5000.0 - 1.0) < 0.38, s"estimate $est too far from 5000")
    // set algebra: A = 1..3000, B = 2001..5000 → union 5000, overlap 1000
    val ab = (1 to 5000).map(i => (i, if (i <= 3000) 1 else 0, if (i > 2000) 1 else 0))
      .toDF("v", "ina", "inb")
    val row = ab.select(
      kmvSketch(when(col("ina") === 1, col("v")), k).as("a"),
      kmvSketch(when(col("inb") === 1, col("v")), k).as("b"))
    val out = row.select(
      kmvEstimate(kmvUnion(col("a"), col("b"), k), k).as("u"),
      kmvIntersectEstimate(col("a"), col("b"), k).as("i")).head()
    assert(math.abs(out.getDouble(0) / 5000.0 - 1.0) < 0.38, s"union ${out.getDouble(0)}")
    assert(math.abs(out.getDouble(1) / 1000.0 - 1.0) < 0.60, s"intersect ${out.getDouble(1)}")
    // null inputs are skipped, not hashed to the xxhash64 seed
    val withNull = Seq[(Integer, Integer)]((1, 1), (2, null), (3, null))
      .toDF("v", "w")
    val nsk = withNull.select(kmvSketch(col("w"), k)).head().getSeq[Long](0)
    assert(nsk.length == 1, "two NULLs must contribute nothing to the sketch")
  }

  test("dpRelease: clipped, noisy, partition-deterministic, no true columns") {
    val rows = Seq(
      ("a", 100L), ("a", 200L), ("a", -50L), ("a", 9999999L), // outlier clipped to 1000
      ("b", 10L), ("b", 20L))
    def release(parts: Int) = PrivacyOps.dpRelease(
      rows.toDF("g", "cents").repartition(parts), Seq("g"), "cents",
      clip = 1000L, epsCount = 0.5, epsSum = 1.0, releaseId = "t1")
    val r1 = release(1).orderBy("g").collect()
    val r7 = release(7).orderBy("g").collect()
    // deterministic under repartitioning (seeded noise, no RNG state)
    assert(r1.map(_.toSeq).toSeq == r7.map(_.toSeq).toSeq)
    // released schema carries NO true aggregates
    assert(release(1).columns.toSet ==
      Set("g", "noisy_count", "noisy_sum", "eps_count", "eps_sum", "eps_total"))
    val a = r1.find(_.getString(0) == "a").get
    val trueClippedA = 100.0 + 200.0 - 50.0 + 1000.0 // outlier clipped
    // clipping bounds the release: noise at b=1000 stays within ~15b
    // of the CLIPPED sum with overwhelming probability, never near the
    // unclipped 1e7 outlier
    assert(math.abs(a.getAs[Double]("noisy_sum") - trueClippedA) < 20000.0)
    // noise actually fired (a zero draw has probability ~0)
    assert(a.getAs[Double]("noisy_count") != 4.0)
    assert(a.getAs[Double]("eps_total") == 1.5)
    // a different release id draws different noise
    val r2 = PrivacyOps.dpRelease(rows.toDF("g", "cents"), Seq("g"), "cents",
      1000L, 0.5, 1.0, "t2").orderBy("g").collect()
    assert(r2.map(_.getAs[Double]("noisy_sum")).toSeq !=
      r1.map(_.getAs[Double]("noisy_sum")).toSeq)
  }

  test("fellegiSunter: blocked candidates, integer score, decision bands") {
    import graft.operators.LinkageOps
    import graft.operators.LinkageOps.FieldRule
    val a = Seq((1L, "blk1", "alice", 10L), (2L, "blk1", "bob", 20L),
      (3L, "blk2", "carol", 30L)).toDF("a_id", "blk", "a_name", "a_v")
    val b = Seq((11L, "blk1", "alice", 10L), (12L, "blk1", "bobb", 99L),
      (13L, "blk3", "alice", 10L)).toDF("b_id", "blk", "b_name", "b_v")
    val out = LinkageOps.fellegiSunter(a, b, "blk", _ => Seq(
        FieldRule("name", levenshtein(col("a_name"), col("b_name")) <= 1, 900L, -500L),
        FieldRule("v", col("a_v") === col("b_v"), 400L, -300L)),
        matchBp = 1000L, possibleBp = 0L)
      .select("a_id", "b_id", "agree_name", "agree_v", "score_bp", "decision")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // blocking: only blk1 pairs exist (2×2); blk2/blk3 singletons never pair
    assert(out.keySet == Set((1L, 11L), (1L, 12L), (2L, 11L), (2L, 12L)))
    val exact = out((1L, 11L)) // both fields agree: 900+400=1300 → match
    assert(exact.getAs[Long]("score_bp") == 1300L && exact.getAs[String]("decision") == "match")
    val fuzzy = out((2L, 12L)) // lev(bob,bobb)=1 agree, v disagree: 900-300=600 → possible
    assert(fuzzy.getAs[Boolean]("agree_name") && !fuzzy.getAs[Boolean]("agree_v"))
    assert(fuzzy.getAs[Long]("score_bp") == 600L && fuzzy.getAs[String]("decision") == "possible")
    val none = out((2L, 11L)) // lev(bob,alice)>1, 20≠10: -500-300 → nonmatch
    assert(none.getAs[Long]("score_bp") == -800L && none.getAs[String]("decision") == "nonmatch")
  }

  test("scrubDuplicatedSpans: keep-first owner, within-doc repeats untouched") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ") // the shared 8-gram
    val docs = Seq(
      (1L, s"intro $span tail one"),           // owner: keeps the span
      (2L, s"other lead-in $span closing"),    // duplicate: span scrubbed
      (3L, s"$span mid $span"),                // dup of doc1 twice: both scrubbed
      (4L, s"unique text with no repeats at all beyond eight tokens here"),
      (5L, "short doc"),                       // < 8 tokens: never scrubbed
      (6L, s"self $span again $span"))         // within doc6, span also in doc1 → scrubbed
    val out = CorpusOps.scrubDuplicatedSpans(
        docs.toDF("doc_id", "text").repartition(3), "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    def scrubbed(id: Long) = out(id).getAs[String]("scrubbed")
    def removed(id: Long) = out(id).getAs[Long]("n_removed")
    // owner keeps everything
    assert(removed(1L) == 0L && scrubbed(1L) == s"intro $span tail one")
    // duplicate loses exactly the 8 span tokens
    assert(removed(2L) == 8L && scrubbed(2L) == "other lead-in closing")
    // two occurrences both covered; the 'mid' word survives
    assert(removed(3L) == 16L && scrubbed(3L) == "mid")
    assert(removed(4L) == 0L && removed(5L) == 0L)
    // doc6: both copies covered (owner is doc1), framing words survive
    assert(removed(6L) == 16L && scrubbed(6L) == "self again")
    // a WITHIN-DOC-ONLY repeat with no external owner is untouched:
    val selfOnly = Seq((7L, s"aa bb cc dd ee ff gg hh xx aa bb cc dd ee ff gg hh"))
      .toDF("doc_id", "text")
    val r7 = CorpusOps.scrubDuplicatedSpans(selfOnly, "doc_id", "text", 8).head()
    assert(r7.getAs[Long]("n_removed") == 0L)
  }

  test("incremental SemDeDup: index drops, within-batch prune, append catches day-3 dups") {
    import graft.operators.VectorIndexOps
    // nCells = 1 removes cell-geometry brittleness: every pair is
    // compared, fate is decided purely by the cosine gate + preference.
    val base = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),          // A
      (2L, Seq(0.0, 1.0, 0.0, 0.0))           // B
    ).toDF("id", "v")
    val idx = VectorIndexOps.buildSemDedupIndex(base, "id", "v",
      "graft_t_semidx", nCells = 1, numBuckets = 2, tau = 0.99)
    assert(spark.table(idx.cellsTable).count() == 2, "no bootstrap dups in base")
    // day 1: A' (near-dup of indexed A, cos≈0.99875) drops; C is new
    val delta1 = Seq(
      (10L, Seq(1.0, 0.05, 0.0, 0.0)),        // A' → dropped_index
      (11L, Seq(0.0, 0.0, 1.0, 0.0))          // C  → survived (appended)
    ).toDF("id", "v")
    val f1 = VectorIndexOps.probeSemDedupIndex(delta1, "id", "v", idx,
        update = true, numBuckets = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("verdict")).toMap
    assert(f1 == Map(10L -> "dropped_index", 11L -> "survived"))
    assert(spark.table(idx.cellsTable).count() == 3, "survivor C appended to the index")
    // day 2: C' dups the DAY-1 SURVIVOR (only catchable because the
    // append folded C in); D1/D2 dup each other but nothing indexed —
    // exactly one goes by the within-batch preference
    val delta2 = Seq(
      (20L, Seq(0.0, 0.0, 1.0, 0.05)),        // C' → dropped_index (vs appended C)
      (21L, Seq(1.0, 1.0, 0.0, 0.0)),         // D1
      (22L, Seq(1.0, 1.0, 0.05, 0.0))         // D2
    ).toDF("id", "v")
    val f2 = VectorIndexOps.probeSemDedupIndex(delta2, "id", "v", idx,
        update = false, numBuckets = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("verdict")).toMap
    assert(f2(20L) == "dropped_index")
    assert(Seq(f2(21L), f2(22L)).sorted == Seq("dropped_delta", "survived"),
      s"exactly one of the D pair must go by preference, got $f2")
    // update=false is a read-only probe
    assert(spark.table(idx.cellsTable).count() == 3)
  }

  test("UnitNormalize ≡ the HOF normalize, zero-safe, float-accepting, null-propagating") {
    import graft.functions.VectorFunctions
    // The native kernel replaced transform(v, x / norm(v)) because the
    // HOF shape re-evaluated the norm per ELEMENT after projection
    // collapse (dedup_semantic's ~21 ms/row blowup). Identity contract:
    // same left-to-right Σx² under sqrt, same per-element division.
    val vecs = Seq(
      (1L, Seq(3.0, 4.0)),
      (2L, Seq(0.0, 0.0, 0.0)),              // all-zero passes through
      (3L, Seq(-1.5, 2.5, 0.0, 1e-3)),
      (4L, Seq(1.0))
    ).toDF("id", "vec")
    val hof = vecs
      .withColumn("nrm", sqrt(aggregate(col("vec"), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn("u", when(col("nrm") === 0, col("vec"))
        .otherwise(transform(col("vec"), x => x / col("nrm"))))
      .select($"id", $"u")
    val native = vecs.select($"id", VectorFunctions.unitNormalize($"vec").as("u"))
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(h.keySet == n.keySet)
    h.foreach { case (k, hv) =>
      assert(hv == n(k), s"id=$k: hof=$hv native=${n(k)}") // bit-identical
    }
    // float input accepted and widened (the embeddings table's type)
    val f = Seq((1L, Seq(3.0f, 4.0f))).toDF("id", "vec")
      .select(VectorFunctions.unitNormalize($"vec").as("u")).head().getSeq[Double](0)
    assert(f == Seq(0.6, 0.8))
    // null row propagates
    val nl = Seq((1L, null.asInstanceOf[Seq[Double]])).toDF("id", "vec")
      .select(VectorFunctions.unitNormalize($"vec").as("u")).head()
    assert(nl.isNullAt(0))
  }

  // ---- winnowing (Schleimer et al. SIGMOD'03) --------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference winnowing: per-window rightmost-argmin selection, the
    * definition straight from the paper. */
  private def naiveWinnow(tokens: Seq[String], k: Int, w: Int): Set[(Long, Long)] = {
    val grams =
      if (tokens.size <= k) Seq(tokens.mkString(" "))
      else tokens.sliding(k).map(_.mkString(" ")).toSeq
    val hs = grams.map(g => java.lang.Long.parseLong(md5hex(g).take(10), 16))
    val n = hs.size
    (0 to math.max(n - w, 0)).map { j =>
      val end = math.min(j + w - 1, n - 1)
      var best = j
      for (q <- j to end) if (hs(q) <= hs(best)) best = q // <= → rightmost tie
      (best.toLong, hs(best))
    }.toSet
  }

  test("winnowFingerprints ≡ the paper's per-window rightmost-argmin on random docs") {
    val r = new scala.util.Random(7)
    val vocab = Vector("ash", "birch", "cedar", "dune", "elm", "fern", "gorse", "hazel")
    val docs = (1L to 40L).map { id =>
      val len = 1 + r.nextInt(30) // covers <k, <w-grams, and long docs
      (id, Seq.fill(len)(vocab(r.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = DedupOps.winnowFingerprints(df, "text", "doc_id", k = 4, w = 4)
      .collect()
      .map(row => (row.getLong(0), (row.getLong(1), row.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, text) =>
      val want = naiveWinnow(text.split(" ").toSeq, 4, 4)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id: text='$text'")
    }
  }

  test("winnowing guarantee: a shared run of ≥ w+k-1 tokens always yields a shared fingerprint") {
    val r = new scala.util.Random(13)
    val vocab = ('a' to 'z').map(c => s"$c$c$c")
    val run = Seq("omega", "kappa", "sigma", "theta", "lambda", "gamma", "delta") // w+k-1 = 7
    val docs = (1L to 20L).flatMap { i =>
      def noise(n: Int) = Seq.fill(n)(vocab(r.nextInt(vocab.size)))
      val a = (noise(r.nextInt(20)) ++ run ++ noise(r.nextInt(20))).mkString(" ")
      val b = (noise(r.nextInt(20)) ++ run ++ noise(r.nextInt(20))).mkString(" ")
      Seq((i * 2, a), (i * 2 + 1, b))
    }
    val pairs = DedupOps.winnowDupPairs(docs.toDF("doc_id", "text"), "text", "doc_id",
        k = 4, w = 4, minShared = 1)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    (1L to 20L).foreach { i =>
      assert(pairs.contains((i * 2, i * 2 + 1)),
        s"planted pair (${i * 2}, ${i * 2 + 1}) missed — the winnowing guarantee is broken")
    }
  }

  // ---- DSIR importance resampling (Xie et al. 2023) --------------------

  test("dsirScores ranks target-like docs above raw-typical docs") {
    import graft.operators.SelectionOps
    // target docs speak vocabulary A, the raw bulk vocabulary B; two
    // held-out probes (neither in the target) — the A-speaking probe
    // must carry the higher importance weight
    val aText = "alpha beta gamma delta alpha beta gamma delta"
    val bText = "nickel cobalt zinc iron nickel cobalt zinc iron"
    val docs =
      (1L to 10L).map(i => (i, aText, true)) ++ // target slice
        (11L to 60L).map(i => (i, bText, false)) ++
        Seq((100L, aText, false), (101L, bText, false)) // probes
    val scored = SelectionOps.dsirScores(docs.toDF("id", "text", "is_t"),
        "id", "text", isTarget = col("is_t"), buckets = 256, seed = "t")
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(scored(100L) > scored(101L),
      s"target-like probe must outweigh raw-typical probe: $scored")
    // probe 100's weight equals the target docs' (same text, same fold)
    assert(scored(100L) == scored(1L))
  }

  test("dsir logw is an exact decimal fold: identical across partitionings") {
    import graft.operators.SelectionOps
    val r = new scala.util.Random(5)
    val vocab = Vector("v1", "v2", "v3", "v4", "v5", "v6", "v7", "v8")
    val docs = (1L to 80L).map { i =>
      (i, Seq.fill(6 + r.nextInt(20))(vocab(r.nextInt(vocab.size))).mkString(" "))
    }
    def run(parts: Int) = SelectionOps.dsirScores(
        docs.toDF("id", "text").repartition(parts), "id", "text",
        isTarget = col("id") % 3 === 0, buckets = 128, seed = "p")
      .collect().map(r => (r.getLong(0), r.getDecimal(1), r.getDecimal(2))).toSet
    assert(run(1) == run(13), "decimal weights must not depend on partitioning")
  }

  // ---- URL canonicalization ---------------------------------------------

  test("canonicalizeUrl: case, ports, www, utm params, param order, fragment, slashes") {
    import graft.functions.TextFunctions
    val cases = Seq(
      ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&id=2&b=1#frag",
        "https://example.com/a/b?b=1&id=2"),
      ("http://example.com:80/", "http://example.com/"),
      ("https://example.com", "https://example.com/"),
      ("https://sub.example.com/path?z=1&a=2", "https://sub.example.com/path?a=2&z=1"),
      ("https://example.com/p?utm_campaign=only", "https://example.com/p"),
      ("https://example.com:8080/p", "https://example.com:8080/p"), // non-default port kept
      ("https://wwwx.example.com/p", "https://wwwx.example.com/p"), // only 'www.' strips
      ("HTTP://A.B/Path/CASE/kept/", "http://a.b/Path/CASE/kept"))
    val got = cases.map(_._1).toDF("u")
      .select(TextFunctions.canonicalizeUrl($"u").as("c"))
      .collect().map(_.getString(0)).toSeq
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want) }
  }

  // ---- CCNet head/middle/tail buckets -------------------------------------

  test("ccnet buckets: terciles per language, head more familiar than tail") {
    import graft.operators.CorpusOps
    // 30 docs per lang: 10 made of one shared common phrase (high
    // familiarity), 20 of unique tokens (low); head must capture the
    // common docs and avg familiarity must be monotone head ≥ tail
    val common = "alpha beta gamma delta alpha beta gamma delta"
    val r = new scala.util.Random(21)
    val docs = (for {
      lang <- Seq("aa", "bb")
      i <- 1 to 30
    } yield {
      val id = (if (lang == "aa") 0 else 1000) + i
      val text = if (i <= 10) common
        else Seq.fill(8)(s"u${id}x${r.nextInt(1 << 20)}").mkString(" ")
      (id.toLong, lang, text)
    }).toDF("doc_id", "lang", "text")
    import graft.functions.TextFunctions
    val bg = docs.select($"doc_id", explode(TextFunctions.shingles($"text", 2)).as("b"))
      .filter($"b" =!= "")
    val cf = bg.groupBy("b").agg(count(lit(1)).as("cf"))
    val fam = bg.join(cf, Seq("b")).groupBy("doc_id")
      .agg((sum("cf").cast("double") / count(lit(1)).cast("double")).as("fam"))
    val scored = docs.select($"doc_id", $"lang").join(fam, Seq("doc_id"))
    val out = CorpusOps.calibrateByKey(scored, "lang", "fam", "doc_id", "pct")
      .withColumn("bucket", when($"pct" * 3 >= 2, "head")
        .when($"pct" * 3 >= 1, "middle").otherwise("tail"))
    val byBucket = out.groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n"), avg("fam").as("af"))
      .collect().map(r0 => (r0.getString(0), r0.getString(1)) -> (r0.getLong(2), r0.getDouble(3)))
      .toMap
    Seq("aa", "bb").foreach { l =>
      assert(byBucket((l, "head"))._1 == 10L, s"$l head tercile size")
      assert(byBucket((l, "head"))._2 > byBucket((l, "tail"))._2, s"$l monotone")
    }
  }

  // ---- BPE tokenizer training ---------------------------------------------

  test("bpeTrain reproduces hand-computed merges incl. greedy overlap semantics") {
    import graft.operators.CorpusOps
    // corpus: "aaab aaab ab" → vocab {aaab: 2, ab: 1}
    // step1: (a,a) count 4 (two per 'aaab' × tf 2) beats (a,b) count 3
    //        greedy apply: a a a b → [aa] a b
    // step2: (a,b) count 3 (aaab:2 + ab:1) beats (aa,a) count 2
    // step3: (aa,ab) count 2
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = CorpusOps.bpeTrain(docs, "text", steps = 3)
      .orderBy("step").collect()
      .map(r0 => (r0.getInt(0), r0.getString(1), r0.getString(2), r0.getLong(3))).toSeq
    assert(got == Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)), s"got $got")
    // overlap: "aaaa" + merge (a,a) must yield [aa][aa] (count 3 at
    // step 1 — three adjacent pairs — then (aa,aa) count 1), and the
    // loop stops gracefully when pairs run out
    val got2 = CorpusOps.bpeTrain(Seq((1L, "aaaa")).toDF("doc_id", "text"), "text", steps = 5)
      .orderBy("step").collect()
      .map(r0 => (r0.getInt(0), r0.getString(1), r0.getString(2), r0.getLong(3))).toSeq
    assert(got2 == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)), s"got $got2")
  }

  test("bpeEncodeStats reports exact corpus compression under the learned merges") {
    import graft.operators.CorpusOps
    // after 3 merges ((a,a), (a,b), (aa,ab)) on "aaab aaab ab":
    // vocab {aaab→[aaab] (1 sym, 4 chars, tf 2), ab→[ab] (1 sym,
    // 2 chars, tf 1)} — merge 3 fuses the whole word
    val st = CorpusOps.bpeEncodeStats(Seq((1L, "aaab aaab ab")).toDF("doc_id", "text"),
      "text", steps = 3).head()
    assert(st.getLong(0) == 2)         // n_words
    assert(st.getLong(1) == 3)         // total_occurrences
    assert(st.getLong(2) == 10)        // total_chars
    assert(st.getLong(3) == 3)         // total_tokens
    assert(st.getDouble(4) == 1.0)     // tokens per word occurrence
    assert(st.getDouble(5) == 0.3)     // 3 tokens / 10 chars
  }

  // ---- active-learning uncertainty sampling --------------------------------

  test("uncertaintySample picks the rows nearest the decision boundary") {
    import graft.operators.SelectionOps
    // y ≡ (x2 = 1) exactly → w=(0,0,1), pred = x2 ∈ {0,1}: every row is
    // maximally CERTAIN except planted rows with x2=0.5-ish... x2 is
    // integer, so instead make y depend on x1 with noise-free split and
    // check the selected rows are the ones with pred closest to ½
    val rows = (1L to 100L).map { i => (i, i % 50, i % 7, if (i % 50 >= 25) 1L else 0L) }
    val df = rows.toDF("id", "x1", "x2", "y")
    val sel = SelectionOps.uncertaintySample(df, "id", col("x1"), col("x2"), col("y"), k = 10)
      .collect()
    assert(sel.length == 10)
    // monotone feature → the boundary sits near x1 ≈ 24.5; the selected
    // uncertainties are the 10 smallest overall
    val all = SelectionOps.uncertaintySample(df, "id", col("x1"), col("x2"), col("y"), k = 100)
      .collect().map(_.getDouble(2)).sorted
    val picked = sel.map(_.getDouble(2)).sorted
    assert(picked.toSeq == all.take(10).toSeq, "must select the k smallest uncertainties")
  }

  // ---- CUPED --------------------------------------------------------------

  test("cupedAdjust preserves the arm effect and collapses variance under randomization") {
    import graft.operators.StatsOps
    // randomized assignment (same covariate distribution both arms),
    // y = 2x + small idiosyncratic noise + 4·1{B}: the adjusted
    // difference must equal the true effect (θ·(x̄_B−x̄_A)=0 exactly by
    // balance) while 1−ρ² collapses because x explains nearly all
    // variance — the sensitivity boost CUPED exists for
    val rows = (1L to 200L).flatMap { i =>
      val x = 100 + (i % 50) * 3
      val noise = (i % 7).toInt - 3
      Seq(("A", x, 2 * x + noise), ("B", x, 2 * x + noise + 4))
    }
    val out = StatsOps.cupedAdjust(rows.toDF("arm", "x", "y"), "arm", col("x"), col("y"))
      .collect().map(r0 => r0.getString(0) ->
        (r0.getAs[Double]("mean_y"), r0.getAs[Double]("mean_y_adj"), r0.getAs[Double]("var_ratio")))
      .toMap
    val rawDiff = out("B")._1 - out("A")._1
    val adjDiff = out("B")._2 - out("A")._2
    assert(math.abs(rawDiff - 4.0) < 1e-9, s"raw diff: $rawDiff")
    assert(math.abs(adjDiff - 4.0) < 1e-9,
      s"balanced covariate ⇒ adjustment shifts both arms equally: $adjDiff")
    assert(out("A")._3 < 0.05, s"x must explain nearly all variance: ${out("A")._3}")
  }

  // ---- 1-bit quantization eval ---------------------------------------------

  test("binaryQuantEval: sign-hamming recovers exact neighbors on separated clusters") {
    import graft.operators.SimilarityOps
    // two tight clusters in orthogonal orthants: within-cluster hamming
    // 0-1, cross-cluster ~d/2 → hamming top-k == cosine top-k, and the
    // cos(π·h/d) estimate of an identical-sign pair is exactly 1
    val r = new scala.util.Random(17)
    def jitter(base: Seq[Double]) = base.map(_ + (r.nextDouble() - 0.5) * 0.05)
    val a = Seq.fill(32)(1.0) ++ Seq.fill(32)(-1.0)
    val b = Seq.fill(32)(-1.0) ++ Seq.fill(32)(1.0)
    val vecs = ((1L to 6L).map(i => (i, jitter(a))) ++ (11L to 16L).map(i => (i, jitter(b))))
      .toDF("id", "vec")
    val out = SimilarityOps.binaryQuantEval(vecs, vecs.filter($"id" === 1), "id", "vec", k = 5)
      .head()
    assert(out.getLong(1) == 5L, s"all 5 exact neighbors must be recovered: $out")
    assert(out.getDouble(2) < 0.05, s"estimator error must be small in-cluster: $out")
  }

  // ---- PSI drift -------------------------------------------------------------

  test("psi: identical distributions score ~0, a shifted one scores large") {
    import graft.operators.DriftOps
    val same = (1L to 2000L).map(i => (i % 2 == 0, (i % 100) * 10))
    val psiSame = DriftOps.psi(same.toDF("is_base", "v"), $"is_base", $"v",
      bins = 10, lo = 0L, hi = 1000L).head().getAs[Double]("psi")
    assert(math.abs(psiSame) < 0.01, s"identical halves must score ~0: $psiSame")
    // current slice shifted up by 40% of the domain
    val shifted = (1L to 2000L).map { i =>
      val base = i % 2 == 0
      (base, (if (base) (i % 100) * 10 else (i % 100) * 10 + 400))
    }
    val psiShift = DriftOps.psi(shifted.toDF("is_base", "v"), $"is_base", $"v",
      bins = 10, lo = 0L, hi = 1000L).head().getAs[Double]("psi")
    assert(psiShift > 0.25, s"a 40%-domain shift must trip the PSI>0.25 alarm bar: $psiShift")
  }

  // ---- probe calibration (ECE) ---------------------------------------------

  test("probeCalibration: a perfectly calibrated probe has ECE 0") {
    import graft.operators.StatsOps
    // y ≡ x2 → pred = x2 ∈ {0,1}: both occupied bins have
    // avg_conf == frac_pos exactly → every gap 0 → ECE 0
    val r = new scala.util.Random(41)
    val rows = (1 to 200).map { i => (i.toLong, 5L + r.nextInt(50), (i % 3 == 0)) }
    val df = rows.toDF("id", "x1", "flag")
    val out = StatsOps.probeCalibration(df, col("x1"),
        when(col("flag"), 1L).otherwise(0L), when(col("flag"), 1L).otherwise(0L), bins = 10)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r0 =>
      assert(math.abs(r0.getAs[Double]("gap")) < 1e-9, s"gap must be 0: $r0")
      assert(math.abs(r0.getAs[Double]("ece")) < 1e-9, s"ece must be 0: $r0")
    }
  }

  // ---- bitext margin mining -------------------------------------------------

  test("bitextMarginPairs: margin criterion suppresses the hub that plain cosine mines") {
    import graft.operators.SimilarityOps
    // side 0: x1 pairs with y1 (identical direction); x2 is a HUB that
    // is moderately close to EVERY y — plain cosine at 0.8 would mine
    // all (x2, y*) pairs, the margin criterion keeps only (x1, y1)
    // because x2's whole neighborhood is equally close (ratio ≈ 1)
    // both sides need ≥ k+1 members so top-4 neighborhoods are full
    // (the mean divides by the fixed k)
    val vecs = Seq(
      (1L, 0, Seq(1.0, 0.0, 0.0, 0.0)),          // x1
      (2L, 0, Seq(0.5, 0.5, 0.5, 0.5)),          // x2 = hub
      (3L, 0, Seq(0.52, 0.48, 0.5, 0.5)),        // x3..x6: the hub region
      (4L, 0, Seq(0.48, 0.52, 0.5, 0.5)),
      (5L, 0, Seq(0.5, 0.5, 0.52, 0.48)),
      (6L, 0, Seq(0.5, 0.5, 0.48, 0.52)),
      (10L, 1, Seq(0.999, 0.01, 0.0, 0.0)),      // y1 ≈ x1
      (11L, 1, Seq(0.5, 0.55, 0.45, 0.5)),       // y2..y5: the hub region
      (12L, 1, Seq(0.45, 0.5, 0.55, 0.5)),
      (13L, 1, Seq(0.55, 0.45, 0.5, 0.5)),
      (14L, 1, Seq(0.5, 0.5, 0.55, 0.45))
    ).toDF("id", "side", "vec")
    val pairs = SimilarityOps.bitextMarginPairs(vecs, "id", "vec", "side",
        k = 4, threshold = 1.1)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(pairs.contains((1L, 10L)), s"the true pair must be mined: $pairs")
    assert(!pairs.exists(_._1 == 2L), s"the hub's pairs must be suppressed: $pairs")
  }

  // ---- MIPS (maximum inner product search) --------------------------------

  test("MIPS ≠ cosine: a large-norm item wins the inner product; reduction finds it") {
    import graft.operators.SimilarityOps
    // neighbor 2 is perfectly aligned with the query but small;
    // neighbor 3 is 30° off but 10× the norm → dot(3) > dot(2) while
    // cosine(2) > cosine(3). MIPS must return 3 first.
    val c = math.cos(math.Pi / 6); val s0 = math.sin(math.Pi / 6)
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)),               // the query
      (2L, Seq(0.9, 0.0)),               // aligned, small
      (3L, Seq(10.0 * c, 10.0 * s0)),    // off-angle, huge
      (4L, Seq(0.0, 2.0))                // orthogonal
    ).toDF("id", "vec")
    val q = vecs.filter($"id" === 1)
    val exact = SimilarityOps.bruteForceMipsTopK(vecs, q, "id", "vec", k = 2)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(exact == Seq(3L, 2L), s"MIPS order must be norm-aware: $exact")
    val cosTop = SimilarityOps.bruteForceTopK(vecs, q, "id", "vec", k = 1)
      .head().getLong(2)
    assert(cosTop == 2L, "cosine prefers the aligned small vector — the rankings differ")
    // the norm-augmentation reduction preserves the MIPS order exactly:
    // with nProbe = nCells the IVF scan is exhaustive → recall 1.0
    val red = SimilarityOps.mipsTopK(vecs, q, "id", "vec", k = 2, nCells = 2, nProbe = 2)
      .orderBy($"dot".desc).collect().map(_.getLong(1)).toSeq
    assert(red == Seq(3L, 2L), s"augmented-cosine order must equal dot order: $red")
  }

  // ---- perceptual-hash dedup ----------------------------------------------

  test("phashDupPairs ≡ the quadratic hamming truth; banding recall is complete ≤ 8") {
    import graft.operators.MultimodalOps
    val r = new scala.util.Random(31)
    // random payloads + in-place 1-char edits of half of them
    val base = (1L to 30L).map { id =>
      (id, Seq.fill(40 + r.nextInt(80))(('a' + r.nextInt(26)).toChar).mkString) }
    val edited = base.filter(_._1 % 2 == 0).map { case (id, t) =>
      (id + 1000L, t.updated(7, 'Z')) }
    val df = (base ++ edited).toDF("id", "payload")
    val got = MultimodalOps.phashDupPairs(df, "id", "payload", maxHamming = 8)
      .collect().map(r0 => ((r0.getLong(0), r0.getLong(1)), r0.getInt(2))).toMap
    // quadratic truth from the two-word signature table
    val sigs = MultimodalOps.aHashSignatures(df, "id", "payload")
      .collect().map(r0 => r0.getLong(0) -> (r0.getLong(1), r0.getLong(2))).toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a)._1 ^ sigs(b)._1) +
        java.lang.Long.bitCount(sigs(a)._2 ^ sigs(b)._2) if h <= 8
    } yield (a, b) -> h).toMap
    assert(got == want, s"banding must find EXACTLY the quadratic pair set: " +
      s"missing=${(want.keySet -- got.keySet).take(5)} extra=${(got.keySet -- want.keySet).take(5)}")
    // identical payloads are hamming 0
    val same = MultimodalOps.phashDupPairs(
        Seq((1L, "same text here padded out"), (2L, "same text here padded out"))
          .toDF("id", "payload"), "id", "payload")
      .collect()
    assert(same.length == 1 && same.head.getInt(2) == 0)
  }

  // ---- closed-form linear probe training --------------------------------

  test("linearProbeFit recovers the exact solution on a separable corpus") {
    import graft.operators.StatsOps
    // y ≡ x2 (binary flag), x1 independent noise: the least-squares
    // optimum is exactly w = (0, 0, 1) → SSE ~ 0, accuracy 1.0
    val r = new scala.util.Random(3)
    val rows = (1 to 400).map { i => (i.toLong, 5L + r.nextInt(200), (i % 3 == 0))  }
    val df = rows.toDF("id", "x1", "flag")
    val fit = StatsOps.linearProbeFit(df, col("x1"), when(col("flag"), 1L).otherwise(0L),
        when(col("flag"), 1L).otherwise(0L)).head()
    assert(fit.getLong(0) == 400)
    assert(math.abs(fit.getDouble(1)) < 1e-9, s"w0=${fit.getDouble(1)}")
    assert(math.abs(fit.getDouble(2)) < 1e-12, s"w1=${fit.getDouble(2)}")
    assert(math.abs(fit.getDouble(3) - 1.0) < 1e-9, s"w2=${fit.getDouble(3)}")
    assert(math.abs(fit.getDouble(4)) < 1e-6, s"sse=${fit.getDouble(4)}")
    assert(fit.getDouble(6) == 1.0, "separable data must classify perfectly")
  }

  test("linearProbeFit is bit-identical across partitionings (decimal moments)") {
    import graft.operators.StatsOps
    val r = new scala.util.Random(9)
    val rows = (1 to 300).map { i =>
      (i.toLong, r.nextInt(150).toLong, r.nextInt(12).toLong, (r.nextInt(2) == 0)) }
    def run(parts: Int) = StatsOps.linearProbeFit(
        rows.toDF("id", "a", "b", "flag").repartition(parts),
        col("a"), col("b"), when(col("flag"), 1L).otherwise(0L))
      .collect().map(_.toSeq).toSeq
    assert(run(1) == run(17), "moments are decimal-exact → identical doubles")
  }

  test("winnowDupPairs n_shared counts distinct shared hashes; overflow path agrees") {
    // three docs: a/b share two distinct 7-token runs, c shares nothing
    val runs = Seq(
      Seq("one", "two", "three", "four", "five", "six", "seven"),
      Seq("red", "blue", "green", "cyan", "plum", "jade", "rust"))
    val a = (runs(0) ++ Seq("xq") ++ runs(1)).mkString(" ")
    val b = (runs(1) ++ Seq("zk", "wf") ++ runs(0)).mkString(" ")
    val c = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = DedupOps.winnowDupPairs(df, "text", "doc_id", k = 4, w = 4, minShared = 2)
      .collect().map(row => ((row.getLong(0), row.getLong(1)), row.getLong(2))).toMap
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) >= 2, s"two shared runs must yield ≥2 shared fingerprints: $got")
    // the distributed overflow path (maxBucketSize=1) emits the same pairs
    val small = DedupOps.winnowDupPairs(df, "text", "doc_id", 4, 4, 2, maxBucketSize = 1)
      .collect().map(row => ((row.getLong(0), row.getLong(1)), row.getLong(2))).toMap
    assert(small == got)
  }
}
