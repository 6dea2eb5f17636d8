package graft

import graft.functions.TextFunctions
import graft.operators.{BloomOps, BucketOps, CorpusOps, DecontamOps}
import org.apache.spark.sql.functions._

/** Round-6 operators: segment-granular dedup (boilerplate lines,
  * within-doc repeats), fractional n-gram decontamination, per-key score
  * calibration, BM25 retrieval.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("segmentsFromTokens: non-overlapping windows, short tail, empty doc") {
    val df = Seq("a b c d e f g", "a b", "").toDF("text")
      .select(TextFunctions.segmentsFromTokens(TextFunctions.tokens(col("text")), 3).as("segs"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "d e f", "g"), Seq("a b"), Seq()))
  }

  test("dedupSegments keeps first occurrence, zero shuffles") {
    // segments of "x y x y z z x y" at w=2: [x y][x y][z z][x y] → kept [x y][z z]
    val df = Seq("x y x y z z x y").toDF("text")
      .select(TextFunctions.segmentsFromTokens(TextFunctions.tokens(col("text")), 2).as("segs"))
      .select(TextFunctions.dedupSegments(col("segs")).as("kept"))
    assert(df.as[Seq[String]].collect().head == Seq("x y", "z z"))
    df.collect()
    assert(BucketOps.countExchanges(df) == 0,
      "within-doc segment dedup must be a pure projection")
  }

  test("removeBoilerplateSegments drops high-df segments and preserves order") {
    // "common one" appears in 3 docs; maxDf=2 removes it everywhere
    val docs = Seq(
      (1L, Seq("common one", "rare a", "rare b")),
      (2L, Seq("rare c", "common one")),
      (3L, Seq("common one")),
      (4L, Seq())
    ).toDF("id", "segs")
    val got = CorpusOps.removeBoilerplateSegments(docs, "id", "segs", maxDf = 2)
      .orderBy("id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "rare a rare b", 3L, 2L),
      (2L, "rare c", 2L, 1L),
      (3L, "", 1L, 0L),
      (4L, "", 0L, 0L)))
  }

  test("removeBoilerplateSegments df counts distinct docs, not occurrences") {
    // "rep" occurs 3 times but only in ONE doc → df=1 → survives maxDf=2
    val docs = Seq((1L, Seq("rep", "rep", "rep")), (2L, Seq("solo"))).toDF("id", "segs")
    val got = CorpusOps.removeBoilerplateSegments(docs, "id", "segs", maxDf = 2)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "rep rep rep", 3L, 3L), (2L, "solo", 1L, 1L)))
  }

  test("ngramContamination: verbatim inclusion scores 1.0, disjoint text filtered") {
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "totally different words appear here instead"),
      (12L, "prefix words alpha beta gamma delta epsilon zeta suffix tail")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("bid", "text")
    val got = DecontamOps.ngramContamination(docs, "text", "doc_id", bench, "text", "bid",
        n = 3, minOverlap = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "overlap").as[(Long, Double)].collect().toSeq
    // doc 10 contains every bench 3-gram (1.0); doc 12 contains them all too
    assert(got.map(_._1) == Seq(10L, 12L))
    assert(got.forall(_._2 == 1.0))
  }

  test("calibrateByKey: exact percent_rank per key, collision rejected") {
    val df = Seq(("a", 1L, 0.1), ("a", 2L, 0.5), ("a", 3L, 0.9),
      ("b", 4L, 0.7), ("b", 5L, 0.2)).toDF("k", "id", "s")
    val got = CorpusOps.calibrateByKey(df, "k", "s", "id")
      .orderBy("id").select("id", "pct_rank").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0, 4L -> 1.0, 5L -> 0.0))
    val e = intercept[IllegalArgumentException](CorpusOps.calibrateByKey(df, "k", "s", "id", outCol = "s"))
    assert(e.getMessage.contains("already exists"))
  }

  test("quarantineTag: first failing rule wins, kept otherwise, collision rejected") {
    val df = Seq((1L, 5, "en"), (2L, 100, "de"), (3L, 600, "de"), (4L, 100, "en"))
      .toDF("id", "n", "lang")
    val rules = Seq(
      "too_small" -> (col("n") < 10),
      "too_big" -> (col("n") > 450),
      "non_english" -> (col("lang") =!= "en"))
    val got = CorpusOps.quarantineTag(df, rules).orderBy("id")
      .select("id", "verdict").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "too_small"), (2L, "non_english"), (3L, "too_big"), (4L, "kept")))
    // routing splits share one verdict definition with the funnel counts
    val funnel = CorpusOps.filterFunnel(df, rules)
      .as[(String, Long)].collect().toMap
    assert(funnel == got.groupBy(_._2).view.mapValues(_.size.toLong).toMap)
    val e = intercept[IllegalArgumentException](
      CorpusOps.quarantineTag(df.withColumnRenamed("lang", "verdict"), rules.take(2)))
    assert(e.getMessage.contains("already exists"))
  }

  test("hashedFeatures: buckets in range, tf conserved, layout-independent") {
    val df = Seq((1L, "alpha beta alpha gamma"), (2L, "beta beta delta"), (3L, ""))
      .toDF("doc_id", "text")
    val got = CorpusOps.hashedFeatures(df, "doc_id", "text", dim = 4)
      .orderBy("doc_id", "bucket")
      .as[(Long, Int, Long)].collect().toSeq
    assert(got.forall { case (_, b, _) => b >= 0 && b < 4 })
    // total tf = total non-stopword tokens (4 + 3 + 0)
    assert(got.map(_._3).sum == 7L)
    // empty doc contributes no rows
    assert(!got.exists(_._1 == 3L))
    // no corpus state: bucketing is per-token, so any partitioning agrees
    val re = CorpusOps.hashedFeatures(df.repartition(5), "doc_id", "text", dim = 4)
      .orderBy("doc_id", "bucket").as[(Long, Int, Long)].collect().toSeq
    assert(re == got)
  }

  test("distinctSketches: estimates track exact counts, merge survives parquet persistence") {
    import graft.operators.StatsOps
    val df = (0L until 20000L).map(i => ((i % 7).toInt, i % 1500)).toDF("day", "uid")
    val sk = StatsOps.distinctSketches(df, "day", "uid")
    // per-day estimate within the lgK=12 error bound of the exact count
    val est = sk.select(col("day"), hll_sketch_estimate(col("sketch")).as("est"))
      .as[(Int, Long)].collect().toMap
    val exact = df.distinct().groupBy("day").count().as[(Int, Long)].collect().toMap
    exact.foreach { case (day, ex) =>
      assert(math.abs(est(day) - ex) <= ex * 0.05 + 1, s"day $day: est ${est(day)} vs exact $ex")
    }
    // the persisted-table workflow: sketch rows written to parquet, read
    // back, merged — estimate must match the exact global distinct
    val dir = java.nio.file.Files.createTempDirectory("sketch-spec").toString
    sk.write.mode("overwrite").parquet(dir)
    val merged = StatsOps.unionDistinctEstimate(spark.read.parquet(dir))
      .as[Long].collect().head
    val exactTotal = df.select("uid").distinct().count()
    assert(math.abs(merged - exactTotal) <= exactTotal * 0.05 + 1,
      s"merged $merged vs exact $exactTotal")
    // merging a filtered subset answers range queries without raw data
    val merged3 = StatsOps.unionDistinctEstimate(spark.read.parquet(dir).filter(col("day") < 3))
      .as[Long].collect().head
    val exact3 = df.filter(col("day") < 3).select("uid").distinct().count()
    assert(math.abs(merged3 - exact3) <= exact3 * 0.05 + 1)
  }

  test("bm25TopK: more matched terms and rarer terms rank higher; k respected") {
    val docs = Seq(
      (1L, "merge join window merge join window"), // all 3 query terms, high tf
      (2L, "merge row row row row row"),           // one query term
      (3L, "row scan value hash part batch"),      // no query terms
      (4L, "merge join row scan value hash")       // two query terms
    ) ++ (5L to 30L).map(i => (i, "row scan value hash part batch"))
    val df = docs.toDF("doc_id", "text")
    val got = CorpusOps.bm25TopK(df, "doc_id", "text", Seq("merge", "join", "window"), k = 3)
      .select("doc_id", "n_terms", "score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size == 3)
    assert(got.head._1 == 1L && got.head._2 == 3L, s"doc 1 should win: $got")
    assert(got.map(_._1).toSet == Set(1L, 2L, 4L))
    assert(got == got.sortBy(r => (-r._3, r._1)), "output ordered by score desc")
  }

  test("bloom index: zero false negatives, bounded false positives, null handling") {
    val members = (1L to 300L).map(i => s"doc-$i").toDF("v")
    val idx = BloomOps.bloomIndex(members, "v", k = 7, bitsPerValue = 16)
    // every member must probe true — the structural guarantee
    val memProbe = BloomOps.bloomProbe(idx, members.withColumn("id", col("v")), "id", "v", k = 7)
    assert(memProbe.filter(!col("might_contain")).count() == 0, "bloom false negative")
    // non-members: FPR at 16 bits/value, k=7 is ~7e-4; 300 probes ≫ bound 5
    val absent = (1L to 300L).map(i => s"other-$i").toDF("v").withColumn("id", col("v"))
    val fp = BloomOps.bloomProbe(idx, absent, "id", "v", k = 7)
      .filter(col("might_contain")).count()
    assert(fp <= 5, s"false-positive count $fp out of 300 non-members")
    // null probe value → null verdict (not false, not true)
    val nullProbe = BloomOps.bloomProbe(idx,
      Seq(("a", Option("doc-1")), ("b", Option.empty[String])).toDF("id", "v"), "id", "v", k = 7)
      .orderBy("id").as[(String, Option[Boolean])].collect()
    assert(nullProbe(0)._2.contains(true) && nullProbe(1)._2.isEmpty)
  }

  test("bloom mergeIndexes == single build at fixed geometry; mixed-m probe refused") {
    val a = (1L to 150L).map(i => s"doc-$i").toDF("v")
    val b = (151L to 300L).map(i => s"doc-$i").toDF("v")
    val m = Some(8192L)
    val merged = BloomOps.mergeIndexes(
      BloomOps.bloomIndex(a, "v", fixedBits = m), BloomOps.bloomIndex(b, "v", fixedBits = m))
    val whole = BloomOps.bloomIndex(a.union(b), "v", fixedBits = m)
    // the relational bitmap is bit-identical, not just probe-equivalent
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "merged shards differ from the single-pass build")
    // shards with different geometry must be refused at probe time
    val mixed = BloomOps.bloomIndex(a, "v", fixedBits = Some(4096L)).unionByName(
      BloomOps.bloomIndex(b, "v", fixedBits = m))
    val ex = intercept[Exception] {
      BloomOps.bloomProbe(mixed, a.withColumn("id", col("v")), "id", "v").collect()
    }
    assert(ex.getMessage.contains("mbits") || ex.getCause != null)
  }
}
