package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("capPerKey equals the single-window brute force under skew") {
    // one hot key (80% of rows) + two cold ones; small salt count so
    // several salt buckets actually overlap per key
    val rows = (1 to 400).map(i => (if (i <= 320) "hot" else if (i <= 360) "warm" else "cold", i))
    val df = rows.toDF("k", "id")
    val got = CorpusOps.capPerKey(df, "k", Seq(col("id").desc), k = 7, rankCol = Some("rn"))
      .select("k", "id", "rn").orderBy("k", "rn")
      .as[(String, Int, Int)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      rs.map(_._2).sorted(Ordering[Int].reverse).take(7).zipWithIndex.map { case (id, i) => (k, id, i + 1) }
    }.sortBy(r => (r._1, r._3))
    assert(got == expected)
  }

  test("capPerKey keeps all rows when a key has fewer than k") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "id")
    val got = CorpusOps.capPerKey(df, "k", Seq(col("id").asc), k = 10)
    assert(got.count() == 3)
  }

  test("capPerKey is collision-safe: a caller column named rn survives untouched") {
    val df = Seq(("a", 1, 99), ("a", 2, 98), ("b", 3, 97)).toDF("k", "id", "rn")
    val got = CorpusOps.capPerKey(df, "k", Seq(col("id").asc), k = 1)
    assert(got.columns.toSeq == Seq("k", "id", "rn"))
    assert(got.orderBy("k").select("rn").as[Int].collect().toSeq == Seq(99, 97))
  }

  test("filterFunnel does not clobber a caller column named verdict") {
    val df = Seq((1L, "x", 5), (2L, "y", 50)).toDF("id", "verdict", "len")
    // a rule may even READ the caller's verdict column
    val out = CorpusOps.filterFunnel(df, Seq(
        "short" -> (col("len") < 10),
        "was_x" -> (col("verdict") === "x")))
      .orderBy("verdict").as[(String, Long)].collect().toSeq
    assert(out == Seq(("kept", 1L), ("short", 1L)))
  }

  test("mixtureSample: binding stratum keeps everything, others downsample toward targets") {
    val rows = (1 to 800).map(i =>
      (i.toLong, if (i <= 500) "web" else if (i <= 700) "code" else "math"))
    val df = rows.toDF("id", "src")
    // targets: math is binding (100/0.25 = 400 < web 500/0.5=1000, code 200/0.25=800)
    val kept = graft.operators.SplitOps
      .mixtureSample(df, "id", "src", Map("web" -> 0.5, "code" -> 0.25, "math" -> 0.25))
    val counts = kept.groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // math: rate 1.0 → ALL 100 rows kept (thr>=65536 edge)
    assert(counts("math") == 100L)
    // web target: 0.5*400=200 of 500 → rate 0.4; md5 buckets approximate it
    assert(math.abs(counts("web") - 200L) < 40, s"web kept ${counts("web")}")
    assert(math.abs(counts("code") - 100L) < 30, s"code kept ${counts("code")}")
    // deterministic: same input → identical kept set
    val again = graft.operators.SplitOps
      .mixtureSample(df, "id", "src", Map("web" -> 0.5, "code" -> 0.25, "math" -> 0.25))
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == kept.select("id").as[Long].collect().sorted.toSeq)
  }

  test("vocabulary: tf sums repeats, df counts distinct docs, stopwords dropped") {
    val docs = Seq(
      (1L, "alpha alpha beta the"),
      (2L, "alpha gamma gamma gamma"),
      (3L, "beta and alpha")
    ).toDF("doc_id", "text")
    val v = CorpusOps.vocabulary(docs, "doc_id", "text", topV = 10)
      .as[(String, Long, Long)].collect().toSeq
    // ordered by tf desc, token asc; "the"/"and" are stopwords
    assert(v == Seq(("alpha", 4L, 3L), ("gamma", 3L, 1L), ("beta", 2L, 2L)))
  }

  test("containmentPairs finds a small doc embedded in a large one (Jaccard misses it)") {
    val inner = "quick brown foxes jump over lazy dogs near rivers"
    val wrapper = ("header menu login " * 8) + inner + (" footer contact terms privacy" * 8)
    val docs = Seq((1L, inner), (2L, wrapper), (3L, "totally unrelated content about ships"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.DedupOps
      .containmentPairs(docs, "text", "doc_id", threshold = 0.9, shingleSize = 3, maxDf = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
    // jaccard on the same pair is far below any dedup threshold
    val jac = graft.operators.DedupOps
      .minhashDupPairs(docs, "text", "doc_id", threshold = 0.5)
      .count()
    assert(jac == 0)
  }

  test("tfidf top term prefers rare-but-frequent tokens; ties break on token") {
    val docs = Seq(
      (1L, "common rare rare"),   // rare: tf=2 df=1 → 2*3/1=6 ; common: tf=1 df=3 → 1
      (2L, "common common zz zz"), // both tf=2; zz df=1 → 6, common df=3 → 2
      (3L, "common aa bb")         // aa/bb tf=1 df=1 → 3 each; tie → aa
    ).toDF("doc_id", "text")
    val top = CorpusOps.tfidfTopTerms(docs, "doc_id", "text")
      .select("doc_id", "term").orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(top == Seq((1L, "rare"), (2L, "zz"), (3L, "aa")))
  }

  test("tfidfTopTermsCapped restricts ranking to the top-V vocabulary") {
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common common zz"),
      (3L, "onlyoov")
    ).toDF("doc_id", "text")
    // topV=1 keeps just "common" (tf=3); rare/zz become out-of-vocab and
    // doc 3 (all OOV) drops out entirely
    val top = CorpusOps.tfidfTopTermsCapped(docs, "doc_id", "text", topV = 1)
      .select("doc_id", "term").orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(top == Seq((1L, "common"), (2L, "common")))
    // with a non-binding cap the capped variant equals the full one
    val full = CorpusOps.tfidfTopTerms(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val capped = CorpusOps.tfidfTopTermsCapped(docs, "doc_id", "text", topV = 100)
      .orderBy("doc_id").collect().toSeq
    assert(capped == full)
  }
}
