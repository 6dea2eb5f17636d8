package graft

import graft.operators.{CorpusOps, MultimodalOps, SimilarityOps, StatsOps, WriteOps}
import org.apache.spark.sql.functions._

/** Round-11 second-batch operators: Mann-Whitney U, PR curve,
  * code-vs-prose detection, audio VAD, MMR re-ranking.
  */
class Round11bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    // valueOf (shortest-repr), mirroring Spark round() / the operator
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue

  test("mannWhitneyByGroup: exact U and tie-corrected z match a hand replay " +
    "with ties, and an all-tied group yields null z") {
    // group g1: A = {1, 2, 2}, B = {2, 3} — ties across arms at v=2
    // group g2: all values equal → sigma = 0 → z null
    val df = Seq(
      ("g1", "A", 1L), ("g1", "A", 2L), ("g1", "A", 2L),
      ("g1", "B", 2L), ("g1", "B", 3L),
      ("g2", "A", 7L), ("g2", "A", 7L), ("g2", "B", 7L)
    ).toDF("g", "arm", "v")
    val got = StatsOps.mannWhitneyByGroup(df, "g", "arm", col("v"), "A")
      .orderBy("g").collect()
    // g1 pooled ranks: v=1 → 1; v=2 (3 ties) → avg 3; v=3 → 5
    // R_A = 1 + 3 + 3 = 7 → 2R_A = 14; 2U_A = 14 − 3·4 = 2 → U_A = 1
    // ties: t=3 at v=2 → T = 27 − 3 = 24
    val g1 = got(0)
    assert(g1.getAs[Long]("n_a") == 3 && g1.getAs[Long]("n_b") == 2)
    assert(g1.getAs[Long]("u2_a") == 2L)
    assert(g1.getAs[Long]("tie_sum") == 24L)
    assert(g1.getAs[Double]("u_a") == 1.0)
    // z = (1 − 3) / sqrt(3·2/12 · (6 − 24/20)) = −2 / sqrt(2.4)
    val expZ = (1.0 - 3.0) / math.sqrt(3.0 * 2.0 / 12.0 * (6.0 - 24.0 / 20.0))
    assert(math.abs(g1.getAs[Double]("z") - expZ) < 1e-12)
    val g2 = got(1)
    // all tied: 2U_A = 2·ΣavgRank_A − n_a(n_a+1) = 2·(2+2) − 6 = 2
    assert(g2.getAs[Long]("u2_a") == 2L)
    assert(g2.isNullAt(g2.fieldIndex("z")))
  }

  test("mannWhitneyByGroup: no ties, U_A counts win pairs exactly") {
    // A = {10, 30}, B = {20, 40}: pairs A>B = {(30,20)} → U_A = 1
    val df = Seq(("g", "A", 10L), ("g", "A", 30L), ("g", "B", 20L), ("g", "B", 40L))
      .toDF("g", "arm", "v")
    val got = StatsOps.mannWhitneyByGroup(df, "g", "arm", col("v"), "A").collect()(0)
    assert(got.getAs[Long]("u2_a") == 2L && got.getAs[Double]("u_a") == 1.0)
    assert(got.getAs[Long]("tie_sum") == 0L)
  }

  test("prCurve: one point per distinct threshold with exact tp/fp/fn and " +
    "monotone recall") {
    // scores: pos at {9, 7, 7, 3}, neg at {8, 7, 2}
    val df = Seq((9, true), (7, true), (7, true), (3, true),
      (8, false), (7, false), (2, false))
      .map { case (s, l) => ("g", s, l) }.toDF("g", "s", "lab")
    val got = StatsOps.prCurve(df, "g", "s", "lab")
      .orderBy(col("threshold").desc).collect()
    val byThr = got.map(r => r.getAs[Int]("threshold") ->
      (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"))).toMap
    assert(byThr(9) == (1L, 0L, 3L))
    assert(byThr(8) == (1L, 1L, 3L))
    assert(byThr(7) == (3L, 2L, 1L))
    assert(byThr(3) == (4L, 2L, 0L))
    assert(byThr(2) == (4L, 3L, 0L))
    // recall non-decreasing as threshold drops; final recall = 1
    val recalls = got.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a })
    assert(recalls.last == 1.0)
    // f1 at threshold 7: p = 3/5, r = 3/4 → 2pr/(p+r) = 2/3·... hand value
    val p = 3.0 / 5.0; val r = 3.0 / 4.0
    val f7 = got.find(_.getAs[Int]("threshold") == 7).get.getAs[Double]("f1")
    assert(math.abs(f7 - 2.0 * p * r / (p + r)) < 1e-12)
  }

  test("codeProseReport: indented def-block flags as code, prose does not, " +
    "dense symbol one-liner flags via the symbol path") {
    val docs = Seq(
      (1L, "plain prose with several ordinary words and no markup at all"),
      (2L, "def process_x(x):\n    y = x * 2;\n    return {'k': y};\n# trailing comment"),
      (3L, "x={a:1};y=[2];z=(3);if(x)return y;else{for(;;)var k=z;}") // dense symbols + keywords
    ).toDF("doc_id", "text")
    val got = CorpusOps.codeProseReport(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(!got(0).getAs[Boolean]("is_code"))
    assert(got(1).getAs[Boolean]("is_code")) // via indent_ratio = 2/4
    assert(got(1).getAs[Long]("indent_lines") == 2L)
    assert(got(1).getAs[Long]("kw_hits") >= 2L)
    assert(got(2).getAs[Boolean]("is_code")) // via sym_ratio + keywords
    assert(got(2).getAs[Double]("sym_ratio") > 0.03)
    // snake_case identifier counted
    assert(got(1).getAs[Long]("snake_ids") >= 1L)
  }

  test("vadReport: islands merge, zero-voiced docs survive with 0 fills, " +
    "and counts replay the md5 energy kernel") {
    val docs = Seq((1L, "abcdef"), (2L, "xy")).toDF("doc_id", "txt")
      .select(col("doc_id"), encode(col("txt"), "UTF-8").as("bin"))
    val got = MultimodalOps.vadReport(docs, "doc_id", "bin").orderBy("doc_id").collect()
    // replay: energies from md5(s"$bl:$i") first 4 hex chars
    def energies(bl: Int): Seq[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until (bl % 40 + 10)).map { i =>
        val h = md.digest(s"$bl:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(4)
        java.lang.Long.parseLong(h, 16)
      }
    }
    got.foreach { r =>
      val bl = if (r.getAs[Long]("doc_id") == 1L) 6 else 2
      val es = energies(bl)
      val voiced = es.map(_ >= 32768L)
      val segs = voiced.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.headOption.exists(_ > 0) => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      assert(r.getAs[Long]("n_frames") == es.size.toLong)
      assert(r.getAs[Long]("n_voiced") == voiced.count(identity).toLong)
      assert(r.getAs[Long]("n_segments") == segs.size.toLong)
      assert(r.getAs[Long]("longest_seg") == (if (segs.isEmpty) 0L else segs.max.toLong))
    }
  }

  test("decayedTrend: exact power-of-two decay over per-day counts, " +
    "ages anchored at the global max day") {
    val day = 86400000000L
    // key a: day 10 ×2, day 11 ×4, day 12 ×1; key b: day 12 ×3
    val rows = Seq.fill(2)(("a", 10L)) ++ Seq.fill(4)(("a", 11L)) ++
      Seq(("a", 12L)) ++ Seq.fill(3)(("b", 12L))
    val df = rows.zipWithIndex
      .map { case ((k, d), i) => (k, d * day + i * 1000L) }
      .toDF("k", "ts_us")
    val got = StatsOps.decayedTrend(df, "k", "ts_us").orderBy("k").collect()
    // a: 1·0.5^0 + 4·0.5^1 + 2·0.5^2 = 3.5 ; b: 3·0.5^0 = 3.0
    assert(got(0).getAs[Long]("n_events") == 7L)
    assert(got(0).getAs[Double]("decayed") == 3.5)
    assert(got(1).getAs[Long]("n_events") == 3L)
    assert(got(1).getAs[Double]("decayed") == 3.0)
  }

  test("krippendorffAlpha: the hand-computed nominal example (missing " +
    "ratings, mixed m) yields alpha = 0.5 with exact integer components") {
    // item 1: A,A; item 2: A,B; item 3: B,B,B; item 4: single rating (dropped)
    val df = Seq(
      (1L, 1, "A"), (1L, 2, "A"),
      (2L, 1, "A"), (2L, 2, "B"),
      (3L, 1, "B"), (3L, 2, "B"), (3L, 3, "B"),
      (4L, 1, "A")
    ).toDF("item", "rater", "lab")
    val got = StatsOps.krippendorffAlpha(df, "item", "rater", "lab").collect()(0)
    assert(got.getAs[Long]("n_items") == 3L)
    assert(got.getAs[Long]("n_ratings_pairable") == 7L)
    assert(got.getAs[Long]("s_o2") == 4L)
    assert(got.getAs[Long]("de2") == 96L)
    assert(got.getAs[Double]("alpha") == 0.5)
  }

  test("krippendorffAlpha: perfect agreement gives alpha = 1") {
    val df = Seq((1L, 1, "x"), (1L, 2, "x"), (2L, 1, "y"), (2L, 2, "y"))
      .toDF("item", "rater", "lab")
    val got = StatsOps.krippendorffAlpha(df, "item", "rater", "lab").collect()(0)
    assert(got.getAs[Long]("s_o2") == 0L)
    assert(got.getAs[Double]("alpha") == 1.0)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("randomizationTest: output equals a plain-scala md5 replay and a " +
    "huge injected effect drives p to the floor") {
    def bit(prefix: String, u: Long): Long =
      java.lang.Long.parseLong(md5hex(prefix + u).take(8), 16) % 2
    val units = (1L to 50L).map(u => (u, u * 10))
    val df = units.toDF("user_id", "cents")
    val k = 16
    val got = StatsOps.randomizationTest(df, "user_id", "cents", "ab:", k).collect()(0)
    // scala replay
    def stat(prefix: String): Double = {
      val (a, b) = units.partition { case (u, _) => bit(prefix, u) == 0 }
      math.abs(a.map(_._2).sum.toDouble / a.size - b.map(_._2).sum.toDouble / b.size)
    }
    val obs = stat("ab:")
    val nGe = (1 to k).count(p => stat(s"perm$p:") >= obs)
    assert(got.getAs[Long]("n_units") == 50L)
    assert(got.getAs[Double]("obs_diff") == obs)
    assert(got.getAs[Long]("n_ge") == nGe.toLong)
    assert(got.getAs[Double]("p_value") == (nGe + 1).toDouble / (k + 1).toDouble)
    // inject a massive arm-A effect: no random reassignment matches it
    val boosted = units.map { case (u, v) =>
      (u, if (bit("ab:", u) == 0) v + 1000000L else v)
    }.toDF("user_id", "cents")
    val p2 = StatsOps.randomizationTest(boosted, "user_id", "cents", "ab:", k)
      .collect()(0)
    assert(p2.getAs[Long]("n_ge") == 0L)
    assert(p2.getAs[Double]("p_value") == 1.0 / (k + 1).toDouble)
  }

  test("amsF2Report: sketch and exact F2 equal a plain-scala md5 replay") {
    // keys with skewed frequencies: f = (5, 3, 1, 1)
    val keys = Seq.fill(5)(11L) ++ Seq.fill(3)(22L) ++ Seq(33L, 44L)
    val df = keys.toDF("user_id")
    val got = StatsOps.amsF2Report(df, "user_id").collect()(0)
    assert(got.getAs[Long]("n_events") == 10L)
    assert(got.getAs[Double]("exact_f2") == (25 + 9 + 1 + 1).toDouble)
    // replay: one 60-bit hash word per key, sign_e = 1 − 2·bit_e
    val z = Array.fill(32)(0L)
    keys.foreach { u =>
      val h = java.lang.Long.parseLong(md5hex("ams:" + u).take(15), 16)
      (0 until 32).foreach(e => z(e) += 1L - 2L * ((h >> e) & 1L))
    }
    val ms = (0 until 4).map(g => (0 until 8).map(i => z(g * 8 + i) * z(g * 8 + i)).sum.toDouble / 8.0)
      .sorted
    val est = (ms(1) + ms(2)) / 2.0
    assert(got.getAs[Double]("est_f2") == est)
    assert(got.getAs[Double]("rel_err") == math.abs(est - 36.0) / 36.0)
  }

  test("goodTuringReport: count-of-counts and GT estimates on a hand corpus") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val got = CorpusOps.goodTuringReport(docs, "text").orderBy("r").collect()
    // freqs: a=3, b=2, c=1 → N_1 = N_2 = N_3 = 1; N = 6
    assert(got.map(r => (r.getAs[Long]("r"), r.getAs[Long]("n_r"))).toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    val r1 = got(0)
    assert(r1.getAs[Double]("r_star") == 2.0) // (1+1)·N_2/N_1
    assert(r1.getAs[Double]("p_gt") == 2.0 / 6.0)
    assert(r1.getAs[Double]("p0_unseen") == 1.0 / 6.0)
    assert(got(2).isNullAt(got(2).fieldIndex("r_star"))) // no N_4
  }

  test("rendezvousPlan: assignment matches a scala md5 argmax replay and " +
    "resharding moves ~1/(N+1) of keys") {
    val keys = (1L to 200L).toDF("k")
    val got = WriteOps.rendezvousPlan(keys, "k", nShards = 8).collect()(0)
    // scala replay
    def shard(key: Long, n: Int): Int =
      (0 until n).maxBy(s => md5hex(s"rz$s:$key"))
    val moved = (1L to 200L).count(k => shard(k, 8) != shard(k, 9))
    assert(got.getAs[Long]("n_keys") == 200L)
    assert(got.getAs[Long]("n_moved") == moved.toLong)
    assert(got.getAs[Double]("moved_frac") == moved / 200.0)
    // the rendezvous contract: ≈1/9 ≈ 22 of 200 keys move — far below
    // the ~8/9 a mod-N reshard would force
    assert(got.getAs[Double]("moved_frac") < 0.25)
    assert(got.getAs[Long]("min_shard") >= 1L)
  }

  test("holtWintersAdditive: the fold matches a scala replay, seasonal " +
    "slots are calendar-anchored across a gap") {
    // days 0..9 with day 6 MISSING; dow pattern: +100 on dow 0
    val series = (0L to 9L).filter(_ != 6L).map(d => ("k", d, 10L * d + (if (d % 7 == 0) 100L else 0L)))
    val df = series.toDF("k", "day", "x")
    val got = StatsOps.holtWintersAdditive(df, "k", "day", "x").collect()(0)
    // scala replay of the exact chain
    val st = Array.fill(9)(0.0); st(0) = series.head._3.toDouble
    series.tail.foreach { case (_, d, x) =>
      val idx = (d % 7).toInt + 2
      val xd = x.toDouble
      val lNew = (xd - st(idx) + st(0) + st(1)) / 2.0
      val bNew = (lNew - st(0)) / 2.0 + st(1) / 2.0
      val sNew = (xd - lNew) / 2.0 + st(idx) / 2.0
      st(0) = lNew; st(1) = bNew; st(idx) = sNew
    }
    val lastDow = (series.last._2 % 7).toInt
    assert(got.getAs[Long]("n_days") == 9L)
    assert(got.getAs[Double]("level") == st(0))
    assert(got.getAs[Double]("trend") == st(1))
    assert(got.getAs[Double]("s_last") == st(lastDow + 2))
    assert(got.getAs[Double]("forecast_7d") == st(0) + 7.0 * st(1) + st(lastDow + 2))
    // the dow-0 spike lands in seasonal slot 0, not smeared by the gap
    assert(st(2) > 20.0)
  }

  test("dispersionReport: an evenly spread token scores near 0, a " +
    "one-part-concentrated token scores near 1, exact rational values") {
    // parts a/b each 6 tokens: "x" even (2+2), "y" only in part a (2),
    // filler "f" even — sizes s_a = s_b = 1/2
    val docs = Seq(
      (1L, "a", "x x y y f f"),
      (2L, "b", "x x f f f f")
    ).toDF("doc_id", "source", "text")
    val got = CorpusOps.dispersionReport(docs, "text", "source", minCount = 2, k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_occurrences"), r.getAs[Double]("dp"))).toMap
    // y: all 2 in part a → DP = (|1 − 1/2| + |0 − 1/2|)/2 = 1/2
    assert(got("y") == (2L, 0.5))
    // x: 2+2 of 4 → v = (1/2, 1/2) = s → DP = 0
    assert(got("x")._2 == 0.0)
    // f: 2 in a, 4 in b of 6 → DP = (|1/3−1/2| + |2/3−1/2|)/2 = 1/6
    assert(math.abs(got("f")._2 - 1.0 / 6.0) < 1e-15)
    // ranking: y (concentrated) first
    val top = CorpusOps.dispersionReport(docs, "text", "source", minCount = 2, k = 1)
      .collect()(0).getString(0)
    assert(top == "y")
  }

  test("isotonicCalibration: PAV merges violators into exact pooled rates, " +
    "keeps monotone bins untouched, and the fit is non-decreasing") {
    // bins 0/1/2 with raw rates 0.8 / 0.2 / 0.5 → PAV pools (0,1) at 0.5
    val rows =
      (1 to 5).map(i => ("s", 0, i <= 4)) ++
        (1 to 5).map(i => ("s", 1, i <= 1)) ++
        (1 to 4).map(i => ("s", 2, i <= 2)) ++
        // second group, already monotone: untouched
        (1 to 4).map(i => ("t", 0, i <= 1)) ++
        (1 to 4).map(i => ("t", 2, i <= 3))
    val df = rows.toDF("g", "score", "lab")
    val got = StatsOps.isotonicCalibration(df, "g", "score", "lab", bins = 16)
      .orderBy("g", "bin").collect()
    val s = got.filter(_.getString(0) == "s")
    assert(s.map(_.getAs[Double]("rate_raw")).toSeq == Seq(0.8, 0.2, 0.5))
    assert(s.map(_.getAs[Double]("rate_isotonic")).toSeq == Seq(0.5, 0.5, 0.5))
    val t = got.filter(_.getString(0) == "t")
    assert(t.map(_.getAs[Double]("rate_isotonic")).toSeq == Seq(0.25, 0.75))
    // the fit is non-decreasing within each group
    Seq(s, t).foreach { grp =>
      val ys = grp.map(_.getAs[Double]("rate_isotonic"))
      assert(ys.zip(ys.tail).forall { case (a, b) => b >= a })
    }
    // PAV preserves the per-group positive mass: Σ n·ŷ = Σ n_pos
    Seq(s, t).foreach { grp =>
      val mass = grp.map(r => r.getAs[Long]("n") * r.getAs[Double]("rate_isotonic")).sum
      assert(math.abs(mass - grp.map(_.getAs[Long]("n_pos")).sum) < 1e-9)
    }
  }

  test("simpsonCheck: a designed paradox flags every stratum (negative " +
    "within, positive aggregate), integer signs only") {
    val df = Seq(("A", 0L, 10L), ("A", 1L, 9L), ("B", 8L, 100L), ("B", 9L, 99L))
      .toDF("s", "x", "y")
    val got = StatsOps.simpsonCheck(df, "s", col("x"), col("y"))
      .orderBy("stratum").collect()
    assert(got.map(_.getAs[Int]("stratum_sign")).toSeq == Seq(-1, -1))
    assert(got.forall(_.getAs[Int]("agg_sign") == 1))
    assert(got.forall(_.getAs[Boolean]("reversed")))
    // no paradox when the stratum agrees with the aggregate
    val ok = StatsOps.simpsonCheck(
      Seq(("A", 0L, 1L), ("A", 1L, 2L)).toDF("s", "x", "y"), "s", col("x"), col("y"))
      .collect()(0)
    assert(ok.getAs[Int]("stratum_sign") == 1 && !ok.getAs[Boolean]("reversed"))
  }

  test("brierDecomposition: hand Murphy terms — perfect calibration has " +
    "REL 0, a constant forecast has RES-cancelling Brier ō(1−ō)") {
    def calib(p0: Double, p1: Double) = Seq(
      ("g", 0L, 4L, 1L, p0), ("g", 1L, 4L, 3L, p1)
    ).toDF("g", "bin", "n", "n_pos", "rate_isotonic")
    val perfect = StatsOps.brierDecomposition(calib(0.25, 0.75), "g").collect()(0)
    assert(perfect.getAs[Double]("o_bar") == 0.5)
    assert(perfect.getAs[Double]("reliability") == 0.0)
    assert(perfect.getAs[Double]("resolution") == 0.0625)
    assert(perfect.getAs[Double]("uncertainty") == 0.25)
    assert(perfect.getAs[Double]("brier") == 0.1875)
    val const = StatsOps.brierDecomposition(calib(0.5, 0.5), "g").collect()(0)
    assert(const.getAs[Double]("reliability") == 0.0625)
    assert(const.getAs[Double]("brier") == 0.25) // = ō(1−ō) at ō = 0.5
  }

  test("w1Distance: exact earth-mover's distance vs the pooled corpus on " +
    "a hand grid (5/3 and 5), zero for an identical slice") {
    import graft.operators.DriftOps
    val df = Seq(("A", 0L), ("A", 0L), ("A", 10L), ("B", 10L)).toDF("s", "v")
    val got = DriftOps.w1Distance(df, "s", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("w1")).toMap
    assert(got("A") == 20.0 / 12.0) // |2·4 − 2·3|·10 / (3·4)
    assert(got("B") == 5.0)         // |0·4 − 2·1|·10 / (1·4)
    // a slice that IS the corpus distribution has W1 = 0
    val same = Seq(("X", 1L), ("X", 2L)).toDF("s", "v")
    assert(DriftOps.w1Distance(same, "s", "v").collect()(0).getAs[Double]("w1") == 0.0)
  }

  test("shapleyAttribution: hand coalition values give exact sixths and " +
    "the efficiency property holds") {
    // converted: u1{view}, u2{view,click}, u4{signup}, u5{} ; u3{click} no conv
    val ev = Seq(
      (1L, "view"), (1L, "purchase"),
      (2L, "view"), (2L, "click"), (2L, "purchase"),
      (3L, "click"),
      (4L, "signup"), (4L, "purchase"),
      (5L, "purchase")
    ).toDF("user_id", "event_type")
    val got = StatsOps.shapleyAttribution(ev, "user_id", "event_type",
        Seq("view", "click", "signup"), "purchase")
      .orderBy("channel").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("phi6"), r.getAs[Double]("phi"))).toMap
    assert(got("view") == (9L, 1.5))
    assert(got("click") == (3L, 0.5))
    assert(got("signup") == (6L, 1.0))
    // efficiency: Σφ = v(all) − v(none) = 4 − 1 = 3
    assert(got.values.map(_._2).sum == 3.0)
  }

  test("mcnemar: discordant-pair counts and both chi-square variants on a " +
    "hand table; concordant-only data yields null chi2") {
    // 10 items: both right ×4, A-only ×3, B-only ×1, both wrong ×2
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq((false, true)) ++ Seq.fill(2)((false, false))
    val df = rows.map { case (a, b) => ("g", a, b) }.toDF("g", "ca", "cb")
    val got = StatsOps.mcnemar(df, "g", col("ca"), col("cb")).collect()(0)
    assert(got.getAs[Long]("b") == 3L && got.getAs[Long]("c") == 1L)
    assert(got.getAs[Long]("n_both") == 4L && got.getAs[Long]("n_neither") == 2L)
    assert(got.getAs[Double]("chi2") == 4.0 / 4.0)     // (3−1)²/4
    assert(got.getAs[Double]("chi2_cc") == 1.0 / 4.0)  // (|2|−1)²/4
    val conc = StatsOps.mcnemar(
      Seq(("g", true, true), ("g", false, false)).toDF("g", "ca", "cb"),
      "g", col("ca"), col("cb")).collect()(0)
    assert(conc.isNullAt(conc.fieldIndex("chi2")))
  }

  test("kmeans1dOptimal: k well-separated groups land one-per-cluster with " +
    "exact grid edges and SSE; the DP beats a greedy split where it must") {
    val vals = Seq(0L, 1L, 100L, 101L, 200L, 201L, 300L, 301L).toDF("v")
    val got = StatsOps.kmeans1dOptimal(vals, col("v"), k = 4, buckets = 64)
      .orderBy("cluster_id").collect()
    // width = (301-0)/64 + 1 = 5; cells 0, 20, 40, 60 — one per cluster
    assert(got.map(_.getAs[Long]("n")).forall(_ == 2L))
    assert(got.map(_.getAs[Long]("lo_value")).toSeq == Seq(0L, 100L, 200L, 300L))
    assert(got.map(_.getAs[Long]("hi_value")).toSeq == Seq(4L, 104L, 204L, 304L))
    // each pair {x, x+1}: sse = q − s²/c = 0.5
    assert(got.map(_.getAs[Double]("sse")).forall(_ == 0.5))
    assert(got(0).getAs[Double]("mean") == 0.5)
    // optimality: {0,16} vs {160} (SSE 128) beats {0} vs {16,160} (10368)
    val g2 = StatsOps.kmeans1dOptimal(Seq(0L, 16L, 160L).toDF("v"), col("v"), k = 2)
      .orderBy("cluster_id").collect()
    assert(g2(0).getAs[Long]("n") == 2L && g2(1).getAs[Long]("n") == 1L)
    assert(g2(0).getAs[Double]("sse") == 128.0)
    assert(g2(1).getAs[Double]("sse") == 0.0)
  }

  test("mmrRerank: rank 1 = argmax relevance; later picks trade relevance " +
    "against max-sim to selected (a redundant near-copy is deferred)") {
    // query 0 at e1; candidates: 1 ≈ e1 (rel ~1), 2 = near-copy of 1,
    // 3 = e2-ish (low rel, orthogonal), 4 = e1+e2 mix
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.99, 0.01, 0.0, 0.0)),
      (2L, Seq(0.985, 0.012, 0.0, 0.0)), // near-duplicate of 1
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(0.6, 0.6, 0.0, 0.0))
    ).toDF("vec_id", "vec")
    val got = SimilarityOps.mmrRerank(vecs, vecs.filter(col("vec_id") === 0),
        "vec_id", "vec", poolK = 4, selectK = 3, lambda = 0.3)
      .orderBy("mmr_rank").collect()
    assert(got.map(_.getAs[Int]("mmr_rank")).toSeq == Seq(1, 2, 3))
    assert(got(0).getAs[Long]("neighbor_id") == 1L) // top relevance
    // at λ=0.3 diversity dominates: the near-copy of 1 (sim ≈ 1) is
    // deferred out of the top-3 entirely — the orthogonal 3 and the
    // mix 4 are picked instead
    assert(!got.map(_.getAs[Long]("neighbor_id")).contains(2L))
    assert(got.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L, 3L, 4L))
    // greedy replay in plain scala: pool rel = Spark's rounded cosine,
    // internal sims RAW (the operator's un-rounded contract)
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    def cos(a: Seq[Double], b: Seq[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val cands = Seq(1L, 2L, 3L, 4L).map { id =>
      val v = vecs.filter(col("vec_id") === id).collect()(0).getSeq[Double](1)
      (id, r6(cos(q, v)), v)
    }
    var selected = List.empty[(Long, Double, Seq[Double])]
    (1 to 3).foreach { _ =>
      val rem = cands.filterNot(c => selected.exists(_._1 == c._1))
      val pick = rem.map { c =>
        val score = if (selected.isEmpty) c._2
        else 0.3 * c._2 - (1.0 - 0.3) * selected.map(s => cos(c._3, s._3)).max
        (c, score)
      }.minBy { case (c, sc) => (-sc, c._1) }
      selected = selected :+ ((pick._1._1, pick._2, pick._1._3))
    }
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == selected.map(_._1))
  }
}
